package graft

import org.apache.spark.sql.functions._
import graft.core.GraftFrame.DataFrameOps
import graft.ops._

/** Seeded randomized property tests — adversarial inputs the golden
  * specs don't reach, with FIXED seeds so every run is reproducible
  * (no flaky-seed lottery; a failure is always replayable). Each
  * property drives the distributed implementation against a
  * brute-force or mathematical reference on several generated
  * instances. */
class RandomPropertySpec extends SparkTestBase {

  test("fuzzy self-join == brute force on random low-alphabet strings (d=1 and d=2)") {
    import spark.implicits._
    for (seed <- Seq(11, 23, 47); d <- Seq(1, 2)) {
      val rnd = new scala.util.Random(seed)
      // alphabet {a,b}, lengths 0..6: dense near-neighbor space — far
      // more edit-distance collisions than real names would produce
      val strs = Seq.tabulate(30)(i =>
        (i.toLong, Seq.fill(rnd.nextInt(7))("ab" (rnd.nextInt(2))).mkString))
      val df = strs.toDF("id", "s")
      val fast = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", maxDist = d)
        .select("a", "b", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val l = df.toDF("a", "s_a")
      val r = df.toDF("b", "s_b")
      val brute = l.crossJoin(r).filter(col("a") < col("b"))
        .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
        .filter(col("dist") <= d)
        .select("a", "b", "dist").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      assert(fast == brute,
        s"seed=$seed d=$d: missing=${brute -- fast} extra=${fast -- brute}")
    }
  }

  test("hamming pair join finds EVERY pair within radius 3 on clustered random sigs") {
    import spark.implicits._
    for (seed <- Seq(5, 19)) {
      val rnd = new scala.util.Random(seed)
      // 8 random base signatures, each with 4 mutations of <= 3 bit
      // flips: dense within-cluster pairs at dist 0..6 plus random
      // cross-cluster distances
      val sigs = (0 until 8).flatMap { c =>
        val base = rnd.nextLong()
        (0 until 4).map { m =>
          var s = base
          (0 until rnd.nextInt(4)).foreach(_ => s ^= 1L << rnd.nextInt(64))
          ((c * 4 + m).toLong, s)
        }
      }
      val df = sigs.toDF("id", "sig")
      val fast = Dedup.hammingNearDupSigs(df, "id", "sig", maxDist = 3)
        .select("a", "b", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = (for {
        (i, si) <- sigs; (j, sj) <- sigs if i < j
        dst = java.lang.Long.bitCount(si ^ sj) if dst <= 3
      } yield (i, j, dst)).toSet
      assert(fast == brute,
        s"seed=$seed: missing=${brute -- fast} extra=${fast -- brute}")
    }
  }

  test("intervalOverlap == quadratic reference on random intervals at several bin widths") {
    import spark.implicits._
    for (seed <- Seq(7, 31); bw <- Seq(3L, 16L, 200L)) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.tabulate(120) { i =>
        val lo = rnd.nextInt(500).toLong
        (i.toLong, (i % 2).toLong, lo, lo + rnd.nextInt(60).toLong)
      }.toDF("l_id", "u", "l_lo", "l_hi")
      val right = Seq.tabulate(100) { j =>
        val lo = rnd.nextInt(500).toLong
        (j.toLong, (j % 2).toLong, lo, lo + rnd.nextInt(40).toLong)
      }.toDF("r_id", "u", "r_lo", "r_hi")
      val got = RangeJoin.intervalOverlap(left, "l_lo", "l_hi",
          right, "r_lo", "r_hi", bw, Seq("u"))
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size,
        s"seed=$seed bw=$bw: a pair emitted twice")
      val brute = left.as("l").join(right.as("r"),
          col("l.u") === col("r.u") &&
            col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got.toSet == brute,
        s"seed=$seed bw=$bw: missing=${brute -- got.toSet} extra=${got.toSet -- brute}")
    }
  }

  test("incremental CC == full recompute under random graphs and random day splits") {
    import spark.implicits._
    for (seed <- Seq(13, 59)) {
      val rnd = new scala.util.Random(seed)
      val all = Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(p => p._1 != p._2)
      // random split: day-1 keeps ~60% of pairs, the rest is the delta
      val (day1, delta) = all.partition(_ => rnd.nextBoolean() || rnd.nextBoolean())
      if (day1.nonEmpty && delta.nonEmpty) {
        val d1 = day1.toDF("a", "b")
        val dd = delta.toDF("a", "b")
        val standing = Dedup.dedupClusters(d1, maxIter = 100)
        val inc = Dedup.dedupClustersIncremental(standing, dd, maxIter = 100)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val full = Dedup.dedupClusters(d1.unionByName(dd), maxIter = 100)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(inc == full, s"seed=$seed: incremental != full recompute")
      }
    }
  }

  test("ewmaChart is invariant under input partitioning; fit==apply calibration has zero gap") {
    import spark.implicits._
    val base = (1700000000000L / 3600000L) * 3600000L
    val rnd = new scala.util.Random(17)
    val rows = (0 until 40).flatMap { h =>
      (0 until (1 + rnd.nextInt(9))).map(i => ((h * 100 + i).toLong,
        new java.sql.Timestamp(base + h * 3600000L + i * 1000L), 1L,
        s"t${h % 3}", 1.0))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventAnalytics.ewmaChart(df, "1 hour", horizon = 16)
        .orderBy("event_type", "wstart").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(run(ev) == run(ev.repartition(7)),
      "dyadic EWMA must be bit-identical under any partitioning")
    // histogram calibration applied to its own fit split: the fitted
    // rate IS the apply rate in every bin — gap_after exactly zero
    val docs = (1 to 200).map { i =>
      (math.min(rnd.nextDouble(), 0.999), rnd.nextBoolean())
    }.toDF("p", "y")
    val bins = Classifier.histogramCalibration(docs, docs,
      col("p"), col("y"), k = 10).collect()
    assert(bins.nonEmpty &&
      bins.forall(_.getAs[Double]("gap_after") == 0.0),
      "in-sample histogram calibration must close every bin gap exactly")
  }

  test("seeded sample and rowid are invariant under partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(200)(i => (i.toLong, rnd.nextInt(1000)))
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("id", "v").repartition(parts)
      val sample = df.graft.sliceSample(20, 42L, col("id")).df
        .select("id").collect().map(_.getLong(0)).toSet
      val base = rows.toDF("id", "v").graft.sliceSample(20, 42L, col("id")).df
        .select("id").collect().map(_.getLong(0)).toSet
      assert(sample == base, s"parts=$parts: sample changed under partitioning")
      val rid = graft.core.Tibble.rowidToColumn(df, Seq(col("id")), "rid")
        .select("id", "rid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0 until 200).forall(i => rid(i.toLong) == i + 1),
        s"parts=$parts: rowid not the sort rank")
    }
  }

  test("KMV sketch == sorted distinct take-k on random multisets") {
    import spark.implicits._
    for (seed <- Seq(7, 29); k <- Seq(1, 8, 100)) {
      val rnd = new scala.util.Random(seed)
      val keys = Seq.fill(300)(s"k${rnd.nextInt(60)}")
      val sketch = Profiling.kmvSketch(keys.toDF("k").repartition(5), col("k"), k)
        .collect().head.getSeq[String](0)
      val expected = keys.distinct.map(x =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .sorted.take(k)
      assert(sketch == expected, s"seed=$seed k=$k")
    }
  }

  test("dHash is invariant under exact pixel replication on random images") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def ppm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
        Array.tabulate(w * h * 3)(i => px(i / 3 % w, i / 3 / w).toByte)
    val imgs = (0 until 6).flatMap { n =>
      val base = Array.fill(8, 9)(rnd.nextInt(256))
      def pix(x: Int, y: Int) = base(y)(x)
      Seq((n * 2L, ppm(9, 8, pix)),
        (n * 2L + 1, ppm(27, 16, (x, y) => pix(x / 3, y / 2))))
    }
    val out = Multimodal.dHashPpm(imgs.toDF("media_id", "payload"))
      .collect().map(r => r.media_id -> r).toMap
    (0 until 6).foreach { n =>
      assert(out(n * 2L).ok && out(n * 2L + 1).ok)
      assert(out(n * 2L).dhash == out(n * 2L + 1).dhash,
        s"img $n: 3x2 replication changed the hash")
    }
  }

  test("cdcChunks tiles EVERY random string exactly (random lengths incl. < w)") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    val alphabet = "ab \ncafé€"
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(400))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = docs.toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(df, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
    for ((id, txt) <- docs) {
      val cs = chunks(id).sortBy(_.getInt(1))
      val n = txt.codePointCount(0, txt.length).toLong
      assert(cs.head.getInt(1) == 1, s"doc $id: first chunk not at 1")
      assert(cs.map(_.getLong(2)).sum == n, s"doc $id: lens don't sum to $n")
      cs.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getInt(1) == a.getInt(1) + a.getLong(2), s"doc $id: gap")
        case _ =>
      }
    }
  }

  test("waterFillQuotas invariants hold on random allocations") {
    import spark.implicits._
    for (seed <- Seq(5, 17, 31)) {
      val rnd = new scala.util.Random(seed)
      val strata = Seq.tabulate(1 + rnd.nextInt(12))(i =>
        (s"s$i", 1L + rnd.nextInt(500).toLong))
      val rows = strata.flatMap { case (s0, t0) => (1L to t0).map(_ => (s0, 1L)) }
      val total = strata.map(_._2).sum
      val budget = 1.0 + rnd.nextInt(2 * total.toInt)
      val out = Sampling.waterFillQuotas(rows.toDF("src", "tok"),
          col("src"), col("tok"), budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      // quota never exceeds the stratum total; sum exhausts the
      // smaller of budget and corpus; capped strata share one level
      assert(out.forall { case (_, t, q) => q <= t + 1e-9 })
      assert(math.abs(out.map(_._3).sum - math.min(budget, total.toDouble)) < 1e-6,
        s"seed=$seed: sum=${out.map(_._3).sum} budget=$budget total=$total")
      val capped = out.filter { case (_, t, q) => q < t - 1e-9 }.map(_._3)
      assert(capped.distinct.length <= 1,
        s"seed=$seed: capped strata at different levels: ${capped.toSeq}")
    }
  }

  test("normalizeText is idempotent on random dirty strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(202)
    val junk = "a b\tc\nde f　‘’“”–—…  \n\n\n\nzž¿"
    val docs = Seq.tabulate(80) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(120))(
        junk(rnd.nextInt(junk.length))).mkString)
    }
    val df = docs.toDF("id", "t")
    val once = df.select(col("id"),
      TextAnalysis.normalizeText(col("t")).as("n1"))
    val twice = once.select(col("id"),
      col("n1"), TextAnalysis.normalizeText(col("n1")).as("n2"))
      .collect()
    twice.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"id ${r.getLong(0)}: not idempotent:\n1:${r.getString(1)}\n2:${r.getString(2)}")
    }
  }
  test("ksTest == brute-force sup|F1-F2| on random samples (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(3, 17, 41)) {
      val rnd = new scala.util.Random(seed)
      val a = Seq.fill(200)(rnd.nextInt(40).toDouble)
      val b = Seq.fill(150)(rnd.nextInt(40).toDouble + rnd.nextInt(10))
      val got = graft.ops.Profiling.ksTest(a.toDF("v"), b.toDF("v"), "v").head()
      // brute force over the pooled support
      val support = (a ++ b).distinct.sorted
      def cdf(xs: Seq[Double], v: Double) = xs.count(_ <= v).toDouble / xs.size
      val brute = support.map(v => math.abs(cdf(a, v) - cdf(b, v))).max
      assert(math.abs(got.getDouble(0) - brute) < 1e-12,
        s"seed=$seed: ks=${got.getDouble(0)} brute=$brute")
    }
  }

  test("wasserstein1 and cramerVonMises == brute-force references on random samples (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(5, 19, 37)) {
      val rnd = new scala.util.Random(seed)
      val a = Seq.fill(180)(rnd.nextInt(30).toDouble)
      val b = Seq.fill(140)(rnd.nextInt(30).toDouble + rnd.nextInt(8))
      def cdf(xs: Seq[Double], v: Double) = xs.count(_ <= v).toDouble / xs.size
      val support = (a ++ b).distinct.sorted
      // W1 = sum over gaps of |F1-F2| at the left point x gap width
      val bruteW1 = support.sliding(2).map {
        case Seq(lo, hi) => math.abs(cdf(a, lo) - cdf(b, lo)) * (hi - lo)
        case _ => 0.0
      }.sum
      val w1 = graft.ops.Profiling.wasserstein1(a.toDF("v"), b.toDF("v"), "v")
        .head().getDouble(0)
      assert(math.abs(w1 - bruteW1) < 1e-6, s"seed=$seed: w1=$w1 brute=$bruteW1")
      // CvM = n1 n2 / N^2 * sum over POOLED OBS of (F1-F2)^2
      val n1 = a.size.toDouble; val n2 = b.size.toDouble; val nn = n1 + n2
      val bruteCvm = (a ++ b).map(v =>
        math.pow(cdf(a, v) - cdf(b, v), 2)).sum * (n1 * n2 / (nn * nn))
      val cvm = graft.ops.Profiling.cramerVonMises(a.toDF("v"), b.toDF("v"), "v")
        .head().getDouble(0)
      assert(math.abs(cvm - bruteCvm) < 1e-6,
        s"seed=$seed: cvm=$cvm brute=$bruteCvm")
    }
  }

  test("youdenThreshold == brute-force cutoff sweep on random scores (3 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (seed <- Seq(7, 29, 53)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(300)((rnd.nextInt(50).toDouble,
        rnd.nextDouble() < 0.4))
      val df = rows.toDF("s", "y")
      val got = graft.ops.Classifier.youdenThreshold(df, col("s"), col("y"))
        .head()
      val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
      val cands = rows.map(_._1).distinct.sorted
      val best = cands.map { t =>
        val j = pos.count(_ >= t).toDouble / pos.size -
          neg.count(_ >= t).toDouble / neg.size
        (t, j)
      }.sortBy { case (t, j) => (-j, t) }.head
      assert(got.getAs[Double]("threshold") == best._1 &&
        math.abs(got.getAs[Double]("j") - best._2) < 1e-12,
        s"seed=$seed: got=$got brute=$best")
    }
  }

  test("isotonicCalibration == sequential PAV on random level rates (3 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (seed <- Seq(2, 13, 31)) {
      val rnd = new scala.util.Random(seed)
      val k = 10
      // random occupied levels with random weights/rates
      val levels = (0 until k).filter(_ => rnd.nextDouble() < 0.8).map { l =>
        val n = 1 + rnd.nextInt(20)
        (l, n, rnd.nextInt(n + 1))
      }
      val rows = levels.flatMap { case (l, n, pos) =>
        (0 until n).map(i => ((l + 0.5) / k, i < pos)) }
      val got = graft.ops.Classifier.isotonicCalibration(
          rows.toDF("p", "y"), col("p"), col("y"), k = k)
        .orderBy("bin").collect()
        .map(r => r.getInt(0) -> r.getAs[Double]("iso_p")).toMap
      // sequential pool-adjacent-violators reference
      case class Block(w: Long, pos: Long)
      var stack = List.empty[(List[Int], Block)]
      levels.foreach { case (l, n, pos) =>
        var cur = (List(l), Block(n, pos))
        while (stack.nonEmpty && {
          val (_, top) = stack.head
          top.pos.toDouble / top.w >= cur._2.pos.toDouble / cur._2.w
        }) {
          val (ls, top) = stack.head
          stack = stack.tail
          cur = (ls ++ cur._1, Block(top.w + cur._2.w, top.pos + cur._2.pos))
        }
        stack = cur :: stack
      }
      val ref = stack.flatMap { case (ls, b) =>
        ls.map(_ -> b.pos.toDouble / b.w) }.toMap
      levels.foreach { case (l, _, _) =>
        assert(math.abs(got(l) - ref(l)) < 1e-12,
          s"seed=$seed level=$l: got=${got(l)} pav=${ref(l)}")
      }
    }
  }

  test("benjaminiHochberg == reference step-up on random p-values (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(3, 23, 43)) {
      val rnd = new scala.util.Random(seed)
      val pv = (1 to 25).map(i => (s"s$i", rnd.nextDouble()))
      val alpha = 0.2
      val got = graft.ops.Profiling.benjaminiHochberg(
          pv.toDF("stratum", "p"), "stratum", "p", alpha)
        .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
      val sorted = pv.sortBy { case (k, p) => (p, k) }
      val kMax = sorted.zipWithIndex
        .filter { case ((_, p), i) => p <= alpha * (i + 1) / 25.0 }
        .map(_._2 + 1).lastOption.getOrElse(0)
      val ref = sorted.zipWithIndex
        .map { case ((k, _), i) => k -> (i + 1 <= kMax) }.toMap
      assert(got == ref, s"seed=$seed: got=$got ref=$ref")
    }
  }

  test("kaplanMeier == reference product-limit estimator on random lifetimes (3 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = 1700000000000L
    for (seed <- Seq(11, 29, 59)) {
      val rnd = new scala.util.Random(seed)
      // lifetimes in ms; the sentinel user pins the log end far out so
      // censoring is exactly "last event within 1h of the end"
      val endMs = 100000000L
      val users = (1L to 120L).map { u =>
        val life = (rnd.nextInt(20) + 1) * 3600000L +
          (if (rnd.nextBoolean()) endMs - (rnd.nextInt(20) + 1) * 3600000L else 0L)
        (u, math.min(life, endMs))
      }
      val ev = users.flatMap { case (u, life) => Seq(
        (u * 2, new java.sql.Timestamp(base), u, "e"),
        (u * 2 + 1, new java.sql.Timestamp(base + life), u, "e"))
      } :+ ((9999L, new java.sql.Timestamp(base + endMs), 9999L, "e"))
      val df = ev.toDF("event_id", "ts", "user_id", "event_type")
      val got = graft.ops.EventAnalytics.kaplanMeier(df, col("user_id"),
          col("ts"), "1 hour")
        .orderBy("t").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).toMap
      // reference product-limit over the same lifetime/censor marks
      // (the single-event sentinel has lifetime 0 and sits at the log
      // edge -> censored at 0)
      val marks = (users.map { case (_, life) =>
        (life, life < endMs - 3600000L)
      } :+ ((0L, false))).sortBy(_._1)
      val times = marks.map(_._1).distinct.sorted
      var s = 1.0
      val ref = times.map { t =>
        val atRisk = marks.count(_._1 >= t)
        val deaths = marks.count(m => m._1 == t && m._2)
        if (deaths > 0) s = s * (1.0 - deaths.toDouble / atRisk)
        t -> s
      }.toMap
      times.foreach { t =>
        assert(math.abs(got(t) - ref(t)) < 1e-9,
          s"seed=$seed t=$t: got=${got(t)} ref=${ref(t)}")
      }
    }
  }

  test("triangleStats == brute-force triangle/wedge census on random graphs (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(9, 21, 51)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      val got = graft.ops.Graph.triangleStats(
        edges.toDF("src", "dst"), "src", "dst").head()
      val undirected = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val nodes = undirected.flatMap(e => Seq(e._1, e._2))
      def adj(a: Long, b: Long) =
        undirected((math.min(a, b), math.max(a, b)))
      val ns = nodes.toSeq.sorted
      val tri = (for {
        i <- ns.indices; j <- (i + 1) until ns.size; k <- (j + 1) until ns.size
        if adj(ns(i), ns(j)) && adj(ns(j), ns(k)) && adj(ns(i), ns(k))
      } yield 1).size
      val wedges = ns.map { v =>
        val d = ns.count(u => u != v && adj(u, v)).toLong; d * (d - 1) / 2
      }.sum
      assert(got.getLong(0) == nodes.size.toLong &&
        got.getLong(1) == undirected.size.toLong, s"seed=$seed sizes: $got")
      assert(got.getLong(2) == tri.toLong && got.getLong(3) == wedges,
        s"seed=$seed: got=$got tri=$tri wedges=$wedges")
    }
  }

  test("associationAudit == brute-force chi2/MI/entropies on random contingency data (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(4, 27, 61)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(400)((s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(3)}"))
      val got = graft.ops.Profiling.associationAudit(
        rows.toDF("x", "y"), "x", "y").head()
      val n = rows.size.toDouble
      val cells = rows.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val ra = rows.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val cb = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      val chi2 = cells.map { case ((a, b), o) =>
        val e = ra(a) * cb(b) / n; (o - e) * (o - e) / e
      }.sum + (for { a <- ra.keys; b <- cb.keys
        if !cells.contains((a, b)) } yield ra(a) * cb(b) / n).sum
      val mi = cells.map { case ((a, b), o) =>
        (o / n) * math.log(o * n / (ra(a) * cb(b))) }.sum
      val ha = -ra.values.map(c => (c / n) * math.log(c / n)).sum
      assert(math.abs(got.getDouble(3) - chi2) < 1e-6,
        s"seed=$seed chi2: ${got.getDouble(3)} vs $chi2")
      assert(math.abs(got.getDouble(5) - mi) < 1e-6,
        s"seed=$seed mi: ${got.getDouble(5)} vs $mi")
      assert(math.abs(got.getDouble(6) - ha) < 1e-6,
        s"seed=$seed h_a: ${got.getDouble(6)} vs $ha")
    }
  }

  test("transitionMatrix == brute per-user bigram counts on random logs (3 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = 1700000000000L
    for (seed <- Seq(6, 33, 57)) {
      val rnd = new scala.util.Random(seed)
      val ev = (1 to 300).map { i =>
        (i.toLong, new java.sql.Timestamp(base + i * 1000L),
          rnd.nextInt(8).toLong, s"e${rnd.nextInt(5)}")
      }
      val got = graft.ops.EventAnalytics.transitionMatrix(
          ev.toDF("event_id", "ts", "user_id", "event_type"),
          col("user_id"), col("ts"), col("event_type"), col("event_id"))
        .collect().map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getDouble(3)))).toMap
      val pairs = ev.groupBy(_._3).toSeq.flatMap { case (_, es) =>
        val seq = es.sortBy(e => (e._2.getTime, e._1)).map(_._4)
        seq.zip(seq.tail)
      }
      val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rowTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(got.keySet == cnt.keySet, s"seed=$seed key sets differ")
      cnt.foreach { case (k, c) =>
        assert(got(k)._1 == c &&
          got(k)._2 == c.toDouble / rowTot(k._1).toDouble,
          s"seed=$seed $k: ${got(k)} vs ($c, ${c.toDouble / rowTot(k._1)})")
      }
    }
  }

  test("epochOrder: every epoch a permutation under random seeds; same seed replays") {
    import spark.implicits._
    for (seed <- Seq(1L, 99L)) {
      val docs = (1L to 64L).toDF("doc_id")
      val runs = (1 to 2).map { _ =>
        graft.ops.Sampling.epochOrder(docs.repartition(5), col("doc_id"),
            epochs = 2, seed = seed)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      }
      assert(runs(0) == runs(1), s"seed=$seed must replay identically")
      (0 to 1).foreach { e =>
        val pos = runs(0).filter(_._2 == e).map(_._3)
        assert(pos == (1L to 64L).toSet, s"epoch $e not a permutation")
      }
    }
  }

  test("ZOrder.interleave is monotone along each axis with the other fixed") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val fixed = rnd.nextInt(256).toLong
    val xs = (0L until 256L)
    val zx = xs.toDF("x")
      .select(graft.functions.ZOrder.interleave(
        Seq(col("x"), lit(fixed)), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zx == zx.sorted, "z must grow with x when y is fixed")
    val zy = xs.toDF("y")
      .select(graft.functions.ZOrder.interleave(
        Seq(lit(fixed), col("y")), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zy == zy.sorted, "z must grow with y when x is fixed")
  }

  test("aspectRatioBatches bucket == brute-force fraction compare on random dims") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dims = Seq.tabulate(120)(i =>
      (i.toLong, 1 + rnd.nextInt(64), 1 + rnd.nextInt(64)))
    val edges = Seq((1L, 2L), (1L, 1L), (3L, 2L))
    val got = graft.ops.Packing.aspectRatioBatches(dims.toDF("id", "w", "h"),
        col("w"), col("h"), col("id"), batchSize = 8, edges, seed = 3L)
      .select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    dims.foreach { case (id, w, h) =>
      val want = edges.count { case (p, q) => w.toLong * q > p * h }
      assert(got(id) == want, s"id=$id ${w}x$h: got ${got(id)} want $want")
    }
  }

  test("groupedKs per stratum == global ksTest run stratum-by-stratum (random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val strata = Seq("s1", "s2", "s3")
    val aRows = strata.flatMap(g => Seq.fill(80)((g, rnd.nextInt(30).toDouble)))
    val bRows = strata.flatMap(g =>
      Seq.fill(60)((g, rnd.nextInt(30).toDouble + (if (g == "s2") 10 else 0))))
    val grouped = graft.ops.Profiling.groupedKs(
        aRows.toDF("g", "v"), bRows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    strata.foreach { g =>
      val solo = graft.ops.Profiling.ksTest(
        aRows.filter(_._1 == g).map(_._2).toDF("v"),
        bRows.filter(_._1 == g).map(_._2).toDF("v"), "v").head()
      assert(grouped(g)._1 == solo.getDouble(0) &&
        grouped(g)._2 == solo.getDouble(1),
        s"stratum $g: grouped ${grouped(g)} vs solo $solo")
    }
  }

  test("htEstimate on a certain sample (p=1 everywhere) reproduces the exact total") {
    import spark.implicits._
    // constant weights => p = min(1, 1.0 * w/mean) = 1 for every row
    val docs = (1L to 500L).map(i => (i, 40L)).toDF("doc_id", "n")
    val sample = graft.ops.Sampling.weightedSample(docs, col("doc_id"),
      col("n"), rate = 1.0, seed = 9L)
    assert(sample.count() == 500L, "p=1 keeps every row")
    val est = graft.ops.Sampling.htEstimate(sample, col("n"),
      col("sample_p")).head()
    assert(est.getDouble(0) == 500.0 * 40.0, s"certain total exact: $est")
    assert(est.getDouble(1) == 0.0, s"zero variance at p=1: $est")
  }

  test("Misra-Gries guarantees hold on random zipf-ish streams across random k and partitionings") {
    import spark.implicits._
    for (seed <- Seq(7, 31, 99)) {
      val rnd = new scala.util.Random(seed)
      val k = 3 + rnd.nextInt(20)
      val parts = 1 + rnd.nextInt(16)
      // zipf-ish: key j drawn with weight ~ 1/(j+1)
      val keys = (1 to 5000).map { _ =>
        val u = rnd.nextDouble()
        s"k${math.min((1.0 / (u + 0.02)).toInt, 49)}"
      }
      val df = keys.toDF("s").repartition(parts)
      val out = Profiling.heavyHitters(df, col("s"), k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = keys.size.toLong
      assert(out.length <= k, s"seed=$seed k=$k: state ${out.length} > k")
      val errBound = if (out.nonEmpty) out.head._3 else 0L
      assert(errBound <= n / (k + 1), s"seed=$seed: errBound $errBound")
      out.foreach { case (item, est, _) =>
        assert(est <= truth(item), s"seed=$seed $item over-counts")
        assert(truth(item) - est <= errBound,
          s"seed=$seed $item under-counts past bound")
      }
      val mustHave = truth.filter(_._2 > n / (k + 1)).keySet
      assert(mustHave.subsetOf(out.map(_._1).toSet),
        s"seed=$seed k=$k missing: ${mustHave -- out.map(_._1).toSet}")
    }
  }

  test("CUSUM prefix-min identity == sequential recursion on random series") {
    import spark.implicits._
    val h0 = 1700000000000L
    for (seed <- Seq(13, 57)) {
      val rnd = new scala.util.Random(seed)
      val counts = Seq.fill(40)(rnd.nextInt(12))
      val rows = counts.zipWithIndex.flatMap { case (n, hr) =>
        (1 to n).map(i => ((hr * 100 + i).toLong,
          new java.sql.Timestamp(h0 + hr * 3600000L + i * 1000L),
          1L, "e", 1.0))
      }
      // random gaps: drop two whole hours' events (spine must re-fill)
      val g1 = rnd.nextInt(40); val g2 = rnd.nextInt(40)
      val kept = rows.filterNot { r =>
        val hr = ((r._2.getTime - h0) / 3600000L).toInt
        hr == g1 || hr == g2
      }
      val ev = kept.toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = graft.ops.EventAnalytics
        .cusumChangePoints(ev, "1 hour", k = 4L, h = 8L)
        .orderBy("wstart").collect()
      val effective = counts.zipWithIndex.map { case (n, hr) =>
        if (hr == g1 || hr == g2) 0 else n }
      // the spine spans first..last NON-EMPTY hour
      val first = effective.indexWhere(_ > 0)
      val last = effective.lastIndexWhere(_ > 0)
      val window = effective.slice(first, last + 1)
      assert(out.length == window.size, s"seed=$seed: ${out.length} vs ${window.size}")
      var s = 0L
      window.zip(out).foreach { case (n, r) =>
        s = math.max(0L, s + n - 4L)
        assert(r.getAs[Long]("cusum") == s,
          s"seed=$seed at ${r.getAs[java.sql.Timestamp]("wstart")}")
        assert(r.getAs[Boolean]("changed") == (s > 8L))
      }
    }
  }

  test("fixMojibake round-trips random latin text through both mis-decodes; idempotent; ASCII fixed point") {
    import spark.implicits._
    import java.nio.charset.{Charset, StandardCharsets}
    // alphabet: ASCII + latin-1 accents + cp1252-remap punctuation,
    // avoiding chars whose UTF-8 bytes hit cp1252's five holes (the
    // unrecoverable-in-principle class the golden spec covers) — é’s
    // bytes are C3 A9, —'s E2 80 94, ‘’“ are E2 80 98/99/9C: all safe;
    // ” (E2 80 9D) is NOT and stays out of the generator
    val alphabet = ("abc XYZ09.,!?" + "éàüïôçñ" + "—–‘’“…€").toCharArray
    for (seed <- Seq(5, 17, 91)) {
      val rnd = new scala.util.Random(seed)
      val strs = Seq.tabulate(40) { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(30))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      }
      def enc(s: String, cs: Charset) =
        new String(s.getBytes(StandardCharsets.UTF_8), cs)
      val rows = strs.flatMap { case (i, s) =>
        Seq((i * 4, s, enc(s, Charset.forName("windows-1252"))),
          (i * 4 + 1, s, enc(s, StandardCharsets.ISO_8859_1)),
          // clean text must be a fixed point
          (i * 4 + 2, s, s),
          // pure-ASCII projection is trivially a fixed point
          (i * 4 + 3, s.filter(_ < 128), s.filter(_ < 128)))
      }
      val out = rows.toDF("id", "want", "broken")
        .select(col("id"), col("want"),
          TextAnalysis.fixMojibake(col("broken")).as("fixed"))
        .collect()
      out.foreach { r =>
        assert(r.getString(2) == r.getString(1),
          s"seed=$seed id=${r.getLong(0)}: '${r.getString(2)}' != '${r.getString(1)}'")
      }
      // idempotence over the whole batch
      val twice = rows.toDF("id", "want", "broken")
        .select(TextAnalysis.fixMojibake(
          TextAnalysis.fixMojibake(col("broken"))).as("f2"), col("want"))
        .collect()
      twice.foreach(r => assert(r.getString(0) == r.getString(1)))
    }
  }

  test("CMS merge == rebuild on random splits, any merge order") {
    import spark.implicits._
    for (seed <- Seq(7, 31)) {
      val rnd = new scala.util.Random(seed)
      val terms = Seq.fill(200)(s"t${rnd.nextInt(40)}")
      val parts = terms.grouped(70).toSeq
      def sk(xs: Seq[String]) =
        Profiling.cmsSketch(xs.toDF("term"), col("term"), 64, 4)
      def cs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val full = cs(sk(terms))
      val fwd = cs(Profiling.cmsMerge(parts.map(sk): _*))
      val rev = cs(Profiling.cmsMerge(parts.reverse.map(sk): _*))
      assert(fwd == full && rev == full,
        s"seed=$seed: merge must equal rebuild in any order")
    }
  }

  test("cmsJoinSize upper-bounds the exact join size on random multisets") {
    import spark.implicits._
    for (seed <- Seq(3, 13, 29)) {
      val rnd = new scala.util.Random(seed)
      val a = Seq.fill(150)(rnd.nextInt(40).toLong)
      val b = Seq.fill(200)(rnd.nextInt(40).toLong)
      val exact = (0 until 40).map(k =>
        a.count(_ == k).toLong * b.count(_ == k)).sum
      val est = Profiling.cmsJoinSize(
          Profiling.cmsSketch(a.toDF("k"), col("k"), 65536, 4),
          Profiling.cmsSketch(b.toDF("k"), col("k"), 65536, 4))
        .select("est_join_size").head().getLong(0)
      assert(est >= exact, s"seed=$seed: CM inner product must over-estimate")
      // 40 keys in 65536 buckets: collision-free, so exact
      assert(est == exact, s"seed=$seed: $est vs $exact")
    }
  }

  test("doremiWeights closed form == explicit EG iteration on random loss grids") {
    import spark.implicits._
    for (seed <- Seq(17, 41)) {
      val rnd = new scala.util.Random(seed)
      val doms = Seq("a", "b", "c", "d")
      val rounds = 0 until 5
      val loss = (for (d <- doms; t <- rounds)
        yield (d, t) -> (50L + rnd.nextInt(100))).toMap
      val rows = loss.toSeq.map { case ((d, t), l) => (d, t.toLong, l) }
      val out = Sampling.doremiWeights(rows.toDF("domain", "rnd", "loss"),
          col("domain"), col("rnd"), col("loss"), eta = 0.5, smoothing = 0.1)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("w_avg")).toMap
      // explicit iteration on the same round-6 excess grid
      var cum = doms.map(_ => 0.0)
      var wsum = doms.map(_ => 0.0)
      for (t <- rounds) {
        val ls = doms.map(d => loss((d, t)).toDouble)
        val mean = ls.sum / doms.size
        val ex = ls.map(l => math.rint((l / mean - 1.0) * 1e6) / 1e6)
        cum = cum.zip(ex).map { case (c, e) => c + e }
        val u = cum.map(c => math.exp(0.5 * c))
        val z = u.sum
        wsum = wsum.zip(u).map { case (w, uu) => w + uu / z }
      }
      doms.zip(wsum.map(w => math.rint(w / rounds.size * 1e6) / 1e6))
        .foreach { case (d, e) =>
          assert(math.abs(out(d) - e) < 2e-6, s"seed=$seed domain=$d: ${out(d)} vs $e")
        }
      assert(math.abs(out.values.sum - 1.0) < 1e-4)
    }
  }

  test("knnShapley == subset-enumeration Shapley on random labelings") {
    import spark.implicits._
    def fact(x: Int): Double = (1 to x).foldLeft(1.0)(_ * _)
    for (seed <- Seq(9, 27); k <- Seq(1, 3)) {
      val rnd = new scala.util.Random(seed)
      val n = 7
      val angles = Seq.tabulate(n)(i => 0.05 + i * 0.09)
      val labels = Seq.fill(n)(rnd.nextInt(3))
      val qLabel = rnd.nextInt(3)
      val train = angles.zipWithIndex.map { case (a, i) =>
        (i.toLong, Seq(math.cos(a), math.sin(a)), labels(i))
      }.toDF("vec_id", "embedding", "label")
      val q = Seq((99L, Seq(1.0, 0.0), qLabel)).toDF("vec_id", "embedding", "label")
      val out = Similarity.knnShapley(train, "vec_id", "embedding", "label",
          q, "vec_id", "embedding", "label", k)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val matches = labels.map(_ == qLabel)
      def v(s: Seq[Int]): Double = s.sorted.take(k).count(matches).toDouble / k
      val expect = (0 until n).map { i =>
        val rest = (0 until n).filterNot(_ == i)
        (0 to rest.size).flatMap(sz => rest.combinations(sz)).map { s =>
          fact(s.size) * fact(n - s.size - 1) / fact(n) *
            (v(s.toSeq :+ i) - v(s.toSeq))
        }.sum
      }
      (0 until n).foreach { i =>
        assert(math.abs(out(i.toLong) - expect(i)) < 1e-5,
          s"seed=$seed k=$k pos=$i: ${out(i.toLong)} vs ${expect(i)}")
      }
    }
  }

  test("plackettLuce at J=2 == bradleyTerry on random match sets") {
    import spark.implicits._
    for (seed <- Seq(21, 37)) {
      val rnd = new scala.util.Random(seed)
      val ms = Seq.fill(40) {
        val w = rnd.nextInt(5); var l = rnd.nextInt(5)
        while (l == w) l = rnd.nextInt(5)
        (w.toString, l.toString)
      }
      val bt = Classifier.bradleyTerry(ms.toDF("w", "l"), "w", "l", iters = 3)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("rating")).toMap
      val rk = ms.zipWithIndex.flatMap { case ((w, l), g) =>
        Seq((g.toLong, w, 1L), (g.toLong, l, 2L)) }
      val pl = Classifier.plackettLuce(rk.toDF("g", "item", "pos"),
          "g", "item", "pos", iters = 3)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("rating")).toMap
      bt.foreach { case (item, r) =>
        assert(math.abs(pl(item) - r) <= 1e-9 * math.max(1.0, math.abs(r)),
          s"seed=$seed item=$item: ${pl(item)} vs $r")
      }
    }
  }

  test("ratioMetricTest == direct delta-method computation on random unit tables") {
    import spark.implicits._
    for (seed <- Seq(15, 33)) {
      val rnd = new scala.util.Random(seed)
      val units = Seq.tabulate(30)(i =>
        (i.toLong, i % 2 == 0, 1L + rnd.nextInt(50), rnd.nextInt(20).toLong))
      val r = Profiling.ratioMetricTest(
        units.toDF("u", "g", "x", "y"), col("u"), col("g"),
        col("x"), col("y")).head()
      def hand(rows: Seq[(Long, Long)]): (Double, Double) = {
        val n = rows.size.toDouble
        val xb = rows.map(_._1).sum / n; val yb = rows.map(_._2).sum / n
        val ratio = yb / xb
        def sv(f: ((Long, Long)) => Double, g: ((Long, Long)) => Double) =
          (rows.map(t => f(t) * g(t)).sum -
            rows.map(f).sum * rows.map(g).sum / n) / (n - 1)
        (ratio, (sv(_._2.toDouble, _._2.toDouble)
          - 2 * ratio * sv(_._1.toDouble, _._2.toDouble)
          + ratio * ratio * sv(_._1.toDouble, _._1.toDouble)) / (n * xb * xb))
      }
      val (rt, vt) = hand(units.filter(_._2).map(t => (t._3, t._4)))
      val (rc, vc) = hand(units.filterNot(_._2).map(t => (t._3, t._4)))
      assert(math.abs(r.getAs[Double]("ratio_t") - rt) < 1e-6, s"seed=$seed")
      assert(math.abs(r.getAs[Double]("se") - math.sqrt(vt + vc)) < 1e-6)
      assert(math.abs(r.getAs[Double]("z") - (rt - rc) / math.sqrt(vt + vc)) < 1e-5)
    }
  }

}
