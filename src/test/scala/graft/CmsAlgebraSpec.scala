package graft

import org.apache.spark.sql.functions._
import graft.ops.{Profiling, Sampling, Similarity}

/** CMS sketch algebra (SURVEY §2 rows 90i7/90i8) and the DoReMi EG
  * mixture fit (84b6): merge==rebuild exactness, join-size estimation
  * bounds, and the closed-form EG recursion against an explicit
  * iteration replay. */
class CmsAlgebraSpec extends SparkTestBase {

  private def terms(rows: Seq[String]) = sqlDf("term" -> rows)

  private def counterSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  test("cmsMerge of a split corpus equals the full rebuild exactly") {
    val all = Seq("a", "b", "b", "c", "c", "c", "d", "e", "e", "f")
    val (p1, p2) = all.splitAt(4)
    val full = Profiling.cmsSketch(terms(all), col("term"), 64, 4)
    val merged = Profiling.cmsMerge(
      Profiling.cmsSketch(terms(p1), col("term"), 64, 4),
      Profiling.cmsSketch(terms(p2), col("term"), 64, 4))
    assert(counterSet(merged) == counterSet(full),
      "counter addition must reproduce the rebuilt sketch bit-for-bit")
    // and the probe through the merged sketch == cmsEstimates of the whole
    val cand = terms(Seq("a", "c", "e", "zzz"))
    val viaMerge = Profiling.cmsProbe(merged, cand, col("term"), 64, 4)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaFull = Profiling.cmsEstimates(terms(all), col("term"), cand, 64, 4)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaMerge == viaFull)
    // estimates are upper bounds; the absent key reports collision mass only
    val est = viaMerge.toMap
    assert(est("a") >= 1 && est("c") >= 3 && est("e") >= 2)
  }

  test("cmsJoinSize estimates the exact join size on a collision-free sketch") {
    // A: keys 1..10 once each; B: key k repeated k times
    // exact |A JOIN B| = sum f_A(k)*f_B(k) = 1+2+...+10 = 55
    val a = sqlDf("k" -> (1 to 10).map(_.toLong))
    val b = sqlDf("k" -> (1 to 10).flatMap(k => Seq.fill(k)(k.toLong)))
    val exact = a.join(b, "k").count()
    assert(exact == 55L)
    val sa = Profiling.cmsSketch(a, col("k"), 65536, 4)
    val sb = Profiling.cmsSketch(b, col("k"), 65536, 4)
    val out = Profiling.cmsJoinSize(sa, sb).orderBy("r").collect()
    assert(out.length == 4)
    val est = out.head.getAs[Long]("est_join_size")
    // every row's inner product over-estimates; min is the estimate
    out.foreach(r => assert(r.getAs[Long]("inner_product") >= exact))
    assert(out.forall(_.getAs[Long]("est_join_size") == est))
    // 20 distinct keys in 65536 buckets: collision-free, so exact
    assert(est == exact, s"wide sketch should be collision-free: $est")
  }

  test("cmsJoinSize on disjoint key sets estimates (near) zero") {
    val a = sqlDf("k" -> (1L to 20L))
    val b = sqlDf("k" -> (1001L to 1020L))
    val est = Profiling.cmsJoinSize(
        Profiling.cmsSketch(a, col("k"), 65536, 4),
        Profiling.cmsSketch(b, col("k"), 65536, 4))
      .select("est_join_size").head().getLong(0)
    assert(est <= 2L, s"disjoint keys should estimate ~0 joins, got $est")
  }

  test("self-application estimates F2 (self-join size) exactly when clean") {
    val b = sqlDf("k" -> (1 to 10).flatMap(k => Seq.fill(k)(k.toLong)))
    val sk = Profiling.cmsSketch(b, col("k"), 65536, 4)
    val est = Profiling.cmsJoinSize(sk, sk)
      .select("est_join_size").head().getLong(0)
    val f2 = (1 to 10).map(k => k.toLong * k).sum // 385
    assert(est >= f2, "F2 estimate must upper-bound the true moment")
    assert(est == f2, s"collision-free sketch should be exact: $est vs $f2")
  }

  test("joinPlan issues all three verdicts on crafted shapes") {
    import graft.ops.Profiling
    val tiny = sqlDf("k" -> (1L to 2L))
    val mid = sqlDf("k" -> (1L to 5L))
    val hot = sqlDf("k" -> Seq.fill(8)(1L)) // one hot key
    // a fits the budget -> broadcast the small side
    val p1 = Profiling.joinPlan(tiny, col("k"), mid, col("k"),
      broadcastRows = 2L).head()
    assert(p1.getAs[String]("strategy") == "broadcast_a")
    assert(p1.getAs[Long]("n_a") == 2L && p1.getAs[Long]("n_b") == 5L)
    // neither side fits, one hot key explodes the output -> salt
    val p2 = Profiling.joinPlan(hot, col("k"),
      sqlDf("k" -> Seq.fill(5)(1L)), col("k"),
      broadcastRows = 2L, fanoutFactor = 1.0).head()
    assert(p2.getAs[Long]("est_join_size") == 40L, "8x5 on one key = 40")
    assert(p2.getAs[String]("strategy") == "salt_or_bucket")
    // neither fits, benign 1:1 overlap -> plain shuffle
    val p3 = Profiling.joinPlan(mid, col("k"),
      sqlDf("k" -> (1L to 8L)), col("k"),
      broadcastRows = 2L, fanoutFactor = 1.0).head()
    assert(p3.getAs[Long]("est_join_size") == 5L)
    assert(p3.getAs[String]("strategy") == "shuffle_hash")
  }

  // ---- CmsStream ----------------------------------------------------------

  test("CmsStream fold == batch rebuild, replay no-ops, refusals are loud") {
    import graft.streaming.CmsStream
    val all = Seq("a", "b", "b", "c", "c", "c", "d", "e", "e", "f",
      "g", "g", "g", "g", "h")
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_spec").toString
    val batches = all.grouped(5).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      CmsStream.mergeBatch(terms(b), col("term"), 64, 4, dir, i.toLong)
    }
    // standing counter table is bit-identical to the batch rebuild
    val standing = counterSet(CmsStream.standingSketch(spark, dir, 64, 4))
    val rebuilt = counterSet(Profiling.cmsSketch(terms(all), col("term"), 64, 4))
    assert(standing == rebuilt, "exact addition must reproduce the rebuild")
    // probe through the standing sketch == the one-shot batch estimate
    val cand = terms(Seq("c", "g", "zzz"))
    val viaStream = CmsStream.standingEstimates(spark, dir, cand, col("term"), 64, 4)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaBatch = Profiling.cmsEstimates(terms(all), col("term"), cand, 64, 4)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaStream == viaBatch)
    // replaying an already-merged batch id must not double-count
    CmsStream.mergeBatch(terms(batches.head), col("term"), 64, 4, dir, 0L)
    assert(counterSet(CmsStream.standingSketch(spark, dir, 64, 4)) == rebuilt,
      "replayed batch id must be skipped")
    // geometry mismatch refuses loudly
    val geo = intercept[IllegalArgumentException] {
      CmsStream.mergeBatch(terms(Seq("x")), col("term"), 128, 4, dir, 9L)
    }
    assert(geo.getMessage.contains("geometry"))
    // foreign bytes refuse loudly (SketchIO envelope) — written via
    // the Hadoop FS so the local-FS checksum sidecar stays consistent;
    // a FRESH dir so the junk reads as the (legacy, fixed-name) head
    // instead of being shadowed by the versioned files above
    val conf = spark.sessionState.newHadoopConf()
    val dir2 = java.nio.file.Files.createTempDirectory("graft_cms_env").toString
    val p = new org.apache.hadoop.fs.Path(dir2, "_cms_sketch.bin")
    val o = p.getFileSystem(conf).create(p, true)
    try o.write("not a sketch".getBytes("UTF-8")) finally o.close()
    val env = intercept[IllegalArgumentException] {
      CmsStream.standingSketch(spark, dir2, 64, 4)
    }
    assert(env.getMessage.contains("envelope"))
    // stream-id arbitration: a fold under a different id than the
    // standing state refuses loudly (the fresh-checkpoint-restart
    // hazard: batch ids restart at 0 and would be dropped silently)
    val dir3 = java.nio.file.Files.createTempDirectory("graft_cms_sid").toString
    CmsStream.mergeBatch(terms(Seq("a")), col("term"), 64, 4, dir3, 0L,
      streamId = "runA")
    val sid = intercept[IllegalArgumentException] {
      CmsStream.mergeBatch(terms(Seq("b")), col("term"), 64, 4, dir3, 0L,
        streamId = "runB")
    }
    assert(sid.getMessage.contains("runA") && sid.getMessage.contains("runB"))
    // the n in the envelope counts every row the sketch hashed — null
    // keys too (concat_ws drops the null, so they land in the
    // r-string bucket), keeping metadata and counter mass in agreement
    val withNull = terms(Seq("x", "y")).unionByName(
      terms(Seq("z")).select(lit(null).cast("string").as("term")))
    val dir4 = java.nio.file.Files.createTempDirectory("graft_cms_n").toString
    CmsStream.mergeBatch(withNull, col("term"), 64, 4, dir4, 0L)
    val (counters4, n4, _) = CmsStream.readStanding(conf, dir4, 64, 4)
    assert(n4 == 3L, "n must count null-keyed rows the sketch hashed")
    assert(counters4.values.sum == 3L * 4, "counter mass = n × depth")
  }

  test("MonitorStateIO arbiter: concurrent publish of one version loses loudly") {
    import graft.streaming.MonitorStateIO
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("graft_msio").toString
    MonitorStateIO.publish(conf, dir, "_x_state", Array[Byte](1, 2), 0L)
    MonitorStateIO.publish(conf, dir, "_x_state", Array[Byte](3, 4), 1L)
    // two writers that both read v1 race to publish v2: the second
    // rename-to-existing refuses loudly instead of losing the winner's
    // fold to a read-modify-write overwrite
    MonitorStateIO.publish(conf, dir, "_x_state", Array[Byte](5), 2L)
    val race = intercept[IllegalStateException] {
      MonitorStateIO.publish(conf, dir, "_x_state", Array[Byte](6), 2L)
    }
    assert(race.getMessage.contains("concurrent writer"))
    // the winner's bytes survive; the loser's tmp is cleaned up
    val (bytes, v) = MonitorStateIO.readLatest(conf, dir, "_x_state").get
    assert(v == 2L && bytes.toSeq == Seq[Byte](5))
    val leftovers = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, "loser must clean its staged tmp")
    // prune keeps exactly the last two versions (ignore the local-FS
    // .crc checksum sidecars Hadoop leaves beside each file)
    val kept = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.endsWith(".bin")).sorted.toSeq
    assert(kept == Seq("_x_state.v000001.bin", "_x_state.v000002.bin"))
  }

  // ---- doremiWeights ------------------------------------------------------

  private def mix(rows: Seq[(String, Int, Long)]) =
    sqlDf("domain" -> rows.map(_._1), "rnd" -> rows.map(_._2.toLong),
      "loss" -> rows.map(_._3))

  test("doremiWeights: uniform loss yields the uniform mixture") {
    val rows = for (d <- Seq("a", "b", "c"); t <- 0 until 4) yield (d, t, 100L)
    val out = Sampling.doremiWeights(mix(rows), col("domain"), col("rnd"),
        col("loss")).orderBy("domain").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("w_avg") - 1.0 / 3) < 1e-5)
      assert(math.abs(r.getAs[Double]("doremi_weight") - 1.0 / 3) < 1e-5)
    }
  }

  test("doremiWeights: a persistently hot domain gains share; sums stay 1") {
    val rows = for (d <- Seq("a", "b", "c"); t <- 0 until 4)
      yield (d, t, if (d == "b") 200L else 100L)
    val out = Sampling.doremiWeights(mix(rows), col("domain"), col("rnd"),
        col("loss"), eta = 0.5, smoothing = 0.1)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getAs[Double]("w_avg"),
        r.getAs[Double]("doremi_weight"))).toSeq
    val m = out.map(t => t._1 -> t._2).toMap
    assert(m("b") > m("a") && m("a") == m("c"),
      s"hot domain must out-weigh the cool ones: $out")
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-4, "w_avg sums to 1")
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4, "smoothed mixture sums to 1")
    // smoothing floor: no domain below c/K
    out.foreach(t => assert(t._3 >= 0.1 / 3 - 1e-9))

    // closed form == the explicit per-round EG iteration, replayed in Scala
    val domains = Seq("a", "b", "c")
    val excess = domains.map { d =>
      val mean = (200.0 + 100.0 + 100.0) / 3
      val l = if (d == "b") 200.0 else 100.0
      math.rint((l / mean - 1.0) * 1e6) / 1e6
    }
    var cum = Seq(0.0, 0.0, 0.0)
    var wsum = Seq(0.0, 0.0, 0.0)
    for (_ <- 0 until 4) {
      cum = cum.zip(excess).map { case (c, e) => c + e }
      val u = cum.map(c => math.exp(0.5 * c))
      val z = u.sum
      wsum = wsum.zip(u).map { case (w, uu) => w + uu / z }
    }
    val expectAvg = wsum.map(w => math.rint(w / 4 * 1e6) / 1e6)
    domains.zip(expectAvg).foreach { case (d, e) =>
      assert(math.abs(m(d) - e) < 1e-9,
        s"closed form diverges from the explicit iteration for $d: ${m(d)} vs $e")
    }
  }

  test("analyzeTable: exact regime stats, nulls counted, sidecar round-trips") {
    import graft.ops.Profiling
    val df = sqlDf("a" -> Seq[Any](1L, 2L, 2L, 3L, null),
      "s" -> Seq[Any]("x", "y", "x", null, "z"))
    val stats = Profiling.analyzeTable(df, Seq("a", "s"), k = 16)
      .orderBy("column").collect()
    val a = stats(0); val s = stats(1)
    assert(a.getString(0) == "a" && a.getLong(1) == 5L && a.getLong(2) == 1L)
    assert(a.getDouble(3) == 3.0, "4 non-null values, 3 distinct -> exact NDV")
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 3.0)
    assert(s.getLong(2) == 1L && s.getDouble(3) == 3.0)
    assert(s.isNullAt(4) && s.isNullAt(5), "non-numeric column has no min/max")
    // sidecar round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    Profiling.writeTableStats(Profiling.analyzeTable(df, Seq("a", "s"), k = 16), dir)
    val back = Profiling.readTableStats(spark, dir).orderBy("column").collect()
    assert(back.map(_.toSeq).toSeq == stats.map(_.toSeq).toSeq)
  }

  // ---- cupedLift / sprt ----------------------------------------------------

  test("cupedLift removes covariate-explained variance from the lift") {
    import graft.ops.Profiling
    // 8 units; outcome y = x + armEffect: the covariate explains all
    // within-arm variance, so theta = 1, rho2 high, and the CUPED lift
    // equals the true effect exactly while the raw lift is confounded
    // by the arms' unequal covariate draw
    val units = Seq(
      // (unit, treated, x, y = x + 3 if treated else x)
      (1L, true, 10L, 13L), (2L, true, 20L, 23L),
      (3L, true, 30L, 33L), (4L, true, 40L, 43L),
      (5L, false, 30L, 30L), (6L, false, 40L, 40L),
      (7L, false, 50L, 50L), (8L, false, 60L, 60L))
    val df = sqlDf("u" -> units.map(_._1), "g" -> units.map(_._2),
      "x" -> units.map(_._3), "y" -> units.map(_._4))
    val r = Profiling.cupedLift(df, col("u"), col("g"), col("x"), col("y"))
      .head()
    assert(r.getAs[Long]("n_units") == 8L)
    // pooled theta: y = x + 1.5g-ish; cov/var on the pooled data
    val xs = units.map(_._3.toDouble); val ys = units.map(_._4.toDouble)
    val n = xs.size
    val cov = xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum / n
    val vx = xs.map(a => a * a).sum - xs.sum * xs.sum / n
    val theta = cov / vx
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-6)
    val rawT = units.filter(_._2).map(_._4).sum / 4.0
    val rawC = units.filterNot(_._2).map(_._4).sum / 4.0
    assert(math.abs(r.getAs[Double]("lift_raw") - (rawT - rawC)) < 1e-6)
    val xT = units.filter(_._2).map(_._3).sum / 4.0
    val xC = units.filterNot(_._2).map(_._3).sum / 4.0
    val cuped = (rawT - rawC) - theta * (xT - xC)
    assert(math.abs(r.getAs[Double]("lift_cuped") - cuped) < 1e-6)
    // the adjusted lift is far closer to the true effect (+3) than raw
    assert(math.abs(cuped - 3.0) < math.abs((rawT - rawC) - 3.0))
    assert(r.getAs[Double]("rho2") > 0.8)
  }

  test("ratioMetricTest: delta-method moments match hand computation; degenerate arm is NULL") {
    import graft.ops.Profiling
    // unit grain: (unit, treated, views x, purchases y)
    val units = Seq(
      (1L, true, 10L, 4L), (2L, true, 20L, 6L), (3L, true, 30L, 12L),
      (4L, false, 10L, 2L), (5L, false, 20L, 5L), (6L, false, 40L, 8L))
    val df = sqlDf("u" -> units.map(_._1), "g" -> units.map(_._2),
      "x" -> units.map(_._3), "y" -> units.map(_._4))
    val r = Profiling.ratioMetricTest(df, col("u"), col("g"),
      col("x"), col("y")).head()
    def hand(rows: Seq[(Long, Long)]): (Double, Double) = {
      val n = rows.size.toDouble
      val xb = rows.map(_._1).sum / n; val yb = rows.map(_._2).sum / n
      val ratio = yb / xb
      def sv(f: ((Long, Long)) => Double, g: ((Long, Long)) => Double) =
        (rows.map(t => f(t) * g(t)).sum - rows.map(f).sum * rows.map(g).sum / n) / (n - 1)
      val (sxx, syy, sxy) = (sv(_._1.toDouble, _._1.toDouble),
        sv(_._2.toDouble, _._2.toDouble), sv(_._1.toDouble, _._2.toDouble))
      (ratio, (syy - 2 * ratio * sxy + ratio * ratio * sxx) / (n * xb * xb))
    }
    val (rt, vt) = hand(units.filter(_._2).map(t => (t._3, t._4)))
    val (rc, vc) = hand(units.filterNot(_._2).map(t => (t._3, t._4)))
    assert(math.abs(r.getAs[Double]("ratio_t") - rt) < 1e-6)
    assert(math.abs(r.getAs[Double]("ratio_c") - rc) < 1e-6)
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(vt + vc)) < 1e-6)
    assert(math.abs(r.getAs[Double]("z") -
      (rt - rc) / math.sqrt(vt + vc)) < 1e-5)
    // an arm with a zero denominator reads NULL, never a blow-up
    val degen = sqlDf("u" -> Seq(1L, 2L, 3L, 4L), "g" -> Seq(true, true, false, false),
      "x" -> Seq(0L, 0L, 5L, 7L), "y" -> Seq(1L, 2L, 1L, 1L))
    val dr = Profiling.ratioMetricTest(degen, col("u"), col("g"),
      col("x"), col("y")).head()
    assert(dr.isNullAt(dr.fieldIndex("ratio_t")) &&
      dr.isNullAt(dr.fieldIndex("z")) && !dr.isNullAt(dr.fieldIndex("ratio_c")))
  }

  test("sprt: decisive streams cross the right bound, boundary rate continues") {
    import graft.ops.EventAnalytics
    // three keyed Bernoulli series over 20 buckets x 10 obs each:
    // 'hot' all successes, 'cold' all failures, 'mid' exactly 1-in-5
    val rows = for {
      (k, hit) <- Seq(("hot", (i: Int) => true), ("cold", (_: Int) => false),
        ("mid", (i: Int) => i % 5 == 0))
      b <- 0 until 20; i <- 0 until 10
    } yield (k, b.toLong, hit(b * 10 + i))
    val df = sqlDf("k" -> rows.map(_._1), "h" -> rows.map(_._2),
      "ok" -> rows.map(_._3))
    val out = EventAnalytics.sprt(df, col("k"), col("h"), col("ok"),
        p0 = 0.18, p1 = 0.22)
      .collect().map(r => r.getString(0) ->
        (r.getString(4), Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(out("hot")._1 == "accept_h1" && out("hot")._2.exists(_ <= 2),
      s"an all-success stream must accept H1 within the first buckets: $out")
    assert(out("cold")._1 == "accept_h0" && out("cold")._2.nonEmpty)
    assert(out("mid")._1 == "continue" && out("mid")._2.isEmpty,
      s"a rate between p0 and p1 should keep sampling: ${out("mid")}")
  }

  test("SprtStream fold == batch verdict, replay no-ops, envelope refusal") {
    import graft.ops.EventAnalytics
    import graft.streaming.SprtStream
    val rows = for {
      (k, hit) <- Seq(("hot", (_: Int) => true), ("cold", (_: Int) => false))
      b <- 0 until 12; i <- 0 until 10
    } yield (k, b.toLong, hit(i), (b * 10 + i).toLong)
    val df = sqlDf("k" -> rows.map(_._1), "h" -> rows.map(_._2),
      "ok" -> rows.map(_._3), "id" -> rows.map(_._4))
    val dir = java.nio.file.Files.createTempDirectory("graft_sprt_spec").toString
    // arbitrary (non-time-ordered) batches: bucket straddling is fine
    (0L to 2L).foreach { b =>
      SprtStream.mergeBatch(df.filter(col("id") % 3 === b),
        col("k"), col("h"), col("ok"), dir, b)
    }
    def rowsOfV(v: org.apache.spark.sql.DataFrame) =
      v.orderBy("key").collect().map(_.toSeq).toSeq
    val standing = rowsOfV(SprtStream.standingVerdict(spark, dir, 0.18, 0.22))
    val batch = rowsOfV(EventAnalytics.sprt(df, col("k"), col("h"),
      col("ok"), 0.18, 0.22))
    assert(standing == batch, "standing verdict must equal the batch form")
    // replayed batch id must not double-count
    SprtStream.mergeBatch(df.filter(col("id") % 3 === 0),
      col("k"), col("h"), col("ok"), dir, 0L)
    assert(rowsOfV(SprtStream.standingVerdict(spark, dir, 0.18, 0.22)) == batch)
    // foreign bytes refuse loudly — a fresh dir so the junk reads as
    // the (legacy, fixed-name) head, not shadowed by versioned files
    val conf = spark.sessionState.newHadoopConf()
    val dir2 = java.nio.file.Files.createTempDirectory("graft_sprt_env").toString
    val p = new org.apache.hadoop.fs.Path(dir2, "_sprt_level.bin")
    val o = p.getFileSystem(conf).create(p, true)
    try o.write("junk".getBytes("UTF-8")) finally o.close()
    val env = intercept[IllegalArgumentException] {
      SprtStream.standingLevel(spark, dir2)
    }
    assert(env.getMessage.contains("envelope"))
    // the high-cardinality guard: a fact-sized key column fails the
    // fold LOUDLY with the shard recipe instead of ballooning driver
    // state (cap overridden downward — the production 4M default
    // would need a 4M-row batch to exercise)
    val dir3 = java.nio.file.Files.createTempDirectory("graft_sprt_cap").toString
    val cap = intercept[IllegalArgumentException] {
      SprtStream.mergeBatch(df, col("id"), col("h"), col("ok"), dir3, 0L,
        maxLevels = 16)
    }
    assert(cap.getMessage.contains("shard the monitor by key hash"))
    // stream-id arbitration (the fresh-checkpoint-restart hazard)
    val dir4 = java.nio.file.Files.createTempDirectory("graft_sprt_sid").toString
    SprtStream.mergeBatch(df, col("k"), col("h"), col("ok"), dir4, 0L,
      streamId = "runA")
    val sid = intercept[IllegalArgumentException] {
      SprtStream.mergeBatch(df, col("k"), col("h"), col("ok"), dir4, 1L,
        streamId = "runB")
    }
    assert(sid.getMessage.contains("runA") && sid.getMessage.contains("runB"))
  }

  // ---- plackettLuce --------------------------------------------------------

  test("plackettLuce at J=2 coincides with bradleyTerry") {
    import graft.ops.Classifier
    // 30 matches over 4 items with skewed win pattern
    val ms = (0 until 30).map { i =>
      val w = (i % 4).toString
      val l = ((i * 3 + 1) % 4).toString
      (w, l)
    }.filter { case (w, l) => w != l }
    val matches = sqlDf("w" -> ms.map(_._1), "l" -> ms.map(_._2))
    val rankings = sqlDf(
      "g" -> ms.indices.flatMap(i => Seq(i.toLong, i.toLong)),
      "item" -> ms.flatMap { case (w, l) => Seq(w, l) },
      "pos" -> ms.indices.flatMap(_ => Seq(1L, 2L)))
    val bt = Classifier.bradleyTerry(matches, "w", "l", iters = 4)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rating")).toMap
    val pl = Classifier.plackettLuce(rankings, "g", "item", "pos", iters = 4)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rating")).toMap
    assert(bt.keySet == pl.keySet)
    bt.foreach { case (item, r) =>
      assert(math.abs(pl(item) - r) <= 1e-9 * math.max(1.0, math.abs(r)),
        s"J=2 Plackett-Luce must collapse to Bradley-Terry: $item ${pl(item)} vs $r")
    }
  }

  test("plackettLuce: consistent first place dominates, constant last hits 0") {
    import graft.ops.Classifier
    // 10 rankings of (a, b, c), always in that order
    val rows = (0 until 10).flatMap(g =>
      Seq((g.toLong, "a", 1L), (g.toLong, "b", 2L), (g.toLong, "c", 3L)))
    val rk = sqlDf("g" -> rows.map(_._1), "item" -> rows.map(_._2),
      "pos" -> rows.map(_._3))
    val out = Classifier.plackettLuce(rk, "g", "item", "pos", iters = 5)
      .collect().map(r => (r.getString(0), r.getAs[Long]("wins"),
        r.getAs[Double]("rating"))).toSeq
    val m = out.map(t => t._1 -> t._3).toMap
    assert(m("a") > m("b") && m("b") > m("c"), s"order must hold: $m")
    assert(m("c") == 0.0, "an always-last item has zero wins -> MLE boundary 0")
    assert(out.find(_._1 == "a").get._2 == 10L)
    // mean-1 normalization invariant
    assert(math.abs(out.map(_._3).sum / out.size - 1.0) < 1e-9)
  }

  // ---- knnShapley ----------------------------------------------------------

  /** Exact Shapley by subset enumeration for the K-NN utility
    * v(S) = (1/K)·Σ_{j ≤ min(K,|S|)} 1[label_j = qlabel] with points
    * pre-sorted by similarity desc — the ground truth the closed
    * recursion must reproduce. */
  private def bruteShapley(matches: Seq[Boolean], k: Int): Seq[Double] = {
    val n = matches.size
    def fact(x: Int): Double = (1 to x).foldLeft(1.0)(_ * _)
    def v(s: Seq[Int]): Double =
      s.sorted.take(k).count(matches).toDouble / k
    (0 until n).map { i =>
      val rest = (0 until n).filterNot(_ == i)
      (0 to rest.size).flatMap(sz => rest.combinations(sz)).map { s =>
        val w = fact(s.size) * fact(n - s.size - 1) / fact(n)
        w * (v(s.toSeq :+ i) - v(s.toSeq))
      }.sum
    }
  }

  test("knnShapley matches exact subset-enumeration Shapley and the efficiency axiom") {
    import spark.implicits._
    // 8 train points on distinct angles from the query (1,0); labels
    // alternate so matches sit at sorted positions 0,2,4,6
    val angles = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
    val train = angles.zipWithIndex.map { case (a, i) =>
      (i.toLong + 10L, Seq(math.cos(a), math.sin(a)), if (i % 2 == 0) 1 else 2)
    }.toDF("vec_id", "embedding", "label")
    val q = Seq((0L, Seq(1.0, 0.0), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnShapley(train, "vec_id", "embedding", "label",
        q, "vec_id", "embedding", "label", k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // ground truth over the similarity-sorted order (angle asc = cos desc)
    val expected = bruteShapley(angles.indices.map(_ % 2 == 0), k = 2)
    angles.indices.foreach { i =>
      assert(math.abs(out(i.toLong + 10L) - expected(i)) < 1e-5,
        s"closed form diverges from subset enumeration at sorted pos $i: " +
          s"${out(i.toLong + 10L)} vs ${expected(i)}")
    }
    // efficiency axiom: values sum to v(full) − v(∅) = matches-in-top-K / K
    val topKMatches = angles.indices.take(2).count(_ % 2 == 0) // pos 0 matches
    assert(math.abs(out.values.sum - topKMatches.toDouble / 2) < 1e-4)
    // the nearest correct-label point carries the largest value
    val best = out.maxBy(_._2)._1
    assert(best == 10L, s"nearest matching point must dominate, got $best")
  }

  test("knnShapley: flipping the query label flips which group is valued") {
    import spark.implicits._
    val angles = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6)
    val train = angles.zipWithIndex.map { case (a, i) =>
      (i.toLong + 10L, Seq(math.cos(a), math.sin(a)), if (i % 2 == 0) 1 else 2)
    }.toDF("vec_id", "embedding", "label")
    def run(qlabel: Int) =
      Similarity.knnShapley(train, "vec_id", "embedding", "label",
          Seq((0L, Seq(1.0, 0.0), qlabel)).toDF("vec_id", "embedding", "label"),
          "vec_id", "embedding", "label", k = 3)
        .collect().map(r => r.getInt(1) -> r.getDouble(2)).toSeq
    val v1 = run(1).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val v2 = run(2).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(v1(1) > 0 && v1(1) > v1(2), s"label-1 mass must dominate for a label-1 query: $v1")
    assert(v2(2) > 0 && v2(2) > v2(1), s"label-2 mass must dominate for a label-2 query: $v2")
  }

  test("doremiWeights: a domain absent from a round coasts (excess 0)") {
    val rows = (for (d <- Seq("a", "b"); t <- 0 until 3)
      yield (d, t, if (d == "b") 300L else 100L))
      .filterNot { case (d, t, _) => d == "a" && t == 1 }
    val out = Sampling.doremiWeights(mix(rows), col("domain"), col("rnd"),
        col("loss")).orderBy("domain").collect()
    assert(out.length == 2, "the grid must complete the missing cell")
    out.foreach { r =>
      assert(!r.getAs[Double]("w_avg").isNaN && !r.getAs[Double]("doremi_weight").isNaN)
    }
    assert(math.abs(out.map(_.getAs[Double]("doremi_weight")).sum - 1.0) < 1e-4)
  }
}
