package graft

import org.apache.spark.sql.functions._
import graft.ops.Profiling

/** Corpus-audit metrics added round 15: Gini concentration,
  * Mann-Kendall trend test, Theil-Sen robust trend line. */
class MetricsSpec extends SparkTestBase {

  test("gini: even strata at 0, (1,3) at exactly 0.25, degenerate null") {
    val even = sqlDf("k" -> Seq("a", "b", "c", "d"),
      "w" -> Seq(5L, 5L, 5L, 5L))
    val r0 = Profiling.gini(even, col("k"), col("w")).head()
    assert(r0.getAs[Long]("n_strata") == 4L && r0.getAs[Long]("total") == 20L)
    assert(r0.getAs[Double]("gini") == 0.0)
    // hand value: x=(1,3) -> G = sum|xi-xj| / (2 n^2 mu) = 4/16 = 0.25
    val two = sqlDf("k" -> Seq("a", "a", "b"), "w" -> Seq(1L, 0L, 3L))
    assert(Profiling.gini(two, col("k"), col("w")).head()
      .getAs[Double]("gini") == 0.25)
    // concentration rises toward 1 as one stratum takes everything
    val skew = sqlDf("k" -> Seq("a", "b", "c", "d"),
      "w" -> Seq(1L, 1L, 1L, 997L))
    val g = Profiling.gini(skew, col("k"), col("w")).head().getAs[Double]("gini")
    assert(g > 0.7 && g < 1.0, s"skewed gini: $g")
    // empty frame: NULL gini, zero counts
    val empty = sqlDf("k" -> Seq.empty[String], "w" -> Seq.empty[Long])
    val re = Profiling.gini(empty, col("k"), col("w")).head()
    assert(re.getAs[Long]("n_strata") == 0L && re.isNullAt(re.fieldIndex("gini")))
  }

  test("mannKendall: monotone series fires, flat series has zero variance, S sums signs") {
    val t = (1L to 10L).toSeq
    val df = sqlDf(
      "key" -> (t.map(_ => "up") ++ t.map(_ => "flat") ++ t.map(_ => "down")),
      "t" -> (t ++ t ++ t),
      "y" -> (t.map(_.toDouble) ++ t.map(_ => 5.0) ++ t.map(i => -i.toDouble)))
    val out = Profiling.mannKendall(df, col("key"), col("t"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    // strictly increasing: S = C(10,2) = 45, var = 10*9*25/18 = 125
    val up = out("up")
    assert(up.getAs[Long]("n") == 10L && up.getAs[Long]("s_stat") == 45L)
    assert(up.getAs[Double]("var_s") == 125.0)
    assert(math.abs(up.getAs[Double]("z") - 44.0 / math.sqrt(125.0)) < 1e-12)
    assert(up.getAs[Double]("z") > 1.96, "monotone trend must fire at 5%")
    // strictly decreasing mirrors it
    val dn = out("down")
    assert(dn.getAs[Long]("s_stat") == -45L &&
      math.abs(dn.getAs[Double]("z") + 44.0 / math.sqrt(125.0)) < 1e-12)
    // all-tied series: tie correction collapses var to 0 -> z NULL
    val fl = out("flat")
    assert(fl.getAs[Long]("s_stat") == 0L && fl.getAs[Double]("var_s") == 0.0)
    assert(fl.isNullAt(fl.fieldIndex("z")))
    // partitioning-invariant (exact-integer arithmetic throughout)
    val rep = Profiling.mannKendall(df.repartition(7), col("key"), col("t"),
      col("y")).filter(col("key") === "up").head()
    assert(rep.getAs[Double]("z") == up.getAs[Double]("z"))
  }

  test("mannKendall: zero-trend alternating series scores |z| below threshold") {
    val t = (1L to 12L).toSeq
    val df = sqlDf("key" -> t.map(_ => "alt"), "t" -> t,
      "y" -> t.map(i => if (i % 2 == 0) 10.0 else 9.0))
    val r = Profiling.mannKendall(df, col("key"), col("t"), col("y")).head()
    assert(math.abs(r.getAs[Double]("z")) < 1.96,
      s"alternating noise must not fire: $r")
  }

  test("theilSen: outlier-robust slope/intercept, explicit median convention") {
    // y = 2t + 1 with a wild outlier at t=5: 6 of 10 pair slopes are
    // exactly 2, so the pair-slope median is 2 and the residual
    // median is 1 — least squares would report slope ~19
    val df = sqlDf("key" -> Seq.fill(5)("s"), "t" -> Seq(1L, 2L, 3L, 4L, 5L),
      "y" -> Seq(3.0, 5.0, 7.0, 9.0, 100.0))
    val r = Profiling.theilSen(df, col("key"), col("t"), col("y")).head()
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Double]("slope") == 2.0, r.toString)
    assert(r.getAs[Double]("intercept") == 1.0, r.toString)
    // even pair count: median is the single-op mean of the two middles
    // slopes for t=(1,2,3), y=(0,0,6): pairs (1,2)->0 (2,3)->6 (1,3)->3
    // -> median 3; residuals y-3t = (-3,-6,-3) -> median -3
    val ev = sqlDf("key" -> Seq.fill(3)("e"), "t" -> Seq(1L, 2L, 3L),
      "y" -> Seq(0.0, 0.0, 6.0))
    val re = Profiling.theilSen(ev, col("key"), col("t"), col("y")).head()
    assert(re.getAs[Double]("slope") == 3.0 && re.getAs[Double]("intercept") == -3.0)
    // single-point series: no pairs, NULL slope, loud in the schema
    val one = sqlDf("key" -> Seq("x"), "t" -> Seq(1L), "y" -> Seq(4.0))
    val ro = Profiling.theilSen(one, col("key"), col("t"), col("y")).head()
    assert(ro.getAs[Long]("n_pairs") == 0L && ro.isNullAt(ro.fieldIndex("slope")))
    // partitioning-invariant
    val rep = Profiling.theilSen(df.repartition(5), col("key"), col("t"),
      col("y")).head()
    assert(rep.getAs[Double]("slope") == 2.0 && rep.getAs[Double]("intercept") == 1.0)
  }

  test("spearman: monotone 1, reversed -1, ties golden value, constant null") {
    // any monotone transform scores exactly 1 (the point of rank corr)
    val mono = sqlDf("x" -> Seq(1.0, 2.0, 3.0, 4.0),
      "y" -> Seq(1.0, 8.0, 27.0, 1e6))
    // sqrt(v)*sqrt(v) is one ulp off v, so 1.0 lands within 1e-12,
    // not bit-exact — the fixed shape trades that for replayability
    val r = Profiling.spearman(mono, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 4L
      && math.abs(r.getAs[Double]("rho") - 1.0) < 1e-12)
    val rev = Profiling.spearman(mono, col("x"), -col("y")).head()
    assert(math.abs(rev.getAs[Double]("rho") + 1.0) < 1e-12)
    // tie handling, hand value: x=(1,2,2,4) ranks (1,2.5,2.5,4);
    // y=(10,20,30,40) ranks (1,2,3,4)
    // X=2rx=(2,5,5,8), Y=(2,4,6,8): n=4 sx=20 sy=20 sxx=118 syy=120
    // sxy=118 -> rho = (472-400)/sqrt(72*80) = 72/75.894663...
    val ties = sqlDf("x" -> Seq(1.0, 2.0, 2.0, 4.0),
      "y" -> Seq(10.0, 20.0, 30.0, 40.0))
    val rt = Profiling.spearman(ties, col("x"), col("y")).head()
    assert(math.abs(rt.getAs[Double]("rho")
      - 72.0 / math.sqrt(72.0 * 80.0)) < 1e-12, rt.toString)
    // constant column: zero rank variance, NULL not 0/0
    val const = sqlDf("x" -> Seq(1.0, 1.0, 1.0), "y" -> Seq(1.0, 2.0, 3.0))
    val rc = Profiling.spearman(const, col("x"), col("y")).head()
    assert(rc.isNullAt(rc.fieldIndex("rho")))
    // partitioning-invariant (the rowid-sort ranks are distributed)
    val rep = Profiling.spearman(ties.repartition(4), col("x"), col("y")).head()
    assert(rep.getAs[Double]("rho") == rt.getAs[Double]("rho"))
  }

  test("spearmanBy: per-key rho matches the unkeyed value on each slice") {
    // key a: monotone agreement; key b: exact reversal; key c: one row
    val df = sqlDf(
      "k" -> Seq("a", "a", "a", "a", "b", "b", "b", "c"),
      "x" -> Seq(1.0, 2.0, 2.0, 4.0, 1.0, 2.0, 3.0, 9.0),
      "y" -> Seq(10.0, 20.0, 30.0, 40.0, 3.0, 2.0, 1.0, 5.0))
    val by = Profiling.spearmanBy(df, col("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    // each slice must equal the whole-frame op run on that slice alone
    for (k <- Seq("a", "b")) {
      val solo = Profiling.spearman(df.filter(col("k") === k),
        col("x"), col("y")).head()
      val kr = by(k)
      assert(kr.getAs[Long]("n") == solo.getAs[Long]("n"))
      assert(kr.getAs[Double]("rho") == solo.getAs[Double]("rho"),
        s"key $k: ${kr.getAs[Double]("rho")} vs ${solo.getAs[Double]("rho")}")
    }
    assert(math.abs(by("b").getAs[Double]("rho") + 1.0) < 1e-12)
    // single-row stratum: zero rank variance, NULL
    assert(by("c").isNullAt(by("c").fieldIndex("rho")))
    // partitioning-invariant
    val rep = Profiling.spearmanBy(df.repartition(5), col("k"), col("x"),
      col("y")).collect().map(r => r.getString(0) -> r.getAs[Double]("rho")).toMap
    assert(rep("a") == by("a").getAs[Double]("rho"))
  }

  test("goodTuring: frequency-of-frequency identities, hand values") {
    import graft.ops.TextAnalysis
    // corpus: "a a a b b c" + "d c" -> freqs a:3 b:2 c:2 d:1
    // N=8 V=4 n1=1 n2=2 -> p_unseen=1/8, chao1 = 4 + 1*0/(2*3) = 4
    val df = sqlDf("text" -> Seq("a a a b b c", "d c"))
    val r = TextAnalysis.goodTuring(df, "text").head()
    assert(r.getAs[Long]("n_terms") == 4L && r.getAs[Long]("n_tokens") == 8L)
    assert(r.getAs[Long]("n1") == 1L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Double]("p_unseen") == 0.125)
    assert(r.getAs[Double]("chao1") == 4.0)
    // singleton-heavy corpus: big unseen mass, chao1 well above V
    val open = sqlDf("text" -> Seq("w1 w2 w3 w4 w5 w6 w7 w8 w1"))
    val ro = TextAnalysis.goodTuring(open, "text").head()
    // N=9 V=8 n1=7 n2=1 -> p=7/9, chao1 = 8 + 42/4 = 18.5
    assert(ro.getAs[Double]("p_unseen") == 7.0 / 9.0)
    assert(ro.getAs[Double]("chao1") == 18.5)
  }

  test("weightedKappa: hand value, perfect agreement, constant-margin null") {
    // a=(0,1,2), b=(0,2,2): O = 1, E = 15, kappa = 1 - 3/15 = 0.8
    val df = sqlDf("a" -> Seq(0L, 1L, 2L), "b" -> Seq(0L, 2L, 2L))
    val r = Profiling.weightedKappa(df, col("a"), col("b")).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("o_w") == 1.0 && r.getAs[Double]("e_w") == 5.0)
    assert(r.getAs[Double]("kappa_w") == 0.8, r.toString)
    // perfect ordinal agreement: exactly 1
    val same = sqlDf("a" -> Seq(0L, 1L, 2L, 3L), "b" -> Seq(0L, 1L, 2L, 3L))
    assert(Profiling.weightedKappa(same, col("a"), col("b"))
      .head().getAs[Double]("kappa_w") == 1.0)
    // near-misses beat far-misses (the point of the weights): 4-vs-3
    // disagreements score higher than 4-vs-0 on the same cells
    val near = sqlDf("a" -> Seq(0L, 1L, 2L, 3L), "b" -> Seq(1L, 2L, 3L, 3L))
    val far = sqlDf("a" -> Seq(0L, 1L, 2L, 3L), "b" -> Seq(3L, 0L, 0L, 3L))
    assert(Profiling.weightedKappa(near, col("a"), col("b"))
        .head().getAs[Double]("kappa_w")
      > Profiling.weightedKappa(far, col("a"), col("b"))
        .head().getAs[Double]("kappa_w"))
    // both raters constant: E = 0, NULL not 0/0
    val const = sqlDf("a" -> Seq(1L, 1L), "b" -> Seq(1L, 1L))
    val rc = Profiling.weightedKappa(const, col("a"), col("b")).head()
    assert(rc.isNullAt(rc.fieldIndex("kappa_w")))
  }

  test("krippendorffAlphaOrdinal matches a naive reference; ordinal beats nominal on near-misses") {
    // uneven panel: item 1 has 3 ratings, item 2 has 2, item 3 has 1
    // (dropped as unpairable)
    val data = Seq((1L, 0L), (1L, 1L), (1L, 1L), (2L, 3L), (2L, 4L), (3L, 2L))
    val df = sqlDf("item" -> data.map(_._1), "g" -> data.map(_._2))
    val r = Profiling.krippendorffAlphaOrdinal(df, col("item"), col("g")).head()
    assert(r.getAs[Long]("n_items") == 2L && r.getAs[Long]("n_ratings") == 5L)
    // naive reference over the pairable ratings
    def alphaRef(rows: Seq[(Long, Long)]): Double = {
      val byItem = rows.groupBy(_._1).filter(_._2.size >= 2)
      val flat = byItem.values.flatten.map(_._2).toSeq
      val n = flat.size.toDouble
      val marg = flat.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      def d2(c: Long, k: Long): Double = {
        val (lo, hi) = (math.min(c, k), math.max(c, k))
        if (lo == hi) 0.0
        else {
          val mass = (lo to hi).map(g => marg.getOrElse(g, 0.0)).sum
          val s = mass - (marg(lo) + marg(hi)) / 2.0
          s * s
        }
      }
      val dObs = byItem.values.map { rs =>
        val gs = rs.map(_._2)
        val ni = gs.size.toDouble
        val sum = (for (x <- gs; y <- gs) yield d2(x, y)).sum
        sum / (ni - 1.0)
      }.sum / n
      val dExp = (for (x <- flat; y <- flat) yield d2(x, y)).sum / (n * (n - 1.0))
      1.0 - dObs / dExp
    }
    val expect = alphaRef(data)
    assert(math.abs(r.getAs[Double]("alpha") - expect) < 1e-6,
      s"${r.getAs[Double]("alpha")} vs $expect")
    // perfect agreement: D_o = 0, alpha exactly 1
    val perfect = sqlDf("item" -> Seq(1L, 1L, 2L, 2L),
      "g" -> Seq(2L, 2L, 4L, 4L))
    assert(Profiling.krippendorffAlphaOrdinal(perfect, col("item"), col("g"))
      .head().getAs[Double]("alpha") == 1.0)
    // the ordinal point: near-miss panels score higher than far-miss
    // panels with identical cell shapes
    val near = sqlDf("item" -> Seq(1L, 1L, 2L, 2L, 3L, 3L),
      "g" -> Seq(1L, 2L, 2L, 3L, 3L, 4L))
    val far = sqlDf("item" -> Seq(1L, 1L, 2L, 2L, 3L, 3L),
      "g" -> Seq(1L, 4L, 2L, 4L, 3L, 1L))
    val an = Profiling.krippendorffAlphaOrdinal(near, col("item"), col("g"))
      .head().getAs[Double]("alpha")
    val af = Profiling.krippendorffAlphaOrdinal(far, col("item"), col("g"))
      .head().getAs[Double]("alpha")
    assert(an > af, s"near $an must beat far $af")
  }

  test("splitLeakage: straddling pairs counted, cluster-keyed split reads zero") {
    import graft.ops.Sampling
    val pairs = sqlDf("a" -> Seq(1L, 3L, 5L), "b" -> Seq(2L, 4L, 6L))
    // per-doc split puts 1/2 across the fence, 3/4 together, 5/6 across
    val assign = sqlDf(
      "doc_id" -> Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "split" -> Seq("train", "test", "train", "train", "val", "train"))
    val got = Sampling.splitLeakage(pairs, assign, "doc_id")
      .orderBy("split_a", "split_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(
      ("test", "train", 1L, true),
      ("train", "train", 1L, false),
      ("train", "val", 1L, true)), got.toString)
    // a cluster-keyed assignment (both endpoints share the split) is
    // exactly the zero-leak read splitByCluster guarantees
    val clustered = sqlDf(
      "doc_id" -> Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "split" -> Seq("train", "train", "val", "val", "test", "test"))
    val clean = Sampling.splitLeakage(pairs, clustered, "doc_id")
    assert(clean.filter(col("leaking")).isEmpty)
  }
}
