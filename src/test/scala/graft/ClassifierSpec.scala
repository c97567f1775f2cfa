package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Specs for the round's new ops: the logistic quality classifier,
  * farthest-first k-center traversal, domain JS divergence,
  * k-anonymity profiling, and the bigram LM scorer. */
class ClassifierSpec extends SparkTestBase {

  // ---- sigmoid table -----------------------------------------------------

  test("sigTable: 513 monotone knots, exact 1/2 at the center") {
    val t = Classifier.sigTable
    assert(t.length == 513)
    assert(t(256) == 0.5) // σ(0) = 1/(1+exp(-0)) exactly
    assert(t.zip(t.tail).forall { case (a, b) => a < b }, "table not monotone")
    assert(t.head < 4e-4 && t.last > 1.0 - 4e-4)
  }

  test("sigLookup clamps out-of-range margins to the end knots") {
    val df = sqlDf("z" -> Seq(-100.0, 0.0, 100.0))
    val out = df.select(Classifier.sigLookup(col("z")).as("s"))
      .collect().map(_.getDouble(0))
    assert(out(0) == Classifier.sigTable.head)
    assert(out(1) == 0.5)
    assert(out(2) == Classifier.sigTable.last)
  }

  // ---- logistic GD -------------------------------------------------------

  test("logisticTrainGD distills a separable threshold rule") {
    val xs = (1 to 40).map(_ / 40.0)
    val df = sqlDf("x" -> xs, "y" -> xs.map(x => if (x >= 0.55) 1.0 else 0.0))
      .select(array(col("x")).as("fx"), col("y"))
    val (w, b) = Classifier.logisticTrainGD(df, "fx", "y",
      dims = 1, iters = 40, lr = 2.0)
    assert(w(0) > 0.0, s"weight should be positive toward the rule, got ${w(0)}")
    val scored = Classifier.logisticScore(df, "fx", w, b)
    val agree = scored.filter(col("keep") === (col("y") === 1.0)).count()
    assert(agree >= 36, s"rule agreement $agree/40 below 90%")
  }

  test("logisticTrainGD refuses a non-power-of-two learning rate") {
    val df = sqlDf("y" -> Seq(0.0, 1.0)).select(array(col("y")).as("fx"), col("y"))
    val e = intercept[IllegalArgumentException] {
      Classifier.logisticTrainGD(df, "fx", "y", dims = 1, iters = 1, lr = 0.3)
    }
    assert(e.getMessage.contains("power of two"))
  }

  test("logisticScore is a pure projection — no shuffle, no join") {
    val df = sqlDf("y" -> Seq(0.0, 1.0)).select(array(col("y")).as("fx"), col("y"))
    val plan = Classifier.logisticScore(df, "fx", Array(1.0), 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"scoring pass should be shuffle-free:\n$plan")
  }

  // ---- farthest-first ----------------------------------------------------

  test("farthestFirst picks the spread and reports the covering radius") {
    import spark.implicits._
    val df = Seq((0L, Seq(0.0)), (1L, Seq(1.0)), (2L, Seq(10.0)))
      .toDF("vec_id", "v")
    val out = Similarity.farthestFirst(df, "vec_id", "v", k = 2)
      .orderBy("cid").collect()
    assert(out(0).getLong(1) == 0L && out(0).getDouble(2) == 0.0)
    assert(out(1).getLong(1) == 2L && out(1).getDouble(2) == 10.0,
      s"second pick should be the farthest point: ${out.toSeq}")
    // remaining point 1 is distance 1 from center 0
    assert(out(0).getDouble(3) == 1.0 && out(1).getDouble(3) == 1.0)
  }

  test("farthestFirst refuses k outside the literal-chain envelope") {
    import spark.implicits._
    val df = Seq((0L, Seq(0.0))).toDF("vec_id", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.farthestFirst(df, "vec_id", "v", k = 257)
    }
    assert(e.getMessage.contains("envelope"))
  }

  // ---- k-anonymity -------------------------------------------------------

  test("kAnonymity reports class-size histogram and headline risk") {
    val df = sqlDf(
      "seg" -> Seq("a", "a", "a", "b"),
      "geo" -> Seq(1, 1, 1, 2))
    val out = Profiling.kAnonymity(df, Seq("seg", "geo"), k = 2)
      .orderBy("class_size").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 1L
      && out(0).getBoolean(3), s"singleton class row wrong: ${out.toSeq}")
    assert(out(1).getLong(0) == 3L && !out(1).getBoolean(3))
    assert(out(0).getLong(4) == 1L, "k_anonymity should be the min class size")
    assert(out(0).getLong(5) == 1L && out(0).getDouble(6) == 0.25)
  }

  // ---- JS divergence -----------------------------------------------------

  test("domainJsDivergence: identical domains at 0, disjoint domains apart") {
    val df = sqlDf(
      "dom" -> Seq("p", "q", "r", "r"),
      "text" -> Seq(
        "alpha beta gamma alpha",
        "alpha beta gamma alpha",  // identical distribution to p
        "delta epsilon zeta", "delta epsilon zeta"))
    val out = TextAnalysis.domainJsDivergence(df, col("dom"), col("text"),
        vocabSize = 16)
      .orderBy("domain_a", "domain_b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("p", "q")) == 0.0, s"identical domains must diverge by 0: $out")
    // add-one smoothing over the tiny toy support flattens the value;
    // disjoint domains still separate clearly from the exact 0
    assert(out(("p", "r")) > 0.1, s"disjoint domains should be far apart: $out")
    assert(out(("p", "r")) == out(("q", "r")), "identical domains must agree")
    assert(out(("p", "r")) <= math.log(2.0) + 1e-9, "JS is bounded by ln 2")
  }

  // ---- bigram LM ---------------------------------------------------------

  test("bigramLmScore: predictable continuations score below rare ones") {
    val df = sqlDf(
      "doc_id" -> Seq(1L, 2L, 3L, 4L),
      "text" -> Seq("a b", "a b", "a b", "x y"))
    val out = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(1) == 1L), "each doc has exactly one bigram")
    val common = out(0).getDouble(2)
    val rare = out(3).getDouble(2)
    assert(rare > common,
      s"rare bigram should score higher (-ln p): rare=$rare common=$common")
  }

  test("bigramLmScore drops docs with fewer than two tokens") {
    val df = sqlDf("doc_id" -> Seq(1L, 2L), "text" -> Seq("single", "two tokens"))
    val out = TextAnalysis.bigramLmScore(df, "doc_id", "text")
    assert(out.count() == 1 && out.collect().head.getLong(0) == 2L)
  }

  test("rocAuc: Mann-Whitney with tie credit, null label excluded, degenerate null") {
    import org.apache.spark.sql.functions.col
    // pos scores {3, 2}, neg {1, 2}: pairwise wins 3, tie 1 -> 3.5/4
    val df = sqlDf(
      "s" -> Seq(3.0, 2.0, 1.0, 2.0, 9.0),
      "y" -> Seq[Any](true, true, false, false, null))
    val r = Classifier.rocAuc(df, col("s"), col("y")).head()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Double]("auc") == 0.875)
    // partitioning-invariant (the rank scan is distributed)
    val rep = Classifier.rocAuc(df.repartition(5), col("s"), col("y")).head()
    assert(rep.getAs[Double]("auc") == 0.875)
    // one-class corpus: NULL, not 0/0
    val deg = Classifier.rocAuc(sqlDf("s" -> Seq(1.0), "y" -> Seq(true)),
      col("s"), col("y")).head()
    assert(deg.isNullAt(deg.fieldIndex("auc")))
  }

  test("calibrationBins: floor/clamp binning, exact means and rates") {
    import org.apache.spark.sql.functions.col
    val df = sqlDf("p" -> Seq(0.05, 0.55, 0.95, 1.0),
      "y" -> Seq(false, true, true, true))
    val out = Classifier.calibrationBins(df, col("p"), col("y"), k = 10)
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 5, 9)) // 1.0 clamps into bin 9
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(1L, 1L, 2L))
    assert(out.map(_.getAs[Double]("p_lo")).toSeq == Seq(0.0, 0.5, 0.9))
    assert(out(2).getAs[Double]("mean_p") == 0.975)
    assert(out.map(_.getAs[Double]("pos_rate")).toSeq == Seq(0.0, 1.0, 1.0))
  }

  test("passAtK matches the combinatorial definition; undefined and degenerate rows handled") {
    import spark.implicits._
    import graft.ops.Classifier
    val df = Seq(
      (1L, 10L, 5L),   // pass@1 = 1 - C(5,1)/C(10,1) = 0.5
      (2L, 10L, 0L),   // no passes: pass@k = 0 for every k <= n
      (3L, 10L, 10L),  // all pass: pass@k = 1 exactly
      (4L, 10L, 2L),   // pass@5 = 1 - C(8,5)/C(10,5)
      (5L, 3L, 1L))    // n < 5: pass@5/@10 undefined (NULL)
      .toDF("task", "n", "c")
    val out = Classifier.passAtK(df, col("n"), col("c"), Seq(1, 5, 10))
      .orderBy("task").collect()
    def nCk(n: Long, k: Long): Double =
      (0L until k).map(i => (n - i).toDouble / (k - i)).product
    assert(out(0).getDouble(3) == 0.5)
    assert(out(1).getDouble(3) == 0.0 && out(1).getDouble(4) == 0.0 &&
      out(1).getDouble(5) == 0.0)
    assert(out(2).getDouble(3) == 1.0 && out(2).getDouble(4) == 1.0 &&
      out(2).getDouble(5) == 1.0, "all-pass must be exactly 1")
    val expect45 = 1.0 - nCk(8, 5) / nCk(10, 5)
    assert(math.abs(out(3).getDouble(4) - expect45) < 1e-12,
      s"${out(3).getDouble(4)} vs $expect45")
    // c > n - k collapses a factor to 0: pass@10 with c=2 is exactly 1
    assert(out(3).getDouble(5) == 1.0)
    assert(!out(4).isNullAt(3) && out(4).isNullAt(4) && out(4).isNullAt(5),
      "n < k must be NULL, not garbage")
    // summary: NULL rows excluded per k; means exact on the grid
    val sum5 = Classifier.passAtKSummary(df, col("n"), col("c"), Seq(1))
      .collect()(0)
    assert(sum5.getLong(0) == 5L)
    val grid = (x: Double) => math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
    val expMean1 = (grid(0.5) + 0.0 + 1.0 + grid(1.0 - nCk(8, 1) / nCk(10, 1))
      + grid(1.0 - nCk(2, 1) / nCk(3, 1))) / 5.0
    assert(math.abs(sum5.getDouble(1) - expMean1) < 1e-9,
      s"${sum5.getDouble(1)} vs $expMean1")
  }

  test("bradleyTerry orders by strength, normalizes to mean 1, handles the MLE boundary") {
    import spark.implicits._
    import graft.ops.Classifier
    // A beats B 8:2, B beats C 8:2, A beats C 9:1 — strict order
    val m = (Seq.fill(8)(("A", "B")) ++ Seq.fill(2)(("B", "A")) ++
      Seq.fill(8)(("B", "C")) ++ Seq.fill(2)(("C", "B")) ++
      Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A")))
      .toDF("w", "l")
    val out = Classifier.bradleyTerry(m, "w", "l", iters = 15)
      .orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq("A", "B", "C"))
    assert(out(0)._4 > out(1)._4 && out(1)._4 > out(2)._4,
      s"strength order broken: ${out.toSeq}")
    assert(out.map(_._2).toSeq == Seq(17L, 10L, 3L)) // wins
    assert(out.map(_._3).toSeq == Seq(20L, 20L, 20L)) // matches played
    // mean-1 normalization (on the fixed-point grid)
    assert(math.abs(out.map(_._4).sum / 3.0 - 1.0) < 1e-9)
    // MM fixed point: the BT identity holds — expected wins under the
    // fitted ratings match observed wins for every item
    def p(a: Double, b: Double) = a / (a + b)
    val Seq(ra, rb, rc) = out.map(_._4).toSeq
    val expWinsA = 10 * p(ra, rb) + 10 * p(ra, rc)
    assert(math.abs(expWinsA - 17.0) < 0.05, s"BT identity: $expWinsA vs 17")
    // zero-win item pins to exactly 0 (the MLE boundary), others sane
    val withLoser = m.unionByName(Seq.fill(5)(("C", "Z")).toDF("w", "l"))
    val z = Classifier.bradleyTerry(withLoser, "w", "l", iters = 10)
      .filter(col("item") === "Z").collect()(0)
    assert(z.getDouble(3) == 0.0 && z.getLong(1) == 0L)
  }

  test("averagePrecision: tie-broken total order, golden value, degenerate null") {
    import org.apache.spark.sql.functions.col
    // order by (s DESC, id): [+, -, +(tie), -(tie), +]
    // precisions at positives: 1/1, 2/3, 3/5 -> AP = 34/45
    val df = sqlDf(
      "id" -> Seq(1L, 2L, 3L, 4L, 5L),
      "s" -> Seq(5.0, 4.0, 3.0, 3.0, 1.0),
      "y" -> Seq(true, false, true, false, true))
    val r = Classifier.averagePrecision(df, col("s"), col("y"), col("id")).head()
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("n_pos") == 3L)
    assert(math.abs(r.getAs[Double]("ap") - 34.0 / 45.0) < 1e-9, r.toString)
    // the prefix scan is distributed: partitioning must not matter
    val rep = Classifier.averagePrecision(df.repartition(4),
      col("s"), col("y"), col("id")).head()
    assert(rep.getAs[Double]("ap") == r.getAs[Double]("ap"))
    // a perfect ranker scores exactly 1 on the grid
    val perfect = sqlDf("id" -> Seq(1L, 2L, 3L),
      "s" -> Seq(3.0, 2.0, 1.0), "y" -> Seq(true, true, false))
    assert(Classifier.averagePrecision(perfect, col("s"), col("y"),
      col("id")).head().getAs[Double]("ap") == 1.0)
    // no positives: NULL, not 0/0
    val deg = Classifier.averagePrecision(
      sqlDf("id" -> Seq(1L), "s" -> Seq(1.0), "y" -> Seq(false)),
      col("s"), col("y"), col("id")).head()
    assert(deg.isNullAt(deg.fieldIndex("ap")))
  }

  test("expectedCalibrationError: weighted bin gaps and the max gap") {
    import org.apache.spark.sql.functions.col
    // k=2: bin0 = {0.2 F, 0.4 T} mean_p 0.3 rate 0.5 gap 0.2
    //      bin1 = {0.6 F, 0.8 T} mean_p 0.7 rate 0.5 gap 0.2
    val df = sqlDf("p" -> Seq(0.2, 0.4, 0.6, 0.8),
      "y" -> Seq(false, true, false, true))
    val r = Classifier.expectedCalibrationError(df, col("p"), col("y"), k = 2)
      .head()
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("ece") - 0.2) < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("max_ce") - 0.2) < 1e-9)
    // a perfectly calibrated constant-rate corpus: ECE 0 within grid
    val cal = sqlDf("p" -> Seq(0.25, 0.25, 0.25, 0.25),
      "y" -> Seq(true, false, false, false))
    val rc = Classifier.expectedCalibrationError(cal, col("p"), col("y"), k = 2)
      .head()
    assert(math.abs(rc.getAs[Double]("ece")) < 1e-9, rc.toString)
  }

  test("confusionStats: counts, derived ratios, MCC, degenerate nulls") {
    import org.apache.spark.sql.functions.col
    // threshold 0.5: pred = s >= 0.5
    // (0.9,T) tp, (0.8,F) fp, (0.6,T) tp, (0.4,T) fn, (0.2,F) tn, (0.1,F) tn
    val df = sqlDf("s" -> Seq(0.9, 0.8, 0.6, 0.4, 0.2, 0.1),
      "y" -> Seq(true, false, true, true, false, false))
    val r = Classifier.confusionStats(df, col("s"), col("y"), 0.5).head()
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 1L &&
      r.getAs[Long]("fn") == 1L && r.getAs[Long]("tn") == 2L)
    assert(math.abs(r.getAs[Double]("accuracy") - 4.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("precision_") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall_") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("f1") - 4.0 / 6.0) < 1e-12)
    // MCC hand value: (2*2-1*1)/sqrt(3*3*3*3) = 3/9
    assert(math.abs(r.getAs[Double]("mcc") - 1.0 / 3.0) < 1e-12, r.toString)
    // all predicted negative: precision and MCC NULL, recall 0
    val neg = Classifier.confusionStats(df, col("s"), col("y"), 10.0).head()
    assert(neg.isNullAt(neg.fieldIndex("precision_")))
    assert(neg.isNullAt(neg.fieldIndex("mcc")))
    assert(neg.getAs[Double]("recall_") == 0.0)
    // one-class corpus: MCC NULL (tn+fn row factors zero)
    val one = sqlDf("s" -> Seq(0.9, 0.1), "y" -> Seq(true, true))
    val r1 = Classifier.confusionStats(one, col("s"), col("y"), 0.5).head()
    assert(r1.isNullAt(r1.fieldIndex("mcc")))
  }

  test("histogramCalibration: fitted rates, held-out gaps, unseen-bin NULL") {
    import org.apache.spark.sql.functions.col
    // fit split: bin0 rate 1/2, bin9 rate 3/4; bin5 never seen
    val fit = sqlDf(
      "p" -> Seq(0.05, 0.05, 0.95, 0.95, 0.95, 0.95),
      "y" -> Seq(true, false, true, true, true, false))
    // apply split: bin0 two rows, bin5 (no fitted opinion), bin9 one
    val app = sqlDf(
      "p" -> Seq(0.01, 0.09, 0.55, 0.91),
      "y" -> Seq(false, true, false, true))
    val out = Classifier.histogramCalibration(
      fit, app, col("p"), col("y"), k = 10).orderBy("bin").collect()
    assert(out.map(_.getAs[Int]("bin")).toSeq == Seq(0, 5, 9))
    val b0 = out(0)
    assert(b0.getAs[Long]("n_fit") == 2L &&
      b0.getAs[Double]("calib_p") == 0.5)
    assert(b0.getAs[Long]("n_apply") == 2L &&
      b0.getAs[Double]("apply_rate") == 0.5)
    assert(b0.getAs[Double]("mean_p_apply") == 0.05)
    // on bin0 the raw scores sit at 0.05 vs a true rate of 0.5; the
    // fitted rate nails it: remediation closes the gap to zero
    assert(b0.getAs[Double]("gap_before") == 0.5 - 0.05 &&
      b0.getAs[Double]("gap_after") == 0.0)
    // unseen bin: the model honestly has no opinion
    val b5 = out(1)
    assert(b5.isNullAt(b5.fieldIndex("n_fit")) &&
      b5.isNullAt(b5.fieldIndex("calib_p")) &&
      b5.isNullAt(b5.fieldIndex("gap_after")))
    assert(b5.getAs[Double]("gap_before") == 0.55)
    val b9 = out(2)
    assert(b9.getAs[Double]("calib_p") == 0.75 &&
      b9.getAs[Double]("apply_rate") == 1.0)
    assert(b9.getAs[Double]("gap_after") == 0.25)
    // the one-row gain read: covered mass 3 (bins 0 and 9), the
    // unseen bin's single row counted out loud, and the remediation
    // strictly wins on the held-out split
    val g = Classifier.calibrationGain(fit, app, col("p"), col("y"),
      k = 10).head()
    assert(g.getAs[Long]("n_covered") == 3L &&
      g.getAs[Long]("n_uncovered") == 1L)
    assert(g.getAs[Double]("ece_after") == 0.25 / 3.0)
    assert(g.getAs[Double]("ece_before") > g.getAs[Double]("ece_after"))
  }

  test("mcnemarTest: disagreement cells, corrected chi2, signed z, no-disagreement null") {
    import org.apache.spark.sql.functions.col
    // b = 3 (A right, B wrong), c = 1, both_right = 1, both_wrong = 2
    val df = sqlDf(
      "pa" -> Seq(true, true, true, true, true, false, false),
      "pb" -> Seq(false, false, false, true, true, true, false),
      "y" -> Seq(true, true, true, true, false, true, true))
    val r = Classifier.mcnemarTest(df, col("pa"), col("pb"), col("y")).head()
    assert(r.getAs[Long]("n") == 7L)
    assert(r.getAs[Long]("b") == 3L && r.getAs[Long]("c") == 1L)
    assert(r.getAs[Long]("both_right") == 1L &&
      r.getAs[Long]("both_wrong") == 2L)
    // chi2 = (|3-1|-1)^2 / 4; z = (3-1)/sqrt(4)
    assert(r.getAs[Double]("chi2") == 0.25)
    assert(r.getAs[Double]("z") == 1.0)
    // identical filters: no disagreements, NULL statistic
    val same = Classifier.mcnemarTest(df, col("pa"), col("pa"), col("y")).head()
    assert(same.isNullAt(same.fieldIndex("chi2")) &&
      same.isNullAt(same.fieldIndex("z")))
  }

  test("rocAucBy: per-key AUC matches the unkeyed value on each slice") {
    import org.apache.spark.sql.functions.col
    // key a: a decent scorer with a tie; key b: a perfect reversal
    // (auc 0); key c: one-class (NULL)
    val df = sqlDf(
      "k" -> Seq("a", "a", "a", "a", "a", "b", "b", "c", "c"),
      "s" -> Seq(0.9, 0.7, 0.7, 0.3, 0.1, 0.2, 0.8, 0.5, 0.6),
      "y" -> Seq(true, true, false, false, false, true, false, true, true))
    val by = Classifier.rocAucBy(df, col("k"), col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    for (k <- Seq("a", "b")) {
      val solo = Classifier.rocAuc(df.filter(col("k") === k),
        col("s"), col("y")).head()
      assert(by(k).getAs[Long]("n_pos") == solo.getAs[Long]("n_pos"))
      assert(by(k).getAs[Double]("auc") == solo.getAs[Double]("auc"),
        s"key $k: ${by(k)} vs $solo")
    }
    assert(by("b").getAs[Double]("auc") == 0.0)
    assert(by("c").isNullAt(by("c").fieldIndex("auc")))
    // partitioning must not change the ranks
    val rep = Classifier.rocAucBy(df.repartition(4), col("k"), col("s"),
      col("y")).collect().map(r => r.getString(0) -> r.getAs[Double]("auc")).toMap
    assert(rep("a") == by("a").getAs[Double]("auc"))
  }

  test("rocAucCi: Hanley-McNeil SE matches the closed form; perfect scorer collapses") {
    import org.apache.spark.sql.functions.col
    val df = sqlDf("s" -> Seq(0.9, 0.8, 0.6, 0.4, 0.2, 0.1),
      "y" -> Seq(true, false, true, true, false, false))
    val r = Classifier.rocAucCi(df, col("s"), col("y")).head()
    val a = Classifier.rocAuc(df, col("s"), col("y")).head().getAs[Double]("auc")
    assert(r.getAs[Double]("auc") == a)
    val (nP, nN) = (3.0, 3.0)
    val q1 = a / (2.0 - a); val q2 = a * a * 2.0 / (a + 1.0)
    val se = math.sqrt((a * (1.0 - a) + (nP - 1.0) * (q1 - a * a)
      + (nN - 1.0) * (q2 - a * a)) / (nP * nN))
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-15, r.toString)
    assert(r.getAs[Double]("lo") < a && r.getAs[Double]("hi") > a)
    // a perfect scorer: auc 1, zero-width interval
    val perfect = sqlDf("s" -> Seq(3.0, 2.0, 1.0),
      "y" -> Seq(true, true, false))
    val rp = Classifier.rocAucCi(perfect, col("s"), col("y")).head()
    assert(rp.getAs[Double]("auc") == 1.0 && rp.getAs[Double]("se") == 0.0)
    assert(rp.getAs[Double]("lo") == 1.0 && rp.getAs[Double]("hi") == 1.0)
  }

  test("delongTest matches the naive O(n^2) structural-component reference") {
    import org.apache.spark.sql.functions.col
    // two correlated-but-different scorers, ties included
    val sa = Seq(0.9, 0.8, 0.8, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1, 0.05)
    val sb = Seq(0.7, 0.9, 0.6, 0.65, 0.2, 0.5, 0.35, 0.3, 0.15, 0.4)
    val y = Seq(true, true, false, true, true, false, false, true, false, false)
    val df = sqlDf("a" -> sa, "b" -> sb, "y" -> y)
    val r = Classifier.delongTest(df, col("a"), col("b"), col("y")).head()
    // naive reference: V10_i = mean over negatives of win(i,j),
    // V01_j = mean over positives; sample covariances; paired var
    def ref(s: Seq[Double]): (Double, Seq[Double], Seq[Double]) = {
      val pos = s.zip(y).filter(_._2).map(_._1)
      val neg = s.zip(y).filterNot(_._2).map(_._1)
      def win(p: Double, n: Double) =
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0
      val v10 = pos.map(p => neg.map(n => win(p, n)).sum / neg.size)
      val v01 = neg.map(n => pos.map(p => win(p, n)).sum / pos.size)
      (v10.sum / pos.size, v10, v01)
    }
    def cov(xs: Seq[Double], ys: Seq[Double]): Double = {
      val mx = xs.sum / xs.size; val my = ys.sum / ys.size
      xs.zip(ys).map { case (x, yv) => (x - mx) * (yv - my) }.sum / (xs.size - 1)
    }
    val (aA, v10a, v01a) = ref(sa); val (aB, v10b, v01b) = ref(sb)
    val nP = y.count(identity).toDouble; val nN = y.size - nP
    val vd = (cov(v10a, v10a) + cov(v10b, v10b) - 2 * cov(v10a, v10b)) / nP +
      (cov(v01a, v01a) + cov(v01b, v01b) - 2 * cov(v01a, v01b)) / nN
    assert(math.abs(r.getAs[Double]("auc_a") - aA) < 1e-12, r.toString)
    assert(math.abs(r.getAs[Double]("auc_b") - aB) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_delta") - vd) < 1e-12,
      s"${r.getAs[Double]("var_delta")} vs $vd")
    assert(math.abs(r.getAs[Double]("z") - (aA - aB) / math.sqrt(vd)) < 1e-9)
    // identical scorers: delta 0, zero variance -> z NULL not 0/0
    val same = Classifier.delongTest(df, col("a"), col("a"), col("y")).head()
    assert(same.getAs[Double]("delta") == 0.0)
    assert(same.isNullAt(same.fieldIndex("z")))
    // degenerate one-class corpus: everything NULL
    val one = sqlDf("a" -> Seq(1.0, 2.0), "b" -> Seq(2.0, 1.0),
      "y" -> Seq(true, true))
    val ro = Classifier.delongTest(one, col("a"), col("b"), col("y")).head()
    assert(ro.isNullAt(ro.fieldIndex("auc_a")))
    // partitioning-invariant (four distributed rank sorts)
    val rep = Classifier.delongTest(df.repartition(5), col("a"), col("b"),
      col("y")).head()
    assert(rep.getAs[Double]("z") == r.getAs[Double]("z"))
  }

  test("gainsTable: hand deciles, capture reaches 1, lift vs base rate") {
    import org.apache.spark.sql.functions.col
    // scores 6..1, y = T,T,F,F,T,F; k=2: top half holds 2 of 3
    // positives -> capture 2/3, lift (2/3)/(1/2) = 4/3
    val df = sqlDf("id" -> (1L to 6L),
      "s" -> Seq(6.0, 5.0, 4.0, 3.0, 2.0, 1.0),
      "y" -> Seq(true, true, false, false, true, false))
    val rows = Classifier.gainsTable(df, col("s"), col("y"), col("id"), k = 2)
      .collect()
    assert(rows.length == 2)
    val b1 = rows(0); val b2 = rows(1)
    assert(b1.getAs[Long]("bin") == 1L && b1.getAs[Long]("n") == 3L
      && b1.getAs[Long]("n_pos") == 2L && b1.getAs[Long]("cum_pos") == 2L)
    assert(b1.getAs[Double]("capture") == 2.0 / 3.0)
    assert(b1.getAs[Double]("lift") == (2.0 / 3.0) / (3.0 / 6.0))
    // the operating point of "keep the top half": precision 2/3
    assert(b1.getAs[Long]("cum_n") == 3L
      && b1.getAs[Double]("precision_at") == 2.0 / 3.0)
    assert(b2.getAs[Long]("cum_pos") == 3L && b2.getAs[Double]("capture") == 1.0)
    assert(b2.getAs[Long]("cum_n") == 6L
      && b2.getAs[Double]("precision_at") == 0.5)
    // deterministic under partitioning (the tieBreak totalizes ties)
    val rep = Classifier.gainsTable(df.repartition(4), col("s"), col("y"),
      col("id"), k = 2).collect()
    assert(rep.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("brierScore: golden value, perfect scorer at 0, partition-invariant") {
    import org.apache.spark.sql.functions.col
    // (0.8,T)->0.04 (0.3,F)->0.09 (0.5,T)->0.25 -> mean 38/300
    val df = sqlDf("p" -> Seq(0.8, 0.3, 0.5), "y" -> Seq(true, false, true))
    val r = Classifier.brierScore(df, col("p"), col("y")).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("brier") - 38.0 / 300.0) < 1e-9)
    val rep = Classifier.brierScore(df.repartition(3), col("p"), col("y")).head()
    assert(rep.getAs[Double]("brier") == r.getAs[Double]("brier"))
    // a perfect hard scorer: 0 exactly
    val perfect = sqlDf("p" -> Seq(1.0, 0.0), "y" -> Seq(true, false))
    assert(Classifier.brierScore(perfect, col("p"), col("y"))
      .head().getAs[Double]("brier") == 0.0)
  }

  test("isotonicCalibration: PAV pools violators, leaves monotone input alone, output always monotone") {
    import org.apache.spark.sql.functions.col
    def mk(binRates: Seq[(Double, Int, Int)]) = {
      // (bin-center prob, n, positives) -> row-level frame
      val rows = binRates.flatMap { case (p, n, pos) =>
        (0 until n).map(i => (p, i < pos)) }
      sqlDf("p" -> rows.map(_._1), "y" -> rows.map(_._2))
    }
    // rates [0.8, 0.2, 0.5] violate; equal weights pool 1+2 -> 0.5,
    // then level 3 at 0.5 joins the plateau: fitted = [0.5, 0.5, 0.5]
    val v = Classifier.isotonicCalibration(
      mk(Seq((0.05, 10, 8), (0.15, 10, 2), (0.25, 10, 5))),
      col("p"), col("y"), k = 10).orderBy("bin").collect()
    assert(v.map(_.getAs[Double]("iso_p")).toSeq == Seq(0.5, 0.5, 0.5),
      v.mkString("; "))
    assert(v.map(_.getAs[Double]("pos_rate")).toSeq == Seq(0.8, 0.2, 0.5))
    // already-monotone rates pass through untouched
    val m = Classifier.isotonicCalibration(
      mk(Seq((0.05, 10, 2), (0.15, 10, 5), (0.25, 10, 8))),
      col("p"), col("y"), k = 10).orderBy("bin").collect()
    assert(m.map(_.getAs[Double]("iso_p")).toSeq == Seq(0.2, 0.5, 0.8))
    // unequal weights: [0.9 (n=1), 0.0 (n=9)] pools to 1/10
    val u = Classifier.isotonicCalibration(
      mk(Seq((0.05, 1, 1), (0.15, 9, 0))),
      col("p"), col("y"), k = 10).orderBy("bin").collect()
    assert(u.map(_.getAs[Double]("iso_p")).toSeq == Seq(0.1, 0.1),
      u.mkString("; "))
  }

  test("youdenThreshold: perfect separation finds the split, ties break to smallest threshold") {
    import org.apache.spark.sql.functions.col
    // pos = {3,4}, neg = {1,2}: threshold 3 gives tpr=1 fpr=0 j=1
    val sep = sqlDf("s" -> Seq(1.0, 2.0, 3.0, 4.0),
      "y" -> Seq(false, false, true, true))
    val r = Classifier.youdenThreshold(sep, col("s"), col("y")).head()
    assert(r.getAs[Double]("threshold") == 3.0 && r.getAs[Double]("j") == 1.0)
    assert(r.getAs[Double]("tpr") == 1.0 && r.getAs[Double]("fpr") == 0.0)
    assert(r.getAs[Double]("accuracy") == 1.0)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    // useless scorer: J = 0 at every cutoff -> smallest threshold wins
    val flat = sqlDf("s" -> Seq(1.0, 2.0, 1.0, 2.0),
      "y" -> Seq(true, true, false, false))
    val f = Classifier.youdenThreshold(flat, col("s"), col("y")).head()
    assert(f.getAs[Double]("j") == 0.0 && f.getAs[Double]("threshold") == 1.0, f)
    // one-class corpus: zero rows, not a division blowup
    val oneClass = sqlDf("s" -> Seq(1.0, 2.0), "y" -> Seq(true, true))
    assert(Classifier.youdenThreshold(oneClass, col("s"), col("y")).count() == 0L)
    // partition-invariant (prefix scan owns the order)
    val rep = Classifier.youdenThreshold(sep.repartition(4), col("s"), col("y")).head()
    assert(rep.getAs[Double]("threshold") == 3.0 && rep.getAs[Double]("j") == 1.0)
  }
}
