package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Profiling, TimeSeries}

/** Round-17 second wave: the autocorrelation layer (ACF, Ljung-Box,
  * runs test), the plain Welch cohort test, and Newman modularity. */
class TimeSeriesSpec extends SparkTestBase {

  private def series(key: String, ys: Seq[Long]) = (
    ys.indices.map(_ => key),
    ys.indices.map(_.toLong),
    ys)

  test("acf: hand values on 1..5, constant series NULL, short lags NULL") {
    val (k1, t1, y1) = series("a", Seq(1L, 2L, 3L, 4L, 5L))
    val (k2, t2, y2) = series("c", Seq(7L, 7L, 7L, 7L))
    val df = sqlDf("k" -> (k1 ++ k2), "t" -> (t1 ++ t2), "y" -> (y1 ++ y2))
    val out = TimeSeries.acf(df, col("k"), col("t"), col("y"), maxLag = 6)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    // 1..5: mean 3, den Σ(y-3)² = 10; lag1 num = (-2)(-1)+(-1)(0)+0·1+1·2 = 4
    assert(out(("a", 1)).getDouble(3) == 0.4)
    // lag2 num = (-2)(0)+(-1)(1)+0·2 = -1
    assert(out(("a", 2)).getDouble(3) == -0.1)
    // lag3 num = (-2)(1)+(-1)(2) = -4; lag4 num = (-2)(2) = -4
    assert(out(("a", 3)).getDouble(3) == -0.4)
    assert(out(("a", 4)).getDouble(3) == -0.4)
    // lag >= n: no pairs -> NULL r, row still present
    assert(out(("a", 5)).isNullAt(3) && out(("a", 6)).isNullAt(3))
    // constant series: zero variance -> NULL at every lag
    (1 to 6).foreach(k => assert(out(("c", k)).isNullAt(3)))
    assert(out(("a", 1)).getLong(2) == 5L && out(("c", 1)).getLong(2) == 4L)
  }

  test("ljungBox: matches the closed-form fold of acf, short series NULL") {
    val ys = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val (k, t, y) = series("a", ys)
    val df = sqlDf("k" -> k, "t" -> t, "y" -> y)
    val r = TimeSeries.acf(df, col("k"), col("t"), col("y"), 6)
      .orderBy("lag").collect().map(_.getDouble(3))
    val n = ys.size.toDouble
    val expected = n * (n + 2.0) *
      (1 to 6).map(kk => r(kk - 1) * r(kk - 1) / (n - kk)).reduceLeft(_ + _)
    val out = TimeSeries.ljungBox(df, col("k"), col("t"), col("y"), 6).head()
    assert(out.getDouble(2) == expected && out.getInt(3) == 6)
    // n = 5 <= maxLag: NULL q_stat
    val short = sqlDf("k" -> Seq.fill(5)("s"), "t" -> (0L to 4L),
      "y" -> Seq(1L, 2L, 3L, 4L, 5L))
    assert(TimeSeries.ljungBox(short, col("k"), col("t"), col("y"), 6)
      .head().isNullAt(2))
  }

  test("durbinWatson: clean fit ~2, regime break ~0, alternation ~4, perfect fit NULL") {
    // residuals alternate exactly around a flat line: e = +1,-1,... ->
    // DW = sum((+-2)^2)*(n-1)/sum(1)*n = 4(n-1)/n -> ~4
    val alt = Seq.tabulate(20)(i => if (i % 2 == 0) 11L else 9L)
    // a regime break the line can't fit: residuals all + then all -
    val brk = Seq.fill(10)(0L) ++ Seq.fill(10)(100L)
    // perfect line: residuals 0 -> NULL
    val line = (0L until 10L).map(i => 3 * i + 2)
    val df = sqlDf(
      "k" -> (alt.map(_ => "alt") ++ brk.map(_ => "brk") ++ line.map(_ => "ln")),
      "t" -> (alt.indices ++ brk.indices ++ line.indices).map(_.toLong),
      "y" -> (alt ++ brk ++ line))
    val out = TimeSeries.durbinWatson(df, col("k"), col("t"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("alt").getDouble(2) > 3.5, s"alt=${out("alt").getDouble(2)}")
    // the fitted slope soaks up part of the step; DW ~0.77 still
    // flags strong positive residual autocorrelation (<< 2)
    assert(out("brk").getDouble(2) < 1.0, s"brk=${out("brk").getDouble(2)}")
    assert(out("ln").isNullAt(2))
  }

  test("pacf: Durbin-Levinson hand values, NULL propagation past n") {
    val (k1, t1, y1) = series("a", Seq(1L, 2L, 3L, 4L, 5L))
    val df = sqlDf("k" -> k1, "t" -> t1, "y" -> y1)
    val out = TimeSeries.pacf(df, col("k"), col("t"), col("y"), maxLag = 6)
      .collect().map(r => r.getInt(1) -> r).toMap
    // pacf(1) = r1 = 0.4; pacf(2) = (r2 - r1²)/(1 - r1²) = -0.26/0.84
    assert(out(1).getDouble(3) == 0.4)
    assert(out(2).getDouble(3) == (-0.1 - 0.4 * 0.4) / (1.0 - 0.4 * 0.4))
    // lags with no ACF value (k >= n) propagate NULL
    assert(out(5).isNullAt(3) && out(6).isNullAt(3))
    // constant series: all NULL
    val c = sqlDf("k" -> Seq.fill(8)("c"), "t" -> (0L to 7L),
      "y" -> Seq.fill(8)(3L))
    assert(TimeSeries.pacf(c, col("k"), col("t"), col("y"), 3)
      .collect().forall(_.isNullAt(3)))
  }

  test("runsTest: alternation z>0 count, blocks z<0, ties dropped, one-class NULL") {
    // alternating 1,3 around mean 2: every point starts a run
    val alt = Seq.tabulate(12)(i => if (i % 2 == 0) 1L else 3L)
    val (ka, ta, ya) = series("alt", alt)
    // two blocks: 6 low then 6 high -> runs = 2, z strongly negative
    val blk = Seq.fill(6)(1L) ++ Seq.fill(6)(3L)
    val (kb, tb, yb) = series("blk", blk)
    // ties: mean 2 points (y=2) must be dropped before run counting
    val tie = Seq(1L, 2L, 3L, 2L, 1L, 3L)
    val (kt, tt, yt) = series("tie", tie)
    // one-class after tie-drop: constant series
    val (kc, tc, yc) = series("const", Seq.fill(5)(4L))
    val df = sqlDf("k" -> (ka ++ kb ++ kt ++ kc),
      "t" -> (ta ++ tb ++ tt ++ tc), "y" -> (ya ++ yb ++ yt ++ yc))
    val out = TimeSeries.runsTest(df, col("k"), col("t"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("alt").getLong(3) == 12L && out("alt").getDouble(4) > 3.0)
    assert(out("blk").getLong(3) == 2L && out("blk").getDouble(4) < -2.0)
    // tie series: mean 2, the two y=2 points drop -> 1,3,1,3 = 4 runs
    assert(out("tie").getLong(1) == 2L && out("tie").getLong(2) == 2L &&
      out("tie").getLong(3) == 4L)
    // constant: every point ties the mean -> zero kept rows -> no row
    assert(!out.contains("const"))
  }

  test("welchT: hand value on unequal cells, degenerate cells NULL") {
    val a = Seq(1.0, 2.0, 3.0, 4.0)
    val b = Seq(2.0, 4.0, 6.0, 8.0, 10.0)
    val df = sqlDf("g" -> (a.map(_ => true) ++ b.map(_ => false)),
      "y" -> (a ++ b))
    val r = Profiling.welchT(df, col("g"), col("y")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 2.5 && r.getDouble(3) == 6.0)
    // va = (5/3)/4, vb = 10/5 = 2 -> t = -3.5/sqrt(29/12)
    val va = (5.0 / 3.0) / 4.0
    val vb = 2.0
    val t = (2.5 - 6.0) / math.sqrt(va + vb)
    assert(math.abs(r.getDouble(4) - t) < 1e-12)
    val dfw = (va + vb) * (va + vb) / (va * va / 3.0 + vb * vb / 4.0)
    assert(math.abs(r.getDouble(5) - dfw) < 1e-12)
    // single-point cell: NULL t/df
    val one = sqlDf("g" -> Seq(true, false, false), "y" -> Seq(1.0, 2.0, 3.0))
    val r1 = Profiling.welchT(one, col("g"), col("y")).head()
    assert(r1.isNullAt(4) && r1.isNullAt(5))
  }

  test("ols: exact line recovers slope/intercept/r2=1, degenerate NULLs") {
    val t = 0L to 4L
    val df = sqlDf("k" -> (t.map(_ => "line") ++ t.map(_ => "flat") ++ Seq("one")),
      "t" -> (t ++ t ++ Seq(0L)),
      "y" -> (t.map(i => 2 * i + 1) ++ t.map(_ => 7L) ++ Seq(3L)))
    val out = TimeSeries.ols(df, col("k"), col("t"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val line = out("line")
    assert(line.getDouble(2) == 2.0 && line.getDouble(3) == 1.0 &&
      line.getDouble(4) == 1.0)
    // constant y: slope exactly 0, r2 NULL (zero outcome variance)
    val flat = out("flat")
    assert(flat.getDouble(2) == 0.0 && flat.isNullAt(4))
    // single point: all NULL
    val one = out("one")
    assert(one.isNullAt(2) && one.isNullAt(3) && one.isNullAt(4))
  }

  test("ccf: self-correlation 1 at lag 0, shifted pair peaks at its lead") {
    val x = Seq(5L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val y = 0L +: x.init // y lags x by one step -> peak at lag +1
    val df = sqlDf("k" -> x.map(_ => "p"), "t" -> x.indices.map(_.toLong),
      "x" -> x, "y" -> y)
    val self = TimeSeries.ccf(
        sqlDf("k" -> x.map(_ => "s"), "t" -> x.indices.map(_.toLong),
          "x" -> x, "y" -> x),
        col("k"), col("t"), col("x"), col("y"), maxLag = 3)
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(self(0).getDouble(3) == 1.0) // exact: num == n*den at lag 0
    val out = TimeSeries.ccf(df, col("k"), col("t"), col("x"), col("y"), 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out.size == 7) // lags -3..3
    assert((-3 to 3).filter(_ != 1).forall(l => out(1) > out(l)),
      s"peak not at +1: $out")
  }

  test("sesBacktest: constant bias 2^-16, smoother beats naive on alternation, loses on ramp") {
    val n = 40
    val const = Seq.fill(n)(65536L)
    val alt = Seq.tabulate(n)(i => if (i % 2 == 0) 0L else 2L)
    val ramp = Seq.tabulate(n)(_.toLong)
    val df = sqlDf(
      "k" -> (const.map(_ => "c") ++ alt.map(_ => "a") ++ ramp.map(_ => "r")),
      "t" -> (0 until 3 * n).map(i => (i % n).toLong),
      "y" -> (const ++ alt ++ ramp))
    val out = TimeSeries.sesBacktest(df, col("k"), col("t"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    // constant: f = c(1 - 2^-16) -> err exactly c/65536 = 1.0; naive 0
    val c = out("c")
    assert(c.getLong(2) == (n - 16).toLong && c.isNullAt(3) &&
      c.getDouble(4) == 1.0 && c.getDouble(5) == 0.0)
    // alternation: naive always misses by 2, the smoother hovers near 1
    assert(out("a").getDouble(3) < 1.0)
    // trend: a lagging smoother underpredicts a ramp, naive is off by 1
    assert(out("r").getDouble(3) > 1.0)
    // short series: no scored rows
    val short = sqlDf("k" -> Seq.fill(10)("s"), "t" -> (0L to 9L),
      "y" -> (0L to 9L))
    val s = TimeSeries.sesBacktest(short, col("k"), col("t"), col("y")).head()
    assert(s.getLong(2) == 0L && s.isNullAt(3))
  }

  test("AcfStream: fold == batch bits, replay no-ops, knob/order refusal") {
    import graft.ops.TimeSeries
    import graft.streaming.AcfStream
    def tstr(h: Int, m: Int = 0) = f"2026-01-01 $h%02d:$m%02d:00"
    def ts(h: Int, m: Int = 0) = java.sql.Timestamp.valueOf(tstr(h, m))
    // two types with irregular hourly counts over 9 hours (type b
    // silent some hours — observed-hours-only semantics, like batch)
    val rows = (0 until 9).flatMap { h =>
      Seq.fill(1 + (h * h) % 5)(("a", tstr(h, 1))) ++
        (if (h % 3 != 1) Seq.fill(2 + h % 4)(("b", tstr(h, 30))) else Nil)
    }
    val ev = sqlDf("event_type" -> rows.map(_._1), "tss" -> rows.map(_._2))
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val dir = java.nio.file.Files.createTempDirectory("acfstream").toString
    val batches = Seq(
      ev.filter(col("ts") < ts(3)), ev.filter(col("ts") >= ts(3) &&
        col("ts") < ts(6)), ev.filter(col("ts") >= ts(6)))
    val folded = batches.zipWithIndex.map { case (b, i) =>
      AcfStream.foldBatch(b, dir, i.toLong, "1 hour", maxLag = 6)
    }.last
    val hourly = ev.groupBy(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("h"))
      .agg(count(lit(1)).as("n_events"))
    val batch = TimeSeries.acf(hourly, col("event_type"), col("h"),
      col("n_events"), maxLag = 6)
    val f = rowsOf(folded.orderBy("key", "lag"))
    val g = rowsOf(batch.orderBy("key", "lag"))
    assert(f == g, s"stream fold != batch:\n$f\n$g")
    // replayed batch: skipped, standing read unchanged
    val replay = AcfStream.foldBatch(batches(1), dir, 1L, "1 hour", 6)
    assert(rowsOf(replay.orderBy("key", "lag")) == g)
    // knob mismatch refuses loudly
    val eKnob = intercept[IllegalArgumentException] {
      AcfStream.foldBatch(batches(2), dir, 9L, "1 hour", maxLag = 4)
    }
    assert(eKnob.getMessage.contains("lag grid"))
    // out-of-order window refuses loudly
    val eOrd = intercept[IllegalArgumentException] {
      AcfStream.foldBatch(batches(0), dir, 10L, "1 hour", 6)
    }
    assert(eOrd.getMessage.contains("event-time order"))
  }

  test("wordPieceTrain: likelihood score beats raw frequency, merges cascade") {
    import graft.ops.TextAnalysis
    // 'aa' is the most FREQUENT pair (BPE's pick) but 'bc' is the most
    // COHESIVE: score(a,a) = 100/(200*200), score(b,c) = 10/(10*10)
    val docs = sqlDf("text" -> (Seq.fill(100)("aa") ++ Seq.fill(10)("bc")))
      .select(concat_ws(" ", collect_list(col("text"))).as("text"))
    val wp = TextAnalysis.wordPieceTrain(docs, "text", merges = 2).collect()
    assert(wp(0).getString(1) == "b" && wp(0).getString(2) == "c")
    assert(wp(0).getDouble(4) == 10.0 / 100.0)
    // after bc merges (score 1e-1), aa is next
    assert(wp(1).getString(1) == "a" && wp(1).getString(2) == "a")
    val bpe = TextAnalysis.bpeTrain(docs, "text", merges = 1).collect()
    assert(bpe(0).getString(1) == "a" && bpe(0).getString(2) == "a")
  }

  test("yuleK: all-distinct K=0 exactly, repetition raises K, hand value") {
    import graft.ops.TextAnalysis
    val df = sqlDf(
      "lang" -> Seq("flat", "rep", "hand"),
      "text" -> Seq(
        "one two three four five", // every type once: S2 = N -> K = 0
        "spam spam spam spam eggs", // heavy repetition
        "a a b"))                   // N=3, S2 = 4+1 = 5 -> K = 10^4*2/9
    val out = TextAnalysis.yuleK(df, col("lang"), "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getDouble(3) == 0.0)
    assert(out("hand").getDouble(3) == 10000.0 * 2.0 / 9.0)
    assert(out("rep").getDouble(3) > out("flat").getDouble(3))
    assert(out("hand").getLong(1) == 3L && out("hand").getLong(2) == 2L)
  }

  test("simpson: even strata hand values, single stratum lambda=1") {
    import graft.ops.Profiling
    // four equal strata: lambda = 4/16 = 0.25, eff = 4 exactly
    val even = sqlDf("k" -> Seq("a", "b", "c", "d"),
      "w" -> Seq(5L, 5L, 5L, 5L))
    val r = Profiling.simpson(even, col("k"), col("w")).head()
    assert(r.getAs[Long]("n_strata") == 4L && r.getAs[Long]("total") == 20L)
    assert(r.getAs[Double]("lambda") == 0.25 &&
      r.getAs[Double]("eff_strata") == 4.0)
    // unbiased form: sum 5*4*4 / (20*19) = 80/380
    assert(r.getAs[Double]("simpson_unbiased") == 80.0 / 380.0)
    // everything in one stratum: lambda 1, eff 1
    val one = sqlDf("k" -> Seq("a"), "w" -> Seq(7L))
    val r1 = Profiling.simpson(one, col("k"), col("w")).head()
    assert(r1.getAs[Double]("lambda") == 1.0 &&
      r1.getAs[Double]("eff_strata") == 1.0)
  }

  test("partialCorr: confound-driven correlation vanishes, direct survives") {
    import graft.ops.Profiling
    // x and y both = z plus independent-ish deterministic noise: raw
    // r_xy high, partial near zero
    val z = (1 to 60).map(_.toLong * 10)
    val x = z.zipWithIndex.map { case (v, i) => v + (i * 7) % 13 }
    val y = z.zipWithIndex.map { case (v, i) => v + (i * 11) % 17 }
    val conf = sqlDf("x" -> x, "y" -> y, "z" -> z)
    val r = Profiling.partialCorr(conf, col("x"), col("y"), col("z")).head()
    assert(r.getAs[Double]("r_xy") > 0.9)
    assert(math.abs(r.getAs[Double]("r_partial")) < 0.5,
      s"partial=${r.getAs[Double]("r_partial")}")
    assert(r.getAs[Double]("r_xy") - r.getAs[Double]("r_partial") > 0.4)
    // direct relation independent of z survives partialling
    val x2 = (1 to 60).map(_.toLong)
    val y2 = x2.map(_ * 2 + 1)
    val z2 = x2.zipWithIndex.map { case (_, i) => ((i * 13) % 7).toLong }
    val dir = sqlDf("x" -> x2, "y" -> y2, "z" -> z2)
    val rd = Profiling.partialCorr(dir, col("x"), col("y"), col("z")).head()
    // y = 2x+1 exactly: r_xy = 1 and r_xz = r_yz, so the partial
    // collapses to (1 - r²)/(1 - r²) = 1 — the relation survives
    assert(rd.getAs[Double]("r_xy") == 1.0)
    assert(math.abs(rd.getAs[Double]("r_partial") - 1.0) < 1e-9)
  }

  test("essMean: positive autocorrelation deflates ESS, white noise doesn't") {
    // strongly positively autocorrelated: long runs
    val runs = Seq.fill(30)(10L) ++ Seq.fill(30)(20L) ++
      Seq.fill(30)(10L) ++ Seq.fill(30)(20L)
    val (kr, tr, yr) = series("runs", runs)
    // alternating: negative r1 -> ess can EXCEED n
    val alt = Seq.tabulate(120)(i => if (i % 2 == 0) 10L else 20L)
    val (ka, ta, ya) = series("alt", alt)
    val df = sqlDf("k" -> (kr ++ ka), "t" -> (tr ++ ta), "y" -> (runs ++ alt))
    val out = TimeSeries.essMean(df, col("k"), col("t"), col("y"), 6)
      .collect().map(r => r.getString(0) -> r).toMap
    val rr = out("runs")
    assert(rr.getAs[Double]("mean") == 15.0)
    assert(rr.getAs[Double]("ess") < 40.0, s"ess=${rr.getAs[Double]("ess")}")
    assert(rr.getAs[Double]("se_adj") > rr.getAs[Double]("se_naive"))
    val aa = out("alt")
    assert(aa.getAs[Double]("ess") > 120.0)
    assert(aa.getAs[Double]("se_adj") < aa.getAs[Double]("se_naive"))
  }

  test("brownForsythe + cochranQ: hand fixtures") {
    import graft.ops.Profiling
    // equal-variance groups: F small; one wild group: F large
    val tight1 = Seq(10.0, 11.0, 12.0, 13.0, 14.0)
    val tight2 = Seq(20.0, 21.0, 22.0, 23.0, 24.0)
    val wild = Seq(0.0, 50.0, 1.0, 49.0, 25.0)
    val even = sqlDf("g" -> (tight1.map(_ => "a") ++ tight2.map(_ => "b")),
      "y" -> (tight1 ++ tight2))
    val fEven = Profiling.brownForsythe(even, "g", col("y")).head()
    val mix = sqlDf("g" -> (tight1.map(_ => "a") ++ wild.map(_ => "w")),
      "y" -> (tight1 ++ wild))
    val fMix = Profiling.brownForsythe(mix, "g", col("y")).head()
    assert(fEven.getAs[Double]("f") < 1e-9) // identical |dev| profiles
    assert(fMix.getAs[Double]("f") > 5.0,
      s"f=${fMix.getAs[Double]("f")}")
    // Cochran Q: identical filters -> Q = 0; one divergent filter fires
    val same = sqlDf("a" -> Seq(true, true, false, false, true),
      "b" -> Seq(true, true, false, false, true),
      "c" -> Seq(true, true, false, false, true))
    val q0 = Profiling.cochranQ(same, Seq(col("a"), col("b"), col("c")))
      .head()
    // perfectly concordant battery: every row all-pass or all-fail ->
    // zero denominator -> the statistic is undefined, NULL
    assert(q0.isNullAt(2) && q0.getAs[Int]("df_q") == 2)
    val div = sqlDf("a" -> Seq.fill(12)(true),
      "b" -> Seq.fill(12)(true),
      "c" -> (Seq.fill(6)(false) ++ Seq.fill(6)(true)))
    val q1 = Profiling.cochranQ(div, Seq(col("a"), col("b"), col("c")))
      .head()
    assert(q1.getAs[Double]("q_stat") > 9.0,
      s"q=${q1.getAs[Double]("q_stat")}")
    // all-pass battery: zero denominator -> NULL
    val allp = sqlDf("a" -> Seq(true, true), "b" -> Seq(true, true))
    assert(Profiling.cochranQ(allp, Seq(col("a"), col("b"))).head()
      .isNullAt(2))
  }

  test("ebShrink: thin evidence pulls to the mean, strong evidence holds") {
    import graft.ops.Profiling
    // 40 cohorts around rate 0.3 with real dispersion, plus one tiny
    // 2/2 cohort and one large 480/1000 cohort
    val base = (0 until 40).flatMap { i =>
      val n = 200
      val x = 40 + (i % 21) * 2 // rates 0.2..0.4
      Seq.fill(x)((s"c$i", true)) ++ Seq.fill(n - x)((s"c$i", false))
    }
    val tiny = Seq.fill(2)(("tiny", true))
    val big = Seq.fill(480)(("big", true)) ++ Seq.fill(520)(("big", false))
    val all = base ++ tiny ++ big
    val df = sqlDf("k" -> all.map(_._1), "s" -> all.map(_._2))
    val out = Profiling.ebShrink(df, col("k"), col("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val t = out("tiny")
    val b = out("big")
    assert(!t.isNullAt(4), "fit degenerate — fixture needs dispersion")
    // tiny 2/2: raw 1.0, shrunk far toward the ~0.3 corpus mean
    assert(t.getAs[Double]("rate_raw") == 1.0 &&
      t.getAs[Double]("rate_shrunk") < 0.6)
    // big 480/1000: raw 0.48, barely moves
    assert(math.abs(b.getAs[Double]("rate_shrunk") - 0.48) < 0.02)
    // shrunken tiny must no longer outrank the big cohort
    assert(t.getAs[Double]("rate_shrunk") <
      b.getAs[Double]("rate_shrunk") + 0.2)
  }

  test("nelsonAalen + rmst: hand survival fixture") {
    import graft.ops.EventAnalytics
    // 4 users: lifetimes 1d, 2d, 3d died; one 10d censored at log end
    val day = 86400000L
    val rows = Seq((1L, 0L), (1L, day), (2L, 0L), (2L, 2 * day),
      (3L, 0L), (3L, 3 * day), (4L, 0L), (4L, 10 * day))
    val df = sqlDf("user_id" -> rows.map(_._1), "ms" -> rows.map(_._2))
      .withColumn("ts", timestamp_millis(col("ms")))
    val na = EventAnalytics.nelsonAalen(df, col("user_id"), col("ts"))
      .orderBy("t").collect()
    // H at t=1d: 1/4; t=2d: 1/4+1/3; t=3d: +1/2; censored adds 0
    assert(na.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 3L, 2L, 1L))
    assert(math.abs(na(0).getAs[Double]("cum_hazard") - 0.25) < 1e-9)
    assert(math.abs(na(2).getAs[Double]("cum_hazard")
      - (0.25 + 1.0 / 3.0 + 0.5)) < 1e-9)
    assert(na(3).getAs[Double]("cum_hazard") ==
      na(2).getAs[Double]("cum_hazard"))
    // RMST to 2d: S=1 on [0,1d) + S(1d)=0.75 on [1d,2d) = 1.75 days
    val r2 = EventAnalytics.rmst(df, col("user_id"), col("ts"), 2 * day)
      .head()
    assert(math.abs(r2.getAs[Double]("rmst_days") - 1.75) < 1e-6)
    // RMST to 4d adds 0.5 on [2d,3d) and 0.25 on [3d,4d)
    val r4 = EventAnalytics.rmst(df, col("user_id"), col("ts"), 4 * day)
      .head()
    assert(math.abs(r4.getAs[Double]("rmst_days") - 2.5) < 1e-6)
  }

  test("logRank: mirrored cohorts z=0 exactly, separated cohorts fire") {
    import graft.ops.EventAnalytics
    def evRows(uBase: Long, even: Boolean, lifeMins: Seq[Long]) =
      lifeMins.zipWithIndex.flatMap { case (life, i) =>
        val u = uBase + 2 * i + (if (even) 0 else 1)
        Seq((u, 0L), (u, life * 60000L))
      }
    // mirrored: both cohorts have identical lifetime multisets ->
    // every time slice has d1 = d0 and n1 = n0 -> E1 = d/2 exactly
    val lives = Seq(10L, 20L, 30L, 40L, 500L)
    val rowsM = evRows(0L, even = true, lives) ++
      evRows(100L, even = false, lives) ++ Seq((999L, 500L * 60000L))
    val dfM = sqlDf("user_id" -> rowsM.map(_._1), "ms" -> rowsM.map(_._2))
      .withColumn("ts", timestamp_millis(col("ms")))
    val m = EventAnalytics.logRank(dfM, col("user_id"), col("ts"),
      col("user_id") % 2 === 0).head()
    assert(m.getAs[Double]("z") == 0.0 && m.getAs[Double]("chi2") == 0.0)
    assert(m.getAs[Double]("e1") == m.getAs[Long]("o1").toDouble)
    // separated: cohort A all dies early, cohort B survives to the
    // censor edge -> A deaths exceed expectation, z > 2
    val rowsS = evRows(0L, even = true, Seq(5L, 6L, 7L, 8L, 9L, 10L)) ++
      evRows(100L, even = false, Seq(500L, 500L, 500L, 500L, 500L, 500L))
    val dfS = sqlDf("user_id" -> rowsS.map(_._1), "ms" -> rowsS.map(_._2))
      .withColumn("ts", timestamp_millis(col("ms")))
    val sep = EventAnalytics.logRank(dfS, col("user_id"), col("ts"),
      col("user_id") % 2 === 0).head()
    assert(sep.getAs[Long]("o1") == 6L)
    assert(sep.getAs[Double]("z") > 2.0, s"z=${sep.getAs[Double]("z")}")
  }

  test("dpCounts: geometric noise shape, bounded, seeded-deterministic") {
    import graft.ops.Profiling
    val keys = (0 until 3000).map(i => s"k$i")
    val df = sqlDf("k" -> keys.flatMap(k => Seq.fill(3)(k)))
    val rel = Profiling.dpCounts(df, col("k"), salt = "spec")
      .collect().map(r => r.getString(0) -> (r.getLong(1) - 3L)).toMap
    val noise = rel.values.toSeq
    assert(noise.forall(n => n >= -20L && n <= 20L))
    // P(X=0) = 1/3; mean 0; sd = 2*alpha... ~ 2.0 -> se(mean) ~ 0.04
    val zeroShare = noise.count(_ == 0L).toDouble / noise.size
    assert(math.abs(zeroShare - 1.0 / 3.0) < 0.04, s"zeroShare=$zeroShare")
    val mean = noise.map(_.toDouble).sum / noise.size
    assert(math.abs(mean) < 0.25, s"mean=$mean")
    // symmetric-ish tails
    val posShare = noise.count(_ > 0L).toDouble / noise.size
    assert(math.abs(posShare - 1.0 / 3.0) < 0.04, s"posShare=$posShare")
    // seeded: a second run releases identical values; a different
    // salt draws different noise
    val again = Profiling.dpCounts(df, col("k"), salt = "spec")
      .collect().map(r => r.getString(0) -> (r.getLong(1) - 3L)).toMap
    assert(again == rel)
    val other = Profiling.dpCounts(df, col("k"), salt = "other")
      .collect().map(r => r.getString(0) -> (r.getLong(1) - 3L)).toMap
    assert(other != rel)
  }

  test("burstiness: periodic B=-1 exactly, heavy-tail B>0, persistent gaps M>0") {
    import graft.ops.EventAnalytics
    def mk(key: String, gaps: Seq[Long]): Seq[(String, Long)] = {
      val ts = gaps.scanLeft(1000000L)(_ + _)
      ts.map(key -> _)
    }
    val periodic = mk("per", Seq.fill(20)(60000L))
    val heavy = mk("hvy", Seq.tabulate(40)(i => if (i % 8 == 0) 100000L else 10L))
    val persist = mk("mem", Seq.fill(10)(10L) ++ Seq.fill(10)(10000L) ++
      Seq.fill(10)(10L) ++ Seq.fill(10)(10000L))
    val all = periodic ++ heavy ++ persist
    val df = sqlDf("k" -> all.map(_._1), "ms" -> all.map(_._2),
        "id" -> all.indices.map(_.toLong))
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = EventAnalytics.burstiness(df, col("k"), col("ts"), col("id"))
      .collect().map(r => r.getString(0) -> r).toMap
    // equal gaps: sigma 0 -> B = (0-mu)/(0+mu) = -1 exactly; M NULL
    assert(out("per").getDouble(2) == -1.0 && out("per").isNullAt(3))
    // heavy-tailed gaps: B > 0
    assert(out("hvy").getDouble(2) > 0.3, s"B=${out("hvy").getDouble(2)}")
    // long gaps follow long gaps: positive memory
    assert(out("mem").getDouble(3) > 0.5, s"M=${out("mem").getDouble(3)}")
  }

  test("assortativity: star graph -1 exactly, regular graph NULL") {
    val star = sqlDf("src" -> Seq(0L, 0L, 0L), "dst" -> Seq(1L, 2L, 3L))
    val r = Graph.assortativity(star, "src", "dst").head()
    assert(r.getAs[Long]("n_edges") == 3L && r.getAs[Double]("r") == -1.0)
    // triangle: every degree 2 -> zero variance -> NULL
    val tri = sqlDf("src" -> Seq(0L, 1L, 2L), "dst" -> Seq(1L, 2L, 0L))
    assert(Graph.assortativity(tri, "src", "dst").head().isNullAt(1))
  }

  test("OlsStream: arbitrary splits fold == batch bits, replay no-ops") {
    import graft.ops.TimeSeries
    import graft.streaming.OlsStream
    def tstr(h: Int, m: Int) = f"2026-02-01 $h%02d:$m%02d:00"
    val rows = (0 until 8).flatMap { h =>
      (0 until 2 + (h * 3) % 5).map(i => ("a", tstr(h, (i * 7) % 60))) ++
        (0 until 1 + h % 3).map(i => ("b", tstr(h, (i * 11) % 60)))
    }.zipWithIndex
    val ev = sqlDf("event_type" -> rows.map(_._1._1),
        "tss" -> rows.map(_._1._2), "event_id" -> rows.map(_._2.toLong))
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val dir = java.nio.file.Files.createTempDirectory("olsstream").toString
    // arbitrary id-mod batches: hours straddle batch boundaries
    val folded = (0L to 2L).map { b =>
      OlsStream.foldBatch(ev.filter(pmod(col("event_id"), lit(3L)) === b),
        dir, b)
    }.last
    val hourly = ev.groupBy(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("h"))
      .agg(count(lit(1)).as("n_events"))
    val batch = TimeSeries.ols(hourly, col("event_type"), col("h"),
      col("n_events"))
    assert(rowsOf(folded.orderBy("key")) == rowsOf(batch.orderBy("key")))
    // replay: skipped, standing read unchanged
    val replay = OlsStream.foldBatch(ev.filter(col("event_id") < 5), dir, 1L)
    assert(rowsOf(replay.orderBy("key")) == rowsOf(batch.orderBy("key")))
  }

  test("modularity: two clean triangles score Q=0.5, mixed labels score lower") {
    val edges = sqlDf(
      "src" -> Seq(0L, 1L, 0L, 3L, 4L, 3L),
      "dst" -> Seq(1L, 2L, 2L, 4L, 5L, 5L))
    val good = sqlDf("node" -> (0L to 5L),
      "label" -> Seq(0L, 0L, 0L, 1L, 1L, 1L))
    val per = Graph.modularity(edges, "src", "dst", good, "node", "label")
      .orderBy("community").collect()
    assert(per.length == 2)
    per.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 3L &&
        r.getAs[Long]("m_intra") == 3L && r.getAs[Long]("d_total") == 6L)
      // q_c = 3/6 - (6/12)² = 0.25
      assert(r.getAs[Double]("q_part") == 0.25)
    }
    val g = Graph.modularityGlobal(edges, "src", "dst", good, "node", "label")
      .head()
    assert(g.getAs[Long]("m") == 6L && g.getAs[Long]("intra_edges") == 6L &&
      g.getAs[Long]("sum_d2") == 72L && g.getAs[Double]("q") == 0.5)
    // a shuffled labeling scores strictly lower than the true partition
    val bad = sqlDf("node" -> (0L to 5L),
      "label" -> Seq(0L, 1L, 0L, 1L, 0L, 1L))
    val gb = Graph.modularityGlobal(edges, "src", "dst", bad, "node", "label")
      .head().getAs[Double]("q")
    assert(gb < 0.5)
    // duplicate + reversed + self edges collapse in the canonical set
    val messy = sqlDf(
      "src" -> Seq(0L, 1L, 1L, 0L, 2L, 3L, 4L, 3L, 5L),
      "dst" -> Seq(1L, 2L, 0L, 2L, 2L, 4L, 5L, 5L, 5L))
    val gm = Graph.modularityGlobal(messy, "src", "dst", good, "node", "label")
      .head()
    assert(gm.getAs[Long]("m") == 6L && gm.getAs[Double]("q") == 0.5)
  }
}
