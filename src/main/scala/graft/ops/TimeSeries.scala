package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series-key time-series diagnostics over monitor output — the
  * autocorrelation layer beside the trend tests (Profiling.mannKendall
  * / theilSen) and the control charts (EventAnalytics.ewmaChart /
  * cusum): a drift test says WHETHER a monitor series moves; the ACF
  * says whether what's left is white noise (seasonality, burst
  * clustering, crawl-scheduler echoes all surface as significant
  * autocorrelation long before they are visible in a trend line).
  *
  * Reference scope: the reference engine exposes window/lag verbs
  * (reference datar_polars/api/dplyr/lead_lag.py, window.py); the
  * composed diagnostics here are the standing monitor reads a
  * 100 TB pipeline's hourly health tables need on top of them.
  *
  * Scale + exactness contract (shared by all three):
  * - Series are BOUNDED per key (time-bucketed monitor output —
  *   hours/days per event type, not raw events): the per-key windows
  *   partition BY KEY, never a whole-frame sort, and per-key row
  *   counts are monitor-sized (hundreds..thousands) at ANY corpus sf.
  * - `y` is INTEGER-valued (counts — the same contract as CUPED's
  *   unit sums): every sufficient statistic below is an exact decimal
  *   integer, so the closing one-or-two IEEE ops replay bit-for-bit
  *   on any engine with no decimal grid or round-6 fence.
  */
object TimeSeries {

  private val Dec = "decimal(38,0)"
  // decimal -> double through a STRING on both engines (see
  // graft.functions.Exact): one correctly-rounded conversion even when
  // the exact integer exceeds 2^53.
  private def decToDouble(c: Column): Column = c.cast("string").cast("double")

  /** Per-key series ordered by `t`, with 1-based rank and long y.
    * Distinct `t` per key is the caller's contract (bucketed output). */
  private def ranked(df: DataFrame, key: Column, t: Column,
                     y: Column): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("__t"))
    df.filter(t.isNotNull && y.isNotNull)
      .select(key.cast("string").as("key"), t.cast("double").as("__t"),
        y.cast("long").as("__y"))
      .withColumn("__rn", row_number().over(w))
  }

  /** Sample autocorrelation r_k per series key, lags 1..maxLag
    * (Box & Jenkins convention: mean-centered, denominator over ALL n
    * regardless of lag, so r_k is a proper correlation taper).
    *
    * Exactness: r_k = num_k/den with BOTH sides exact decimal
    * integers —
    *   num_k·n² = n²·Σy_t·y_{t+k} − n·S·(H_k+T_k) + (n−k)·S²
    *   den·n²  = n·(n·Q − S²)
    * where S = Σy, Q = Σy², H_k/T_k the head/tail partial sums the
    * lag-k overlap leaves out. Everything up to the single closing
    * IEEE division is integer arithmetic, so the value replays on any
    * engine; the decimal→double conversions are string-bridged.
    *
    * Shape: one per-key rank window, ONE lag-exploded self-equi-join
    * on (key, rn+k) — n·maxLag rows, never pair-quadratic — and two
    * partial aggs. Output (key, lag, n, r); r is NULL for a constant
    * series (den = 0) and absent lags (n ≤ k) carry r NULL too. */
  def acf(df: DataFrame, key: Column, t: Column, y: Column,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag out of range: $maxLag")
    val d = ranked(df, key, t, y)
    val stats = d.groupBy("key").agg(
      count(lit(1)).as("n"),
      sum(col("__y").cast(Dec)).cast(Dec).as("__s"),
      sum((col("__y").cast(Dec) * col("__y").cast(Dec)).cast(Dec))
        .cast(Dec).as("__q"))
    val a = d.select(col("key"), col("__rn"), col("__y"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
    val b = d.select(col("key").as("__k2"), col("__rn").as("__rn2"),
      col("__y").as("__y2"))
    val lagged = a.join(b,
        col("key") === col("__k2") && col("__rn2") === col("__rn") + col("lag"))
      .groupBy(col("key"), col("lag"))
      .agg(
        sum((col("__y").cast(Dec) * col("__y2").cast(Dec)).cast(Dec))
          .cast(Dec).as("__syy"),
        sum(col("__y").cast(Dec)).cast(Dec).as("__h"),
        sum(col("__y2").cast(Dec)).cast(Dec).as("__t2s"))
    val lags = stats.select(col("key"), col("n"), col("__s"), col("__q"),
      explode(sequence(lit(1), lit(maxLag))).as("lag"))
    val j = lags.join(lagged, Seq("key", "lag"), "left")
    val nD = col("n").cast(Dec)
    val num = (nD * nD * col("__syy") - nD * col("__s") *
        (col("__h") + col("__t2s")) +
        (nD - col("lag").cast(Dec)) * col("__s") * col("__s")).cast(Dec)
    val den = (nD * (nD * col("__q") - col("__s") * col("__s"))).cast(Dec)
    j.select(col("key"), col("lag"), col("n"),
      when(den =!= lit(0).cast(Dec) && col("__syy").isNotNull,
        decToDouble(num) / decToDouble(den)).as("r"))
  }

  /** Ljung–Box portmanteau white-noise statistic per series key
    * (Ljung & Box 1978): Q = n(n+2)·Σ_{k=1..L} r_k²/(n−k). The
    * monitor read on what the trend tests leave behind — a high Q on
    * the residual hourly series means bursts cluster (bot traffic,
    * scheduler echo) rather than arriving independently; compare to
    * chi-square with L dof.
    *
    * Exactness: each r_k is [[acf]]'s bit-replayable double; the sum
    * runs in a FIXED ascending-lag left-fold of single IEEE ops
    * (conditional-aggregation pivot to L static columns first — L is
    * a knob, never data), so the chain replays verbatim. Q is NULL
    * unless all L lags exist (n > L) and the series is non-constant —
    * the classical test's own applicability bound.
    * Output (key, n, q_stat, df_lb). */
  def ljungBox(df: DataFrame, key: Column, t: Column, y: Column,
               maxLag: Int): DataFrame = {
    val r = acf(df, key, t, y, maxLag)
    val pivots = (1 to maxLag).map(k =>
      max(when(col("lag") === k, col("r"))).as(s"__r$k"))
    val g = r.groupBy(col("key"), col("n")).agg(pivots.head, pivots.tail: _*)
    val nD = col("n").cast("double")
    val sum0 = (1 to maxLag).map { k =>
      col(s"__r$k") * col(s"__r$k") / (nD - lit(k).cast("double"))
    }.reduceLeft(_ + _) // ascending-k left fold: ((t1+t2)+t3)+...
    g.select(col("key"), col("n"),
      when(col("n") > maxLag, nD * (nD + lit(2.0)) * sum0).as("q_stat"),
      lit(maxLag).as("df_lb"))
  }

  /** Partial autocorrelation function per series key via the
    * Durbin–Levinson recursion — the AR-ORDER read on top of [[acf]]
    * (the ACF of an AR(p) series decays geometrically and never
    * "cuts"; the PACF cuts to ≈0 after lag p, so this is the table
    * that says WHICH autoregressive depth a monitor series carries,
    * and pacf(1) is the AR(1) coefficient itself):
    * a(k,k) = (r_k − Σ_{j<k} a(k−1,j)·r_{k−j}) /
    * (1 − Σ_{j<k} a(k−1,j)·r_j), a(k,j) = a(k−1,j) − a(k,k)·a(k−1,k−j).
    *
    * Exactness: the recursion is UNROLLED into named per-stage
    * columns (one projection per stage — no exponential expression
    * swell), every op a single IEEE +/·/÷ on [[acf]]'s bit-replayable
    * r values, fold order fixed ascending-j — the DuckDB oracle
    * generates the IDENTICAL chain from the same recursion, so the
    * values replay bit-for-bit. Zero denominators and missing lags
    * (short/constant series) read NULL and propagate.
    * Output (key, lag, n, pacf), lags 1..maxLag. */
  def pacf(df: DataFrame, key: Column, t: Column, y: Column,
           maxLag: Int): DataFrame = {
    val r = acf(df, key, t, y, maxLag)
    val pivots = (1 to maxLag).map(k =>
      max(when(col("lag") === k, col("r"))).as(s"r$k"))
    var g = r.groupBy(col("key"), col("n")).agg(pivots.head, pivots.tail: _*)
    // stage 1: a1_1 = r1
    g = g.withColumn("a1_1", col("r1"))
    for (k <- 2 to maxLag) {
      val cNum = col(s"r$k") -
        (1 until k).map(j => col(s"a${k - 1}_$j") * col(s"r${k - j}"))
          .reduceLeft(_ + _)
      val cDen = lit(1.0) -
        (1 until k).map(j => col(s"a${k - 1}_$j") * col(s"r$j"))
          .reduceLeft(_ + _)
      g = g.withColumn(s"c$k", cNum).withColumn(s"d$k", cDen)
      g = g.withColumn(s"a${k}_$k",
        when(col(s"d$k") =!= 0.0, col(s"c$k") / col(s"d$k")))
      for (j <- 1 until k)
        g = g.withColumn(s"a${k}_$j",
          col(s"a${k - 1}_$j") - col(s"a${k}_$k") * col(s"a${k - 1}_${k - j}"))
    }
    val stacked = (1 to maxLag).map(k =>
        g.select(col("key"), lit(k).as("lag"), col("n"),
          col(s"a${k}_$k").as("pacf")))
      .reduceLeft(_.unionByName(_))
    stacked
  }

  /** Autocorrelation-adjusted monitor mean per series key — the
    * honest error bar on a correlated series (the [[acf]] family's
    * ACTIONABLE output): a naive SE on an autocorrelated hourly
    * series understates uncertainty by the factor monitoring
    * dashboards then false-alarm on; the effective sample size
    * n_eff = n / (1 + 2·Σ_{k≤L} r_k) (Kish/Anderson truncated form)
    * deflates it. Pairs with 84m3's weighted-sample ESS — same
    * honesty, different correlation source.
    *
    * Exactness: mean and variance come from the exact decimal
    * moments (string-bridged); the r_k are [[acf]]'s bit-replayable
    * values folded ascending; the closing chain is fixed IEEE ops.
    * Keys too short for all L lags, constant series, or a
    * non-positive correlation-sum denominator read NULL ess/se.
    * Output (key, n, mean, ess, se_naive, se_adj). */
  def essMean(df: DataFrame, key: Column, t: Column, y: Column,
              maxLag: Int): DataFrame = {
    val r = acf(df, key, t, y, maxLag)
    val pivots = (1 to maxLag).map(k =>
      max(when(col("lag") === k, col("r"))).as(s"__r$k"))
    val g = r.groupBy(col("key"), col("n")).agg(pivots.head, pivots.tail: _*)
    val d = df.filter(t.isNotNull && y.isNotNull)
      .select(key.cast("string").as("key"), y.cast("long").as("__y"))
    val stats = d.groupBy("key").agg(
      sum(col("__y").cast(Dec)).cast(Dec).as("__s"),
      sum((col("__y").cast(Dec) * col("__y").cast(Dec)).cast(Dec))
        .cast(Dec).as("__q"))
    val j = g.join(stats, Seq("key"))
    val nD = col("n").cast("double")
    val nDec = col("n").cast(Dec)
    val mean = decToDouble(col("__s")) / nD
    // sample variance off the exact n-scaled identity
    val varS = decToDouble((nDec * col("__q") - col("__s") * col("__s"))
      .cast(Dec)) / (nD * (nD - lit(1.0)))
    val sum0 = (1 to maxLag).map(k => col(s"__r$k")).reduceLeft(_ + _)
    val denom = lit(1.0) + lit(2.0) * sum0
    val ess = nD / denom
    j.select(col("key"), col("n"), mean.as("mean"),
      when(denom > 0.0, ess).as("ess"),
      when(col("n") > 1L && varS > 0.0, sqrt(varS) / sqrt(nD))
        .as("se_naive"),
      when(col("n") > 1L && varS > 0.0 && denom > 0.0,
        sqrt(varS) / sqrt(ess)).as("se_adj"))
  }

  /** Wald–Wolfowitz runs test per series key (1940) — is the series'
    * above/below-mean pattern random, or do high hours CLUSTER (the
    * burst/regime read a trend test scores zero on)? Each point is
    * classified above/below the series mean by the EXACT integer
    * compare n·y_t vs S (no double mean), exact-mean points are
    * dropped (the classical convention), R = number of runs in time
    * order, and z = (R−μ)/σ with μ = 2·n1·n2/n′+1,
    * σ² = 2·n1·n2·(2·n1·n2−n′)/(n′²·(n′−1)).
    *
    * Exactness: n1, n2, R are exact integers (monitor-bounded, far
    * under 2^53, so the long→double casts are exact) and the closing
    * chain is fixed single IEEE ops — replays on any engine. One-class
    * series (n1 or n2 = 0) and n′ < 2 read z NULL.
    * Shape: one per-key stats agg, one join back, one per-key-
    * partitioned lag window, one final agg.
    * Output (key, n_above, n_below, runs, z). */
  def runsTest(df: DataFrame, key: Column, t: Column,
               y: Column): DataFrame = {
    val d = ranked(df, key, t, y)
    val stats = d.groupBy("key").agg(count(lit(1)).as("__n"),
      sum(col("__y")).as("__s"))
    val cls = d.join(stats, Seq("key"))
      .withColumn("__above", col("__n") * col("__y") > col("__s"))
      .filter(col("__n") * col("__y") =!= col("__s"))
    val w = Window.partitionBy("key").orderBy(col("__t"))
    val marked = cls.withColumn("__prev", lag(col("__above"), 1).over(w))
    val agg = marked.groupBy("key").agg(
      sum(when(col("__above"), 1L).otherwise(0L)).as("n_above"),
      sum(when(col("__above"), 0L).otherwise(1L)).as("n_below"),
      sum(when(col("__prev").isNull ||
        col("__prev") =!= col("__above"), 1L).otherwise(0L)).as("runs"))
    val n1 = col("n_above").cast("double")
    val n2 = col("n_below").cast("double")
    val np = n1 + n2
    val prod = n1 * n2
    val mu = prod * lit(2.0) / np + lit(1.0)
    val v = prod * lit(2.0) * (prod * lit(2.0) - np) /
      (np * np * (np - lit(1.0)))
    agg.select(col("key"), col("n_above"), col("n_below"), col("runs"),
      when(col("n_above") > 0L && col("n_below") > 0L &&
          col("n_above") + col("n_below") > 1L && v > 0.0,
        (col("runs").cast("double") - mu) / sqrt(v)).as("z"))
  }

  /** Per-key ordinary-least-squares line y = a + b·t with R² — the
    * parametric trend read beside the robust pair
    * (Profiling.mannKendall decides, theilSen estimates robustly;
    * OLS is the right estimator when the series is clean and the
    * caller wants the variance-explained number R² that Theil–Sen
    * can't give). `t` and `y` must be INTEGER-valued (bucket index,
    * counts): slope = Sxy/Sxx, R² = Sxy²/(Sxx·Syy) with
    * Sxy = nΣty − ΣtΣy, Sxx = nΣt² − (Σt)², Syy = nΣy² − (Σy)² ALL
    * exact decimal integers, so the closing divisions (string-bridged
    * operands) replay bit-for-bit. intercept = ȳ − b·t̄ is a fixed
    * 4-op IEEE chain on exact inputs.
    *
    * Shape: ONE keyed partial agg — no window, no join. Degenerate
    * keys (n < 2 or constant t) read NULL slope/intercept/r2;
    * constant y reads slope 0 exactly and NULL r2.
    * Output (key, n, slope, intercept, r2). */
  def ols(df: DataFrame, key: Column, t: Column, y: Column): DataFrame = {
    val d = df.filter(t.isNotNull && y.isNotNull)
      .select(key.cast("string").as("key"), t.cast("long").as("__t"),
        y.cast("long").as("__y"))
    val a = d.groupBy("key").agg(
      count(lit(1)).as("n"),
      sum(col("__t").cast(Dec)).cast(Dec).as("__st"),
      sum(col("__y").cast(Dec)).cast(Dec).as("__sy"),
      sum((col("__t").cast(Dec) * col("__t").cast(Dec)).cast(Dec))
        .cast(Dec).as("__stt"),
      sum((col("__y").cast(Dec) * col("__y").cast(Dec)).cast(Dec))
        .cast(Dec).as("__syy"),
      sum((col("__t").cast(Dec) * col("__y").cast(Dec)).cast(Dec))
        .cast(Dec).as("__sty"))
    val nD = col("n").cast(Dec)
    val sxy = (nD * col("__sty") - col("__st") * col("__sy")).cast(Dec)
    val sxx = (nD * col("__stt") - col("__st") * col("__st")).cast(Dec)
    val syy = (nD * col("__syy") - col("__sy") * col("__sy")).cast(Dec)
    val slope = decToDouble(sxy) / decToDouble(sxx)
    val nd = col("n").cast("double")
    a.select(col("key"), col("n"),
      when(col("n") > 1L && sxx =!= lit(0).cast(Dec), slope).as("slope"),
      when(col("n") > 1L && sxx =!= lit(0).cast(Dec),
        decToDouble(col("__sy")) / nd -
          slope * (decToDouble(col("__st")) / nd)).as("intercept"),
      when(col("n") > 1L && sxx =!= lit(0).cast(Dec) &&
          syy =!= lit(0).cast(Dec),
        decToDouble((sxy * sxy).cast(Dec)) /
          decToDouble((sxx * syy).cast(Dec))).as("r2"))
  }

  /** Durbin–Watson statistic per series key (Durbin & Watson 1950) —
    * the residual-autocorrelation audit CLOSING the trend-fit loop:
    * [[ols]] fits the line, [[acf]] reads raw autocorrelation; DW
    * asks whether the FIT's residuals still carry lag-1 structure
    * (DW ≈ 2 = clean fit; → 0 = positive residual autocorrelation,
    * the line is missing a regime; → 4 = negative, overdifferenced):
    * DW = Σ(eₜ−eₜ₋₁)² / Σeₜ².
    *
    * Exactness: slope/intercept come from the [[ols]] exact-decimal
    * identity (string-bridged), each residual is a fixed per-row IEEE
    * chain, and the two sums run in decimal(38,18) (deterministic
    * rounding, order-free) closing with one string-bridged division.
    * One keyed moment agg + one broadcast-per-key join + one per-key
    * lag window + one agg. Degenerate keys (n < 3, constant t, or a
    * perfect fit Σe² = 0) read NULL.
    * Output (key, n, dw). */
  def durbinWatson(df: DataFrame, key: Column, t: Column,
                   y: Column): DataFrame = {
    val fit = ols(df, key, t, y)
      .select(col("key"), col("slope").as("__b"), col("intercept").as("__a"))
    val d = df.filter(t.isNotNull && y.isNotNull)
      .select(key.cast("string").as("key"), t.cast("long").as("__t"),
        y.cast("long").as("__y"))
      .join(fit, Seq("key"))
    val e = col("__y").cast("double") -
      (col("__a") + col("__b") * col("__t").cast("double"))
    val w = Window.partitionBy("key").orderBy(col("__t"))
    val withE = d.withColumn("__e", e)
      .withColumn("__ep", lag(col("__e"), 1).over(w))
    val Dec18 = "decimal(38,18)"
    val a = withE.groupBy("key").agg(
      count(lit(1)).as("n"),
      sum((col("__e") * col("__e")).cast(Dec18)).as("__den"),
      sum(when(col("__ep").isNotNull,
        (col("__e") - col("__ep")) * (col("__e") - col("__ep")))
        .cast(Dec18)).as("__num"))
    def d2d(c: Column): Column = c.cast("string").cast("double")
    // round-6 publish: the double→decimal(38,18) residual-sum casts
    // round their 18th decimal differently across engines (shortest-
    // repr vs binary-expansion — the entropy-sum lesson), so the
    // ratio is fenced like every cross-engine libm-grade output
    a.select(col("key"), col("n"),
      when(col("n") > 2L && col("__den").isNotNull &&
          d2d(col("__den")) > 0.0,
        round(d2d(col("__num")) / d2d(col("__den")), 6)).as("dw"))
  }

  /** Cross-correlation function between two integer series sharing a
    * time spine, lags −L..+L per key — the LEAD–LAG read between two
    * monitor series ("do error spikes FOLLOW deploy bursts, and by
    * how many hours?") that neither series' own ACF can give.
    * Positive lag k means y LAGS x by k steps (x leads); the negative
    * side is computed as the mirrored pair, so one call gives the
    * full curve and its argmax is the lead time.
    *
    * Exactness (the [[acf]] identity with two series): r_k = NUM_k /
    * (n·√P) with NUM_k = n²Σx_t·y_{t+k} − n·Sy·H_k − n·Sx·T_k +
    * (n−k)·Sx·Sy and P = (nΣx²−Sx²)(nΣy²−Sy²), all exact decimal
    * integers; √ of an exact double and the closing multiply/divide
    * are single correctly-rounded IEEE ops. Same bounded-series and
    * lag-exploded join shape as [[acf]].
    * Output (key, lag, n, r); constant either-series reads NULL. */
  def ccf(df: DataFrame, key: Column, t: Column, x: Column, y: Column,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag out of range: $maxLag")
    val base = df.filter(t.isNotNull && x.isNotNull && y.isNotNull)
      .select(key.cast("string").as("key"), t.cast("double").as("__t"),
        x.cast("long").as("__x"), y.cast("long").as("__y"))
    val w = Window.partitionBy("key").orderBy(col("__t"))
    val d = base.withColumn("__rn", row_number().over(w))

    // one direction: r_k for k = 0..L of (a_t, b_{t+k})
    def side(aCol: String, bCol: String, keep0: Boolean): DataFrame = {
      val lo = if (keep0) 0 else 1
      val stats = d.groupBy("key").agg(
        count(lit(1)).as("n"),
        sum(col(aCol).cast(Dec)).cast(Dec).as("__sa"),
        sum(col(bCol).cast(Dec)).cast(Dec).as("__sb"),
        sum((col(aCol).cast(Dec) * col(aCol).cast(Dec)).cast(Dec))
          .cast(Dec).as("__qa"),
        sum((col(bCol).cast(Dec) * col(bCol).cast(Dec)).cast(Dec))
          .cast(Dec).as("__qb"))
      val left = d.select(col("key"), col("__rn"), col(aCol).as("__a"),
        explode(sequence(lit(lo), lit(maxLag))).as("lag"))
      val right = d.select(col("key").as("__k2"), col("__rn").as("__rn2"),
        col(bCol).as("__b"))
      val pair = left.join(right,
          col("key") === col("__k2") &&
            col("__rn2") === col("__rn") + col("lag"))
        .groupBy(col("key"), col("lag"))
        .agg(
          sum((col("__a").cast(Dec) * col("__b").cast(Dec)).cast(Dec))
            .cast(Dec).as("__sab"),
          sum(col("__a").cast(Dec)).cast(Dec).as("__h"),
          sum(col("__b").cast(Dec)).cast(Dec).as("__t2"))
      val lags = stats.select(col("key"), col("n"), col("__sa"), col("__sb"),
        col("__qa"), col("__qb"),
        explode(sequence(lit(lo), lit(maxLag))).as("lag"))
      val j = lags.join(pair, Seq("key", "lag"), "left")
      val nD = col("n").cast(Dec)
      val num = (nD * nD * col("__sab") - nD * col("__sb") * col("__h") -
        nD * col("__sa") * col("__t2") +
        (nD - col("lag").cast(Dec)) * col("__sa") * col("__sb")).cast(Dec)
      val p = ((nD * col("__qa") - col("__sa") * col("__sa")) *
        (nD * col("__qb") - col("__sb") * col("__sb"))).cast(Dec)
      j.select(col("key"), col("lag"), col("n"),
        when(p > lit(0).cast(Dec) && col("__sab").isNotNull,
          decToDouble(num) /
            (col("n").cast("double") * sqrt(decToDouble(p)))).as("r"))
    }

    val pos = side("__x", "__y", keep0 = true)
    val neg = side("__y", "__x", keep0 = false)
      .select(col("key"), (-col("lag")).as("lag"), col("n"), col("r"))
    pos.unionByName(neg)
  }

  /** Dyadic SES one-step-ahead backtest per series key — the
    * FORECASTABILITY scorecard (pairs with the event-chain entropy
    * rate): forecast f_t = Σ_{j=1..16} 2^{-j}·y_{t−j} (the truncated
    * alpha=1/2 exponential smoother, EventAnalytics.ewmaChart's
    * convention shifted one step so it never sees y_t), scored
    * against the naive random-walk forecast y_{t−1} via
    * MASE = Σ|y_t−f_t| / Σ|y_t−y_{t−1}| over rows with a full lag
    * window. MASE < 1 = the smoother beats naive = the series has
    * exploitable structure; ≈1 = random walk; a capacity-planning
    * monitor series that reads ≫1 is alarm-worthy in itself.
    *
    * Exactness: DYADIC weights on integer y make every term, partial
    * sum, error, and absolute value an exactly-representable binary
    * double (the 90l6 discipline), so sums are order-independent and
    * the two closing divisions replay anywhere. Rows are scored in
    * RANK order (the caller buckets/gap-fills upstream); only rows
    * with all 16 lags present score, so short series (n ≤ 16) read
    * NULL. Shape: one per-key window with 16 lags + one agg.
    * Output (key, n, n_scored, mase, mean_abs_err, mean_abs_naive). */
  def sesBacktest(df: DataFrame, key: Column, t: Column,
                  y: Column): DataFrame = {
    val d = ranked(df, key, t, y)
    val w = Window.partitionBy("key").orderBy(col("__t"))
    val lagged = (1 to 16).foldLeft(d) { (acc, j) =>
      acc.withColumn(s"__l$j", lag(col("__y"), j).over(w))
    }
    val f = (1 to 16).map(j =>
        col(s"__l$j").cast("double") * lit(math.pow(2.0, -j)))
      .reduceLeft(_ + _)
    val scored = lagged
      .withColumn("__scored", col("__l16").isNotNull)
      .withColumn("__err",
        when(col("__scored"), abs(col("__y").cast("double") - f)))
      .withColumn("__naive",
        when(col("__scored"),
          abs((col("__y") - col("__l1")).cast("double"))))
    val a = scored.groupBy("key").agg(
      count(lit(1)).as("n"),
      sum(when(col("__scored"), 1L).otherwise(0L)).as("n_scored"),
      sum(col("__err")).as("__se"),
      sum(col("__naive")).as("__sn"))
    a.select(col("key"), col("n"), col("n_scored"),
      when(col("n_scored") > 0L && col("__sn") > 0.0,
        col("__se") / col("__sn")).as("mase"),
      when(col("n_scored") > 0L,
        col("__se") / col("n_scored").cast("double")).as("mean_abs_err"),
      when(col("n_scored") > 0L,
        col("__sn") / col("n_scored").cast("double")).as("mean_abs_naive"))
  }
}
