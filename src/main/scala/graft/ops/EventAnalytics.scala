package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch analytics over event logs — the product-analytics companions
  * to the Structured Streaming operators in
  * [[graft.streaming.EventStreams]] (sessionization, windowed aggs).
  *
  * Reference: datar_polars has no event-analytics surface; these are
  * the beyond-reference pipeline layer (SURVEY §2.6/§2.8 family),
  * expressed as ordinary Catalyst plans.
  */
object EventAnalytics {

  /** Burstiness + memory of inter-arrival times per series key (Goh &
    * Barabási 2008, "Burstiness and memory in complex systems") — the
    * two-number fingerprint separating bot traffic (periodic: B→−1)
    * from human/bursty arrivals (B→1 heavy-tailed gaps, M>0 when
    * long gaps follow long gaps): B = (σ−μ)/(σ+μ) over the gap
    * distribution, M = Pearson correlation of consecutive gaps
    * (head vs tail windows, the paper's convention).
    *
    * Exactness: gaps are integer milliseconds off a per-key
    * (ts, tiebreak) rank window; B reduces to
    * (√(nQ−S²) − S)/(√(nQ−S²) + S) — the n cancels — and M to the
    * n-scaled Pearson identity over the lag-1 pair join, every
    * sufficient statistic an exact decimal integer, closing √/÷
    * single IEEE ops on string-bridged operands. One rank window +
    * one lag-pair self-join (n·1 rows) + two partial aggs.
    * Degenerate keys (n < 2 gaps, zero variance) read NULL.
    * Output (key, n_gaps, burstiness, memory). */
  def burstiness(df: DataFrame, key: Column, ts: Column,
                 tiebreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Dec = "decimal(38,0)"
    def d2d(c: Column): Column = c.cast("string").cast("double")
    val w = Window.partitionBy("key").orderBy(col("__ms"), col("__tb"))
    val gaps = df.filter(ts.isNotNull)
      .select(key.cast("string").as("key"),
        unix_millis(ts).as("__ms"),
        tiebreak.cast("long").as("__tb"))
      .withColumn("__prev", lag(col("__ms"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .select(col("key"), col("__rn"), (col("__ms") - col("__prev")).as("__g"))
    val stats = gaps.groupBy("key").agg(
      count(lit(1)).as("n_gaps"),
      sum(col("__g").cast(Dec)).cast(Dec).as("__s"),
      sum((col("__g").cast(Dec) * col("__g").cast(Dec)).cast(Dec))
        .cast(Dec).as("__q"))
    // lag-1 pair list for M: (g_i, g_{i+1})
    val b = gaps.select(col("key").as("__k2"), col("__rn").as("__rn2"),
      col("__g").as("__g2"))
    val pairs = gaps.join(b,
        col("key") === col("__k2") && col("__rn2") === col("__rn") + 1)
      .groupBy("key").agg(
        count(lit(1)).as("__np"),
        sum((col("__g").cast(Dec) * col("__g2").cast(Dec)).cast(Dec))
          .cast(Dec).as("__sxy"),
        sum(col("__g").cast(Dec)).cast(Dec).as("__sh"),
        sum(col("__g2").cast(Dec)).cast(Dec).as("__st"),
        sum((col("__g").cast(Dec) * col("__g").cast(Dec)).cast(Dec))
          .cast(Dec).as("__qh"),
        sum((col("__g2").cast(Dec) * col("__g2").cast(Dec)).cast(Dec))
          .cast(Dec).as("__qt"))
    val nD = col("n_gaps").cast(Dec)
    val varN = (nD * col("__q") - col("__s") * col("__s")).cast(Dec)
    val npD = col("__np").cast(Dec)
    val mNum = (npD * col("__sxy") - col("__sh") * col("__st")).cast(Dec)
    val mDen = ((npD * col("__qh") - col("__sh") * col("__sh")) *
      (npD * col("__qt") - col("__st") * col("__st"))).cast(Dec)
    stats.join(pairs, Seq("key"), "left")
      .select(col("key"), col("n_gaps"),
        when(col("n_gaps") > 1L && varN >= lit(0).cast(Dec) &&
            (sqrt(d2d(varN)) + d2d(col("__s"))) > 0.0,
          (sqrt(d2d(varN)) - d2d(col("__s"))) /
            (sqrt(d2d(varN)) + d2d(col("__s")))).as("burstiness"),
        when(col("__np") > 1L && mDen > lit(0).cast(Dec),
          d2d(mNum) / sqrt(d2d(mDen))).as("memory"))
      .orderBy(col("key"))
  }

  /** Ordered conversion funnel: how many users performed stage 1, then
    * stage 2 STRICTLY AFTER their first stage-1 event, then stage 3
    * strictly after that first qualifying stage-2 event, … ("first
    * touch" semantics — the standard product funnel, immune to
    * out-of-order repeats).
    *
    * Scale shape: stage k is one type-filtered scan (the predicate
    * pushes to the parquet scan) joined user-keyed against the
    * previous stage's user-grain frame — per stage: one pushdown scan
    * + one user-keyed shuffle + one partial agg. The per-stage frames
    * shrink monotonically (funnels only narrow), so AQE broadcasts the
    * later joins on its own. No windows, no per-user state.
    *
    * Output: (stage_idx, stage, users, frac_of_first), 0-indexed. */
  def conversionFunnel(df: DataFrame, user: Column, ts: Column,
                       eventType: Column, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "conversionFunnel: need at least two stages")
    require(stages.distinct.size == stages.size,
      s"conversionFunnel: duplicate stage names in $stages")
    val first = df.filter(eventType === stages.head)
      .groupBy(user.as("__u")).agg(min(ts).as("__t"))
    val reached = stages.tail.scanLeft(first) { (prev, st) =>
      df.filter(eventType === st)
        .join(prev, user === col("__u") && ts > col("__t"))
        .groupBy(user.as("__u")).agg(min(ts).as("__t"))
    }
    val n0 = first.agg(count(lit(1)).as("__n0"))
    val rows = reached.zip(stages).zipWithIndex.map { case ((d, st), i) =>
      d.agg(count(lit(1)).as("users"))
        .crossJoin(broadcast(n0))
        .select(lit(i).cast("int").as("stage_idx"), lit(st).as("stage"),
          col("users"),
          (col("users").cast("double") / col("__n0").cast("double"))
            .as("frac_of_first"))
    }
    rows.reduce(_.unionByName(_))
  }

  /** Most common opening event paths: each user's first `steps` events
    * (by time, tie-broken by `tieBreak` for a deterministic total
    * order) joined into a path string, the k most frequent paths
    * returned with user counts — the "how do sessions start" read
    * behind onboarding and bot-pattern triage.
    *
    * Scale shape: the per-user cut is ONE user-partitioned window
    * (bounded partitions — a user's own events), the path build is a
    * per-user agg over ≤ steps rows, and the final cut is a partial-agg
    * count + TakeOrdered(k) — the log never sorts globally.
    * Output: (path, users), count desc / path asc. */
  def topPaths(df: DataFrame, user: Column, ts: Column, eventType: Column,
               tieBreak: Column, steps: Int, k: Int): DataFrame = {
    require(steps >= 1 && steps <= 100, s"topPaths: steps=$steps out of [1,100]")
    require(k >= 1, s"topPaths: k must be >= 1 (got $k)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(user).orderBy(ts, tieBreak)
    df.select(user.as("__u"), eventType.as("__e"),
        row_number().over(w).as("__r"))
      .filter(col("__r") <= steps)
      .groupBy(col("__u"))
      // sort_array on (rank, type) structs rebuilds the order inside
      // the agg — no second window, partitioning-invariant
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("__r"), col("__e")))),
          s => s.getField("__e")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("users"))
      .orderBy(col("users").desc, col("path")).limit(k)
  }

  /** First-order Markov TRANSITION MATRIX over per-user event
    * sequences — the model behind "what happens after X": P(next =
    * to | cur = from) estimated as pair count over from-row total.
    * [[topPaths]] reads literal openings; this reads the whole log's
    * local dynamics (bot detection: near-deterministic rows; funnel
    * design: where mass actually flows next).
    *
    * Scale shape: the consecutive pair is ONE user-partitioned lag
    * window (bounded partitions — a user's own events, the topPaths
    * trade), pair counts collapse in ONE partial agg to ≤ k² rows
    * (k = event-type cardinality, bounded by contract), and the row
    * totals come from a from_type-partitioned window OVER THE PAIR
    * TABLE — a re-agg + broadcast join would make Catalyst recompute
    * the fact-table lag window for the broadcast side (the plan audit
    * showed exactly that: two Window chains over the log), while the
    * window over the ≤k²-row table consumes the pipeline once. The
    * probability is an exact-count division.
    * Output: (from_type, to_type, n, p), one row per OBSERVED pair. */
  def transitionMatrix(df: DataFrame, user: Column, ts: Column,
                       eventType: Column, tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(user).orderBy(ts, tieBreak)
    val wTot = Window.partitionBy(col("from_type"))
    df.select(eventType.as("__to"), lag(eventType, 1).over(w).as("__from"))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__rt", sum(col("n")).over(wTot))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("__rt").cast("double")).as("p"))
  }

  /** Kaplan–Meier survival curve over user lifetimes — the retention
    * read [[cohortRetention]]'s triangle can't give: an unbiased
    * survival function UNDER CENSORING (users still active at the log
    * edge haven't "died" — dropping them biases survival down,
    * counting them as dead biases it worse). Lifetime = last event −
    * first event per user; a user whose last event falls within
    * `censorMargin` of the log's end is censored at that lifetime.
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct death times, nᵢ = at
    * risk (lifetime ≥ tᵢ, death or censor).
    *
    * Shape: ONE user-grain agg (first/last event), a lifetime-grain
    * partial agg to the (time, deaths, censored) table, at-risk from
    * a reverse cumulative over that bounded table (distinct lifetimes
    * ≤ distinct durations — the level-table contract), and the
    * product via exp(Σ ln(1−d/n)) with the Σ on the 2⁻⁴⁰ grid
    * (order-invariant). With thousands of distinct lifetimes a last-ulp
    * libm ln difference occasionally crosses a grid boundary, so the
    * shipped survival rounds to 10 digits (the x_ppr display-rounding
    * convention — each crossing moves S by ~1e-12). Zero-survivor
    * tails (d = n at the last time) read S = 0 exactly, not exp(−∞)
    * noise. Output: (t, n_risk, deaths, censored, survival). */
  def kaplanMeier(df: DataFrame, user: Column, ts: Column,
                  censorMargin: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val G = 1099511627776.0 // 2^40
    val lifetimes = df.groupBy(user.as("__u"))
      .agg(min(ts).as("__first"), max(ts).as("__last"))
    val logEnd = df.agg(max(ts).as("__end"))
    val marked = lifetimes.crossJoin(broadcast(logEnd))
      .select(
        (unix_millis(col("__last")) - unix_millis(col("__first"))).as("t"),
        (col("__last") < col("__end") - expr(s"INTERVAL $censorMargin"))
          .as("__died"))
    val grain = marked.groupBy(col("t"))
      .agg(sum(when(col("__died"), 1L).otherwise(0L)).as("deaths"),
        sum(when(col("__died"), 0L).otherwise(1L)).as("censored"))
    // at-risk = everyone with lifetime >= t: reverse cumulative over
    // the bounded distinct-lifetime table
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAsc = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    grain
      .withColumn("n_risk", sum(col("deaths") + col("censored")).over(wDesc))
      .withColumn("__term",
        // d = n would be ln(0): keep the term finite (0) and let the
        // __dead_all marker zero survival from that time on
        when(col("deaths") > 0L && col("deaths") < col("n_risk"),
          log(lit(1.0) -
            col("deaths").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("__dead_all",
        max(when(col("deaths") === col("n_risk"), col("t"))).over(wAsc))
      .withColumn("__ls",
        sum(floor(col("__term") * G + 0.5).cast("decimal(38,0)")).over(wAsc))
      .select(col("t"), col("n_risk"), col("deaths"), col("censored"),
        when(col("__dead_all").isNotNull, lit(0.0))
          .otherwise(round(
            exp(col("__ls").cast("string").cast("double") / G), 10))
          .as("survival"))
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978) —
    * [[kaplanMeier]]'s estimator-dual: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ. Where
    * KM answers "what fraction survives to t", the hazard curve's
    * SLOPE reads the instantaneous churn rate — a bend in H(t) is a
    * regime change in user mortality that the survival curve smooths
    * over. Same shape as KM: one lifetime agg, the bounded-grain
    * reverse-cumulative at-risk window, per-time dᵢ/nᵢ terms on the
    * 2⁴⁰ grid (order-free exact cumulative), published round-10.
    * Output (t, n_risk, deaths, censored, cum_hazard). */
  def nelsonAalen(df: DataFrame, user: Column, ts: Column,
                  censorMargin: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val G = 1099511627776.0
    val Dec = "decimal(38,0)"
    val lifetimes = df.groupBy(user.as("__u"))
      .agg(min(ts).as("__first"), max(ts).as("__last"))
    val logEnd = df.agg(max(ts).as("__end"))
    val marked = lifetimes.crossJoin(broadcast(logEnd))
      .select(
        (unix_millis(col("__last")) - unix_millis(col("__first"))).as("t"),
        (col("__last") < col("__end") - expr(s"INTERVAL $censorMargin"))
          .as("__died"))
    val grain = marked.groupBy(col("t"))
      .agg(sum(when(col("__died"), 1L).otherwise(0L)).as("deaths"),
        sum(when(col("__died"), 0L).otherwise(1L)).as("censored"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAsc = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    grain
      .withColumn("n_risk", sum(col("deaths") + col("censored")).over(wDesc))
      .withColumn("__term",
        when(col("deaths") > 0L,
          col("deaths").cast("double") / col("n_risk").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("__hs",
        sum(floor(col("__term") * G + 0.5).cast(Dec)).over(wAsc))
      .select(col("t"), col("n_risk"), col("deaths"), col("censored"),
        round(col("__hs").cast("string").cast("double") / G, 10)
          .as("cum_hazard"))
  }

  /** Restricted mean survival time (RMST) to horizon τ — the ONE
    * NUMBER a survival curve collapses to for cohort dashboards and
    * A/B deltas ("average user lifetime over the first 30 days"),
    * robust where the median lifetime is undefined (curves that never
    * cross 0.5): the area under [[kaplanMeier]]'s step curve from 0
    * to τ. S = 1 on [0, t₁); each step contributes S(tᵢ)·(min(tᵢ₊₁,τ)
    * − tᵢ) clipped at τ. Survival values are KM's round-10 published
    * doubles; interval lengths exact integers; per-interval products
    * land on the 2⁴⁰ grid and the global sum is order-free exact.
    * Output (1 row): tau, n_users, rmst. */
  def rmst(df: DataFrame, user: Column, ts: Column, tauMs: Long,
           censorMargin: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tauMs > 0L, s"rmst: tauMs must be positive (got $tauMs)")
    val G = 1099511627776.0
    val Dec = "decimal(38,0)"
    val km = kaplanMeier(df, user, ts, censorMargin)
    val wLead = Window.orderBy(col("t").asc)
    val seg = km
      .withColumn("__next", lead(col("t"), 1).over(wLead))
      .withColumn("__lo", least(col("t"), lit(tauMs)))
      .withColumn("__hi",
        least(coalesce(col("__next"), lit(Long.MaxValue)), lit(tauMs)))
      .filter(col("__hi") > col("__lo"))
      // areas in DAYS: keeps every grid term exactly representable
      // (ms-scale areas would overflow the 2^40 grid's double range)
      .select(col("n_risk"),
        (col("survival") *
          ((col("__hi") - col("__lo")).cast("double") / lit(86400000.0)))
          .as("__area"))
    // the S = 1 head segment [0, t_min) — t_min from the same table
    val head = km.agg(min(col("t")).as("__tmin"),
      max(col("n_risk")).as("n_users"))
    val a = seg.agg(
      sum(floor(col("__area") * G + 0.5).cast(Dec)).cast(Dec).as("__as"))
    a.crossJoin(broadcast(head)).select(
      lit(tauMs).as("tau"),
      col("n_users"),
      round(least(col("__tmin"), lit(tauMs)).cast("double") / lit(86400000.0)
        + col("__as").cast("string").cast("double") / G, 6)
        .as("rmst_days"))
  }

  /** Log-rank (Mantel–Cox) test between two cohorts' survival curves
    * — [[kaplanMeier]]'s COMPARISON half (KM draws each curve; this
    * says whether cohort A's retention differs from B's beyond
    * chance, censoring-aware, the read behind "did the signup-flow
    * change alter user lifetime?"): at each death time, observed
    * cohort-A deaths vs the hypergeometric expectation
    * E₁ = d·n₁/n and variance V = d·(n₁/n)(1−n₁/n)(n−d)/(n−1);
    * Z = (ΣO₁−ΣE₁)/√ΣV, χ² = Z².
    *
    * Exactness: counts and at-risk tables are exact integers (the KM
    * reverse-cumulative over the bounded distinct-lifetime grain —
    * the documented single-partition exception); each per-time E/V
    * term is a fixed IEEE chain quantized to the 2⁴⁰ grid
    * (floor(x·G+0.5), the KM discipline) so the GLOBAL sums are
    * order-free exact decimals; the closing subtract/√/÷ replays
    * anywhere. `cohortA` must be constant per user.
    * Output (1 row): n_a, n_b, o1, e1, var1, z, chi2. */
  def logRank(df: DataFrame, user: Column, ts: Column, cohortA: Column,
              censorMargin: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val G = 1099511627776.0 // 2^40
    val Dec = "decimal(38,0)"
    def d2d(c: Column): Column = c.cast("string").cast("double")
    val lifetimes = df.groupBy(user.as("__u"))
      .agg(min(ts).as("__first"), max(ts).as("__last"),
        max(cohortA.cast("boolean")).as("__a"))
    val logEnd = df.agg(max(ts).as("__end"))
    val marked = lifetimes.crossJoin(broadcast(logEnd))
      .select(
        (unix_millis(col("__last")) - unix_millis(col("__first"))).as("t"),
        (col("__last") < col("__end") - expr(s"INTERVAL $censorMargin"))
          .as("__died"),
        col("__a"))
    val grain = marked.groupBy(col("t")).agg(
      sum(when(col("__a") && col("__died"), 1L).otherwise(0L)).as("__d1"),
      sum(when(col("__a") && !col("__died"), 1L).otherwise(0L)).as("__c1"),
      sum(when(!col("__a") && col("__died"), 1L).otherwise(0L)).as("__d0"),
      sum(when(!col("__a") && !col("__died"), 1L).otherwise(0L)).as("__c0"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val r = grain
      .withColumn("__n1", sum(col("__d1") + col("__c1")).over(wDesc))
      .withColumn("__n0", sum(col("__d0") + col("__c0")).over(wDesc))
    val dd = (col("__d1") + col("__d0")).cast("double")
    val n1d = col("__n1").cast("double")
    val nd = (col("__n1") + col("__n0")).cast("double")
    val active = col("__d1") + col("__d0") > 0L &&
      col("__n1") + col("__n0") > 1L
    val e1 = dd * n1d / nd
    val v = dd * n1d / nd * (lit(1.0) - n1d / nd) * (nd - dd) /
      (nd - lit(1.0))
    val terms = r.select(col("__d1"),
      when(active, floor(e1 * G + 0.5)).otherwise(lit(0L))
        .cast(Dec).as("__eg"),
      when(active, floor(v * G + 0.5)).otherwise(lit(0L))
        .cast(Dec).as("__vg"),
      col("__n1"), col("__n0"), col("__c1"), col("__c0"),
      col("__d0"))
    val a = terms.agg(
      sum(col("__d1") + col("__c1")).as("n_a"),
      sum(col("__d0") + col("__c0")).as("n_b"),
      sum(col("__d1")).as("o1"),
      sum(col("__eg")).cast(Dec).as("__se"),
      sum(col("__vg")).cast(Dec).as("__sv"))
    val e1Sum = d2d(col("__se")) / lit(G)
    val vSum = d2d(col("__sv")) / lit(G)
    a.select(col("n_a"), col("n_b"), col("o1"),
        e1Sum.as("e1"), vSum.as("var1"),
        when(vSum > 0.0,
          (col("o1").cast("double") - e1Sum) / sqrt(vSum)).as("z"))
      .withColumn("chi2", col("z") * col("z"))
  }

  /** BEHAVIORAL drift between two eras of the event log — per
    * from-state Jensen–Shannon divergence between the eras' next-event
    * distributions: [[transitionMatrix]] says how users behave; this
    * says WHERE that behavior changed (a bot cohort arriving, a UI
    * change rerouting a funnel) at the state grain, where a whole-log
    * JSD would just say "something moved". JSD is symmetric, bounded
    * by ln 2, and defined with zero-probability cells (0·ln0 = 0 —
    * a transition present in only one era contributes its full
    * half-term).
    *
    * Shape: each era pays the one lag-window + pair-agg pass of
    * [[transitionMatrix]]; the matrices full-join on (from, to)
    * (≤ k² rows, bounded by contract) and the per-cell terms cross
    * the floor(x·2⁴⁰+0.5) grid into a per-from sum. Output:
    * (from_type, n_a, n_b, jsd), one row per from-state observed in
    * either era. */
  def transitionDrift(a: DataFrame, b: DataFrame, user: Column, ts: Column,
                      eventType: Column, tieBreak: Column): DataFrame = {
    val G = 1099511627776.0 // 2^40
    def gsum(c: Column): Column =
      sum(floor(c * G + 0.5).cast("decimal(38,0)"))
        .cast("string").cast("double") / G
    def tm(df: DataFrame, pName: String, nName: String) =
      transitionMatrix(df, user, ts, eventType, tieBreak)
        .select(col("from_type"), col("to_type"),
          col("p").as(pName), col("n").as(nName))
    val j = tm(a, "__p", "__na").join(tm(b, "__q", "__nb"),
        Seq("from_type", "to_type"), "full")
      .select(col("from_type"),
        coalesce(col("__p"), lit(0.0)).as("__p"),
        coalesce(col("__q"), lit(0.0)).as("__q"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val m = (col("__p") + col("__q")) / 2.0
    val term =
      when(col("__p") > 0.0, lit(0.5) * col("__p") * log(col("__p") / m))
        .otherwise(lit(0.0)) +
      when(col("__q") > 0.0, lit(0.5) * col("__q") * log(col("__q") / m))
        .otherwise(lit(0.0))
    j.groupBy(col("from_type"))
      .agg(sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"),
        gsum(term).as("jsd"))
  }

  /** Stationary distribution of a [[transitionMatrix]] by power
    * iteration for a FIXED iteration count — where the chain spends
    * its time in the long run (the steady-state event mix; compare
    * against the observed mix to see whether the log is still
    * transient). States with no outgoing row (a type observed only
    * as someone's last event) redistribute their mass uniformly, the
    * pageRank dangling convention.
    *
    * Engine-exact by the dyadic-grid rule rather than pageRank's
    * 18-decimal sums: at iteration depth the 19th decimal digit of a
    * π·p product rounds differently across engines (the documented
    * x_ppr caveat), so every inflow term lands on the floor(x·2⁴⁰+0.5)
    * grid instead — grid points are exactly representable binary
    * doubles, the per-state sums are exact integer arithmetic
    * (order-invariant, string-bridged out of decimal), and each
    * iteration's π feeds the next bit-identically on any engine. Each
    * iteration is one k-row join + partial agg — the event log itself
    * is never touched (consume the matrix, not the log).
    * Output: (state, pi), one row per state. */
  def markovStationary(trans: DataFrame, from: String, to: String,
                       p: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"markovStationary: iters=$iters out of the in-plan unroll range [1,20]")
    val G = 1099511627776.0 // 2^40
    def gsum(c: Column): Column =
      sum(floor(c * G + 0.5).cast("decimal(38,0)"))
        .cast("string").cast("double") / G
    // MATERIALIZE the ≤k²-row matrix (bounded by the event-type
    // contract, capped loudly): each of the `iters` rounds consumes it
    // for inflow AND dangling — left lazy, Catalyst would re-execute
    // the caller's whole matrix subplan (the fact-table lag window)
    // ~2·iters times. The collect is codebook-sized, the documented
    // exception class.
    val eSel = trans.select(col(from).as("__s"), col(to).as("__d"),
      col(p).cast("double").as("__p"))
    val eRows = eSel.limit(4000001).collect()
    require(eRows.length <= 4000000,
      "markovStationary: transition matrix exceeds 4M rows — not an " +
        "event-TYPE chain; shard or pre-aggregate the state space")
    val e = trans.sparkSession.createDataFrame(
      java.util.Arrays.asList(eRows: _*), eSel.schema)
    val states = e.select(col("__s").as("state"))
      .unionByName(e.select(col("__d").as("state"))).distinct()
    val nDf = states.agg(count(lit(1)).cast("double").as("__N"))
    var pi = states.crossJoin(broadcast(nDf))
      .select(col("state"), (lit(1.0) / col("__N")).as("pi"))
    for (_ <- 1 to iters) {
      val inflow = e.join(pi, col("__s") === col("state"))
        .groupBy(col("__d").as("state"))
        .agg(gsum(col("pi") * col("__p")).as("__in"))
      val dangling = pi.join(e.select(col("__s")).distinct(),
          col("state") === col("__s"), "left_anti")
        .agg(coalesce(gsum(col("pi")), lit(0.0)).as("__dang"))
      pi = states.join(inflow, Seq("state"), "left")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nDf))
        .select(col("state"),
          (coalesce(col("__in"), lit(0.0)) + col("__dang") / col("__N"))
            .as("pi"))
    }
    pi
  }

  /** ENTROPY RATE of the event chain — how predictable is user
    * behavior, in one number: H = −Σᵢ πᵢ Σⱼ pᵢⱼ ln pᵢⱼ (nats per
    * step) over the [[transitionMatrix]] weighted by its
    * [[markovStationary]] distribution. Near-zero reads scripted
    * traffic (bots repeat); the log's ceiling is ln k. Pure
    * composition: the log pays the one matrix pass, the iteration and
    * the entropy run on the ≤ k²-row matrix; per-cell terms are
    * single IEEE ops on the grid-exact π and exact-count p, the cell
    * sum crosses the 2⁻⁴⁰ grid. Output (1 row): n_states,
    * entropy_rate. */
  def markovEntropyRate(trans: DataFrame, from: String, to: String,
                        p: String, iters: Int): DataFrame = {
    val G = 1099511627776.0 // 2^40
    def gsum(c: Column): Column =
      sum(floor(c * G + 0.5).cast("decimal(38,0)"))
        .cast("string").cast("double") / G
    val pi = markovStationary(trans, from, to, p, iters)
    trans.select(col(from).as("state"), col(to), col(p).cast("double").as("__p"))
      .join(broadcast(pi), Seq("state"))
      .agg(countDistinct(col("state")).as("n_states"),
        (-gsum(col("pi") * col("__p") * log(col("__p"))))
          .as("entropy_rate"))
  }

  /** Weekly cohort retention: users cohorted by the week of their
    * first event, counted distinct in each later week they were active
    * — the (cohort_week, week_offset, users) retention triangle.
    *
    * Scale shape: cohorts are one user-grain agg; activity is a
    * (user, week)-distinct projection; one user-keyed shuffle join
    * lines them up and a two-phase distinct count collapses to the
    * triangle (weeks × cohorts rows — tiny however big the log is). */
  def cohortRetention(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val cohorts = df.groupBy(user.as("__u"))
      .agg(date_trunc("week", min(ts)).cast("date").as("cohort_week"))
    val activity = df.select(user.as("__u"),
      date_trunc("week", ts).cast("date").as("__w")).distinct()
    activity.join(cohorts, Seq("__u"))
      .groupBy(col("cohort_week"),
        (datediff(col("__w"), col("cohort_week")) / lit(7)).cast("int")
          .as("week_offset"))
      .agg(countDistinct(col("__u")).as("users"))
  }

  /** Trending event types: each window's count against the PREVIOUS
    * window's — the rises-vs-its-own-baseline read that a raw top-k
    * ranking misses (a type that is always #1 isn't "trending"; one
    * that tripled is). trend = (n + s) / (n_prev + s) with additive
    * smoothing `s` so brand-new types score high-but-finite instead
    * of dividing by zero. Windows with no predecessor read n_prev=0.
    *
    * Built on [[graft.streaming.EventStreams.windowedAgg]] — the same
    * dual-mode aggregate the streaming path runs; in a live pipeline
    * the window-over-window comparison runs on the agg's sink table
    * (post-aggregation stream-stream self-joins aren't expressible
    * inside one streaming query), which is exactly this operator over
    * the sink. Shape: one windowed partial agg + a self-join on the
    * shifted window start — (windows × types)-sized work after the
    * agg, however big the log. Trend arithmetic is integer counts +
    * one IEEE division: engine-exact. */
  def trending(events: DataFrame, windowLen: String = "1 hour",
               smooth: Double = 1.0): DataFrame = {
    require(smooth > 0, s"trending: smooth=$smooth must be > 0")
    val agg = graft.streaming.EventStreams.windowedAgg(events, windowLen)
      .select(col("wstart"), col("event_type"), col("n"))
    // previous-window count via ONE per-type lag window instead of a
    // time-shifted self-join (r17, guide §2.4): the join planted the
    // fact-collapsing agg subtree in the plan twice and shuffled the
    // profile a second time. lag(1) is the previous EXISTING window;
    // the wstart equality check restores the join's gap semantics
    // (a silent preceding window reads n_prev = 0). Row-identical.
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type").orderBy("wstart")
    agg
      .withColumn("n_prev",
        when(lag(col("wstart"), 1).over(byType) ===
            col("wstart") - expr(s"INTERVAL $windowLen"),
          lag(col("n"), 1).over(byType)).otherwise(lit(0L)))
      .withColumn("trend",
        (col("n").cast("double") + lit(smooth)) /
          (col("n_prev").cast("double") + lit(smooth)))
  }

  /** Windowed anomaly detection — the alerting read over an event
    * firehose: tumbling per-type window counts, then each type's
    * median/MAD over its OWN windows (exact type-7 medians from
    * [[graft.ops.Profiling.groupedQuantiles]] — anomaly thresholds
    * from means/sds would be dragged by the very spikes they hunt),
    * and the standard robust z flag at `k` (1.4826·MAD ≈ σ under
    * normality). A type whose windows never vary (MAD 0) yields NULL
    * z — flagging everything there is noise, not signal.
    *
    * Scale: the corpus collapses to the (windows × types) count
    * profile in ONE partial agg; everything after is profile-sized
    * (per-type window partitions, two broadcast joins back).
    * Output: (event_type, wstart, n, med, mad, robust_z, is_anomaly). */
  def anomalousWindows(events: DataFrame, windowLen: String = "1 hour",
                       k: Double = 3.5): DataFrame = {
    require(k > 0.0, s"anomalousWindows: k must be positive (got $k)")
    // the (windows × types) profile is referenced by the median pass,
    // the deviation/MAD pass, and the final frame — materialize it
    // once (dedupClusters checkpoint convention) so the fact scan
    // behind it runs once, not per consumer (r17, guide §1.2)
    val counts = Materialize.cp(events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("wstart"), col("n")))
    val med = Profiling.groupedQuantiles(counts, Seq("event_type"),
        col("n"), Seq(0.5))
      .select(col("event_type"), col("quantile").as("med"))
    val withMed = counts.join(broadcast(med), Seq("event_type"))
    val dev = withMed.select(col("event_type"),
      abs(col("n").cast("double") - col("med")).as("__dev"))
    val mad = Profiling.groupedQuantiles(dev, Seq("event_type"),
        col("__dev"), Seq(0.5))
      .select(col("event_type"), col("quantile").as("mad"))
    withMed.join(broadcast(mad), Seq("event_type"))
      .withColumn("robust_z",
        when(col("mad") === 0.0, lit(null).cast("double"))
          .otherwise((col("n").cast("double") - col("med"))
            / (lit(1.4826) * col("mad"))))
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > lit(k), lit(false)))
  }

  /** One-sided CUSUM change-point detection (Page 1954) over per-type
    * windowed counts — the SEQUENTIAL complement to
    * [[anomalousWindows]]: a robust-z flag needs one loud window,
    * CUSUM accumulates small sustained shifts (a crawler source
    * quietly doubling its rate) and fires when the cumulative
    * evidence crosses `h`. S_t = max(0, S_{t-1} + (n_t − k)) with
    * drift allowance `k`; computed NON-recursively via the identity
    * S_t = cum_t − min(0, min_{j≤t} cum_j) where cum is the running
    * sum of (n − k) — two per-type-partitioned window passes, never a
    * global window, and ALL-INTEGER (counts and literals), so the
    * trace replays bit-for-bit on any engine.
    *
    * Windows with no events count 0 (the series is gap-filled from a
    * generated per-type spine between the corpus's first and last
    * window — a silent source going quiet drains S back to zero, as
    * the statistic requires). Scale: the corpus collapses to the
    * (windows × types) profile in ONE partial agg; the spine and
    * scans are profile-sized.
    * `direction = "up"` (the default) accumulates rate RISES above
    * the allowance; `"down"` accumulates DROPS below it (y = k − n) —
    * the quiet-source alarm: a crawler that silently stalls never
    * trips an upper test, but its sustained below-allowance windows
    * drive the down statistic over h. Same identity, same integer
    * exactness.
    * Output: (event_type, wstart, n, cusum, changed). */
  def cusumChangePoints(events: DataFrame, windowLen: String = "1 hour",
                        k: Long = 4L, h: Long = 8L,
                        direction: String = "up"): DataFrame = {
    require(k >= 0 && h > 0, s"cusumChangePoints: need k >= 0, h > 0 (got $k, $h)")
    require(direction == "up" || direction == "down",
      s"cusumChangePoints: direction must be 'up' or 'down' (got $direction)")
    import org.apache.spark.sql.expressions.Window
    // profile materialized once (dedupClusters checkpoint convention):
    // bounds, the spine distinct, and the gap-fill join each
    // referenced it — 3 fact scans for one (windows × types) profile
    val counts = Materialize.cp(events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("wstart"), col("n")))
    val bounds = counts.agg(min("wstart").as("__mn"), max("wstart").as("__mx"))
    val spine = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("__mn"), col("__mx"),
          expr(s"INTERVAL $windowLen"))).as("wstart"))
    val filled = spine.join(counts, Seq("event_type", "wstart"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val byType = Window.partitionBy("event_type").orderBy("wstart")
    val y = if (direction == "up") col("n") - lit(k) else lit(k) - col("n")
    val withCum = filled.withColumn("__cum", sum(y).over(byType))
    withCum
      .withColumn("cusum",
        col("__cum") - least(lit(0L), min(col("__cum")).over(byType)))
      .withColumn("changed", col("cusum") > lit(h))
      .drop("__cum")
  }

  /** Truncated-EWMA control chart (Roberts 1959) over per-type
    * windowed counts — the SMOOTHED complement to [[cusumChangePoints]]
    * (CUSUM accumulates shift evidence; EWMA tracks the level itself,
    * the baseline an ops dashboard plots): with α = 1/2 and a hard
    * horizon H,
    *   e_t = Σ_{j=0..H−1} 2^{−(j+1)} · n_{t−j}
    * over the gap-filled per-type spine (silent windows count 0 and
    * drain the average, exactly like the CUSUM spine). DYADIC weights
    * are the engine-exactness trick: every term n/2^{j+1} and every
    * partial sum is an exactly-representable binary double (integer
    * numerator, power-of-two denominator), so the chart replays
    * bit-for-bit on any IEEE engine in any evaluation order — no
    * decimal grid needed. The horizon bounds the window frame (H
    * lags, codegen'd; the dropped tail weight is 2^−H of history —
    * below one count at H = 20), and the whole chart is ONE partial
    * agg to the (types × windows) profile plus one per-type-
    * partitioned window pass: profile-sized at any corpus scale,
    * never a global window.
    * Alarm: a one-sided surge test n_t > mult · e_{t−1} + guard —
    * integer-vs-dyadic comparison, exact; e_{t−1} undefined on each
    * type's first window (no alarm there, SQL-style).
    * Output: (event_type, wstart, n, ewma, alarm). */
  /** Wald's sequential probability ratio test (SPRT, 1945) per series
    * key — the ALWAYS-VALID sequential decision the fixed-horizon
    * tests (two-prop, CMH) can't give: H0: p = p0 vs H1: p = p1 on a
    * Bernoulli stream, stop the moment the cumulative log-likelihood
    * ratio LLR = s·ln(p1/p0) + f·ln((1−p1)/(1−p0)) leaves
    * (lower, upper) — with Wald's thresholds ln(β/(1−α)), ln((1−α)/β)
    * the error rates are bounded at (α, β) REGARDLESS of when you
    * peek, the property dashboard-watched experiments actually need.
    *
    * Scale shape: one keyed partial agg to the (key × bucket) level
    * table, a cumulative window per key (bounded by the monitor
    * contract), and one final keyed agg for the verdict — the
    * fact table is touched once. The sufficient statistic is two
    * integer counts, so the monitor folds across micro-batches
    * exactly (the CMS property) if run under foreachBatch.
    *
    * Engine-exact: the cumulative LLR is QUANTIZED to 6 decimals
    * before every threshold comparison (the ln() weights differ
    * cross-engine by an ulp; scaled by ≤ millions of observations
    * that is ≤ 1e-9 — far inside the grid), and the thresholds are
    * caller-supplied literals, default Wald bounds for
    * α = β = 0.05 rounded to the same grid.
    *
    * Output per key: (key, n_obs, n_success, llr, decision ∈
    * accept_h1/accept_h0/continue, decided_bucket — the FIRST bucket
    * whose cumulative LLR crossed, NULL while the test continues). */
  def sprt(df: DataFrame, key: Column, bucket: Column, success: Column,
           p0: Double, p1: Double, upper: Double = 2.944439,
           lower: Double = -2.944439): DataFrame = {
    val lvl = df.filter(success.isNotNull)
      .groupBy(key.as("key"), bucket.cast("long").as("h"))
      .agg(count(lit(1)).as("__n"),
        sum(when(success.cast("boolean"), 1L).otherwise(0L)).as("__s"))
    sprtFromLevel(lvl, p0, p1, upper, lower)
  }

  /** The verdict half of [[sprt]] over a pre-built (key, h, __n, __s)
    * level table — shared with the STANDING monitor
    * ([[graft.streaming.SprtStream]]), whose state IS the level table
    * (per-bucket counts are additive, so the stream fold is exact and
    * the standing verdict is bit-identical to the batch form by
    * construction). */
  def sprtFromLevel(lvl: DataFrame, p0: Double, p1: Double,
                    upper: Double = 2.944439,
                    lower: Double = -2.944439): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"sprt: p0, p1 must be distinct probabilities in (0,1) (got $p0, $p1)")
    require(lower < 0 && upper > 0,
      s"sprt: thresholds must bracket 0 (got $lower, $upper)")
    import org.apache.spark.sql.expressions.Window
    val w1 = math.log(p1 / p0)
    val w0 = math.log((1.0 - p1) / (1.0 - p0))
    val cum = Window.partitionBy("key").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = lvl
      .withColumn("__cn", sum("__n").over(cum))
      .withColumn("__cs", sum("__s").over(cum))
      .withColumn("__llr", round(col("__cs").cast("double") * lit(w1) +
        (col("__cn") - col("__cs")).cast("double") * lit(w0), 6))
    val fin = t.groupBy("key").agg(
      sum("__n").as("n_obs"), sum("__s").as("n_success"),
      min(when(col("__llr") >= upper, col("h"))).as("__hup"),
      min(when(col("__llr") <= lower, col("h"))).as("__hlo"))
    fin.select(col("key"), col("n_obs"), col("n_success"),
        round(col("n_success").cast("double") * lit(w1) +
          (col("n_obs") - col("n_success")).cast("double") * lit(w0), 6)
          .as("llr"),
        when(col("__hup").isNull && col("__hlo").isNull, lit("continue"))
          .when(col("__hlo").isNull ||
            (col("__hup").isNotNull && col("__hup") <= col("__hlo")),
            lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"),
        col("__hup"), col("__hlo"))
      .withColumn("decided_bucket",
        when(col("decision") === "accept_h1", col("__hup"))
          .when(col("decision") === "accept_h0", col("__hlo")))
      .drop("__hup", "__hlo")
  }

  def ewmaChart(events: DataFrame, windowLen: String = "1 hour",
                horizon: Int = 16, mult: Long = 4L,
                guard: Long = 4L): DataFrame = {
    require(horizon >= 1 && horizon <= 48,
      s"ewmaChart: horizon must be in [1, 48] (got $horizon)")
    require(mult >= 1 && guard >= 0,
      s"ewmaChart: need mult >= 1, guard >= 0 (got $mult, $guard)")
    import org.apache.spark.sql.expressions.Window
    // profile materialized once (dedupClusters checkpoint convention):
    // bounds, the spine distinct, and the gap-fill join each
    // referenced it — 3 fact scans for one (windows × types) profile
    val counts = Materialize.cp(events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("wstart"), col("n")))
    val bounds = counts.agg(min("wstart").as("__mn"), max("wstart").as("__mx"))
    val spine = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("__mn"), col("__mx"),
          expr(s"INTERVAL $windowLen"))).as("wstart"))
    val filled = spine.join(counts, Seq("event_type", "wstart"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val byType = Window.partitionBy("event_type").orderBy("wstart")
    val ewma = (0 until horizon).map { j =>
      coalesce(lag(col("n"), j).over(byType), lit(0L)).cast("double") /
        lit((1L << (j + 1)).toDouble)
    }.reduce(_ + _)
    filled.withColumn("ewma", ewma)
      .withColumn("alarm",
        coalesce(col("n").cast("double") >
          lit(mult.toDouble) * lag(col("ewma"), 1).over(byType)
            + lit(guard.toDouble), lit(false)))
  }

  /** Semi-structured metadata extraction: pull typed fields out of a
    * JSON properties column (the crawl/event sidecar every real
    * pipeline carries — request params, page metadata, client tags).
    * `fields` maps output column name → (JSONPath, Spark cast type);
    * extraction is `get_json_object` — a codegen'd projection, no
    * UDF, no shuffle — and a malformed or missing path yields NULL
    * (never a job failure: bad metadata is a data-quality signal to
    * count, not a crash). Downstream groupBys then treat the
    * extracted columns like any other — the point of pulling them
    * OUT of the blob is that filters and aggregates on them
    * predicate-push and codegen where raw-JSON probing per row
    * wouldn't. */
  def propExtract(df: DataFrame, props: Column,
                  fields: Seq[(String, (String, String))]): DataFrame = {
    require(fields.nonEmpty, "propExtract: declare at least one field")
    fields.foldLeft(df) { case (d, (out, (path, tpe))) =>
      // try_cast, not cast: under ANSI a non-numeric field value
      // would fail the JOB — bad metadata must degrade to NULL
      d.withColumn(out, get_json_object(props, path).try_cast(tpe))
    }
  }
}
