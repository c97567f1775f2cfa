package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (hash-based) sampling for training-data pipelines.
  *
  * `sample(fraction)` / TABLESAMPLE are nondeterministic under retries
  * and repartitioning — a re-run of a failed stage can emit a different
  * sample, which breaks exactly-once training-set construction. Hashing
  * a stable key instead makes the sample a pure filter: reproducible
  * across runs, engines and cluster layouts, trivially parallel, and
  * pushed down to the scan like any predicate.
  *
  * The bucket is the first 16 bits of md5(key) read as a hex string, so
  * the same selection is expressible in any engine with md5 (the rate
  * is quantized to 1/65536 granularity). Lexicographic order on the
  * fixed-width lowercase hex prefix equals numeric order, so the filter
  * is a plain string comparison — no bigint conversion needed.
  */
object Sampling {

  /** 4-hex-char (16-bit) bucket of a row key. */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** Threshold hex string for a rate in [0,1]: keep rows whose bucket
    * sorts strictly below it. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"sample rate must be in [0,1] (got $rate)")
    f"${math.min(math.round(rate * 65536.0), 65535L)}%04x"
  }

  /** Keep a deterministic `rate` fraction of rows, selected by md5 of
    * `key`. A pure filter: survives retries, pushes down. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    if (rate >= 1.0) df else df.filter(hashBucket(key) < lit(thresholdHex(rate)))

  /** Stratified deterministic sampling: a per-stratum rate (e.g.
    * downsample the dominant language, keep the rest), same hash-filter
    * mechanics. Strata not in `rates` use `defaultRate`. Rates are
    * plan-time literals — the predicate is a codegen'd when-chain, no
    * join, no shuffle. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (s, r)) => when(strata === s, lit(thresholdHex(r))).otherwise(acc)
    }
    df.filter(hashBucket(key) < thr)
  }

  /** Deterministic train/val/test assignment: the md5 bucket of the
    * row key falls into consecutive 16-bit ranges sized by the split
    * fractions (in the given order; the last split absorbs the
    * quantization remainder). A pure when-chain projection — no
    * shuffle, no state, stable under retries/re-runs, and membership
    * never changes when the corpus grows (a doc's split is a function
    * of its key alone — the property that keeps eval sets
    * uncontaminated across dataset versions). Pair with
    * `Sources.writePartitioned(..., Seq("split"))` for a
    * directory-pruned layout. */
  def splitAssign(df: DataFrame, key: Column,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2 && splits.forall(_._2 > 0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"splitAssign: fractions must be positive and sum to 1 (got $splits)")
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val b = hashBucket(key)
    val chain = splits.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cum)) =>
        val t = lit(thresholdHex(cum))
        Some(acc.fold(when(b < t, name))(_.when(b < t, name)))
    }
    df.withColumn("split", chain.get.otherwise(splits.last._1))
  }

  /** Leakage-safe split by NEAR-DUP CLUSTER: near-duplicates of a
    * training document must not land in val/test — with a per-doc key
    * they do (a doc and its 0.9-jaccard copy hash independently), and
    * the eval set silently overlaps train. Here the split key is the
    * doc's cluster id from [[graft.ops.Dedup.dedupClusters]] (its own
    * id when unclustered), so an entire near-dup cluster moves as one
    * unit — the same md5-range mechanics as [[splitAssign]], with all
    * of its determinism/growth-stability properties lifted to the
    * cluster grain. One broadcast-or-shuffle left join onto the
    * cluster map (pair-count-sized — tiny next to the corpus), then a
    * pure projection. Output: the docs frame + (cluster_key, split). */
  def splitByCluster(docs: DataFrame, id: String, clusters: DataFrame,
                     splits: Seq[(String, Double)]): DataFrame = {
    // the unclustered fallback casts the id into the cluster-id space
    // (long, like dedupClusters' labels); a string id would cast to
    // NULL and silently dump every unclustered doc into the last
    // split — fail loudly instead
    require(docs.schema(id).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"splitByCluster: id column '$id' must be numeric (cluster ids are " +
        "long); hash a string id into a long key first")
    val cmap = clusters.select(col("doc_id").as("__cid"),
      col("cluster_id").as("__ck"))
    val keyed = docs.join(cmap, col(id) === col("__cid"), "left")
      .withColumn("cluster_key",
        coalesce(col("__ck"), col(id).cast("long")))
      .drop("__cid", "__ck")
    splitAssign(keyed, col("cluster_key"), splits)
  }

  /** Quality-curriculum token-budget selection: keep the best
    * documents — "best" = first under the caller's declared `order`
    * (typically quality desc + a unique tiebreak) — until the running
    * token total would exceed `budget`. The greedy prefix rule: a doc
    * is kept iff its cumulative token count (inclusive) is ≤ budget,
    * so the first over-budget doc and everything after it are dropped,
    * even if some later smaller doc would still have fit (the
    * deterministic, engine-replayable contract; bin-packing the tail
    * is [[graft.ops.Packing]]'s job).
    *
    * The running total is the distributed two-phase prefix scan
    * ([[graft.functions.ScanFns.withCumsum]] — one range-partitioned
    * sort, NO single-partition window), so the cut works at corpus
    * scale. Output carries `cum_tokens` for audit. */
  def tokenBudget(df: DataFrame, tokens: Column, budget: Long,
                  order: Seq[Column]): DataFrame = {
    require(budget > 0, s"tokenBudget: budget must be positive (got $budget)")
    graft.functions.ScanFns.withCumsum(df, tokens, order, "cum_tokens")
      .filter(col("cum_tokens") <= budget.toDouble)
  }

  /** Training-mix rebalancer: deterministically subsample strata so
    * the OUTPUT token mass follows the target `weights` (a Pile-style
    * static domain mix), keeping the maximum achievable volume — the
    * binding stratum (the one scarcest relative to its weight) is kept
    * whole and every other stratum is hash-downsampled to match:
    * N* = min_s(T_s / w_s); rate_s = w_s · N* / T_s (≤ 1, and rates
    * are invariant under scaling all weights, so `weights` need not
    * sum to 1 — only ratios matter).
    *
    * Everything stays in ONE plan: per-stratum token totals are a tiny
    * partial-agg; N* a one-row agg; the rate table broadcasts back
    * onto the corpus and the keep decision is the same md5-bucket
    * filter as [[hashSample]] (16-bit quantized via floor(x+0.5), so
    * any engine replays the exact selection). Sampling is per-DOC at
    * the stratum's rate, so the token mass hits the target in
    * expectation (docs are exchangeable within a stratum); strata
    * absent from `weights` are dropped, and a stratum named in
    * `weights` but absent from the corpus simply cannot contribute
    * (N* is computed over present strata).
    *
    * Output: the sampled rows plus their stratum's `mix_rate`. */
  def mixtureSample(df: DataFrame, key: Column, stratum: Column,
                    tokens: Column, weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixtureSample: weights must be positive ratios")
    val wcol = weights.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) => when(col("__stratum") === s, lit(w)).otherwise(acc)
    }
    val totals = df.groupBy(stratum.as("__stratum"))
      .agg(sum(tokens.cast("long")).cast("double").as("__t"))
      .withColumn("__w", wcol)
      .filter(col("__w").isNotNull && col("__t") > 0)
    val nstar = totals.agg(min(col("__t") / col("__w")).as("__nstar"))
    val rates = totals.crossJoin(broadcast(nstar))
      .withColumn("mix_rate",
        least(col("__w") * col("__nstar") / col("__t"), lit(1.0)))
      .withColumn("__thr", format_string("%04x",
        least(floor(col("mix_rate") * 65536.0 + 0.5), lit(65535.0)).cast("int")))
      .select(col("__stratum"), col("mix_rate"), col("__thr"))
    df.join(broadcast(rates), stratum === col("__stratum"))
      .filter(hashBucket(key) < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** Temperature-scaled domain mixture (the XLM-R / mT5 language
    * rebalancer): sampling weights q_s ∝ p_s^α with p_s the corpus
    * token share — α<1 flattens the distribution toward the tail
    * without a hand-written weight table. Reuses the max-volume rule
    * of [[mixtureSample]] with the computed q as the weights:
    * N* = min_s(T_s/q_s), rate_s = q_s·N* / T_s, md5-bucket filter.
    *
    * Cross-engine exactness: IEEE-754 requires sqrt to be correctly
    * rounded but NOT pow, so α is restricted to halves (0.5 → one
    * sqrt; 0.25 → sqrt∘sqrt) — the plan emits only sqrt and the
    * oracle replays bit-identical weights; the final rate is 16-bit
    * quantized like every sampler here. α=1 is a no-op mix (every
    * rate = 1 since q ∝ T). Everything stays ONE plan: totals are a
    * tiny partial agg, rates broadcast back, the keep decision pushes
    * to the scan. */
  def temperatureMix(df: DataFrame, key: Column, stratum: Column,
                     tokens: Column, alpha: Double): DataFrame = {
    val sqrts = alpha match {
      case 1.0 => 0
      case 0.5 => 1
      case 0.25 => 2
      case a => throw new IllegalArgumentException(
        s"temperatureMix: alpha=$a not engine-exact — only 1, 0.5, 0.25 " +
          "(IEEE sqrt chains) keep the selection replayable; use " +
          "mixtureSample with explicit weights for other exponents")
    }
    val totals = df.groupBy(stratum.as("__stratum"))
      .agg(sum(tokens.cast("long")).cast("double").as("__t"))
      .filter(col("__t") > 0)
    // q ∝ (T/ΣT)^α, but N* = min(T/q) and rate = q·N*/T are invariant
    // under scaling q, so ΣT (and the q normalizer) cancel: use T^α
    val q = (1 to sqrts).foldLeft(col("__t")) { (c, _) => sqrt(c) }
    val weighted = totals.withColumn("__w", q)
    val nstar = weighted.agg(min(col("__t") / col("__w")).as("__nstar"))
    val rates = weighted.crossJoin(broadcast(nstar))
      .withColumn("mix_rate",
        least(col("__w") * col("__nstar") / col("__t"), lit(1.0)))
      .withColumn("__thr", format_string("%04x",
        least(floor(col("mix_rate") * 65536.0 + 0.5), lit(65535.0)).cast("int")))
      .select(col("__stratum"), col("mix_rate"), col("__thr"))
    df.join(broadcast(rates), stratum === col("__stratum"))
      .filter(hashBucket(key) < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** DoReMi-style exponentiated-gradient domain reweighting (Xie et
    * al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language
    * Model Pretraining" — arXiv:2305.10429): given an integer-valued
    * per-row loss signal observed over training rounds, each round t
    * multiplies every domain's weight by exp(η · excess_t(d)) and
    * renormalizes; the published mixture is the smoothed AVERAGE of
    * the per-round softmax weights, (1−c)·mean_t w_t + c/K — domains
    * that persistently run "hot" (above the round mean) gain share,
    * the uniform floor c/K keeps every domain sampled. The output
    * weight table feeds [[mixtureSample]] directly.
    *
    * The EG recursion needs NO driver loop: with per-step
    * renormalization the unnormalized weight is u_t(d) =
    * exp(η · Σ_{s≤t} excess_s(d)) — normalizers cancel — so the whole
    * fit is one cumulative-sum window over the (rounds × domains)
    * level table. Scale shape: ONE partial-agg scan of the corpus to
    * T·K rows, then level-table windows (bounded by contract, the §5
    * invariant); nothing fact-sized shuffles twice.
    *
    * Cross-engine exactness: `loss` is cast to LONG (integer loss
    * units — chars, tokens, milli-loss; round means must be positive,
    * since the excess divides by them), so per-cell means are
    * exact-integer-sum / count (order-invariant); the RELATIVE excess
    * (L/mean_round − 1, dimensionless, bounded) is rounded to 6
    * decimals BEFORE the cumulative sum, and the published weights
    * are rounded to 6 decimals after the softmax, so a 1-ulp libm
    * exp() difference can never surface.
    *
    * Output: (domain, w_avg, doremi_weight), one row per domain. */
  def doremiWeights(df: DataFrame, domain: Column, roundId: Column,
                    loss: Column, eta: Double = 0.5,
                    smoothing: Double = 0.1): DataFrame = {
    require(eta > 0, s"doremiWeights: eta must be positive (got $eta)")
    require(smoothing >= 0 && smoothing < 1,
      s"doremiWeights: smoothing must be in [0,1) (got $smoothing)")
    import org.apache.spark.sql.expressions.Window
    val lvl = df.groupBy(domain.as("domain"), roundId.cast("long").as("round"))
      .agg((sum(loss.cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("__loss"))
    // complete grid: a domain absent from a round carries excess 0
    // (no evidence either way), so its weight coasts through the step
    val grid = lvl.select("domain").distinct()
      .crossJoin(broadcast(lvl.select("round").distinct()))
    val byRound = Window.partitionBy("round")
    // every unordered double reduction (per-round loss mean, softmax
    // denominator, cross-round weight average) runs on the 2^-40
    // fixed-point grid — a raw double sum is addition-order-dependent,
    // a latent round-6 boundary lottery against the DuckDB oracle
    // (the terms are dimensionless and O(1), far inside the grid)
    import graft.functions.Exact.{gridFloor40, Grid40}
    val cent = grid.join(lvl, Seq("domain", "round"), "left")
      .withColumn("__rmean",
        (sum(gridFloor40(col("__loss"))).over(byRound).cast("double") /
          lit(Grid40)) / count(col("__loss")).over(byRound).cast("double"))
      .withColumn("__ex", round(
        coalesce(col("__loss"), col("__rmean")) / col("__rmean") - lit(1.0), 6))
    val cum = Window.partitionBy("domain").orderBy("round")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = cent
      .withColumn("__u", exp(lit(eta) * sum("__ex").over(cum)))
      .withColumn("__wt", col("__u") /
        (sum(gridFloor40(col("__u"))).over(byRound).cast("double") / lit(Grid40)))
      .withColumn("__k", count(lit(1)).over(byRound))
    wt.groupBy("domain")
      .agg(round(graft.functions.Exact.gridSum40(col("__wt")) /
        count(lit(1)).cast("double"), 6).as("w_avg"), max("__k").as("__k"))
      .select(col("domain"), col("w_avg"),
        round(lit(1.0 - smoothing) * col("w_avg") +
          lit(smoothing) / col("__k").cast("double"), 6).as("doremi_weight"))
  }

  /** Deterministic weighted (importance) sampling: keep probability
    * p = min(1, rate · w / mean(w)), decided by the md5Unif uniform —
    * high-weight (high-quality) docs oversample at a fixed expected
    * output volume of rate · N docs. The mean weight is the
    * decimal-accumulated exact mean (a raw double avg is
    * addition-order-dependent and would make the kept set
    * partitioning-dependent); the uniform is engine-replayable, so
    * the selection is a pure deterministic filter like every sampler
    * here. Weights must be non-negative; NULL weights drop the row.
    * Output: kept rows + `sample_p` for audit. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     rate: Double, seed: Long): DataFrame = {
    require(rate > 0.0 && rate <= 1.0,
      s"weightedSample: rate must be in (0,1] (got $rate)")
    val mw = df.agg(graft.functions.Exact.davg(weight.cast("double")).as("__mw"))
    df.crossJoin(broadcast(mw))
      .withColumn("sample_p",
        least(lit(rate) * weight.cast("double") / col("__mw"), lit(1.0)))
      .filter(graft.functions.BaseFns.md5Unif(key, seed) < col("sample_p"))
      .drop("__mw")
  }

  /** Preference-pair mining from near-dup clusters — the
    * reward-model/DPO data shaping step: documents in one near-dup
    * cluster say (roughly) the same thing, so the cluster's BEST copy
    * vs its WORST copy under a quality score is a natural (chosen,
    * rejected) pair with content held constant — exactly the
    * contrast a preference model should learn. Per cluster: chosen =
    * argmax (score, then LOWEST id on ties), rejected = argmin
    * (score, then HIGHEST id) — a 2-member cluster with equal scores
    * still yields a deterministic, distinct pair; singleton clusters
    * yield nothing (no contrast).
    *
    * Shape: clusters come from [[graft.ops.Dedup.dedupClusters]];
    * this adds ONE cluster-keyed partial agg (max_by/min_by over
    * (score, ±id) structs — merges map-side) + one id-keyed join of
    * the two picks back to payloads. Output: (cluster_id, chosen_id,
    * rejected_id, chosen_score, rejected_score). */
  def preferencePairs(docs: DataFrame, id: String, clusters: DataFrame,
                      score: Column): DataFrame = {
    val scored = docs.select(col(id).as("__pid"), score.as("__sc"))
      .join(clusters.select(col("doc_id").as("__pid"), col("cluster_id")),
        Seq("__pid"))
    scored.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("__n"),
        max_by(col("__pid"), struct(col("__sc"), -col("__pid"))).as("chosen_id"),
        min_by(col("__pid"), struct(col("__sc"), -col("__pid"))).as("rejected_id"),
        max(struct(col("__sc"), -col("__pid"))).getField("__sc").as("chosen_score"),
        min(struct(col("__sc"), -col("__pid"))).getField("__sc").as("rejected_score"))
      .filter(col("__n") >= 2)
      .drop("__n")
  }

  /** Effective sample size of a WEIGHTED sample (Kish 1965) — the
    * honest "n" behind every weighted mean this library reports:
    * importance weights (DSIR, temperature mixing, HT inverse-
    * probability) concentrate evidence on few rows, and ESS =
    * (Σw)²/Σw² says how many EQUAL-weight rows the sample is actually
    * worth; design effect = n/ESS is the variance inflation to quote
    * beside any weighted estimate. ONE partial-agg scan with
    * exact-decimal Σw and Σw² (the Exact rules — order-invariant),
    * two closing divisions. Zero/negative weights are contract
    * violations and excluded. Output (1 row): n, sum_w, ess,
    * design_effect. */
  def effectiveSampleSize(df: DataFrame, weight: Column): DataFrame = {
    import graft.functions.Exact
    val ok = df.filter(weight.isNotNull && weight > 0.0)
    ok.agg(count(lit(1)).as("n"),
        Exact.dsum(weight.cast("double")).as("sum_w"),
        Exact.dprodSum(weight.cast("double"), weight.cast("double"))
          .as("__q"))
      .withColumn("ess",
        when(col("__q") > 0.0,
          col("sum_w") * col("sum_w") / col("__q")))
      .withColumn("design_effect",
        when(col("ess") > 0.0, col("n").cast("double") / col("ess")))
      .select(col("n"), col("sum_w"), col("ess"), col("design_effect"))
  }

  /** Horvitz–Thompson estimation over a [[weightedSample]] output —
    * the read-back half of the sampling story: each kept row carries
    * its inclusion probability `sample_p`, so the corpus total of any
    * metric is estimated unbiasedly as Σ v/p, with the Poisson-
    * sampling variance estimate Σ v²(1−p)/p² and the ±1.96·√var
    * normal CI. One partial-aggregatable scan of the SAMPLE (the
    * point: the corpus is never re-read); sums cross the
    * floor(x·2^24+0.5) Long grid so the estimate is partitioning-
    * invariant and engine-replayable. Rows with p ≤ 0 or NULL are
    * contract violations and excluded.
    * Output: one row (estimate, variance, ci_lo, ci_hi, n_sampled). */
  def htEstimate(sample: DataFrame, value: Column,
                 pCol: Column): DataFrame = {
    val S = 16777216.0
    val ok = sample.filter(pCol.isNotNull && pCol > 0.0 && value.isNotNull)
    val t = floor(value.cast("double") / pCol * S + 0.5).cast("decimal(38,0)")
    val v = floor(value.cast("double") * value.cast("double") *
      (lit(1.0) - pCol) / (pCol * pCol) * S + 0.5).cast("decimal(38,0)")
    val agg = ok.agg(
      (sum(t).cast("double") / S).as("estimate"),
      (sum(v).cast("double") / S).as("variance"),
      count(lit(1)).as("n_sampled"))
    agg.select(col("estimate"), col("variance"),
      (col("estimate") - lit(1.96) * sqrt(col("variance"))).as("ci_lo"),
      (col("estimate") + lit(1.96) * sqrt(col("variance"))).as("ci_hi"),
      col("n_sampled"))
  }

  /** Deterministic negative sampling for contrastive training: k
    * pseudo-random corpus rows per anchor, addressed by rowid through
    * the md5Unif uniform — retry-safe and engine-replayable where
    * rand() would change under retries and repartitioning. A draw
    * that lands on the anchor itself is DROPPED (the standard
    * self-exclusion; expected loss ≈ k/N of the draws at corpus
    * scale), so an anchor can get < k negatives. Hard negatives
    * compose differently: Similarity.lshTopKJoin + an anti-join on
    * the known positives.
    *
    * Shape: ONE corpus rowid sort (sorted zipWithIndex, no global
    * window); draws are a bounded explode of the anchor table (k rows
    * per anchor); the pick is a shuffle join on the rowid index.
    * Output: (anchor_id, draw_id, corpus columns…). */
  def negativeSample(anchors: DataFrame, anchorId: Column,
                     corpus: DataFrame, corpusId: String,
                     k: Int, seed: Long): DataFrame = {
    require(k >= 1 && k <= 1000, s"negativeSample: k=$k out of [1,1000]")
    val ranked = graft.core.Tibble.rowidToColumn(
      corpus, Seq(col(corpusId)), "__nr")
    val n = corpus.agg(count(lit(1)).cast("double").as("__nn"))
    val draws = anchors.select(anchorId.as("anchor_id"))
      .crossJoin(broadcast(n))
      .select(col("anchor_id"),
        explode(sequence(lit(1L), lit(k.toLong))).as("draw_id"), col("__nn"))
      .select(col("anchor_id"), col("draw_id"),
        (floor(graft.functions.BaseFns.md5Unif(
            concat_ws(" ", col("anchor_id").cast("string"),
              col("draw_id").cast("string")), seed)
          * col("__nn")) + 1).cast("long").as("__nr"))
    draws.join(ranked, Seq("__nr"))
      .filter(!(col(corpusId) <=> col("anchor_id")))
      .drop("__nr")
  }

  /** Deterministic domain-interleaved global training order: shuffle
    * each domain internally by a seeded md5 key, then round-robin
    * across domains — round r of the output emits the r-th pick of
    * every domain (sorted by domain name within a round). This is the
    * "shuffle the corpus without domain clumping" pretraining order: a
    * pure hash shuffle can still open with a long run of the dominant
    * domain, while interleaving bounds any window's domain skew by the
    * corpus-wide ratio ± one round.
    *
    * Shape: one window partitioned BY DOMAIN (per-domain pick rank —
    * bounded partitions, never global), then the global position is
    * the sorted-zipWithIndex rowid on (round, domain) — one
    * range-partitioned sort, no single-partition window. The order key
    * is md5(seed || ' ' || id), so any engine replays the identical
    * permutation. Output: input columns + `pos` (1-based global
    * training position). */
  def interleaveByDomain(df: DataFrame, domain: Column, id: Column,
                         seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shuffleKey = md5(concat_ws(" ", lit(seed.toString), id.cast("string")))
    val ranked = df.withColumn("__round",
      row_number().over(Window.partitionBy(domain).orderBy(shuffleKey, id)))
    graft.core.Tibble.rowidToColumn(ranked,
        Seq(col("__round"), domain, id), "pos")
      .drop("__round")
  }

  /** Neyman-optimal stratified sample allocation (classical survey
    * sampling: n_h ∝ N_h·S_h — strata that are bigger OR more variable
    * on the metric get more of the budget; minimizes the estimator's
    * variance for a fixed total n, which is what an eval-set or
    * labeling budget wants). One partial-aggregatable scan computes
    * each stratum's exact moments on the floor(x·2^24+0.5) Long grid
    * (decimal sums — partitioning-invariant), the per-stratum sd and
    * weight are fixed-order IEEE arithmetic, and the weight total
    * crosses back from a ≤K-row broadcast — every value replays
    * bit-for-bit in an external engine. Allocations are capped at the
    * stratum's population (floor(x+0.5) rounding, so the grand total
    * can differ from `budget` by rounding; the caller tops up from
    * the largest remainder if exactness matters). All-degenerate
    * corpora (every stratum sd 0) fall back to proportional-to-size.
    * Output: (stratum, n_rows, sd, alloc). */
  def neymanAllocation(df: DataFrame, stratum: Column, metric: Column,
                       budget: Long): DataFrame = {
    require(budget >= 1, s"neymanAllocation: budget must be >= 1 (got $budget)")
    val S = 16777216.0 // 2^24 grid
    val fx = floor(metric.cast("double") * S + 0.5).cast("decimal(38,0)")
    val m = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(fx).as("__s1"), sum(fx * fx).as("__s2"))
    // population sd on the grid: sqrt(N·Σf² − (Σf)²) / (N·2^24);
    // the radicand is exact decimal, one sqrt, fixed division chain
    val num = (col("n_rows").cast("decimal(38,0)") * col("__s2") -
      col("__s1") * col("__s1"))
    val withSd = m.withColumn("sd",
        sqrt(num.cast("double")) / (col("n_rows").cast("double") * S))
      .withColumn("__fw",
        floor(col("n_rows").cast("double") * col("sd") * S + 0.5)
          .cast("decimal(38,0)"))
    val tot = withSd.agg(sum(col("__fw")).as("__tot"),
      sum(col("n_rows")).as("__totn"))
    withSd.crossJoin(broadcast(tot))
      .withColumn("alloc", least(col("n_rows"),
        when(col("__tot") > 0,
          floor(lit(budget.toDouble) * col("__fw").cast("double") /
            col("__tot").cast("double") + 0.5))
        .otherwise( // all-sd-zero corpus: proportional to size
          floor(lit(budget.toDouble) * col("n_rows").cast("double") /
            col("__totn").cast("double") + 0.5))
        .cast("long")))
      .select(col("stratum"), col("n_rows"), col("sd"), col("alloc"))
  }

  /** Deterministic multi-epoch training order: epoch e's permutation
    * sorts by md5(seed, e, id) — each epoch is an independent,
    * reproducible shuffle of the full corpus, and a resumed/re-run
    * job rebuilds the identical order (the property `sample(shuffle)`
    * loses under stage retries). Emits one row per (doc, epoch) with
    * `pos`, the doc's 1-based position inside its epoch.
    *
    * Shape: the corpus is exploded epochs× (the manifest-grain frame a
    * training loader reads — typically id+path columns, not payloads)
    * and globally ordered ONCE by (epoch, key) via the distributed
    * range-partitioned rowid sort; the per-epoch position is the
    * global rowid minus epoch·N (one count scan for N — a single Long
    * through the driver). No per-epoch window ever forms: an epoch's
    * rows would be a corpus-sized partition. */
  def epochOrder(df: DataFrame, id: Column, epochs: Int,
                 seed: Long): DataFrame = {
    require(epochs >= 1 && epochs <= 128,
      s"epochOrder: epochs=$epochs outside 1..128 (the explode factor)")
    val n = df.count()
    val exploded = df.withColumn("epoch",
      explode(sequence(lit(0), lit(epochs - 1))))
    val key = md5(concat_ws(" ", lit(seed.toString),
      col("epoch").cast("string"), id.cast("string")))
    graft.core.Tibble.rowidToColumn(exploded.withColumn("__ek", key),
        Seq(col("epoch"), col("__ek"), id), "__gp")
      .withColumn("pos", col("__gp") - col("epoch").cast("long") * n)
      .drop("__ek", "__gp")
  }

  /** DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how much its hashed n-gram
    * distribution resembles a TARGET domain relative to the raw
    * corpus — weight_d = Σ_grams log(p̂_target(bin)/p̂_raw(bin)) with
    * add-`smooth` smoothed bin probabilities over `bins` hashed
    * buckets. High-weight docs are the ones to keep when building a
    * domain-matched subset; feed the weights to [[tokenBudget]]
    * (rank by weight desc) or [[weightedSample]] for the selection.
    *
    * Bins are engine-portable (12-hex md5 prefix mod `bins`), bin
    * probabilities are exact integer-count arithmetic, and the
    * per-doc sum is decimal-exact (order-invariant), so the whole
    * score replays in SQL; the log itself relies on both engines'
    * correctly-rounded ln (the same contract the trig/special family
    * ships under, oracle-proven there).
    *
    * Shape: two bins-bounded partial aggs (the n-gram vocabulary
    * never materializes — counts collapse to ≤ `bins` rows map-side),
    * a broadcast bin-ratio table, then ONE explode+join+sum pass over
    * the raw corpus. No document ever compares to another document.
    * Output: raw's columns + `weight` (docs with no grams weigh 0). */
  def dsirWeights(raw: DataFrame, id: Column, text: Column,
                  target: DataFrame, targetText: Column,
                  n: Int = 2, bins: Int = 1024,
                  smooth: Double = 1.0): DataFrame = {
    require(n >= 1, s"dsirWeights: n=$n must be >= 1")
    require(bins >= 2 && bins <= (1 << 20),
      s"dsirWeights: bins=$bins outside the broadcast-ratio-table envelope")
    require(smooth > 0, s"dsirWeights: smooth=$smooth must be > 0 (unseen bins)")
    import graft.ops.Dedup
    import graft.functions.Exact
    def binOf(g: Column): Column =
      pmod(conv(substring(md5(g), 1, 12), 16, 10).cast("long"), lit(bins))
    val rawG = raw.select(id.as("__did"),
        explode(Dedup.shingles(Dedup.tokens(text), n)).as("__g"))
      .withColumn("__b", binOf(col("__g"))).drop("__g")
    val tgtCnt = target
      .select(explode(Dedup.shingles(Dedup.tokens(targetText), n)).as("__g"))
      .select(binOf(col("__g")).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__ct"))
    val rawCnt = rawG.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val totals = rawCnt.agg(sum(col("__cr")).as("__tr"))
      .crossJoin(tgtCnt.agg(sum(col("__ct")).as("__tt")))
    // log ratio per OCCUPIED raw bin (every scored gram lands in one);
    // ratio-table rows <= bins, broadcast back
    val ratio = rawCnt
      .join(tgtCnt, Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__b"), log(
        ((coalesce(col("__ct"), lit(0L)).cast("double") + lit(smooth)) /
          (col("__tt").cast("double") + lit(smooth * bins))) /
          ((col("__cr").cast("double") + lit(smooth)) /
            (col("__tr").cast("double") + lit(smooth * bins)))).as("__lr"))
    val weights = rawG.join(broadcast(ratio), Seq("__b"))
      .groupBy(col("__did"))
      .agg(Exact.dsum(col("__lr")).as("weight"))
    raw.join(weights, id <=> col("__did"), "left")
      .withColumn("weight", coalesce(col("weight"), lit(0.0)))
      .drop("__did")
  }

  /** Cluster-balanced diversity subsample: k-means the embedding
    * cloud ([[Similarity.kmeansLloyd]] — deterministic seeds,
    * fixed-point centroids), assign every vector to its nearest final
    * centroid, then keep `perCluster` rows per cluster chosen by a
    * seeded md5 draw. Uniform hash-sampling keeps the corpus's
    * cluster imbalance (a 90%-boilerplate crawl yields a
    * 90%-boilerplate sample); capping per cluster instead yields a
    * spread-out subset — the standard seed set for human eval or a
    * distilled fine-tuning mix.
    *
    * Topology: the Lloyd loop's per-iteration cost is a projection +
    * one fixed-size centroid aggregate (corpus never shuffles); the
    * final assignment is one broadcast-argmin partial agg; the
    * per-cluster cut is [[graft.plans.TopK.topKPerGroup]] — bounded
    * heaps, map-side pruned, NO window sort of the corpus. Every stage
    * is deterministic and engine-replayable (distances are per-row
    * IEEE scalars, draws are md5).
    * Output: (cid, id, pick ∈ 1..perCluster ordered by the draw). */
  def diversitySample(corpus: DataFrame, id: String, vec: String,
                      k: Int, dims: Int, iters: Int,
                      perCluster: Int, seed: Long): DataFrame = {
    require(perCluster >= 1,
      s"diversitySample: perCluster=$perCluster must be >= 1")
    val cents = Similarity.kmeansLloyd(corpus, id, vec, k, dims, iters)
      .select(col("cid").as("list_id"), col("centroid"))
    val assigned = Similarity.assignToCentroids(corpus, id, vec, cents)
      .select(col("list_id").as("cid"), col(id))
    val drawn = assigned.withColumn("__h",
      md5(concat(lit(seed.toString), col(id).cast("string"))))
    val kept = graft.plans.TopK.topKPerGroup(drawn, Seq("cid"),
      Seq(col("__h").asc, col(id).asc), perCluster)
    // pick = rank of the draw within the kept ≤ perCluster rows — a
    // window over bounded (≤ perCluster) partitions, not the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("__h").asc, col(id).asc)
    kept.withColumn("pick", row_number().over(w)).drop("__h")
  }

  /** Materialize a [[waterFillQuotas]] allocation: keep, per stratum,
    * the best documents (by `order` — quality desc, id tiebreak) whose
    * running token total fits the stratum's quota — the greedy-prefix
    * rule tokenBudget applies globally, here per stratum under the
    * allocator's caps. The quota table is K rows and broadcasts; the
    * running total is a stratum-PARTITIONED window (every partition is
    * one source — bounded, never the global window). A document is
    * kept iff its whole token count fits (cum <= quota), the
    * tokenBudget prefix convention. Output: kept rows + (cum_tokens,
    * quota) for audit. */
  def selectToQuotas(df: DataFrame, stratum: Column, tokens: Column,
                     order: Seq[Column], quotas: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.join(broadcast(quotas.select(col("stratum"), col("quota"))),
        stratum === col("stratum"))
      .withColumn("cum_tokens",
        sum(tokens.cast("long")).over(w))
      .filter(col("cum_tokens").cast("double") <= col("quota"))
      .drop("stratum")
  }

  /** Water-filling token-budget allocation across strata: every
    * stratum keeps its full token count up to a common cap λ, chosen
    * so the quotas exactly exhaust the budget — the max-min-fair
    * answer to "how do I split a training budget across sources
    * without letting the biggest crawl eat it". quota_i =
    * min(total_i, λ), with λ = max over i (totals ascending) of
    * (budget − Σ_{j<i} total_j) / (K − i + 1) where total_i reaches
    * the candidate cap — the standard water-level identity, computed
    * entirely with window algebra over the STRATUM-GRAIN totals table
    * (K rows — tiny by contract, the forcats level-table argument; the
    * corpus itself is touched by ONE partial agg). When the corpus
    * fits the budget, λ = ∞ and every stratum keeps its total. λ and
    * quotas are double divisions over exact long totals — engine-
    * exact, fixed order. Output: (stratum, total, quota), quota
    * summing to min(budget, Σ totals). */
  def waterFillQuotas(df: DataFrame, stratum: Column, tokens: Column,
                      budget: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"waterFillQuotas: budget must be > 0 (got $budget)")
    val totals = df.groupBy(stratum.as("stratum"))
      .agg(sum(tokens.cast("long")).as("total"))
    val ord = Window.orderBy(col("total").asc, col("stratum").asc)
    val k = Window.partitionBy()
    val ranked = totals
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__cum", sum(col("total")).over(
        ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__k", count(lit(1)).over(k))
    val lam = (lit(budget) - (col("__cum") - col("total")).cast("double")) /
      (col("__k") - col("__rn") + 1).cast("double")
    val level = ranked
      .withColumn("__lam", when(col("total").cast("double") >= lam, lam))
      .withColumn("__level",
        coalesce(max(col("__lam")).over(k), lit(Double.PositiveInfinity)))
    level.select(col("stratum"), col("total"),
      least(col("total").cast("double"), col("__level")).as("quota"))
  }

  /** Split-leakage AUDIT — the count behind the [[splitByCluster]]
    * guard: given a near-dup PAIR table (from any Dedup family) and a
    * split assignment, how many pairs STRADDLE split boundaries (a
    * train doc whose 0.9-jaccard copy sits in test is exactly the
    * contamination an eval then can't see)? Two assignment joins (the
    * assignment frame is docs-grain — hash joins on the pair table's
    * own partitioning), split names normalized (least, greatest) so
    * (train,test) and (test,train) count as one cell, ONE pair-sized
    * keyed aggregate. Output per (split_a, split_b): n_pairs +
    * `leaking` (false only on the diagonal). A healthy cluster-keyed
    * split reads zero leaking rows; a per-doc-keyed split reads the
    * contamination it silently admits. */
  def splitLeakage(pairs: DataFrame, assign: DataFrame,
                   id: String): DataFrame = {
    val sa = assign.select(col(id).as("a"), col("split").as("__sa"))
    val sb = assign.select(col(id).as("b"), col("split").as("__sb"))
    pairs.select("a", "b").join(sa, Seq("a")).join(sb, Seq("b"))
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaking", col("split_a") =!= col("split_b"))
  }
}
