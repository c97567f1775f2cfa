package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) joins via symmetric-deletion blocking — the
  * entity-resolution / spell-correction primitive of a data-cleaning
  * pipeline (match dirty crawl metadata, OCR output, or user-typed
  * strings against a canonical registry).
  *
  * Blocking is the SymSpell symmetric-delete scheme (public domain,
  * Garbe 2012): every string expands map-side to the set of strings
  * reachable by deleting up to `maxDist` characters, and two strings
  * within Levenshtein distance d share at least one deletion variant
  * when both sides expand d deletions — a substitution at position i
  * meets at "both deleted i", an insertion/deletion meets at "longer
  * side deleted the extra char". So candidate generation is COMPLETE
  * for unit-cost Levenshtein ≤ maxDist, and the exact distance is only
  * computed on candidates, once per distinct pair.
  *
  * Scale shape (the 100 TB contract):
  * - variant expansion is a pure map-side explode: L+1 keys per row at
  *   maxDist=1, O(L²/2) at maxDist=2 — the documented replication
  *   knob, linear in input size for bounded string length;
  * - keys shuffle as 64-bit hashes (xxhash64 of the variant), never as
  *   strings, so the exchange stays narrow regardless of entity width;
  * - per-key caps drop pathological blocks (a high-frequency short
  *   string whose variant bucket would go quadratic) BEFORE the join —
  *   the same skew contract as Dedup.bucketPairs, size counted under
  *   the join's own hash partitioning so the Exchange is shared;
  * - the threshold Levenshtein DP (early-exit past `maxDist`) runs on
  *   each candidate occurrence and REJECTS before the closing
  *   DISTINCT, so only verified pairs cross that exchange; a matching
  *   pair pays the cheap DP once per shared variant key (bounded by
  *   the per-string variant count) — strings-wide shuffle bytes for
  *   the rejected majority was the bigger cost (r17, guide §2.3).
  */
object FuzzyJoin {

  /** All strings reachable from `s` by deleting at most `d` characters
    * (including `s` itself), distinct. d ∈ {1, 2} — beyond 2 the
    * variant count is L!/(L-d)!/d! per row and a q-gram or trie scheme
    * beats blocking by deletes. */
  def deletionVariants(s: Column, d: Int): Column = {
    require(d == 1 || d == 2, s"deletionVariants: d=$d not in {1, 2}")
    def del1(x: Column): Column =
      transform(
        // sequence(1, 0) would generate DESCENDING [1, 0] — guard the
        // empty string to an empty index list instead
        when(length(x) > 0, sequence(lit(1), length(x)))
          .otherwise(array().cast("array<int>")),
        i => concat(x.substr(lit(1), i - 1), x.substr(i + 1, length(x))))
    val v1 = del1(s)
    if (d == 1) array_distinct(concat(array(s), v1))
    else array_distinct(concat(array(s), v1,
      flatten(transform(v1, v => del1(v)))))
  }

  /** Self-join: all pairs (a < b) within Levenshtein distance
    * `maxDist`. Output: (a, b, s_a, s_b, dist).
    *
    * The keyed+capped subplan is built ONCE and joined to itself, so
    * both join sides share a single Exchange (ReuseExchange — the
    * variant explosion is computed once, not per side). Buckets with
    * more than `maxBucket` members are dropped (skew guard — recall
    * loss there is deliberate and should be monitored by counting
    * dropped keys at threshold-tuning time; a bucket that hot means a
    * near-constant string column, which wants exact groupBy dedup, not
    * fuzzy matching). */
  def editDistanceSelfJoin(df: DataFrame, id: String, s: String,
                           maxDist: Int, maxBucket: Int = 1000): DataFrame = {
    val keyed = df.select(col(id).as("__id"), col(s).as("__s"))
      .filter(col("__s").isNotNull)
      .select(col("__id"), col("__s"),
        explode(deletionVariants(col("__s"), maxDist)).as("__v"))
      .select(col("__id"), col("__s"), xxhash64(col("__v")).as("__k"))
    val capped = keyed
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__k"))))
      .filter(col("__bn") > 1 && col("__bn") <= maxBucket).drop("__bn")
    val l = capped.toDF("a", "s_a", "__k")
    val r = capped.toDF("b", "s_b", "__k")
    // distance BEFORE distinct (r17, guide §2.3 "shuffle fewer
    // bytes"): the threshold DP re-runs on the handful of variant
    // keys a matching pair shares, but the distinct's string-wide
    // shuffle then carries only pairs that PASSED the filter —
    // candidates that verification rejects (the vast majority at a
    // loose block radius) never reach the exchange. `dist` is a pure
    // function of (s_a, s_b), so distinct-then-compute and
    // compute-then-distinct emit identical rows.
    l.join(r, Seq("__k")).filter(col("a") < col("b"))
      .select("a", "b", "s_a", "s_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** Sorted-neighborhood blocking self-join (Hernández & Stolfo's
    * merge/purge windowing): sort the registry by the string key
    * (then id for tie determinism), give each row a distributed
    * rowid, pair every row with its `window − 1` successors, and keep
    * the pairs within Levenshtein `maxDist`. The classic complement
    * to SymSpell deletion blocking ([[editDistanceSelfJoin]]): the
    * deletion scheme is exact for its radius but bounded to d ≤ 2;
    * the sorted window catches shared-prefix variants at ANY edit
    * distance the filter allows, at the cost of missing pairs whose
    * edits change the sort prefix (run BOTH and union pairs for the
    * production merge/purge recall — each is one cheap pass).
    *
    * Scale shape: ONE range-partitioned sort
    * ([[graft.core.Tibble.rowidToColumn]]'s distributed rowid — no
    * single-partition window), a (window−1)-way offset explode, and
    * ONE rowid equi-join — work is corpus × window, never all-pairs,
    * with no skew hazard (rowids are unique by construction, so no
    * bucket can run hot). Output: (a, b, s_a, s_b, dist), a < b. */
  def sortedNeighborhoodPairs(df: DataFrame, id: String, s: String,
                              window: Int, maxDist: Int): DataFrame = {
    require(window >= 2 && window <= 1024,
      s"sortedNeighborhoodPairs: window=$window outside 2..1024")
    require(maxDist >= 1, s"sortedNeighborhoodPairs: maxDist=$maxDist must be >= 1")
    val ranked = graft.core.Tibble.rowidToColumn(
      df.select(col(id).as("__id"), col(s).as("__s"))
        .filter(col("__s").isNotNull),
      Seq(col("__s"), col("__id")), "__rid")
    val left = ranked
      .select(col("__id").as("__ida"), col("__s").as("__sa"), col("__rid"),
        explode(sequence(lit(1), lit(window - 1))).as("__j"))
      .select(col("__ida"), col("__sa"),
        (col("__rid") + col("__j")).as("__rid"))
    left.join(
        ranked.select(col("__id").as("__idb"), col("__s").as("__sb"),
          col("__rid")),
        Seq("__rid"))
      .select(
        when(col("__ida") < col("__idb"), col("__ida"))
          .otherwise(col("__idb")).as("a"),
        when(col("__ida") < col("__idb"), col("__idb"))
          .otherwise(col("__ida")).as("b"),
        when(col("__ida") < col("__idb"), col("__sa"))
          .otherwise(col("__sb")).as("s_a"),
        when(col("__ida") < col("__idb"), col("__sb"))
          .otherwise(col("__sa")).as("s_b"))
      // same verify-before-distinct ordering as editDistanceSelfJoin
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** Production merge/purge pair generation: the UNION of the two
    * blocking passes — [[editDistanceSelfJoin]] (deletion blocking:
    * exact within its d ≤ 2 radius, order-insensitive) and
    * [[sortedNeighborhoodPairs]] (sort-window: shared-prefix variants
    * at any filterable distance, plus anything a hot-bucket cap
    * dropped from the deletion pass). Each pass is one cheap
    * linear-ish scan; their union is the standard multi-pass
    * merge/purge recall recipe. Output: (a, b, dist), a < b,
    * distinct. */
  def mergePurgePairs(df: DataFrame, id: String, s: String,
                      window: Int, maxDist: Int,
                      maxBucket: Int = 1000): DataFrame =
    editDistanceSelfJoin(df, id, s, maxDist, maxBucket)
      .select(col("a"), col("b"), col("dist"))
      .unionByName(
        sortedNeighborhoodPairs(df, id, s, window, maxDist)
          .select(col("a"), col("b"), col("dist")))
      .distinct()

  /** Bipartite lookup: every left row matched to the right rows within
    * Levenshtein distance `maxDist` — the dictionary-correction /
    * registry-matching form (left = dirty probes, right = canonical
    * entities). Output: (left_id, right_id, left_s, right_s, dist).
    *
    * Each side expands and caps independently; a key hot on EITHER
    * side is dropped from that side (the candidate count through a key
    * is l_count × r_count, so capping each factor bounds the
    * product). */
  def editDistanceJoin(left: DataFrame, lid: String, ls: String,
                       right: DataFrame, rid: String, rs: String,
                       maxDist: Int, maxBucket: Int = 1000): DataFrame = {
    def expand(df: DataFrame, id: String, s: String,
               idAs: String, sAs: String): DataFrame =
      df.select(col(id).as(idAs), col(s).as(sAs))
        .filter(col(sAs).isNotNull)
        .select(col(idAs), col(sAs),
          explode(deletionVariants(col(sAs), maxDist)).as("__v"))
        .select(col(idAs), col(sAs), xxhash64(col("__v")).as("__k"))
        .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__k"))))
        .filter(col("__bn") <= maxBucket).drop("__bn")
    expand(left, lid, ls, "left_id", "left_s")
      .join(expand(right, rid, rs, "right_id", "right_s"), Seq("__k"))
      .select("left_id", "right_id", "left_s", "right_s")
      // same verify-before-distinct ordering as editDistanceSelfJoin
      .withColumn("dist", levenshtein(col("left_s"), col("right_s"), maxDist))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** End-to-end ENTITY RESOLUTION over a dirty registry: fuzzy-match
    * ([[editDistanceSelfJoin]] — SymSpell blocking, exact Levenshtein
    * on candidates only), transitively close the match graph into
    * entities ([[graft.ops.Dedup.dedupClusters]]), then pick each
    * entity's canonical record by an explicit preference column, ties
    * to the lowest id ([[graft.ops.Dedup.clusterRepresentatives]]).
    * The full record-linkage pass a crawl-metadata or author/domain
    * registry cleanup runs: every input row gets its entity id, its
    * entity's canonical row (id + string), the entity size, and the
    * is-canonical flag.
    *
    * Scale shape: the pair stage is the capped banded self-join (one
    * shared Exchange, skew buckets dropped); the closure iterates
    * min-label joins over the PAIR-count-sized edge list, not the
    * registry; the canonical pick is one entity-keyed max_by partial
    * agg; the final joins are registry-keyed equi-joins. Nothing is
    * all-pairs; nothing collects.
    * Output: (id, entity_id, canonical_id, canonical_s, n_members,
    * is_canonical). */
  def resolveEntities(df: DataFrame, id: String, s: String, maxDist: Int,
                      pref: Column, maxBucket: Int = 1000): DataFrame =
    resolveEntitiesFromPairs(df, id, s,
      editDistanceSelfJoin(df, id, s, maxDist, maxBucket), pref)

  /** BLOCKING-quality audit (the record-linkage tuning pair:
    * Christen's pair completeness + reduction ratio) — the numbers
    * that justify a blocking scheme before anyone trusts its ER
    * output: pair completeness = what share of the reference truth
    * pairs the candidates reach (recall of the blocking topology);
    * reduction ratio = what share of the n·(n−1)/2 all-pairs space it
    * never had to score. A scheme at PC 0.98 / RR 0.9999 is the whole
    * reason ER runs at 100 TB; the audit is how you compare deletion
    * blocking vs sort-window vs their union on YOUR registry.
    *
    * Both inputs are (a, b) pair frames — canonicalized here
    * (undirected, self-pairs dropped, distinct) so callers can feed
    * raw pass output. Work: two pair-frame distincts + one semi join
    * + 1-row aggs; the registry contributes one count. All counts
    * exact integers; two closing divisions. n_truth = 0 reads NULL
    * completeness (SQL-style). Output (1 row): n_rows, all_pairs,
    * n_candidates, n_truth, covered, pair_completeness,
    * reduction_ratio. */
  def blockingQuality(registry: DataFrame, id: String,
                      candidates: DataFrame, truth: DataFrame): DataFrame = {
    def canon(df: DataFrame) = df.select(
        least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b") &&
        col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val cand = canon(candidates)
    val tru = canon(truth)
    val base = registry.agg(count(col(id)).as("n_rows"))
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    val nt = tru.agg(count(lit(1)).as("n_truth"))
    val cov = tru.join(cand, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("covered"))
    base.crossJoin(broadcast(nc)).crossJoin(broadcast(nt))
      .crossJoin(broadcast(cov))
      .select(col("n_rows"),
        ((col("n_rows") * (col("n_rows") - lit(1L))) / lit(2L))
          .cast("long").as("all_pairs"),
        col("n_candidates"), col("n_truth"), col("covered"))
      .withColumn("pair_completeness",
        when(col("n_truth") > 0L,
          col("covered").cast("double") / col("n_truth").cast("double")))
      .withColumn("reduction_ratio",
        when(col("all_pairs") > 0L, lit(1.0) -
          col("n_candidates").cast("double") / col("all_pairs").cast("double")))
  }

  /** The closure+canonicalization half with CALLER-SUPPLIED pairs —
    * the pluggable-blocking form: feed [[mergePurgePairs]] for the
    * multi-pass merge/purge recall, [[sortedNeighborhoodPairs]]
    * alone, or any candidate frame carrying (a, b) id columns (e.g.
    * MinHash pairs when the match key is long text, or a union with
    * manually-curated links). Same transitive closure and
    * (pref, lowest-id) canonical election as [[resolveEntities]]. */
  def resolveEntitiesFromPairs(df: DataFrame, id: String, s: String,
                               pairs: DataFrame, pref: Column): DataFrame = {
    val clusters = Dedup.dedupClusters(pairs.select(col("a"), col("b")))
      .withColumnRenamed("doc_id", id)
    val repped = Dedup.clusterRepresentatives(df, id, clusters, pref)
      .withColumnRenamed("cluster_id", "entity_id")
      .withColumnRenamed("rep_id", "canonical_id")
    repped
      .join(df.select(col(id).as("canonical_id"), col(s).as("canonical_s")),
        Seq("canonical_id"))
      .select(col(id), col("entity_id"), col("canonical_id"),
        col("canonical_s"), col("n_members"),
        (col(id) === col("canonical_id")).as("is_canonical"))
  }
}
