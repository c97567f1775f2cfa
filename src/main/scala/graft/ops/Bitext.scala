package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Margin-based bitext (parallel-corpus) mining — the LASER/CCMatrix
  * recipe (Artetxe & Schwenk 2019): a source/target sentence pair is a
  * translation candidate when their cosine similarity stands OUT from
  * each side's neighborhood, not merely when it is high — raw cosine
  * thresholds fail because some sentences ("hubs") are close to
  * everything. The margin normalizes each pair's cosine by the mean
  * cosine of both endpoints' k-nearest-neighbor sets:
  *
  *   margin(x, y) = cos(x, y) / ((penalty(x) + penalty(y)) / 2)
  *   penalty(v)   = mean cosine of v to its k nearest candidates
  *
  * Both stages here are pure compositions over retrieval RESULT SETS
  * (query_id, neighbor_id, cos, rank) — result-set-sized work; the
  * embedding corpus itself is only touched by whichever retrieval
  * produced the candidates. Feed forward/reverse retrievals from
  * [[Similarity.bruteForceTopKJoin]] (exact, broadcast query side) at
  * probe scale, or [[Similarity.lshTopKJoin]] / ivfTopKJoin with the
  * broadcast dropped for corpus×corpus mining at 100 TB — the margin
  * math is retrieval-agnostic.
  *
  * Penalties accumulate via the decimal-exact mean (Exact.davg), so
  * they are order-invariant and engine-replayable; the margin itself
  * is one IEEE division per candidate pair.
  */
object Bitext {

  /** Margin scores for every forward candidate pair. `fwd` = source
    * queries retrieving over targets, `rev` = target queries
    * retrieving over sources, both as (query_id, neighbor_id, cos,
    * …). Output: (src_id, tgt_id, cos, margin).
    *
    * The forward penalty is a `query_id`-partitioned WINDOW over the
    * forward result set (k-row partitions), not a re-aggregate joined
    * back — a groupBy+join would plant the retrieval subtree in the
    * plan twice and re-scan the corpus for it (observed in the
    * `.explain`: two BroadcastNestedLoopJoin passes where one
    * suffices). The reverse penalty joins by `neighbor_id`, so it
    * stays a groupBy — its subtree is only evaluated once anyway.
    * Same decimal-exact mean either way (identical decimal totals per
    * query), so oracle replays are unaffected. */
  def marginScores(fwd: DataFrame, rev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.partitionBy(col("query_id"))
    val px = sum(col("cos").cast("decimal(28,6)")).over(wq)
      .cast("string").cast("double") /
      count(col("cos")).over(wq).cast("double")
    val py = rev.groupBy(col("query_id"))
      .agg(Exact.davg(col("cos")).as("__py"))
    fwd.select(col("query_id"), col("neighbor_id"), col("cos"))
      .withColumn("__px", px)
      .join(py.withColumnRenamed("query_id", "neighbor_id"), Seq("neighbor_id"))
      .withColumn("margin", col("cos") / ((col("__px") + col("__py")) / 2))
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("cos"), col("margin"))
  }

  /** Mine the aligned pair per source: the max-margin target (ties to
    * the higher tgt_id — one max_by partial agg, no window), kept when
    * the margin clears `minMargin` (≈1.05–1.2 in practice; 1.0 means
    * "no better than the neighborhood average"). */
  def mineBitext(scores: DataFrame, minMargin: Double): DataFrame =
    scores.groupBy(col("src_id"))
      .agg(max_by(
        struct(col("tgt_id"), col("cos"), col("margin")),
        struct(col("margin"), col("tgt_id"))).as("__b"))
      .select(col("src_id"), col("__b.tgt_id").as("tgt_id"),
        col("__b.cos").as("cos"), col("__b.margin").as("margin"))
      .filter(col("margin") >= minMargin)
}
