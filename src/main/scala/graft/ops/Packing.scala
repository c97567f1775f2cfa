package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ScanFns

/** GPT-style sequence packing (SURVEY §2.6): lay documents end-to-end
  * along a declared total order and cut the token stream into
  * fixed-length training sequences — documents cross pack boundaries,
  * exactly like causal-LM pretraining packs its corpus. The assignment
  * is pure arithmetic over the running token offset:
  *
  *   tok_start  = cumsum(tokens) - tokens        (0-based stream offset)
  *   pack_first = floor(tok_start / seqLen)
  *   pack_last  = floor((tok_start + tokens - 1) / seqLen)
  *
  * The running offset comes from the distributed two-phase prefix scan
  * (ScanFns.withCumsum — one range-partitioned sort, two streamed
  * passes, #partitions carry rows), so the whole corpus never meets a
  * single task and the operator's cost is one sort at 100 TB. Exact:
  * token counts are integers, summed in decimal.
  *
  * Reference surface: the datar reference has no packing op; this is a
  * graft pipeline extension alongside dedup/chunking.
  */
object Packing {

  /** Per-document pack assignment. Output columns: the input's, plus
    * `tok_start` (0-based offset of the doc's first token in the
    * packed stream), `pack_first`/`pack_last` (ids of the packs the
    * doc lands in), `n_packs` (how many packs it spans). Empty docs
    * (0 tokens) land in the pack at their offset, spanning 1. */
  def sequencePacking(df: DataFrame, tokenCol: Column, order: Seq[Column],
                      seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"sequence packing: seqLen must be >= 1 (got $seqLen)")
    val cum = ScanFns.withCumsum(df, tokenCol, order, "__cum_tok")
    cum
      .withColumn("__tok", coalesce(tokenCol.cast("double"), lit(0.0)))
      .withColumn("tok_start", (col("__cum_tok") - col("__tok")).cast("long"))
      .withColumn("pack_first", floor(col("tok_start") / seqLen).cast("long"))
      .withColumn("pack_last",
        floor((col("tok_start") + greatest(col("__tok"), lit(1.0)) - 1) / seqLen)
          .cast("long"))
      .withColumn("n_packs", col("pack_last") - col("pack_first") + 1L)
      .drop("__cum_tok", "__tok")
  }

  /** Length-grouped batch assignment (the dynamic-batching layout that
    * minimizes padding waste): docs bucket by token count against the
    * fixed `bucketEdges` (bucket = Σ 1{tokens > edge} — a codegen
    * chain), shuffle deterministically WITHIN their bucket by a seeded
    * md5 key, and cut into fixed-size batches in that order. Batches
    * never mix buckets, so every batch pads to its bucket's ceiling,
    * not the corpus max.
    *
    * Scale shape: ONE global rowid sort on (bucket, md5 key) — never a
    * per-bucket window (a handful of buckets over 100 TB would be a
    * handful of giant partitions); within-bucket positions are rowid
    * minus the bucket's start offset, where offsets come from a
    * ≤ |edges|+1-row count table (bounded level-table window, the
    * Forcats contract) broadcast back.
    * Output: input + bucket (int), batch_id ("bucket_seq"), batch_pos
    * (0-based position inside the batch). The tail batch of each
    * bucket may be short (standard drop-last-or-pad choice is the
    * caller's). */
  def lengthGroupedBatches(df: DataFrame, tokens: Column, key: Column,
                           batchSize: Int, bucketEdges: Seq[Long],
                           seed: Long): DataFrame = {
    require(batchSize >= 1, s"lengthGroupedBatches: batchSize must be >= 1")
    require(bucketEdges.nonEmpty && bucketEdges == bucketEdges.sorted &&
      bucketEdges.distinct.size == bucketEdges.size,
      s"lengthGroupedBatches: edges must be sorted distinct (got $bucketEdges)")
    val bucket = bucketEdges.map(e =>
      when(tokens > e, 1).otherwise(0)).reduce(_ + _)
    cutBatchesByBucket(df, bucket, key, batchSize, seed)
  }

  /** The shared bucket → seeded shuffle → fixed-size cut tail of
    * [[lengthGroupedBatches]] / [[aspectRatioBatches]]: ONE global
    * rowid sort on (bucket, md5 key); within-bucket positions are
    * rowid minus the bucket's start offset from a bounded bucket-count
    * table (the Forcats level-table window contract) broadcast back. */
  private def cutBatchesByBucket(df: DataFrame, bucket: Column, key: Column,
                                 batchSize: Int, seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("__lb", bucket)
      .withColumn("__ok",
        md5(concat_ws(" ", lit(seed.toString), key.cast("string"))))
    val ranked = graft.core.Tibble.rowidToColumn(keyed,
      Seq(col("__lb"), col("__ok"), key), "__rid")
    val counts = ranked.groupBy(col("__lb")).agg(count(lit(1)).as("__c"))
    // offsets over the bucket-count table: bounded rows by construction
    val w = Window.orderBy(col("__lb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(w), lit(0L)))
      .drop("__c")
    ranked.join(broadcast(offsets), Seq("__lb"))
      .withColumn("__wr", col("__rid") - col("__off") - 1)
      .withColumn("batch_id", concat_ws("_", col("__lb"),
        expr(s"__wr div $batchSize")))
      .withColumn("batch_pos", (col("__wr") % batchSize).cast("int"))
      .withColumn("bucket", col("__lb"))
      .drop("__lb", "__ok", "__rid", "__wr")
  }

  /** Aspect-ratio bucketed batching — the image-training twin of
    * [[lengthGroupedBatches]] (SDXL-style AR bucketing): images
    * bucket by width/height against ratio edges declared as EXACT
    * fractions p/q (bucket = Σ 1{w·q > p·h} — cross-multiplied
    * integer compares, no float ratio ever computed, so the bucket
    * decision is engine-replayable bit-for-bit), then the same
    * one-sort deterministic shuffle-and-cut. Batches never mix
    * buckets, so every batch resizes/crops to its bucket's target
    * shape instead of the corpus extreme.
    * Output: input + bucket, batch_id ("bucket_seq"), batch_pos. */
  def aspectRatioBatches(df: DataFrame, width: Column, height: Column,
                         key: Column, batchSize: Int,
                         ratioEdges: Seq[(Long, Long)],
                         seed: Long): DataFrame = {
    require(batchSize >= 1, s"aspectRatioBatches: batchSize must be >= 1")
    require(ratioEdges.nonEmpty && ratioEdges.forall(e => e._1 > 0 && e._2 > 0),
      s"aspectRatioBatches: edges must be positive fractions (got $ratioEdges)")
    require(ratioEdges.zip(ratioEdges.tail).forall {
        case ((p1, q1), (p2, q2)) => p1 * q2 < p2 * q1 },
      s"aspectRatioBatches: edges must strictly increase as fractions " +
        s"(got $ratioEdges)")
    val bucket = ratioEdges.map { case (p, q) =>
      when(width * lit(q) > height * lit(p), 1).otherwise(0) }.reduce(_ + _)
    cutBatchesByBucket(df, bucket, key, batchSize, seed)
  }

  /** Deterministic training-shard assignment + audit manifest — the
    * last mile of the pipeline: the final mix is laid along a declared
    * total order, cut into fixed-row shards (shard_id = (rowid−1) /
    * shardRows), and each shard gets a manifest row with its row
    * count, token total, id span, and an ORDER-SENSITIVE md5 content
    * digest — the byte a resumed/re-run pipeline compares to prove it
    * rebuilt the identical shard. Writing the rows themselves is
    * `Sources.writePartitioned(assignment, path, Seq("shard_id"))`.
    *
    * Shape: the rowid comes from the distributed sort; manifests are
    * shard-grain (bounded groups — shardRows each): the digest md5s
    * the "id:token" stream in shard order via a per-shard sort_array
    * over (pos, id, tokens) structs — shard-sized arrays by
    * construction. Output: (shard_id, n_rows, n_tokens, first_id,
    * last_id, digest). */
  def shardManifest(df: DataFrame, id: Column, tokens: Column,
                    order: Seq[Column], shardRows: Long): DataFrame = {
    require(shardRows >= 1, s"shardManifest: shardRows must be >= 1")
    val ranked = graft.core.Tibble.rowidToColumn(df, order, "__rid")
      .select(col("__rid"), id.as("__id"), tokens.cast("long").as("__tok"))
    ranked
      .withColumn("shard_id", ((col("__rid") - 1L) / shardRows).cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__tok")).as("n_tokens"),
        min(col("__id")).as("first_id"),
        max(col("__id")).as("last_id"),
        md5(concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("__rid").as("p"),
              col("__id").as("i"), col("__tok").as("t")))),
            e => concat_ws(":", e.getField("i"), e.getField("t")))))
          .as("digest"))
  }
}
