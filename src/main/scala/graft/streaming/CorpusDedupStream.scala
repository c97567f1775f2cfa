package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.BloomPrune

/** Streaming admission against a STANDING corpus — the ingest-time
  * twin of [[graft.ops.BloomPrune.antiJoin]]: a firehose of candidate
  * documents is admitted only if its content key is not already in
  * the corpus. The corpus bloom is built ONCE at stream start and
  * broadcast (word-OR bitset — the cross-corpus dedup kernel);
  * every micro-batch probes it MAP-SIDE, so bloom-negative rows
  * (the overwhelming majority of genuinely-new content) are admitted
  * shuffle-free, and only the bloom-positive sliver pays the exact
  * anti-join against the corpus key table. Batches land under
  * `batch_id=<id>` with overwrite — the router's exactly-once-effect
  * recipe, so a replayed micro-batch rewrites its own directory
  * instead of double-admitting.
  *
  * Bounded state: the broadcast bitset (sized by `expectedItems`) and
  * nothing else — no per-key stream state, unlike
  * dropDuplicates-based dedup, so the stream survives unbounded key
  * spaces. Within-stream duplicates are NOT deduped here (that is
  * [[EventStreams.dedupStreamWithinWatermark]]'s job; compose them).
  * At 100 TB the corpus key table should be the materialized
  * key sidecar, not a re-scan — pass `corpusKeys` accordingly. */
object CorpusDedupStream {

  def admitNew(stream: DataFrame, corpusKeys: DataFrame, streamKey: Column,
               corpusKey: Column, expectedItems: Long, acceptDir: String,
               fpp: Double = 0.01):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(expectedItems >= 1, "admitNew: expectedItems must be >= 1")
    // one-time build, closed over by every micro-batch
    val (bloom, numHashes) =
      BloomPrune.build(corpusKeys, corpusKey, expectedItems, fpp)
    val keyTable = corpusKeys.select(corpusKey.as("__ck")).distinct()
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val flagged = batch.withColumn("__maybe",
        BloomPrune.mightContain(streamKey, bloom, numHashes))
      val definitelyNew = flagged.filter(!col("__maybe"))
      val confirmed = flagged.filter(col("__maybe"))
        .join(keyTable, streamKey === col("__ck"), "left_anti")
      definitelyNew.unionByName(confirmed).drop("__maybe")
        .write.mode("overwrite").parquet(s"$acceptDir/batch_id=$batchId")
      ()
    }
  }

  /** Batch twin (the oracle shape): exactly the rows admitNew would
    * land, as one frame. */
  def admitNewBatch(batch: DataFrame, corpusKeys: DataFrame,
                    batchKey: Column, corpusKey: Column,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val (bloom, numHashes) =
      BloomPrune.build(corpusKeys, corpusKey, expectedItems, fpp)
    val flagged = batch.withColumn("__maybe",
      BloomPrune.mightContain(batchKey, bloom, numHashes))
    val keyTable = corpusKeys.select(corpusKey.as("__ck")).distinct()
    flagged.filter(!col("__maybe"))
      .unionByName(flagged.filter(col("__maybe"))
        .join(keyTable, batchKey === col("__ck"), "left_anti"))
      .drop("__maybe")
  }
}
