package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** Streaming near-duplicate detection over an unbounded document
  * stream (the incremental-ingestion twin of `Dedup.minhashLsh`).
  *
  * Semantics (first-wins LSH): a document is flagged dup iff ANY of
  * its MinHash band buckets is already occupied by an EARLIER document
  * (by event time, doc_id tie-break) — occupancy counts every arrival,
  * flagged or not, so the verdict for a given corpus prefix is
  * order-deterministic and batch-replayable. Signatures use the
  * engine-portable md5 banding ([[Dedup.portableMinhashBands]]), so a
  * SQL oracle can replay the verdict end to end.
  *
  * Streaming topology — two stateful stages, both keyed small:
  *   1. explode bands map-side → `flatMapGroupsWithState` keyed by
  *      (bucket, band). State per key is ONE (ts, doc_id) pair: the
  *      earliest occupant. Each arrival emits its per-band verdict
  *      against the pre-arrival occupant, then lowers the minimum.
  *      With `horizonMinutes > 0` an occupancy EXPIRES once the gap
  *      to the next hit exceeds the horizon — a dup of a doc older
  *      than the horizon is re-admitted, the same bounded-validity
  *      trade `dropDuplicatesWithinWatermark` makes. Expiry is lazy
  *      (evaluated on the next hit of the same bucket, keeping the
  *      operator inside Spark's chained-stateful-operator rules —
  *      an event-time TIMEOUT here would trip the global-watermark
  *      correctness check); reclaiming never-revisited cold keys is
  *      the state store's job (size the RocksDB state store for the
  *      active-horizon bucket set, not the corpus).
  *   2. per-doc verdict = windowed sum of band verdicts (append-mode
  *      event-time aggregate; flushes when the watermark passes the
  *      window).
  *
  * At 100 TB/day the shuffle carries (bucket, band) keys — the same
  * one-shuffle shape as the batch LSH — and per-key state is a
  * constant 16 bytes; there is no signature matrix and no pair join
  * anywhere. Out-of-order arrivals within the watermark are handled
  * by the (ts, doc_id) comparison; an arrival DELAYED past an
  * already-processed later doc keeps both copies (streaming-greedy
  * best effort — exactness holds when arrival order respects event
  * time, the append-log case).
  */
object NearDupStream {

  case class NDDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  // public: the state/row encoders construct these in generated code
  case class BandRow(doc_id: Long, ts: java.sql.Timestamp, band: Int, bucket: String)
  case class BandVerdict(doc_id: Long, ts: java.sql.Timestamp, band: Int, dup: Long)
  case class BucketState(minTs: Long, minDoc: Long, lastHit: Long)

  private def bandRows(docs: DataFrame, w: Int, numBands: Int,
                       rowsPerBand: Int): DataFrame =
    docs.select(col("doc_id"), col("ts"),
        explode(Dedup.portableMinhashBandsFast(col("text"), w, numBands, rowsPerBand)).as("bb"))
      .select(col("doc_id"), col("ts"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** Streaming path. `docs` must be watermark-able on `ts`; output is
    * (doc_id, n_dup_bands, is_dup), emitted once the watermark passes
    * the doc's `windowLen` event-time window. */
  def nearDupStream(docs: Dataset[NDDoc], w: Int = 3, numBands: Int = 4,
                    rowsPerBand: Int = 2, watermark: String = "1 hour",
                    windowLen: String = "1 hour",
                    horizonMinutes: Int = 0): DataFrame = {
    import docs.sparkSession.implicits._
    val src =
      if (docs.isStreaming) docs.toDF().withWatermark("ts", watermark) else docs.toDF()
    val horizonMicros = horizonMinutes * 60L * 1000000L
    val verdicts = bandRows(src, w, numBands, rowsPerBand).as[BandRow]
      .groupByKey(r => (r.bucket, r.band))
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          val rows = it.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
          var cur = state.getOption
          val out = rows.map { r =>
            val tsMicros = r.ts.getTime * 1000L
            // lazy horizon expiry: a cold occupancy is forgotten on
            // the next hit, exactly as an eager eviction would have
            if (horizonMinutes > 0 &&
                cur.exists(c => tsMicros - c.lastHit > horizonMicros))
              cur = None
            val dup = cur.exists(c =>
              c.minTs < tsMicros || (c.minTs == tsMicros && c.minDoc < r.doc_id))
            cur =
              if (dup) cur.map(_.copy(lastHit = tsMicros))
              else Some(BucketState(tsMicros, r.doc_id, tsMicros))
            BandVerdict(r.doc_id, r.ts, r.band, if (dup) 1L else 0L)
          }
          cur.foreach(state.update)
          out.iterator
      }
    val stage2 =
      if (docs.isStreaming) verdicts.toDF().withWatermark("ts", watermark)
      else verdicts.toDF()
    stage2
      .groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(sum(col("dup")).as("n_dup_bands"))
      .select(col("doc_id"), col("n_dup_bands"),
        (col("n_dup_bands") > 0).as("is_dup"))
  }

  /** Batch twin — identical verdicts for any corpus processed in
    * event order: bucket occupancy is the window-min (ts, doc_id)
    * pair, partitioned by (band, bucket) — one shuffle, no pair join.
    * This is what the SQL oracle replays. */
  def nearDupBatch(docs: DataFrame, w: Int = 3, numBands: Int = 4,
                   rowsPerBand: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = bandRows(docs, w, numBands, rowsPerBand)
    val firstPair = min(struct(col("ts"), col("doc_id")))
      .over(Window.partitionBy(col("band"), col("bucket")))
    b.withColumn("__dup",
        (struct(col("ts"), col("doc_id")) > firstPair).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__dup")).as("n_dup_bands"))
      .select(col("doc_id"), col("n_dup_bands"),
        (col("n_dup_bands") > 0).as("is_dup"))
  }
}
