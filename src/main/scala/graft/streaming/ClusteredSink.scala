package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.functions.{CurveMeta, Hilbert, ZOrder}

/** Streaming CLUSTERED sink: continuous ingestion that maintains a
  * curve-clustered layout per micro-batch — the composition of the
  * incremental layout path ([[graft.functions.ZOrder.zorderAppend]] /
  * [[graft.functions.Hilbert.hilbertAppend]]) with Structured
  * Streaming's foreachBatch. The first batch establishes the grid
  * (caller-declared domain bounds — a single micro-batch's observed
  * min/max would mis-size the curve for everything after it) and
  * every later batch clusters on the STORED grid and lands as new
  * sorted files, so the table a reader scans is box-query-prunable at
  * every point in time without any compaction step in the hot path.
  * Write cost per batch = one range shuffle of the batch (the
  * curve-append contract); a periodic
  * [[graft.sources.Sources.compactSmallFiles]] or full curve rewrite
  * absorbs the small-file tail that per-batch appends accumulate.
  *
  * The first-batch check goes through the Hadoop FileSystem API
  * (CurveMeta.exists), NOT java.io.File — the table path may be
  * HDFS/S3/file:-URI, where a local-file check is always false and
  * would silently re-overwrite the table every micro-batch.
  *
  * Exactly-once caveat: foreachBatch replays a batch after a crash
  * between the write and the checkpoint commit; like every file-sink
  * foreachBatch composition here (routeByQuality's per-batch
  * subdirectories sidestep it), dedup-on-read or a table format is
  * the remedy when replays must be invisible. */
object ClusteredSink {

  /** The per-batch half, callable directly for batch-twin testing:
    * first call (no grid metadata at `path`) z-writes with the
    * declared domain `gridBounds`; later calls append on the stored
    * grid. */
  def writeClusteredBatch(batch: DataFrame, path: String,
                          cols: Seq[String], bits: Int, filesPerBatch: Int,
                          gridBounds: Seq[(Long, Long)]): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    if (!CurveMeta.exists(conf, path, "_zorder_meta.json"))
      ZOrder.zorderWrite(batch, path, cols, bits, filesPerBatch,
        gridBounds = Some(gridBounds))
    else ZOrder.zorderAppend(batch, path, filesPerBatch)
  }

  /** Hilbert twin of [[writeClusteredBatch]]: same first-batch grid
    * establishment and delta-sized append contract, on the
    * locality-better curve (adjacent curve positions are always
    * adjacent cells, so per-file bounding boxes are tighter and box
    * queries prune more files — LayoutSpec quantifies the gap). */
  def writeClusteredBatchHilbert(batch: DataFrame, path: String,
                                 cols: Seq[String], bits: Int,
                                 filesPerBatch: Int,
                                 gridBounds: Seq[(Long, Long)]): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    if (!CurveMeta.exists(conf, path, "_hilbert_meta.json"))
      Hilbert.hilbertWrite(batch, path, cols, bits, filesPerBatch,
        gridBounds = Some(gridBounds))
    else Hilbert.hilbertAppend(batch, path, filesPerBatch)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def clusteredSink(stream: DataFrame, path: String, cols: Seq[String],
                    bits: Int, filesPerBatch: Int,
                    gridBounds: Seq[(Long, Long)]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeClusteredBatch(batch, path, cols, bits, filesPerBatch, gridBounds)
    }

  /** Hilbert-clustered stream form. */
  def clusteredSinkHilbert(stream: DataFrame, path: String,
                           cols: Seq[String], bits: Int, filesPerBatch: Int,
                           gridBounds: Seq[(Long, Long)]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeClusteredBatchHilbert(batch, path, cols, bits, filesPerBatch,
        gridBounds)
    }
}
