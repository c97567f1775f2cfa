package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming SPRT monitor: Wald's always-valid sequential test
  * ([[graft.ops.EventAnalytics.sprt]]) maintained across
  * micro-batches. The standing state IS the (key, bucket) level table
  * of (n, successes) counts — counts are additive, so the per-batch
  * fold is EXACT (the CMS property: fold == rebuild bit-for-bit) and
  * the standing verdict simply re-runs the batch verdict windows over
  * the accumulated level table — batch-twin by construction, with no
  * ordering requirement on how rows arrive (a bucket straddling two
  * micro-batches merges by addition, never a boundary case).
  *
  * State is bounded by the monitor contract (keys × horizon buckets —
  * the same grain every trend/anomaly read here watches, capped
  * LOUDLY at 4M entries with a shard-by-key-hash recipe) in one
  * atomic versioned file (writer-unique temp + arbiter rename,
  * [[MonitorStateIO]]) under the [[graft.plans.SketchIO]] envelope
  * (family "sprtlvl", version 2, carrying the stream id); replayed
  * batch ids are skipped loudly, so foreachBatch crash-redelivery
  * cannot double-count and a fresh-checkpoint restart is visible. */
object SprtStream {

  /** Full state: (levels, last batch id, stream id, file version).
    * Format v2 added the stream id; v1 files read as id "" and
    * upgrade on their next fold. */
  private def readState(conf: org.apache.hadoop.conf.Configuration,
                        dir: String):
      (Map[(String, Long), (Long, Long)], Long, String, Long) =
    MonitorStateIO.readLatest(conf, dir, "_sprt_level") match {
      case None => (Map.empty, -1L, "", -1L)
      case Some((bytes, fileV)) =>
        val in = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = graft.plans.SketchIO.readHeaderVersions(
          in, "sprtlvl", Set(1, 2), "sprtStream")
        val sid = if (fmt >= 2) graft.plans.SketchIO.readStr(in) else ""
        val lastBatch = in.readLong()
        val m = in.readInt()
        val levels = (0 until m).map { _ =>
          ((graft.plans.SketchIO.readStr(in), in.readLong()),
            (in.readLong(), in.readLong()))
        }.toMap
        (levels, lastBatch, sid, fileV)
    }

  /** (levels keyed (key, bucket) -> (n, s), last batch id). */
  def readStanding(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Map[(String, Long), (Long, Long)], Long) = {
    val (levels, lastBatch, _, _) = readState(conf, dir)
    (levels, lastBatch)
  }

  private def writeStanding(conf: org.apache.hadoop.conf.Configuration,
                            dir: String,
                            levels: Map[(String, Long), (Long, Long)],
                            lastBatch: Long, streamId: String,
                            newVersion: Long): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "sprtlvl", 2)
    graft.plans.SketchIO.writeStr(out, streamId)
    out.writeLong(lastBatch)
    out.writeInt(levels.size)
    levels.toSeq.sortBy(_._1).foreach { case ((k, h), (n, s)) =>
      graft.plans.SketchIO.writeStr(out, k)
      out.writeLong(h); out.writeLong(n); out.writeLong(s)
    }
    out.flush()
    // writer-unique tmp + rename-to-existing arbiter: a concurrent
    // fold into the same state dir fails LOUDLY instead of losing
    // counts to a read-modify-write race (the writeManifest pattern)
    MonitorStateIO.publish(conf, dir, "_sprt_level", bos.toByteArray,
      newVersion)
  }

  /** Loud cap on the driver-side level table — the monitor contract
    * is dimension-sized keys × horizon buckets; a fact-cardinality
    * key column would otherwise balloon driver state silently (the
    * MarkovStream treatment, MarkovStream.mergeBatch's 4M require).
    * Overridable per fold for tests and tighter deployments. */
  val DefaultMaxLevels = 4000000

  /** One batch's (key, bucket) counts folded in by exact addition.
    * Replayed batch ids (≤ the recorded last merge) are SKIPPED —
    * loudly, because the same signature appears when a stream
    * restarts with a fresh checkpoint (ids restart at 0) against
    * standing state, where the skip drops real data; pass `streamId`
    * to make that case a hard error (persisted in the envelope, a
    * fold under a different id refuses). */
  def mergeBatch(batch: DataFrame, key: Column, bucket: Column,
                 success: Column, dir: String, batchId: Long,
                 streamId: String = "",
                 maxLevels: Int = DefaultMaxLevels): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (standing, lastBatch, stateId, fileV) = readState(conf, dir)
    require(streamId.isEmpty || stateId.isEmpty || stateId == streamId,
      s"sprtStream: standing state belongs to stream '$stateId', this fold " +
        s"is '$streamId' — a restarted stream with a fresh checkpoint " +
        "replays batch ids from 0 and would silently drop them against " +
        "the standing cursor; clear the state dir to start over, or fold " +
        "under the standing stream id")
    if (batchId <= lastBatch) {
      System.err.println(
        s"[sprtStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; if this stream was " +
          "restarted with a FRESH CHECKPOINT this skip is dropping real " +
          "data: clear the state dir or pass a new streamId")
      return
    }
    val lvl = batch.filter(success.isNotNull)
      .groupBy(key.cast("string").as("key"), bucket.cast("long").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(when(success.cast("boolean"), 1L).otherwise(0L)).as("s"))
      .limit(maxLevels + 1)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3))))
    require(lvl.length <= maxLevels,
      s"sprtStream: batch level table exceeds $maxLevels (key, bucket) " +
        "entries — the key column looks fact-cardinality; shard the " +
        "monitor by key hash (one monitor per pmod(hash(key), S) shard, " +
        "each with its own state dir; union the standing level tables " +
        "for the global verdict)")
    val merged = lvl.foldLeft(standing) { case (acc, (kh, (n, s))) =>
      val (n0, s0) = acc.getOrElse(kh, (0L, 0L))
      acc.updated(kh, (n0 + n, s0 + s))
    }
    require(merged.size <= maxLevels,
      s"sprtStream: standing level table exceeds $maxLevels (key, bucket) " +
        "entries after this fold — shard the monitor by key hash (one " +
        "monitor per pmod(hash(key), S) shard, each with its own state " +
        "dir; union the standing level tables for the global verdict)")
    writeStanding(conf, dir, merged, batchId,
      if (stateId.nonEmpty) stateId else streamId, fileV + 1)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def sprtSink(stream: DataFrame, key: Column, bucket: Column,
               success: Column, dir: String, streamId: String = ""):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBatch(batch, key, bucket, success, dir, batchId, streamId)
    }

  /** The standing level table as a frame — the exact input shape of
    * [[graft.ops.EventAnalytics.sprtFromLevel]]. */
  def standingLevel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (levels, _) = readStanding(spark.sessionState.newHadoopConf(), dir)
    levels.toSeq.sortBy(_._1)
      .map { case ((k, h), (n, s)) => (k, h, n, s) }
      .toDF("key", "h", "__n", "__s")
  }

  /** The always-valid verdict over everything folded so far —
    * bit-identical to the batch [[graft.ops.EventAnalytics.sprt]]
    * over the union of the batches, because the level fold is exact
    * and the verdict is the same code. */
  def standingVerdict(spark: SparkSession, dir: String, p0: Double,
                      p1: Double, upper: Double = 2.944439,
                      lower: Double = -2.944439): DataFrame =
    graft.ops.EventAnalytics.sprtFromLevel(
      standingLevel(spark, dir), p0, p1, upper, lower)
}
