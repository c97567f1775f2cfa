package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming count-min sketch: a STANDING (r, bucket, cnt) counter
  * table maintained across micro-batches — "how often has any key
  * occurred over the whole stream so far" with depth×width counters
  * of durable state, no per-key stream state, and no reprocessing of
  * history. Each micro-batch is collapsed by the batch sketch
  * ([[graft.ops.Profiling.cmsSketch]] — one partial agg, map-side
  * combine), then folded into the standing table by EXACT counter
  * addition — CMS merge is plain sums, so the standing sketch after
  * any batch sequence is bit-identical to a batch rebuild over the
  * union of the batches (the strongest batch-twin contract a monitor
  * can carry; contrast the MG/KMV monitors, whose merges lose
  * information by design). The fold runs DRIVER-SIDE on ≤ depth·width
  * counters, bounded by the sketch GEOMETRY (not the data) — the same
  * contract that lets centroids and codebooks round-trip the driver.
  *
  * Because [[graft.ops.Profiling.cmsJoinSize]] consumes exactly this
  * counter-table shape, the standing sketch doubles as a STREAMING
  * JOIN-SIZE monitor: probe the stream's standing sketch against a
  * static dimension's sketch each batch and watch the estimated join
  * cardinality (the pre-join planning signal) move in real time.
  *
  * State on disk is one atomic versioned file (writer-unique temp +
  * arbiter rename, [[MonitorStateIO]]) under the
  * [[graft.plans.SketchIO]] envelope (family "cms", version 2),
  * carrying the geometry — a fold with mismatched (width, depth) is
  * refused loudly, since counter tables of different geometry are
  * meaningless to add — and the stream id, so a restarted stream
  * with a fresh checkpoint refuses instead of silently dropping its
  * replayed batches. The last merged batch id makes replay
  * IDEMPOTENT: foreachBatch re-delivers a batch after a crash between
  * the state write and the checkpoint commit, and a batch id ≤ the
  * recorded one is skipped (loudly) instead of double-counted. */
object CmsStream {

  /** Full state: (counters, running n, last batch id, stream id the
    * state was created under, state-file version). Format v2 added
    * the stream id; v1 files read as id "" and upgrade on next fold. */
  private def readState(conf: org.apache.hadoop.conf.Configuration,
                        dir: String, width: Int, depth: Int):
      (Map[(Int, Long), Long], Long, Long, String, Long) =
    MonitorStateIO.readLatest(conf, dir, "_cms_sketch") match {
      case None => (Map.empty, 0L, -1L, "", -1L)
      case Some((bytes, fileV)) =>
        val in = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = graft.plans.SketchIO.readHeaderVersions(
          in, "cms", Set(1, 2), "cmsStream")
        val sid = if (fmt >= 2) graft.plans.SketchIO.readStr(in) else ""
        val (w, d) = (in.readInt(), in.readInt())
        require(w == width && d == depth,
          s"cmsStream: standing sketch geometry ${w}x$d does not match the " +
            s"requested ${width}x$depth — counter tables of different " +
            "geometry cannot be added; rebuild the state or match the " +
            "geometry")
        val n = in.readLong()
        val lastBatch = in.readLong()
        val m = in.readInt()
        val counters = (0 until m).map { _ =>
          ((in.readInt(), in.readLong()), in.readLong())
        }.toMap
        (counters, n, lastBatch, sid, fileV)
    }

  /** (counters keyed (r, bucket), running n, last batch id); empty/-1
    * and the caller's geometry if absent. */
  def readStanding(conf: org.apache.hadoop.conf.Configuration, dir: String,
                   width: Int, depth: Int):
      (Map[(Int, Long), Long], Long, Long) = {
    val (counters, n, lastBatch, _, _) = readState(conf, dir, width, depth)
    (counters, n, lastBatch)
  }

  private def writeStanding(conf: org.apache.hadoop.conf.Configuration,
                            dir: String, counters: Map[(Int, Long), Long],
                            n: Long, lastBatch: Long,
                            width: Int, depth: Int,
                            streamId: String, newVersion: Long): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "cms", 2)
    graft.plans.SketchIO.writeStr(out, streamId)
    out.writeInt(width); out.writeInt(depth)
    out.writeLong(n)
    out.writeLong(lastBatch)
    out.writeInt(counters.size)
    // sorted write: the state file is byte-for-byte deterministic
    counters.toSeq.sortBy(_._1).foreach { case ((r, b), c) =>
      out.writeInt(r); out.writeLong(b); out.writeLong(c)
    }
    out.flush()
    // writer-unique tmp + rename-to-existing arbiter: a concurrent
    // fold into the same state dir fails LOUDLY instead of losing
    // counts to a read-modify-write race (the writeManifest pattern)
    MonitorStateIO.publish(conf, dir, "_cms_sketch", bos.toByteArray,
      newVersion)
  }

  /** One batch's sketch folded in by exact counter addition. A batch
    * id at or below the recorded last merge is a replay and is
    * SKIPPED (idempotence) — loudly, because the same signature also
    * appears when a stream RESTARTS WITH A FRESH CHECKPOINT (batch
    * ids restart at 0) against persistent standing state, where the
    * skip drops real data. Pass `streamId` to make that case a hard
    * error: the id is persisted in the state envelope and a fold
    * under a different id refuses. */
  def mergeBatch(batch: DataFrame, key: Column, width: Int, depth: Int,
                 dir: String, batchId: Long, streamId: String = ""): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (standing, n, lastBatch, stateId, fileV) =
      readState(conf, dir, width, depth)
    require(streamId.isEmpty || stateId.isEmpty || stateId == streamId,
      s"cmsStream: standing state belongs to stream '$stateId', this fold " +
        s"is '$streamId' — a restarted stream with a fresh checkpoint " +
        "replays batch ids from 0 and would silently drop them against " +
        "the standing cursor; clear the state dir to start over, or fold " +
        "under the standing stream id")
    if (batchId <= lastBatch) {
      System.err.println(
        s"[cmsStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; if this stream was " +
          "restarted with a FRESH CHECKPOINT this skip is dropping real " +
          "data: clear the state dir or pass a new streamId")
      return
    }
    val agg = graft.ops.Profiling.cmsSketch(batch, key, width, depth)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
    // n from the counter mass itself: every row lands in exactly
    // `depth` counters (cmsSketch hashes null keys too — concat_ws
    // drops the null, so they collide into the r-string bucket), so
    // sum/depth is the row count that AGREES with the counters by
    // construction — a count(key) would skip nulls the sketch counted
    val bn = agg.map(_._2).sum / depth
    val merged = agg.foldLeft(standing) { case (acc, (rb, c)) =>
      acc.updated(rb, acc.getOrElse(rb, 0L) + c)
    }
    writeStanding(conf, dir, merged, n + bn, batchId, width, depth,
      if (stateId.nonEmpty) stateId else streamId, fileV + 1)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def cmsSink(stream: DataFrame, key: Column, width: Int, depth: Int,
              dir: String, streamId: String = ""):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBatch(batch, key, width, depth, dir, batchId, streamId)
    }

  /** The standing counter table as a frame — the same (r, bucket,
    * cnt) shape [[graft.ops.Profiling.cmsProbe]] and
    * [[graft.ops.Profiling.cmsJoinSize]] consume. */
  def standingSketch(spark: SparkSession, dir: String,
                     width: Int, depth: Int): DataFrame = {
    import spark.implicits._
    val (counters, _, _) =
      readStanding(spark.sessionState.newHadoopConf(), dir, width, depth)
    counters.toSeq.sortBy(_._1)
      .map { case ((r, b), c) => (r, b, c) }.toDF("r", "bucket", "cnt")
  }

  /** Probe the standing sketch for candidate keys — bit-identical to
    * [[graft.ops.Profiling.cmsEstimates]] over the union of the
    * folded batches, because counter addition is exact. Output:
    * (key, est_count). */
  def standingEstimates(spark: SparkSession, dir: String,
                        candidates: DataFrame, key: Column,
                        width: Int, depth: Int): DataFrame =
    graft.ops.Profiling.cmsProbe(standingSketch(spark, dir, width, depth),
      candidates, key, width, depth)
}
