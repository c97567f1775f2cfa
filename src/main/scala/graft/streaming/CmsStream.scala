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
  * State on disk is one atomic file (temp + rename) under the
  * [[graft.plans.SketchIO]] envelope (family "cms", version 1),
  * carrying the geometry — a fold with mismatched (width, depth) is
  * refused loudly, since counter tables of different geometry are
  * meaningless to add. The last merged batch id makes replay
  * IDEMPOTENT: foreachBatch re-delivers a batch after a crash between
  * the state write and the checkpoint commit, and a batch id ≤ the
  * recorded one is skipped instead of double-counted. */
object CmsStream {

  private def fsp(conf: org.apache.hadoop.conf.Configuration, dir: String,
                  name: String) = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    (p.getFileSystem(conf), p)
  }

  /** (counters keyed (r, bucket), running n, last batch id, width,
    * depth); empty/-1 and the caller's geometry if absent. */
  def readStanding(conf: org.apache.hadoop.conf.Configuration, dir: String,
                   width: Int, depth: Int):
      (Map[(Int, Long), Long], Long, Long) = {
    val (fs, p) = fsp(conf, dir, "_cms_sketch.bin")
    if (!fs.exists(p)) return (Map.empty, 0L, -1L)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val fin = fs.open(p)
    try fin.readFully(0, bytes) finally fin.close()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "cms", 1, "cmsStream")
    val (w, d) = (in.readInt(), in.readInt())
    require(w == width && d == depth,
      s"cmsStream: standing sketch geometry ${w}x$d does not match the " +
        s"requested ${width}x$depth — counter tables of different geometry " +
        "cannot be added; rebuild the state or match the geometry")
    val n = in.readLong()
    val lastBatch = in.readLong()
    val m = in.readInt()
    val counters = (0 until m).map { _ =>
      ((in.readInt(), in.readLong()), in.readLong())
    }.toMap
    (counters, n, lastBatch)
  }

  private def writeStanding(conf: org.apache.hadoop.conf.Configuration,
                            dir: String, counters: Map[(Int, Long), Long],
                            n: Long, lastBatch: Long,
                            width: Int, depth: Int): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "cms", 1)
    out.writeInt(width); out.writeInt(depth)
    out.writeLong(n)
    out.writeLong(lastBatch)
    out.writeInt(counters.size)
    // sorted write: the state file is byte-for-byte deterministic
    counters.toSeq.sortBy(_._1).foreach { case ((r, b), c) =>
      out.writeInt(r); out.writeLong(b); out.writeLong(c)
    }
    out.flush()
    val (fs, tmp) = fsp(conf, dir, "_cms_sketch.tmp")
    val (_, dst) = fsp(conf, dir, "_cms_sketch.bin")
    val o = fs.create(tmp, true)
    try o.write(bos.toByteArray) finally o.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"cmsStream: rename $tmp -> $dst failed")
  }

  /** One batch's sketch folded in by exact counter addition. A batch
    * id at or below the recorded last merge is a replay and is
    * SKIPPED (idempotence); pass monotonically increasing ids. */
  def mergeBatch(batch: DataFrame, key: Column, width: Int, depth: Int,
                 dir: String, batchId: Long): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (standing, n, lastBatch) = readStanding(conf, dir, width, depth)
    if (batchId <= lastBatch) return
    val agg = graft.ops.Profiling.cmsSketch(batch, key, width, depth)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
    val bn = batch.agg(count(key.cast("string"))).head().getLong(0)
    val merged = agg.foldLeft(standing) { case (acc, (rb, c)) =>
      acc.updated(rb, acc.getOrElse(rb, 0L) + c)
    }
    writeStanding(conf, dir, merged, n + bn, batchId, width, depth)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def cmsSink(stream: DataFrame, key: Column, width: Int, depth: Int,
              dir: String): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBatch(batch, key, width, depth, dir, batchId)
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
