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
  * the same grain every trend/anomaly read here watches) in one
  * atomic file under the [[graft.plans.SketchIO]] envelope (family
  * "sprtlvl", version 1); replayed batch ids are skipped, so
  * foreachBatch crash-redelivery cannot double-count. */
object SprtStream {

  private def fsp(conf: org.apache.hadoop.conf.Configuration, dir: String,
                  name: String) = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    (p.getFileSystem(conf), p)
  }

  /** (levels keyed (key, bucket) -> (n, s), last batch id). */
  def readStanding(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Map[(String, Long), (Long, Long)], Long) = {
    val (fs, p) = fsp(conf, dir, "_sprt_level.bin")
    if (!fs.exists(p)) return (Map.empty, -1L)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val fin = fs.open(p)
    try fin.readFully(0, bytes) finally fin.close()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "sprtlvl", 1, "sprtStream")
    val lastBatch = in.readLong()
    val m = in.readInt()
    val levels = (0 until m).map { _ =>
      ((graft.plans.SketchIO.readStr(in), in.readLong()),
        (in.readLong(), in.readLong()))
    }.toMap
    (levels, lastBatch)
  }

  private def writeStanding(conf: org.apache.hadoop.conf.Configuration,
                            dir: String,
                            levels: Map[(String, Long), (Long, Long)],
                            lastBatch: Long): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "sprtlvl", 1)
    out.writeLong(lastBatch)
    out.writeInt(levels.size)
    levels.toSeq.sortBy(_._1).foreach { case ((k, h), (n, s)) =>
      graft.plans.SketchIO.writeStr(out, k)
      out.writeLong(h); out.writeLong(n); out.writeLong(s)
    }
    out.flush()
    val (fs, tmp) = fsp(conf, dir, "_sprt_level.tmp")
    val (_, dst) = fsp(conf, dir, "_sprt_level.bin")
    val o = fs.create(tmp, true)
    try o.write(bos.toByteArray) finally o.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"sprtStream: rename $tmp -> $dst failed")
  }

  /** One batch's (key, bucket) counts folded in by exact addition.
    * Replayed batch ids (≤ the recorded last merge) are SKIPPED. */
  def mergeBatch(batch: DataFrame, key: Column, bucket: Column,
                 success: Column, dir: String, batchId: Long): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (standing, lastBatch) = readStanding(conf, dir)
    if (batchId <= lastBatch) return
    val lvl = batch.filter(success.isNotNull)
      .groupBy(key.cast("string").as("key"), bucket.cast("long").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(when(success.cast("boolean"), 1L).otherwise(0L)).as("s"))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3))))
    val merged = lvl.foldLeft(standing) { case (acc, (kh, (n, s))) =>
      val (n0, s0) = acc.getOrElse(kh, (0L, 0L))
      acc.updated(kh, (n0 + n, s0 + s))
    }
    writeStanding(conf, dir, merged, batchId)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def sprtSink(stream: DataFrame, key: Column, bucket: Column,
               success: Column, dir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBatch(batch, key, bucket, success, dir, batchId)
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
