package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming OLS trend monitor — the per-micro-batch form of
  * [[graft.ops.TimeSeries.ols]] (is each monitor series' slope
  * drifting as data streams in, with R² saying how linear the drift
  * is): state is the per-(key, window) COUNT table itself, so the
  * fold is plain integer addition at the (key, window) grain — exact
  * under ANY batch split, windows may straddle batches, batches need
  * NO time order (the SprtStream "fold == rebuild" property). The
  * standing read recomputes the batch OLS identity on BigInt with the
  * string-bridge, so it is bit-identical to the batch operator over
  * everything seen so far.
  *
  * Scale shape: ONE partial agg per batch + a driver fold over the
  * (keys × windows) standing table — monitor-bounded by contract,
  * 4M cap fails loudly with the shard-by-key-hash recipe. State is
  * one atomic enveloped file under the versioned arbiter; batch-id
  * replay is idempotent. Output per key: (key, n, slope, intercept,
  * r2) with t = epoch-hours, matching x_ols. */
object OlsStream {

  /** (lastBatchId, per-(key, windowHour) count); (-1, empty) absent. */
  private def readState(conf: org.apache.hadoop.conf.Configuration,
                        dir: String): (Long, Map[(String, Long), Long]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_ols_state") match {
      case None => return (-1L, Map.empty)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "olsm", 1, "olsStream")
    val lastBatch = in.readLong()
    val m = in.readInt()
    val cells = (0 until m).map { _ =>
      val k = graft.plans.SketchIO.readStr(in)
      val w = in.readLong()
      val c = in.readLong()
      (k, w) -> c
    }.toMap
    (lastBatch, cells)
  }

  private def writeState(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, lastBatch: Long,
                         cells: Map[(String, Long), Long]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "olsm", 1)
    out.writeLong(lastBatch)
    out.writeInt(cells.size)
    cells.toSeq.sortBy(_._1).foreach { case ((k, w), c) =>
      graft.plans.SketchIO.writeStr(out, k)
      out.writeLong(w)
      out.writeLong(c)
    }
    out.flush()
    MonitorStateIO.publishNext(conf, dir, "_ols_state", bos.toByteArray)
  }

  /** The standing per-key OLS table — bit-identical to
    * [[graft.ops.TimeSeries.ols]] over the accumulated series. */
  private def standingRead(spark: org.apache.spark.sql.SparkSession,
                           cells: Map[(String, Long), Long]): DataFrame = {
    import spark.implicits._
    val rows = cells.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (k, m) =>
      val pts = m.toSeq.map { case ((_, t), y) => (BigInt(t), BigInt(y)) }
      val n = BigInt(pts.size)
      val st = pts.map(_._1).sum
      val sy = pts.map(_._2).sum
      val stt = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sty = pts.map(p => p._1 * p._2).sum
      val sxy = n * sty - st * sy
      val sxx = n * stt - st * st
      val syyC = n * syy - sy * sy
      def d(b: BigInt): Double = java.lang.Double.parseDouble(b.toString)
      val ok = pts.size > 1 && sxx != 0
      val slope = if (ok) Some(d(sxy) / d(sxx)) else None
      val nd = pts.size.toDouble
      val intercept = if (ok)
        Some(d(sy) / nd - (d(sxy) / d(sxx)) * (d(st) / nd)) else None
      val r2 = if (ok && syyC != 0)
        Some(d(sxy * sxy) / d(sxx * syyC)) else None
      (k, pts.size.toLong, slope, intercept, r2)
    }
    rows.toDF("key", "n", "slope", "intercept", "r2")
  }

  /** Fold one micro-batch and return the post-fold standing table.
    * Windows may straddle batches; no order requirement. */
  def foldBatch(batch: DataFrame, dir: String, batchId: Long,
                windowLen: String = "1 hour"): DataFrame = {
    val spark = batch.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val (lastBatch, state0) = readState(conf, dir)
    if (batchId <= lastBatch) {
      System.err.println(
        s"[olsStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; a FRESH-CHECKPOINT " +
          "restart also lands here and would drop real data: clear the " +
          "state dir to start over")
      return standingRead(spark, state0)
    }
    val profile = batch
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        (unix_millis(col("w.start")) / 3600000L).cast("long").as("h"),
        col("n"))
    val counts = profile.limit(4000001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    require(counts.length <= 4000000,
      "olsStream: batch window profile exceeds 4M (keys x windows) rows " +
        "— shard the monitor by key hash")
    val state1 = scala.collection.mutable.Map.empty[(String, Long), Long]
    state1 ++= state0
    counts.foreach { case (k, h, c) =>
      val key = (k, h)
      state1(key) = Math.addExact(state1.getOrElse(key, 0L), c)
    }
    writeState(conf, dir, batchId, state1.toMap)
    standingRead(spark, state1.toMap)
  }

  /** The stream form (idempotent-replay overwrite per batch). */
  def olsSink(stream: DataFrame, stateDir: String, traceDir: String,
              windowLen: String = "1 hour"):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      foldBatch(b, stateDir, id, windowLen)
        .write.mode("overwrite")
        .parquet(s"$traceDir/batch_id=$id")
    }
}
