package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming truncated-EWMA monitor — the per-micro-batch form of
  * [[graft.ops.EventAnalytics.ewmaChart]] whose emitted trace is
  * IDENTICAL, row for row, to running the batch operator over
  * everything seen so far (the s_cusum contract): per event type the
  * level advances one window at a time over the gap-filled spine
  * (silent windows count 0 and halve the level), a type first seen
  * mid-stream back-fills zero-count windows from the spine start, and
  * the surge alarm n > mult·e_prev + guard stays silent on each
  * type's very first spine window (the batch operator's lag-NULL).
  * DYADIC arithmetic carries the identity: every per-window level is
  * a sum of integer-count × 2^-(j+1) terms — each term and each
  * partial sum exactly representable in binary doubles — so the
  * driver fold, the Spark batch operator, and the DuckDB oracle all
  * produce the same bits in any evaluation order.
  *
  * Scale shape: each batch collapses to its (type, window, count)
  * profile in ONE partial agg; the fold runs driver-side over that
  * profile plus the ≤ #types standing entries, each holding at most
  * `horizon` recent counts (the sketch-size contract shared with the
  * CUSUM/MG/KMV monitors; the 4M profile cap fails loudly before an
  * unbounded collect). State is one atomic enveloped file; batch-id
  * tracking makes replay idempotent. Batches must arrive in
  * event-time order at the window grain; a window at or behind a
  * type's cursor fails loudly rather than corrupt the level.
  * Horizon/mult/guard are PERSISTED — folding a standing monitor with
  * different knobs would splice two different charts into one trace,
  * so the fold rejects the mismatch loudly (the grids-must-match
  * pattern). */
object EwmaStream {

  /** (spineStartMs, lastBatchId, horizon, mult, guard,
    * per-type (lastWindowMs, recent counts most-recent-first));
    * (-1, -1, 0, 0, 0, empty) if absent. */
  def readState(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Long, Long, Int, Long, Long, Map[String, (Long, Vector[Long])]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_ewma_state") match {
      case None => return (-1L, -1L, 0, 0L, 0L, Map.empty)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "ewma", 1, "ewmaStream")
    val spine = in.readLong(); val lastBatch = in.readLong()
    val horizon = in.readInt(); val mult = in.readLong()
    val guard = in.readLong()
    val m = in.readInt()
    val types = (0 until m).map { _ =>
      val t = graft.plans.SketchIO.readStr(in)
      val lastW = in.readLong()
      val hn = in.readInt()
      (t, (lastW, Vector.fill(hn)(in.readLong())))
    }.toMap
    (spine, lastBatch, horizon, mult, guard, types)
  }

  private def writeState(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, spine: Long, lastBatch: Long,
                         horizon: Int, mult: Long, guard: Long,
                         types: Map[String, (Long, Vector[Long])]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "ewma", 1)
    out.writeLong(spine); out.writeLong(lastBatch)
    out.writeInt(horizon); out.writeLong(mult); out.writeLong(guard)
    out.writeInt(types.size)
    types.toSeq.sortBy(_._1).foreach { case (t, (lastW, hist)) =>
      graft.plans.SketchIO.writeStr(out, t)
      out.writeLong(lastW)
      out.writeInt(hist.length)
      hist.foreach(out.writeLong)
    }
    out.flush()
    // writer-unique tmp + versioned arbiter rename (MonitorStateIO):
    // a concurrent fold into one state dir loses LOUDLY instead of
    // erasing this writer's histories in a read-modify-write race
    MonitorStateIO.publishNext(conf, dir, "_ewma_state", bos.toByteArray)
  }

  /** The level from a most-recent-first history: Σ hist(j) / 2^(j+1).
    * All terms dyadic → the sum is exact in any order, bit-identical
    * to the batch operator's lag chain. */
  private def level(hist: Vector[Long]): Double = {
    var e = 0.0
    var j = 0
    while (j < hist.length) {
      e += hist(j).toDouble / (1L << (j + 1)).toDouble
      j += 1
    }
    e
  }

  /** Fold one micro-batch; returns the emitted trace rows
    * (event_type, wstart, n, ewma, alarm) — append them to the
    * monitor's sink. Empty batches emit nothing and advance nothing
    * but the batch cursor. */
  def foldBatch(batch: DataFrame, dir: String, batchId: Long,
                windowLen: String = "1 hour", horizon: Int = 16,
                mult: Long = 4L, guard: Long = 4L): DataFrame = {
    require(horizon >= 1 && horizon <= 48,
      s"ewmaStream: horizon must be in [1, 48] (got $horizon)")
    val spark = batch.sparkSession
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val (spine0, lastBatch, h0, m0, g0, state0) = readState(conf, dir)
    require(h0 == 0 || (h0 == horizon && m0 == mult && g0 == guard),
      s"ewmaStream: standing state at $dir was folded with " +
        s"(horizon=$h0, mult=$m0, guard=$g0), fold called with " +
        s"($horizon, $mult, $guard) — changing the knobs mid-stream " +
        "splices two different charts into one trace; use a fresh " +
        "state dir per configuration")
    if (batchId <= lastBatch) {
      System.err.println(
        s"[ewmaStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; a FRESH-CHECKPOINT " +
          "restart also lands here and would drop real data: clear the " +
          "state dir to start over")
      return Seq.empty[(String, java.sql.Timestamp, Long, Double, Boolean)]
        .toDF("event_type", "wstart", "n", "ewma", "alarm")
    }
    val profile = batch
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("wstart"), col("n"))
    val counts = profile.limit(4000001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    require(counts.length <= 4000000,
      "ewmaStream: batch window profile exceeds 4M (types x windows) " +
        "rows — shard the monitor by type hash")
    if (counts.isEmpty) {
      writeState(conf, dir, spine0, batchId, horizon, mult, guard, state0)
      return Seq.empty[(String, java.sql.Timestamp, Long, Double, Boolean)]
        .toDF("event_type", "wstart", "n", "ewma", "alarm")
    }
    val wMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(windowLen))
      require(iv.months == 0,
        "ewmaStream: calendar-month windows not supported")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    val spine = if (spine0 >= 0) spine0 else counts.map(_._2).min
    val batchMax = counts.map(_._2).max
    val byType = counts.groupBy(_._1)
    val allTypes = state0.keySet ++ byType.keySet
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(String, java.sql.Timestamp, Long, Double, Boolean)]
    val state1 = allTypes.toSeq.sorted.map { t =>
      var (lastW, hist) = state0.getOrElse(t, (spine - wMs, Vector.empty[Long]))
      val windows = byType.getOrElse(t, Array.empty[(String, Long, Long)])
        .map(c => c._2 -> c._3).toMap
      windows.keys.foreach { w =>
        require(w > lastW,
          s"ewmaStream: window ${new java.sql.Timestamp(w)} for '$t' at " +
            s"or behind the cursor ${new java.sql.Timestamp(lastW)} — " +
            "feed finalized windows in event-time order")
      }
      var w = lastW + wMs
      while (w <= batchMax) {
        val n = windows.getOrElse(w, 0L)
        // the batch operator's lag-NULL: no alarm on the type's very
        // first spine window; afterwards e_prev is the level BEFORE
        // this window's count lands
        val alarm = w != spine &&
          n.toDouble > mult.toDouble * level(hist) + guard.toDouble
        hist = (n +: hist).take(horizon)
        emitted += ((t, new java.sql.Timestamp(w), n, level(hist), alarm))
        w += wMs
      }
      t -> (batchMax, hist)
    }.toMap
    writeState(conf, dir, spine, batchId, horizon, mult, guard, state1)
    emitted.toSeq.toDF("event_type", "wstart", "n", "ewma", "alarm")
  }

  /** The stream form: fold each micro-batch and append the emitted
    * trace under `traceDir/batch_id=<id>` (overwrite per batch — the
    * idempotent-replay recipe the other monitor sinks share). Start
    * with `.option("checkpointLocation", …).start()`. */
  def ewmaSink(stream: DataFrame, stateDir: String, traceDir: String,
               windowLen: String = "1 hour", horizon: Int = 16,
               mult: Long = 4L, guard: Long = 4L):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      foldBatch(b, stateDir, id, windowLen, horizon, mult, guard)
        .write.mode("overwrite")
        .parquet(s"$traceDir/batch_id=$id")
    }
}
