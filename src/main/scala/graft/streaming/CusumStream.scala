package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CUSUM change-point monitor — the per-micro-batch form of
  * [[graft.ops.EventAnalytics.cusumChangePoints]] whose emitted trace
  * is IDENTICAL, row for row, to running the batch operator over
  * everything seen so far: per event type, S advances one window at a
  * time (S ← max(0, S + n − k)), silent windows between batches are
  * emitted individually so the trace stays complete (under "up" they
  * drain S by k each; under direction="down" they GROW it — silence
  * is the stall signal that alarm exists for), and a type first seen
  * mid-stream is back-filled with zero-count windows from the spine
  * start — exactly the gap-filled spine the batch operator generates.
  * That identity is the contract: s_cusum's batch twin folds three
  * time-ordered batches and replays the SAME DuckDB oracle as
  * x_cusum.
  *
  * Scale shape: each batch collapses to its (type, window, count)
  * profile in ONE partial agg; the fold runs driver-side over that
  * profile plus the ≤ #types standing entries (the sketch-size
  * contract — same as the MG summary and k-means centroids). State is
  * one atomic file of (spineStart, per-type (S, lastWindow)) through
  * the Hadoop FS API; batch-id tracking makes replay idempotent.
  * Batches must arrive in event-time order at the window grain (the
  * windowed-agg-with-watermark guarantee when composed behind a
  * finalized-window stream); late windows behind a type's cursor
  * fail loudly rather than corrupt S. */
object CusumStream {

  /** (spineStartMs, lastBatchId, direction, per-type (S, lastWindowMs));
    * (-1, -1, "", empty) if absent. Direction is PERSISTED: restarting
    * a monitor with the direction flipped would silently splice the up
    * and down recursions into one S series — the fold rejects it
    * loudly instead (the grids-must-match pattern). */
  def readState(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Long, Long, String, Map[String, (Long, Long)]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_cusum_state") match {
      case None => return (-1L, -1L, "", Map.empty)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "cusum", 1, "cusumStream")
    val spine = in.readLong(); val lastBatch = in.readLong()
    val dirn = graft.plans.SketchIO.readStr(in)
    val m = in.readInt()
    (spine, lastBatch, dirn,
      (0 until m).map(_ => (graft.plans.SketchIO.readStr(in), (in.readLong(), in.readLong()))).toMap)
  }

  private def writeState(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, spine: Long, lastBatch: Long,
                         direction: String,
                         types: Map[String, (Long, Long)]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "cusum", 1)
    out.writeLong(spine); out.writeLong(lastBatch)
    graft.plans.SketchIO.writeStr(out, direction)
    out.writeInt(types.size)
    types.toSeq.sortBy(_._1).foreach { case (t, (s, w)) =>
      graft.plans.SketchIO.writeStr(out, t); out.writeLong(s); out.writeLong(w)
    }
    out.flush()
    // writer-unique tmp + versioned arbiter rename (MonitorStateIO):
    // a concurrent fold into one state dir loses LOUDLY instead of
    // erasing this writer's S series in a read-modify-write race
    MonitorStateIO.publishNext(conf, dir, "_cusum_state", bos.toByteArray)
  }

  /** Fold one micro-batch; returns the emitted trace rows
    * (event_type, wstart, n, cusum, changed) — append them to the
    * monitor's sink. Empty batches emit nothing and advance nothing. */
  def foldBatch(batch: DataFrame, dir: String, batchId: Long,
                windowLen: String = "1 hour", k: Long = 4L, h: Long = 8L,
                spineOverride: Option[Long] = None,
                direction: String = "up"): DataFrame = {
    require(direction == "up" || direction == "down",
      s"cusumStream: direction must be 'up' or 'down' (got $direction)")
    val spark = batch.sparkSession
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val (spine0, lastBatch, dirn0, state0) = readState(conf, dir)
    require(dirn0.isEmpty || dirn0 == direction,
      s"cusumStream: standing state at $dir was folded with " +
        s"direction='$dirn0', fold called with direction='$direction' — " +
        "flipping direction mid-stream would splice the up and down " +
        "recursions into one S series; use a fresh state dir per direction")
    if (batchId <= lastBatch) {
      System.err.println(
        s"[cusumStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; a FRESH-CHECKPOINT " +
          "restart also lands here and would drop real data: clear the " +
          "state dir to start over")
      return Seq.empty[(String, java.sql.Timestamp, Long, Long, Boolean)]
        .toDF("event_type", "wstart", "n", "cusum", "changed")
    }
    // the batch's window-count profile (ONE partial agg; driver-tiny)
    val profile = batch
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("wstart"), col("n"))
    // the driver fold is bounded by the (types x windows) profile —
    // the alerting-grade contract (anomalousWindows' shape). A
    // million-type firehose wants [[foldBatchSharded]] (hash shards,
    // independent state files), not a bigger driver: fail loudly
    // rather than absorb an unbounded collect.
    val counts = profile.limit(4000001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    require(counts.length <= 4000000,
      "cusumStream: batch window profile exceeds 4M (types x windows) " +
        "rows — shard the monitor by type hash (foldBatchSharded)")
    if (counts.isEmpty) {
      // a sharded monitor locks the GLOBAL spine even into shards
      // whose first batches carry no types — otherwise a shard first
      // populated at batch 5 would back-fill from batch 5's min
      // window instead of the stream's
      writeState(conf, dir,
        if (spine0 >= 0) spine0 else spineOverride.getOrElse(spine0),
        batchId, direction, state0)
      return Seq.empty[(String, java.sql.Timestamp, Long, Long, Boolean)]
        .toDF("event_type", "wstart", "n", "cusum", "changed")
    }
    val wMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(windowLen))
      require(iv.months == 0, s"cusumStream: calendar-month windows not supported")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    val spine =
      if (spine0 >= 0) spine0
      else spineOverride.getOrElse(counts.map(_._2).min)
    val batchMax = counts.map(_._2).max
    val byType = counts.groupBy(_._1)
    val allTypes = state0.keySet ++ byType.keySet
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(String, java.sql.Timestamp, Long, Long, Boolean)]
    val state1 = allTypes.toSeq.sorted.map { t =>
      var (s, lastW) = state0.getOrElse(t, (0L, spine - wMs))
      val windows = byType.getOrElse(t, Array.empty[(String, Long, Long)])
        .map(c => c._2 -> c._3).toMap
      windows.keys.foreach { w =>
        require(w > lastW,
          s"cusumStream: window ${new java.sql.Timestamp(w)} for '$t' at or " +
            s"behind the cursor ${new java.sql.Timestamp(lastW)} — feed " +
            "finalized windows in event-time order (watermarked upstream)")
      }
      // every spine window up to the batch max: counted or silent
      var w = lastW + wMs
      while (w <= batchMax) {
        val n = windows.getOrElse(w, 0L)
        // up: accumulate rises above k; down: stalls below k — the
        // batch operator's y = ±(n − k), same recursion
        s = math.max(0L, if (direction == "up") s + n - k else s + k - n)
        emitted += ((t, new java.sql.Timestamp(w), n, s, s > h))
        w += wMs
      }
      t -> (s, batchMax)
    }.toMap
    writeState(conf, dir, spine, batchId, direction, state1)
    emitted.toSeq.toDF("event_type", "wstart", "n", "cusum", "changed")
  }

  /** Sharded fold — the million-type-firehose recipe the 4M cap's
    * error message names: the type space is split into `nShards`
    * deterministic hash shards, each folded against its OWN state
    * file under `dir/shard=<i>`, so every per-shard driver collect is
    * ~1/nShards of the profile and the standing state never
    * concentrates in one file. CUSUM state is strictly per-type, so
    * the union of the shard traces IS the unsharded trace row for row
    * (CusumShardSpec proves it) — the one cross-type coupling, the
    * shared spine start, is computed once per batch (one tiny agg)
    * and pushed into every shard, including type-empty ones, so
    * late-arriving types back-fill from the stream spine exactly as
    * the unsharded fold would. The batch is persisted across the
    * nShards filtered profile scans and unpersisted after. */
  def foldBatchSharded(batch: DataFrame, dir: String, batchId: Long,
                       nShards: Int, windowLen: String = "1 hour",
                       k: Long = 4L, h: Long = 8L,
                       direction: String = "up"): DataFrame = {
    require(nShards >= 1, s"cusumStream: nShards=$nShards must be >= 1")
    if (nShards == 1)
      return foldBatch(batch, dir, batchId, windowLen, k, h,
        direction = direction)
    // nShards is PERSISTED at the parent dir: changing it re-hashes
    // types into different shard state dirs, so every type would be
    // re-backfilled from the spine and double-traced — reject loudly
    // (re-sharding a standing monitor means rebuilding its state)
    val conf0 = batch.sparkSession.sessionState.newHadoopConf()
    val (fs, marker) = {
      val p = new org.apache.hadoop.fs.Path(dir, "_cusum_shards.txt")
      (p.getFileSystem(conf0), p)
    }
    if (fs.exists(marker)) {
      // enveloped like every other persisted monitor state: a raw
      // unversioned byte would make a future format change read as a
      // garbage shard count with no diagnosable error
      val bytes = new Array[Byte](fs.getFileStatus(marker).getLen.toInt)
      val in0 = fs.open(marker)
      try in0.readFully(0, bytes) finally in0.close()
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      graft.plans.SketchIO.readHeader(in, "cusum-shards", 1, "cusumStream")
      val recorded = in.readInt()
      require(recorded == nShards,
        s"cusumStream: standing sharded monitor at $dir was built with " +
          s"nShards=$recorded, fold called with nShards=$nShards — " +
          "re-sharding re-hashes types into different state dirs and " +
          "double-traces them; rebuild the state to change shard count")
    } else {
      // writer-unique tmp: a fixed name would let a racing first-fold
      // overwrite these staged bytes; the rename below (no prior
      // delete) stays the write-once arbiter
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s"_cusum_shards.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      graft.plans.SketchIO.writeHeader(out, "cusum-shards", 1)
      out.writeInt(nShards)
      out.flush()
      val o = fs.create(tmp, true)
      try o.write(bos.toByteArray) finally o.close()
      require(fs.rename(tmp, marker),
        s"cusumStream: rename $tmp -> $marker failed")
    }
    batch.persist()
    try {
      val mn = batch
        .select(window(col("ts"), windowLen).getField("start").as("__ws"))
        .agg(min(col("__ws"))).collect()(0)
      val spine =
        if (mn.isNullAt(0)) None else Some(mn.getTimestamp(0).getTime)
      (0 until nShards).map { i =>
        foldBatch(
          batch.filter(
            pmod(xxhash64(col("event_type")), lit(nShards)) === lit(i)),
          s"$dir/shard=$i", batchId, windowLen, k, h, spine, direction)
      }.reduce(_.unionByName(_))
    } finally {
      batch.unpersist(); ()
    }
  }

  /** The stream form: fold each micro-batch and append the emitted
    * trace under `traceDir/batch_id=<id>` (overwrite per batch — the
    * idempotent-replay recipe the quality router uses). Start with
    * `.option("checkpointLocation", …).start()`. */
  def cusumSink(stream: DataFrame, stateDir: String, traceDir: String,
                windowLen: String = "1 hour", k: Long = 4L, h: Long = 8L,
                direction: String = "up"):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      foldBatch(batch, stateDir, batchId, windowLen, k, h,
          direction = direction)
        .write.mode("overwrite").parquet(s"$traceDir/batch_id=$batchId")
    }

  /** Sharded stream form — [[foldBatchSharded]] behind foreachBatch. */
  def cusumSinkSharded(stream: DataFrame, stateDir: String, traceDir: String,
                       nShards: Int, windowLen: String = "1 hour",
                       k: Long = 4L, h: Long = 8L,
                       direction: String = "up"):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      foldBatchSharded(batch, stateDir, batchId, nShards, windowLen, k, h,
        direction)
        .write.mode("overwrite").parquet(s"$traceDir/batch_id=$batchId")
    }
}
