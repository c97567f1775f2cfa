package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming ACF monitor — the per-micro-batch form of
  * [[graft.ops.TimeSeries.acf]] whose standing read is IDENTICAL,
  * bit for bit, to running the batch operator over everything seen so
  * far (the s_ewma contract): each batch collapses to its
  * (type, hour, count) profile, the fold appends each type's new
  * hourly counts in event-time order, and the emitted table is the
  * full per-key ACF at lags 1..L — the live "is this monitor series
  * developing seasonality/burst structure" read.
  *
  * Exact incremental sufficient statistics per key: n, S = Σy,
  * Q = Σy², per-lag Σy(t)·y(t+k), the FIRST L values (frozen once
  * full — they close the tail sums T_k = S − Σ_{j<k} first_j) and the
  * LAST L values (ring — they close the head sums H_k = S − Σ_{j<k}
  * last_j and supply the cross terms as new values arrive). All
  * integers, so the fold is exact in any batch split; the closing
  * division runs on BigInt numerator/denominator string-bridged to
  * double — the same bits as the batch operator's decimal path.
  *
  * Scale shape: ONE partial agg per batch + a driver fold over the
  * ≤ #keys standing entries, each O(L) longs (the sketch-size
  * contract of the monitor family; the 4M profile cap fails loudly).
  * State is one atomic enveloped file under the versioned arbiter
  * (concurrent folds lose LOUDLY, never silently). Batches must
  * arrive hour-aligned in event-time order per key; a window at or
  * behind a key's cursor refuses loudly. `maxLag` is PERSISTED — a
  * knob mismatch refuses loudly (the grids-must-match pattern). */
object AcfStream {

  private case class KeyState(lastW: Long, n: Long, s: Long, q: Long,
                              syy: Array[Long], prefix: Vector[Long],
                              last: Vector[Long])

  /** (lastBatchId, maxLag, per-key state); (-1, 0, empty) if absent. */
  private def readState(conf: org.apache.hadoop.conf.Configuration,
                        dir: String): (Long, Int, Map[String, KeyState]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_acf_state") match {
      case None => return (-1L, 0, Map.empty)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "acfm", 1, "acfStream")
    val lastBatch = in.readLong()
    val maxLag = in.readInt()
    val m = in.readInt()
    val keys = (0 until m).map { _ =>
      val k = graft.plans.SketchIO.readStr(in)
      val lastW = in.readLong()
      val n = in.readLong(); val s = in.readLong(); val q = in.readLong()
      val syy = Array.fill(maxLag)(in.readLong())
      val pn = in.readInt()
      val prefix = Vector.fill(pn)(in.readLong())
      val ln = in.readInt()
      val last = Vector.fill(ln)(in.readLong())
      k -> KeyState(lastW, n, s, q, syy, prefix, last)
    }.toMap
    (lastBatch, maxLag, keys)
  }

  private def writeState(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, lastBatch: Long, maxLag: Int,
                         keys: Map[String, KeyState]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "acfm", 1)
    out.writeLong(lastBatch)
    out.writeInt(maxLag)
    out.writeInt(keys.size)
    keys.toSeq.sortBy(_._1).foreach { case (k, st) =>
      graft.plans.SketchIO.writeStr(out, k)
      out.writeLong(st.lastW)
      out.writeLong(st.n); out.writeLong(st.s); out.writeLong(st.q)
      st.syy.foreach(out.writeLong)
      out.writeInt(st.prefix.length); st.prefix.foreach(out.writeLong)
      out.writeInt(st.last.length); st.last.foreach(out.writeLong)
    }
    out.flush()
    MonitorStateIO.publishNext(conf, dir, "_acf_state", bos.toByteArray)
  }

  /** The standing ACF table from the folded state — the exact value
    * [[graft.ops.TimeSeries.acf]] computes on the full series: BigInt
    * numerator/denominator (no overflow at any monitor scale),
    * string-bridged to double exactly like the batch decimal path. */
  private def standingRead(spark: org.apache.spark.sql.SparkSession,
                           maxLag: Int,
                           keys: Map[String, KeyState]): DataFrame = {
    import spark.implicits._
    val rows = keys.toSeq.sortBy(_._1).flatMap { case (k, st) =>
      val n = BigInt(st.n); val s = BigInt(st.s); val q = BigInt(st.q)
      val den = n * (n * q - s * s)
      (1 to maxLag).map { lag =>
        val r: Option[Double] =
          if (st.n <= lag || den == 0) None
          else {
            val head = s - st.last.take(lag).map(BigInt(_)).sum
            val tail = s - st.prefix.take(lag).map(BigInt(_)).sum
            val num = n * n * BigInt(st.syy(lag - 1)) - n * s * (head + tail) +
              (n - lag) * s * s
            Some(java.lang.Double.parseDouble(num.toString) /
              java.lang.Double.parseDouble(den.toString))
          }
        (k, lag, st.n, r)
      }
    }
    rows.toDF("key", "lag", "n", "r")
  }

  /** Fold one micro-batch and return the post-fold standing ACF table
    * (key, lag, n, r) — the final batch's return equals the batch
    * operator over the whole series. Empty batches advance only the
    * batch cursor. */
  def foldBatch(batch: DataFrame, dir: String, batchId: Long,
                windowLen: String = "1 hour", maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64,
      s"acfStream: maxLag out of range: $maxLag")
    val spark = batch.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val (lastBatch, l0, state0) = readState(conf, dir)
    require(l0 == 0 || l0 == maxLag,
      s"acfStream: standing state at $dir was folded with maxLag=$l0, " +
        s"fold called with $maxLag — changing the lag grid mid-stream " +
        "splices two different curves; use a fresh state dir")
    if (batchId <= lastBatch) {
      System.err.println(
        s"[acfStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; a FRESH-CHECKPOINT " +
          "restart also lands here and would drop real data: clear the " +
          "state dir to start over")
      return standingRead(spark, maxLag, state0)
    }
    val profile = batch
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("wstart"), col("n"))
    val counts = profile.limit(4000001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    require(counts.length <= 4000000,
      "acfStream: batch window profile exceeds 4M (keys x windows) rows " +
        "— shard the monitor by key hash")
    if (counts.isEmpty) {
      writeState(conf, dir, batchId, if (l0 == 0) maxLag else l0, state0)
      return standingRead(spark, maxLag, state0)
    }
    val state1 = scala.collection.mutable.Map.empty[String, KeyState]
    state1 ++= state0
    counts.groupBy(_._1).foreach { case (k, ws) =>
      var st = state1.getOrElse(k,
        KeyState(Long.MinValue, 0L, 0L, 0L, Array.fill(maxLag)(0L),
          Vector.empty, Vector.empty))
      ws.sortBy(_._2).foreach { case (_, w, y) =>
        require(w > st.lastW,
          s"acfStream: window ${new java.sql.Timestamp(w)} for '$k' at or " +
            s"behind the cursor — feed finalized hour-aligned batches in " +
            "event-time order")
        val syy = st.syy.clone()
        var j = 0
        while (j < math.min(maxLag, st.last.length)) {
          syy(j) = Math.addExact(syy(j), Math.multiplyExact(st.last(j), y))
          j += 1
        }
        st = KeyState(w,
          st.n + 1L,
          Math.addExact(st.s, y),
          Math.addExact(st.q, Math.multiplyExact(y, y)),
          syy,
          if (st.prefix.length < maxLag) st.prefix :+ y else st.prefix,
          (y +: st.last).take(maxLag))
      }
      state1(k) = st
    }
    writeState(conf, dir, batchId, maxLag, state1.toMap)
    standingRead(spark, maxLag, state1.toMap)
  }

  /** The stream form: fold each micro-batch and overwrite the standing
    * read under `traceDir` (idempotent-replay recipe of the monitor
    * family). */
  def acfSink(stream: DataFrame, stateDir: String, traceDir: String,
              windowLen: String = "1 hour", maxLag: Int = 6):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      foldBatch(b, stateDir, id, windowLen, maxLag)
        .write.mode("overwrite")
        .parquet(s"$traceDir/batch_id=$id")
    }
}
