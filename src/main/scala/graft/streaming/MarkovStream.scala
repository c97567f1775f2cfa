package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming BEHAVIORAL-MODEL monitor — the per-micro-batch form of
  * [[graft.ops.EventAnalytics.transitionMatrix]] whose emission after
  * every fold is IDENTICAL, row for row, to running the batch
  * operator over everything seen so far (the s_ewma contract): the
  * standing state carries the per-(from, to) pair counts plus each
  * user's LAST event type, so a pair straddling a batch boundary
  * (user's last event of batch N, first of batch N+1) counts exactly
  * once — the piece a naive per-batch union would silently drop.
  * Downstream, diffing today's emission against a pinned reference
  * matrix (via [[graft.ops.EventAnalytics.transitionDrift]]'s JSD) is
  * the standing bot/funnel-drift alarm.
  *
  * Scale shape: each batch pays ONE user-partitioned lag window
  * (bounded partitions — a user's own batch events) collapsing to
  * ≤ k² within-batch pair counts, plus one per-user first/last agg;
  * the fold runs driver-side over those profiles and the standing
  * entries. State is users + k² counters — the per-user tail is the
  * monitor's size driver, capped loudly at 4M entries (shard the
  * monitor by user hash beyond, the sketch-cap contract the other
  * monitors share). One atomic enveloped state file; batch-id
  * tracking makes replay idempotent; batches must arrive in
  * event-time order (a batch reaching at or before the standing
  * max-ts cursor refuses loudly), and equal-ts runs must not straddle
  * a batch cut (time-range splits satisfy this by construction).
  * Probabilities are the same exact-count divisions as the batch
  * operator — the emission replays bit-for-bit. */
object MarkovStream {

  /** (lastBatchId, maxTsMs, per-user last type, per-(from,to) count);
    * (-1, Long.MinValue, empty, empty) if absent. */
  def readState(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Long, Long, Map[String, String], Map[(String, String), Long]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_markov_state") match {
      case None => return (-1L, Long.MinValue, Map.empty, Map.empty)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "markov", 1, "markovStream")
    val lastBatch = in.readLong(); val maxTs = in.readLong()
    val nu = in.readInt()
    val users = (0 until nu).map { _ =>
      (graft.plans.SketchIO.readStr(in), graft.plans.SketchIO.readStr(in))
    }.toMap
    val np = in.readInt()
    val pairs = (0 until np).map { _ =>
      ((graft.plans.SketchIO.readStr(in), graft.plans.SketchIO.readStr(in)),
        in.readLong())
    }.toMap
    (lastBatch, maxTs, users, pairs)
  }

  private def writeState(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, lastBatch: Long, maxTs: Long,
                         users: Map[String, String],
                         pairs: Map[(String, String), Long]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "markov", 1)
    out.writeLong(lastBatch); out.writeLong(maxTs)
    out.writeInt(users.size)
    users.toSeq.sortBy(_._1).foreach { case (u, t) =>
      graft.plans.SketchIO.writeStr(out, u)
      graft.plans.SketchIO.writeStr(out, t)
    }
    out.writeInt(pairs.size)
    pairs.toSeq.sortBy(_._1).foreach { case ((f, t), n) =>
      graft.plans.SketchIO.writeStr(out, f)
      graft.plans.SketchIO.writeStr(out, t)
      out.writeLong(n)
    }
    out.flush()
    // writer-unique tmp + versioned arbiter rename (MonitorStateIO):
    // a concurrent fold into one state dir loses LOUDLY instead of
    // erasing this writer's tails in a read-modify-write race
    MonitorStateIO.publishNext(conf, dir, "_markov_state", bos.toByteArray)
  }

  /** Fold one micro-batch; returns the CURRENT transition matrix
    * (from_type, to_type, n, p) over everything seen so far — equal,
    * row for row, to the batch operator on the union of all folded
    * batches. Replayed batch ids emit zero rows and change nothing. */
  def foldBatch(batch: DataFrame, dir: String, batchId: Long,
                user: String, ts: String, eventType: String,
                tieBreak: String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val (lastBatch, maxTs0, users0, pairs0) = readState(conf, dir)
    if (batchId <= lastBatch) {
      System.err.println(
        s"[markovStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; a FRESH-CHECKPOINT " +
          "restart also lands here and would drop real data: clear the " +
          "state dir to start over")
      return Seq.empty[(String, String, Long, Double)]
        .toDF("from_type", "to_type", "n", "p")
    }
    val seq0 = batch.select(col(user).cast("string").as("__u"),
      col(ts).as("__ts"), col(tieBreak).as("__tb"),
      col(eventType).as("__e"))
    def emit(pairs: Map[(String, String), Long]): DataFrame = {
      val rowTot = pairs.groupBy(_._1._1).map { case (f, m) =>
        f -> m.values.sum }
      pairs.toSeq.sortBy(_._1)
        .map { case ((f, t), n) =>
          (f, t, n, n.toDouble / rowTot(f).toDouble) }
        .toDF("from_type", "to_type", "n", "p")
    }
    if (batch.isEmpty) {
      writeState(conf, dir, batchId, maxTs0, users0, pairs0)
      return emit(pairs0)
    }
    val tsMm = seq0.agg(min(col("__ts")), max(col("__ts"))).head()
    val (minTs, maxTs) = (tsMm.getTimestamp(0).getTime,
      tsMm.getTimestamp(1).getTime)
    require(minTs >= maxTs0,
      s"markovStream: batch min ts ${new java.sql.Timestamp(minTs)} is " +
        s"behind the standing cursor ${new java.sql.Timestamp(maxTs0)} — " +
        "feed batches in event-time order")
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tb"))
    val inPairs = seq0.withColumn("__prev", lag(col("__e"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev"), col("__e")).agg(count(lit(1)).as("__n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val ends = seq0.groupBy(col("__u")).agg(
        min_by(col("__e"), struct(col("__ts"), col("__tb"))).as("__first"),
        max_by(col("__e"), struct(col("__ts"), col("__tb"))).as("__last"))
      .limit(4000001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    require(ends.length <= 4000000 && users0.size <= 4000000,
      "markovStream: per-user tail state exceeds 4M entries — shard the " +
        "monitor by user hash")
    var pairs = pairs0
    inPairs.foreach { case (k, n) =>
      pairs = pairs.updated(k, pairs.getOrElse(k, 0L) + n) }
    // boundary pairs: the user's standing last event feeds the batch's
    // first — the transition a per-batch union would drop
    ends.foreach { case (u, first, _) =>
      users0.get(u).foreach { prev =>
        val k = (prev, first)
        pairs = pairs.updated(k, pairs.getOrElse(k, 0L) + 1L)
      }
    }
    val users1 = users0 ++ ends.map { case (u, _, last) => u -> last }
    writeState(conf, dir, batchId, maxTs, users1, pairs)
    emit(pairs)
  }

  /** The stream form: fold each micro-batch and overwrite the standing
    * matrix snapshot under `matrixDir` (the monitor's serving table).
    * Start with `.option("checkpointLocation", …).start()`. */
  def markovSink(stream: DataFrame, stateDir: String, matrixDir: String,
                 user: String, ts: String, eventType: String,
                 tieBreak: String):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      val m = foldBatch(b, stateDir, id, user, ts, eventType, tieBreak)
      if (!m.isEmpty) m.write.mode("overwrite").parquet(matrixDir)
    }
}
