package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming heavy hitters: a STANDING Misra–Gries summary maintained
  * across micro-batches — "what are the frequent keys over the whole
  * stream so far" with ≤ k counters of durable state, no per-key
  * stream state, and no reprocessing of history. Each micro-batch is
  * summarized by the mergeable MG aggregate
  * ([[graft.plans.MisraGriesAgg]] — one pass, map-side combine), then
  * folded into the standing summary by the Agarwal et al. 2012 merge
  * (pairwise sum, subtract the (k+1)-th largest, keep positives) —
  * which runs DRIVER-SIDE on two ≤ k-entry lists, bounded by the
  * sketch contract (the same contract that lets centroids and
  * codebooks round-trip the driver). The classical guarantee holds
  * over the full stream: every key with true frequency > N/(k+1) is
  * in the standing summary, estimates under-count by ≤ err_bound.
  *
  * State on disk is one atomic file (temp + rename) of ≤ k entries +
  * the running N + the last merged batch id — readable any time via
  * [[standingSummary]] without touching the stream. The batch id
  * makes replay IDEMPOTENT: foreachBatch re-delivers a batch after a
  * crash between the state write and the checkpoint commit, and a
  * batch id ≤ the recorded one is skipped instead of double-counted
  * (monotone batch ids are the foreachBatch contract). */
object HeavyHitterStream {

  /** State I/O through the Hadoop FileSystem API, so the standing
    * summary can live next to the data on HDFS/S3/local alike. */
  /** ((items sorted by (est desc, item), running N), last merged
    * batch id); empty/-1 if absent. */
  def readStanding(conf: org.apache.hadoop.conf.Configuration,
                   dir: String): (Seq[(String, Long)], Long, Long) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_mg_summary") match {
      case None => return (Seq.empty, 0L, -1L)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "mg", 1, "heavyHitterStream")
    val n = in.readLong()
    val lastBatch = in.readLong()
    val m = in.readInt()
    ((0 until m).map(_ => (graft.plans.SketchIO.readStr(in), in.readLong())), n, lastBatch)
  }

  private def writeStanding(conf: org.apache.hadoop.conf.Configuration,
                            dir: String, items: Seq[(String, Long)],
                            n: Long, lastBatch: Long): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "mg", 1)
    out.writeLong(n)
    out.writeLong(lastBatch)
    out.writeInt(items.size)
    items.foreach { case (s, c) => graft.plans.SketchIO.writeStr(out, s); out.writeLong(c) }
    out.flush()
    // writer-unique tmp + versioned arbiter rename (MonitorStateIO):
    // a concurrent fold into one state dir loses LOUDLY instead of
    // erasing this writer's summary in a read-modify-write race
    MonitorStateIO.publishNext(conf, dir, "_mg_summary", bos.toByteArray)
  }

  /** Agarwal et al. merge of two ≤ k-entry summaries (driver-side by
    * the sketch-size contract). */
  def mergeSummaries(a: Seq[(String, Long)], b: Seq[(String, Long)],
                     k: Int): Seq[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    (a ++ b).foreach { case (s, c) => m.update(s, m.getOrElse(s, 0L) + c) }
    val all = m.toSeq
    val kept =
      if (all.size <= k) all
      else {
        val d = all.map(_._2).sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
        all.collect { case (s, c) if c > d => (s, c - d) }
      }
    kept.sortBy(e => (-e._2, e._1))
  }

  /** One batch's ≤ k-entry MG summary + its non-NULL key count. */
  def summarize(batch: DataFrame, key: Column, k: Int): (Seq[(String, Long)], Long) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = ColumnBridge.column(
      graft.plans.MisraGriesAgg(ColumnBridge.expr(key.cast("string")), k)
        .toAggregateExpression())
    val r = batch.agg(agg.as("sketch"), count(key.cast("string")).as("n")).head()
    val items = r.getSeq[Row](0).map(x => (x.getString(0), x.getLong(1)))
    (items, r.getLong(1))
  }

  /** The per-batch half, callable directly for batch-twin testing.
    * A batch id at or below the recorded last merge is a replay and
    * is SKIPPED (idempotence); pass monotonically increasing ids. */
  def mergeBatch(batch: DataFrame, key: Column, k: Int, dir: String,
                 batchId: Long): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (sItems, sN, lastBatch) = readStanding(conf, dir)
    if (batchId <= lastBatch) {
      System.err.println(
        s"[heavyHitterStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; a FRESH-CHECKPOINT " +
          "restart also lands here and would drop real data: clear the " +
          "state dir to start over")
      return
    }
    val (bItems, bN) = summarize(batch, key, k)
    writeStanding(conf, dir, mergeSummaries(sItems, bItems, k), sN + bN, batchId)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def heavyHitterSink(stream: DataFrame, key: Column, k: Int, dir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBatch(batch, key, k, dir, batchId)
    }

  /** The standing summary as a frame: (item, est, err_bound) — the
    * same shape as [[graft.ops.Profiling.heavyHitters]]. */
  def standingSummary(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import spark.implicits._
    val (items, n, _) = readStanding(spark.sessionState.newHadoopConf(), dir)
    val err = (n - items.map(_._2).sum) / (k + 1L)
    items.map { case (s, c) => (s, c, err) }
      .toDF("item", "est", "err_bound")
  }
}
