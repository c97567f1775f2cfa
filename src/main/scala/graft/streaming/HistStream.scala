package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming QUANTILE monitor — a standing fixed-grid histogram
  * ([[graft.ops.Profiling.gridHistogram]]) folded per micro-batch,
  * answering the rank queries (p50/p95/p99 of latency, doc length,
  * quality score) that the other standing monitors can't: KMV/HLL
  * count distincts, Misra–Gries ranks frequencies, CUSUM flags level
  * shifts — none of them orders VALUES. The grid is the whole trick:
  * per batch ONE partial-agg groupBy collapses any batch size to
  * ≤ bins+2 (bin, count) rows, the driver fold is a vector add, and
  * the standing state is bins·8B forever — a mergeable, fixed-memory
  * summary like the sketches, but exact-by-construction over the
  * declared grid (estimate error ≤ one bin width, the caller's
  * bins-vs-memory trade). Grid bounds are caller-declared, like the
  * clustered-sink grids: size the grid to the metric's DOMAIN once,
  * not per batch — out-of-range mass lands in the unbounded
  * under/overflow bins and quantile reads clamp there.
  *
  * Counts are NOT idempotent under replay (unlike KMV/HLL's
  * max-merge), so the state carries the last folded batch id and a
  * replayed foreachBatch id is a no-op — the MG/CUSUM recipe.
  * Standing reads ([[standingHistogram]], [[standingQuantiles]]) are
  * bit-identical to the batch operator over everything folded so far:
  * the histogram IS a sum, and sums of longs are order-free. */
object HistStream {

  /** (lo, hi, bins, lastBatchId, bin→count); bins = -1 if absent. */
  def readState(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Double, Double, Int, Long, Map[Long, Long]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_hist_state") match {
      case None => return (0.0, 0.0, -1, -1L, Map.empty)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "hist", 1, "histStream")
    val lo = in.readDouble(); val hi = in.readDouble()
    val bins = in.readInt(); val lastBatch = in.readLong()
    val m = in.readInt()
    (lo, hi, bins, lastBatch,
      (0 until m).map(_ => (in.readLong(), in.readLong())).toMap)
  }

  private def writeState(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, lo: Double, hi: Double, bins: Int,
                         lastBatch: Long, counts: Map[Long, Long]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "hist", 1)
    out.writeDouble(lo); out.writeDouble(hi)
    out.writeInt(bins); out.writeLong(lastBatch)
    out.writeInt(counts.size)
    counts.toSeq.sortBy(_._1).foreach { case (b, n) =>
      out.writeLong(b); out.writeLong(n)
    }
    out.flush()
    // writer-unique tmp + versioned arbiter rename (MonitorStateIO):
    // a concurrent fold into one state dir loses LOUDLY instead of
    // erasing this writer's counts in a read-modify-write race
    MonitorStateIO.publishNext(conf, dir, "_hist_state", bos.toByteArray)
  }

  /** Fold one micro-batch's grid profile into the standing counts.
    * The batch collapses to ≤ bins+2 rows in one partial agg before
    * the driver sees anything; the fold is a vector add. Replaying an
    * already-folded batch id is a no-op. */
  def foldBatch(batch: DataFrame, x: Column, lo: Double, hi: Double,
                bins: Int, dir: String, batchId: Long): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (lo0, hi0, bins0, lastBatch, state0) = readState(conf, dir)
    require(bins0 == -1 || (lo0 == lo && hi0 == hi && bins0 == bins),
      s"histStream: standing grid at $dir is ($lo0,$hi0,$bins0), " +
        s"fold called with ($lo,$hi,$bins) — grids must match")
    if (batchId <= lastBatch) {
      System.err.println(
        s"[histStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; a FRESH-CHECKPOINT " +
          "restart also lands here and would drop real data: clear the " +
          "state dir to start over")
      return
    }
    val prof = graft.ops.Profiling.gridHistogram(batch, x, lo, hi, bins)
      .select("bin", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val merged = prof.foldLeft(state0) { case (acc, (b, n)) =>
      acc.updatedWith(b)(old => Some(old.getOrElse(0L) + n))
    }
    writeState(conf, dir, lo, hi, bins, batchId, merged)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def histSink(stream: DataFrame, x: Column, lo: Double, hi: Double,
               bins: Int, dir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      foldBatch(batch, x, lo, hi, bins, dir, batchId)
    }

  /** The standing histogram — bit-identical to
    * [[graft.ops.Profiling.gridHistogram]] over everything folded so
    * far: (bin, lo_edge, hi_edge, n). */
  def standingHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (lo, hi, bins, _, counts) =
      readState(spark.sessionState.newHadoopConf(), dir)
    require(bins > 0, s"histStream: no standing state at $dir")
    val w = (lit(hi) - lit(lo)) / lit(bins.toDouble)
    counts.toSeq.sortBy(_._1).toDF("bin", "n")
      .withColumn("lo_edge",
        when(col("bin") >= 0 && col("bin") < bins,
          lit(lo) + col("bin").cast("double") * w))
      .withColumn("hi_edge",
        when(col("bin") >= 0 && col("bin") < bins,
          lit(lo) + (col("bin") + 1).cast("double") * w))
      .select("bin", "lo_edge", "hi_edge", "n")
  }

  /** Standing quantile estimates — [[graft.ops.Profiling.histQuantiles]]
    * over the standing counts: (p, est, rank, bin). */
  def standingQuantiles(spark: SparkSession, dir: String,
                        ps: Seq[Double]): DataFrame = {
    val (lo, hi, bins, _, _) =
      readState(spark.sessionState.newHadoopConf(), dir)
    require(bins > 0, s"histStream: no standing state at $dir")
    graft.ops.Profiling.histQuantiles(
      standingHistogram(spark, dir), lo, hi, bins, ps)
  }

  /** Drift between two standing monitors (or a frozen reference
    * state dir and the live one): [[graft.ops.Profiling.histPsi]]
    * over the two standing grids — grid-sized work, no raw-data
    * re-scan. Grids must match (same lo/hi/bins), checked loudly. */
  def standingPsi(spark: SparkSession, refDir: String,
                  curDir: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val (lo1, hi1, b1, _, _) = readState(conf, refDir)
    val (lo2, hi2, b2, _, _) = readState(conf, curDir)
    require(b1 > 0 && b2 > 0, "histStream: missing standing state")
    require(lo1 == lo2 && hi1 == hi2 && b1 == b2,
      s"histStream: grids differ — ref ($lo1,$hi1,$b1) vs cur ($lo2,$hi2,$b2)")
    graft.ops.Profiling.histPsi(
      standingHistogram(spark, refDir), standingHistogram(spark, curDir), b1)
  }

  // ---- keyed variant: one standing grid per stratum ----------------------

  /** (lo, hi, bins, lastBatchId, (key, bin)→count); bins = -1 if
    * absent. */
  def readStateBy(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Double, Double, Int, Long, Map[(String, Long), Long]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_histby_state") match {
      case None => return (0.0, 0.0, -1, -1L, Map.empty)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "histby", 1, "histStream")
    val lo = in.readDouble(); val hi = in.readDouble()
    val bins = in.readInt(); val lastBatch = in.readLong()
    val m = in.readInt()
    (lo, hi, bins, lastBatch,
      (0 until m).map { _ =>
        ((graft.plans.SketchIO.readStr(in), in.readLong()), in.readLong())
      }.toMap)
  }

  private def writeStateBy(conf: org.apache.hadoop.conf.Configuration,
                           dir: String, lo: Double, hi: Double, bins: Int,
                           lastBatch: Long,
                           counts: Map[(String, Long), Long]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "histby", 1)
    out.writeDouble(lo); out.writeDouble(hi)
    out.writeInt(bins); out.writeLong(lastBatch)
    out.writeInt(counts.size)
    counts.toSeq.sortBy(_._1).foreach { case ((k, b), n) =>
      graft.plans.SketchIO.writeStr(out, k); out.writeLong(b); out.writeLong(n)
    }
    out.flush()
    // writer-unique tmp + versioned arbiter rename (MonitorStateIO)
    MonitorStateIO.publishNext(conf, dir, "_histby_state", bos.toByteArray)
  }

  /** Keyed fold: one standing grid per stratum (per event type, per
    * language). The per-batch driver profile is keys×(bins+2)-bounded
    * with a loud 4M cap — past a million-stratum firehose, shard the
    * monitor by key hash into independent state dirs, the
    * [[CusumStream.foldBatchSharded]] recipe (histogram adds commute,
    * so shard unions are trivially exact and need no shared-spine
    * coupling). */
  def foldBatchBy(batch: DataFrame, key: Column, x: Column,
                  lo: Double, hi: Double, bins: Int, dir: String,
                  batchId: Long): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (lo0, hi0, bins0, lastBatch, state0) = readStateBy(conf, dir)
    require(bins0 == -1 || (lo0 == lo && hi0 == hi && bins0 == bins),
      s"histStream: standing grid at $dir is ($lo0,$hi0,$bins0), " +
        s"fold called with ($lo,$hi,$bins) — grids must match")
    if (batchId <= lastBatch) {
      System.err.println(
        s"[histStream] skipping replayed batch $batchId (standing cursor " +
          s"$lastBatch) — crash-redelivery idempotence; a FRESH-CHECKPOINT " +
          "restart also lands here and would drop real data: clear the " +
          "state dir to start over")
      return
    }
    // NULL stratum keys are dropped like the unkeyed fold drops NULL
    // values (gridHistogram's bin-null filter) — a null event_type row
    // would otherwise ride through gridHistogramBy's groupBy as a null
    // key and NPE the state write's string sort; callers who want a
    // null stratum tracked should coalesce to an explicit sentinel
    // ("__null__") upstream, where the choice is visible
    val prof = graft.ops.Profiling.gridHistogramBy(
        batch.filter(key.isNotNull)
          .select(key.cast("string").as("__k"), x.as("__x")),
        Seq("__k"), org.apache.spark.sql.functions.col("__x"), lo, hi, bins)
      .select("__k", "bin", "n").limit(4000001).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    require(prof.length <= 4000000,
      "histStream: batch (key x bin) profile exceeds 4M rows — shard " +
        "the monitor by key hash into independent state dirs")
    val merged = prof.foldLeft(state0) { case (acc, (kb, n)) =>
      acc.updatedWith(kb)(old => Some(old.getOrElse(0L) + n))
    }
    writeStateBy(conf, dir, lo, hi, bins, batchId, merged)
  }

  /** Keyed stream form. */
  def histSinkBy(stream: DataFrame, key: Column, x: Column,
                 lo: Double, hi: Double, bins: Int, dir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      foldBatchBy(batch, key, x, lo, hi, bins, dir, batchId)
    }

  /** The standing per-key histogram — bit-identical to
    * [[graft.ops.Profiling.gridHistogramBy]] over everything folded:
    * (key, bin, lo_edge, hi_edge, n). */
  def standingHistogramBy(spark: SparkSession, dir: String,
                          keyName: String = "key"): DataFrame = {
    import spark.implicits._
    val (lo, hi, bins, _, counts) =
      readStateBy(spark.sessionState.newHadoopConf(), dir)
    require(bins > 0, s"histStream: no standing state at $dir")
    val w = (lit(hi) - lit(lo)) / lit(bins.toDouble)
    counts.toSeq.sortBy(_._1).map { case ((k, b), n) => (k, b, n) }
      .toDF(keyName, "bin", "n")
      .withColumn("lo_edge",
        when(col("bin") >= 0 && col("bin") < bins,
          lit(lo) + col("bin").cast("double") * w))
      .withColumn("hi_edge",
        when(col("bin") >= 0 && col("bin") < bins,
          lit(lo) + (col("bin") + 1).cast("double") * w))
      .select(keyName, "bin", "lo_edge", "hi_edge", "n")
  }

  /** Per-stratum drift between two keyed standing monitors:
    * [[graft.ops.Profiling.histPsiBy]] over the two standing keyed
    * grids — one PSI row per key, grid-sized work. Grids must match. */
  def standingPsiBy(spark: SparkSession, refDir: String, curDir: String,
                    keyName: String = "key"): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val (lo1, hi1, b1, _, _) = readStateBy(conf, refDir)
    val (lo2, hi2, b2, _, _) = readStateBy(conf, curDir)
    require(b1 > 0 && b2 > 0, "histStream: missing standing state")
    require(lo1 == lo2 && hi1 == hi2 && b1 == b2,
      s"histStream: grids differ — ref ($lo1,$hi1,$b1) vs cur ($lo2,$hi2,$b2)")
    graft.ops.Profiling.histPsiBy(
      standingHistogramBy(spark, refDir, keyName),
      standingHistogramBy(spark, curDir, keyName), keyName, b1)
  }

  /** Standing per-key quantiles —
    * [[graft.ops.Profiling.histQuantilesBy]] over the standing
    * counts: (key, p, est, rank, bin). */
  def standingQuantilesBy(spark: SparkSession, dir: String,
                          ps: Seq[Double],
                          keyName: String = "key"): DataFrame = {
    val (lo, hi, bins, _, _) =
      readStateBy(spark.sessionState.newHadoopConf(), dir)
    require(bins > 0, s"histStream: no standing state at $dir")
    graft.ops.Profiling.histQuantilesBy(
      standingHistogramBy(spark, dir, keyName), Seq(keyName),
      lo, hi, bins, ps)
  }
}
