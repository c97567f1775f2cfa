package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Streaming DISTINCT-COUNT monitor: a standing HyperLogLog register
  * table folded forward per micro-batch — "how many distinct users /
  * terms / URLs has the stream seen so far, per stratum" with
  * keys×2^p integers of durable state. Each batch collapses to its
  * register table in ONE partial agg
  * ([[graft.ops.Profiling.hllRegisters]]); standing registers merge by
  * elementwise MAX, which is associative, commutative, and IDEMPOTENT
  * — so batch order doesn't matter AND a replayed batch is harmless
  * BY ALGEBRA, with no batch-id bookkeeping at all (the property that
  * makes HLL the canonical streaming sketch). The standing estimate
  * ([[standingEstimate]]) runs [[graft.ops.Profiling.hllEstimate]]
  * over the standing registers, so it is BIT-IDENTICAL to the batch
  * sketch over everything seen so far — s_hll's twin reuses x_hll's
  * oracle verbatim.
  *
  * State is one atomic Hadoop-FS file of (key, bucket, rho) integer
  * triples (≤ keys×2^p entries — the sketch-size contract). */
object HllStream {

  /** (p, (key, bucket) → rho); (-1, empty) if absent. */
  def readState(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Int, Map[(String, Long), Int]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_hll_state") match {
      case None => return (-1, Map.empty)
      case Some((b, _)) => b
    }
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    graft.plans.SketchIO.readHeader(in, "hll", 1, "hllStream")
    val prec = in.readInt()
    val n = in.readInt()
    (prec, (0 until n).map { _ =>
      ((graft.plans.SketchIO.readStr(in), in.readLong()), in.readInt())
    }.toMap)
  }

  private def writeState(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, p: Int,
                         regs: Map[(String, Long), Int]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    graft.plans.SketchIO.writeHeader(out, "hll", 1)
    out.writeInt(p)
    out.writeInt(regs.size)
    regs.toSeq.sortBy(_._1).foreach { case ((k, b), r) =>
      graft.plans.SketchIO.writeStr(out, k); out.writeLong(b); out.writeInt(r)
    }
    out.flush()
    // writer-unique tmp + versioned arbiter rename (MonitorStateIO):
    // a concurrent fold into one state dir loses LOUDLY instead of
    // erasing this writer's registers in a read-modify-write race
    MonitorStateIO.publishNext(conf, dir, "_hll_state", bos.toByteArray)
  }

  /** Fold one micro-batch's registers into the standing table
    * (elementwise max — idempotent, order-free). */
  def foldBatch(batch: DataFrame, key: Column, x: Column, p: Int,
                dir: String): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (p0, state0) = readState(conf, dir)
    require(p0 == -1 || p0 == p,
      s"hllStream: standing state at $dir has p=$p0, fold called with p=$p")
    val batchRegs = graft.ops.Profiling
      .hllRegisters(batch.select(key.cast("string").as("__k"), x.as("__x")),
        Seq("__k"), org.apache.spark.sql.functions.col("__x"), p)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getInt(2)))
    val merged = batchRegs.foldLeft(state0) { case (acc, (kb, rho)) =>
      acc.updatedWith(kb)(old => Some(math.max(old.getOrElse(0), rho)))
    }
    writeState(conf, dir, p, merged)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def hllSink(stream: DataFrame, key: Column, x: Column, p: Int,
              dir: String): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      foldBatch(batch, key, x, p, dir)
    }

  /** The standing distinct estimate per key — the exact
    * [[graft.ops.Profiling.hllEstimate]] math over the standing
    * registers: (key, est_distinct, buckets_hit). */
  def standingEstimate(spark: SparkSession, dir: String,
                       keyName: String = "key"): DataFrame = {
    import spark.implicits._
    val (p, regs) = readState(spark.sessionState.newHadoopConf(), dir)
    require(p > 0, s"hllStream: no standing state at $dir")
    val regsDf = regs.toSeq.map { case ((k, b), r) => (k, b, r) }
      .toDF(keyName, "__bucket", "__r")
    graft.ops.Profiling.hllEstimate(regsDf, Seq(keyName), p)
  }
}
