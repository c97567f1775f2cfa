package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Streaming OVERLAP monitor: a standing KMV (k-minimum-values)
  * sketch of the stream's content keys, folded forward per
  * micro-batch — the piece the MG (who is frequent) and HLL (how many
  * distinct) monitors don't give: "how much does what the stream is
  * delivering OVERLAP a standing corpus" (jaccard / containment
  * drift), which is contamination and freshness monitoring in one
  * number, computed WITHOUT ever joining the stream against the
  * corpus. Each batch collapses to its ≤ k smallest distinct md5
  * values in one partial agg ([[graft.ops.Profiling.kmvSketch]]);
  * standing state merges by k-min union — like the HLL max,
  * associative, commutative, and IDEMPOTENT, so batch order is free
  * and replays are harmless by algebra with no batch-id bookkeeping.
  * The overlap read ([[overlapWithSketch]]) runs the exact
  * [[graft.ops.Profiling.kmvOverlapOfSketches]] math, so it is
  * BIT-IDENTICAL to the two-scan batch form over everything seen —
  * s_kmv's twin reuses x_kmv's oracle verbatim.
  *
  * State is one atomic Hadoop-FS file of ≤ k hex strings (k·33 bytes
  * at md5 width — the sketch-size contract). The corpus side is a
  * sketch too, built once and stored wherever the caller likes. */
object KmvStream {

  private def fsp(conf: org.apache.hadoop.conf.Configuration, dir: String,
                  name: String) = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    (p.getFileSystem(conf), p)
  }

  /** (k, sorted k-min hashes); (-1, empty) if absent. */
  def readState(conf: org.apache.hadoop.conf.Configuration, dir: String):
      (Int, Seq[String]) = {
    val bytes = MonitorStateIO.readLatest(conf, dir, "_kmv_state") match {
      case Some((b, _)) => b
      case None =>
        // pre-versioned layout: the fixed-name .txt file
        val (fs, p) = fsp(conf, dir, "_kmv_state.txt")
        if (!fs.exists(p)) return (-1, Seq.empty)
        val b = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        val fin = fs.open(p)
        try fin.readFully(0, b) finally fin.close()
        b
    }
    val lines = new String(bytes, "UTF-8").split("\n").filter(_.nonEmpty)
    // text-format envelope — the binary monitors' magic/family/version
    // header, as a first line (same loud-fail contract)
    require(lines.head == "graft-kmv 1",
      s"kmvStream: state file at $dir opens with '${lines.head.take(40)}' " +
        "— written by an older graft version or not a kmv state file; " +
        "delete the state dir to rebuild (expected header 'graft-kmv 1')")
    (lines(1).toInt, lines.drop(2).toSeq)
  }

  private def writeState(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, k: Int, mins: Seq[String]): Unit = {
    // writer-unique tmp + versioned arbiter rename (MonitorStateIO):
    // a concurrent fold into one state dir loses LOUDLY instead of
    // erasing this writer's mins in a read-modify-write race
    MonitorStateIO.publishNext(conf, dir, "_kmv_state",
      ("graft-kmv 1" +: k.toString +: mins).mkString("\n").getBytes("UTF-8"))
    val (fs, legacy) = fsp(conf, dir, "_kmv_state.txt")
    if (fs.exists(legacy)) fs.delete(legacy, false) // superseded layout
  }

  /** Fold one micro-batch's sketch into the standing k-min set
    * (union, sort, take k — idempotent, order-free). */
  def foldBatch(batch: DataFrame, key: Column, k: Int, dir: String): Unit = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val (k0, state0) = readState(conf, dir)
    require(k0 == -1 || k0 == k,
      s"kmvStream: standing state at $dir has k=$k0, fold called with k=$k")
    val bs = graft.ops.Profiling.kmvSketch(batch, key, k)
      .head().getSeq[String](0)
    val merged = (state0 ++ bs).distinct.sorted.take(k)
    writeState(conf, dir, k, merged)
  }

  /** The stream form: start with
    * `.option("checkpointLocation", …).start()`. */
  def kmvSink(stream: DataFrame, key: Column, k: Int, dir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      foldBatch(batch, key, k, dir)
    }

  /** The standing sketch as a 1-row frame (column named `as`). */
  def standingSketch(spark: SparkSession, dir: String,
                     as: String = "sketch"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, lit}
    val (k, mins) = readState(spark.sessionState.newHadoopConf(), dir)
    require(k > 0, s"kmvStream: no standing state at $dir")
    Seq(1).toDF("__one")
      .select(array(mins.map(lit): _*).cast("array<string>").as(as))
  }

  /** Overlap of a corpus frame against the standing stream sketch —
    * the exact batch math (corpus = side a, stream = side b):
    * (k_used, n_both, jaccard_est, est_distinct_a, est_distinct_b). */
  def overlapWithCorpus(spark: SparkSession, dir: String,
                        corpus: DataFrame, corpusKey: Column,
                        k: Int): DataFrame =
    graft.ops.Profiling.kmvOverlapOfSketches(
      graft.ops.Profiling.kmvSketch(corpus, corpusKey, k)
        .select(org.apache.spark.sql.functions.col("sketch").as("sa")),
      standingSketch(spark, dir, as = "sb"), k)
}
