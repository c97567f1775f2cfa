package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.{BloomBuildAgg, BloomKernels}

/** Per-FILE Bloom sidecar for point lookups on a high-cardinality key
  * — the file-level complement of parquet's native row-group bloom
  * filters. Parquet footer min/max stats prune nothing for a key
  * that's uniformly spread (every file's [min,max] spans the domain),
  * and native parquet blooms only help AFTER a file is opened. The
  * sidecar holds one bloom bitset per data file (built in ONE grouped
  * pass with the same TypedImperativeAggregate the cross-corpus dedup
  * uses — word-OR partial merge, bounded state per file), so a point
  * lookup consults a file-count-sized table first and opens only the
  * files that might contain the key: O(1 + fpp·files) file opens
  * instead of all of them.
  *
  * At 100 TB: the sidecar is ~(files × bits/8) bytes — e.g. 100k
  * files × 1.2 MB bitsets for 1M keys/file at 1% fpp — read once,
  * cached, and consulted driver-side per lookup. The data files are
  * untouched (no rewrite, works on any existing parquet layout);
  * combine with [[graft.functions.ZOrder]] for range predicates and
  * with `parquet.bloom.filter.enabled#col` on write for in-file
  * row-group pruning behind the same equality filter.
  *
  * False positives cost one wasted file open; the pushed equality
  * filter inside the scan keeps correctness exact. NULL keys hash
  * like any value under xxhash64's null handling — lookups are for
  * non-null points.
  */
object FileBloomIndex {

  /** Build the sidecar frame for the parquet data at `dataPath`: one
    * row per file — (file, n_rows, bloom BINARY, num_hashes INT).
    * `expectedPerFile` sizes each bitset (over-estimate = more bits,
    * under-estimate = higher fpp, never wrong answers). */
  def build(spark: SparkSession, dataPath: String, key: Column,
            expectedPerFile: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedPerFile >= 1, s"expectedPerFile must be >= 1")
    val numBits = BloomKernels.optimalNumBits(expectedPerFile, fpp)
    val numHashes = BloomKernels.optimalNumHashes(numBits, expectedPerFile)
    val agg = ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expr(xxhash64(key)), numBits, numHashes)
        .toAggregateExpression())
    spark.read.parquet(dataPath)
      .withColumn("__file", input_file_name())
      .groupBy(col("__file").as("file"))
      .agg(count(lit(1)).as("n_rows"), agg.as("bloom"))
      .withColumn("num_hashes", lit(numHashes))
  }

  /** Build and land the sidecar next to the data
    * (`<dataPath>_bloomidx`). Returns the sidecar path. */
  def writeSidecar(spark: SparkSession, dataPath: String, key: Column,
                   expectedPerFile: Long, fpp: Double = 0.01): String = {
    val out = s"$dataPath" + "_bloomidx"
    build(spark, dataPath, key, expectedPerFile, fpp)
      .coalesce(1).write.mode("overwrite").parquet(out)
    out
  }

  /** Spark-compatible xxhash64 of a point value, computed through the
    * engine itself (one 1-row local projection — no reimplementation
    * to drift). */
  def hashOf(spark: SparkSession, value: Any): Long =
    spark.range(1).select(xxhash64(lit(value))).head().getLong(0)

  /** The files a point lookup must open: sidecar rows whose bloom
    * might contain the key. Driver-side probe over the collected
    * sidecar — file-count-sized by contract. */
  def candidateFiles(sidecar: DataFrame, keyHash: Long): Seq[String] =
    sidecar.select("file", "bloom", "num_hashes").collect().toSeq
      .filter { r =>
        BloomKernels.mightContain(
          BloomKernels.bytesToWords(r.getAs[Array[Byte]]("bloom")),
          keyHash, r.getAs[Int]("num_hashes")) }
      .map(_.getAs[String]("file"))

  /** Point lookup: prune files via the sidecar, then scan only the
    * survivors with the equality filter pushed down (footer +
    * row-group pruning still apply inside them). Returns an empty
    * frame (correct schema) when every file is bloom-negative. */
  def lookup(spark: SparkSession, dataPath: String, sidecar: DataFrame,
             key: Column, value: Any): DataFrame = {
    val files = candidateFiles(sidecar, hashOf(spark, value))
    val all = spark.read.parquet(dataPath)
    if (files.isEmpty) all.filter(lit(false))
    else spark.read.schema(all.schema).parquet(files: _*)
      .filter(key === lit(value))
  }
}
