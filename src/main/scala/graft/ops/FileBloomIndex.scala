package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.{BloomBuildAgg, BloomBytesContainExpr, BloomKernels}

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
  * cached AS A FRAME in executors, and probed there per lookup
  * (BloomBytesContainExpr inside a filter); only the surviving file
  * PATHS reach the driver. The data files are
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

  /** Probe-batch ceiling for the OR-chain form: a point-lookup batch is
    * tens-to-hundreds of keys; past this, per-row k-probe chains stop
    * being the right plan — use [[BloomPrune]] (broadcast ONE bloom of
    * the probe set) or a plain semi-join instead. */
  final val MaxProbeBatch = 1024

  /** Spark-compatible xxhash64 of the probe values AS THE KEY COLUMN'S
    * TYPE, in ONE local 1-row projection (no per-key jobs, no hash
    * reimplementation to drift). xxhash64 is type-sensitive — an Int
    * literal probing a LongType key hashes differently and would prune
    * every file even though the row exists — so each literal is cast
    * to `keyType` first, and a probe the cast nulls out fails loudly
    * instead of silently matching nothing. */
  def hashAll(spark: SparkSession, values: Seq[Any],
              keyType: org.apache.spark.sql.types.DataType): Seq[Long] = {
    require(values.nonEmpty, "FileBloomIndex.hashAll: empty probe batch")
    require(values.size <= MaxProbeBatch,
      s"FileBloomIndex.hashAll: ${values.size} probes > MaxProbeBatch=$MaxProbeBatch " +
        "— broadcast one bloom of the probe set (BloomPrune) instead")
    values.foreach(v => require(v != null,
      "FileBloomIndex: lookups are for non-null points"))
    // try_cast: ANSI mode would THROW mid-projection on a malformed
    // probe; the nulled-flag check below turns that into one
    // descriptive failure regardless of the session's ansi setting
    val casts = values.map(v => lit(v).try_cast(keyType))
    val row = spark.range(1)
      .select(array(casts.map(c => xxhash64(c)): _*).as("h"),
              array(casts.map(_.isNull): _*).as("nulled"))
      .head()
    values.zip(row.getSeq[Boolean](1)).foreach { case (v, nulled) =>
      require(!nulled,
        s"FileBloomIndex: probe value '$v' (${v.getClass.getSimpleName}) does not " +
          s"cast to the key column type $keyType — the sidecar was built from " +
          s"$keyType hashes, so this probe could never match")
    }
    row.getSeq[Long](0)
  }

  /** Back-compat single-value hash. Only correct when the Scala type of
    * `value` matches the key column's Spark type (Long↔LongType etc.);
    * prefer [[hashAll]] with the key type read from the data schema —
    * that's what [[lookup]]/[[lookupMany]] do. */
  def hashOf(spark: SparkSession, value: Any): Long =
    spark.range(1).select(xxhash64(lit(value))).head().getLong(0)

  /** The sidecar rows whose bloom might contain ANY of the probe
    * hashes, projected to the file PATH only — the probe runs in
    * EXECUTORS (BloomBytesContainExpr inside the filter), so the
    * bitsets are tested where they live and never move. At the
    * scaladoc's 100 TB sizing (100k files × 1.2 MB bitsets) the
    * driver payload of a collect here is a path list, not the ~120 GB
    * of bitsets the old collect-then-filter shape shipped per lookup. */
  def candidateFilesDF(sidecar: DataFrame, keyHashes: Seq[Long]): DataFrame = {
    require(keyHashes.nonEmpty && keyHashes.size <= MaxProbeBatch,
      s"FileBloomIndex.candidateFilesDF: probe batch must be 1..$MaxProbeBatch, " +
        s"got ${keyHashes.size}")
    val probe = keyHashes.map { h =>
      ColumnBridge.column(BloomBytesContainExpr(
        ColumnBridge.expr(col("bloom")),
        ColumnBridge.expr(lit(h)),
        ColumnBridge.expr(col("num_hashes"))))
    }.reduce(_ || _)
    sidecar.filter(probe).select("file")
  }

  /** The files a point lookup must open. Paths-only driver payload;
    * see [[candidateFilesDF]]. */
  def candidateFiles(sidecar: DataFrame, keyHash: Long): Seq[String] =
    candidateFilesDF(sidecar, Seq(keyHash)).collect().map(_.getString(0)).toSeq

  /** Point lookup: prune files via the executor-side sidecar probe,
    * then scan only the survivors with the equality filter pushed down
    * (footer + row-group pruning still apply inside them). Returns an
    * empty frame (correct schema) when every file is bloom-negative. */
  def lookup(spark: SparkSession, dataPath: String, sidecar: DataFrame,
             key: Column, value: Any): DataFrame =
    lookupMany(spark, dataPath, sidecar, key, Seq(value))

  /** Batch point lookup: ONE projection hashes every probe (cast to
    * the key column's type — see [[hashAll]]), ONE executor-side
    * sidecar pass prunes files for the whole batch, ONE scan of the
    * surviving files with the IN filter pushed down. */
  def lookupMany(spark: SparkSession, dataPath: String, sidecar: DataFrame,
                 key: Column, values: Seq[Any]): DataFrame = {
    val all = spark.read.parquet(dataPath)
    val keyType = all.select(key).schema.head.dataType
    val hashes = hashAll(spark, values, keyType)
    val files = candidateFilesDF(sidecar, hashes).collect().map(_.getString(0)).toSeq
    if (files.isEmpty) all.filter(lit(false))
    else spark.read.schema(all.schema).parquet(files: _*)
      .filter(key.isin(values: _*))
  }
}
