package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: times the §2.8 analytical queries plus one
  * representative per heavy operator family (dedup, ANN, text,
  * sessionization) at SPARK_GRAFT_SF_DIR. Prints ONE JSON line.
  */
object Bench {
  /** Headline set — analytics + the scale-critical pipeline ops. */
  val headline: Seq[String] = Seq(
    "q1_pricing", "q3_topk", "q5_region_revenue",
    "d_ranks", "d_mutate_grouped", "d_join_inner", "d_topk", "d_rowwise2",
    "x_dedup_exact", "x_dedup_minhash", "x_ann_brute", "x_ann_lsh",
    "x_langid", "x_tokens", "x_asof", "x_asof_global", "x_contam", "x_gopher",
    "x_par_dedup", "x_range_join", "x_multimodal",
    "s_sessionize")

  /** The driver-written sf parquet files are single row groups, so a
    * scan stage cannot fan out past one task (BASELINE.md
    * "Scan-parallelism note") — the q* times would measure single-core
    * parquet decode, not the plan. Rewrite each table ONCE into a
    * multi-file copy under target/benchcache (keyed by the sf dir
    * name); the one-time rewrite is excluded from every timing. */
  private def multiRowGroupCopy(spark: SparkSession, sfDir: String): String = {
    val name = new java.io.File(sfDir).getName
    val cache = new java.io.File(s"target/benchcache/$name")
    val ok = new java.io.File(cache, "_OK")
    val tables = new java.io.File(sfDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    // the marker carries a fingerprint of the source files, so a
    // regenerated sf dir invalidates the cache instead of silently
    // timing stale data
    val fingerprint = tables
      .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}").mkString("\n")
    val stale = !ok.exists() ||
      new String(java.nio.file.Files.readAllBytes(ok.toPath), "UTF-8") != fingerprint
    if (stale) {
      tables.foreach { f =>
        val tname = f.getName.stripSuffix(".parquet")
        // fact tables get one file per bench core cohort; dims stay few
        val parts = if (Set("lineitem", "orders", "events").contains(tname)) 16 else 4
        spark.read.parquet(f.getPath).repartition(parts)
          .write.mode("overwrite").parquet(s"${cache.getPath}/$tname.parquet")
      }
      java.nio.file.Files.write(ok.toPath, fingerprint.getBytes("UTF-8"))
    }
    cache.getPath
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries ns timestamps: read them as long during
      // the cache rewrite exactly as the queries themselves do
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val benchDir = multiRowGroupCopy(spark, sfDir)
    // absorb session/codegen/parquet-footer warmup so per-query times
    // measure the queries, not JVM startup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$benchDir/region.parquet").count()
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      // A failed query is reported in a separate "failed" array and
      // omitted from the timings map, so consumers summing/min-ing the
      // map can't mistake a sentinel for a timing.
      val elapsed: Option[Double] =
        try { qs(name)(spark, benchDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None }
      name -> elapsed
    }
    val qJson = results.collect { case (k, Some(v)) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val failedJson = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"failed":$failedJson,"sf":"$sfDir","benchdata":"multi-rowgroup-copy"}""")
    spark.stop()
  }
}
