package graft

import org.apache.spark.sql.functions._
import graft.ops.FileBloomIndex

/** Per-file Bloom sidecar: point lookups open O(1+fpp·files) files. */
class FileBloomSpec extends SparkTestBase {

  test("point lookup opens ~1 of many files and returns the exact row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fbloom").toFile
    val dataPath = new java.io.File(dir, "docs").getPath
    // 4096 distinct keys spread round-robin over 16 files: footer
    // min/max prunes NOTHING (every file spans the key domain)
    (1L to 4096L).map(i => (i, s"payload_$i")).toDF("doc_id", "text")
      .repartition(16, col("doc_id"))
      .write.mode("overwrite").parquet(dataPath)
    val sidecar = FileBloomIndex.build(spark, dataPath, col("doc_id"),
      expectedPerFile = 300L, fpp = 0.01)
    val rows = sidecar.collect()
    assert(rows.length == 16, s"one sidecar row per file: ${rows.length}")
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 4096L)

    // present key: few files opened, exact row found
    val hit = FileBloomIndex.candidateFiles(sidecar,
      FileBloomIndex.hashOf(spark, 1234L))
    assert(hit.nonEmpty && hit.length <= 3,
      s"bloom should prune to ~1 file of 16 (got ${hit.length})")
    val found = FileBloomIndex.lookup(spark, dataPath, sidecar,
      col("doc_id"), 1234L).collect()
    assert(found.length == 1 && found.head.getAs[String]("text") == "payload_1234")

    // absent key: ~0 files, empty result with the data schema intact
    val missFiles = FileBloomIndex.candidateFiles(sidecar,
      FileBloomIndex.hashOf(spark, 999999L))
    assert(missFiles.length <= 2, s"absent key should bloom-negative: $missFiles")
    val miss = FileBloomIndex.lookup(spark, dataPath, sidecar,
      col("doc_id"), 999999L)
    assert(miss.count() == 0L)
    assert(miss.columns.sorted.toSeq == Seq("doc_id", "text"))
  }

  test("probe runs in executors: driver payload is file paths only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fbloom3").toFile
    val dataPath = new java.io.File(dir, "docs").getPath
    (1L to 1024L).map(i => (i, i * 3)).toDF("k", "v")
      .repartition(8, col("k")).write.mode("overwrite").parquet(dataPath)
    val sidecar = FileBloomIndex.build(spark, dataPath, col("k"), 200L)
    val cand = FileBloomIndex.candidateFilesDF(sidecar,
      Seq(FileBloomIndex.hashOf(spark, 500L)))
    // the frame the driver collects carries ONLY the path column — the
    // bitsets are filtered where they live, never shipped
    assert(cand.schema.fieldNames.toSeq == Seq("file"))
    // and the executed plan's output is that single string column
    // (column pruning reached the probe), with the bloom probe below it
    val plan = cand.queryExecution.executedPlan
    assert(plan.output.map(_.name) == Seq("file"))
    assert(plan.toString.contains("bloom_bytes_contain"),
      s"probe expression missing from the plan:\n$plan")
  }

  test("byte-layout probe agrees with the word probe for every bit") {
    val rnd = new scala.util.Random(7)
    val words = new Array[Long](16) // 1024 bits
    val keys = Seq.fill(200)(rnd.nextLong())
    keys.take(100).foreach(k => graft.plans.BloomKernels.set(words, k, 7))
    val bytes = graft.plans.BloomKernels.wordsToBytes(words)
    keys.foreach { k =>
      assert(graft.plans.BloomKernels.mightContainBytes(bytes, k, 7) ==
        graft.plans.BloomKernels.mightContain(words, k, 7),
        s"byte/word probe disagreement for key $k")
    }
  }

  test("probe literal is cast to the key column type (Int probe, Long key)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fbloom4").toFile
    val dataPath = new java.io.File(dir, "docs").getPath
    (1L to 256L).map(i => (i, s"p_$i")).toDF("k", "t")
      .repartition(4, col("k")).write.mode("overwrite").parquet(dataPath)
    val sidecar = FileBloomIndex.build(spark, dataPath, col("k"), 100L)
    // an Int probe against the LongType key: xxhash64 is type-sensitive,
    // so without the cast this pruned every file and returned empty
    val found = FileBloomIndex.lookup(spark, dataPath, sidecar,
      col("k"), 77).collect()
    assert(found.length == 1 && found.head.getAs[String]("t") == "p_77")
    // an uncastable probe fails loudly instead of silently matching nothing
    val e = intercept[IllegalArgumentException] {
      FileBloomIndex.lookup(spark, dataPath, sidecar, col("k"), "not-a-number")
        .collect()
    }
    assert(e.getMessage.contains("does not cast"))
  }

  test("batch lookup: one hash projection, one sidecar pass, one scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fbloom5").toFile
    val dataPath = new java.io.File(dir, "docs").getPath
    (1L to 2048L).map(i => (i, i % 10)).toDF("k", "m")
      .repartition(16, col("k")).write.mode("overwrite").parquet(dataPath)
    val sidecar = FileBloomIndex.build(spark, dataPath, col("k"), 200L)
    val out = FileBloomIndex.lookupMany(spark, dataPath, sidecar,
      col("k"), Seq(3L, 999L, 1500L, 999999L))
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 999L, 1500L))
  }

  test("sidecar round-trips through parquet and the equality filter is pushed down") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fbloom2").toFile
    val dataPath = new java.io.File(dir, "docs").getPath
    (1L to 512L).map(i => (i, i * 2)).toDF("k", "v")
      .repartition(4, col("k")).write.mode("overwrite").parquet(dataPath)
    val sidePath = FileBloomIndex.writeSidecar(spark, dataPath, col("k"), 200L)
    val sidecar = spark.read.parquet(sidePath)
    val out = FileBloomIndex.lookup(spark, dataPath, sidecar, col("k"), 77L)
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(154L))
    // the survivor scan still pushes the equality predicate to parquet
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,77)"),
      s"equality filter not pushed into the scan:\n$plan")
  }
}
