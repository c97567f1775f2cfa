package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.sources.Sources

/** Source/sink round-trips + the bucketed-join no-shuffle guarantee. */
class SourcesSpec extends SparkTestBase {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def sample = sqlDf(
    "id" -> Seq(1L, 2L, 3L, 4L),
    "grp" -> Seq("x", "x", "y", "y"),
    "v" -> Seq(1.5, 2.5, 3.5, 4.5))

  test("csv round-trip with explicit schema preserves types and nulls") {
    val dir = tmp("graft_csv")
    Sources.writeCsv(sample.withColumn("v",
      when(col("id") === 2, lit(null)).otherwise(col("v"))), dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("v", DoubleType)))
    val back = Sources.readCsv(spark, dir, schema).orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(back(1).isNullAt(2), "empty string must read back as null")
    assert(back(2).getDouble(2) == 3.5)
  }

  test("jsonl round-trip with explicit schema") {
    val dir = tmp("graft_json")
    Sources.writeJsonl(sample, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("v", DoubleType)))
    val back = Sources.readJsonl(spark, dir, schema)
    assert(back.orderBy("id").collect().map(_.getDouble(2)).toSeq ==
      Seq(1.5, 2.5, 3.5, 4.5))
  }

  test("orc round-trip preserves types; filters push to the OrcScan") {
    val dir = tmp("graft_orc")
    Sources.writeOrc(sample, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.orderBy("id").collect().map(_.getDouble(2)).toSeq ==
      Seq(1.5, 2.5, 3.5, 4.5))
    val plan = back.filter(col("id") > 2).select("id", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"),
      s"orc filter not pushed:\n$plan")
  }

  test("partitioned write prunes directories on the partition predicate") {
    val dir = tmp("graft_part")
    Sources.writePartitioned(sample, dir, Seq("grp"))
    assert(new java.io.File(dir, "grp=x").exists())
    val q = Sources.readParquet(spark, dir).filter(col("grp") === "y")
    // partition pruning: only grp=y rows even reach the scan
    assert(q.count() == 2)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(grp"),
      s"partition filter not applied:\n$scan")
  }

  test("bucketed tables join with ZERO shuffle") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    // a killed JVM can leave the managed location behind without the
    // catalog entry; clear both so the test is idempotent
    for (t <- Seq("graft_bucket_a", "graft_bucket_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(new java.net.URI(wh).getPath, t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(loc)
      }
    }
    Sources.writeBucketed(sample, "graft_bucket_a", Seq("id"), 4)
    Sources.writeBucketed(
      sample.withColumnRenamed("v", "w").drop("grp"), "graft_bucket_b", Seq("id"), 4)
    val joined = spark.table("graft_bucket_a")
      .join(spark.table("graft_bucket_b"), "id")
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"bucketed join must not shuffle (warehouse=$wh):\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 4)
  }

  test("maxRecordsPerFile bounds output file sizes") {
    val dir = tmp("graft_maxrec")
    Sources.writeParquet(spark.range(100).toDF("id").repartition(1), dir,
      maxRecordsPerFile = 30L)
    val files = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files >= 4, s"expected >= 4 files of <= 30 records, got $files")
  }
}
