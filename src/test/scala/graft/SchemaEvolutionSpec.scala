package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Metadata-only DROP COLUMN / RENAME COLUMN on manifested tables,
  * and version-scoped schema for time travel — the round-15
  * completion of the schema-evolution family (ADD COLUMN landed
  * round 14). */
class SchemaEvolutionSpec extends SparkTestBase {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def conf = spark.sessionState.newHadoopConf()

  private def fileIds(path: String): Set[(String, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    Sources.readManifest(conf, path).get.map { n =>
      (n, fs.getFileStatus(new org.apache.hadoop.fs.Path(path, n)).getLen)
    }.toSet
  }

  test("dropColumnAtomic: zero files touched, column hidden, compaction materializes") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_drop"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 100L).map(i => (i, s"v$i", i * 3L)).toDF("id", "v", "n")
      .repartition(4).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    val before = fileIds(path)
    Sources.dropColumnAtomic(spark, path, "v")
    // metadata-only: the same physical files, byte for byte
    assert(fileIds(path) == before, "drop must touch zero files")
    val got = Sources.readManifested(spark, path)
    assert(got.columns.toSeq == Seq("id", "n"))
    assert(got.count() == 100 &&
      got.filter(col("id") === 7L).head().getLong(1) == 21L)
    // dropping a missing column / the last columns is loud
    val e = intercept[IllegalArgumentException] {
      Sources.dropColumnAtomic(spark, path, "nope")
    }
    assert(e.getMessage.contains("no column"), e.getMessage)
    // re-adding the dropped name is refused while old footers carry it
    val e2 = intercept[IllegalArgumentException] {
      Sources.addColumnAtomic(spark, path, "v", "string", "x")
    }
    assert(e2.getMessage.contains("physically present"), e2.getMessage)
    // a rewrite reads THROUGH the tombstone: compacted files shed the
    // column physically, freeing the name
    Sources.compactSmallFilesAtomic(spark, path, targetFileBytes = 1L << 30)
    val names = Sources.readManifest(conf, path).get
    assert(names.forall(n => !footer(path, n).contains("v")),
      "compaction must materialize the drop")
    Sources.addColumnAtomic(spark, path, "v", "string", "fresh")
    val re = Sources.readManifested(spark, path)
    assert(re.filter(col("id") === 7L).select("v").head().getString(0)
      == "fresh", "the re-added column serves the NEW default, not relics")
    // THE STICKY-TOMBSTONE HAZARD: files appended AFTER the re-add
    // carry the column physically with real values — a stale
    // coldrop:v entry surviving the re-add would silently drop those
    // values and substitute the default (data corruption). The re-add
    // must have neutralized it.
    Sources.insertIntoAtomic(spark, path,
      Seq((200L, 600L, "explicit")).toDF("id", "n", "v"))
    val post = Sources.readManifested(spark, path)
    assert(post.filter(col("id") === 200L).select("v").head().getString(0)
      == "explicit",
      "a post-re-add append must serve its REAL values, not the default")
    assert(post.filter(col("id") === 7L).select("v").head().getString(0)
      == "fresh", "pre-re-add rows still serve the default")
  }

  test("reusing a renamed-away name neutralizes the stale rename mapping") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_reuse_ren"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 30L).map(i => (i, i * 2L)).toDF("id", "v")
      .repartition(2).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    // v renamed to w: old footers carry physical v, served as w
    Sources.renameColumnAtomic(spark, path, "v", "w")
    // while v-era footers are live, reusing the name is refused (their
    // physical v would collide with the new column's story)
    val e = intercept[IllegalArgumentException] {
      Sources.addColumnAtomic(spark, path, "v", "bigint", -1L)
    }
    assert(e.getMessage.contains("physically present"), e.getMessage)
    // compaction materializes the rename (footers now carry w)
    Sources.compactSmallFilesAtomic(spark, path, targetFileBytes = 1L << 30)
    assert(Sources.readManifest(conf, path).get
      .forall(n => !footer(path, n).contains("v")))
    // re-add a NEW column named v: the stale colrename:v->w mapping
    // must be neutralized, or post-re-add files' v values would be
    // silently served under w (forked column)
    Sources.addColumnAtomic(spark, path, "v", "bigint", -1L)
    Sources.insertIntoAtomic(spark, path,
      Seq((100L, 1000L, 77L)).toDF("id", "w", "v"))
    val got = Sources.readManifested(spark, path)
    assert(got.filter(col("id") === 100L).select("v").head().getLong(0)
      == 77L, "post-re-add v values must stay v, not fork into w")
    assert(got.filter(col("id") === 100L).select("w").head().getLong(0)
      == 1000L)
    assert(got.filter(col("id") === 5L).select("v").head().getLong(0)
      == -1L, "v-era rows read the new column's default")
    assert(got.filter(col("id") === 5L).select("w").head().getLong(0)
      == 10L, "v-era rows still serve their renamed w values")
  }

  test("renameColumnAtomic refuses a target name a live footer still carries") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_ren_guard"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 20L).map(i => (i, i * 2L, i * 3L)).toDF("id", "a", "b")
      .repartition(2).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    // a renamed away: footers still physically carry 'a' (serving a2)
    Sources.renameColumnAtomic(spark, path, "a", "a2")
    // renaming b -> a while a-era footers are live would have b's
    // post-rename files (physical 'a') forked by colrename:a->a2 —
    // refuse until compaction sheds the footprint
    val e = intercept[IllegalArgumentException] {
      Sources.renameColumnAtomic(spark, path, "b", "a")
    }
    assert(e.getMessage.contains("physically present"), e.getMessage)
    Sources.compactSmallFilesAtomic(spark, path, targetFileBytes = 1L << 30)
    Sources.renameColumnAtomic(spark, path, "b", "a")
    val got = Sources.readManifested(spark, path)
    assert(got.columns.sorted.toSeq == Seq("a", "a2", "id"))
    assert(got.filter(col("id") === 4L).select("a").head().getLong(0) == 12L)
    assert(got.filter(col("id") === 4L).select("a2").head().getLong(0) == 8L)
  }

  private def footer(path: String, n: String): Set[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path, n), conf))
    try rdr.getFooter.getFileMetaData.getSchema.getFields.asScala
      .map(_.getName).toSet
    finally rdr.close()
  }

  test("renameColumnAtomic: zero files touched, mixed-era files read one schema") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_ren"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 50L).map(i => (i, i * 10L)).toDF("id", "price")
      .repartition(2).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    val before = fileIds(path)
    Sources.renameColumnAtomic(spark, path, "price", "amount")
    assert(fileIds(path) == before, "rename must touch zero files")
    val got = Sources.readManifested(spark, path)
    assert(got.columns.toSeq == Seq("id", "amount"))
    assert(got.filter(col("id") === 3L).head().getLong(1) == 30L)
    // an append AFTER the rename writes the new physical name; the
    // mixed-era table still reads as one schema
    Sources.insertIntoAtomic(spark, path,
      (51L to 60L).map(i => (i, i * 10L)).toDF("id", "amount"))
    val mixed = Sources.readManifested(spark, path)
    assert(mixed.count() == 60)
    assert(mixed.agg(sum("amount")).head().getLong(0)
      == (1L to 60L).map(_ * 10).sum)
    // chained rename: amount -> value reads a-era AND b-era files
    Sources.renameColumnAtomic(spark, path, "amount", "value")
    val chained = Sources.readManifested(spark, path)
    assert(chained.columns.toSeq == Seq("id", "value"))
    assert(chained.agg(sum("value")).head().getLong(0)
      == (1L to 60L).map(_ * 10).sum)
    // collisions and misses are loud
    val e1 = intercept[IllegalArgumentException] {
      Sources.renameColumnAtomic(spark, path, "value", "id")
    }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Sources.renameColumnAtomic(spark, path, "price", "x")
    }
    assert(e2.getMessage.contains("no column"), e2.getMessage)
    // merge-into speaks the CURRENT logical schema over old footers
    val delta = Seq((3L, 999L, "upsert")).toDF("id", "value", "op")
    Sources.mergeAtomic(spark, path, delta, "id")
    assert(Sources.readManifested(spark, path)
      .filter(col("id") === 3L).head().getLong(1) == 999L)
  }

  test("rename of a defaulted column moves the default; drop tombstones it") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_rendef"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 20L).map(i => (i, s"d$i")).toDF("id", "v")
      .repartition(1).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    Sources.addColumnAtomic(spark, path, "score", "bigint", 5L)
    Sources.renameColumnAtomic(spark, path, "score", "quality")
    val got = Sources.readManifested(spark, path)
    assert(got.columns.toSeq == Seq("id", "v", "quality"))
    assert(got.filter(col("id") === 1L).select("quality").head().getLong(0)
      == 5L, "the stored default must follow the rename")
    // dropping the renamed column hides it AND its default
    Sources.dropColumnAtomic(spark, path, "quality")
    assert(Sources.readManifested(spark, path).columns.toSeq == Seq("id", "v"))
  }

  test("time travel serves each version's own schema metadata") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_tt"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 30L).map(i => (i, i * 2L)).toDF("id", "n")
      .repartition(1).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    val v1 = Sources.manifestLogVersions(conf, path).last
    Sources.addColumnAtomic(spark, path, "tag", "string", "old")
    val v2 = Sources.manifestLogVersions(conf, path).last
    Sources.renameColumnAtomic(spark, path, "n", "count_")
    val v3 = Sources.manifestLogVersions(conf, path).last
    Sources.dropColumnAtomic(spark, path, "tag")
    // pre-alter: the original two columns, no default
    assert(Sources.readManifestedAt(spark, path, v1).columns.toSeq
      == Seq("id", "n"))
    // post-ADD: the default is served AT that version (not just head)
    val at2 = Sources.readManifestedAt(spark, path, v2)
    assert(at2.columns.toSeq == Seq("id", "n", "tag"))
    assert(at2.filter(col("id") === 1L).select("tag").head().getString(0)
      == "old")
    // post-RENAME, pre-DROP: renamed name, tag still visible
    val at3 = Sources.readManifestedAt(spark, path, v3)
    assert(at3.columns.toSeq == Seq("id", "count_", "tag"))
    // head: tag dropped
    assert(Sources.readManifested(spark, path).columns.toSeq
      == Seq("id", "count_"))
  }

  test("chained drop/re-add cycles of ONE name across compactions; time travel reads each era") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_cycle"))
    val path = new java.io.File(dir, "tbl").getPath
    // era 0: v carries real per-row values
    (1L to 50L).map(i => (i, s"real$i", i * 2L)).toDF("id", "v", "n")
      .repartition(2).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    val v0 = Sources.manifestLogVersions(conf, path).last
    def vAt(col: String, version: Long, id: Long): String =
      Sources.readManifestedAt(spark, path, version)
        .filter(org.apache.spark.sql.functions.col("id") === id)
        .select(col).head().getString(0)
    // cycle 1: drop -> compact (materializes the tombstone, freeing
    // the name) -> re-add with default A -> append an explicit value
    Sources.dropColumnAtomic(spark, path, "v")
    val vDrop1 = Sources.manifestLogVersions(conf, path).last
    Sources.compactSmallFilesAtomic(spark, path, targetFileBytes = 1L << 30)
    Sources.addColumnAtomic(spark, path, "v", "string", "eraA")
    val vAddA = Sources.manifestLogVersions(conf, path).last
    Sources.insertIntoAtomic(spark, path,
      Seq((100L, 7L, "expA")).toDF("id", "n", "v"))
    val vInsA = Sources.manifestLogVersions(conf, path).last
    // cycle 2: the SAME name again — the stale-neutralization must
    // compose, not just survive one cycle (r16 ADVICE follow-through)
    Sources.dropColumnAtomic(spark, path, "v")
    val vDrop2 = Sources.manifestLogVersions(conf, path).last
    Sources.compactSmallFilesAtomic(spark, path, targetFileBytes = 1L << 30)
    Sources.addColumnAtomic(spark, path, "v", "string", "eraB")
    Sources.insertIntoAtomic(spark, path,
      Seq((200L, 9L, "expB")).toDF("id", "n", "v"))
    // HEAD era: everything compacted before re-add B serves eraB
    // (cycle-1's physical expA was materialized away by compaction 2);
    // only the post-re-add-B append carries real values
    val head = Sources.readManifested(spark, path)
    assert(head.columns.sorted.toSeq == Seq("id", "n", "v"))
    assert(head.count() == 52)
    assert(vAt("v", Sources.manifestLogVersions(conf, path).last, 7L) == "eraB")
    assert(vAt("v", Sources.manifestLogVersions(conf, path).last, 100L) == "eraB",
      "cycle-1 appends were compacted before the cycle-2 re-add: default B")
    assert(vAt("v", Sources.manifestLogVersions(conf, path).last, 200L) == "expB")
    // time travel into each era serves that era's OWN schema + values
    assert(Sources.readManifestedAt(spark, path, v0).columns.toSeq
      == Seq("id", "v", "n"))
    assert(vAt("v", v0, 7L) == "real7", "era 0: the original values")
    assert(Sources.readManifestedAt(spark, path, vDrop1).columns.toSeq
      == Seq("id", "n"), "era drop-1: the column is gone")
    assert(vAt("v", vAddA, 7L) == "eraA", "era A: the first re-add default")
    assert(vAt("v", vInsA, 100L) == "expA",
      "era A append: its REAL value, not the default")
    assert(vAt("v", vInsA, 7L) == "eraA")
    assert(Sources.readManifestedAt(spark, path, vDrop2).columns.toSeq
      == Seq("id", "n"), "era drop-2: gone again")
  }
}
