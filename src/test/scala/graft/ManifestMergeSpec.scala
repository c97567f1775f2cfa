package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** File-pruned MERGE INTO, transactional INSERT INTO, and the
  * file-grain CDC read (manifestDiff / readManifestedAdded) — the
  * round-15 completion of the manifest protocol. */
class ManifestMergeSpec extends SparkTestBase {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def conf = spark.sessionState.newHadoopConf()

  test("mergeAtomic: file-pruned upsert/delete/insert under one publish") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_merge"))
    val path = new java.io.File(dir, "tbl").getPath
    // range-clustered on id: a keyed delta lands in FEW files — the
    // layout story merge exploits (same as deleteWhereAtomic's)
    (1L to 1000L).map(i => (i, i * 10L, s"u${i % 10}"))
      .toDF("id", "price", "user")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    val before = Sources.readManifest(conf, path).get
    // delta: update 110..115 (price+1), delete 120..124, insert 2001..2003
    val delta =
      ((110L to 115L).map(i => (i, i * 10L + 1L, s"u${i % 10}", "upsert")) ++
       (120L to 124L).map(i => (i, 0L, "x", "delete")) ++
       (2001L to 2003L).map(i => (i, i * 10L, "new", "upsert")))
        .toDF("id", "price", "user", "op")
    val res = Sources.mergeAtomic(spark, path, delta, "id")
    assert(res.updated == 6L && res.deleted == 5L && res.inserted == 3L)
    // the delta's matched keys cluster into ONE of the 8 files
    assert(res.rewritten.length == 1,
      s"clustered delta must rewrite one file: ${res.rewritten}")
    assert(res.appended.length == 1)
    val after = Sources.readManifest(conf, path).get
    assert(before.toSet.intersect(after.toSet).size == 7,
      "files holding no matched key must keep their identity")
    // row-level semantics
    val got = Sources.readManifested(spark, path)
    assert(got.count() == 1000 - 5 + 3)
    assert(got.filter(col("id").between(120L, 124L)).isEmpty)
    val up = got.filter(col("id").between(110L, 115L))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(up == (110L to 115L).map(_ * 10 + 1),
      s"matched upserts must carry the whole-row payload: $up")
    val ins = got.filter(col("id") > 2000L).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(ins == (2001L to 2003L).map(i => (i, "new")))
    // untouched rows verbatim
    assert(got.filter(col("id") === 500L).head().getLong(1) == 5000L)
    // pre-merge state stays time-travelable
    val v1 = Sources.manifestLogVersions(conf, path).head
    assert(Sources.readManifestedAt(spark, path, v1).count() == 1000)
    // contract violations fail loudly
    val dup = Seq((1L, 1L, "a", "upsert"), (1L, 2L, "b", "upsert"))
      .toDF("id", "price", "user", "op")
    val e1 = intercept[IllegalArgumentException] {
      Sources.mergeAtomic(spark, path, dup, "id")
    }
    assert(e1.getMessage.contains("duplicate keys"), e1.getMessage)
    val badOp = Seq((1L, 1L, "a", "replace")).toDF("id", "price", "user", "op")
    val e2 = intercept[IllegalArgumentException] {
      Sources.mergeAtomic(spark, path, badOp, "id")
    }
    assert(e2.getMessage.contains("upsert/delete"), e2.getMessage)
  }

  test("mergeAtomic: a fully-deleted file vanishes; no-op delta publishes nothing") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_merge2"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 100L).map(i => (i, s"v$i"))
      .toDF("id", "v")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    val vBefore = Sources.manifestLogVersions(conf, path).last
    // delete the whole first quarter: its file must vanish, not
    // survive as an empty rewrite
    val delAll = (1L to 25L).map(i => (i, "", "delete")).toDF("id", "v", "op")
    val res = Sources.mergeAtomic(spark, path, delAll, "id")
    assert(res.deleted == 25L && res.rewritten.isEmpty && res.appended.isEmpty)
    assert(Sources.readManifest(conf, path).get.length == 3)
    assert(Sources.readManifested(spark, path).count() == 75)
    // a delta matching nothing and inserting nothing: NO new version
    val vMid = Sources.manifestLogVersions(conf, path).last
    val noop = Seq((9999L, "", "delete")).toDF("id", "v", "op")
    val res2 = Sources.mergeAtomic(spark, path, noop, "id")
    assert(res2.updated == 0 && res2.deleted == 0 && res2.inserted == 0)
    assert(Sources.manifestLogVersions(conf, path).last == vMid,
      "a no-op merge must not publish a new version")
    assert(vMid > vBefore)
  }

  test("insertIntoAtomic appends transactionally; manifestDiff + readManifestedAdded read exactly the delta") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_incr"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 60L).map(i => (i, s"d$i")).toDF("id", "v")
      .repartition(2).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    val v1 = Sources.manifestLogVersions(conf, path).last
    val added = Sources.insertIntoAtomic(spark, path,
      (61L to 80L).map(i => (i, s"d$i")).toDF("id", "v"), numFiles = 2)
    assert(added.length == 2)
    val v2 = Sources.manifestLogVersions(conf, path).last
    Sources.insertIntoAtomic(spark, path,
      (81L to 90L).map(i => (i, s"d$i")).toDF("id", "v"))
    val v3 = Sources.manifestLogVersions(conf, path).last
    // the full table reads whole
    assert(Sources.readManifested(spark, path).count() == 90)
    // file-grain diff: append-only windows list only additions
    val (a12, r12) = Sources.manifestDiff(conf, path, v1, v2)
    assert(a12.toSet == added.toSet && r12.isEmpty)
    // the incremental read is EXACTLY the window's rows
    val incr = Sources.readManifestedAdded(spark, path, v1, v2)
    assert(incr.select(min("id"), max("id"), count(lit(1))).head().toSeq ==
      Seq(61L, 80L, 20L))
    // from v1 to head: both batches
    assert(Sources.readManifestedAdded(spark, path, v1).count() == 30)
    assert(Sources.readManifestedAdded(spark, path, v2, v3).count() == 10)
    // a rewrite inside the window breaks append-only: loud refusal
    Sources.deleteWhereAtomic(spark, path, col("id") === 1L)
    val e = intercept[IllegalArgumentException] {
      Sources.readManifestedAdded(spark, path, v1)
    }
    assert(e.getMessage.contains("not append-only"), e.getMessage)
    // an empty window is a loud no-data signal, not an empty frame
    val e2 = intercept[IllegalArgumentException] {
      Sources.readManifestedAdded(spark, path, v3, v3)
    }
    assert(e2.getMessage.contains("added no files"), e2.getMessage)
  }

  test("expireManifestLog: bounded version log, travelable window intact, expired refusals loud") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_expire"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 20L).map(i => (i, i * 2L)).toDF("id", "n")
      .repartition(1).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    // four appends -> five versions
    for (b <- 1 to 4)
      Sources.insertIntoAtomic(spark, path,
        Seq((100L + b, b.toLong)).toDF("id", "n"))
    val all = Sources.manifestLogVersions(conf, path)
    assert(all.length == 5)
    val expired = Sources.expireManifestLog(conf, path, retainVersions = 2)
    assert(expired == all.dropRight(2), expired.toString)
    assert(Sources.manifestLogVersions(conf, path) == all.takeRight(2))
    // head still reads in full; the retained window stays travelable
    assert(Sources.readManifested(spark, path).count() == 24)
    assert(Sources.readManifestedAt(spark, path, all.last).count() == 24)
    assert(Sources.readManifestedAt(spark, path, all(3)).count() == 23)
    // travel/rollback past the window refuse loudly, naming what's left
    val e = intercept[IllegalArgumentException] {
      Sources.readManifestedAt(spark, path, all.head)
    }
    assert(e.getMessage.contains("no archived version"), e.getMessage)
    // vacuum with the SAME retention agrees with the expired log
    val dead = Sources.vacuumUnreferenced(spark, path, retainVersions = 2)
    assert(dead.isEmpty, // append-only: every old file is still referenced
      s"append-only history must keep all files: $dead")
    // publishes keep working after expiry (version numbering survives)
    Sources.insertIntoAtomic(spark, path, Seq((999L, 9L)).toDF("id", "n"))
    assert(Sources.manifestLogVersions(conf, path).last == all.last + 1)
    assert(Sources.readManifested(spark, path).count() == 25)
  }

  test("optimizeClusteredAtomic: full recluster under one publish; boxes tighten; alters materialize") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_opt"))
    val path = new java.io.File(dir, "tbl").getPath
    // scattered 2-d keys: row-order layout has full-domain boxes
    val n = 4096
    (0 until n).map { i => (i.toLong, (i * 2654435761L) % 64L,
      (i * 40503L) % 64L) }
      .toDF("id", "x", "y")
      .repartition(8).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    Sources.addColumnAtomic(spark, path, "tag", "string", "t0")
    val before = Sources.readManifest(conf, path).get
    val vPre = Sources.manifestLogVersions(conf, path).last
    val (replaced, fresh) =
      Sources.optimizeClusteredAtomic(spark, path, Seq("x", "y"),
        bits = 6, numFiles = 8)
    assert(replaced.toSet == before.toSet && fresh.length == 8)
    assert(Sources.readManifest(conf, path).get.sorted == fresh.sorted)
    // answers preserved, pending default materialized physically
    val got = Sources.readManifested(spark, path)
    assert(got.count() == n)
    assert(got.agg(sum("x")).head().getLong(0) ==
      (0 until n).map(i => (i * 2654435761L) % 64L).sum)
    assert(got.filter(col("tag") === "t0").count() == n)
    assert(fresh.forall(f => footerHas(path, f, "tag")),
      "optimize must materialize the pending default into new footers")
    // clustering actually tightened the per-file boxes: total box
    // area well under files x full domain (row-order would be ~full)
    val spans = Sources.fileStats(spark, path, Seq("x", "y"))
      .filter(col("file").isin(fresh: _*))
      .collect()
      .groupBy(r => (r.getAs[String]("file"), r.getAs[String]("column")))
      .map { case (k, rs) =>
        k -> (rs.map(_.getAs[Double]("min")).min,
          rs.map(_.getAs[Double]("max")).max)
      }
    assert(spans.size == 16, spans.keys.toString) // 8 files x 2 cols
    val area = fresh.map { f =>
      val (x0, x1) = spans((f, "x")); val (y0, y1) = spans((f, "y"))
      (x1 - x0 + 1) * (y1 - y0 + 1)
    }.sum
    assert(area < 8 * 64 * 64 * 0.5,
      s"z-layout must tighten footer boxes: total area $area")
    // old layout stays travelable until vacuum; then reclaims
    assert(Sources.readManifestedAt(spark, path, vPre).count() == n)
    // the dry-run names exactly what the real vacuum then deletes
    val report = Sources.vacuumReport(spark, path, retainVersions = 1)
      .filter(!col("referenced")).collect()
    assert(report.map(_.getString(0)).toSet == before.toSet)
    assert(report.forall(_.getLong(1) > 0L))
    val dead = Sources.vacuumUnreferenced(spark, path, retainVersions = 1)
    assert(dead.toSet == before.toSet)
  }

  private def footerHas(path: String, n: String, c: String): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path, n), conf))
    try rdr.getFooter.getFileMetaData.getSchema.getFields.asScala
      .exists(_.getName == c)
    finally rdr.close()
  }

  test("optimistic publish: a stale snapshot refuses instead of dropping the other job's files") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_occ"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 10L).map(i => (i, i)).toDF("id", "n")
      .repartition(1).write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    // job A reads its snapshot (head v1)...
    val vA = Sources.manifestVersion(conf, path)
    val namesA = Sources.readManifest(conf, path).get
    // ...job B publishes in between (an append)
    Sources.insertIntoAtomic(spark, path, Seq((11L, 11L)).toDF("id", "n"))
    // job A's publish against the stale head REFUSES — last-writer-
    // wins would silently unpublish B's file
    val e = intercept[IllegalStateException] {
      Sources.writeManifest(conf, path, namesA, Map.empty, vA)
    }
    assert(e.getMessage.contains("concurrent publish"), e.getMessage)
    // B's append survives intact
    assert(Sources.readManifested(spark, path).count() == 11)
    // the re-run against the current head succeeds
    val vB = Sources.manifestVersion(conf, path)
    Sources.writeManifest(conf, path,
      Sources.readManifest(conf, path).get, Map.empty, vB)
    assert(Sources.readManifested(spark, path).count() == 11)
  }

  test("mergeAtomic composes with addColumnAtomic: defaults survive the rewrite") {
    import spark.implicits._
    val dir = new java.io.File(tmp("graft_merge3"))
    val path = new java.io.File(dir, "tbl").getPath
    (1L to 40L).map(i => (i, i * 2L)).toDF("id", "n")
      .repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(path)
    Sources.publishManifest(spark, path)
    Sources.addColumnAtomic(spark, path, "score", "bigint", 7L)
    // delta carries the evolved schema (whole-row contract)
    val delta = Seq((5L, 555L, 9L, "upsert"), (41L, 82L, 1L, "upsert"))
      .toDF("id", "n", "score", "op")
    val res = Sources.mergeAtomic(spark, path, delta, "id")
    assert(res.updated == 1L && res.inserted == 1L)
    val got = Sources.readManifested(spark, path).orderBy("id")
    assert(got.filter(col("id") === 5L).head().toSeq == Seq(5L, 555L, 9L))
    assert(got.filter(col("id") === 41L).head().toSeq == Seq(41L, 82L, 1L))
    // untouched old-file rows still read the stored default
    assert(got.filter(col("id") === 30L).head().toSeq == Seq(30L, 60L, 7L))
    // rewritten file's unmatched rows materialized the default too
    assert(got.filter(col("id") === 6L).head().toSeq == Seq(6L, 12L, 7L))
  }
}
