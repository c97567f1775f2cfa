package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a keyed corpus table — the apply side of
  * the incremental-crawl loop whose audit side is
  * [[Dedup.corpusDiff]]: a day-2 drop arrives as a change batch
  * (upserts + deletes) and the standing snapshot must advance
  * exactly once. This is Delta/Iceberg MERGE semantics re-expressed
  * as plain relational ops — no table format required, works on any
  * parquet layout.
  */
object Snapshot {

  /** Apply a change batch to a base snapshot keyed by `id`: rows of
    * `changes` with op = "upsert" replace-or-insert their key, rows
    * with op = "delete" remove it. Whole-row upserts (the change
    * batch carries the full payload — the CDC-feed contract); a key
    * appearing multiple times in one batch is the CALLER's bug and is
    * rejected loudly rather than resolved arbitrarily.
    *
    * ONE key-distinct + ONE anti-join + union: the base never
    * shuffles more than its key column, and the op composes with
    * [[BloomPrune]] when the change batch is small against a 100 TB
    * base (bloom-prune the anti-join's probe side). Output: the new
    * snapshot, base schema. */
  def applyChanges(base: DataFrame, changes: DataFrame, id: String,
                   op: String = "op"): DataFrame = {
    val dupKeys = changes.groupBy(col(id)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1L).limit(1).collect()
    require(dupKeys.isEmpty,
      s"applyChanges: change batch carries duplicate keys (e.g. " +
        s"${if (dupKeys.nonEmpty) dupKeys.head.get(0) else ""}) — resolve " +
        "the batch (last-writer-wins upstream) before applying")
    val upserts = changes.filter(col(op) === "upsert").drop(op)
    val changedKeys = changes.select(col(id)).distinct()
    base.join(changedKeys, Seq(id), "left_anti").unionByName(upserts)
  }

  /** ATOMIC on-disk snapshot advance: [[applyChanges]] against the
    * manifested table at `basePath`, with the new snapshot staged
    * invisibly (underscore dir → unique part names moved into the
    * table, unreferenced) and published by ONE manifest rename
    * ([[graft.sources.Sources.writeManifest]]). A concurrent
    * [[graft.sources.Sources.readManifested]] reader sees the day-1
    * snapshot or the day-2 snapshot in full, never a torn mix — the
    * MERGE-commit guarantee a table format gives, on plain parquet.
    * Old files stay for late readers;
    * [[graft.sources.Sources.vacuumUnreferenced]] reclaims them after
    * the caller's retention window. Returns the new snapshot's file
    * names. */
  def applyChangesAtomic(spark: org.apache.spark.sql.SparkSession,
                         basePath: String, changes: DataFrame, id: String,
                         op: String = "op",
                         outFiles: Int = 0): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    graft.sources.Sources.publishManifest(spark, basePath)
    val v0 = graft.sources.Sources.manifestVersion(conf, basePath)
    val base = graft.sources.Sources.readManifested(spark, basePath)
    val next0 = applyChanges(base, changes, id, op)
    val next = if (outFiles > 0) next0.repartition(outFiles) else next0
    val root = new Path(basePath)
    val fs = root.getFileSystem(conf)
    val staging = new Path(basePath,
      s"_snapshot_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    next.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(staging.toString)
    val parts = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq
    require(parts.nonEmpty, s"applyChangesAtomic: staging $staging is empty")
    val newNames = parts.map { p =>
      val dst = new Path(root, p.getName) // per-job UUID names: unique
      require(fs.rename(p, dst),
        s"applyChangesAtomic: rename $p -> $dst failed")
      dst.getName
    }
    graft.sources.Sources.writeManifest(conf, basePath, newNames,
      Map.empty, v0) // publish, optimistically checked
    fs.delete(staging, true)
    newNames
  }
}
