package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** bind_rows / bind_cols and frame-level set operations
  * (reference: /root/reference/datar_polars/api/dplyr/bind.py, sets.py).
  */
object Bind {
  /** Schema-unioning row bind: missing columns become NULL, like
    * dplyr::bind_rows. One UnionAll node, no shuffle. */
  def rows(frames: DataFrame*): DataFrame = {
    val allCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      frames.flatMap(_.schema.fields.map(f => f.name -> f.dataType))
        .foldLeft(Vector.empty[(String, org.apache.spark.sql.types.DataType)]) {
          case (acc, (n, t)) => if (acc.exists(_._1 == n)) acc else acc :+ (n -> t)
        }
    frames.map { d =>
      val have = d.columns.toSet
      d.select(allCols.map { case (n, t) =>
        if (have(n)) d.col(n) else lit(null).cast(t).as(n)
      }: _*)
    }.reduce(_.unionByName(_))
  }

  /** Positional index 1..n over the frame's current partition order:
    * per-partition offsets via zipWithIndex (distributed; no
    * single-partition window) — the unordered form of
    * Tibble.rowidToColumn, sharing its InternalRow path. */
  private def indexed(d: DataFrame, idx: String): DataFrame =
    Tibble.rowidToColumn(d, Nil, idx)

  /** Column bind by position. Requires equal row counts; positions are
    * each frame's current order (deterministic only if the caller
    * sorted first — positional semantics inherently need a total
    * order; prefer keyed joins at scale). Distributed zipWithIndex on
    * both sides, then one join on the index. */
  def cols(a: DataFrame, b: DataFrame): DataFrame =
    indexed(a, "__i").join(indexed(b, "__i"), Seq("__i"), "inner")
      .orderBy("__i").drop("__i")

  /** Deterministic positional bind: explicit total orders on each side
    * define the positions (distributed sort + partition-offset ids on
    * each side, one index join). */
  def colsOrdered(a: DataFrame, aOrder: Seq[Column],
                  b: DataFrame, bOrder: Seq[Column]): DataFrame =
    indexed(a.orderBy(aOrder: _*), "__i")
      .join(indexed(b.orderBy(bOrder: _*), "__i"), Seq("__i"), "inner")
      .orderBy("__i").drop("__i")
}

/** Frame set ops with dplyr/base-R semantics (sets.py). */
object Sets {
  def union(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b).distinct()
  def unionAll(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def setdiff(a: DataFrame, b: DataFrame): DataFrame = a.except(b)
  /** rows in exactly one of a, b (distinct). */
  def symdiff(a: DataFrame, b: DataFrame): DataFrame =
    a.except(b).unionByName(b.except(a)).distinct()
  def setequal(a: DataFrame, b: DataFrame): Boolean =
    a.except(b).isEmpty && b.except(a).isEmpty
}

/** rows_* verbs: keyed row manipulation
  * (reference: /root/reference/datar_polars/api/dplyr/rows.py).
  * All are single-join plans on the key — broadcast the (typically
  * small) patch side at scale. */
object RowsVerbs {
  private def valueCols(x: DataFrame, by: Seq[String]): Seq[String] =
    x.columns.toSeq.filterNot(by.contains)

  /** Insert rows from y whose keys are absent in x. */
  def insert(x: DataFrame, y: DataFrame, by: Seq[String]): DataFrame =
    x.unionByName(y.join(x.select(by.map(x.col): _*).distinct(), by, "left_anti"),
      allowMissingColumns = true)

  /** Update value columns of x from y for matching keys. */
  def update(x: DataFrame, y: DataFrame, by: Seq[String]): DataFrame = {
    val vals = valueCols(y, by)
    val yR = vals.foldLeft(y)((d, c) => d.withColumnRenamed(c, c + "__y"))
    val j = x.join(broadcast(yR), by, "left")
    val out = x.columns.toSeq.map { c =>
      if (vals.contains(c)) coalesce(col(c + "__y"), col(c)).as(c) else col(c)
    }
    j.select(out: _*)
  }

  /** Patch: like update but only fills NULLs in x. */
  def patch(x: DataFrame, y: DataFrame, by: Seq[String]): DataFrame = {
    val vals = valueCols(y, by)
    val yR = vals.foldLeft(y)((d, c) => d.withColumnRenamed(c, c + "__y"))
    val j = x.join(broadcast(yR), by, "left")
    val out = x.columns.toSeq.map { c =>
      if (vals.contains(c)) coalesce(col(c), col(c + "__y")).as(c) else col(c)
    }
    j.select(out: _*)
  }

  /** Upsert = update matches + insert new keys. */
  def upsert(x: DataFrame, y: DataFrame, by: Seq[String]): DataFrame =
    insert(update(x, y, by), y, by)

  /** Delete keys of y from x. */
  def delete(x: DataFrame, y: DataFrame, by: Seq[String]): DataFrame =
    x.join(y.select(by.map(y.col): _*).distinct(), by, "left_anti")

  def append(x: DataFrame, y: DataFrame): DataFrame =
    x.unionByName(y, allowMissingColumns = true)
}
