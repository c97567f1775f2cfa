package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) joins, the temporal join Spark lacks as a
  * built-in logical operator.
  *
  * Reference behavior: pandas `merge_asof` / DuckDB `ASOF JOIN` — for
  * each left row, attach the single right row with the greatest
  * `on` value <= the left row's (direction = backward), or the least
  * value >= it (forward), within optional `by` equality keys.
  *
  * Spark-first plan: NOT a range join (which Catalyst would execute as
  * a broadcast-nested-loop or an exploding inequality join — quadratic
  * per key). Instead the classic union-merge:
  *
  *   1. union left and right rows into one frame tagged with a side
  *      marker (right = 0, left = 1, so an equal-`on` right row sorts
  *      BEFORE the left row and inclusive semantics hold),
  *   2. one window per `by` partitioning ordered by (`on`, side):
  *      `last(value, ignoreNulls)` over unbounded-preceding..current
  *      carries the most recent right payload forward,
  *   3. keep only left rows.
  *
  * Cost at scale: ONE shuffle on `by` + a linear per-partition sort —
  * the same topology as a groupBy, independent of match distance; no
  * row multiplication, skew handled by AQE like any keyed shuffle.
  * Right rows must be unique per (by, on) — pre-aggregate (e.g.
  * `max_by`) if they are not; the tie among right duplicates is
  * otherwise unspecified, matching DuckDB.
  */
object AsofJoin {

  /** Backward or forward as-of join.
    *
    * @param left      left frame (all its columns are kept)
    * @param right     right frame (must contain `by`, `on`, `valueCols`)
    * @param by        equality keys (may be empty — then a single global
    *                  ordering is required; avoid on large frames)
    * @param on        ordering column name, present on both sides
    *                  (timestamp or numeric)
    * @param valueCols right columns to attach (null where no match)
    * @param direction "backward" (right.on <= left.on, the default) or
    *                  "forward" (right.on >= left.on)
    * @param tolerance optional maximum |left.on - right.on| in the
    *                  column's own difference units (for timestamps, an
    *                  interval column e.g. `expr("INTERVAL 1 HOUR")`);
    *                  matches farther away are nulled out
    */
  def asof(left: DataFrame, right: DataFrame, by: Seq[String], on: String,
           valueCols: Seq[String], direction: String = "backward",
           tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof: direction must be backward|forward (got $direction)")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__asof_side"), "asof: reserved column name")

    val side = "__asof_side"
    val matchedOn = "__asof_on"
    // Common layout: by ++ on ++ side ++ left payload ++ right payload.
    val leftPayload = leftCols.filterNot(c => by.contains(c) || c == on)
    val l = left.select(
      (by :+ on).map(col) ++ Seq(lit(1).as(side)) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(right.schema(on).dataType).as(matchedOn)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (by :+ on).map(col) ++ Seq(lit(0).as(side)) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(on).as(matchedOn)) ++
        valueCols.map(col): _*)

    val ord = direction match {
      case "backward" => Seq(col(on).asc, col(side).asc)
      case "forward"  => Seq(col(on).desc, col(side).asc)
    }
    val w = (if (by.nonEmpty) Window.partitionBy(by.map(col): _*)
             else Window.partitionBy())
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r)
      .withColumn(matchedOn, last(matchedOn, ignoreNulls = true).over(w))
      .withColumns(valueCols.map(c =>
        c -> last(col(c), ignoreNulls = true).over(w)).toMap)
      .filter(col(side) === 1)

    val withinTol = tolerance.fold(filled) { tol =>
      val gap = direction match {
        case "backward" => col(on) - col(matchedOn)
        case "forward"  => col(matchedOn) - col(on)
      }
      filled.withColumns(valueCols.map(c =>
        c -> when(gap <= tol, col(c))).toMap)
    }
    withinTol.select((by :+ on).map(col) ++ leftPayload.map(col) ++
      valueCols.map(col): _*)
  }
}
