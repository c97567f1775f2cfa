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
    * @param by        equality keys (must be non-empty — the window
    *                  partitions on them; for keyless as-of use
    *                  [[asofGlobal]], which distributes by binning the
    *                  `on` domain instead of collapsing to one partition)
    * @param on        ordering column name, present on both sides
    *                  (timestamp or numeric)
    * @param valueCols right columns to attach (null where no match)
    * @param direction "backward" (right.on <= left.on, the default),
    *                  "forward" (right.on >= left.on), or "nearest"
    *                  (whichever side is closer; equal distances take
    *                  the backward match, like pandas merge_asof).
    *                  Nearest runs BOTH directional windows over the
    *                  same `by` partitioning — still ONE shuffle, two
    *                  per-partition sorts.
    * @param tolerance optional maximum |left.on - right.on| in the
    *                  column's own difference units (for timestamps, an
    *                  interval column e.g. `expr("INTERVAL 1 HOUR")`);
    *                  matches farther away are nulled out
    */
  def asof(left: DataFrame, right: DataFrame, by: Seq[String], on: String,
           valueCols: Seq[String], direction: String = "backward",
           tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asof: direction must be backward|forward|nearest (got $direction)")
    require(by.nonEmpty,
      "asof: empty `by` would sort the entire union in ONE partition; " +
        "use asofGlobal(...), which stays distributed by binning the `on` domain")
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

    val u = l.unionByName(r)
    val filled =
      if (direction == "nearest") {
        // both directional fills over the SAME hash partitioning: one
        // Exchange on `by`, two per-partition sorts. For equal-`on`
        // rows the side ordering keeps the right row inside each
        // frame, so both gaps are 0 and backward wins the tie.
        val wb = Window.partitionBy(by.map(col): _*)
          .orderBy(col(on).asc, col(side).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy(by.map(col): _*)
          .orderBy(col(on).asc, col(side).desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val bOn = "__asof_b_on"; val fOn = "__asof_f_on"
        val pickB = col(fOn).isNull || (col(bOn).isNotNull &&
          (col(on) - col(bOn)) <= (col(fOn) - col(on)))
        u.withColumn(bOn, last(matchedOn, ignoreNulls = true).over(wb))
          .withColumn(fOn, first(matchedOn, ignoreNulls = true).over(wf))
          .withColumns(valueCols.map(c => c ->
            when(pickB, last(col(c), ignoreNulls = true).over(wb))
              .otherwise(first(col(c), ignoreNulls = true).over(wf))).toMap)
          .withColumn(matchedOn, when(pickB, col(bOn)).otherwise(col(fOn)))
          .filter(col(side) === 1)
          .drop(bOn, fOn)
      } else {
        val ord = direction match {
          case "backward" => Seq(col(on).asc, col(side).asc)
          case "forward"  => Seq(col(on).desc, col(side).asc)
        }
        val w = Window.partitionBy(by.map(col): _*)
          .orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn(matchedOn, last(matchedOn, ignoreNulls = true).over(w))
          .withColumns(valueCols.map(c =>
            c -> last(col(c), ignoreNulls = true).over(w)).toMap)
          .filter(col(side) === 1)
      }

    val withinTol = tolerance.fold(filled) { tol =>
      val gap = direction match {
        case "backward" => col(on) - col(matchedOn)
        case "forward"  => col(matchedOn) - col(on)
        case "nearest"  =>
          greatest(col(on) - col(matchedOn), col(matchedOn) - col(on))
      }
      filled.withColumns(valueCols.map(c =>
        c -> when(gap <= tol, col(c))).toMap)
    }
    withinTol.select((by :+ on).map(col) ++ leftPayload.map(col) ++
      valueCols.map(col): _*)
  }

  /** Keyless (global-timeline) as-of join, distributed by binning the
    * `on` domain. `bin` must map the `on` column MONOTONICALLY to a
    * Long bin id — e.g. hourly bins over a timestamp:
    * `c => floor(unix_micros(c) / lit(3600L * 1000000L)).cast("long")`.
    * Pick the width so the bin count stays modest (1e3–1e6): the bin
    * table is the only thing that ever passes through a single
    * partition.
    *
    * Topology (backward; forward is the mirror):
    *   1. right collapses to its latest row per bin — ONE partial-agg
    *      shuffle;
    *   2. each bin's carry-in (the latest right row from any EARLIER
    *      bin) comes from an unpartitioned window over that per-bin
    *      table — #bins rows, caller-bounded, never the data;
    *   3. carry-in rows are unioned with the raw left/right rows and
    *      the usual union-merge fill runs under
    *      Window.partitionBy(bin) — fully distributed, one shuffle on
    *      the bin id, no row multiplication.
    * Right rows must be unique per `on` (pre-aggregate otherwise),
    * same as [[asof]]. */
  def asofGlobal(left: DataFrame, right: DataFrame, on: String,
                 valueCols: Seq[String], direction: String = "backward",
                 tolerance: Option[Column] = None)
                (bin: Column => Column): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asofGlobal: direction must be backward|forward|nearest (got $direction)")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__asof_side"), "asofGlobal: reserved column name")
    val backward = direction == "backward"
    val bkt = "__asof_bin"; val side = "__asof_side"; val matchedOn = "__asof_on"
    val leftPayload = leftCols.filterNot(_ == on)
    def nullsL = leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    def nullsV = valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))

    val l = left.select(
      Seq(bin(col(on)).as(bkt), col(on), lit(1).as(side)) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(right.schema(on).dataType).as(matchedOn)) ++ nullsV: _*)
    val r = right.select(
      Seq(bin(col(on)).as(bkt), col(on), lit(0).as(side)) ++ nullsL ++
        Seq(col(on).as(matchedOn)) ++ valueCols.map(col): _*)

    // 1. per-bin edge rows of the right side (latest for the backward
    // carry, earliest for the forward carry — nearest needs both)
    val edgeStruct = struct(col(on).as(matchedOn) +: valueCols.map(col): _*)
    val perBin = right.select((on +: valueCols).map(col): _*)
      .withColumn(bkt, bin(col(on)))
      .groupBy(col(bkt)).agg(
        max_by(edgeStruct, col(on)).as("__late"),
        min_by(edgeStruct, col(on)).as("__early"))

    // 2. carries per bin over the tiny bin table (left bins included,
    // so left rows in right-empty bins still receive their carry).
    // The carried row keeps its ORIGINAL `on`: coming from an earlier
    // (resp. later) bin it sorts before (resp. after) every in-bin
    // row under the ascending fill ordering by construction.
    val allBins = l.select(col(bkt)).distinct()
      .unionByName(perBin.select(col(bkt))).distinct()
    def carryFrom(edgeCol: String, fromEarlier: Boolean): DataFrame = {
      val cw = Window
        .orderBy(if (fromEarlier) col(bkt).asc else col(bkt).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      allBins.join(perBin, Seq(bkt), "left")
        .withColumn("__carry", last(col(edgeCol), ignoreNulls = true).over(cw))
        .filter(col("__carry").isNotNull)
        .select(
          Seq(col(bkt), col(s"__carry.$matchedOn").as(on), lit(0).as(side)) ++ nullsL ++
            Seq(col(s"__carry.$matchedOn").as(matchedOn)) ++
            valueCols.map(c => col(s"__carry.$c").as(c)): _*)
    }

    // 3. distributed union-merge fill, partitioned on the bin id
    val filled =
      if (direction == "nearest") {
        val wb = Window.partitionBy(col(bkt))
          .orderBy(col(on).asc, col(side).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy(col(bkt))
          .orderBy(col(on).asc, col(side).desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val bOn = "__asof_b_on"; val fOn = "__asof_f_on"
        val pickB = col(fOn).isNull || (col(bOn).isNotNull &&
          (col(on) - col(bOn)) <= (col(fOn) - col(on)))
        l.unionByName(r)
          .unionByName(carryFrom("__late", fromEarlier = true))
          .unionByName(carryFrom("__early", fromEarlier = false))
          .withColumn(bOn, last(col(matchedOn), ignoreNulls = true).over(wb))
          .withColumn(fOn, first(col(matchedOn), ignoreNulls = true).over(wf))
          .withColumns(valueCols.map(c => c ->
            when(pickB, last(col(c), ignoreNulls = true).over(wb))
              .otherwise(first(col(c), ignoreNulls = true).over(wf))).toMap)
          .withColumn(matchedOn, when(pickB, col(bOn)).otherwise(col(fOn)))
          .filter(col(side) === 1)
          .drop(bOn, fOn)
      } else {
        val ord =
          if (backward) Seq(col(on).asc, col(side).asc)
          else Seq(col(on).desc, col(side).asc)
        val w = Window.partitionBy(col(bkt)).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val carry = carryFrom(if (backward) "__late" else "__early", backward)
        l.unionByName(r).unionByName(carry)
          .withColumn(matchedOn, last(col(matchedOn), ignoreNulls = true).over(w))
          .withColumns(valueCols.map(c =>
            c -> last(col(c), ignoreNulls = true).over(w)).toMap)
          .filter(col(side) === 1)
      }

    val withinTol = tolerance.fold(filled) { tol =>
      val gap = direction match {
        case "backward" => col(on) - col(matchedOn)
        case "forward"  => col(matchedOn) - col(on)
        case "nearest"  =>
          greatest(col(on) - col(matchedOn), col(matchedOn) - col(on))
      }
      filled.withColumns(valueCols.map(c =>
        c -> when(gap <= tol, col(c))).toMap)
    }
    withinTol.select(col(on) +: (leftPayload.map(col) ++ valueCols.map(col)): _*)
  }
}
