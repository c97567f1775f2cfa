package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-rank family + lead/lag + cumulatives
  * (reference: /root/reference/datar_polars/api/dplyr/rank.py,
  * lead-lag in funs.py, base/cum.py, base/rank.py).
  *
  * Each helper takes explicit partition/order columns — at scale all
  * helpers used in one verb with the same (partition, order) collapse
  * into a single Window operator (one shuffle + one sort).
  *
  * GROUPED-ONLY by design: an empty partition would be a
  * single-partition global window (the whole frame through ONE task),
  * so every Column form here refuses `part = Nil` loudly. The
  * ungrouped, scale-safe twins are DataFrame transforms built on
  * range-partitioned sort + zipWithIndex / two-phase prefix scans:
  *   - ranks / row ids  → SeqFns.withRankMin / withRankAvg /
  *     withOrderIndex, Tibble.rowidToColumn
  *   - lead / lag / diff → SeqFns.withLead / withLag / withDiff
  *   - cum*             → ScanFns.withCumulatives (withCumsum/max/min)
  *   - rolling          → ScanFns.withRolling
  *   - consecutive_id   → ScanFns.withConsecutiveId
  */
object WindowFns {
  private def w(part: Seq[Column], order: Seq[Column]) = {
    require(part.nonEmpty,
      "ungrouped window collapses the frame onto one task: use the " +
        "scale-safe ungrouped twins (SeqFns.with*, ScanFns.withCum*, " +
        "Tibble.rowidToColumn) or pass a partition")
    Window.partitionBy(part: _*).orderBy(order: _*)
  }

  /** Rolling (sliding-frame) aggregates over the trailing k rows,
    * current row inclusive (slider/zoo-style `roll_*` with partial
    * head windows). One shared shuffle+sort per (part, order) like
    * every other helper here; the frame is evaluated incrementally by
    * WindowExec, not re-scanned per row. Sum/mean go through exact
    * decimal accumulation so results are engine-exact. */
  private def rollW(part: Seq[Column], order: Seq[Column], k: Int) = {
    require(k >= 1, s"rolling window width must be >= 1 (got $k)")
    w(part, order).rowsBetween(-(k - 1), 0)
  }
  def rollSum(x: Column, k: Int, order: Seq[Column], part: Seq[Column] = Nil): Column =
    sum(x.cast("decimal(28,6)")).over(rollW(part, order, k)).cast("double")
  def rollMean(x: Column, k: Int, order: Seq[Column], part: Seq[Column] = Nil): Column =
    rollSum(x, k, order, part) /
      count(lit(1)).over(rollW(part, order, k)).cast("double")
  def rollMin(x: Column, k: Int, order: Seq[Column], part: Seq[Column] = Nil): Column =
    min(x).over(rollW(part, order, k))
  def rollMax(x: Column, k: Int, order: Seq[Column], part: Seq[Column] = Nil): Column =
    max(x).over(rollW(part, order, k))

  def rowNumber(order: Seq[Column], part: Seq[Column] = Nil): Column =
    row_number().over(w(part, order))
  def minRank(order: Seq[Column], part: Seq[Column] = Nil): Column =
    rank().over(w(part, order))
  def denseRank(order: Seq[Column], part: Seq[Column] = Nil): Column =
    dense_rank().over(w(part, order))
  def percentRank(order: Seq[Column], part: Seq[Column] = Nil): Column =
    percent_rank().over(w(part, order))
  def cumeDist(order: Seq[Column], part: Seq[Column] = Nil): Column =
    cume_dist().over(w(part, order))
  def ntileOf(n: Int, order: Seq[Column], part: Seq[Column] = Nil): Column =
    ntile(n).over(w(part, order))

  /** lead/lag with dplyr default semantics: the default applies ONLY
    * past the frame edge, never to genuine nulls in `x` — so the
    * default is passed to the window function itself (via SQL lead/lag,
    * whose third argument is an expression), not coalesced after. */
  def leadBy(x: Column, n: Int, order: Seq[Column], part: Seq[Column] = Nil,
             default: Column = lit(null)): Column =
    call_function("lead", x, lit(n), default).over(w(part, order))
  def lagBy(x: Column, n: Int, order: Seq[Column], part: Seq[Column] = Nil,
            default: Column = lit(null)): Column =
    call_function("lag", x, lit(n), default).over(w(part, order))

  /** dplyr::order_by / with_order (reference:
    * datar_polars/api/dplyr/order_by.py): evaluate an order-sensitive
    * windowed function under an explicit ordering. Our window helpers
    * already take the order as a parameter, so these are the faithful
    * adapter shapes. */
  def orderBy(order: Column*)(f: Seq[Column] => Column): Column = f(order.toSeq)
  def withOrder(order: Column, f: (Column, Seq[Column]) => Column, x: Column): Column =
    f(x, Seq(order))

  /** consecutive_id: new id each time the value (combination) changes
    * along `order` — dplyr::consecutive_id. Null-safe equality so a
    * run of NULLs is one group (dplyr treats NA==NA as same). */
  def consecutiveId(xs: Seq[Column], order: Seq[Column], part: Seq[Column] = Nil): Column = {
    val ww = w(part, order)
    val isFirst = row_number().over(ww) === 1
    val changed = xs.map(x => !(x <=> lag(x, 1).over(ww))).reduce(_ || _)
    sum(when(isFirst || changed, 1).otherwise(0))
      .over(w(part, order).rowsBetween(Window.unboundedPreceding, 0))
  }
}

/** Cumulative functions over an explicit order.
  *
  * GROUPED-ONLY like WindowFns: `part = Nil` would put the whole frame
  * through one task, so it fails loudly. For whole-frame running
  * aggregates use the distributed two-phase prefix scan
  * (ScanFns.withCumsum / withCummax / withCummin). */
object CumFns {
  private def cw(order: Seq[Column], part: Seq[Column]) = {
    require(part.nonEmpty,
      "ungrouped cum* collapses the frame onto one task: use the " +
        "distributed prefix scan (ScanFns.withCumsum/withCummax/withCummin)")
    Window.partitionBy(part: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }
  def cumsum(x: Column, order: Seq[Column], part: Seq[Column] = Nil): Column =
    sum(x).over(cw(order, part))
  def cummax(x: Column, order: Seq[Column], part: Seq[Column] = Nil): Column =
    max(x).over(cw(order, part))
  def cummin(x: Column, order: Seq[Column], part: Seq[Column] = Nil): Column =
    min(x).over(cw(order, part))
  def cummean(x: Column, order: Seq[Column], part: Seq[Column] = Nil): Column =
    avg(x).over(cw(order, part))
  /** cumprod via the native product aggregate over the running frame —
    * multiplies in frame order, so results are bit-identical to any
    * engine that does the same (an exp∘sum∘log recipe would not be). */
  def cumprod(x: Column, order: Seq[Column], part: Seq[Column] = Nil): Column =
    product(x).over(cw(order, part))
  def cumall(p: Column, order: Seq[Column], part: Seq[Column] = Nil): Column =
    min(when(coalesce(p, lit(false)), 1).otherwise(0)).over(cw(order, part)) === 1
  def cumany(p: Column, order: Seq[Column], part: Seq[Column] = Nil): Column =
    max(when(coalesce(p, lit(false)), 1).otherwise(0)).over(cw(order, part)) === 1
}
