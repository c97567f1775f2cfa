package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}

/** Grouped-mutate semantics: rewrite aggregate calls inside an
  * expression into per-group window aggregates over the dplyr group
  * columns, so `mutate(share = x / sum(x))` on a grouped frame divides
  * by the group total (reference behavior:
  * /root/reference/datar_polars/api/dplyr/mutate.py — polars
  * `over(groups)`; tests/dplyr/test_mutate_windowed.py).
  *
  * Scale note: every aggregate in the same verb shares one
  * `WindowSpecDefinition(groups)` — Catalyst collapses these into a
  * single Window operator and thus a single hash-partition shuffle,
  * instead of the groupBy+self-join a naive translation would do.
  */
object WindowRewrite {

  /** Unresolved names of SQL aggregate functions we auto-window. */
  private val AggNames: Set[String] = Set(
    "sum", "avg", "mean", "min", "max", "count", "count_distinct",
    "stddev", "stddev_samp", "stddev_pop", "std", "variance", "var_samp",
    "var_pop", "first", "first_value", "last", "last_value",
    "collect_list", "collect_set", "array_agg", "approx_count_distinct",
    "percentile", "percentile_approx", "approx_percentile", "median",
    "corr", "covar_samp", "covar_pop", "skewness", "kurtosis",
    "any_value", "bool_and", "bool_or", "every", "any", "some",
    "product", "sum_distinct", "mode", "max_by", "min_by")

  /** Wrap every aggregate call in `col` in an unordered window over
    * `groupCols`. Explicit windows are left untouched. Implemented on
    * Spark 4's ColumnNode tree (see ColumnBridge).
    */
  def overGroups(col: Column, groupCols: Seq[Column]): Column =
    if (groupCols.isEmpty) col
    else ExpressionUtils.overGroups(col, groupCols, AggNames.contains)

  /** True if the expression contains any aggregate call (used by
    * grouped filter to decide whether a rewrite is needed). */
  def hasAgg(col: Column): Boolean =
    ExpressionUtils.hasAgg(col, AggNames.contains)

  /** Extractor for the UNGROUPED whole-frame aggregate path: dplyr's
    * `mutate(share = x / sum(x))` / `filter(x > mean(x))` with no
    * groups references the GRAND aggregate. The verb extracts every
    * bare aggregate call (deduplicated), computes them all in ONE
    * whole-frame agg, and broadcast-cross-joins the 1-row result —
    * one extra source pass, no bare aggregate in a projection, no
    * single-partition window. */
  def aggExtractor(): ExpressionUtils.AggExtractor =
    new ExpressionUtils.AggExtractor(AggNames.contains)

  /** Rowwise mode (dplyr rowwise():
    * /root/reference/datar_polars/api/dplyr/group_by.py): the aggregate
    * vocabulary is reinterpreted PER ROW over an array-valued argument
    * (c_across), instead of per group. Stays a pure projection — no
    * window, no shuffle. Null elements propagate like R's default
    * na.rm=FALSE (sum/mean of a null element is null). */
  def perRow(c: Column): Column = {
    import org.apache.spark.sql.functions._
    def arrSum(a: Column): Column =
      aggregate(a.cast("array<double>"), lit(0.0), (acc, v) => acc + v)
    // array_min/array_max skip null elements, so guard them explicitly:
    // any null in the row makes the result null, same as sum/mean above.
    def nullIfAnyNull(a: Column, agg: Column => Column): Column =
      when(exists(a, v => v.isNull), lit(null)).otherwise(agg(a))
    ExpressionUtils.perRow(c, (name, args) => name match {
      case "sum"          => Some(arrSum(args.head))
      case "avg" | "mean" => Some(arrSum(args.head) / size(args.head))
      case "min"          => Some(nullIfAnyNull(args.head, array_min))
      case "max"          => Some(nullIfAnyNull(args.head, array_max))
      case "count"        => Some(size(args.head))
      case n if AggNames.contains(n) =>
        throw new IllegalArgumentException(
          s"rowwise: aggregate '$n' has no per-row form " +
            "(supported: sum, mean/avg, min, max, count)")
      case _ => None
    })
  }
}
