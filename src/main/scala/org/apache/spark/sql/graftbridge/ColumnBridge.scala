package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.internal._

/** Column internals bridge. Spark 4 moved Column to a lazy ColumnNode
  * representation (for Connect parity) and hid the converters behind
  * `private[sql]`; this shim lives in the sql package namespace to
  * expose the conversions plus a ColumnNode-level tree rewrite that
  * graft's grouped-verb semantics need.
  */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager ColumnNode → catalyst conversion. `expr` wraps lazily in a
    * ColumnNodeExpression that only standard Dataset operators unwrap
    * during analysis; expressions placed inside CUSTOM logical plans
    * must be converted eagerly or they reach execution unresolved. */
  def catalystExpr(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap every aggregate-function call inside `c` in an unordered
    * window partitioned by `groups` — dplyr's grouped mutate/filter.
    * Explicit windows are left untouched; aggregate arguments are not
    * recursed (nested aggs are illegal anyway).
    */
  def overGroups(c: Column, groups: Seq[Column], isAgg: String => Boolean): Column = {
    val spec = WindowSpec(groups.map(_.node), Nil, None)
    def rw(n: ColumnNode): ColumnNode = n match {
      case w: Window => w
      case f: UnresolvedFunction if isAgg(f.functionName.toLowerCase) =>
        Window(f, spec, f.origin)
      case f: UnresolvedFunction => f.copy(arguments = f.arguments.map(rw))
      case a: Alias              => a.copy(child = rw(a.child))
      case t: Cast               => t.copy(child = rw(t.child))
      case cw: CaseWhenOtherwise =>
        cw.copy(branches = cw.branches.map { case (p, v) => (rw(p), rw(v)) },
          otherwise = cw.otherwise.map(rw))
      case ev: UnresolvedExtractValue =>
        ev.copy(child = rw(ev.child), extraction = rw(ev.extraction))
      case so: SortOrder => so.copy(child = rw(so.child))
      case lf: LambdaFunction => lf.copy(function = rw(lf.function))
      case other => other
    }
    Column(rw(c.node))
  }

  /** Rowwise mode (dplyr rowwise + c_across): aggregate CALLS are
    * reinterpreted as per-row reductions over their array-valued
    * argument. `build` returns Some(replacement) for names it handles;
    * other functions recurse into their arguments unchanged. */
  def perRow(c: Column, build: (String, Seq[Column]) => Option[Column]): Column = {
    def rw(n: ColumnNode): ColumnNode = n match {
      case w: Window => w
      case f: UnresolvedFunction =>
        build(f.functionName.toLowerCase, f.arguments.map(a => Column(rw(a)))) match {
          case Some(out) => out.node
          case None      => f.copy(arguments = f.arguments.map(rw))
        }
      case a: Alias              => a.copy(child = rw(a.child))
      case t: Cast               => t.copy(child = rw(t.child))
      case cw: CaseWhenOtherwise =>
        cw.copy(branches = cw.branches.map { case (p, v) => (rw(p), rw(v)) },
          otherwise = cw.otherwise.map(rw))
      case ev: UnresolvedExtractValue =>
        ev.copy(child = rw(ev.child), extraction = rw(ev.extraction))
      case so: SortOrder => so.copy(child = rw(so.child))
      case lf: LambdaFunction => lf.copy(function = rw(lf.function))
      case other => other
    }
    Column(rw(c.node))
  }

  /** Substitute references to previously-defined mutate columns into a
    * later expression (dplyr's sequential mutate semantics) WITHOUT
    * splitting the plan into per-column projections — the caller emits
    * one withColumns, so grouped windows still collapse into a single
    * Window operator. */
  def substitute(c: Column, defs: Map[String, Column]): Column = {
    if (defs.isEmpty) return c
    def rw(n: ColumnNode): ColumnNode = n match {
      case a: UnresolvedAttribute
          if a.nameParts.length == 1 && defs.contains(a.nameParts.head) =>
        defs(a.nameParts.head).node
      case f: UnresolvedFunction => f.copy(arguments = f.arguments.map(rw))
      case a: Alias              => a.copy(child = rw(a.child))
      case t: Cast               => t.copy(child = rw(t.child))
      case w: Window =>
        w.copy(windowFunction = rw(w.windowFunction),
          windowSpec = w.windowSpec.copy(
            partitionColumns = w.windowSpec.partitionColumns.map(rw),
            sortColumns = w.windowSpec.sortColumns.map(so => so.copy(child = rw(so.child)))))
      case cw: CaseWhenOtherwise =>
        cw.copy(branches = cw.branches.map { case (p, v) => (rw(p), rw(v)) },
          otherwise = cw.otherwise.map(rw))
      case ev: UnresolvedExtractValue =>
        ev.copy(child = rw(ev.child), extraction = rw(ev.extraction))
      case so: SortOrder => so.copy(child = rw(so.child))
      case lf: LambdaFunction => lf.copy(function = rw(lf.function))
      case other => other
    }
    Column(rw(c.node))
  }

  /** Extraction for the UNGROUPED mutate/filter path (dplyr's
    * whole-frame aggregate semantics: `mutate(share = x / sum(x))` on
    * an ungrouped frame divides by the GRAND total). Every bare
    * aggregate call is replaced by a reference to a generated column;
    * the caller computes all extracted aggregates in ONE whole-frame
    * agg and broadcast-cross-joins the 1-row result — never a bare
    * aggregate in a projection, never a single-partition window.
    * Aggregate subtrees are deduplicated by their printed form, so
    * `sum(x)` appearing in three expressions is computed once. */
  final class AggExtractor(isAgg: String => Boolean) {
    private val found =
      scala.collection.mutable.LinkedHashMap.empty[String, (String, ColumnNode)]
    def extract(c: Column): Column = Column(rw(c.node))
    /** (generated name, aggregate column) pairs, first-seen order. */
    def aggs: Seq[(String, Column)] =
      found.values.toSeq.map { case (n, node) => (n, Column(node)) }
    def names: Seq[String] = found.values.toSeq.map(_._1)
    private def rw(n: ColumnNode): ColumnNode = n match {
      case w: Window => w
      case f: UnresolvedFunction if isAgg(f.functionName.toLowerCase) =>
        val (name, _) = found.getOrElseUpdate(f.toString, (s"__graft_agg${found.size}", f))
        org.apache.spark.sql.functions.col(name).node
      case f: UnresolvedFunction => f.copy(arguments = f.arguments.map(rw))
      case a: Alias              => a.copy(child = rw(a.child))
      case t: Cast               => t.copy(child = rw(t.child))
      case cw: CaseWhenOtherwise =>
        cw.copy(branches = cw.branches.map { case (p, v) => (rw(p), rw(v)) },
          otherwise = cw.otherwise.map(rw))
      case ev: UnresolvedExtractValue =>
        ev.copy(child = rw(ev.child), extraction = rw(ev.extraction))
      case so: SortOrder => so.copy(child = rw(so.child))
      case lf: LambdaFunction => lf.copy(function = rw(lf.function))
      case other => other
    }
  }

  /** Sort-key normalization at the ColumnNode level (no catalyst
    * round-trip, which can leave evaluable SortOrder wrappers in
    * projections). dplyr/R: NAs last in BOTH directions — rewrite only
    * Spark's default (Ascending, NullsFirst) pairing. */
  def nullsLast(c: Column): Column = c.node match {
    case so: SortOrder
        if so.sortDirection == SortOrder.Ascending && so.nullOrdering == SortOrder.NullsFirst =>
      Column(so.copy(nullOrdering = SortOrder.NullsLast))
    case _: SortOrder => c
    case other => Column(SortOrder(other, SortOrder.Ascending, SortOrder.NullsLast, other.origin))
  }

  /** True inverse of a sort key: flip BOTH direction and null
    * placement, so the reversed order's first row is the original
    * order's last row. */
  def reverseOrder(c: Column): Column = c.node match {
    case so: SortOrder =>
      val dir = if (so.sortDirection == SortOrder.Ascending) SortOrder.Descending
                else SortOrder.Ascending
      val no = if (so.nullOrdering == SortOrder.NullsFirst) SortOrder.NullsLast
               else SortOrder.NullsFirst
      Column(so.copy(sortDirection = dir, nullOrdering = no))
    case other =>
      Column(SortOrder(other, SortOrder.Descending, SortOrder.NullsLast, other.origin))
  }

  /** True if the column's node tree contains an aggregate call. */
  def hasAgg(c: Column, isAgg: String => Boolean): Boolean = {
    def walk(n: ColumnNode): Boolean = n match {
      case _: Window => false // already windowed: not a bare aggregate
      case f: UnresolvedFunction =>
        isAgg(f.functionName.toLowerCase) || f.arguments.exists(walk)
      case a: Alias              => walk(a.child)
      case t: Cast               => walk(t.child)
      case cw: CaseWhenOtherwise =>
        cw.branches.exists { case (p, v) => walk(p) || walk(v) } ||
          cw.otherwise.exists(walk)
      case ev: UnresolvedExtractValue => walk(ev.child) || walk(ev.extraction)
      case so: SortOrder => walk(so.child)
      case _ => false
    }
    walk(c.node)
  }
}
