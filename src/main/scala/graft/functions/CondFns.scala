package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vectorized conditionals (reference:
  * /root/reference/datar_polars/api/dplyr/if_else.py, recode.py,
  * funs.py). All pure Column combinators — codegen'd CASE WHEN.
  */
object CondFns {
  /** dplyr if_else: strict three-valued logic; `missing` fills NULL
    * conditions. */
  def ifElse(cond: Column, yes: Column, no: Column, missing: Column = lit(null)): Column =
    when(cond.isNull, missing).when(cond, yes).otherwise(no)

  /** case_when(pred -> value, ...): first match wins; unmatched → NULL
    * (or `default`). */
  def caseWhen(cases: Seq[(Column, Column)], default: Column = lit(null)): Column =
    cases.foldLeft(Option.empty[Column]) {
      case (None, (p, v))      => Some(when(p, v))
      case (Some(acc), (p, v)) => Some(acc.when(p, v))
    }.map(_.otherwise(default)).getOrElse(default)

  /** case_match: switch on values of x. */
  def caseMatch(x: Column, cases: Seq[(Seq[Any], Column)], default: Column = lit(null)): Column =
    caseWhen(cases.map { case (vals, out) => x.isin(vals: _*) -> out }, default)

  /** recode: old → new value mapping, keep unmatched (dplyr keeps with
    * warning; we keep silently) unless default given. */
  def recode(x: Column, mapping: Map[Any, Any], default: Option[Column] = None): Column =
    caseWhen(mapping.toSeq.map { case (o, n) => (x === lit(o)) -> lit(n) },
      default.getOrElse(x))

  def naIf(x: Column, y: Column): Column = when(x === y, lit(null)).otherwise(x)
  def near(x: Column, y: Column, tol: Double = 1.4901161193847656e-8): Column =
    abs(x - y) < lit(tol)
  def between(x: Column, lo: Column, hi: Column): Column = x >= lo && x <= hi
  def coalesceAll(cs: Column*): Column = coalesce(cs: _*)
}
