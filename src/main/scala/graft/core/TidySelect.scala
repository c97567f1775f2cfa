package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

/** Tidyselect column-selector algebra (reference semantics:
  * /root/reference/datar_polars/api/dplyr/tidyselect.py:1-261).
  * Selectors are evaluated purely against the schema — no data access,
  * no plan nodes — then compiled into one Catalyst Project.
  */
sealed trait Selector {
  /** Resolve to ordered column names against a schema. */
  def resolve(schema: StructType): Seq[String]

  def &(other: Selector): Selector = Selector.And(this, other)
  def |(other: Selector): Selector = Selector.Or(this, other)
  def unary_- : Selector = Selector.Not(this)
}

object Selector {
  private[core] final case class Named(names: Seq[String], strict: Boolean) extends Selector {
    def resolve(schema: StructType): Seq[String] = {
      val have = schema.fieldNames.toSet
      val missing = names.filterNot(have)
      if (strict && missing.nonEmpty)
        throw new IllegalArgumentException(s"Unknown columns: ${missing.mkString(", ")}")
      names.filter(have)
    }
  }
  private[core] final case class Pred(p: String => Boolean) extends Selector {
    def resolve(schema: StructType): Seq[String] = schema.fieldNames.toSeq.filter(p)
  }
  private[core] final case class TypePred(p: DataType => Boolean) extends Selector {
    def resolve(schema: StructType): Seq[String] =
      schema.fields.toSeq.filter(f => p(f.dataType)).map(_.name)
  }
  private[core] final case class And(a: Selector, b: Selector) extends Selector {
    def resolve(schema: StructType): Seq[String] = {
      val bs = b.resolve(schema).toSet
      a.resolve(schema).filter(bs)
    }
  }
  private[core] final case class Or(a: Selector, b: Selector) extends Selector {
    def resolve(schema: StructType): Seq[String] = {
      val as = a.resolve(schema)
      as ++ b.resolve(schema).filterNot(as.toSet)
    }
  }
  private[core] final case class Not(s: Selector) extends Selector {
    def resolve(schema: StructType): Seq[String] = {
      val drop = s.resolve(schema).toSet
      schema.fieldNames.toSeq.filterNot(drop)
    }
  }
  private[core] final case class ValuePred(df: DataFrame, p: Column => Column,
                                           dtypeGuard: DataType => Boolean) extends Selector {
    // Drop columns whose predicate cannot even analyze (type mismatch)
    // — mirrors tidyselect where(fn) returning falsy. Batched: ONE
    // driver-side analyzer probe covers all candidates when they all
    // analyze (the common case — a 3000-column frame costs one
    // invocation, not 3000); on failure, bisect so each bad column
    // costs O(log n) probes instead of hiding the good ones.
    private def analyzable(cands: Seq[String]): Seq[String] =
      if (cands.isEmpty) Nil
      else if (scala.util.Try(
        df.select(cands.map(n => p(col(n)).cast("boolean")): _*)).isSuccess) cands
      else if (cands.length == 1) Nil
      else {
        val (a, b) = cands.splitAt(cands.length / 2)
        analyzable(a) ++ analyzable(b)
      }
    def resolve(schema: StructType): Seq[String] = {
      val cand = analyzable(schema.fields.toSeq
        .filter(f => dtypeGuard(f.dataType) && df.columns.contains(f.name))
        .map(_.name))
      if (cand.isEmpty) Nil
      else {
        val aggs = cand.map(n => p(col(n)).cast("boolean").as(n))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        cand.zipWithIndex.collect {
          case (n, i) if !row.isNullAt(i) && row.getBoolean(i) => n
        }
      }
    }
  }
  private[core] case object LastCol extends Selector {
    def resolve(schema: StructType): Seq[String] = schema.fieldNames.toSeq.takeRight(1)
  }
  private[core] final case class Range(from: String, to: String) extends Selector {
    def resolve(schema: StructType): Seq[String] = {
      val names = schema.fieldNames.toSeq
      val i = names.indexOf(from); val j = names.indexOf(to)
      require(i >= 0 && j >= 0, s"Unknown columns in range $from:$to")
      if (i <= j) names.slice(i, j + 1) else names.slice(j, i + 1).reverse
    }
  }
}

/** User-facing tidyselect helpers. */
object TidySelect {
  import Selector._
  def cols(names: String*): Selector = Named(names, strict = true)
  def allOf(names: Seq[String]): Selector = Named(names, strict = true)
  def anyOf(names: Seq[String]): Selector = Named(names, strict = false)
  def startsWith(prefix: String): Selector = Pred(_.startsWith(prefix))
  def endsWith(suffix: String): Selector = Pred(_.endsWith(suffix))
  def contains(sub: String): Selector = Pred(_.contains(sub))
  def matches(regex: String): Selector = { val r = regex.r; Pred(n => r.findFirstIn(n).isDefined) }
  def numRange(prefix: String, from: Int, to: Int): Selector =
    Named((from to to).map(i => s"$prefix$i"), strict = false)
  def everything: Selector = Pred(_ => true)
  def lastCol: Selector = LastCol
  def range(from: String, to: String): Selector = Range(from, to)
  def where(p: DataType => Boolean): Selector = TypePred(p)
  /** tidyselect `where(fn)` with an arbitrary VALUE predicate
    * (reference tidyselect.py:36–41 applies a function to each
    * column's values and keeps truthy columns). `p` maps a column to a
    * Boolean AGGREGATE (e.g. `c => max(c) <= lit(50)`); every
    * candidate predicate evaluates in ONE 1-row aggregate scan of
    * `df`, and only the n booleans reach the driver — same documented
    * one-scan discovery cost as pivot_wider's name discovery (schema
    * resolution is inherently driver-side). `dtypeGuard` pre-filters
    * candidates by type, like composing with where(is.numeric). */
  def whereAgg(df: DataFrame, p: Column => Column,
               dtypeGuard: DataType => Boolean = _ => true): Selector =
    ValuePred(df, p, dtypeGuard)
}
