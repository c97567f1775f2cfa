package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** base-R sequence / vector / set / type functions (reference:
  * /root/reference/datar_polars/api/base/seq.py, sets.py, which.py,
  * table.py, types.py, asis.py).
  */
object SeqFns {
  /** seq(from, to, by) as an array column (explode to rows). */
  def seqArr(from: Column, to: Column, by: Column): Column = sequence(from, to, by)
  def seqLen(n: Column): Column = sequence(lit(1), n)
  def repArr(x: Column, times: Column): Column = array_repeat(x, times.cast("int"))
  /** diff: x - lag(x) over an explicit order. */
  def diffOf(x: Column, order: Seq[Column], part: Seq[Column] = Nil): Column = {
    val base = if (part.nonEmpty) Window.partitionBy(part: _*) else Window.partitionBy()
    x - lag(x, 1).over(base.orderBy(order: _*))
  }
  def revArr(x: Column): Column = reverse(x)
  def sortArr(x: Column): Column = array_sort(x)
  /** base::lengths — element count of a list column. */
  def lengthsOf(x: Column): Column = size(x)
  /** base::is.element / %in% against a literal set. */
  def isElement(x: Column, values: Seq[Any]): Column = x.isin(values: _*)
  /** base::append(x, values, after): insert `values` after 1-based
    * position `after` (0 prepends). Pure slicing — stays in codegen. */
  def appendArr(x: Column, values: Column, after: Int): Column = {
    require(after >= 0, s"append: 'after' must be >= 0 (got $after)")
    concat(slice(x, 1, after), values,
      slice(x, lit(after + 1), greatest(size(x) - after, lit(0))))
  }

  /** base::rank with ties.method="average" (R's default): rank of the
    * first tied row plus half the tie-group span. One window per
    * (part, value). */
  def rankAvg(x: Column, part: Seq[Column] = Nil): Column = {
    val base = if (part.nonEmpty) Window.partitionBy(part: _*) else Window.partitionBy()
    val w = base.orderBy(x.asc)
    val ties = Window.partitionBy((part :+ x): _*)
    rank().over(w) + (count(lit(1)).over(ties) - 1) / 2.0
  }
  /** base::rank with ties.method="min" / "first". */
  def rankMin(x: Column, part: Seq[Column] = Nil): Column = {
    val base = if (part.nonEmpty) Window.partitionBy(part: _*) else Window.partitionBy()
    rank().over(base.orderBy(x.asc))
  }
  /** base::order — the permutation index: position of each row when
    * sorted by `x` (ties broken by `tie`). */
  def orderOf(x: Column, tie: Seq[Column], part: Seq[Column] = Nil): Column = {
    val base = if (part.nonEmpty) Window.partitionBy(part: _*) else Window.partitionBy()
    row_number().over(base.orderBy(x.asc +: tie: _*))
  }
}

object SetFns {
  /** match: position of x in the distinct sorted values of a lookup
    * frame (base::match against a table column). Returned via join. */
  def matchIn(df: DataFrame, x: String, lookup: DataFrame, v: String,
              as: String): DataFrame = {
    val ranked = lookup.select(col(v)).distinct()
      .withColumn(as, row_number().over(Window.orderBy(col(v))))
    df.join(ranked.withColumnRenamed(v, x), Seq(x), "left")
  }
  /** duplicated: true for every occurrence after the first, with
    * "first" defined by an explicit order. */
  def duplicated(keys: Seq[Column], order: Seq[Column]): Column =
    row_number().over(Window.partitionBy(keys: _*).orderBy(order: _*)) > 1
  /** table: contingency counts in long form. */
  def tableOf(df: DataFrame, cols: String*): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
  /** tabulate: counts of integer bins 1..nbins. */
  def tabulate(df: DataFrame, x: Column, nbins: Int): DataFrame = {
    val spark = df.sparkSession
    val bins = spark.range(1, nbins + 1).withColumnRenamed("id", "bin")
    val counts = df.select(x.cast("long").as("bin"))
      .filter(col("bin").between(1, nbins))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    bins.join(counts, Seq("bin"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }
  /** which: 1-based positions (by explicit order) where cond holds. */
  def which(df: DataFrame, cond: Column, order: Seq[Column]): DataFrame =
    df.withColumn("__pos", row_number().over(Window.orderBy(order: _*)))
      .filter(cond).select(col("__pos").as("pos"))
  def whichMin(x: Column, order: Column): Column = min_by(order, x)
  def whichMax(x: Column, order: Column): Column = max_by(order, x)
  /** base::max.col — 1-based index of the row-wise maximum column
    * (ties.method="first"). */
  def maxCol(cs: Column*): Column = {
    val mx = greatest(cs: _*)
    cs.zipWithIndex.foldLeft(lit(null).cast("int")) { case (acc, (c, i)) =>
      coalesce(acc, when(c === mx, lit(i + 1)))
    }
  }
}

object TypeFns {
  def asInteger(x: Column): Column = x.cast("int")
  def asLong(x: Column): Column = x.cast("long")
  def asDouble(x: Column): Column = x.cast("double")
  def asCharacter(x: Column): Column = x.cast("string")
  def asLogical(x: Column): Column = x.cast("boolean")
  def asDate(x: Column): Column = to_date(x)
  def isNa(x: Column): Column = x.isNull || x.isNaN
  def isNull_(x: Column): Column = x.isNull
  def isFinite(x: Column): Column =
    x.isNotNull && !x.isNaN && x =!= Double.PositiveInfinity && x =!= Double.NegativeInfinity
  def isInfinite(x: Column): Column =
    x === Double.PositiveInfinity || x === Double.NegativeInfinity
  def completeCases(cs: Column*): Column = cs.map(_.isNotNull).reduce(_ && _)
  /** cut: bin a numeric column by break points (right-closed like R).
    * labels.length must be breaks.length - 1. */
  def cut(x: Column, breaks: Seq[Double], labels: Seq[String]): Column = {
    val cases = breaks.sliding(2).zip(labels.iterator).map {
      case (Seq(lo, hi), lab) => (x > lo && x <= hi) -> lit(lab)
    }.toSeq
    CondFns.caseWhen(cases, lit(null))
  }
}
