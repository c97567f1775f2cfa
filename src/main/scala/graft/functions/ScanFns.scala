package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Distributed UNGROUPED cumulative aggregates (base/cum.py at
  * whole-frame scale). Grouped cum* is a partitioned window (CumFns);
  * the ungrouped form would need `Window.partitionBy()` — the entire
  * frame through ONE task. These run the classic two-phase parallel
  * prefix scan instead:
  *
  *  1. range-partitioned sort on the declared total order;
  *  2. one pass computing each partition's partial aggregate —
  *     #partitions rows to the driver (the same documented tiny
  *     driver step as iterative-graph convergence counts, NOT a data
  *     collect);
  *  3. broadcast the per-partition prefix offsets and stream each
  *     partition once, emitting the running value per row.
  *
  * Association caveat: a two-phase DOUBLE sum ((p0)+(p1))+… is not
  * bit-identical to a sequential left fold, so [[withCumsum]]
  * accumulates in exact decimal at scale 6 (the repo's Exact.dsum
  * policy) — exact arithmetic has no association, and the result
  * matches any engine's sequential decimal running sum bit for bit.
  * max/min are associative and exact in double already.
  *
  * The sorted RDD is persisted (memory-and-disk) because both phases
  * traverse it; per-partition state is one accumulator.
  */
object ScanFns {

  /** Running sum of `x` over the total order `order`, exact-decimal
    * accumulation, null-skipping like `sum() OVER` (null until the
    * first non-null value). */
  def withCumsum(df: DataFrame, x: Column, order: Seq[Column], as: String): DataFrame =
    prefixScan(df, x, order, as, DoubleType)(
      null,
      (acc, v) => {
        val d = JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)
        if (acc == null) d else acc.asInstanceOf[JBigDecimal].add(d)
      },
      (a, b) =>
        if (a == null) b else if (b == null) a
        else a.asInstanceOf[JBigDecimal].add(b.asInstanceOf[JBigDecimal]),
      acc => if (acc == null) null else acc.asInstanceOf[JBigDecimal].doubleValue)

  /** Running max over the total order (associative — plain doubles). */
  def withCummax(df: DataFrame, x: Column, order: Seq[Column], as: String): DataFrame =
    prefixScan(df, x, order, as, DoubleType)(
      null,
      (acc, v) => if (acc == null) java.lang.Double.valueOf(v)
        else java.lang.Double.valueOf(math.max(acc.asInstanceOf[java.lang.Double], v)),
      (a, b) => if (a == null) b else if (b == null) a
        else java.lang.Double.valueOf(math.max(
          a.asInstanceOf[java.lang.Double], b.asInstanceOf[java.lang.Double])),
      acc => acc)

  /** Running min over the total order. */
  def withCummin(df: DataFrame, x: Column, order: Seq[Column], as: String): DataFrame =
    prefixScan(df, x, order, as, DoubleType)(
      null,
      (acc, v) => if (acc == null) java.lang.Double.valueOf(v)
        else java.lang.Double.valueOf(math.min(acc.asInstanceOf[java.lang.Double], v)),
      (a, b) => if (a == null) b else if (b == null) a
        else java.lang.Double.valueOf(math.min(
          a.asInstanceOf[java.lang.Double], b.asInstanceOf[java.lang.Double])),
      acc => acc)

  /** The two-phase scan skeleton: `zero` is the empty accumulator
    * (null = "no value yet"), `step` absorbs one non-null double,
    * `merge` combines two partition accumulators (must agree with a
    * sequential fold — use exact or associative arithmetic), `emit`
    * renders the accumulator as the output value. */
  private def prefixScan(df: DataFrame, x: Column, order: Seq[Column],
                         as: String, outType: DataType)(
      zero: Any, step: (Any, Double) => Any, merge: (Any, Any) => Any,
      emit: Any => Any): DataFrame = {
    require(order.nonEmpty, "ungrouped cum* needs a declared total order")
    val sorted = df.orderBy(order: _*).withColumn("__sx", x.cast("double"))
    val xi = sorted.schema.fieldIndex("__sx")
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = zero
      it.foreach(r => if (!r.isNullAt(xi)) acc = step(acc, r.getDouble(xi)))
      Iterator.single((i, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(zero)(merge)
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    val outRows = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        if (!r.isNullAt(xi)) acc = step(acc, r.getDouble(xi))
        Row.fromSeq(r.toSeq.init :+ emit(acc))
      }
    }
    val outSchema = StructType(
      sorted.schema.fields.init :+ StructField(as, outType, nullable = true))
    sorted.sparkSession.createDataFrame(outRows, outSchema)
  }
}
