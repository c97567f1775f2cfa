package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

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
  * PERSIST CONTRACT: the scan is inherently 2-pass, so the sorted rows
  * are persisted across both passes at `storage` (default
  * MEMORY_AND_DISK — hot partitions stay in memory, the overflow
  * spills). At 100 TB that persist is a full-dataset cache: budget
  * executor storage for it, or pass `StorageLevel.DISK_ONLY` for wide
  * frames so the scan costs one extra disk round-trip instead of
  * evicting the working set. The alternative — recomputing the sort
  * for pass 2 — costs a second full shuffle; persisting is strictly
  * cheaper whenever the cluster has the disk.
  */
object ScanFns {

  /** One running aggregate's kernel: empty accumulator, non-null-value
    * step, partition-accumulator merge (must agree with a sequential
    * fold — exact or associative arithmetic), output render. */
  final case class ScanOp(zero: Any, step: (Any, Double) => Any,
                          merge: (Any, Any) => Any, emit: Any => Any)

  /** Exact-decimal running sum (scale 6, the repo's Exact.dsum policy). */
  val SumOp: ScanOp = ScanOp(
    null,
    (acc, v) => {
      val d = JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)
      if (acc == null) d else acc.asInstanceOf[JBigDecimal].add(d)
    },
    (a, b) =>
      if (a == null) b else if (b == null) a
      else a.asInstanceOf[JBigDecimal].add(b.asInstanceOf[JBigDecimal]),
    acc => if (acc == null) null else acc.asInstanceOf[JBigDecimal].doubleValue)

  /** Running max (associative — plain doubles). */
  val MaxOp: ScanOp = ScanOp(
    null,
    (acc, v) => if (acc == null) java.lang.Double.valueOf(v)
      else java.lang.Double.valueOf(math.max(acc.asInstanceOf[java.lang.Double], v)),
    (a, b) => if (a == null) b else if (b == null) a
      else java.lang.Double.valueOf(math.max(
        a.asInstanceOf[java.lang.Double], b.asInstanceOf[java.lang.Double])),
    acc => acc)

  /** Running min. */
  val MinOp: ScanOp = ScanOp(
    null,
    (acc, v) => if (acc == null) java.lang.Double.valueOf(v)
      else java.lang.Double.valueOf(math.min(acc.asInstanceOf[java.lang.Double], v)),
    (a, b) => if (a == null) b else if (b == null) a
      else java.lang.Double.valueOf(math.min(
        a.asInstanceOf[java.lang.Double], b.asInstanceOf[java.lang.Double])),
    acc => acc)

  /** Running sum of `x` over the total order `order`, exact-decimal
    * accumulation, null-skipping like `sum() OVER` (null until the
    * first non-null value). */
  def withCumsum(df: DataFrame, x: Column, order: Seq[Column], as: String,
                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    withCumulatives(df, Seq((x, SumOp, as)), order, storage)

  /** Running max over the total order (associative — plain doubles). */
  def withCummax(df: DataFrame, x: Column, order: Seq[Column], as: String,
                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    withCumulatives(df, Seq((x, MaxOp, as)), order, storage)

  /** Running min over the total order. */
  def withCummin(df: DataFrame, x: Column, order: Seq[Column], as: String,
                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    withCumulatives(df, Seq((x, MinOp, as)), order, storage)

  /** N running aggregates in ONE scan: a single range-partitioned sort
    * and two streamed passes cover every (input, op, name) triple —
    * NOT one sort + persist + two passes per aggregate, which is what
    * chaining withCumsum∘withCummax∘withCummin costs (3× the sorts and
    * 3× the Row round-trips; at sf1 the chained d_cum_u form ran ~3×
    * slower than fused). Use this whenever a verb computes several
    * whole-frame cumulatives over the same order. */
  def withCumulatives(df: DataFrame, ops: Seq[(Column, ScanOp, String)],
                      order: Seq[Column],
                      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(order.nonEmpty, "ungrouped cum* needs a declared total order")
    require(ops.nonEmpty, "withCumulatives: no aggregates given")
    val n = ops.length
    val inCols = df.columns.map(df.col) ++
      ops.zipWithIndex.map { case ((x, _, _), i) => x.cast("double").as(s"__sx$i") }
    val sorted = df.select(inCols.toIndexedSeq: _*).orderBy(order: _*)
    val xi = Array.tabulate(n)(i => sorted.schema.fieldIndex(s"__sx$i"))
    val kernels = ops.map(_._2).toArray
    val rdd = sorted.rdd.persist(storage)
    val totals: Array[Array[Any]] = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = Array.tabulate[Any](n)(j => kernels(j).zero)
      it.foreach { r =>
        var j = 0
        while (j < n) {
          if (!r.isNullAt(xi(j))) acc(j) = kernels(j).step(acc(j), r.getDouble(xi(j)))
          j += 1
        }
      }
      Iterator.single((i, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(Array.tabulate[Any](n)(j => kernels(j).zero)) {
      (a, b) => Array.tabulate[Any](n)(j => kernels(j).merge(a(j), b(j)))
    }
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    val outRows = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = bc.value(i).clone()
      it.map { r =>
        val base = r.toSeq.dropRight(n)
        val outs = new Array[Any](n)
        var j = 0
        while (j < n) {
          if (!r.isNullAt(xi(j))) acc(j) = kernels(j).step(acc(j), r.getDouble(xi(j)))
          outs(j) = kernels(j).emit(acc(j))
          j += 1
        }
        Row.fromSeq(base ++ outs)
      }
    }
    val outSchema = StructType(
      sorted.schema.fields.dropRight(n) ++
        ops.map { case (_, _, as) => StructField(as, DoubleType, nullable = true) })
    sorted.sparkSession.createDataFrame(outRows, outSchema)
  }

  /** Whole-frame "fill down" — the running LAST NON-NULL value of each
    * column in `cols` under the total order, written IN PLACE (types
    * preserved, schema unchanged). Backs tidyr::fill's ungrouped form
    * (Tidyr.fillGlobal) through the same two-phase scan: last-non-null
    * is an associative accumulator (merge = "right wins unless null"),
    * so each partition contributes one value per column and the
    * carry-in broadcast is #partitions × #cols scalars. All columns
    * fill in ONE sort + two passes, not one scan per column. */
  def withFillLast(df: DataFrame, cols: Seq[String], order: Seq[Column],
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(order.nonEmpty, "ungrouped fill needs a declared total order")
    require(cols.nonEmpty, "fill: no columns selected")
    val sorted = df.orderBy(order: _*)
    val idxs = cols.map(sorted.schema.fieldIndex).toArray
    val rdd = sorted.rdd.persist(storage)
    val partLast: Array[Array[Any]] = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = Array.fill[Any](idxs.length)(null)
      it.foreach { r =>
        var j = 0
        while (j < idxs.length) {
          val v = r.get(idxs(j)); if (v != null) acc(j) = v; j += 1
        }
      }
      Iterator.single((i, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partLast.scanLeft(Array.fill[Any](idxs.length)(null)) { (a, b) =>
      Array.tabulate(idxs.length)(j => if (b(j) != null) b(j) else a(j))
    }
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    val outRows = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = bc.value(i).clone()
      it.map { r =>
        val vals = r.toSeq.toArray
        var j = 0
        while (j < idxs.length) {
          val v = vals(idxs(j))
          if (v != null) acc(j) = v else vals(idxs(j)) = acc(j)
          j += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    sorted.sparkSession.createDataFrame(outRows, sorted.schema)
  }

}
