package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustered layout — the locality upgrade over the
  * Morton/Z curve (functions/ZOrder.scala) for multi-dimensional data
  * skipping. Both curves visit every cell of the bucketized grid once
  * and feed the same range-partitioned sorted write; the difference is
  * adjacency: consecutive Z indices periodically jump across the grid
  * (the curve's diagonal seams), so a file covering one z-range can
  * carry a min/max box much wider than its cell count. Consecutive
  * Hilbert indices are ALWAYS adjacent cells (one step in exactly one
  * dimension — LayoutSpec proves it exhaustively), so per-file boxes
  * track the cells they actually hold and box queries open fewer
  * files. This is the layout modern lakehouse clustering engines pick
  * over Z-order at high file counts; at 100 TB the write cost is
  * identical to zorderWrite (one range shuffle on a codegen'd curve
  * key), and everything downstream is plain parquet footer pruning —
  * no reader-side support needed.
  *
  * The curve index itself is graft.plans.LayoutKernels (Skilling's
  * transpose algorithm) spliced into whole-stage codegen; bucketize /
  * bounds / grid metadata are shared with ZOrder, including
  * [[hilbertAppend]]'s clamp-to-edge semantics for deltas that drift
  * past the stored grid.
  *
  * Reference surface: like Z-order, a graft scale extension — the
  * datar reference has no layout optimizer.
  */
object Hilbert {

  private def fromExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)

  /** Hilbert index of pre-bucketed non-negative ints (each in
    * 0..2^bits-1) as one Long. Same MSB-first coordinate convention as
    * `ZOrder.interleave` (column 0 splits first). */
  def hilbertValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "hilbertValue: need at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"hilbertValue: n*bits must be in 1..63 (got $n*$bits)")
    fromExpr(graft.plans.HilbertIndexExpr(
      toExpr(array(cols.map(_.cast("long")): _*)), bits))
  }

  /** Append the Hilbert value of `cols` against KNOWN per-column
    * bounds as `out` — a pure codegen projection. Out-of-bound values
    * clamp to the edge bucket (same contract as
    * `ZOrder.withZValueBounded`: clustering degrades at the edges,
    * answers never do). */
  def withHValueBounded(df: DataFrame, cols: Seq[String],
                        bs: Seq[(Long, Long)], bits: Int,
                        out: String = "hval"): DataFrame = {
    require(cols.size == bs.size, "withHValueBounded: cols/bounds size mismatch")
    val bucketed = cols.zip(bs).map { case (c, (mn, mx)) =>
      ZOrder.bucketize(
        greatest(least(col(c).cast("long"), lit(mx)), lit(mn)), mn, mx, bits)
    }
    df.withColumn(out, hilbertValue(bucketed, bits))
  }

  /** One-scan-bounds convenience form (mirrors `ZOrder.withZValue`). */
  def withHValue(df: DataFrame, cols: Seq[String], bits: Int,
                 out: String = "hval"): DataFrame =
    withHValueBounded(df, cols, ZOrder.bounds(df, cols), bits, out)

  /** Write `df` as `numFiles` parquet files clustered along the
    * Hilbert curve of `cols` — the same shape as `ZOrder.zorderWrite`
    * (one range shuffle, sort within partitions, plain parquet out,
    * grid metadata persisted for [[hilbertAppend]]). */
  def hilbertWrite(df: DataFrame, path: String, cols: Seq[String], bits: Int,
                   numFiles: Int,
                   gridBounds: Option[Seq[(Long, Long)]] = None): Unit = {
    require(numFiles >= 1, s"hilbertWrite: numFiles must be >= 1")
    val bs = gridBounds.getOrElse(ZOrder.bounds(df, cols))
    require(bs.size == cols.size, "hilbertWrite: gridBounds/cols size mismatch")
    withHValueBounded(df, cols, bs, bits, "__hv")
      .repartitionByRange(numFiles, col("__hv"))
      .sortWithinPartitions("__hv")
      .drop("__hv")
      .write.mode("overwrite").parquet(path)
    CurveMeta.write(df.sparkSession.sessionState.newHadoopConf(),
      path, "_hilbert_meta.json", "hilbert", cols, bits, bs)
  }

  /** Incremental Hilbert maintenance: cluster a delta on the base
    * table's stored grid and append it as new sorted files — the same
    * delta-sized-write contract as `ZOrder.zorderAppend`. */
  def hilbertAppend(df: DataFrame, path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"hilbertAppend: numFiles must be >= 1")
    val (bits, meta) = CurveMeta.read(
      df.sparkSession.sessionState.newHadoopConf(),
      path, "_hilbert_meta.json", "hilbertAppend")
    withHValueBounded(df, meta.map(_._1), meta.map(m => (m._2, m._3)), bits, "__hv")
      .repartitionByRange(numFiles, col("__hv"))
      .sortWithinPartitions("__hv")
      .drop("__hv")
      .write.mode("append").parquet(path)
  }
}
