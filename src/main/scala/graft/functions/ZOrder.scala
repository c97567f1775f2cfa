package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional data skipping —
  * the lakehouse clustering trick (Delta/Iceberg `OPTIMIZE ZORDER BY`)
  * rebuilt on plain Spark + parquet: interleave the bits of n bucketed
  * sort keys into one Long, range-partition + sort the corpus by it,
  * and every output file's footer min/max box becomes TIGHT in every
  * dimension at once. A point/box predicate on ANY of the z-dimensions
  * then prunes most files at the footer level — where a single-column
  * sort gives tight stats on one dimension only.
  *
  * Why this matters at 100 TB: parquet row-group/file skipping is the
  * only filter that costs zero I/O. A corpus laid out by `(domain,
  * date, quality)` z-value serves selective scans on any of the three
  * with ~|result|-proportional reads, instead of full scans for the
  * two non-leading keys.
  *
  * Everything here is integer-exact and engine-replayable:
  *  - bucketize maps a value into 0..2^bits-1 by integer arithmetic
  *    only — `((v - min) * (2^bits - 1)) div span` — no doubles, so
  *    DuckDB's `//` replays it bit-for-bit (operands are non-negative;
  *    trunc == floor);
  *  - interleave is a fixed chain of shiftright/AND/shiftleft/OR over
  *    codegen'd built-ins (no UDF, no custom expression needed);
  *  - the per-column min/max come from ONE partial-aggregated scan and
  *    round-trip the driver as 2n Longs (driver-tiny by contract).
  *
  * Reference surface: the datar reference has no layout optimizer;
  * this is a graft scale extension alongside bucketing/salting
  * (core/ScaleJoins.scala) and the Hive-partitioned sink.
  */
object ZOrder {

  /** Bit-interleave pre-bucketed non-negative ints (each in
    * 0..2^bits-1) into one Long z-value. Bit j of column i lands at
    * output position `j*n + (n-1-i)` — column 0 owns the MOST
    * significant bit of each round, matching the usual "first z-order
    * column splits first" convention. Pure codegen chain:
    * n*bits shift/mask terms OR'd together. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "interleave: need at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"interleave: n*bits must be in 1..63 (got $n*$bits)")
    val terms =
      for { (c, i) <- cols.zipWithIndex; j <- 0 until bits }
        yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
          j * n + (n - 1 - i))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Map an integer column with known [min, max] onto the 0..2^bits-1
    * grid by integer-only arithmetic (`div` truncation; operands
    * non-negative). Constant columns (span 0) map to bucket 0. */
  def bucketize(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bucketize: bits must be 1..62 (got $bits)")
    val k = (1L << bits) - 1
    val span = math.max(max - min, 1L)
    require(BigInt(span) * k <= BigInt(Long.MaxValue),
      s"bucketize: span $span * $k overflows Long — lower bits or pre-scale")
    // (v - min) * k div span ; `div` is Spark's integral division
    call_function("div",
      (c.cast("long") - lit(min)) * lit(k), lit(span)).cast("long")
  }

  /** Per-column [min, max] of the z-columns: ONE partial-aggregated
    * scan, 2n Longs through the driver (driver-tiny by contract). */
  def bounds(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    require(cols.nonEmpty, "bounds: need at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"__mn_$c"),
          max(col(c).cast("long")).as(s"__mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      // min/max aggregates are NULL on empty input or an all-NULL
      // column; getLong would throw a bare NPE — fail with the cause
      require(!r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1),
        s"bounds: column '$c' has no non-NULL values " +
          "(empty input or all-NULL column) — nothing to bucketize")
      (r.getLong(2 * i), r.getLong(2 * i + 1))
    }
  }

  /** Append the z-value of `cols` against KNOWN per-column bounds as
    * `out` — a pure projection. Values outside a bound (a delta that
    * drifted past the base grid) CLAMP to the edge bucket: clustering
    * quality degrades at the edges, but correctness never does —
    * readers prune on the filter columns' own footer min/max, which
    * are genuine per-file stats regardless of where the z-curve put
    * the row. */
  def withZValueBounded(df: DataFrame, cols: Seq[String],
                        bs: Seq[(Long, Long)], bits: Int,
                        out: String = "zval"): DataFrame = {
    require(cols.size == bs.size, "withZValueBounded: cols/bounds size mismatch")
    val bucketed = cols.zip(bs).map { case (c, (mn, mx)) =>
      bucketize(greatest(least(col(c).cast("long"), lit(mx)), lit(mn)), mn, mx, bits)
    }
    df.withColumn(out, interleave(bucketed, bits))
  }

  /** Append the z-value of `cols` (integer-valued columns) as `out`.
    * One agg scan finds each column's min/max; the z-value itself is
    * a pure projection. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
                 out: String = "zval"): DataFrame =
    withZValueBounded(df, cols, bounds(df, cols), bits, out)

  /** Write `df` as `numFiles` parquet files clustered along the
    * z-curve of `cols`: range-partition on the z-value (one shuffle —
    * the same cost as any single-key sorted write) and sort within
    * each partition, so every file covers one contiguous z-range and
    * its footer min/max are tight on every z-dimension. Readers scan
    * with ordinary filters; parquet footer pruning does the rest. */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String], bits: Int,
                  numFiles: Int,
                  gridBounds: Option[Seq[(Long, Long)]] = None): Unit = {
    require(numFiles >= 1, s"zorderWrite: numFiles must be >= 1")
    // explicit gridBounds: size the grid to the full key DOMAIN (not
    // just this batch's observed range) so later zorderAppend deltas
    // cluster interior, not clamped to edges
    val bs = gridBounds.getOrElse(bounds(df, cols))
    require(bs.size == cols.size, "zorderWrite: gridBounds/cols size mismatch")
    withZValueBounded(df, cols, bs, bits, "__zv")
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop("__zv")
      .write.mode("overwrite").parquet(path)
    CurveMeta.write(df.sparkSession.sessionState.newHadoopConf(),
      path, "_zorder_meta.json", "z", cols, bits, bs)
  }

  /** Incremental z-order maintenance — the append half of a
    * lakehouse `OPTIMIZE ZORDER BY` without rewriting the base: the
    * delta is clustered on the BASE table's stored grid (same cols,
    * bits, bounds from `_zorder_meta.json`) and lands as new sorted
    * files next to the existing ones. Readers scan the directory as
    * before; every file — old or new — still covers one contiguous
    * z-range of the shared curve, so footer pruning keeps working
    * across the whole table. At 100 TB this is the difference
    * between clustering a day's 100 GB delta and re-sorting the
    * 100 TB base: the write cost is delta-sized (one range shuffle of
    * the delta), and a periodic full zorderWrite compaction restores
    * edge-bucket quality if the key domain drifts past the original
    * bounds (out-of-range values clamp — see [[withZValueBounded]]). */
  def zorderAppend(df: DataFrame, path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"zorderAppend: numFiles must be >= 1")
    val (bits, meta) = CurveMeta.read(
      df.sparkSession.sessionState.newHadoopConf(),
      path, "_zorder_meta.json", "zorderAppend")
    val cols = meta.map(_._1)
    val bs = meta.map(m => (m._2, m._3))
    withZValueBounded(df, cols, bs, bits, "__zv")
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop("__zv")
      .write.mode("append").parquet(path)
  }

  /** DuckDB replay of [[bucketize]] + [[interleave]] for oracle SQL:
    * emits the z-value expression over pre-named bucket columns
    * `b0..b{n-1}` (same bit placement). */
  def interleaveSql(n: Int, bits: Int): String = {
    require(n >= 1 && bits >= 1 && n * bits <= 63)
    (for { i <- 0 until n; j <- 0 until bits }
      yield s"(((b$i >> $j) & 1) << ${j * n + (n - 1 - i)})")
      .mkString(" | ")
  }
}
