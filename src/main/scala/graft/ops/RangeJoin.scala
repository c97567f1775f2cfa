package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — an operator Spark's built-in joins
  * only express as a broadcast-nested-loop or a sort-merge on an
  * inequality, both of which degrade to scanning every (point,
  * interval) pair per key. graft lowers it to the standard binning
  * topology (the same trick Spark's own range-join hints apply on
  * Databricks, and DuckDB's IEJoin avoids natively):
  *
  *   - each interval is exploded to the integer bins it overlaps
  *     (ceil(len/binWidth)+1 rows per interval, a bounded, plan-time
  *     replication factor);
  *   - each point maps to exactly ONE bin;
  *   - the join becomes a hash equi-join on the bin id plus a residual
  *     `point BETWEEN lo AND hi` filter.
  *
  * At 100 TB this shuffles both sides once on the bin key (AQE handles
  * skewed bins) instead of materializing a per-key cross product.
  * Choose `binWidth` ≈ the typical interval length: much smaller
  * multiplies interval replication, much larger packs unrelated rows
  * into one bin and pushes work into the residual filter.
  *
  * Reference surface: datar has no range join (polars `join_where` is
  * the nearest); this is part of graft's pipeline extensions
  * (SURVEY §2.6) alongside the as-of join.
  */
object RangeJoin {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Floor-division to a bin id, exact on longs (integer `/` truncates
    * toward zero; pmod makes it a true floor for negative values). */
  private def bin(c: Column, width: Long): Column =
    ((c - pmod(c, lit(width))) / lit(width)).cast("long")

  /** Bin rows one interval expands to: floor(hi/w) − floor(lo/w) + 1. */
  private def binsPerInterval(loCol: String, hiCol: String, width: Long): Column =
    bin(col(hiCol).cast("long"), width) - bin(col(loCol).cast("long"), width) + lit(1L)

  /** Replication telemetry for the interval side — the knob a 100 TB
    * user reads BEFORE running the join. One tiny aggregate over the
    * intervals (an explicit action; the join itself never runs hidden
    * jobs): how many bin rows the explode produces in total, on
    * average, and in the worst row. avg ≫ 2 means `binWidth` is far
    * below the typical interval length (shrink the blowup by widening
    * the bins); max ≫ avg flags a few huge intervals that will fan out
    * hot bins (consider splitting them or raising binWidth). */
  final case class ReplicationStats(intervals: Long, replicatedRows: Long,
                                    avgBinsPerInterval: Double,
                                    maxBinsPerInterval: Long) {
    override def toString: String =
      f"ReplicationStats(intervals=$intervals, replicatedRows=$replicatedRows, " +
        f"avg=$avgBinsPerInterval%.2f, max=$maxBinsPerInterval)"
  }

  def replicationStats(intervals: DataFrame, loCol: String, hiCol: String,
                       binWidth: Long): ReplicationStats = {
    require(binWidth > 0, s"range join: binWidth must be positive (got $binWidth)")
    val b = binsPerInterval(loCol, hiCol, binWidth)
    val r = intervals.agg(count(lit(1)).as("n"), sum(b).as("tot"), max(b).as("mx")).head()
    val n = r.getLong(0)
    val tot = if (r.isNullAt(1)) 0L else r.getLong(1)
    val mx = if (r.isNullAt(2)) 0L else r.getLong(2)
    ReplicationStats(n, tot, if (n == 0) 0.0 else tot.toDouble / n, mx)
  }

  /** Point-in-interval join on numeric (long-castable) columns.
    * `points` rows join every `intervals` row whose
    * `[loCol, hiCol]` (inclusive) contains `pointCol`.
    * Column names must be disjoint between the two frames. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"range join: binWidth must be positive (got $binWidth)")
    // telemetry, not a job: the actual replication count is one tiny
    // aggregate away via replicationStats — surface the knob loudly so
    // the blowup is visible before a 100 TB run
    log.info(s"range join: binWidth=$binWidth; each interval explodes to " +
      "floor(hi/binWidth)-floor(lo/binWidth)+1 bin rows - call " +
      "RangeJoin.replicationStats(intervals, lo, hi, binWidth) to quantify")
    val p = points.withColumn("__bin", bin(col(pointCol).cast("long"), binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol).cast("long"), binWidth),
        bin(col(hiCol).cast("long"), binWidth))))
    // residual filter compares the ORIGINAL typed columns — the long
    // cast is only for bin assignment (monotonic, so containment in
    // [lo, hi] implies bin containment in [lo_bin, hi_bin])
    p.join(i, Seq("__bin"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }

  /** Interval-OVERLAP join — the interval×interval sibling of
    * [[pointInInterval]] (incident windows × deploy windows, session
    * spans × maintenance spans): `left` rows join every `right` row
    * with `lLo <= rHi AND rLo <= lHi` (inclusive overlap). Same
    * binning topology, with the classic ONE-BIN-OWNERSHIP dedup: both
    * sides explode to the bins they cover and equi-join on the bin
    * id, but a pair sharing many bins must emit ONCE — each
    * overlapping pair is therefore claimed exactly by the bin holding
    * max(lLo, rLo) (the overlap's left edge, covered by BOTH
    * intervals whenever they overlap), a plan-time filter instead of
    * a distinct over the blowup. At 100 TB: one shuffle per side on
    * the bin key, replication bounded by interval-length/binWidth
    * ([[replicationStats]] quantifies each side), residual predicate
    * in codegen — never an all-pairs product. Optional `keys`
    * tightens the shuffle to (keys, bin) — the usual "same user,
    * overlapping spans" shape. Column names must be disjoint apart
    * from `keys`. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      binWidth: Long,
                      keys: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth > 0, s"range join: binWidth must be positive (got $binWidth)")
    val l = left.withColumn("__bin",
      explode(sequence(bin(col(lLo).cast("long"), binWidth),
        bin(col(lHi).cast("long"), binWidth))))
    val r = right.withColumn("__bin",
      explode(sequence(bin(col(rLo).cast("long"), binWidth),
        bin(col(rHi).cast("long"), binWidth))))
    l.join(r, keys :+ "__bin")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") ===
        bin(greatest(col(lLo), col(rLo)).cast("long"), binWidth))
      .drop("__bin")
  }

  /** Timestamp flavor: converts both sides to epoch microseconds
    * (TIMESTAMP_NTZ included — ANSI forbids a direct long cast) and
    * bins `binDays` wide. */
  def pointInIntervalTs(points: DataFrame, pointCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        binDays: Int): DataFrame = {
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    pointInInterval(
      points.withColumn("__p_us", micros(col(pointCol))), "__p_us",
      intervals.withColumn("__lo_us", micros(col(loCol)))
        .withColumn("__hi_us", micros(col(hiCol))), "__lo_us", "__hi_us",
      binDays.toLong * 24L * 3600L * 1000000L)
      .drop("__p_us", "__lo_us", "__hi_us")
  }
}
