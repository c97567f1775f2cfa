package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight data profiling for 100 TB jobs — the numbers you read
  * BEFORE running the shuffle, not after it fails.
  *
  * Reference: datar_polars has no profiling surface (closest intent is
  * api/dplyr/count_tally.py, whose exact semantics graft keeps in
  * GraftFrame.countBy); this is the beyond-reference pipeline layer
  * (SURVEY §2.6).
  */
object Profiling {

  /** Join/groupBy-key skew profile: the k hottest keys with their row
    * share, plus global (n_keys, n_rows). A key holding >1% of a
    * 100 TB fact table is the task that runs for hours after every
    * other task finished — this report is how you decide between a
    * plain shuffle join, AQE skew splitting, and
    * [[graft.core.ScaleJoins.saltedJoin]] before burning the cluster
    * time to find out.
    *
    * Shape: per-key counts are ONE partial agg (map-side combine
    * absorbs the skew this exists to find — the hot key arrives at the
    * shuffle as #partitions partial counts, never as raw rows); the
    * global totals are a tiny re-agg; the hot-key cut is
    * TakeOrdered(k), never a full sort. NULL keys profile like any
    * other key (a NULL-heavy foreign-key column IS a skew hazard —
    * null-safe joins hash them to one task). */
  def keySkew(df: DataFrame, key: Column, k: Int = 10): DataFrame = {
    require(k >= 1, s"keySkew: k must be >= 1 (got $k)")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"))
    counts.orderBy(col("cnt").desc, col("key")).limit(k)
      .crossJoin(broadcast(totals))
      .withColumn("share", col("cnt").cast("double") / col("n_rows").cast("double"))
  }
}
