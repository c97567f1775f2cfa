package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric recipes.
  *
  * Doubles summed in different orders differ in the last ulps, so a
  * hash-compared oracle needs order-independent aggregates: casting to
  * decimal makes the sum exact (and thus identical between Spark and
  * the DuckDB oracle), and IEEE-754 scalar ops on identical inputs are
  * bit-identical everywhere. Per-row arithmetic therefore needs no
  * treatment; only aggregates do. Overflow margin: decimal(28,6)
  * sums hold ~1e21 — far beyond 100 TB-scale totals of price-sized
  * values.
  */
object Exact {
  /** Order-independent exact sum of a double column, as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")
  /** Exact-sum mean, as double. */
  def davg(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double") / count(c).cast("double")
  /** SQL fragments for the DuckDB oracle. */
  def dsumSql(x: String): String = s"CAST(sum(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
  def davgSql(x: String): String =
    s"(CAST(sum(CAST($x AS DECIMAL(28,6))) AS DOUBLE) / CAST(count($x) AS DOUBLE))"
}
