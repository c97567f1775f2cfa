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
  *
  * The final decimal→double conversion is bridged THROUGH A STRING on
  * both engines: DuckDB's direct decimal→double cast converts the
  * unscaled int128 to double and then divides by 10^scale — two
  * roundings — which is wrong by an ulp whenever the unscaled value
  * exceeds 2^53 and lands near a tie, while Java's
  * BigDecimal.doubleValue rounds once, correctly. Both engines parse
  * decimal strings correctly rounded (strtod / Double.parseDouble), so
  * the identical exact decimal yields the identical double. The cast
  * runs once per aggregate group — no per-row cost.
  */
object Exact {
  private def decToDouble(c: Column): Column = c.cast("string").cast("double")
  /** Order-independent exact sum of a double column, as double. */
  def dsum(c: Column): Column = decToDouble(sum(c.cast("decimal(28,6)")))
  /** Exact-sum mean, as double. */
  def davg(c: Column): Column = dsum(c) / count(c).cast("double")
  /** Order-independent exact sum of a PRODUCT of two double columns.
    * Factors are cast to decimal BEFORE multiplying: a large double
    * product (ulp near 1e-6 — e.g. price² ~ 1e10) rounds to 6 decimals
    * ambiguously across engines (Java rounds the shortest decimal repr,
    * DuckDB the exact binary expansion), whereas money-scale factors
    * convert unambiguously and the decimal multiply is then exact.
    * Factor domain: |x| < 1e12 (DECIMAL(18,6)). */
  def dprodSum(x: Column, y: Column): Column =
    decToDouble(sum(x.cast("decimal(18,6)") * y.cast("decimal(18,6)")))
  /** SQL fragments for the DuckDB oracle (same string-bridged cast). */
  def dsumSql(x: String): String =
    s"CAST(CAST(sum(CAST($x AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)"
  def davgSql(x: String): String =
    s"(${dsumSql(x)} / CAST(count($x) AS DOUBLE))"
  // width ≥19 so the DuckDB multiply runs in int128 (width 18 is int64
  // and overflows); Spark's side uses ≤18 so product precision 2·w+1
  // stays ≤38 without scale loss. The VALUES are identical.
  def dprodSumSql(x: String, y: String): String =
    s"CAST(CAST(sum(CAST($x AS DECIMAL(19,6)) * CAST($y AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE)"

  /** 2^40 — the fixed-point grid the dimensionless-aggregate family
    * sums on (ratings, weights, calibration gaps: |term| ≲ 2^13). */
  val Grid40 = 1099511627776.0
  /** One term floored onto the 2^-40 grid — floor of an IEEE double
    * is EXACT in every engine, unlike a double→DECIMAL cast where
    * Spark rounds the shortest string repr and DuckDB the exact
    * binary value (a 1-ulp lottery). Use inside sum(...).over(w) for
    * window contexts; [[gridSum40]] is the plain-aggregate form. */
  def gridFloor40(c: Column): Column =
    floor(c * Grid40 + 0.5).cast("decimal(38,0)")
  /** Order-invariant engine-exact sum on the 2^-40 grid, as double. */
  def gridSum40(c: Column): Column =
    sum(gridFloor40(c)).cast("double") / Grid40
  /** The DuckDB twin of [[gridSum40]]. */
  def gridSum40Sql(x: String): String =
    s"(CAST(sum(CAST(FLOOR(($x) * 1099511627776.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1099511627776.0)"
}
