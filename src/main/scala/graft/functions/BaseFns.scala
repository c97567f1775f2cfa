package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** base-R arithmetic / stats / trig / special functions as a Column
  * facade (reference: /root/reference/datar_polars/api/base/arithm.py,
  * trig.py, special.py, stats.py). Everything is a codegen'd
  * composition of o.a.s.sql.functions — no UDFs.
  *
  * Variance/SD use the exact-sum formula over decimal casts so results
  * are order-independent (and cross-engine reproducible):
  * var = (Σx² − (Σx)²/n) / (n−1), with Σ over decimal.
  */
object BaseFns {
  // ---- aggregates (exact recipes) ---------------------------------------
  def mean(x: Column): Column = Exact.davg(x)
  def sumExact(x: Column): Column = Exact.dsum(x)
  def varExact(x: Column): Column = {
    val n = count(x).cast("double")
    val s = Exact.dsum(x)
    val ss = Exact.dsum(x * x)
    (ss - s * s / n) / (n - lit(1.0))
  }
  def sdExact(x: Column): Column = sqrt(varExact(x))
  def medianOf(x: Column): Column = percentile_approx(x, lit(0.5), lit(1000000))
  def medianExact(x: Column): Column = expr_percentile(x, 0.5)
  def quantileOf(x: Column, p: Double): Column = expr_percentile(x, p)
  private def expr_percentile(x: Column, p: Double): Column =
    percentile(x, lit(p))
  def weightedMean(x: Column, w: Column): Column =
    Exact.dsum(x * w) / Exact.dsum(w)
  def prodOf(x: Column): Column = product(x)

  // ---- elementwise ------------------------------------------------------
  def pmin(cs: Column*): Column = least(cs: _*)
  def pmax(cs: Column*): Column = greatest(cs: _*)
  def ceiling(x: Column): Column = ceil(x)
  def floorOf(x: Column): Column = floor(x)
  def roundOf(x: Column, digits: Int = 0): Column = round(x, digits)
  def truncOf(x: Column): Column = // toward zero
    when(x < 0, ceil(x)).otherwise(floor(x))
  def signOf(x: Column): Column = signum(x)
  /** signif: round to significant digits (library semantics; excluded
    * from cross-engine oracles — pow/log are not bit-portable). */
  def signifOf(x: Column, digits: Int): Column = {
    val mag = floor(log10(abs(x)))
    val factor = pow(lit(10.0), lit(digits - 1) - mag)
    when(x === 0, lit(0.0)).otherwise(round(x * factor) / factor)
  }
  /** scale: center and reduce by group stats (use inside summarise-
    * windowed mutate for grouped scaling). */
  def scaleExpr(x: Column, meanV: Column, sdV: Column): Column = (x - meanV) / sdV
  def proportionsExpr(x: Column, total: Column): Column = x / total

  // ---- trig / log (delegates; bit-portability not guaranteed) ----------
  def sinpi(x: Column): Column = sin(x * math.Pi)
  def cospi(x: Column): Column = cos(x * math.Pi)
  def tanpi(x: Column): Column = tan(x * math.Pi)

  // ---- special math -----------------------------------------------------
  /** log-gamma via Lanczos(g=7, n=9) — max rel err ~1e-15; pure
    * arithmetic composition, codegen'd. */
  def lgammaOf(xIn: Column): Column = {
    val g = Seq(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    // reflection for x < 0.5: lg(x) = log(pi/sin(pi x)) - lg(1-x)
    def core(x: Column): Column = {
      val xm1 = x - lit(1.0)
      val a = g.tail.zipWithIndex.map { case (c, i) =>
        lit(c) / (xm1 + lit(i + 1.0))
      }.foldLeft(lit(g.head))(_ + _)
      val t = xm1 + lit(7.5)
      lit(0.5 * math.log(2 * math.Pi)) + (xm1 + lit(0.5)) * log(t) - t + log(a)
    }
    val x = xIn.cast("double")
    when(x > 0.5, core(x))
      .otherwise(log(lit(math.Pi) / sin(lit(math.Pi) * x)) - core(lit(1.0) - x))
  }
  def gammaOf(x: Column): Column =
    when(x === floor(x) && x > 0 && x <= 20, factorial((x - 1).cast("int")).cast("double"))
      .otherwise(exp(lgammaOf(x)) * when(x < 0 && floor(x / 2) * 2 === floor(x), -1).otherwise(1))
  def lfactorialOf(n: Column): Column = lgammaOf(n.cast("double") + 1)
  def factorialOf(n: Column): Column = factorial(n.cast("int")).cast("double")
  def chooseOf(n: Column, k: Column): Column =
    round(factorialOf(n) / (factorialOf(k) * factorialOf(n - k)))
  def lchooseOf(n: Column, k: Column): Column =
    lfactorialOf(n) - lfactorialOf(k) - lfactorialOf(n - k)
  def betaOf(a: Column, b: Column): Column = exp(lbetaOf(a, b))
  def lbetaOf(a: Column, b: Column): Column =
    lgammaOf(a) + lgammaOf(b) - lgammaOf(a + b)
  /** digamma via asymptotic series after argument shift (x+6). */
  def digammaOf(xIn: Column): Column = {
    val x = xIn.cast("double") + lit(6.0)
    val inv = lit(1.0) / x
    val inv2 = inv * inv
    val series = log(x) - lit(0.5) * inv -
      inv2 * (lit(1.0 / 12) - inv2 * (lit(1.0 / 120) - inv2 * lit(1.0 / 252)))
    (0 until 6).map(i => lit(1.0) / (xIn + lit(i.toDouble)))
      .foldLeft(series)(_ - _)
  }
}
