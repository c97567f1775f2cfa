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
    val ss = Exact.dprodSum(x, x) // decimal-first square: see Exact.dprodSum
    (ss - s * s / n) / (n - lit(1.0))
  }
  def sdExact(x: Column): Column = sqrt(varExact(x))
  def medianOf(x: Column): Column = percentile_approx(x, lit(0.5), lit(1000000))
  def medianExact(x: Column): Column = expr_percentile(x, 0.5)
  def quantileOf(x: Column, p: Double): Column = expr_percentile(x, p)
  private def expr_percentile(x: Column, p: Double): Column =
    percentile(x, lit(p))
  def weightedMean(x: Column, w: Column): Column =
    Exact.dprodSum(x, w) / Exact.dsum(w)
  def prodOf(x: Column): Column = product(x)
  /** cov (sample) with the exact-sum recipe — cross-engine identical
    * for inputs whose products fit 6 decimals (see Exact). */
  def covExact(x: Column, y: Column): Column = {
    // complete pairs only (SQL covar_samp semantics): a row where exactly
    // one of x,y is null must not contribute to either marginal sum
    val both = x.isNotNull && y.isNotNull
    val xm = when(both, x)
    val ym = when(both, y)
    val n = count(when(both, 1)).cast("double")
    (Exact.dprodSum(xm, ym) - Exact.dsum(xm) * Exact.dsum(ym) / n) / (n - lit(1.0))
  }
  /** cor (Pearson) from the exact cov/var recipes — marginal sds are
    * likewise computed over complete pairs (SQL corr semantics). */
  def corExact(x: Column, y: Column): Column = {
    val both = x.isNotNull && y.isNotNull
    covExact(x, y) / (sdExact(when(both, x)) * sdExact(when(both, y)))
  }
  /** base::all / any as aggregates (NULL-skipping like na.rm=TRUE). */
  def allOf(p: Column): Column = bool_and(p)
  def anyOf(p: Column): Column = bool_or(p)

  // ---- elementwise ------------------------------------------------------
  def pmin(cs: Column*): Column = least(cs: _*)
  def pmax(cs: Column*): Column = greatest(cs: _*)
  /** R's %% — result takes the sign of the divisor. Spark's pmod is
    * the always-positive modulo, so compute x - floor(x/y)*y. */
  def modOf(x: Column, y: Column): Column = x - floor(x / y) * y
  /** R's %/% — floor division (double result; Spark floor yields long). */
  def intDiv(x: Column, y: Column): Column = floor(x / y).cast("double")
  /** Seeded uniform / normal draws (base::runif / rnorm; sequences are
    * engine-specific — deterministic within Spark, not oracle-able). */
  def runifCol(seed: Long, lo: Double = 0.0, hi: Double = 1.0): Column =
    rand(seed) * (hi - lo) + lo
  def rnormCol(seed: Long, meanV: Double = 0.0, sd: Double = 1.0): Column =
    randn(seed) * sd + meanV
  /** Exponential draw via inverse transform: -ln(U)/rate. */
  def rexpCol(seed: Long, rate: Double = 1.0): Column =
    -log(lit(1.0) - rand(seed)) / rate
  /** Cauchy draw: location + scale * tan(pi * (U - 1/2)). */
  def rcauchyCol(seed: Long, location: Double = 0.0, scale: Double = 1.0): Column =
    lit(location) + lit(scale) * tan(lit(math.Pi) * (rand(seed) - lit(0.5)))
  /** Chi-squared with k df: sum of k squared standard normals. */
  def rchisqCol(seed: Long, df: Int): Column =
    (0 until df).map(i => { val z = randn(seed + i); z * z })
      .reduce(_ + _)
  /** Deterministic per-row uniform in [0,1) from a key column + seed
    * (xxhash64 avalanche). Unlike `rand(seed)`, this is a pure function
    * of the key: safe to reference many times in one expression (a
    * nondeterministic `rand` node re-draws on EVERY evaluation, so an
    * inverse-CDF when-chain over it compares each branch against a
    * different uniform), and reproducible across repartitioning. */
  def hashUnif(key: Column, seed: Long): Column =
    xxhash64(key, lit(seed)).cast("double") / lit(math.pow(2.0, 64)) + lit(0.5)

  /** ENGINE-PORTABLE seeded uniform in [0,1): the first 13 hex digits
    * (52 bits) of md5(seed||key), scaled by 2^-52. Every step is exact
    * integer/dyadic arithmetic, so any engine with md5 reproduces the
    * identical doubles ([[hashUnif]] is cheaper but xxhash64 is
    * Spark-specific; `rand(seed)` is engine-PRNG-specific). */
  def md5Unif(key: Column, seed: Long): Column =
    conv(substring(md5(concat(lit(seed.toString), key.cast("string"))), 1, 13),
      16, 10).cast("double") / lit(4503599627370496.0) // 2^52

  /** Engine-portable seeded standard normal: Box–Muller over two
    * [[md5Unif]] draws (seeds `seed` and `seed+1`). ln/cos/sqrt are
    * transcendental — follow the libm policy (round to ≤6 digits) when
    * hash-comparing across engines. */
  def md5Norm(key: Column, seed: Long): Column = {
    val u1 = md5Unif(key, seed)
    val u2 = md5Unif(key, seed + 1)
    sqrt(lit(-2.0) * log(lit(1.0) - u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** Seeded Poisson draw via inverse CDF over a caller-supplied uniform
    * (use [[hashUnif]] — it must be a deterministic expression; see
    * there for why a raw `rand` breaks the chain). λ is fixed at plan
    * time, so the cumulative table is built driver-side (to machine
    * precision) and the draw is a codegen'd when-chain over one
    * uniform — no per-row loop, no UDF. Bounded support table
    * (P(tail) < 1e-12). */
  /** Poisson inverse-CDF threshold table (driver-side, machine
    * precision, P(tail) < 1e-12). PUBLIC so oracle SQL can emit the
    * identical double literals: the draw is `u < cdf_k` against these
    * exact doubles, so any engine replaying the same thresholds over
    * the same portable uniform reproduces the same integers. */
  def poisCdf(lambda: Double): Seq[(Double, Int)] = {
    require(lambda > 0 && lambda <= 64, "inverse-CDF table sized for small lambda")
    val cdfs = scala.collection.mutable.ArrayBuffer[(Double, Int)]()
    var p = math.exp(-lambda); var cdf = p; var k = 0
    cdfs += ((cdf, 0))
    while (cdf < 1.0 - 1e-12 && k < 256) {
      k += 1; p = p * lambda / k; cdf += p; cdfs += ((cdf, k))
    }
    cdfs.toSeq
  }
  /** Binomial inverse-CDF threshold table (multiplicative pmf
    * recurrence) — public for the same oracle-replay reason. */
  def binomCdf(n: Int, prob: Double): Seq[(Double, Int)] = {
    require(n > 0 && n <= 256 && prob > 0 && prob < 1)
    val q = 1.0 - prob
    val cdfs = scala.collection.mutable.ArrayBuffer[(Double, Int)]()
    var p = math.pow(q, n); var cdf = p
    cdfs += ((cdf, 0))
    var k = 0
    while (k < n && cdf < 1.0 - 1e-12) {
      k += 1; p = p * (n - k + 1) * prob / (k * q); cdf += p; cdfs += ((cdf, k))
    }
    cdfs.toSeq
  }
  private def cdfChain(u: Column, cdfs: Seq[(Double, Int)], cap: Int): Column =
    cdfs.tail.foldLeft(when(u < lit(cdfs.head._1), lit(0))) {
      case (acc, (c, kk)) => acc.when(u < lit(c), lit(kk))
    }.otherwise(lit(math.min(cdfs.last._2 + 1, cap)))

  /** Seeded Poisson draw via inverse CDF over a caller-supplied uniform
    * (use [[hashUnif]]/[[md5Unif]] — it must be a deterministic
    * expression; see hashUnif for why a raw `rand` breaks the chain).
    * λ is fixed at plan time, so the [[poisCdf]] table is built
    * driver-side and the draw is a codegen'd when-chain over one
    * uniform — no per-row loop, no UDF. */
  def rpoisCol(u: Column, lambda: Double): Column = {
    val cdfs = poisCdf(lambda)
    cdfChain(u, cdfs, cdfs.last._2 + 1)
  }
  /** Seeded binomial draw over a caller-supplied uniform, same
    * inverse-CDF construction over [[binomCdf]]. */
  def rbinomCol(u: Column, n: Int, prob: Double): Column =
    cdfChain(u, binomCdf(n, prob), n)
  /** dplyr first/last with an explicit order (datar first2/last2):
    * min_by/max_by aggregates — order-independent of row layout. */
  def first2(x: Column, order: Column): Column = min_by(x, order)
  def last2(x: Column, order: Column): Column = max_by(x, order)

  /** Inverse hyperbolics (base::asinh/acosh/atanh — Spark builtins). */
  def asinhOf(x: Column): Column = asinh(x)
  def acoshOf(x: Column): Column = acosh(x)
  def atanhOf(x: Column): Column = atanh(x)

  // ---- row-wise matrix stats (base verbs row_sums/means/sds) -----------
  def rowSums(cs: Column*): Column = cs.map(_.cast("double")).reduce(_ + _)
  def rowMeans(cs: Column*): Column = rowSums(cs: _*) / cs.length
  /** Sample sd across the given columns, per row. */
  def rowSds(cs: Column*): Column = {
    val m = rowMeans(cs: _*)
    val ss = cs.map(c => (c.cast("double") - m) * (c.cast("double") - m)).reduce(_ + _)
    sqrt(ss / (cs.length - 1))
  }
  def rowMedians(cs: Column*): Column =
    sort_array(array(cs.map(_.cast("double")): _*))
      .getItem((cs.length - 1) / 2) // lower median for even n (documented)
  /** any_na across columns per row. */
  def anyNaRow(cs: Column*): Column = cs.map(_.isNull).reduce(_ || _)
  /** col_medians (reference api/base/verbs.py): exact type-7 median
    * per column, all columns in ONE one-row aggregate scan. Spark's
    * exact `percentile` buffers values per group — fine for the
    * single global group here; per-GROUP medians at 100 TB go through
    * Profiling.exactQuantiles' rowid topology instead. */
  def colMedians(cs: Column*): Seq[Column] = cs.map(medianExact)
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

  /** trigamma via the asymptotic series after a 6-step shift:
    * psi'(x) = sum 1/(x+k)^2 for the shifted terms, then
    * 1/x + 1/(2x^2) + 1/(6x^3) - 1/(30x^5) + 1/(42x^7). */
  def trigammaOf(xIn: Column): Column = {
    val x = xIn.cast("double") + lit(6.0)
    val inv = lit(1.0) / x
    val inv2 = inv * inv
    val series = inv + lit(0.5) * inv2 +
      inv2 * inv * (lit(1.0 / 6) - inv2 * (lit(1.0 / 30) - inv2 * lit(1.0 / 42)))
    (0 until 6).map(i => { val t = xIn.cast("double") + lit(i.toDouble); lit(1.0) / (t * t) })
      .foldLeft(series)(_ + _)
  }
  /** psigamma for deriv 0 (digamma) and 1 (trigamma) — the orders the
    * reference's tests exercise; higher orders are out of scope. */
  def psigammaOf(x: Column, deriv: Int): Column = deriv match {
    case 0 => digammaOf(x)
    case 1 => trigammaOf(x)
    case d => throw new IllegalArgumentException(s"psigamma deriv=$d unsupported (0|1)")
  }

  // ---- Bessel functions (reference: datar base/bessel.py) --------------
  // Abramowitz & Stegun §9 polynomial approximations (public-domain
  // formulas), |err| < 1e-7. Pure arithmetic compositions — codegen'd.
  private def poly(y: Column, cs: Seq[Double]): Column =
    cs.reverse.foldLeft(lit(0.0): Column)((acc, c) => acc * y + lit(c))

  def besselJ0(xIn: Column): Column = {
    val ax = abs(xIn.cast("double"))
    val y = xIn.cast("double") * xIn.cast("double")
    val p = poly(y, Seq(57568490574.0, -13362590354.0, 651619640.7,
      -11214424.18, 77392.33017, -184.9052456))
    val q = poly(y, Seq(57568490411.0, 1029532985.0, 9494680.718,
      59272.64853, 267.8532712, 1.0))
    val z = lit(8.0) / ax; val y2 = z * z
    val xx = ax - lit(0.785398164)
    val p2 = poly(y2, Seq(1.0, -0.1098628627e-2, 0.2734510407e-4,
      -0.2073370639e-5, 0.2093887211e-6))
    val q2 = poly(y2, Seq(-0.1562499995e-1, 0.1430488765e-3,
      -0.6911147651e-5, 0.7621095161e-6, -0.934935152e-7))
    when(ax < 8.0, p / q)
      .otherwise(sqrt(lit(0.636619772) / ax) * (cos(xx) * p2 - z * sin(xx) * q2))
  }

  def besselJ1(xIn: Column): Column = {
    val x = xIn.cast("double"); val ax = abs(x)
    val y = x * x
    val p = x * poly(y, Seq(72362614232.0, -7895059235.0, 242396853.1,
      -2972611.439, 15704.48260, -30.16036606))
    val q = poly(y, Seq(144725228442.0, 2300535178.0, 18583304.74,
      99447.43394, 376.9991397, 1.0))
    val z = lit(8.0) / ax; val y2 = z * z
    val xx = ax - lit(2.356194491)
    val p2 = poly(y2, Seq(1.0, 0.183105e-2, -0.3516396496e-4,
      0.2457520174e-5, -0.240337019e-6))
    val q2 = poly(y2, Seq(0.04687499995, -0.2002690873e-3,
      0.8449199096e-5, -0.88228987e-6, 0.105787412e-6))
    val large = sqrt(lit(0.636619772) / ax) * (cos(xx) * p2 - z * sin(xx) * q2) *
      signum(x)
    when(ax < 8.0, p / q).otherwise(large)
  }

  def besselI0(xIn: Column): Column = {
    val ax = abs(xIn.cast("double"))
    val t = ax / lit(3.75); val y = t * t
    val small = poly(y, Seq(1.0, 3.5156229, 3.0899424, 1.2067492,
      0.2659732, 0.360768e-1, 0.45813e-2))
    val y2 = lit(3.75) / ax
    val large = (exp(ax) / sqrt(ax)) * poly(y2, Seq(0.39894228, 0.1328592e-1,
      0.225319e-2, -0.157565e-2, 0.916281e-2, -0.2057706e-1,
      0.2635537e-1, -0.1647633e-1, 0.392377e-2))
    when(ax < 3.75, small).otherwise(large)
  }

  def besselI1(xIn: Column): Column = {
    val x = xIn.cast("double"); val ax = abs(x)
    val t = ax / lit(3.75); val y = t * t
    val small = ax * poly(y, Seq(0.5, 0.87890594, 0.51498869, 0.15084934,
      0.2658733e-1, 0.301532e-2, 0.32411e-3))
    val y2 = lit(3.75) / ax
    val large = (exp(ax) / sqrt(ax)) * poly(y2, Seq(0.39894228, -0.3988024e-1,
      -0.362018e-2, 0.163801e-2, -0.1031555e-1, 0.2282967e-1,
      -0.2895312e-1, 0.1787654e-1, -0.420059e-2))
    when(ax < 3.75, small).otherwise(large) * signum(x)
  }

  /** K0 (A&S 9.8.5/9.8.6), x > 0. */
  def besselK0(xIn: Column): Column = {
    val x = xIn.cast("double")
    val y = x * x / lit(4.0)
    val small = -log(x / 2.0) * besselI0(x) + poly(y, Seq(-0.57721566,
      0.42278420, 0.23069756, 0.3488590e-1, 0.262698e-2, 0.10750e-3, 0.74e-5))
    val y2 = lit(2.0) / x
    val large = (exp(-x) / sqrt(x)) * poly(y2, Seq(1.25331414, -0.7832358e-1,
      0.2189568e-1, -0.1062446e-1, 0.587872e-2, -0.251540e-2, 0.53208e-3))
    when(x <= 2.0, small).otherwise(large)
  }

  /** K1 (A&S 9.8.7/9.8.8), x > 0. */
  def besselK1(xIn: Column): Column = {
    val x = xIn.cast("double")
    val y = x * x / lit(4.0)
    val small = log(x / 2.0) * besselI1(x) + (lit(1.0) / x) * poly(y, Seq(1.0,
      0.15443144, -0.67278579, -0.18156897, -0.1919402e-1, -0.110404e-2, -0.4686e-4))
    val y2 = lit(2.0) / x
    val large = (exp(-x) / sqrt(x)) * poly(y2, Seq(1.25331414, 0.23498619,
      -0.3655620e-1, 0.1504268e-1, -0.780353e-2, 0.325614e-2, -0.68245e-3))
    when(x <= 2.0, small).otherwise(large)
  }

  /** Y0 (A&S §9.1 rational approximations), x > 0. */
  def besselY0(xIn: Column): Column = {
    val x = xIn.cast("double")
    val y = x * x
    val p = poly(y, Seq(-2957821389.0, 7062834065.0, -512359803.6,
      10879881.29, -86327.92757, 228.4622733))
    val q = poly(y, Seq(40076544269.0, 745249964.8, 7189466.438,
      47447.26470, 226.1030244, 1.0))
    val small = p / q + lit(0.636619772) * besselJ0(x) * log(x)
    val z = lit(8.0) / x; val y2 = z * z
    val xx = x - lit(0.785398164)
    val p2 = poly(y2, Seq(1.0, -0.1098628627e-2, 0.2734510407e-4,
      -0.2073370639e-5, 0.2093887211e-6))
    val q2 = poly(y2, Seq(-0.1562499995e-1, 0.1430488765e-3,
      -0.6911147651e-5, 0.7621095161e-6, -0.934935152e-7))
    val large = sqrt(lit(0.636619772) / x) * (sin(xx) * p2 + z * cos(xx) * q2)
    when(x < 8.0, small).otherwise(large)
  }

  /** Y1 (A&S §9.1 rational approximations), x > 0. */
  def besselY1(xIn: Column): Column = {
    val x = xIn.cast("double")
    val y = x * x
    val p = x * poly(y, Seq(-4.900604943e12, 1.27527439e12, -5.153438139e10,
      7.349264551e8, -4.237922726e6, 8511.937935))
    val q = poly(y, Seq(2.499580570e13, 4.244419664e11, 3.733650367e9,
      2.245904002e7, 1.02042605e5, 354.9632885, 1.0))
    val small = p / q + lit(0.636619772) * (besselJ1(x) * log(x) - lit(1.0) / x)
    val z = lit(8.0) / x; val y2 = z * z
    val xx = x - lit(2.356194491)
    val p2 = poly(y2, Seq(1.0, 0.183105e-2, -0.3516396496e-4,
      0.2457520174e-5, -0.240337019e-6))
    val q2 = poly(y2, Seq(0.04687499995, -0.2002690873e-3,
      0.8449199096e-5, -0.88228987e-6, 0.105787412e-6))
    val large = sqrt(lit(0.636619772) / x) * (sin(xx) * p2 + z * cos(xx) * q2)
    when(x < 8.0, small).otherwise(large)
  }
}
