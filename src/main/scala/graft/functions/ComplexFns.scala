package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** base-R complex vector ops (reference:
  * /root/reference/datar_polars/api/base/complex.py — arg, conj, re_,
  * im, as_complex, is_complex; modulus via arithm.py's Mod).
  *
  * Spark SQL has no complex dtype, so a complex value is encoded as
  * `struct<re: double, im: double>` — a columnar-friendly fixed-width
  * layout that stays inside whole-stage codegen (every op below is a
  * pure projection over the two fields; no UDFs). */
object ComplexFns {

  /** as.complex(re, im) — build the struct encoding. */
  def asComplex(re: Column, im: Column): Column =
    struct(re.cast("double").as("re"), im.cast("double").as("im"))
  def asComplex(re: Column): Column = asComplex(re, lit(0.0))

  /** Re(z) / Im(z). */
  def reOf(z: Column): Column = z.getField("re")
  def imOf(z: Column): Column = z.getField("im")

  /** is.complex — encoding-level check (non-null struct). */
  def isComplex(z: Column): Column = z.isNotNull

  /** Conj(z). */
  def conj(z: Column): Column = asComplex(reOf(z), -imOf(z))

  /** Mod(z) = |z| (R's Mod on complex; arithm.py routes it here). */
  def modOf(z: Column): Column =
    sqrt(reOf(z) * reOf(z) + imOf(z) * imOf(z))

  /** Arg(z) = atan2(Im, Re). */
  def argOf(z: Column): Column = atan2(imOf(z), reOf(z))

  // ---- arithmetic (R's +-*/ on complex vectors) --------------------------
  def cAdd(a: Column, b: Column): Column =
    asComplex(reOf(a) + reOf(b), imOf(a) + imOf(b))
  def cSub(a: Column, b: Column): Column =
    asComplex(reOf(a) - reOf(b), imOf(a) - imOf(b))
  def cMul(a: Column, b: Column): Column =
    asComplex(reOf(a) * reOf(b) - imOf(a) * imOf(b),
      reOf(a) * imOf(b) + imOf(a) * reOf(b))
  def cDiv(a: Column, b: Column): Column = {
    val d = reOf(b) * reOf(b) + imOf(b) * imOf(b)
    asComplex((reOf(a) * reOf(b) + imOf(a) * imOf(b)) / d,
      (imOf(a) * reOf(b) - reOf(a) * imOf(b)) / d)
  }
}
