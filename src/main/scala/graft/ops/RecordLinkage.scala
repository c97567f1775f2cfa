package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
  * 1969, JASA) — the DECISION layer on top of the blocking/distance
  * machinery in [[FuzzyJoin]]: given candidate pairs with F binary
  * field-agreement comparisons, learn per-field m-probabilities
  * (P(agree | same entity)), u-probabilities (P(agree | different
  * entities)) and the match prior by EM over the 2^F agreement-
  * pattern counts, then score each PATTERN with its match posterior.
  * This turns "edit distance ≤ 1" heuristics into calibrated
  * evidence: a rare agreement (same rare name) weighs more than a
  * common one (same country), with the weights LEARNED from the
  * corpus itself — no labels needed.
  *
  * Scale + exactness contract:
  * - The fact-sized work is ONE keyed partial agg to the ≤ 2^F ≤ 64
  *   pattern counts (F ≤ 6 enforced); the EM runs driver-side on
  *   that tiny table (the Plackett–Luce driver-unroll precedent) for
  *   a FIXED iteration count.
  * - Every EM quantity is a fixed-order chain of single IEEE ops on
  *   the exact integer counts: patterns fold in ascending id order,
  *   fields in ascending index order, updates clamp to
  *   [1e-6, 1−1e-6] via max/min (no exact-0 products, no NaN), and
  *   the DuckDB oracle GENERATES the identical chain (the pacf
  *   generator-twin discipline), so values replay bit-for-bit.
  *
  * Output: one row per OBSERVED pattern, ascending pattern string
  * (fields order, '1' = agree): (pattern, n, posterior, p_match,
  * m_1..m_F, u_1..u_F). posterior is the final-parameter match
  * probability of that pattern — the per-pair link score a caller
  * joins back onto the candidate pairs. */
object RecordLinkage {

  val Eps = 0.000001

  private def clamp(x: Double): Double =
    math.min(math.max(x, Eps), 1.0 - Eps)

  /** EM over pattern counts. `counts(g)` = pairs with pattern id g
    * (bit f set iff field f agrees); returns (p, m, u) after `iters`
    * rounds from the documented (0.9, 0.1, 0.1) start. Fold orders
    * are part of the contract — the SQL generator mirrors them. */
  private[ops] def em(counts: IndexedSeq[Long], nFields: Int,
                      iters: Int): (Double, Array[Double], Array[Double]) = {
    val nPat = 1 << nFields
    var p = 0.1
    var m = Array.fill(nFields)(0.9)
    var u = Array.fill(nFields)(0.1)
    val cD = counts.map(_.toDouble)
    def wOf(g: Int, pp: Double, mm: Array[Double],
            uu: Array[Double]): Double = {
      var num = pp
      var den = 1.0 - pp
      var f = 0
      while (f < nFields) {
        if (((g >> f) & 1) == 1) { num *= mm(f); den *= uu(f) }
        else { num *= 1.0 - mm(f); den *= 1.0 - uu(f) }
        f += 1
      }
      num / (num + den)
    }
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(nPat)(g => wOf(g, p, m, u))
      // ascending-g left folds — the generator's parenthesization
      var t = 0.0; var v = 0.0; var nTot = 0.0
      var g = 0
      while (g < nPat) {
        t += w(g) * cD(g); v += (1.0 - w(g)) * cD(g); nTot += cD(g)
        g += 1
      }
      val m1 = Array.tabulate(nFields) { f =>
        var s = 0.0; var g2 = 0
        while (g2 < nPat) {
          if (((g2 >> f) & 1) == 1) s += w(g2) * cD(g2)
          g2 += 1
        }
        clamp(if (t != 0.0) s / t else m(f))
      }
      val u1 = Array.tabulate(nFields) { f =>
        var s = 0.0; var g2 = 0
        while (g2 < nPat) {
          if (((g2 >> f) & 1) == 1) s += (1.0 - w(g2)) * cD(g2)
          g2 += 1
        }
        clamp(if (v != 0.0) s / v else u(f))
      }
      p = clamp(if (nTot != 0.0) t / nTot else p)
      m = m1; u = u1
      it += 1
    }
    (p, m, u)
  }

  /** Learn and score. `pairs` carries one row per candidate pair;
    * `fields` are its boolean agreement columns in weight order. */
  def fellegiSunter(pairs: DataFrame, fields: Seq[(String, Column)],
                    iters: Int = 20): DataFrame = {
    require(fields.nonEmpty && fields.size <= 6,
      s"fellegiSunter: 1..6 comparison fields (got ${fields.size})")
    require(iters >= 1 && iters <= 40,
      s"fellegiSunter: iters must be in 1..40 (got $iters)")
    val nF = fields.size
    val nPat = 1 << nF
    val spark = pairs.sparkSession
    import spark.implicits._
    // pattern id = Σ bit_f · 2^f over agreement bools (null = disagree)
    val gid = fields.zipWithIndex.map { case ((_, c), f) =>
      when(coalesce(c, lit(false)), lit(1L << f)).otherwise(lit(0L))
    }.reduceLeft(_ + _)
    val countRows = pairs.select(gid.as("__g")).groupBy("__g")
      .agg(count(lit(1)).as("__c")).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val counts = IndexedSeq.tabulate(nPat)(g => countRows.getOrElse(g, 0L))
    val (p, m, u) = em(counts, nF, iters)
    def wFinal(g: Int): Double = {
      var num = p; var den = 1.0 - p
      var f = 0
      while (f < nF) {
        if (((g >> f) & 1) == 1) { num *= m(f); den *= u(f) }
        else { num *= 1.0 - m(f); den *= 1.0 - u(f) }
        f += 1
      }
      num / (num + den)
    }
    val rows = (0 until nPat).filter(counts(_) > 0L).map { g =>
      val pat = (0 until nF).map(f => if (((g >> f) & 1) == 1) '1' else '0')
        .mkString
      (pat, counts(g), wFinal(g), p, m.toSeq, u.toSeq)
    }
    val base = rows.toDF("pattern", "n", "posterior", "p_match", "__m", "__u")
    val withM = (1 to nF).foldLeft(base)((d, f) =>
      d.withColumn(s"m_$f", col("__m").getItem(f - 1)))
    (1 to nF).foldLeft(withM)((d, f) =>
        d.withColumn(s"u_$f", col("__u").getItem(f - 1)))
      .drop("__m", "__u")
      .orderBy(col("pattern"))
  }
}
