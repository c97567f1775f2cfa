package graft

import org.apache.spark.sql.functions._
import graft.core.Forcats

/** forcats level-table semantics (reference: tests/forcats). */
class ForcatsSpec extends SparkTestBase {

  private def fdf = sqlDf("f" -> Seq("a", "b", "b", "c", "c", "c"))

  test("fct_count with sort and prop") {
    val out = Forcats.fctCount(fdf, "f", sort = true, prop = true)
    assertRows(out.select(col("f"), col("n"), round(col("p"), 6)),
      Seq(Seq("c", 3L, 0.5), Seq("b", 2L, 0.333333), Seq("a", 1L, 0.166667)))
  }

  test("fct_infreq orders levels by descending frequency") {
    assertRows(Forcats.levelsInfreq(fdf, "f").orderBy("ord"),
      Seq(Seq("c", 1), Seq("b", 2), Seq("a", 3)))
  }

  test("fct_rev reverses level order without a driver-side action") {
    val levels = Forcats.levelsInfreq(fdf, "f")
    assertRows(Forcats.fctRev(levels).orderBy("ord"),
      Seq(Seq("a", 1), Seq("b", 2), Seq("c", 3)))
  }

  test("fct_lump_n keeps top-n levels and lumps the rest") {
    val out = Forcats.fctLumpN(fdf, "f", 1)
    assertRows(out.groupBy("f").count().orderBy("f"),
      Seq(Seq("Other", 3L), Seq("c", 3L)))
  }

  test("fct_collapse merges level groups") {
    val out = Forcats.fctCollapse(fdf, "f", Map("ab" -> Seq("a", "b")))
    assertRows(out.groupBy("f").count().orderBy("f"),
      Seq(Seq("ab", 3L), Seq("c", 3L)))
  }

  test("fct_shift moves the first n levels to the end") {
    val levels = Forcats.levelsInfreq(fdf, "f") // c=1 b=2 a=3
    val out = Forcats.fctShift(levels, 1).orderBy("ord")
    assertRows(out.select("f", "ord"),
      Seq(Seq("b", 1), Seq("a", 2), Seq("c", 3)))
  }

  test("fct_lump_lowfreq uses the descending prefix cutoff") {
    // reference TestFctLumpLowfreq counts: 40,27,10,5,1,1,1,1,1 —
    // rank2 (27) > tail-sum (20), so keep {40,27}, Other = 20
    val counts = Map("a" -> 40, "b" -> 27, "c" -> 10, "d" -> 5,
      "e" -> 1, "f" -> 1, "g" -> 1, "h" -> 1, "i" -> 1)
    val df = sqlDf("f" -> counts.toSeq.sortBy(_._1)
      .flatMap { case (l, n) => Seq.fill(n)(l) })
    assertRows(Forcats.fctLumpLowfreq(df, "f").groupBy("f").count().orderBy("f"),
      Seq(Seq("Other", 20L), Seq("a", 40L), Seq("b", 27L)))
  }

  test("fct_lump_lowfreq keeps everything when no level dominates its tail") {
    val df = sqlDf("f" -> Seq("a", "a", "b", "b", "c", "c"))
    assertRows(Forcats.fctLumpLowfreq(df, "f").groupBy("f").count().orderBy("f"),
      Seq(Seq("a", 2L), Seq("b", 2L), Seq("c", 2L)))
  }

  test("fct_explicit_na makes NULL a level") {
    val df = sqlDf("f" -> Seq("a", null))
    assertRows(Forcats.fctExplicitNa(df, "f").orderBy("f"),
      Seq(Seq("(Missing)"), Seq("a")))
  }

  test("fct_inseq numeric-aware order; lvls_reorder permutation; lvls_expand alias") {
    import org.apache.spark.sql.functions.col
    val df = sqlDf("f" -> Seq("10", "2", "b", "a", "2"))
    // numeric strings numerically first, then non-numeric lexicographic
    assertRows(Forcats.fctInseq(df, "f").orderBy("ord"),
      Seq(Seq("2", 1), Seq("10", 2), Seq("a", 3), Seq("b", 4)))
    val levels = Forcats.setLevels(spark, "f", Seq("a", "b", "c"))
    // idx(k) = current ord of the level that becomes ord k+1
    assertRows(Forcats.lvlsReorder(levels, "f", Seq(3, 1, 2)).orderBy("ord"),
      Seq(Seq("c", 1), Seq("a", 2), Seq("b", 3)))
    intercept[IllegalArgumentException] {
      Forcats.lvlsReorder(levels, "f", Seq(1, 1, 2)) // not a permutation
    }
    assertRows(Forcats.lvlsExpand(levels, "f", Seq("z")).orderBy("ord"),
      Seq(Seq("a", 1), Seq("b", 2), Seq("c", 3), Seq("z", 4)))
  }

  test("as_factor / as_ordered / set_levels / is_factor ctor surface") {
    import org.apache.spark.sql.functions.col
    val df = sqlDf("f" -> Seq("b", "c", "b", "a"), "pos" -> Seq(1, 2, 3, 4))
    // first-appearance order along pos: b(1), c(2), a(4)
    assertRows(Forcats.asFactor(df, "f", col("pos")).orderBy("ord"),
      Seq(Seq("b", 1), Seq("c", 2), Seq("a", 3)))
    // as_ordered: sorted levels
    assertRows(Forcats.asOrdered(df, "f").orderBy("ord"),
      Seq(Seq("a", 1), Seq("b", 2), Seq("c", 3)))
    val explicit = Forcats.setLevels(spark, "f", Seq("c", "a", "b"))
    assertRows(explicit.orderBy("ord"),
      Seq(Seq("c", 1), Seq("a", 2), Seq("b", 3)))
    assert(Forcats.isFactor(explicit, "f"))
    assert(!Forcats.isFactor(df, "f")) // extra non-ord column
    intercept[IllegalArgumentException] {
      Forcats.setLevels(spark, "f", Seq("a", "a")) // dup levels
    }
  }
}
