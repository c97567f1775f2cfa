package graft

import org.apache.spark.sql.functions._
import graft.ops.RecordLinkage

/** Round-17: Fellegi-Sunter EM linkage scoring. */
class RecordLinkageSpec extends SparkTestBase {

  test("fellegiSunter: separable mixture learns high-m/low-u, posteriors split") {
    // 60 matched pairs agree everywhere; 600 random pairs agree on
    // nothing; 40 noise pairs agree only on the weak field
    val rows =
      Seq.fill(60)((true, true, true)) ++
        Seq.fill(600)((false, false, false)) ++
        Seq.fill(40)((false, false, true))
    val df = sqlDf(
      "g1" -> rows.map(_._1), "g2" -> rows.map(_._2), "g3" -> rows.map(_._3))
    val out = RecordLinkage.fellegiSunter(df, Seq(
        "name" -> col("g1"), "addr" -> col("g2"), "city" -> col("g3")),
      iters = 20)
    val byPat = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byPat.keySet == Set("111", "000", "001"))
    assert(byPat("111").getLong(1) == 60L && byPat("000").getLong(1) == 600L)
    // full agreement is near-certain match, full disagreement near-zero
    assert(byPat("111").getDouble(2) > 0.95, s"w111=${byPat("111").getDouble(2)}")
    assert(byPat("000").getDouble(2) < 0.05)
    // the weak-field-only pattern stays well below the full pattern
    assert(byPat("001").getDouble(2) < byPat("111").getDouble(2))
    // learned params: strong fields separate m >> u; everything clamped
    val r = byPat("111")
    val (m1, u1) = (r.getAs[Double]("m_1"), r.getAs[Double]("u_1"))
    assert(m1 > 0.9 && u1 < 0.1, s"m1=$m1 u1=$u1")
    out.collect().foreach { row =>
      // params are clamped; posteriors only bounded to [0, 1]
      Seq("p_match", "m_1", "m_2", "m_3", "u_1", "u_2", "u_3").foreach { c =>
        val v = row.getAs[Double](c)
        assert(!v.isNaN && v >= RecordLinkage.Eps &&
          v <= 1.0 - RecordLinkage.Eps, s"$c=$v out of clamp range")
      }
      val w = row.getAs[Double]("posterior")
      assert(!w.isNaN && w >= 0.0 && w <= 1.0)
    }
  }

  test("fellegiSunter: null agreement counts as disagree; degenerate input stays finite") {
    val df = sqlDf("g1" -> Seq[Any](true, null, true),
      "g2" -> Seq[Any](true, true, null))
    val out = RecordLinkage.fellegiSunter(df,
      Seq("a" -> col("g1"), "b" -> col("g2")), iters = 5).collect()
    // patterns: (t,t)=11, (null,t)=01... bit0 = field a, bit1 = field b:
    // "11", "01", "10" each once
    assert(out.map(_.getString(0)).toSet == Set("11", "01", "10"))
    out.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
    }
    // field cap refuses
    val e = intercept[IllegalArgumentException] {
      RecordLinkage.fellegiSunter(df,
        (1 to 7).map(i => s"f$i" -> col("g1")), iters = 5)
    }
    assert(e.getMessage.contains("1..6"))
  }
}
