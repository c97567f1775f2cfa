package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.core._
import graft.core.GraftFrame.DataFrameOps
import graft.functions._

/** Golden-value semantics mirroring /root/reference/tests/dplyr
  * (test_mutate.py, test_filter.py, test_slice.py, test_lead_lag
  * semantics, group_iter) — values recomputed by hand, not copied. */
class DplyrSpec extends SparkTestBase {

  private def gdf = sqlDf(
    "g" -> Seq("a", "a", "b", "b", "b"),
    "x" -> Seq(1, 2, 3, 4, 5))

  test("tidyselect whereAgg selects by a value predicate in one scan") {
    val df = sqlDf("name" -> Seq("x", "y"), "small" -> Seq(1, 2), "big" -> Seq(100, 200))
    val sel = (TidySelect.cols("name") |
      TidySelect.whereAgg(df, c => max(c) <= lit(50),
        dt => dt.isInstanceOf[NumericType]))
      .resolve(df.schema)
    assert(sel == Seq("name", "small"))
    // composition with Not, and the empty-candidate path
    val none = TidySelect.whereAgg(df, c => max(c) < lit(0),
      dt => dt.isInstanceOf[NumericType]).resolve(df.schema)
    assert(none.isEmpty)
  }

  test("grouped mutate rewrites aggregates to group windows") {
    val out = gdf.graft.groupBy("g")
      .mutate("total" -> sum(col("x")), "share" -> (col("x") / sum(col("x"))))
      .ungroup.arrange(col("x")).df
    assertRows(out.select("g", "x", "total", "share"),
      Seq(Seq("a", 1, 3L, 1.0 / 3), Seq("a", 2, 3L, 2.0 / 3),
        Seq("b", 3, 12L, 0.25), Seq("b", 4, 12L, 4.0 / 12), Seq("b", 5, 12L, 5.0 / 12)))
  }

  test("mutate expressions see columns created earlier in the same call") {
    val out = gdf.graft
      .mutate("b" -> (col("x") + 1), "c" -> (col("b") * 2))
      .arrange(col("x")).df
    assertRows(out.select("x", "b", "c").limit(2),
      Seq(Seq(1, 2, 4), Seq(2, 3, 6)))
    // grouped flavor: the derived column participates in the window agg
    val g = gdf.graft.groupBy("g")
      .mutate("d" -> (col("x") * 10), "dsum" -> sum(col("d")))
      .ungroup.arrange(col("x")).df
    assertRows(g.select("g", "dsum").distinct().orderBy("g"),
      Seq(Seq("a", 30L), Seq("b", 120L)))
  }

  test("grouped filter with aggregate predicate keeps per-group maxima") {
    val out = gdf.graft.groupBy("g").filterRows(col("x") === max(col("x")))
      .ungroup.arrange(col("x")).df
    assertRows(out.select("g", "x"), Seq(Seq("a", 2), Seq("b", 5)))
  }

  test("summarise drops last grouping level") {
    val f = gdf.graft.groupBy("g").summarise("n" -> count(lit(1)))
    assert(f.groupVars.isEmpty)
    assertRows(f.arrange(col("g")).df, Seq(Seq("a", 2L), Seq("b", 3L)))
  }

  test("summariseRollup emits group rows, subtotals, and grand total with level bits") {
    import spark.implicits._
    val d = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 4)).toDF("g1", "g2", "v")
    val out = d.graft.groupBy("g1", "g2")
      .summariseRollup("n" -> count(lit(1)), "s" -> sum(col("v")))
      .arrange(col("grouping_lvl"), col("g1"), col("g2")).df
    assertRows(out, Seq(
      Seq("a", "x", 1L, 1L, 0), Seq("a", "y", 1L, 2L, 0), Seq("b", "x", 1L, 4L, 0),
      Seq("a", null, 2L, 3L, 1), Seq("b", null, 1L, 4L, 1),
      Seq(null, null, 3L, 7L, 3)))
  }

  test("slice_head / slice_max / sliceAt honor group + order") {
    val g = gdf.graft.groupBy("g").arrange(col("x").desc)
    assertRows(g.sliceHead(1).ungroup.arrange(col("g")).df.select("g", "x"),
      Seq(Seq("a", 2), Seq("b", 5)))
    assertRows(gdf.graft.groupBy("g").sliceMax(col("x"), 1).ungroup
      .arrange(col("g")).df.select("g", "x"),
      Seq(Seq("a", 2), Seq("b", 5)))
    // slice(2) per group along ascending x
    assertRows(gdf.graft.groupBy("g").arrange(col("x")).sliceAt(Seq(2))
      .ungroup.arrange(col("g")).df.select("g", "x"),
      Seq(Seq("a", 2), Seq("b", 4)))
    // negative indices drop
    assertRows(gdf.graft.groupBy("g").arrange(col("x")).sliceAt(Seq(-1))
      .ungroup.arrange(col("x")).df.select("g", "x"),
      Seq(Seq("a", 2), Seq("b", 4), Seq("b", 5)))
  }

  test("slice_min on a string column uses character ordering; out-of-range is empty") {
    // reference tests/dplyr/test_slice.py: test_slice_min_string_column,
    // test_slice_no_rows_returns_empty
    val df = sqlDf("s" -> Seq("pear", "apple", "mango"))
    assertRows(df.graft.arrange(col("s")).sliceMin(col("s"), 1).df.select("s"),
      Seq(Seq("apple")))
    assert(df.graft.arrange(col("s")).sliceAt(Seq(9)).df.count() == 0L)
  }

  test("rolling aggregates use trailing frames with partial heads") {
    val df = sqlDf("g" -> Seq("a", "a", "a", "b"), "x" -> Seq(1.0, 2.0, 4.0, 9.0))
    val out = df.select(col("g"), col("x"),
        graft.functions.WindowFns.rollSum(col("x"), 2, Seq(col("x")), Seq(col("g"))).as("rs"),
        graft.functions.WindowFns.rollMean(col("x"), 2, Seq(col("x")), Seq(col("g"))).as("rm"))
      .orderBy("g", "x").collect()
    // a: frames [1], [1,2], [2,4]; b: [9]
    assert(out.map(_.getAs[Double]("rs")).toSeq == Seq(1.0, 3.0, 6.0, 9.0))
    assert(out.map(_.getAs[Double]("rm")).toSeq == Seq(1.0, 1.5, 3.0, 9.0))
  }

  test("slice prop variants keep floor(prop*n) rows per group") {
    // reference tests/dplyr/test_slice.py: slice_head(prop=0.5) of 4 -> 2
    val df = sqlDf("x" -> Seq(1, 2, 3, 4))
    assertRows(df.graft.arrange(col("x")).sliceHeadProp(0.5).df.select("x").orderBy("x"),
      Seq(Seq(1), Seq(2)))
    assertRows(df.graft.arrange(col("x")).sliceTailProp(0.5).df.select("x").orderBy("x"),
      Seq(Seq(3), Seq(4)))
    // grouped: per-group floor(0.5 * group size)
    val out = gdf.graft.groupBy("g").arrange(col("x")).sliceHeadProp(0.5)
      .ungroup.arrange(col("x")).df
    assertRows(out.select("g", "x"), Seq(Seq("a", 1), Seq("b", 3)))
  }

  test("lead/lag default applies only past the frame edge, not to genuine nulls") {
    val df = sqlDf("g" -> Seq("a", "a", "a"), "ord" -> Seq(1, 2, 3),
      "v" -> Seq("x", null, "z"))
    val out = df.select(col("ord"), col("v"),
      WindowFns.lagBy(col("v"), 1, Seq(col("ord")), Seq(col("g")),
        default = lit("DEF")).as("lagv"))
      .orderBy("ord")
    // row1: past edge -> DEF; row2: lag = "x"; row3: lag = genuine null (NOT DEF)
    assertRows(out, Seq(Seq(1, "x", "DEF"), Seq(2, null, "x"), Seq(3, "z", null)))
  }

  test("consecutive_id treats a run of NULLs as one group and starts at 1") {
    val df = sqlDf("g" -> Seq("a", "a", "a", "a", "a", "a"),
      "ord" -> Seq(1, 2, 3, 4, 5, 6),
      "v" -> Seq(null, null, "a", "a", null, "b"))
    val out = df.select(col("ord"),
      WindowFns.consecutiveId(Seq(col("v")), Seq(col("ord")), Seq(col("g"))).as("id"))
      .orderBy("ord")
    assertRows(out, Seq(Seq(1, 1L), Seq(2, 1L), Seq(3, 2L), Seq(4, 2L), Seq(5, 3L), Seq(6, 4L)))
  }

  test("arrange puts NAs last in both directions; sliceTail reaches them") {
    val df = sqlDf("ord" -> Seq(1, 2, 3, 4), "v" -> Seq(3, null, 1, 2))
    // ascending: 1, 2, 3, NA
    assertRows(df.graft.arrange(col("v")).df.select("v"),
      Seq(Seq(1), Seq(2), Seq(3), Seq(null)))
    // descending: 3, 2, 1, NA (R semantics — NAs last either way)
    assertRows(df.graft.arrange(col("v").desc).df.select("v"),
      Seq(Seq(3), Seq(2), Seq(1), Seq(null)))
    // sliceTail(1) of the ascending order is the NA row
    assertRows(df.graft.arrange(col("v")).sliceTail(1).df.select("v"),
      Seq(Seq(null)))
  }

  test("distinct keep_all keeps one full row per key") {
    val df = sqlDf("k" -> Seq("a", "a", "b"), "v" -> Seq(1, 2, 3))
    val out = df.graft.distinctRows(Seq("k"), keepAll = true).df
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("k", "v"))
  }

  test("withGroupId assigns dense key-ordered ids via broadcast join") {
    val f = gdf.graft.groupBy("g").withGroupId("gid")
    assertRows(f.df.select("g", "gid").distinct().orderBy("g"),
      Seq(Seq("a", 0), Seq("b", 1)))
    // ids come from a broadcast-joined key table ranked by the
    // sorted-zipWithIndex rowid — no Window operator anywhere, let
    // alone a global one over the fact rows
    val plan = f.df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in withGroupId:\n$plan")
  }

  test("slice_sample with replacement: n draws per group, deterministic, dupes allowed") {
    val df = sqlDf("g" -> Seq("a", "a", "a", "b", "b"),
      "x" -> Seq(1, 2, 3, 4, 5))
    // ungrouped: exactly n rows, all drawn from the frame, repeatable
    val u1 = df.graft.sliceSampleReplace(40, 7L, Seq(col("x"))).df
      .orderBy("draw_id").collect().map(r => (r.getLong(2), r.getInt(1))).toSeq
    val u2 = df.graft.sliceSampleReplace(40, 7L, Seq(col("x"))).df
      .orderBy("draw_id").collect().map(r => (r.getLong(2), r.getInt(1))).toSeq
    assert(u1 == u2 && u1.length == 40)
    assert(u1.map(_._2).toSet.subsetOf(Set(1, 2, 3, 4, 5)))
    // 40 draws from 5 rows MUST repeat some row
    assert(u1.map(_._2).distinct.length < 40)
    // grouped: n draws per group, each drawn within its own group
    val g = df.graft.groupBy("g").sliceSampleReplace(10, 7L, Seq(col("x"))).df
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(g.count(_._1 == "a") == 10 && g.count(_._1 == "b") == 10)
    assert(g.filter(_._1 == "a").forall(p => Set(1, 2, 3).contains(p._2)))
    assert(g.filter(_._1 == "b").forall(p => Set(4, 5).contains(p._2)))
  }

  test("slice_sample with replacement: NULL group keys draw, sequences independent") {
    // a NULL group key is a legitimate dplyr group: it must receive
    // exactly n draws, which a using-columns join would silently drop
    val withNull = sqlDf("g" -> Seq("a", "a", null, null, null),
      "x" -> Seq(1, 2, 3, 4, 5))
    val g = withNull.graft.groupBy("g").sliceSampleReplace(8, 7L, Seq(col("x"))).df
      .collect().map(r => (Option(r.getString(0)), r.getInt(1))).toSeq
    assert(g.count(_._1.isEmpty) == 8, s"NULL group got ${g.count(_._1.isEmpty)} draws")
    assert(g.count(_._1.contains("a")) == 8)
    assert(g.filter(_._1.isEmpty).forall(p => Set(3, 4, 5).contains(p._2)))
    // separator in the draw key: groups "a" (draw 11) and "a1" (draw 1)
    // must NOT share a hash — with equal group sizes, identical draw
    // sequences would betray the collision
    val amb = sqlDf("g" -> Seq("a", "a", "a", "a1", "a1", "a1"),
      "x" -> Seq(1, 2, 3, 1, 2, 3))
    val d = amb.graft.groupBy("g").sliceSampleReplace(30, 7L, Seq(col("x"))).df
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(1)))
    val seqA = d.filter(_._1 == "a").sortBy(_._2).map(_._3).toSeq
    val seqA1 = d.filter(_._1 == "a1").sortBy(_._2).map(_._3).toSeq
    assert(seqA.length == 30 && seqA1.length == 30)
    assert(seqA != seqA1, "draw sequences for groups a and a1 coincide")
  }

  test("group_modify applies f per group, re-keying output") {
    val schema = StructType(Seq(StructField("mx", IntegerType)))
    val out = gdf.graft.groupBy("g").groupModify(schema) { (_, rows) =>
      val xs = rows.map(_.getInt(0)).toSeq
      Iterator.single(Row(xs.max))
    }.df.orderBy("g")
    assertRows(out, Seq(Seq("a", 2), Seq("b", 5)))
  }

  test("group_split yields one frame per key") {
    val parts = gdf.graft.groupBy("g").groupSplit()
    assert(parts.length == 2)
    assert(parts.map(_.count()).sorted == Seq(2L, 3L))
  }

  test("joins: semi/anti/nest") {
    val l = sqlDf("k" -> Seq(1, 2, 3), "v" -> Seq("a", "b", "c"))
    val r = sqlDf("k" -> Seq(2, 3, 3), "w" -> Seq("x", "y", "z"))
    assertRows(l.graft.semiJoin(r.graft, Seq("k")).arrange(col("k")).df.select("k"),
      Seq(Seq(2), Seq(3)))
    assertRows(l.graft.antiJoin(r.graft, Seq("k")).df.select("k"), Seq(Seq(1)))
    val nested = l.graft.nestJoin(r.graft, Seq("k"), "rows").arrange(col("k")).df
    assertRows(nested.select(col("k"), size(col("rows"))),
      Seq(Seq(1, 0), Seq(2, 1), Seq(3, 2)))
  }

  test("rows_upsert updates matches and inserts new keys") {
    val x = sqlDf("k" -> Seq(1, 2), "v" -> Seq("a", "b"))
    val y = sqlDf("k" -> Seq(2, 3), "v" -> Seq("B", "c"))
    assertRows(RowsVerbs.upsert(x, y, Seq("k")).orderBy("k"),
      Seq(Seq(1, "a"), Seq(2, "B"), Seq(3, "c")))
  }

  test("bind_rows unions mismatched schemas with nulls") {
    val a = sqlDf("x" -> Seq(1), "y" -> Seq("p"))
    val b = sqlDf("x" -> Seq(2), "z" -> Seq(9.5))
    val out = Bind.rows(a, b).orderBy("x")
    assert(out.columns.toSeq == Seq("x", "y", "z"))
    assertRows(out, Seq(Seq(1, "p", null), Seq(2, null, 9.5)))
  }

  test("bind_cols zips positionally without a single-partition window") {
    val a = sqlDf("x" -> Seq(1, 2, 3))
    val b = sqlDf("y" -> Seq("a", "b", "c"))
    val out = Bind.colsOrdered(a, Seq(col("x")), b, Seq(col("y")))
    assertRows(out.orderBy("x"), Seq(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
  }

  test("saltedJoin equals the plain join and shuffles on (key, salt)") {
    val big = sqlDf("k" -> Seq(1, 1, 1, 2, 3), "v" -> Seq(10, 11, 12, 20, 30))
    val small = sqlDf("k" -> Seq(1, 2), "w" -> Seq("a", "b"))
    val salted = ScaleJoins.saltedJoin(big, small, Seq("k"), "inner", salt = 4)
      .orderBy("k", "v")
    val plain = big.join(small, Seq("k"), "inner").orderBy("k", "v")
    assert(rowsOf(salted) == rowsOf(plain))
    val plan = ScaleJoins.saltedJoin(big, small, Seq("k"), "inner", salt = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt key missing from join:\n$plan")
  }

  test("cumprod handles zeros and sign") {
    val df = sqlDf("g" -> Seq("a", "a", "a", "a"), "ord" -> Seq(1, 2, 3, 4),
      "x" -> Seq(2.0, -3.0, 1.0, 0.0))
    val out = df.select(col("ord"),
      CumFns.cumprod(col("x"), Seq(col("ord")), Seq(col("g"))).as("cp")).orderBy("ord")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    // IEEE: -6.0 * 0.0 = -0.0; compare numerically, not by bit pattern
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(out.zip(Seq(2.0, -6.0, -6.0, 0.0)).forall { case ((_, g), e) => g == e })
  }

  test("with_groups applies a temporary grouping then restores the original") {
    val df = sqlDf("g" -> Seq("a", "a", "b"), "h" -> Seq("x", "y", "y"))
    val out = df.graft.groupBy("g")
      .withGroups(Seq("h"))(_.addTally())   // n = count per h: x->1, y->2
      .summarise("mx" -> max(col("n")))     // grouping restored: per g
      .ungroup.arrange(col("g")).df
    assertRows(out, Seq(Seq("a", 2L), Seq("b", 2L)))
  }

  test("group_walk visits each key once; group_trim is identity") {
    val df = sqlDf("g" -> Seq("a", "b", "b"))
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val g = df.graft.groupBy("g").groupWalk(r => seen += r.getString(0))
    assert(seen.sorted == Seq("a", "b"))
    assert(g.groupTrim.df.count() == 3)
  }

  test("rowwise(): agg vocabulary reduces per row over c_across, no shuffle") {
    val df = sqlDf("a" -> Seq(1.0, 4.0), "b" -> Seq(3.0, 8.0), "c" -> Seq(5.0, 0.0))
    val g = df.graft.rowwise()
    val across = g.cAcross(TidySelect.cols("a", "b", "c"))
    val out = g.mutate(
        "m" -> avg(across), "s" -> sum(across), "mx" -> max(across))
      .select("m", "s", "mx").arrange(col("s")).df
    assertRows(out, Seq(Seq(3.0, 9.0, 5.0), Seq(4.0, 12.0, 8.0)))
    // a pure projection: no Window, no Exchange anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rowwise planned a window:\n$plan")
  }

  test("rowwise(): unsupported aggregate names fail fast; group_by exits the mode") {
    val df = sqlDf("a" -> Seq(1.0), "b" -> Seq(2.0))
    val g = df.graft.rowwise()
    val e = intercept[IllegalArgumentException] {
      g.mutate("x" -> stddev(g.cAcross(TidySelect.cols("a", "b"))))
    }
    assert(e.getMessage.contains("rowwise"))
    assert(!g.groupBy("a").isRowwise && !g.ungroup.isRowwise)
  }

  test("surface-parity one-liners: first2/last2, as_tibble, group_by_drop_default") {
    val df = sqlDf("k" -> Seq(1, 2, 3), "v" -> Seq(30.0, 10.0, 20.0))
    val r = df.agg(
      graft.functions.BaseFns.first2(col("v"), col("k")).as("f"),
      graft.functions.BaseFns.last2(col("v"), col("k")).as("l")).head()
    assert(r.getDouble(0) == 30.0 && r.getDouble(1) == 20.0)
    assert(Tibble.asTibble(df) eq df)
    assert(df.graft.groupBy("k").groupByDropDefault)
  }

  test("acrossCur passes the current column name to the lambda (cur_column)") {
    val df = sqlDf("aa" -> Seq(1.0), "b" -> Seq(10.0))
    val out = df.graft.acrossCur(TidySelect.cols("aa", "b"),
      // name-keyed transform: scale by the NAME's length
      Seq("nlen" -> ((name, c) => c * lit(name.length)))).df
    val r = out.select("aa_nlen", "b_nlen").head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 10.0)
  }
}
