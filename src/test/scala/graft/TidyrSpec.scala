package graft

import org.apache.spark.sql.functions._
import graft.core._

/** Semantics mirrored from /root/reference/tests/tidyr (values
  * recomputed independently). */
class TidyrSpec extends SparkTestBase {

  test("uncount drops weight-0 and negative-weight rows, replicates others") {
    val df = sqlDf("v" -> Seq("a", "b", "c", "d"), "w" -> Seq(2, 0, 1, -1))
    val out = Tidyr.uncount(df, col("w")).orderBy("v")
    assertRows(out.select("v"), Seq(Seq("a"), Seq("a"), Seq("c")))
  }

  test("pivot_longer stacks columns; pivot_wider round-trips") {
    val df = sqlDf("id" -> Seq(1, 2), "a" -> Seq(10, 30), "b" -> Seq(20, 40))
    val long = Tidyr.pivotLonger(df, TidySelect.cols("a", "b"))
    assertRows(long.orderBy("id", "name"),
      Seq(Seq(1, "a", 10.0), Seq(1, "b", 20.0), Seq(2, "a", 30.0), Seq(2, "b", 40.0)))
    val wide = Tidyr.pivotWider(long, Seq("id"), "name", col("value"),
      first(_), Seq("a", "b"))
    assertRows(wide.orderBy("id"), Seq(Seq(1, 10.0, 20.0), Seq(2, 30.0, 40.0)))
  }

  test("pivot_wider discovery path finds names from the data") {
    val df = sqlDf("id" -> Seq(1, 1, 2), "k" -> Seq("x", "y", "x"),
      "v" -> Seq(1.0, 2.0, 3.0))
    val wide = Tidyr.pivotWiderDiscover(df, Seq("id"), "k", col("v"), first(_))
    assert(wide.columns.toSeq == Seq("id", "x", "y"))
    assertRows(wide.orderBy("id"), Seq(Seq(1, 1.0, 2.0), Seq(2, 3.0, null)))
  }

  test("separate splits with NULL past the end; unite joins") {
    val df = sqlDf("s" -> Seq("a-b", "c"))
    val sep = Tidyr.separate(df, "s", Seq("p", "q"), "-")
    assertRows(sep.orderBy("p"), Seq(Seq("a", "b"), Seq("c", null)))
    val uni = Tidyr.unite(sqlDf("p" -> Seq("a"), "q" -> Seq("b")), "s",
      TidySelect.cols("p", "q"), "-")
    assertRows(uni.select("s"), Seq(Seq("a-b")))
  }

  test("separate extra=merge/drop and fill=left/right (reference test_separate_merge vectors)") {
    // the reference pins ["x", "x y", "x y z", NA] for both strategies
    // (tests/tidyr/test_tidyr_verbs.py:338-346)
    val df = sqlDf("id" -> Seq(1, 2, 3, 4), "x" -> Seq("x", "x y", "x y z", null))
    val drop = Tidyr.separate(df, "x", Seq("a", "b"), " ",
      extra = "drop", fill = "right").orderBy("id").select("a", "b")
    assertRows(drop, Seq(Seq("x", null), Seq("x", "y"), Seq("x", "y"), Seq(null, null)))
    val merge = Tidyr.separate(df, "x", Seq("a", "b"), " ",
      extra = "merge", fill = "left").orderBy("id").select("a", "b")
    assertRows(merge, Seq(Seq(null, "x"), Seq("x", "y"), Seq("x", "y z"), Seq(null, null)))
  }

  test("separate convert= casts pieces (reference test_separate_convert vectors)") {
    val df = sqlDf("id" -> Seq(1, 2, 3, 4), "x" -> Seq("x:1", "x:2", "z", null))
    val out = Tidyr.separate(df, "x", Seq("a", "b"), ":",
      convert = Map("b" -> "double")).orderBy("id").select("a", "b")
    assertRows(out, Seq(Seq("x", 1.0), Seq("x", 2.0), Seq("z", null), Seq(null, null)))
  }

  test("fill down/up/downup within partitions") {
    val df = sqlDf("g" -> Seq("a", "a", "a"), "ord" -> Seq(1, 2, 3),
      "v" -> Seq(null, 5, null))
    def run(dir: String) = Tidyr.fill(df, TidySelect.cols("v"), Seq(col("ord")),
      Seq(col("g")), dir).orderBy("ord").select("v")
    assertRows(run("down"), Seq(Seq(null), Seq(5), Seq(5)))
    assertRows(run("up"), Seq(Seq(5), Seq(5), Seq(null)))
    assertRows(run("downup"), Seq(Seq(5), Seq(5), Seq(5)))
  }

  test("complete fills the key grid") {
    val df = sqlDf("a" -> Seq("x", "y"), "b" -> Seq(1, 2), "v" -> Seq(1.5, 2.5))
    val out = Tidyr.complete(df, Seq("a", "b"), Map("v" -> 0.0))
    assert(out.count() == 4)
    assert(out.filter(col("v") === 0.0).count() == 2)
  }

  test("chop/unchop round-trip; nest/unnest round-trip") {
    val df = sqlDf("k" -> Seq("a", "a", "b"), "v" -> Seq(1, 2, 3))
    val chopped = Tidyr.chop(df, Seq("k"), Seq("v"), col("v"))
    assertRows(chopped.orderBy("k").select(col("k"), col("v")),
      Seq(Seq("a", Seq(1, 2)), Seq("b", Seq(3))))
    val unchopped = Tidyr.unchop(chopped, Seq("v"))
    assert(unchopped.orderBy("k", "v").select("k", "v").collect().toSeq.map(_.toSeq) ==
      Seq(Seq("a", 1), Seq("a", 2), Seq("b", 3)))
    val nested = Tidyr.nest(df, Seq("k"), "data", col("v"))
    val unnested = Tidyr.unnest(nested, "data")
    assert(unnested.count() == 3)
  }

  test("unnest_longer/wider and hoist") {
    val df = sqlDf("id" -> Seq(1))
      .withColumn("xs", array(lit(10), lit(20)))
      .withColumn("meta", struct(lit("a").as("tag"), lit(5).as("n")))
    assertRows(Tidyr.unnestLonger(df, "xs").select("id", "xs").orderBy("xs"),
      Seq(Seq(1, 10), Seq(1, 20)))
    val withIdx = Tidyr.unnestLonger(df, "xs", indicesTo = Some("i"))
    assertRows(withIdx.select("i", "xs").orderBy("i"), Seq(Seq(0, 10), Seq(1, 20)))
    assert(Tidyr.unnestWider(df, "meta").columns.toSeq == Seq("id", "xs", "tag", "n"))
    assertRows(Tidyr.hoist(df, "meta", "tag_out" -> "tag").select("tag_out"),
      Seq(Seq("a")))
  }

  test("separate_rows explodes delimited values") {
    val df = sqlDf("id" -> Seq(1), "s" -> Seq("a,b,c"))
    assert(Tidyr.separateRows(df, "s", ",").count() == 3)
  }

  test("full_seq spans the range at the given period") {
    val df = sqlDf("x" -> Seq(2L, 9L, 4L))
    assertRows(Tidyr.fullSeq(df, col("x"), 1, "x").orderBy("x").limit(3),
      Seq(Seq(2L), Seq(3L), Seq(4L)))
  }

  test("rownames family round-trips through the reserved column") {
    val df = sqlDf("k" -> Seq(2, 1), "name" -> Seq("b", "a"))
    assert(!Tibble.hasRownames(df))
    val rn = Tibble.columnToRownames(df, "name")
    assert(Tibble.hasRownames(rn) && !rn.columns.contains("name"))
    assert(!Tibble.hasRownames(Tibble.removeRownames(rn)))
    val set = Tibble.setRownames(df, col("k") * 10)
    assert(Tibble.hasRownames(set))
    // promotion keeps the name as the LEADING column
    val back = Tibble.rownamesToColumn(rn, "nm")
    assert(back.columns.head == "nm")
    assertRows(back.orderBy("k"), Seq(Seq("a", 1), Seq("b", 2)))
    // no rownames -> positional "1".."n" under the declared order
    val pos = Tibble.rownamesToColumn(df, "rid", Seq(col("k").asc))
    assertRows(pos.select("rid", "k").orderBy("k"),
      Seq(Seq("1", 1), Seq("2", 2)))
    intercept[IllegalArgumentException] {
      Tibble.rownamesToColumn(df, "rid") // declared order required
    }
  }

  test("set_colnames renames positionally; tibble_row builds one row") {
    val df = sqlDf("a" -> Seq(1), "b" -> Seq(2))
    assert(Tibble.setColnames(df, Seq("x", "y")).columns.toSeq == Seq("x", "y"))
    intercept[IllegalArgumentException] {
      Tibble.setColnames(df, Seq("only_one"))
    }
    assertRows(Tibble.tibbleRow(spark, "id" -> 7, "nm" -> "z"),
      Seq(Seq(7, "z")))
  }
}
