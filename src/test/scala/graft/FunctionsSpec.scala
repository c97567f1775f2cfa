package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** base-R function facade semantics (reference: tests/base). */
class FunctionsSpec extends SparkTestBase {

  test("sub replaces the TRUE first regex match, not an earlier literal copy") {
    val df = sqlDf("s" -> Seq("abcab"))
    // sub('ab$', 'X', 'abcab') must yield 'abcX' (anchor matches the 2nd ab)
    assertRows(df.select(StringFns.subFirst(col("s"), "ab$", "X")), Seq(Seq("abcX")))
    // unanchored: first occurrence replaced once
    assertRows(df.select(StringFns.subFirst(col("s"), "ab", "X")), Seq(Seq("Xcab")))
    // no match: unchanged
    assertRows(df.select(StringFns.subFirst(col("s"), "zz", "X")), Seq(Seq("abcab")))
  }

  test("gsub replaces all matches") {
    assertRows(sqlDf("s" -> Seq("aaa")).select(StringFns.gsub(col("s"), "a", "b")),
      Seq(Seq("bbb")))
  }

  test("substr uses R 1-based inclusive-stop semantics") {
    assertRows(sqlDf("s" -> Seq("abcdef")).select(StringFns.substrOf(col("s"), 2, 4)),
      Seq(Seq("bcd")))
  }

  test("strtoi parses non-decimal bases") {
    assertRows(sqlDf("s" -> Seq("ff")).select(StringFns.strtoi(col("s"), 16)),
      Seq(Seq(255L)))
  }

  test("lgamma/digamma special functions are accurate") {
    val out = sqlDf("x" -> Seq(5.0))
      .select(round(BaseFns.lgammaOf(col("x")), 9).as("lg"),
        round(BaseFns.digammaOf(col("x")), 6).as("dg"))
      .collect()(0)
    assert(math.abs(out.getDouble(0) - math.log(24.0)) < 1e-8) // lgamma(5)=log(4!)
    assert(math.abs(out.getDouble(1) - 1.506118) < 1e-5)       // digamma(5)
  }

  test("case_when falls through in order with default") {
    val df = sqlDf("x" -> Seq(1, 5, 20))
    val out = df.select(CondFns.caseWhen(
      Seq((col("x") < 3) -> lit("lo"), (col("x") < 10) -> lit("mid")),
      lit("hi")).as("b")).orderBy(col("b"))
    assertRows(out, Seq(Seq("hi"), Seq("lo"), Seq("mid")))
  }

  test("recode maps values with passthrough for unmatched") {
    val df = sqlDf("x" -> Seq("a", "b", "z"))
    val out = df.select(CondFns.recode(col("x"),
      Map[Any, Any]("a" -> "A", "b" -> "B")).as("r")).orderBy("r")
    assertRows(out, Seq(Seq("A"), Seq("B"), Seq("z")))
  }
}
