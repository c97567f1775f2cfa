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

  test("bessel approximations match reference values to 1e-6") {
    val out = sqlDf("x" -> Seq(1.0))
      .select(BaseFns.besselJ0(col("x")), BaseFns.besselJ1(col("x")),
        BaseFns.besselI0(col("x")), BaseFns.besselI1(col("x")))
      .collect()(0)
    assert(math.abs(out.getDouble(0) - 0.7651976866) < 1e-6) // J0(1)
    assert(math.abs(out.getDouble(1) - 0.4400505857) < 1e-6) // J1(1)
    assert(math.abs(out.getDouble(2) - 1.2660658778) < 1e-6) // I0(1)
    assert(math.abs(out.getDouble(3) - 0.5651591040) < 1e-6) // I1(1)
    // large-argument branch (ax >= 8)
    val big = sqlDf("x" -> Seq(10.0))
      .select(BaseFns.besselJ0(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(big - (-0.2459357645)) < 1e-6) // J0(10)
    // K and Y families
    val ky = sqlDf("x" -> Seq(1.0))
      .select(BaseFns.besselK0(col("x")), BaseFns.besselK1(col("x")),
        BaseFns.besselY0(col("x")), BaseFns.besselY1(col("x"))).collect()(0)
    assert(math.abs(ky.getDouble(0) - 0.4210244382) < 1e-6) // K0(1)
    assert(math.abs(ky.getDouble(1) - 0.6019072302) < 1e-6) // K1(1)
    assert(math.abs(ky.getDouble(2) - 0.0882569642) < 1e-6) // Y0(1)
    assert(math.abs(ky.getDouble(3) - (-0.7812128213)) < 1e-6) // Y1(1)
  }

  test("trigamma matches reference values; psigamma dispatches") {
    val out = sqlDf("x" -> Seq(1.0, 5.0))
      .select(col("x"), round(BaseFns.trigammaOf(col("x")), 8).as("tg"))
      .orderBy("x").collect()
    assert(math.abs(out(0).getDouble(1) - 1.64493407) < 1e-6) // pi^2/6
    assert(math.abs(out(1).getDouble(1) - 0.22132295) < 1e-6) // trigamma(5)
    intercept[IllegalArgumentException] { BaseFns.psigammaOf(lit(1.0), 2) }
  }

  test("row-wise stats compute across columns per row") {
    val df = sqlDf("a" -> Seq(1.0), "b" -> Seq(5.0), "c" -> Seq(3.0))
    val r = df.select(
      BaseFns.rowSums(col("a"), col("b"), col("c")),
      BaseFns.rowMeans(col("a"), col("b"), col("c")),
      BaseFns.rowMedians(col("a"), col("b"), col("c")),
      round(BaseFns.rowSds(col("a"), col("b"), col("c")), 6)).collect()(0)
    assert(r.getDouble(0) == 9.0 && r.getDouble(1) == 3.0 && r.getDouble(2) == 3.0)
    assert(r.getDouble(3) == 2.0) // sd of 1,5,3 = 2
  }

  test("mod follows R sign-of-divisor semantics; intDiv floors") {
    val df = sqlDf("x" -> Seq(5.0), "y" -> Seq(-2.0))
    val r = df.select(BaseFns.modOf(col("x"), col("y")),
      BaseFns.intDiv(col("x"), col("y"))).collect()(0)
    assert(r.getDouble(0) == -1.0) // 5 %% -2 = -1 in R
    assert(r.getDouble(1) == -3.0) // 5 %/% -2 = -3
  }

  test("cov/cor exact recipes match hand-computed values") {
    val df = sqlDf("x" -> Seq(1.0, 2.0, 3.0), "y" -> Seq(2.0, 4.0, 7.0))
    val r = df.select(BaseFns.covExact(col("x"), col("y")),
      round(BaseFns.corExact(col("x"), col("y")), 9)).collect()(0)
    assert(math.abs(r.getDouble(0) - 2.5) < 1e-12)       // cov = 2.5
    assert(math.abs(r.getDouble(1) - 0.99339927) < 1e-6) // cor
  }

  test("seeded runif/rnorm are deterministic and in range") {
    val df = spark.range(1000)
      .select(BaseFns.runifCol(42L, 0.0, 10.0).as("u"), BaseFns.rnormCol(42L).as("z"))
    val stats = df.agg(min("u"), max("u"), avg("z")).collect()(0)
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 10.0)
    assert(math.abs(stats.getDouble(2)) < 0.2) // mean ~ 0
    // determinism: same seed, same values
    val a = df.collect().map(_.getDouble(0)).toSeq
    val b = spark.range(1000).select(BaseFns.runifCol(42L, 0.0, 10.0)).collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("seeded rpois/rbinom match their distributions' moments") {
    val df = spark.range(20000).select(
      BaseFns.rpoisCol(BaseFns.hashUnif(col("id"), 43L), lambda = 4.0).as("p"),
      BaseFns.rbinomCol(BaseFns.hashUnif(col("id"), 44L), n = 20, prob = 0.3).as("b"))
    val r = df.agg(avg("p"), variance("p"), avg("b"), min("p"), min("b"), max("b")).collect()(0)
    assert(math.abs(r.getDouble(0) - 4.0) < 0.1)  // E[Pois(4)] = 4
    assert(math.abs(r.getDouble(1) - 4.0) < 0.25) // Var[Pois(4)] = 4
    assert(math.abs(r.getDouble(2) - 6.0) < 0.1)  // E[Bin(20,.3)] = 6
    assert(r.getInt(3) >= 0 && r.getInt(4) >= 0 && r.getInt(5) <= 20)
  }

  test("append inserts values at an R 1-based position; lengths counts") {
    val df = sqlDf("s" -> Seq("a b c"))
    val words = split(col("s"), " ")
    val out = df.select(
      concat_ws("|", SeqFns.appendArr(words, array(lit("zz")), after = 1)).as("mid"),
      concat_ws("|", SeqFns.appendArr(words, array(lit("zz")), after = 0)).as("pre"),
      concat_ws("|", SeqFns.appendArr(words, array(lit("zz")), after = 3)).as("post"),
      SeqFns.lengthsOf(words).as("len"))
    assertRows(out, Seq(Seq("a|zz|b|c", "zz|a|b|c", "a|b|c|zz", 3)))
  }

  test("inverse hyperbolics match the ln identities") {
    val df = sqlDf("x" -> Seq(0.5))
    val r = df.select(BaseFns.asinhOf(col("x")), BaseFns.acoshOf(lit(2.0)),
      BaseFns.atanhOf(col("x"))).collect()(0)
    assert(math.abs(r.getDouble(0) - math.log(0.5 + math.sqrt(1.25))) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.log(2.0 + math.sqrt(3.0))) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.5 * math.log(3.0)) < 1e-12)
  }

  test("recode maps values with passthrough for unmatched") {
    val df = sqlDf("x" -> Seq("a", "b", "z"))
    val out = df.select(CondFns.recode(col("x"),
      Map[Any, Any]("a" -> "A", "b" -> "B")).as("r")).orderBy("r")
    assertRows(out, Seq(Seq("A"), Seq("B"), Seq("z")))
  }

  test("make_names / make_unique follow the R conventions") {
    import graft.functions.StringFns
    assert(StringFns.makeNames(Seq("a b", "1x", ".2y", "ok.name", "")) ==
      Seq("a.b", "X1x", "X.2y", "ok.name", "X"))
    assert(StringFns.makeUnique(Seq("a", "b", "a", "a", "b")) ==
      Seq("a", "b", "a.1", "a.2", "b.1"))
  }

  test("dtype predicates read the schema; is_true/is_false are null-safe") {
    import org.apache.spark.sql.functions._
    import graft.functions.TypeFns
    val df = sqlDf("s" -> Seq("a"), "d" -> Seq(1.5), "i" -> Seq(1),
      "b" -> Seq(true)).withColumn("arr", array(col("i")))
    assert(TypeFns.isCharacter(df, "s") && !TypeFns.isCharacter(df, "d"))
    assert(TypeFns.isDouble(df, "d") && !TypeFns.isDouble(df, "i"))
    assert(TypeFns.isInteger(df, "i") && !TypeFns.isInteger(df, "d"))
    assert(TypeFns.isLogical(df, "b") && !TypeFns.isLogical(df, "s"))
    assert(TypeFns.isNumeric(df, "d") && TypeFns.isNumeric(df, "i") &&
      !TypeFns.isNumeric(df, "s"))
    assert(TypeFns.isAtomic(df, "s") && !TypeFns.isAtomic(df, "arr"))
    val r = sqlDf("x" -> Seq[Any](true, false, null))
      .select(TypeFns.isTrue(col("x")), TypeFns.isFalse(col("x")),
        TypeFns.asNumeric(col("x").cast("int"))).collect()
    assert(r.map(_.getBoolean(0)).toSeq == Seq(true, false, false))
    assert(r.map(_.getBoolean(1)).toSeq == Seq(false, true, false))
    assert(r(0).getDouble(2) == 1.0)
  }

  test("colMedians: exact type-7 medians in one aggregate") {
    import org.apache.spark.sql.functions._
    val df = sqlDf("a" -> Seq(1.0, 2.0, 3.0, 10.0), "b" -> Seq(5.0, 1.0, 9.0, 7.0))
    val meds = graft.functions.BaseFns.colMedians(col("a"), col("b"))
    val r = df.agg(meds(0).as("ma"), meds(1).as("mb")).head()
    assert(r.getDouble(0) == 2.5 && r.getDouble(1) == 6.0)
  }

  test("complex struct encoding: Mod/Arg/Conj and field arithmetic") {
    import ComplexFns._
    val df = sqlDf("re" -> Seq(3.0), "im" -> Seq(4.0))
    val z = asComplex(col("re"), col("im"))
    val w = asComplex(lit(1.0), lit(-1.0))
    val r = df.select(
      modOf(z), argOf(z), imOf(conj(z)),
      reOf(cMul(z, w)), imOf(cMul(z, w)),
      reOf(cDiv(z, w)), imOf(cDiv(z, w)),
      reOf(cAdd(z, w)), imOf(cSub(z, w))).collect()(0)
    assert(r.getDouble(0) == 5.0)                                 // |3+4i|
    assert(math.abs(r.getDouble(1) - math.atan2(4.0, 3.0)) < 1e-15)
    assert(r.getDouble(2) == -4.0)
    assert(r.getDouble(3) == 7.0 && r.getDouble(4) == 1.0)        // (3+4i)(1-i)
    assert(r.getDouble(5) == -0.5 && r.getDouble(6) == 3.5)       // (3+4i)/(1-i)
    assert(r.getDouble(7) == 4.0 && r.getDouble(8) == 5.0)
  }
}
