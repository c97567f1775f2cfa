package graft

import org.apache.spark.sql.functions._
import graft.ops.Profiling

/** Misra–Gries heavy hitters: the exact regime (k ≥ cardinality) and
  * the adversarial regime's guarantees (presence above the frequency
  * threshold, bounded under-count, ≤ k state) under real partitioned
  * merges. */
class HeavyHitterSpec extends SparkTestBase {

  test("exact regime: k above the cardinality yields the exact count table, err_bound 0") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"key${i % 37}").toDF("s").repartition(8)
    val out = Profiling.heavyHitters(df, col("s"), k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 37)
    assert(out.forall(_._3 == 0L), "no decrement can fire below cardinality")
    val truth = df.groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (item, est, _) => assert(est == truth(item), item) }
    // sorted est desc, item asc
    assert(out.sortBy(e => (-e._2, e._1)).toSeq == out.toSeq)
  }

  test("adversarial k: state stays <= k, true heavy hitters survive, estimates under-count by <= err_bound") {
    import spark.implicits._
    // skewed stream: "hot" 40%, "warm" 20%, 400 distinct cold keys
    // sharing the rest — far more keys than counters
    val rows = Seq.fill(4000)("hot") ++ Seq.fill(2000)("warm") ++
      (1 to 4000).map(i => s"cold${i % 400}")
    val df = rows.toDF("s").repartition(13)
    val n = rows.size.toLong
    val k = 10
    val out = Profiling.heavyHitters(df, col("s"), k = k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length <= k, s"summary must hold at most k entries: ${out.length}")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val errBound = out.head._3
    assert(errBound >= 0L && errBound <= n / (k + 1))
    out.foreach { case (item, est, _) =>
      assert(est <= truth(item), s"$item must never over-count: $est > ${truth(item)}")
      assert(truth(item) - est <= errBound,
        s"$item under-counts past the bound: ${truth(item)} - $est > $errBound")
    }
    // anything above the N/(k+1) frequency threshold is guaranteed in
    val mustHave = truth.filter(_._2 > n / (k + 1)).keySet
    assert(mustHave.subsetOf(out.map(_._1).toSet),
      s"missing guaranteed heavy hitters: ${mustHave -- out.map(_._1).toSet}")
    assert(mustHave.contains("hot") && mustHave.contains("warm"),
      "test construction: hot and warm must be above threshold")
  }

  test("heavyHittersBy keeps one independent summary per stratum") {
    import spark.implicits._
    // stratum A: 50 distinct keys under k (exact); stratum B: skewed
    // past k — A must stay exact even though B decrements
    val rows = (1 to 500).map(i => ("A", s"a${i % 50}")) ++
      Seq.fill(400)(("B", "hotB")) ++ (1 to 400).map(i => ("B", s"b${i % 200}"))
    val df = rows.toDF("g", "s").repartition(9)
    val out = Profiling.heavyHittersBy(df, Seq("g"), col("s"), k = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val a = out.filter(_._1 == "A")
    assert(a.length == 50 && a.forall(_._4 == 0L), "stratum A is exact")
    assert(a.forall(_._3 == 10L))
    val b = out.filter(_._1 == "B")
    assert(b.length <= 64, "stratum B bounded by k")
    assert(b.exists(e => e._2 == "hotB" && e._3 <= 400L && e._3 >= 400L - b.head._4),
      s"B's heavy key survives with a bounded under-count: ${b.toSeq.take(3)}")
  }

  test("null keys are skipped; empty input yields an empty summary") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("s")
    val out = Profiling.heavyHitters(df, col("s"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 2L), ("b", 1L)))
    val empty = Profiling.heavyHitters(
      Seq.empty[String].toDF("s"), col("s"), k = 4)
    assert(empty.count() == 0)
  }
}
