package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}

/** Explain audit for the §2.8 headline queries: the broadcast hints
  * must sit on dimension-sized inputs (filtered customer, region/
  * nation chain), never on a fact table (orders/lineitem) — a fact
  * broadcast works at sf0.001 and falls over at 100×. */
class HeadlinePlanSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private val tableByPrefix = Map("l" -> "lineitem", "o" -> "orders",
    "c" -> "customer", "s" -> "supplier", "p" -> "part",
    "n" -> "nation", "r" -> "region")

  private def hintedTables(name: String): Seq[Set[String]] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.analyzed.collect {
      case ResolvedHint(child, hints) if hints.strategy.isDefined =>
        child.collectLeaves()
          .flatMap(_.output.map(_.name.takeWhile(_ != '_')))
          .flatMap(tableByPrefix.get).toSet
    }
  }

  test("q3_topk broadcasts the filtered customer selection, not orders") {
    val hinted = hintedTables("q3_topk")
    assert(hinted.nonEmpty, "q3 lost its broadcast hint")
    assert(hinted.forall(t => !t.contains("orders") && !t.contains("lineitem")),
      s"fact table under a broadcast hint: $hinted")
    assert(hinted.exists(_.contains("customer")))
  }

  test("q5_region_revenue broadcasts only the dim chain") {
    val hinted = hintedTables("q5_region_revenue")
    assert(hinted.nonEmpty, "q5 lost its broadcast hints")
    assert(hinted.forall(t => !t.contains("orders") && !t.contains("lineitem")),
      s"fact table under a broadcast hint: $hinted")
  }

  test("q1_pricing pushes the shipdate filter into the parquet scan") {
    val df = SparkEntry.queries("q1_pricing")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed to scan:\n$plan")
  }
  test("q4_window plans ONE partitioned window — no global window, no extra shuffle") {
    val df = SparkEntry.queries("q4_window")(spark, dir)
    val plan = df.queryExecution.executedPlan
    val planStr = plan.toString
    // both running aggregates share one Window over PARTITION BY
    // l_orderkey — a missing partition spec would single-partition
    // the fact table (the WindowExec warning the verify guide flags)
    val windows = planStr.split("\n").filter(_.contains("Window "))
    assert(windows.nonEmpty, s"window lost:\n$planStr")
    assert(windows.forall(_.contains("l_orderkey")),
      s"unpartitioned window over the fact table:\n$planStr")
    // one hash-partitioned exchange feeds the window; the final
    // arrange is the only sort beyond the window's own
    val exchanges = planStr.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 window shuffle, got $exchanges:\n$planStr")
  }

  test("x_fix_mojibake stays a whole-stage-codegen projection (no shuffle, no window)") {
    val plan = SparkEntry.queries("x_fix_mojibake")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"repair pass must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    // the *(N) stage prefix IS whole-stage codegen in the compact
    // plan string — the repair projection must carry it
    val proj = plan.split("\n").find(_.contains("fix_mojibake")).get
    assert(proj.trim.stripPrefix("+- ").startsWith("*("),
      s"fix_mojibake fell out of codegen:\n$plan")
  }

  test("x_ks plans no global window and no cartesian product") {
    val plan = SparkEntry.queries("x_ks")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in KS:\n$plan")
    // the CDFs must come from the prefix scan, not a WindowExec over
    // the whole distinct-value frame
    assert(!plan.contains("Window"), s"window slipped into KS:\n$plan")
  }

  test("x_dedup_ensemble plans no cartesian product and keeps LSH banded") {
    val plan = SparkEntry.queries("x_dedup_ensemble")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_set") && !plan.contains("collect_list"),
      s"bucket pairing regressed to array materialization:\n$plan")
  }

  test("x_zorder stays a projection after the stats agg (no join, no window)") {
    val plan = SparkEntry.queries("x_zorder")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"z-value must not join or window:\n$plan")
  }
}
