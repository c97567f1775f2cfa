package graft

import org.apache.spark.sql.functions._

/** Diagnostic (not part of the perf contract): where does minhash
  * spend its time, and does the plan reuse the signature exchange? */
class MinhashPlanDebug extends SparkTestBase {
  test("minhash plan: count exchanges and signature computations") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = graft.ops.Dedup.minhashLsh(docs, "doc_id", "text")
    val plan = q.queryExecution.executedPlan.toString
    val nExchange = "Exchange".r.findAllIn(plan).length
    val nScan = "FileScan".r.findAllIn(plan).length
    val nXxhash = "xxhash64".r.findAllIn(plan).length
    info(s"exchanges=$nExchange scans=$nScan xxhash64-sites=$nXxhash planLen=${plan.length}")
    val t0 = System.nanoTime()
    q.count()
    info(f"exec=${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
