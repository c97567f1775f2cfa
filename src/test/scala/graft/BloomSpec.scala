package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomPrune
import graft.plans.BloomKernels

/** Bloom build/probe kernel semantics + the exact-anti-join contract
  * and its plan shape. */
class BloomSpec extends SparkTestBase {

  test("bloom kernel: no false negatives, bounded false positives") {
    val bits = BloomKernels.optimalNumBits(10000, 0.01)
    val k = BloomKernels.optimalNumHashes(bits, 10000)
    val words = new Array[Long]((bits >>> 6).toInt)
    (0 until 10000).foreach(i => BloomKernels.set(words, i.toLong * 7919L, k))
    (0 until 10000).foreach { i =>
      assert(BloomKernels.mightContain(words, i.toLong * 7919L, k),
        s"false negative at $i")
    }
    // disjoint probe set: fp rate must sit near the configured 1%
    val fps = (0 until 10000).count(i =>
      BloomKernels.mightContain(words, 0x5DEECE66DL + i.toLong * 104729L, k))
    assert(fps < 300, s"false-positive rate ${fps / 10000.0} far above configured 0.01")
  }

  test("bloom build is bit-identical under any partitioning") {
    val df = spark.range(5000).select((col("id") * 31L).as("key"))
    def words(parts: Int): Seq[Array[Long]] = {
      val (bc, _) = BloomPrune.build(df.repartition(parts), col("key"), 5000, 0.01)
      Seq(bc.value)
    }
    assert(java.util.Arrays.equals(words(1).head, words(7).head),
      "word-wise OR merge must make the bitset partitioning-invariant")
  }

  test("sizing guard fails loudly past the broadcast envelope") {
    val e = intercept[IllegalArgumentException] {
      BloomKernels.optimalNumBits(2000000000L, 0.0001)
    }
    assert(e.getMessage.contains("MaxBits"))
  }

  test("bloom antiJoin equals plain left_anti, including NULL keys") {
    val existing = sqlDf(
      "doc_id" -> Seq(0L, 2L, 4L, 6L),
      "text" -> Seq("alpha", "beta", "gamma", null))
    val incoming = sqlDf(
      "doc_id" -> Seq(1L, 3L, 5L, 7L, 9L),
      "text" -> Seq("alpha", "delta", "beta", null, "epsilon"))
    val got = BloomPrune.antiJoin(incoming, existing, md5(col("text")))
      .orderBy("doc_id")
    val want = incoming.join(existing.select(md5(col("text")).as("__k")),
        col("__k") === md5(col("text")), "left_anti")
      .orderBy("doc_id")
    // NULL-keyed incoming rows survive on both paths (=== never matches NULL)
    assertRows(got, rowsOf(want))
    assert(rowsOf(got).map(_.head) == Seq(3L, 7L, 9L))
  }

  test("probe-negative branch carries no join and no shuffle") {
    val existing = spark.range(1000).select(concat(lit("e"), col("id")).as("text"))
    val (bc, k) = BloomPrune.build(existing, col("text"), 1000, 0.01)
    val incoming = spark.range(1000).select(concat(lit("n"), col("id")).as("text"))
    val clean = incoming.filter(!BloomPrune.mightContain(col("text"), bc, k))
    val plan = clean.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"definitely-new path must be a scan-resident filter:\n$plan")
    // and with disjoint corpora the filter keeps ~everything
    assert(clean.count() >= 980)
  }

  test("candidate sliver is fpp-sized for disjoint corpora") {
    val existing = spark.range(20000).select(concat(lit("e"), col("id")).as("text"))
    val incoming = spark.range(20000).select(concat(lit("n"), col("id")).as("text"))
    val (bc, k) = BloomPrune.build(existing, col("text"), 20000, 0.01)
    val candidates = incoming.filter(BloomPrune.mightContain(col("text"), bc, k)).count()
    assert(candidates < 600,
      s"$candidates of 20000 disjoint keys flagged maybe — fpp far above 0.01")
  }
}
