package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hilbert, ZOrder}
import graft.plans.LayoutKernels

/** Hilbert-curve layout: the curve's defining properties (bijection +
  * unit-step adjacency, exhaustively), then the actual file-skipping
  * behavior of hilbertWrite/hilbertAppend. */
class LayoutSpec extends SparkTestBase {

  private def allCells(n: Int, bits: Int): Seq[Array[Long]] = {
    val side = 1L << bits
    def rec(d: Int): Seq[List[Long]] =
      if (d == 0) Seq(Nil)
      else for { rest <- rec(d - 1); v <- 0L until side } yield v :: rest
    rec(n).map(_.toArray)
  }

  test("hilbertIndex is a bijection onto [0, 2^(n*bits)) in 2-D, 3-D, and 4-D") {
    for ((n, bits) <- Seq((2, 6), (3, 3), (4, 3))) {
      val cells = allCells(n, bits)
      val idx = cells.map(c => LayoutKernels.hilbertIndex(c, bits))
      assert(idx.toSet.size == cells.size, s"n=$n bits=$bits: collisions")
      assert(idx.min == 0L && idx.max == cells.size - 1L,
        s"n=$n bits=$bits: range [${idx.min}, ${idx.max}]")
    }
  }

  test("consecutive Hilbert indices are ALWAYS adjacent cells (the property Z lacks)") {
    for ((n, bits) <- Seq((2, 6), (3, 3), (4, 3))) {
      val cells = allCells(n, bits)
      val byIdx = cells.map(c => LayoutKernels.hilbertIndex(c, bits) -> c)
        .sortBy(_._1).map(_._2)
      val bad = (1 until byIdx.size).filterNot { d =>
        val steps = byIdx(d).zip(byIdx(d - 1)).map { case (a, b) => math.abs(a - b) }
        steps.sum == 1L // exactly one coord moves, by exactly one
      }
      assert(bad.isEmpty, s"n=$n bits=$bits: non-adjacent steps at $bad")
      // and the Z curve genuinely lacks it — otherwise Hilbert buys nothing
      val zByIdx = cells.map { c =>
        val z = c.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
          acc | (0 until bits).foldLeft(0L)((a, j) =>
            a | (((v >> j) & 1L) << (j * n + (n - 1 - i))))
        }
        z -> c
      }.sortBy(_._1).map(_._2)
      val zJumps = (1 until zByIdx.size).count { d =>
        zByIdx(d).zip(zByIdx(d - 1)).map { case (a, b) => math.abs(a - b) }.sum > 1L
      }
      assert(zJumps > 0, s"n=$n bits=$bits: Z should have non-unit jumps")
    }
  }

  test("hilbertValue column form matches the kernel; pure projection plan") {
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(256)(rnd.nextInt(256).toLong)
    val ys = Seq.fill(256)(rnd.nextInt(256).toLong)
    val df = sqlDf("x" -> xs, "y" -> ys)
    val out = df.withColumn("h", Hilbert.hilbertValue(Seq(col("x"), col("y")), 8))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, h) =>
      assert(h == LayoutKernels.hilbertIndex(Array(x, y), 8), s"($x,$y)")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"hilbert value must be a pure projection:\n$plan")
  }

  test("hilbert_key SQL function equals the Column-form hilbertValue") {
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT hilbert_key(x, y, 8) AS h FROM VALUES (3L, 5L), (200L, 17L) t(x, y)")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = sqlDf("x" -> Seq(3L, 200L), "y" -> Seq(5L, 17L))
      .select(Hilbert.hilbertValue(Seq(col("x"), col("y")), 8).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol, s"SQL and Column forms diverge: $viaSql vs $viaCol")
  }

  test("hilbert-laid files prune 2-d box queries at least as hard as the spec's z bound") {
    val rnd = new scala.util.Random(13)
    val n = 4096
    val df = sqlDf(
      "x" -> Seq.fill(n)(rnd.nextInt(1024).toLong),
      "y" -> Seq.fill(n)(rnd.nextInt(1024).toLong))
    val dir = java.nio.file.Files.createTempDirectory("graft_hilbert").toFile
    val path = new java.io.File(dir, "hil").getPath
    Hilbert.hilbertWrite(df, path, Seq("x", "y"), bits = 10, numFiles = 16)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 16)
    def touched(dim: String, lo: Long, hi: Long): Int = files.count { f =>
      val r = spark.read.parquet(f).agg(min(dim), max(dim)).head()
      !(r.getLong(1) < lo || r.getLong(0) > hi)
    }
    // both dimensions prune — the multi-dimensional promise
    assert(touched("y", 100L, 160L) * 2 <= files.length,
      s"hilbert must prune on y: ${touched("y", 100L, 160L)}/${files.length}")
    assert(touched("x", 100L, 160L) * 2 <= files.length,
      s"hilbert must prune on x: ${touched("x", 100L, 160L)}/${files.length}")
    // lossless
    val back = spark.read.parquet(path)
    assert(back.count() == n)
    assert(back.agg(sum("x"), sum("y")).head() == df.agg(sum("x"), sum("y")).head())
  }

  test("hilbertAppend clusters deltas on the stored grid; lossless; refuses no-meta dirs") {
    val df = sqlDf("x" -> (0L until 512L), "y" -> (0L until 512L).map(v => 511L - v))
    val dir = java.nio.file.Files.createTempDirectory("graft_hinc").toFile
    val path = new java.io.File(dir, "hil").getPath
    Hilbert.hilbertWrite(df.filter(col("x") < 384L), path, Seq("x", "y"),
      bits = 9, numFiles = 6, gridBounds = Some(Seq((0L, 511L), (0L, 511L))))
    Hilbert.hilbertAppend(df.filter(col("x") >= 384L), path, numFiles = 2)
    val back = spark.read.parquet(path)
    assert(back.count() == 512)
    assert(back.agg(sum("x")).head().getLong(0) == (0L until 512L).sum)
    // out-of-grid drift clamps, rows stored verbatim
    Hilbert.hilbertAppend(sqlDf("x" -> Seq(9999L), "y" -> Seq(-7L)), path, 1)
    assert(spark.read.parquet(path)
      .filter(col("x") === 9999L && col("y") === -7L).count() == 1)
    val plain = new java.io.File(dir, "plain").getPath
    df.limit(2).write.parquet(plain)
    val e = intercept[IllegalArgumentException] {
      Hilbert.hilbertAppend(df.limit(2), plain, numFiles = 1)
    }
    assert(e.getMessage.contains("_hilbert_meta.json"))
  }
}
