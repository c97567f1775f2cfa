package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Z-order layout: bit-exact interleave semantics + the actual
  * data-skipping win (per-file min/max boxes vs a single-key sort). */
class ZOrderSpec extends SparkTestBase {

  /** Scala reference: interleave bit j of column i at j*n + (n-1-i). */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    (for { (v, i) <- vals.zipWithIndex; j <- 0 until bits }
      yield ((v >> j) & 1L) << (j * n + (n - 1 - i))).sum
  }

  test("interleave matches the bit-level reference on seeded values") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(64)(rnd.nextInt(1 << 10).toLong)
    val ys = Seq.fill(64)(rnd.nextInt(1 << 10).toLong)
    val zs = Seq.fill(64)(rnd.nextInt(1 << 10).toLong)
    val df = sqlDf("x" -> xs, "y" -> ys, "z" -> zs)
    val got = df.select(
      ZOrder.interleave(Seq(col("x"), col("y"), col("z")), 10).as("m"))
      .collect().map(_.getLong(0)).toSeq
    val want = xs.indices.map(i => mortonRef(Seq(xs(i), ys(i), zs(i)), 10))
    assert(got == want)
  }

  test("interleave column 0 owns the most significant bits (curve splits on it first)") {
    val df = sqlDf("x" -> Seq(1L, 0L), "y" -> Seq(0L, 1L))
    val Seq(xTop, yTop) = df.select(
      ZOrder.interleave(Seq(col("x"), col("y")), 4).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(xTop > yTop, s"x-bit must outrank y-bit: $xTop vs $yTop")
  }

  test("bucketize is integer-exact, order-preserving, endpoint-tight") {
    val df = sqlDf("v" -> Seq(0L, 1L, 499L, 500L, 999L, 1000L))
    val got = df.select(ZOrder.bucketize(col("v"), 0L, 1000L, 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L && got.last == 255L, s"endpoints not tight: $got")
    assert(got == got.sorted, s"not monotone: $got")
    // constant column: span 0 maps everything to bucket 0
    val const = sqlDf("v" -> Seq(7L, 7L, 7L))
      .select(ZOrder.bucketize(col("v"), 7L, 7L, 8).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(const == Set(0L))
  }

  test("zorder_key SQL function equals the Column-form interleave") {
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT zorder_key(x, y, 8) AS z FROM VALUES (3L, 5L), (200L, 17L) t(x, y)")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = sqlDf("x" -> Seq(3L, 200L), "y" -> Seq(5L, 17L))
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol, s"SQL and Column forms diverge: $viaSql vs $viaCol")
  }

  test("withZValue is a projection after one min/max agg (no join, no window)") {
    val df = sqlDf("x" -> (0L until 64L), "y" -> (0L until 64L).map(v => 63L - v))
    val out = ZOrder.withZValue(df, Seq("x", "y"), bits = 6)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"z-value must be a pure projection:\n$plan")
    assert(out.count() == 64)
  }

  test("z-ordered files prune a 2-d box query that a single-key sort cannot") {
    val rnd = new scala.util.Random(13)
    val n = 4096
    val xs = Seq.fill(n)(rnd.nextInt(1024).toLong)
    val ys = Seq.fill(n)(rnd.nextInt(1024).toLong)
    val df = sqlDf("x" -> xs, "y" -> ys)
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    val zPath = new java.io.File(dir, "zord").getPath
    val xPath = new java.io.File(dir, "xsort").getPath
    ZOrder.zorderWrite(df, zPath, Seq("x", "y"), bits = 10, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)

    // files whose footer min/max range on `dim` intersects [lo, hi] —
    // the exact set a footer-pruning reader must open
    def filesTouched(path: String, dim: String, lo: Long, hi: Long): (Int, Int) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val touched = files.count { f =>
        val r = spark.read.parquet(f).agg(min(dim), max(dim)).head()
        !(r.getLong(1) < lo || r.getLong(0) > hi)
      }
      (touched, files.length)
    }
    // selective filter on y — the key a single-x sort gives NO file
    // stats for (every x-sorted file spans ~all of y), while the
    // z-layout bounds every file's y-range
    val (zy, zFiles) = filesTouched(zPath, "y", 100L, 160L)
    val (xy, xFiles) = filesTouched(xPath, "y", 100L, 160L)
    assert(zFiles >= 8 && xFiles >= 8, s"expected multi-file layouts: $zFiles/$xFiles")
    assert(xy == xFiles, s"x-sorted layout should NOT prune a y filter: $xy/$xFiles")
    assert(zy * 2 <= zFiles,
      s"z-order must prune at least half the files on y: $zy/$zFiles")
    // and the leading dimension still prunes under z (both keys serve)
    val (zx, _) = filesTouched(zPath, "x", 100L, 160L)
    assert(zx * 2 <= zFiles,
      s"z-order must also prune on x: $zx/$zFiles")
    // and the layout is lossless
    val back = spark.read.parquet(zPath)
    assert(back.count() == n)
    assert(back.columns.sorted.toSeq == Seq("x", "y"))
  }

  test("zorderAppend clusters deltas on the stored grid; combined table stays prunable and lossless") {
    val rnd = new scala.util.Random(29)
    val n = 4096
    val df = sqlDf(
      "x" -> Seq.fill(n)(rnd.nextInt(1024).toLong),
      "y" -> Seq.fill(n)(rnd.nextInt(1024).toLong))
    val dir = java.nio.file.Files.createTempDirectory("graft_zinc").toFile
    val path = new java.io.File(dir, "zord").getPath
    // base = 3/4 of the rows, written with domain-wide explicit bounds;
    // delta = the remaining quarter appended on the stored grid
    val base = df.filter(col("x") % 4 =!= 0)
    val delta = df.filter(col("x") % 4 === 0)
    ZOrder.zorderWrite(base, path, Seq("x", "y"), bits = 10, numFiles = 12,
      gridBounds = Some(Seq((0L, 1023L), (0L, 1023L))))
    val filesBefore = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    ZOrder.zorderAppend(delta, path, numFiles = 8)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == filesBefore + 8,
      s"append adds exactly numFiles new files: ${files.length} vs $filesBefore+8")
    // losslessness: base + delta round-trips exactly
    val back = spark.read.parquet(path)
    assert(back.count() == n)
    assert(back.agg(sum("x"), sum("y")).head() ==
      df.agg(sum("x"), sum("y")).head())
    // pruning still works ACROSS old and new files: a selective y-box
    // touches at most half of all files (appended ones included)
    def touched(dim: String, lo: Long, hi: Long): Int = files.count { f =>
      val r = spark.read.parquet(f).agg(min(dim), max(dim)).head()
      !(r.isNullAt(0) || r.getLong(1) < lo || r.getLong(0) > hi)
    }
    // (delta files are coarser — 1024 rows over 8 files — so the bound
    // is 60%, not the base layout's 50%)
    assert(touched("y", 100L, 160L) * 5 <= files.length * 3,
      s"combined layout must still prune on y: ${touched("y", 100L, 160L)}/${files.length}")
    assert(touched("x", 100L, 160L) * 5 <= files.length * 3,
      s"combined layout must still prune on x: ${touched("x", 100L, 160L)}/${files.length}")
  }

  test("zorderAppend clamps out-of-grid keys to edge buckets without losing rows") {
    val df = sqlDf("x" -> (0L until 256L), "y" -> (0L until 256L).map(v => 255L - v))
    val dir = java.nio.file.Files.createTempDirectory("graft_zclamp").toFile
    val path = new java.io.File(dir, "zord").getPath
    ZOrder.zorderWrite(df, path, Seq("x", "y"), bits = 8, numFiles = 4)
    // delta whose keys drifted past the base grid's bounds
    val drift = sqlDf("x" -> Seq(5000L, 6000L), "y" -> Seq(-50L, 9000L))
    ZOrder.zorderAppend(drift, path, numFiles = 1)
    val back = spark.read.parquet(path)
    assert(back.count() == 258)
    // the drifted rows are present verbatim (clamping affects only
    // placement on the curve, never stored values)
    assert(back.filter(col("x") === 5000L && col("y") === -50L).count() == 1)
    assert(back.filter(col("x") === 6000L && col("y") === 9000L).count() == 1)
  }

  test("zorderAppend refuses a directory without grid metadata") {
    val df = sqlDf("x" -> Seq(1L, 2L), "y" -> Seq(3L, 4L))
    val dir = java.nio.file.Files.createTempDirectory("graft_znometa").toFile
    val path = new java.io.File(dir, "plain").getPath
    df.write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException] {
      ZOrder.zorderAppend(df, path, numFiles = 1)
    }
    assert(e.getMessage.contains("_zorder_meta.json"))
  }
}
