package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** LLM-pipeline operator semantics + plan-shape (scale) asserts. */
class OpsSpec extends SparkTestBase {

  private def docs = sqlDf(
    "doc_id" -> Seq(1L, 2L, 3L, 4L),
    "text" -> Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",        // exact dup of 1
      "the quick brown fox jumped over the lazy dog",        // near dup of 1
      "completely different content about spark engines"))

  test("exact dedup groups identical content") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id")
    assertRows(out.select("keep_id", "n_copies"),
      Seq(Seq(1L, 2L), Seq(3L, 1L), Seq(4L, 1L)))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      w = 3, numPerm = 64, numBands = 16, threshold = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"unrelated doc paired: $pairs")
  }

  test("minhash pair generation is a join, not a per-bucket array materialization") {
    val plan = Dedup.minhashLsh(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_set") && !plan.contains("collect_list"),
      s"bucket pairing still materializes arrays:\n$plan")
  }

  test("dedupClusters merges transitive pairs into one component") {
    // chain 1-2, 2-3 plus isolated pair 5-6: components {1,2,3} and {5,6}
    val pairs = sqlDf("a" -> Seq(1L, 2L, 5L), "b" -> Seq(2L, 3L, 6L))
    val out = Dedup.dedupClusters(pairs).orderBy("doc_id")
    assertRows(out, Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(5L, 5L), Seq(6L, 5L)))
  }

  test("simhash near-dup respects its hamming radius guarantee") {
    val out = Dedup.simhashNearDup(docs, "doc_id", "text", maxDist = 3)
    val pairs = out.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))  // identical text -> distance 0
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(docs, "doc_id", "text", maxDist = 16)
    }
  }

  test("hamming64 counts bit differences") {
    val df = spark.range(1).select(Dedup.hamming64(lit(0L), lit(7L)).as("d"))
    assertRows(df, Seq(Seq(3)))
  }

  test("brute-force ANN: self is its own nearest neighbor with cosine 1") {
    val vecs = sqlDf("vec_id" -> Seq(1L, 2L, 3L))
      .withColumn("embedding",
        when(col("vec_id") === 1, array(lit(1.0), lit(0.0)))
          .when(col("vec_id") === 2, array(lit(0.9), lit(0.1)))
          .otherwise(array(lit(0.0), lit(1.0))))
    val out = Similarity.bruteForceTopKJoin(vecs, "vec_id", "embedding",
      vecs.filter(col("vec_id") === 1), "vec_id", "embedding", k = 2)
      .orderBy("rank")
    val top = out.collect()
    assert(top(0).getAs[Long]("neighbor_id") == 1L)
    assert(math.abs(top(0).getAs[Double]("cos") - 1.0) < 1e-9)
    assert(top(1).getAs[Long]("neighbor_id") == 2L)
  }

  test("LSH top-k finds an exact-match query vector (self-recall = 1)") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val q = vecs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val top = Similarity.lshTopKFrame(vecs, "vec_id", "embedding", q, k = 1, nPlanes = 8)
      .collect()(0)
    // the query IS corpus vector 0 → identical hyperplane bucket → found
    assert(top.getAs[Long]("vec_id") == 0L)
    assert(math.abs(top.getAs[Double]("cos") - 1.0) < 1e-9)
  }

  test("IVF top-k finds an exact-match query vector through its probed list") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (assigned, centroids) = Similarity.ivfIndex(vecs, "vec_id", "embedding", nLists = 4)
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"))
    val top = Similarity.ivfTopKFrame(assigned, centroids, "vec_id", "embedding",
      q, k = 1, nprobe = 1).collect()(0)
    assert(top.getAs[Long]("vec_id") == 0L)
  }

  test("fingerprint: identical docs share doc_fingerprint; different docs don't") {
    val out = TextAnalysis.fingerprint(docs, "text").select("doc_id", "doc_fingerprint")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(4L))
  }

  test("langId picks the dominant stopword profile") {
    val df = sqlDf("text" -> Seq(
      "the cat and the dog in the house of it is that for",
      "der hund und die katze ist ein tier zu mit von"))
    val out = df.select(TextAnalysis.langId(col("text")).as("l")).orderBy("l")
    assertRows(out, Seq(Seq("de"), Seq("en")))
  }

  test("langId kernel agrees with the Column-composition reference form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val both = docs.select(
      TextAnalysis.langId(col("text")).as("fast"),
      TextAnalysis.langIdColumns(col("text")).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("kernel functions are SQL-callable after extension registration") {
    graft.plans.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("docs_sql")
    val out = spark.sql(
      """SELECT doc_id, simhash(text) AS sig, lang_id(text) AS lang,
        |  size(minhash_signature(text, 3, 16)) AS nsig
        |FROM docs_sql ORDER BY doc_id""".stripMargin).collect()
    assert(out.length == 4)
    assert(out(0).getAs[Long]("sig") == out(1).getAs[Long]("sig")) // exact dups
    assert(out.forall(_.getAs[Int]("nsig") == 16))
    assert(out(0).getAs[String]("lang") == "en")
  }

  test("token counting: ws/bpe-ish/approx") {
    val df = sqlDf("text" -> Seq("Hello, world 42!"))
    val out = TextAnalysis.tokenCounts(df, "text")
      .select("ws_tokens", "bpe_ish_tokens", "approx_tokens")
    // ws: [Hello,] [world] [42!] = 3; bpe-ish: Hello , world 42 ! = 5; 16 chars/4 = 4
    assertRows(out, Seq(Seq(3, 5, 4L)))
  }
}
