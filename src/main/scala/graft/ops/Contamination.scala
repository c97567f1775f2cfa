package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set (the standard n-gram-overlap
  * test-set contamination check used when assembling LLM training
  * corpora).
  *
  * Scale shape: both sides reduce to (doc, distinct n-gram) via a
  * single projection + explode — the n-grams of a 100 TB corpus are
  * never materialized beyond one shuffle keyed by the gram. The eval
  * side is aggregated to a distinct-gram set first (eval suites are
  * tiny relative to the corpus — typically broadcastable; the hint is
  * applied, with AQE falling back to a shuffle join if it grows). The
  * output is doc-grain: total grams, contaminated grams, and the flag.
  */
object Contamination {

  /** @param train training documents (id, text)
    * @param test  held-out documents whose n-grams must not leak
    * @param n     n-gram width in words (13 is the common contamination
    *              standard; short synthetic docs want less)
    */
  def decontaminate(train: DataFrame, test: DataFrame, id: String,
                    text: String, n: Int = 13): DataFrame = {
    def docGrams(df: DataFrame) = df.select(col(id),
      explode(array_distinct(Dedup.shinglesFast(col(text), n)))
        .as("gram"))

    val testGrams = docGrams(test).select("gram").distinct()
    docGrams(train)
      .join(broadcast(testGrams.withColumn("__hit", lit(1))), Seq("gram"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).as("n_contaminated"))
      .withColumn("contam_frac",
        col("n_contaminated").cast("double") / col("n_grams").cast("double"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** SEMANTIC decontamination — the embedding-level complement: a
    * paraphrased benchmark item shares no 13-gram with its source, so
    * the n-gram test misses it; a corpus vector within `threshold`
    * cosine of ANY benchmark vector is flagged instead. Per corpus
    * row: the best-matching benchmark item and its cosine.
    *
    * Shape: the benchmark side is SMALL BY CONTRACT (eval suites) and
    * broadcasts; the corpus is scanned once with a per-row argmax over
    * the broadcast rows (max_by struct — no shuffle, no window), so
    * the plan is a mapper at any corpus scale. For benchmark sets too
    * large to broadcast, run the LSH/IVF retrieval path instead and
    * threshold its candidates.
    * Output: (id, best_bench_id, best_cos, contaminated). */
  def decontaminateSemantic(corpus: DataFrame, id: String, vec: String,
                            bench: DataFrame, benchId: String, benchVec: String,
                            threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"decontaminateSemantic: threshold must be in (0,1] (got $threshold)")
    val b = broadcast(bench.select(col(benchId).as("__bid"),
      col(benchVec).cast("array<double>").as("__bv")))
    corpus.select(col(id), col(vec).cast("array<double>").as("__v"))
      .join(b)
      .withColumn("__cos", Similarity.cosine(col("__v"), col("__bv")))
      .groupBy(col(id))
      .agg(max_by(struct(col("__cos").as("c"), col("__bid").as("b")),
        // ties resolve to the LOWEST bench id: order by (cos, -bid)
        struct(col("__cos"), (-col("__bid")).as("nb"))).as("__best"))
      .select(col(id), col("__best.b").as("best_bench_id"),
        col("__best.c").as("best_cos"),
        (col("__best.c") >= threshold).as("contaminated"))
  }
}
