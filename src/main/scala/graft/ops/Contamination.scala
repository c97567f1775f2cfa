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
}
