package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew/scale join helpers (SURVEY §5).
  *
  * AQE's skew-join split handles most runtime skew; these are for the
  * pathological cases known AT PLAN TIME (a handful of hot keys owning
  * a large fraction of a 100 TB fact table), where pre-salting avoids
  * even building the skewed partitions.
  */
object ScaleJoins {

  /** Salted equi-join: the big (skewed) side gets a deterministic
    * random salt in [0, salt); the small side is replicated `salt`
    * times so every (key, salt) bucket finds its match. Result equals
    * the plain join; the shuffle key becomes (by..., salt), splitting
    * each hot key across `salt` reducers. Cost: small side × salt —
    * keep the replicated side dimension-sized. */
  def saltedJoin(big: DataFrame, small: DataFrame, by: Seq[String],
                 how: String = "inner", salt: Int = 16,
                 seed: Long = 42L): DataFrame = {
    require(how == "inner" || how == "left",
      "saltedJoin: replicating the small side preserves only inner/left semantics")
    val bigS = big.withColumn("__salt", (rand(seed) * salt).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, by :+ "__salt", how).drop("__salt")
  }

  /** Write a frame bucketed+sorted by its join key so repeated joins
    * on that key are co-located (no shuffle at read time — Spark's
    * bucketed-scan join). Registers `table` in the session catalog. */
  def bucketize(df: DataFrame, by: Seq[String], nBuckets: Int,
                table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, by.head, by.tail: _*)
      .sortBy(by.head, by.tail: _*)
      .saveAsTable(table)
}
