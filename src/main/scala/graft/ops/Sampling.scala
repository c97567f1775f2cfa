package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (hash-based) sampling for training-data pipelines.
  *
  * `sample(fraction)` / TABLESAMPLE are nondeterministic under retries
  * and repartitioning — a re-run of a failed stage can emit a different
  * sample, which breaks exactly-once training-set construction. Hashing
  * a stable key instead makes the sample a pure filter: reproducible
  * across runs, engines and cluster layouts, trivially parallel, and
  * pushed down to the scan like any predicate.
  *
  * The bucket is the first 16 bits of md5(key) read as a hex string, so
  * the same selection is expressible in any engine with md5 (the rate
  * is quantized to 1/65536 granularity). Lexicographic order on the
  * fixed-width lowercase hex prefix equals numeric order, so the filter
  * is a plain string comparison — no bigint conversion needed.
  */
object Sampling {

  /** 4-hex-char (16-bit) bucket of a row key. */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** Threshold hex string for a rate in [0,1]: keep rows whose bucket
    * sorts strictly below it. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"sample rate must be in [0,1] (got $rate)")
    f"${math.min(math.round(rate * 65536.0), 65535L)}%04x"
  }

  /** Keep a deterministic `rate` fraction of rows, selected by md5 of
    * `key`. A pure filter: survives retries, pushes down. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    if (rate >= 1.0) df else df.filter(hashBucket(key) < lit(thresholdHex(rate)))

  /** Stratified deterministic sampling: a per-stratum rate (e.g.
    * downsample the dominant language, keep the rest), same hash-filter
    * mechanics. Strata not in `rates` use `defaultRate`. Rates are
    * plan-time literals — the predicate is a codegen'd when-chain, no
    * join, no shuffle. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (s, r)) => when(strata === s, lit(thresholdHex(r))).otherwise(acc)
    }
    df.filter(hashBucket(key) < thr)
  }
}
