package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.{BloomBuildAgg, BloomKernels, BloomMightContainExpr}

/** Bloom-pruned EXACT anti-join: "remove from the incoming corpus
  * everything already present in the existing corpus", for existing
  * sides too large to broadcast raw and incoming sides too large to
  * want a full shuffle.
  *
  * Topology (the cross-corpus dedup shape of an incremental-crawl
  * pipeline):
  *   1. ONE partial aggregate over the existing keys builds a Bloom
  *      bitset (~10 bits/key at 1% fpp; word-wise OR merge, so the
  *      shuffle carries #partitions bitsets, never keys).
  *   2. The incoming scan probes the torrent-broadcast bitset inside
  *      whole-stage codegen. Probe-negative rows are DEFINITELY new —
  *      they exit through a scan-resident filter with NO shuffle.
  *   3. Only probe-positive rows (true duplicates + the fpp sliver)
  *      enter a real LEFT ANTI join against the existing keys, which
  *      removes the false positives. The result is therefore EXACT:
  *      bit-identical to `incoming LEFT ANTI JOIN existing ON key` —
  *      the bloom only re-routes rows between the cheap and expensive
  *      exits.
  *
  * At 100 TB: a 10⁹-key existing side compresses to ~1.2 GiB of
  * bitset (hard-capped at [[BloomKernels.MaxBits]] = 1 GiB with a loud
  * failure + sharding recipe); the anti-join shuffle shrinks from
  * |incoming| rows to |dups| + fpp·|incoming| rows. With a 1%-dup
  * crawl at fpp=0.01, that is a 50× smaller shuffle for one extra
  * column scan of the existing side.
  *
  * NULL keys follow LEFT ANTI semantics end-to-end: `===` never
  * matches NULL, so NULL-keyed incoming rows are always kept —
  * identical on both the pruned and non-pruned paths.
  */
object BloomPrune {

  /** Build a broadcast Bloom bitset of `xxhash64(key)` over `df`.
    * Returns the broadcast words + the probe count. `expectedItems`
    * sizes the filter; pass the (estimated) existing-side key count —
    * a 2× over-estimate costs 2× bits, an under-estimate only raises
    * fpp (never correctness, since the anti-join confirms). */
  def build(df: DataFrame, key: Column, expectedItems: Long,
            fpp: Double = 0.01): (Broadcast[Array[Long]], Int) = {
    val numBits = BloomKernels.optimalNumBits(expectedItems, fpp)
    val numHashes = BloomKernels.optimalNumHashes(numBits, expectedItems)
    val agg = ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expr(xxhash64(key)), numBits, numHashes)
        .toAggregateExpression())
    val bytes = df.agg(agg.as("bloom")).head().getAs[Array[Byte]](0)
    val bc = df.sparkSession.sparkContext.broadcast(BloomKernels.bytesToWords(bytes))
    (bc, numHashes)
  }

  /** Probe column: true iff `key` MIGHT be in the filter (false ⇒
    * definitely absent). */
  def mightContain(key: Column, bloom: Broadcast[Array[Long]], numHashes: Int): Column =
    ColumnBridge.column(
      BloomMightContainExpr(ColumnBridge.expr(xxhash64(key)), bloom, numHashes))

  /** Rows of `incoming` whose `key` does not appear in `existing` —
    * exact LEFT ANTI semantics at bloom cost. `key` is an expression
    * over columns present in BOTH frames (e.g. `md5(col("text"))`).
    * `expectedItems <= 0` auto-sizes from `existing.count()` (cheap on
    * columnar sources; pass the known estimate in a real pipeline). */
  def antiJoin(incoming: DataFrame, existing: DataFrame, key: Column,
               expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val n = if (expectedItems > 0) expectedItems
            else math.max(existing.count(), 1L)
    val (bloom, numHashes) = build(existing, key, n, fpp)
    val flagged = incoming.withColumn("__bloom_maybe", mightContain(key, bloom, numHashes))
    val definitelyNew = flagged.filter(!col("__bloom_maybe"))
    val candidates = flagged.filter(col("__bloom_maybe"))
    // distinct existing keys: the anti-join only needs membership, and
    // distinct-first keeps the shuffled build side minimal
    val existingKeys = existing.select(key.as("__bloom_ek")).distinct()
    val confirmedNew = candidates.join(existingKeys, col("__bloom_ek") === key, "left_anti")
    definitelyNew.unionByName(confirmedNew).drop("__bloom_maybe")
  }
}
