package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Distributed Bloom-filter build + probe for semi/anti-join pruning.
  *
  * The 100 TB shape this serves: an incoming corpus must be checked
  * against an EXISTING key set that is far too large to broadcast raw
  * (10⁸–10⁹ content hashes) but whose membership can be compressed to
  * ~10 bits/key. The build is one partial aggregate (word-wise OR is
  * associative and commutative, so map-side combine does almost all
  * the work and the shuffle carries #partitions fixed-size bitsets,
  * not keys); the probe is a broadcast bitset tested inside
  * whole-stage codegen. Rows the filter rejects are DEFINITELY absent
  * — only the ~fpp false-positive sliver plus the true duplicates ever
  * reach a real join (ops/BloomPrune.scala composes this into an
  * EXACT anti-join).
  *
  * Keys are 64-bit hashes (callers feed `xxhash64(key)`); bit indices
  * come from Kirsch–Mitzenmacher double hashing over Spark's own XXH64
  * so filters are stable across JVMs/executors.
  *
  * Reference behavior coverage: the reference has no bloom surface —
  * this is part of the beyond-reference LLM-pipeline layer (SURVEY
  * §2.6), same family as Contamination/Dedup
  * (reference datar_polars has no counterpart; closest intent is
  * datar_polars/api/dplyr/join.py anti_join's exact semantics, which
  * BloomPrune.antiJoin preserves bit-for-bit).
  */
object BloomKernels {
  private final val Seed1 = 0x9E3779B97F4A7C15L
  private final val Seed2 = 0xC2B2AE3D27D4EB4FL

  /** Hard cap on filter size: 2^33 bits = 1 GiB of broadcast state —
    * the same loud-failure policy as the IVF centroid and LSH MaxDims
    * guards. At 10 bits/key that is ~8·10⁸ existing keys; beyond it a
    * single broadcast bitset stops being the right tool (shard the key
    * space into s independent blooms, or fall back to the plain
    * shuffle anti-join). */
  final val MaxBits: Long = 1L << 33

  /** Optimal bit count for `n` items at false-positive rate `p`,
    * rounded UP to a power of two (the probe masks instead of mod).
    * Standard sizing: m = n·ln(1/p)/ln(2)². */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, s"bloom: expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"bloom: fpp must be in (0,1), got $fpp")
    val m = math.ceil(expectedItems * math.log(1.0 / fpp) / (math.log(2) * math.log(2))).toLong
    val bits = java.lang.Long.highestOneBit(math.max(m, 64L) - 1) << 1
    require(bits <= MaxBits,
      s"bloom: $expectedItems items at fpp=$fpp needs $bits bits > MaxBits=$MaxBits " +
        "(~1 GiB broadcast). Shard the key space into independent blooms or use the " +
        "plain shuffle anti-join for existing sides this large.")
    bits
  }

  /** Optimal probe count k = (m/n)·ln 2. */
  def optimalNumHashes(numBits: Long, expectedItems: Long): Int =
    math.max(1, math.round(numBits.toDouble / expectedItems * math.log(2)).toInt)

  /** Set the k double-hashed bits of `key` in `words`. h2 is forced
    * odd so the probe sequence walks the full power-of-two ring. */
  def set(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val mask = (words.length.toLong << 6) - 1
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2) | 1L
    var i = 0
    var h = h1
    while (i < numHashes) {
      val bit = h & mask
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      h += h2
      i += 1
    }
  }

  /** Probe twin of [[set]]. */
  def mightContain(words: Array[Long], key: Long, numHashes: Int): Boolean = {
    val mask = (words.length.toLong << 6) - 1
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2) | 1L
    var i = 0
    var h = h1
    while (i < numHashes) {
      val bit = h & mask
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  /** Codegen bridge: broadcast-backed probe. */
  def probeBroadcast(b: Broadcast[Array[Long]], key: Long, numHashes: Int): Boolean =
    mightContain(b.value, key, numHashes)

  /** Probe a SERIALIZED bitset (the [[wordsToBytes]] big-endian layout)
    * without materializing the word array — the per-row form for
    * sidecar tables where every row carries its own bloom
    * (ops/FileBloomIndex.scala). A 1.2 MB bitset is probed with k
    * byte reads, zero allocation. */
  def mightContainBytes(bytes: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val mask = (bytes.length.toLong << 3) - 1
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2) | 1L
    var i = 0
    var h = h1
    while (i < numHashes) {
      val bit = h & mask
      // big-endian word serialization: bit b of word w (b=0 is the
      // word's LSB) lives in byte w*8 + (7 - b/8), at in-byte bit b%8
      val byteIdx = ((bit >>> 6) << 3) + (7L - ((bit & 63) >>> 3))
      if (((bytes(byteIdx.toInt) >>> (bit & 7).toInt) & 1) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  def wordsToBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def bytesToWords(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

/** bloom_build(keyHash) — aggregates 64-bit key hashes into a Bloom
  * bitset (BinaryType, little-endian-free long words). Partial
  * aggregation does the insertion map-side; merge is a word-wise OR,
  * so the result is bit-identical under ANY partitioning (asserted by
  * spec). NULL key hashes are skipped (SQL aggregate convention).
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"bloom_build: numBits must be a power of two >= 64, got $numBits")
  require(numBits <= BloomKernels.MaxBits,
    s"bloom_build: numBits=$numBits exceeds MaxBits=${BloomKernels.MaxBits}")
  require(numHashes >= 1 && numHashes <= 32,
    s"bloom_build: numHashes must be in [1,32], got $numHashes")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits >>> 6).toInt)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomKernels.set(buffer, v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomKernels.wordsToBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomKernels.wordsToBytes(buffer)
  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    BloomKernels.bytesToWords(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** bloom_bytes_contain(bloom, keyHash, numHashes) — per-ROW bitset
  * probe: each input row carries its own serialized bloom (BinaryType,
  * the BloomBuildAgg output layout). This is the executor-side filter
  * a per-file bloom SIDECAR needs: `sidecar.filter(probe)` tests every
  * file's bitset where it lives and only the surviving file PATHS ever
  * reach the driver — at 100k files × 1.2 MB bitsets the alternative
  * (collect-then-filter) is a ~120 GB driver transfer per lookup.
  * Splices into whole-stage codegen; NULL in any input → NULL. */
case class BloomBytesContainExpr(
    first: Expression,
    second: Expression,
    third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_bytes_contain"

  override protected def nullSafeEval(bloom: Any, keyHash: Any, numHashes: Any): Any =
    BloomKernels.mightContainBytes(bloom.asInstanceOf[Array[Byte]],
      keyHash.asInstanceOf[Long], numHashes.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k, n) =>
      s"graft.plans.BloomKernels.mightContainBytes($b, $k, $n)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BloomBytesContainExpr =
    copy(first = f, second = s, third = t)
}

/** bloom_might_contain(keyHash) against a torrent-broadcast bitset.
  * The broadcast is deserialized once per executor (not per task) and
  * the probe splices into whole-stage codegen, so a 100 TB scan pays
  * two XXH64 rounds + k cache probes per row and no join. NULL key
  * hash → NULL (standard null-safe scalar semantics). */
case class BloomMightContainExpr(
    child: Expression,
    bloom: Broadcast[Array[Long]],
    numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    BloomKernels.probeBroadcast(bloom, input.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBroadcast", bloom,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.BloomKernels.probeBroadcast($ref, $c, $numHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
