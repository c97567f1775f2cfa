package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators (SURVEY §2.6).
  *
  * All signatures are single-pass map-side projections (shingle →
  * signature) followed by exactly one shuffle on band/bucket keys —
  * the canonical scalable near-dup topology. No UDFs: signatures are
  * higher-order-function compositions (codegen'd), so 100 TB of text
  * streams through whole-stage codegen and only candidate pairs hit
  * the shuffle.
  */
object Dedup {

  /** Exact dedup by content hash: keep the minimum id per hash.
    * One partial-aggregatable groupBy. */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("content_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Normalized word tokens. */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " ")), " ")

  /** w-word shingles of the token array. */
  def shingles(toks: Column, w: Int): Column =
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - w + 1),
        i => concat_ws(" ", slice(toks, i, w))))

  /** One 64-bit base hash per distinct shingle. */
  private def shingleHashes(text: Column, w: Int): Column =
    transform(array_distinct(shingles(tokens(text), w)), s => xxhash64(s))

  /** MinHash signature: numPerm universal-hash permutations
    * sig_j = min_s (a_j * h(s) + b_j), with (a_j, b_j) derived from
    * the permutation index — one base hash per shingle, then cheap
    * arithmetic per permutation. */
  def minhashSignature(text: Column, w: Int, numPerm: Int): Column = {
    val hs = shingleHashes(text, w)
    transform(sequence(lit(0), lit(numPerm - 1)), j => {
      val a = xxhash64(concat(lit("a"), j.cast("string"))) | lit(1L) // odd
      val b = xxhash64(concat(lit("b"), j.cast("string")))
      array_min(transform(hs, h => a * h + b))
    })
  }

  /** LSH banding: (bandId, bandHash) keys for a signature. */
  def bands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      struct(b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, rowsPerBand),
            v => v.cast("string"))): _*).as("bucket")))

  /** MinHash+LSH candidate pairs with exact-jaccard verification.
    * Topology: project signatures (map-side) → explode bands → one
    * shuffle on (band,bucket) → within-bucket pairs via sorted
    * collect_list (bucket cardinality is bounded by banding) →
    * verify with true shingle-set jaccard ≥ threshold.
    */
  def minhashLsh(df: DataFrame, id: String, text: String,
                 w: Int = 3, numPerm: Int = 64, numBands: Int = 16,
                 threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numPerm / numBands
    val sigs = df.select(col(id).as("doc_id"), col(text).as("__text"))
      .withColumn("__sig", minhashSignature(col("__text"), w, numPerm))
      .withColumn("__band", explode(bands(col("__sig"), numBands, rowsPerBand)))
      .select(col("doc_id"), col("__band.band").as("band"),
        col("__band.bucket").as("bucket"))
    val buckets = sigs.groupBy("band", "bucket")
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    // pairwise (i<j) within bucket, deduplicated across bands
    val pairs = buckets
      .select(explode(pairUp(col("ids"))).as("p"))
      .select(col("p._1").as("a"), col("p._2").as("b"))
      .distinct()
    // verification join: true jaccard over distinct shingle sets
    val sh = df.select(col(id).as("__vid"),
      array_distinct(shingles(tokens(col(text)), w)).as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__vid", "a").withColumnRenamed("__sh", "sh_a"), Seq("a"))
      .join(sh.withColumnRenamed("__vid", "b").withColumnRenamed("__sh", "sh_b"), Seq("b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** All ordered pairs (i<j) from a sorted array — array<struct<_1,_2>>. */
  def pairUp(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids)), y => struct(x.as("_1"), y.as("_2")))))

  /** Exact Jaccard over two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 64-bit SimHash: per-token hash votes on each bit; bucket by
    * 16-bit chunks for hamming-distance LSH. */
  def simhash(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val hs = transform(toks, t => xxhash64(t))
    // bit b of the simhash = sign of sum over tokens of (+1 / -1)
    val bits = transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, b.cast("int")).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(transform(bits, (bit, i) => shiftleft(bit, i.cast("int"))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket on 16-bit chunks (a pair within
    * hamming distance 3 shares at least one of 4 chunks), then verify
    * hamming ≤ maxDist. */
  def simhashNearDup(df: DataFrame, id: String, text: String,
                     maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(id).as("doc_id"), simhash(col(text)).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)), c =>
        struct(c.as("chunk"),
          shiftright(col("sig"), c.cast("int") * 16).bitwiseAND(0xFFFFL).as("key")))).as("ck"))
      .select(col("doc_id"), col("sig"), col("ck.chunk"), col("ck.key"))
    val buckets = chunked.groupBy("chunk", "key")
      .agg(array_sort(collect_set(struct(col("doc_id"), col("sig")))).as("members"))
      .filter(size(col("members")) > 1)
    buckets.select(explode(pairUp(col("members"))).as("p"))
      .select(col("p._1.doc_id").as("a"), col("p._1.sig").as("sig_a"),
        col("p._2.doc_id").as("b"), col("p._2.sig").as("sig_b"))
      .distinct()
      .withColumn("dist", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
  }

  /** Character n-gram Jaccard similarity between candidate pairs —
    * the verification pass of a dedup pipeline. */
  def ngramJaccardPairs(pairs: DataFrame, docs: DataFrame, id: String,
                        text: String, n: Int = 5): DataFrame = {
    val grams = docs.select(col(id).as("__gid"),
      array_distinct(charNgrams(col(text), n)).as("__g"))
    pairs
      .join(grams.withColumnRenamed("__gid", "a").withColumnRenamed("__g", "g_a"), Seq("a"))
      .join(grams.withColumnRenamed("__gid", "b").withColumnRenamed("__g", "g_b"), Seq("b"))
      .withColumn("ngram_jaccard", jaccard(col("g_a"), col("g_b")))
      .drop("g_a", "g_b")
  }

  def charNgrams(text: Column, n: Int): Column = {
    val s = regexp_replace(lower(text), "\\s+", " ")
    when(length(s) < n, array(s)).otherwise(
      transform(sequence(lit(1), length(s) - n + 1), i => substring(s, i, lit(n))))
  }
  private def substring(x: Column, pos: Column, len: Column): Column =
    call_function("substring", x, pos, len)

  /** Embedding cosine near-dup: random-hyperplane LSH buckets then
    * within-bucket exact cosine ≥ threshold. Planes are derived
    * deterministically from hashes (no Random — reproducible plans).
    */
  def embeddingNearDup(df: DataFrame, id: String, vec: String,
                       nPlanes: Int = 12, threshold: Double = 0.97): DataFrame = {
    val key = Similarity.hyperplaneKey(col(vec), nPlanes)
    val withKey = df.select(col(id).as("doc_id"), col(vec).as("v"), key.as("bucket"))
    val buckets = withKey.groupBy("bucket")
      .agg(array_sort(collect_set(struct(col("doc_id"), col("v")))).as("members"))
      .filter(size(col("members")) > 1)
    buckets.select(explode(pairUp(col("members"))).as("p"))
      .select(col("p._1.doc_id").as("a"), col("p._1.v").as("va"),
        col("p._2.doc_id").as("b"), col("p._2.v").as("vb"))
      .distinct()
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
