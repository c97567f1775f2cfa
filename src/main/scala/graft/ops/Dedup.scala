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

  /** Exact dedup keeping the BEST copy instead of the first: argmax of
    * `pref` per content group (ties → max id). In a crawl pipeline
    * `pref` is per-COPY metadata — fetch quality, freshness, source
    * rank — which is exactly what keep-first `exact` cannot see. Same
    * scale shape: ONE partial-aggregatable groupBy (`max_by` over the
    * lexicographic (pref, id) struct order merges map-side). NULL
    * prefs sort below any non-NULL pref (struct ordering), so a group
    * of all-NULL prefs still keeps its max-id row. */
  /** Corpus snapshot diff: classify every doc id across two corpus
    * versions as added / removed / changed / unchanged, comparing
    * content by md5 — the incremental-crawl audit that decides how
    * much downstream (dedup, embedding, index) work a new drop
    * actually creates. ONE id-keyed full outer join of two (id, hash)
    * projections — the text itself never shuffles.
    * Output: (id, status). Aggregate for the drop report. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, id: String,
                 text: String): DataFrame = {
    val o = oldDf.select(col(id).as("__id"), md5(col(text)).as("__oh"))
    val n = newDf.select(col(id).as("__id"), md5(col(text)).as("__nh"))
    o.join(n, Seq("__id"), "full")
      .select(col("__id").as(id),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") === col("__nh"), "unchanged")
          .otherwise("changed").as("status"))
  }

  def exactBest(df: DataFrame, id: String, text: String, pref: Column): DataFrame =
    df.groupBy(md5(col(text)).as("content_hash"))
      .agg(max_by(col(id), struct(pref, col(id))).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Normalized word tokens. */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " ")), " ")

  /** [[tokens]] with the empty-token artifact dropped, LAMBDA-FREE.
    * Equivalent to `filter(tokens(text), t => length(t) > 0)`: the
    * regexp collapses every separator run to one space and the trim
    * removes lead/trail, so the split can only produce an empty token
    * when the WHOLE normalized string is empty — i.e. the array is
    * exactly `[""]`. Testing element 0 therefore decides the whole
    * filter. The filter-HOF form is a CodegenFallback expression that
    * forces the surrounding projection interpreted AND defeats plan
    * canonicalization (ReuseExchange never matched the twin tokenize
    * subtrees of the retrieval queries); this form stays inside
    * whole-stage codegen and canonicalizes. Null text stays null,
    * exactly like filter(null). */
  def tokensNonEmpty(text: Column): Column = {
    val t = tokens(text)
    when(get(t, lit(0)) === "", array().cast("array<string>")).otherwise(t)
  }

  /** EVALUATION-SHAPE RULE for every kernel below: higher-order-
    * function lambdas may reference ONLY their lambda variables.
    * Referencing an outer subtree (e.g. `slice(toks, i, w)` inside a
    * transform over indices) re-evaluates that whole subtree per array
    * element — higher-order functions run interpreted, with no CSE —
    * and when such transforms nest (shingle → signature → band) the
    * cost multiplies per level. Sliding windows are therefore built by
    * zip_with-combining k-shifted copies of an array: each shift is
    * evaluated once per row at projection level; everything stays
    * linear in document length. */

  /** Elementwise combine of the k-shifted copies of `arr`:
    * out(i) = f(arr(i), f(arr(i+1), … arr(i+w-1))), truncated to the
    * size(arr)-w+1 full windows (min 1 — shorter arrays yield one
    * partial window, the "whole doc" shingle). zip_with pads the
    * shorter side with null; `f`'s null behavior (concat_ws/least/
    * xxhash64 skip nulls) makes partial tail entries harmless before
    * the cut. */
  private[ops] def slidingCombine(arr: Column, w: Int,
                                  f: (Column, Column) => Column): Column = {
    val combined = (0 until w).map(k =>
        slice(arr, lit(k + 1), greatest(size(arr) - k, lit(0))))
      .reduce((a, b) => zip_with(a, b, f))
    slice(combined, lit(1), greatest(size(arr) - w + 1, lit(1)))
  }

  /** w-word shingles of the token array (strings). */
  def shingles(toks: Column, w: Int): Column =
    slidingCombine(toks, w, (a, b) => concat_ws(" ", a, b))

  /** Same output straight from the text column via the native codegen
    * kernel (one pass; the Column form above pays w interpreted
    * zip_with levels, each re-evaluating the tokenizer subtree). */
  def shinglesFast(text: Column, w: Int): Column =
    fromExpr(graft.plans.ShingleStringsExpr(bridge(text), w))

  /** One 64-bit base hash per distinct shingle: rolling-combined token
    * hashes (a hash of the window's token hashes — equivalent to
    * hashing the window text for dedup purposes). */
  private def shingleHashes(text: Column, w: Int): Column = {
    val hs = transform(tokens(text), t => xxhash64(t))
    array_distinct(slidingCombine(hs, w, (a, b) => xxhash64(a, b)))
  }

  /** MinHash signature: numPerm hash "permutations"
    * sig_j = min_s xxhash64(h(s), j). Shaped as one n×numPerm matrix
    * transform (lambda-vars only) + one zip_with-least fold, so the
    * shingle set is computed exactly once per row. Overflow-free under
    * ANSI mode (the classic a*h+b would throw on long overflow). */
  def minhashSignature(text: Column, w: Int, numPerm: Int): Column = {
    val hs = shingleHashes(text, w)
    val perShingle = transform(hs, h =>
      transform(sequence(lit(0), lit(numPerm - 1)), j => xxhash64(h, j)))
    aggregate(perShingle,
      array_repeat(lit(Long.MaxValue), numPerm),
      (acc, row) => zip_with(acc, row, (a, b) => least(a, b)))
  }

  // ---- native-Expression fast paths (graft.plans.TextKernels) ----------
  // Higher-order functions evaluate interpreted (outside whole-stage
  // codegen); the kernel expressions below do the identical signature
  // work in one generated-code call — the default for the pipelines.
  private def bridge(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)
  private def fromExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  def minhashSignatureFast(text: Column, w: Int, numPerm: Int): Column =
    fromExpr(graft.plans.MinHashSignatureExpr(bridge(text), w, numPerm))
  def shingleHashesFast(text: Column, w: Int): Column =
    fromExpr(graft.plans.ShingleHashesExpr(bridge(text), w))
  def simhashFast(text: Column): Column =
    fromExpr(graft.plans.SimHashExpr(bridge(text)))

  /** LSH banding: (bandId, bandHash) keys for a signature. */
  def bands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      struct(b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
            v => v.cast("string")))).as("bucket")))

  /** Within-bucket candidate pairs via a skew-safe SELF-JOIN on the
    * bucket key with `a < b` — never materializes a bucket into one
    * array (a hot bucket — empty docs, boilerplate — would otherwise
    * collect every id into a single executor and OOM at 100 TB; AQE
    * skew-join splits hot buckets instead). Buckets larger than
    * `maxBucket` are dropped entirely: they are degenerate near-dup
    * cliques whose pair count grows quadratically; cap them and let
    * the caller count drops via `bucketStats` if needed. */
  private def bucketPairs(keyed: DataFrame, bucketCols: Seq[String],
                          payload: Seq[String], maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bucket size via a window over the SAME hash-partitioning the
    // self-join needs: the expensive signature subplan sits under one
    // Exchange that both join sides share (ReuseExchange) — signatures
    // are computed once, not once per side, and no separate
    // count-aggregate join is needed.
    val capped = keyed
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(bucketCols.map(col): _*)))
      .filter(col("__bn") > 1 && col("__bn") <= maxBucket).drop("__bn")
    val l = capped.toDF(capped.columns.map(c => if (bucketCols.contains(c)) c else c + "_l"): _*)
    val r = capped.toDF(capped.columns.map(c => if (bucketCols.contains(c)) c else c + "_r"): _*)
    l.join(r, bucketCols).filter(col("doc_id_l") < col("doc_id_r"))
      .select((Seq(col("doc_id_l").as("a"), col("doc_id_r").as("b")) ++
        payload.flatMap(p => Seq(col(p + "_l").as(p + "_a"), col(p + "_r").as(p + "_b")))): _*)
      .distinct()
  }

  /** MinHash+LSH candidate pairs with exact-jaccard verification.
    * Topology: project signatures (map-side) → explode bands → one
    * shuffle on (band,bucket) → within-bucket pairs via capped
    * self-join (skew-safe; see bucketPairs) → verify with true
    * shingle-set jaccard ≥ threshold.
    */
  def minhashLsh(df: DataFrame, id: String, text: String,
                 w: Int = 3, numPerm: Int = 64, numBands: Int = 16,
                 threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val (sigs, sh) = minhashIndexFrames(df, id, text, w, numPerm, numBands)
    minhashLshFromIndex(sigs, sh, threshold, maxBucket)
  }

  /** The standing-workload dedup index [[minhashLsh]] is built from —
    * materialize BOTH frames once (band table (doc_id, band, bucket);
    * shingle-hash sets (doc_id, sh)) and every subsequent dedup pass
    * is [[minhashLshFromIndex]] over the index alone: zero text
    * scans, zero re-hashing — the same amortization the BM25
    * inverted index gives retrieval. */
  def minhashIndexFrames(df: DataFrame, id: String, text: String,
                         w: Int = 3, numPerm: Int = 64,
                         numBands: Int = 16): (DataFrame, DataFrame) = {
    val rowsPerBand = numPerm / numBands
    val sigs = df.select(col(id).as("doc_id"), col(text).as("__text"))
      .withColumn("__sig", minhashSignatureFast(col("__text"), w, numPerm))
      .withColumn("__band", explode(bands(col("__sig"), numBands, rowsPerBand)))
      .select(col("doc_id"), col("__band.band").as("band"),
        col("__band.bucket").as("bucket"))
    val sh = df.select(col(id).as("doc_id"),
      shingleHashesFast(col(text), w).as("sh"))
    (sigs, sh)
  }

  /** LSH candidate generation + exact-jaccard verification from a
    * materialized [[minhashIndexFrames]] index. The verification join
    * runs on the shingle-HASH sets (hash-set jaccard == string-set
    * jaccard modulo negligible 64-bit collisions; the hash arrays are
    * far cheaper to shuffle than text). */
  def minhashLshFromIndex(sigs: DataFrame, shingles: DataFrame,
                          threshold: Double, maxBucket: Int = 1000): DataFrame = {
    val pairs = bucketPairs(
      sigs.select(col("doc_id"), col("band"), col("bucket")),
      Seq("band", "bucket"), Nil, maxBucket)
    val sh = shingles.select(col("doc_id").as("__vid"), col("sh").as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__vid", "a").withColumnRenamed("__sh", "sh_a"), Seq("a"))
      .join(sh.withColumnRenamed("__vid", "b").withColumnRenamed("__sh", "sh_b"), Seq("b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Incremental near-dedup of a NEW batch against a standing
    * [[minhashIndexFrames]] index — the day-2 shape of a crawl
    * pipeline: the corpus's signatures were paid for once; admitting
    * a batch costs only the batch's own signatures plus one banded
    * join. Candidate pairs must TOUCH the batch (index↔index pairs
    * were adjudicated when the index was built, so they are filtered
    * out before verification, not re-verified); batch-internal pairs
    * are included (a batch can self-duplicate). Bucket-size caps run
    * over the UNION, so a boilerplate bucket stays bounded no matter
    * which side floods it. Ids must be disjoint across sides (caller
    * contract). Output: (a, b, jaccard) — pairs with at least one
    * batch doc. */
  def minhashLshIncremental(idxSigs: DataFrame, idxShingles: DataFrame,
                            newSigs: DataFrame, newShingles: DataFrame,
                            threshold: Double,
                            maxBucket: Int = 1000): DataFrame = {
    val all = idxSigs.select(col("doc_id"), col("band"), col("bucket"))
      .withColumn("nw", lit(false))
      .unionByName(newSigs.select(col("doc_id"), col("band"), col("bucket"))
        .withColumn("nw", lit(true)))
    val pairs = bucketPairs(all, Seq("band", "bucket"), Seq("nw"), maxBucket)
      .filter(col("nw_a") || col("nw_b")).select("a", "b")
    val sh = idxShingles.unionByName(newShingles)
      .select(col("doc_id").as("__vid"), col("sh").as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__vid", "a").withColumnRenamed("__sh", "sh_a"), Seq("a"))
      .join(sh.withColumnRenamed("__vid", "b").withColumnRenamed("__sh", "sh_b"), Seq("b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Exact Jaccard over two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 64-bit SimHash: per-token hash votes on each bit; bucket by
    * 16-bit chunks for hamming-distance LSH. Matrix shape (per-token
    * ±1 vote vector → one zip_with-sum fold → sign bits): the token
    * hashes are evaluated once per row (see EVALUATION-SHAPE RULE). */
  def simhash(text: Column): Column = {
    val hs = transform(array_distinct(tokens(text)), t => xxhash64(t))
    // votes(s)(b) = +1 if bit b of hash s is set else -1
    val votes = transform(hs, h =>
      transform(sequence(lit(0), lit(63)), b =>
        when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    val sums = aggregate(votes, array_repeat(lit(0L), 64),
      (acc, row) => zip_with(acc, row, (a, b) => a + b))
    val bits = transform(sums, (v, i) =>
      when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Engine-portable SimHash: token hashes are md5 hex prefixes and
    * the signature is emitted as a 64-char '0'/'1' bit string, so any
    * engine with md5 reproduces it exactly (xxhash64 in `simhash`
    * above is Spark-specific). Bit b's vote per token reads hex digit
    * b/4, tests bit 3-(b%4). Same matrix shape as `simhash`; this is
    * the hash-comparable reference form, the kernel form stays the
    * scale path. */
  def simhashPortableBits(text: Column): Column = {
    val toks = array_distinct(filter(tokens(text), t => length(t) > 0))
    val hx = transform(toks, t => substring(md5(t), 1, 16))
    val votes = transform(hx, h =>
      transform(sequence(lit(0), lit(63)), b => {
        val digit = conv(call_function("substring", h,
          (floor(b / 4) + 1).cast("int"), lit(1)), 16, 10).cast("int")
        val bitSet = call_function("shiftright", digit,
          (lit(3) - pmod(b, lit(4))).cast("int")).bitwiseAND(1)
        (bitSet * 2 - 1).cast("long")
      }))
    val sums = aggregate(votes, array_repeat(lit(0L), 64),
      (acc, row) => zip_with(acc, row, (a, b) => a + b))
    concat_ws("", transform(sums, v => when(v > 0, lit("1")).otherwise(lit("0"))))
  }

  /** Portable simhash signatures per document (see simhashPortableBits). */
  def simhashPortable(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), simhashPortableBits(col(text)).as("simhash_bits"))

  /** Engine-portable MinHash band buckets: the md5 twin of
    * `minhashSignature`+`bands`, for paths whose OUTPUT must be
    * hash-comparable across engines (the streaming near-dup's verdict
    * depends on the band keys themselves, unlike minhashLsh where LSH
    * only proposes candidates and exact jaccard decides). Hash j of
    * shingle s is the first 12 hex digits of md5(s":"j) as a 48-bit
    * long — DuckDB reproduces it with a per-digit decode; 16^11·15
    * stays inside double-exact range, so the oracle's pow() arithmetic
    * is lossless. sig_j = min over distinct shingles; bucket b =
    * comma-joined rows b·R..(b+1)·R-1. The xxhash64 kernel form stays
    * the batch scale path. */
  def portableMinhashBands(text: Column, w: Int, numBands: Int,
                           rowsPerBand: Int): Column = {
    val numPerm = numBands * rowsPerBand
    val sh = array_distinct(shingles(tokens(text), w))
    val perShingle = transform(sh, s =>
      transform(sequence(lit(0), lit(numPerm - 1)), j =>
        conv(substring(md5(concat(s, lit(":"), j.cast("string"))), 1, 12), 16, 10)
          .cast("long")))
    val sig = aggregate(perShingle, array_repeat(lit(Long.MaxValue), numPerm),
      (acc, row) => zip_with(acc, row, (a, b) => least(a, b)))
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      struct(b.cast("int").as("band"),
        concat_ws(",", transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string"))).as("bucket")))
  }

  /** One-pass codegen kernel: md5-prefix hashes of normalized char
    * n-grams — bit-identical to
    * `transform(charNgrams(text, n), g => substring(md5(g), 1, 16))`
    * without the n-1 interpreted zip_with levels (the default for
    * positional-gram pipelines like TextAnalysis.dupSpans). */
  def charNgramMd5Fast(text: Column, n: Int): Column =
    fromExpr(graft.plans.CharNgramMd5Expr(bridge(text), n))

  /** One-pass codegen kernel twin of [[portableMinhashBands]]
    * (bit-identical; the default for the streaming ingest path). */
  def portableMinhashBandsFast(text: Column, w: Int, numBands: Int,
                               rowsPerBand: Int): Column =
    fromExpr(graft.plans.PortableMinhashBandsExpr(bridge(text), w, numBands, rowsPerBand))

  /** SimHash near-dup pairs: bucket on 16-bit chunks — by pigeonhole a
    * pair within hamming distance 3 shares at least one of the 4
    * chunks, so recall is guaranteed only for maxDist <= 3 (callers
    * wanting a larger radius must probe more chunk combinations). Pairs
    * come from a capped self-join per (chunk,key) — skew-safe, no
    * per-bucket array materialization. */
  def simhashNearDup(df: DataFrame, id: String, text: String,
                     maxDist: Int = 3, maxBucket: Int = 1000): DataFrame =
    hammingNearDupSigs(
      df.select(col(id).as("doc_id"), simhashFast(col(text)).as("sig")),
      "doc_id", "sig", maxDist, maxBucket)

  /** Hamming near-dup pairs over PRECOMPUTED 64-bit signatures —
    * perceptual image hashes (dHash/pHash), externally-computed
    * simhashes, any 64-bit sketch where hamming distance ≈
    * similarity. Same 4×16-bit pigeonhole bucketing + capped
    * skew-safe self-join as [[simhashNearDup]]: signatures shuffle
    * ONCE on (chunk, key), hot buckets are dropped at `maxBucket`,
    * and the exact distance filters the candidates. */
  def hammingNearDupSigs(sigs: DataFrame, id: String, sig: String,
                         maxDist: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(maxDist <= 3,
      "hammingNearDupSigs: 4x16-bit chunk bucketing guarantees recall only for maxDist <= 3")
    val chunked = sigs
      .select(col(id).as("doc_id"), col(sig).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(3)), c =>
          struct(c.as("chunk"),
            call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xFFFFL).as("key")))).as("ck"))
      .select(col("doc_id"), col("sig"), col("ck.chunk"), col("ck.key"))
    bucketPairs(chunked, Seq("chunk", "key"), Seq("sig"), maxBucket)
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

  /** Asymmetric containment scores for candidate pairs — Broder's
    * (1997) containment companion to jaccard:
    * c_a = |A∩B|/|A| ("how much of a sits inside b"), c_b = |A∩B|/|B|.
    * A short document quoted or wrapped WHOLE inside a longer one
    * scores containment ≈ 1 while jaccard stays low (the union is
    * diluted by the wrapper), so this — not jaccard — is the signal
    * for quote / boilerplate-wrap / template detection. Same
    * result-set-sized shape as [[ngramJaccardPairs]]: distinct
    * shingle-hash sets joined to the candidate pairs, all three
    * ratios from one intersect. */
  def containmentPairs(pairs: DataFrame, docs: DataFrame, id: String,
                       text: String, w: Int = 3): DataFrame = {
    val sh = docs.select(col(id).as("__cid"),
      shingleHashesFast(col(text), w).as("__sh"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    pairs
      .join(sh.withColumnRenamed("__cid", "a").withColumnRenamed("__sh", "sh_a"), Seq("a"))
      .join(sh.withColumnRenamed("__cid", "b").withColumnRenamed("__sh", "sh_b"), Seq("b"))
      .withColumn("containment_a", inter / size(col("sh_a")).cast("double"))
      .withColumn("containment_b", inter / size(col("sh_b")).cast("double"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .drop("sh_a", "sh_b")
  }

  def charNgrams(text: Column, n: Int): Column = {
    val s = regexp_replace(lower(text), "\\s+", " ")
    // split("", -1) appends a trailing empty element — cut to length(s)
    val chars = slice(split(s, ""), lit(1), greatest(length(s), lit(1)))
    when(length(s) < n, array(s))
      .otherwise(slidingCombine(chars, n, (a, b) => concat(a, b)))
  }

  /** Embedding cosine near-dup: random-hyperplane LSH buckets then
    * within-bucket exact cosine ≥ threshold. Planes are derived
    * deterministically from hashes (no Random — reproducible plans).
    */
  /** Connected components over near-dup pairs → duplicate clusters:
    * iterative min-label propagation (each node takes the minimum
    * component id among itself and its neighbors until fixpoint).
    * Converges in O(diameter) rounds — near-dup graphs are unions of
    * small cliques, so a handful of iterations; each round is one
    * shuffle join + aggregate, checkpointed to keep lineage flat.
    * The driver-side loop-with-count is inherent to iterative graph
    * algorithms (same structure GraphX uses), not a per-row action.
    *
    * Convergence is detected from a per-row change FLAG computed inside
    * the same update join and counted on the already-materialized
    * checkpoint — no extra join per iteration (the old shape re-joined
    * updated⋈labels, a whole extra shuffle each round).
    *
    * Checkpointing: when the session has a reliable checkpoint dir
    * (`sc.setCheckpointDir`, HDFS/S3 in production), use a real
    * `checkpoint()` — executor loss mid-iteration recovers from storage.
    * Otherwise fall back to `localCheckpoint(true)`, which pins blocks
    * in executor memory and cannot survive executor loss: fine for
    * local mode, NOT what you want for a 100 TB run. Set a checkpoint
    * dir on a cluster.
    *
    * Returns (doc_id, cluster_id = min doc_id in the component); docs
    * in no pair keep themselves as singleton clusters via the caller's
    * left join. */
  /** Telemetry from the LAST [[dedupClusters]] run on this JVM:
    * (min-label iterations to convergence, directed edge count).
    * Bench-only observability — the verdict's ER decade read asks
    * whether CC rounds grow with corpus diameter (they should not on
    * registry-shaped data: near-dup clusters are shallow). If this
    * ever climbs with scale, the documented switch is the
    * alternating large-star/small-star CC (Kiveris et al. 2014),
    * which bounds rounds logarithmically. */
  @volatile var lastCcStats: Option[(Int, Long)] = None

  def dedupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // round 1 is fused into the label init below, so a zero-round run
    // is no longer expressible — reject it loudly rather than return
    // one round's labels for a request that asked for none
    require(maxIter >= 1, s"dedupClusters: maxIter=$maxIter must be >= 1")
    val sc = pairs.sparkSession.sparkContext
    def cp(df: DataFrame): DataFrame =
      if (sc.getCheckpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(true)
    val edges = cp(pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct())
    val edgeCount = edges.count() // scan of the materialized checkpoint
    // Round 1 fused into the label init (r17, guide §2.4 "remove
    // shuffles outright"): with labels at identity, round 1's
    // neighbor-min join is algebraically edges.groupBy(a).min(b) —
    // one partial agg replaces the identity-labels
    // distinct+checkpoint, the edges⋈labels join, and the labels-side
    // left join. Bit-identical: the edge list is symmetrized, so
    // every endpoint appears as `a`; cluster = least(id, min(b)) and
    // changed = [min(b) < id] are exactly round 1's update.
    var labels = cp(edges.groupBy(col("a"))
      .agg(min(col("b")).as("__mn"))
      .select(col("a").as("id"),
        least(col("a"), col("__mn")).as("cluster"),
        (col("__mn") < col("a")).as("__chg")))
    var changed = labels.filter(col("__chg")).count()
    labels = labels.drop("__chg")
    var i = 1
    while (changed > 0 && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("cluster", "nc"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nc")).as("mn"))
      // POINTER DOUBLING from round 3 on (r17, guide §2.4 "fewer
      // passes"): besides the neighbor minimum, each node adopts its
      // current label's label — label chains halve per round, so a
      // deep component converges in O(log diameter) rounds instead of
      // O(diameter) (the sf0.1 registry graph: 6 -> 5 rounds; a long
      // path now fits maxIter=20 up to ~2^17 nodes). The first two
      // rounds stay plain: near-dup graphs are mostly shallow cliques
      // that finish in 2 rounds, where the extra labels-sized join
      // would be pure cost (measured: minhash-cluster rows regressed
      // ~15% with unconditional doubling, the deep entity graph won
      // ~10%). Invariants unchanged: labels only decrease, only to an
      // id inside the component (a label's label is a member), and at
      // fixpoint the symmetric edges force label equality across every
      // edge — each component still lands on its MIN id, bit-identical
      // to plain propagation. The label-key join can run hot on a
      // giant component's label; it is an equi-join, which AQE
      // skew-split handles (guide §2.5).
      val withMn = labels.join(neighborMin, Seq("id"), "left")
      val updated = cp(if (i < 2) {
        withMn.select(col("id"),
          least(col("cluster"), coalesce(col("mn"), col("cluster"))).as("cluster"),
          (coalesce(col("mn"), col("cluster")) < col("cluster")).as("__chg"))
      } else {
        val lookup = labels
          .select(col("id").as("__pid"), col("cluster").as("__pc"))
        withMn
          .join(lookup, withMn("cluster") === col("__pid"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("mn"), col("cluster")),
              coalesce(col("__pc"), col("cluster"))).as("cluster"),
            (least(coalesce(col("mn"), col("cluster")),
              coalesce(col("__pc"), col("cluster"))) < col("cluster")).as("__chg"))
      })
      // scan of the materialized checkpoint, no join
      changed = updated.filter(col("__chg")).count()
      labels = updated.drop("__chg")
      i += 1
    }
    lastCcStats = Some((i, edgeCount))
    labels.select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
  }

  /** Day-2 INCREMENTAL connected components — fold a delta's near-dup
    * pairs into STANDING cluster labels without recomputing CC over
    * the whole pair graph (the daily-crawl shape: yesterday's corpus
    * is labeled, today adds 1% new docs and their LSH pairs; re-running
    * closure over 10^10 standing pairs daily is the waste this
    * removes). The standing labels are a CONTRACTION of the old
    * graph: hanging every affected member off its cluster label
    * preserves connectivity exactly, so CC over (affected-cluster
    * star edges ∪ delta pairs) has the same components as CC over
    * (all old pairs ∪ delta pairs) restricted to affected nodes — and
    * because labels are component MINIMA (themselves member nodes),
    * the relabeled minima equal the full recompute's. Untouched
    * clusters keep their labels verbatim. Cost: delta-sized joins to
    * find the affected clusters plus CC over the affected subgraph
    * only — a delta merging two billion-doc clusters pays for those
    * two clusters, not the corpus. EXACT-EQUALITY CONTRACT:
    * output == [[dedupClusters]](oldPairs ∪ deltaPairs), row for row
    * (DedupSpec proves it, including cluster merges through a
    * bridging delta pair and a new node taking over as the minimum).
    * `standing`: (doc_id, cluster_id) from a previous [[dedupClusters]]
    * run; `deltaPairs`: (a, b) new pairs (new-new, new-old, or
    * late-found old-old all valid). */
  def dedupClustersIncremental(standing: DataFrame, deltaPairs: DataFrame,
                               maxIter: Int = 20): DataFrame = {
    val touched = deltaPairs.select(col("a").as("doc_id"))
      .union(deltaPairs.select(col("b").as("doc_id"))).distinct()
    // clusters holding a delta endpoint (delta-bounded; broadcast —
    // a delta touching more clusters than a broadcast holds is a
    // rebuild, not an increment)
    val affectedClusters = standing
      .join(touched, Seq("doc_id"), "left_semi")
      .select(col("cluster_id")).distinct()
    val affected = standing
      .join(broadcast(affectedClusters), Seq("cluster_id"), "left_semi")
    val starEdges = affected.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("cluster_id").as("a"), col("doc_id").as("b"))
    val relabeled = dedupClusters(
      starEdges.unionByName(deltaPairs.select(col("a"), col("b"))), maxIter)
    standing
      .join(broadcast(affectedClusters), Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
      .unionByName(relabeled)
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond") — the documented swap-in for [[dedupClusters]] when
    * component DIAMETER is the enemy: min-label propagation needs
    * O(diameter) rounds (a chain of pairwise near-dups propagates one
    * hop per shuffle), where the star operations contract every
    * component to a star in O(log²·) rounds worst case, ~log
    * practically — the difference between 5 and 200 shuffles on a
    * pathological chain. Near-dup registries are usually shallow
    * cliques (the telemetry read behind [[lastCcStats]]), so the
    * simpler propagation stays the default; this is the remedy the
    * bench telemetry would call for.
    *
    * Per round (both ops are one groupBy + one join at PAIR grain,
    * checkpointed like the propagation loop):
    * - large-star: every node v links each LARGER neighbor u > v to
    *   m(v) = min(Γ(v) ∪ v) — long tails hook high nodes straight
    *   onto minima;
    * - small-star: every node v links each smaller-or-self node to
    *   m(v) — stars consolidate onto their roots.
    * Fixpoint (edge set unchanged, checked with two pair-sized
    * excepts) is a union of stars rooted at component minima; labels
    * read straight off the edges. Output: (doc_id, cluster_id = min
    * id in component) — identical to [[dedupClusters]] by contract
    * (DedupSpec proves equality, and that a 200-node chain converges
    * in ≤ 15 rounds where propagation would need 200). */
  def dedupClustersStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    def cp(df: DataFrame): DataFrame =
      if (sc.getCheckpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(true)
    val nodes = cp(pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id"))).distinct())
    // canonical undirected edges (a < b), no self loops
    var edges = cp(pairs.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct())
    val edgeCount = edges.count()
    var i = 0
    var done = edgeCount == 0L
    while (!done && i < maxIter) {
      // symmetric view + per-node minimum m(v) = min(Γ(v) ∪ {v})
      def sym(e: DataFrame) = e.union(
        e.select(col("b").as("a"), col("a").as("b")))
      def mins(s: DataFrame) = s.groupBy(col("a").as("v"))
        .agg(min(col("b")).as("__mn"))
        .select(col("v"), least(col("v"), col("__mn")).as("m"))
      // large-star: (u, m(v)) for u ∈ Γ(v), u > v.  m ≤ v < u, so the
      // canonical form is (m, u) and no self loop can appear.
      val s1 = sym(edges)
      val ls = cp(s1.join(mins(s1), s1("a") === col("v"))
        .filter(col("b") > col("a"))
        .select(col("m").as("a"), col("b"))
        .distinct())
      // small-star: (u, m(v)) for u ∈ Γ(v), u < v, plus (v, m(v)).
      // u could BE m (drop the self loop); v > m unless v is a root.
      val s2 = sym(ls)
      val mv2 = mins(s2)
      val ss = cp(s2.join(mv2, s2("a") === col("v"))
        .filter(col("b") < col("a"))
        .select(col("m").as("a"), col("b"))
        .unionByName(mv2.select(col("m").as("a"), col("v").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct())
      // fixpoint: the round changed nothing (two pair-sized excepts
      // over materialized checkpoints)
      done = ss.except(edges).limit(1).count() == 0L &&
        edges.except(ss).limit(1).count() == 0L
      edges = ss
      i += 1
    }
    lastCcStats = Some((i, edgeCount))
    // a union of stars: every edge is (root = component min, member)
    nodes
      .join(edges.select(col("b").as("id"), col("a").as("cluster")),
        Seq("id"), "left")
      .groupBy(col("id"))
      .agg(min(coalesce(col("cluster"), col("id"))).as("cluster"))
      .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
  }

  /** Pick ONE representative per near-dup cluster by an explicit
    * preference (quality score, length, freshness — any deterministic
    * column), ties to the LOWEST id: the keep/drop decision that
    * follows [[dedupClusters]] in a real dedup pass. [[exactBest]] is
    * the exact-dup special case; this generalizes it to transitive
    * NEAR-dup clusters. Docs in no cluster become their own singleton
    * (kept). Topology: one left join onto the cluster map, one
    * cluster-keyed max_by partial agg (the (pref, −id) struct order),
    * one join back — all on the cluster key, AQE-handled; no windows.
    * Output: (id, cluster_id, pref, rep_id, n_members, keep). */
  def clusterRepresentatives(docs: DataFrame, id: String,
                             clusters: DataFrame, pref: Column): DataFrame = {
    val scored = docs.join(clusters, Seq(id), "left")
      .select(col(id), coalesce(col("cluster_id"), col(id)).as("cluster_id"),
        pref.as("pref"))
    val reps = scored.groupBy("cluster_id").agg(
      max_by(col(id), struct(col("pref"), (-col(id)).as("nid"))).as("rep_id"),
      count(lit(1)).as("n_members"))
    scored.join(reps, Seq("cluster_id"))
      .select(col(id), col("cluster_id"), col("pref"), col("rep_id"),
        col("n_members"), (col(id) === col("rep_id")).as("keep"))
  }

  def embeddingNearDup(df: DataFrame, id: String, vec: String,
                       nPlanes: Int = 12, threshold: Double = 0.97,
                       maxBucket: Int = 1000): DataFrame = {
    val key = Similarity.hyperplaneKey(col(vec), nPlanes)
    val withKey = df.select(col(id).as("doc_id"), col(vec).as("v"), key.as("bucket"))
    bucketPairs(withKey, Seq("bucket"), Seq("v"), maxBucket)
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): coarse-cluster
    * the embedding corpus, then compare pairs only WITHIN a cluster
    * and drop every vector that has a smaller-id cluster-mate above
    * the cosine threshold. Clustering uses the deterministic
    * md5-ranked IVF centroids ([[Similarity.ivfIndexDeterministic]]),
    * so the whole decision — centroid pick, assignment, pairing, drop
    * set — is engine-portable and oracle-replayable.
    *
    * Keep rule: a vector is a duplicate when ANY smaller-id vector in
    * its cluster is >= threshold similar ("dominated-by-any" — one
    * capped self-join, no iteration). For transitive cluster-
    * representative semantics instead, feed the >=-threshold pairs to
    * [[dedupClusters]] and keep each component's min label.
    *
    * Scale shape: assignment is a broadcast(nLists)-vs-corpus argmin
    * (one shuffle on the vector id — see ivfIndexDeterministic's
    * broadcast-envelope scaladoc); within-cluster pairing reuses the
    * capped skew-safe self-join ([[bucketPairs]]): clusters larger
    * than maxCluster are dropped from pairing, never collected —
    * nLists is the knob that keeps expected cluster size
    * (N / nLists) under it, exactly the paper's epsilon-ball-per-
    * cluster regime.
    *
    * Output: one row per vector — (id, list_id, is_dup). */
  def semanticDedup(df: DataFrame, id: String, vec: String,
                    nLists: Int = 1024, threshold: Double = 0.95,
                    maxCluster: Int = 1000): DataFrame = {
    val (assigned, _) = Similarity.ivfIndexDeterministic(df, id, vec, nLists)
    val withKey = assigned.select(col(id).as("doc_id"),
      col(vec).cast("array<double>").as("v"), col("list_id").as("bucket"))
    val drops = bucketPairs(withKey, Seq("bucket"), Seq("v"), maxCluster)
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("__dup", lit(true))
    assigned.select(col(id).as("doc_id"), col("list_id"))
      .join(drops, Seq("doc_id"), "left")
      .select(col("doc_id").as(id), col("list_id"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  // ---- content-defined chunking -----------------------------------------
  /** Sub-document duplication via content-defined chunking (the
    * rsync/LBFS idea): chunk boundaries come from the CONTENT (a
    * boundary wherever the w-char window's md5 prefix falls under the
    * rate threshold), so an insertion early in a document shifts only
    * the one chunk it lands in — fixed-size blocks would shift every
    * block after it. This catches partial duplication (shared
    * boilerplate, quoted passages, re-posted sections) that doc-level
    * dedup can't see and that dupSpans reports at n-gram grain rather
    * than reusable-chunk grain.
    *
    * Boundary rule (engine-portable, hex-prefix idiom like
    * [[graft.ops.Sampling.hashBucket]]): interior position i (from 2)
    * starts a new chunk iff substring(md5(text[i, i+w)), 1, 2) <=
    * `boundaryHex` — "03" keeps 4/256 of positions, mean chunk ~64
    * chars. No min/max clamps: the pure mask rule needs no sequential
    * state, so chunking is a single PROJECTION (array HOFs build the
    * boundary list, starts/ends zip per doc — never an explode before
    * the per-chunk rows are actually needed). Cost is one md5 per
    * interior position — the price of content-defined boundaries; cap
    * document length upstream.
    * Output: one row per chunk (id, start 1-based, chunk_len, chunk
    * md5). Empty/short docs yield one whole-doc chunk.
    *
    * The chunker is the [[graft.plans.CdcChunksExpr]] codegen kernel:
    * one pass over the UTF-8 bytes, ONE reusable digest, and the
    * boundary test compares the digest's first byte numerically — no
    * per-window substring/hex-string allocation (the HOF chain it
    * replaces paid both per position; kernel measured ~3x). The HOF
    * form survives as [[cdcChunksHof]], spec-pinned equivalent. */
  def cdcChunks(df: DataFrame, id: String, text: String, w: Int = 16,
                boundaryHex: String = "03"): DataFrame = {
    require(w >= 2, s"cdcChunks: window w=$w must be >= 2")
    require(boundaryHex.length == 2 && boundaryHex.forall(c =>
      c.isDigit || ('a' <= c && c <= 'f')),
      s"cdcChunks: boundaryHex must be 2 lowercase hex chars (got $boundaryHex)")
    val kernel = fromExpr(graft.plans.CdcChunksExpr(
      bridge(col(text)), w, Integer.parseInt(boundaryHex, 16)))
    df.select(col(id), explode(kernel).as("__c"))
      .select(col(id), col("__c.start").as("start"),
        col("__c.chunk_len").as("chunk_len"), col("__c.chunk_md5").as("chunk_md5"))
  }

  /** Column-composition form of [[cdcChunks]] — kept as the kernel's
    * executable specification (the equivalence spec runs both). */
  private[graft] def cdcChunksHof(df: DataFrame, id: String, text: String,
                                  w: Int = 16,
                                  boundaryHex: String = "03"): DataFrame = {
    val t = col(text)
    val n = length(t)
    // interior boundary candidates 2..n-w+1 (empty when the doc is
    // shorter than w+1 — sequence() would count DOWN, so guard)
    val interior = when(n - lit(w) + 1 >= 2,
      filter(sequence(lit(2), n - lit(w) + 1),
        i => substring(md5(t.substr(i, lit(w))), 1, 2) <= lit(boundaryHex)))
      .otherwise(array().cast("array<int>"))
    val starts = concat(array(lit(1)), interior)
    val ends = concat(
      slice(starts, lit(2), greatest(size(starts) - 1, lit(0))),
      array(n + 1))
    val chunks = zip_with(starts, ends,
      (s, e) => struct(s.as("start"), (e - s).as("chunk_len")))
    df.select(col(id), t.as("__t"), explode(chunks).as("__c"))
      .select(col(id), col("__c.start").as("start"),
        col("__c.chunk_len").cast("long").as("chunk_len"),
        md5(col("__t").substr(col("__c.start"), col("__c.chunk_len").cast("int")))
          .as("chunk_md5"))
  }

  /** Per-document sub-duplication report over [[cdcChunks]]: how many
    * of a doc's chunks (and chars) also occur elsewhere in the corpus
    * — the crossDocNovelty identity at chunk grain: a chunk hash with
    * total count 1 KNOWS its only row (min(id) in the same partial
    * agg), so the full-scale shuffle happens ONCE with map-side
    * combine absorbing hot boilerplate chunks, and no chunk-grain
    * join-back exists anywhere. Duplication counts occurrences (a
    * chunk repeated within one doc is duplication too).
    * Output: (id, n_chunks, dup_chunks, dup_chars). */
  def cdcDuplication(df: DataFrame, id: String, text: String, w: Int = 16,
                     boundaryHex: String = "03"): DataFrame = {
    val chunks = cdcChunks(df, id, text, w, boundaryHex)
    val totals = chunks.groupBy(col(id))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("__chars"))
    val uniq = chunks
      .groupBy("chunk_md5")
      .agg(count(lit(1)).as("__cnt"), min(col(id)).as("__only"),
        min(col("chunk_len")).as("__len"))
      .filter(col("__cnt") === 1L)
      .groupBy(col("__only").as(id))
      .agg(count(lit(1)).as("__n_uniq"), sum(col("__len")).as("__uniq_chars"))
    totals.join(uniq, Seq(id), "left")
      .select(col(id), col("n_chunks"),
        (col("n_chunks") - coalesce(col("__n_uniq"), lit(0L))).as("dup_chunks"),
        (col("__chars") - coalesce(col("__uniq_chars"), lit(0L))).as("dup_chars"))
  }

  /** Cross-document PREFIX/SUFFIX overlap dedup — the crawl-shard
    * boilerplate heads/tails read (the Lee et al. 2022 exact-substring
    * family at the AFFIX grain, reference-adjacent to the 90f span
    * reads). Two docs share a prefix (suffix) at CHUNK grain when
    * their [[cdcChunks]] sequences agree from the start (end):
    * content-defined boundaries are content-local, so equal text
    * affixes chunk identically up to the divergence chunk. Each doc
    * reduces to its cumulative chunk-path levels — level i carries
    * md5 over its first (last) i chunk hashes plus the cumulative
    * char length — and ONE equi-join on (kind, level, path) finds
    * every affix-sharing pair inside bounded hash buckets, never
    * all-pairs; levels under `minShared` chars are pruned BEFORE the
    * join (boilerplate levels are rare and deep, the noise floor is
    * level-1 single chunks). Output is PER DUPLICATED DOC (linear,
    * not quadratic pairs): (kind ∈ prefix/suffix, doc, partner = the
    * earliest doc sharing the doc's deepest shared level,
    * shared_chars ≥ minShared). Char-grain truth may extend past the
    * last shared boundary into the diverging chunk — the reported
    * length is the chunk-grain floor (the documented grain).
    *
    * 100 TB shape: per-doc windows partition by doc id; the join
    * shuffles (level, path) keys whose bucket sizes are duplicate
    * cluster sizes; the per-doc argmax is one partial agg. */
  def affixDedup(df: DataFrame, id: String, text: String,
                 minShared: Long = 32L, w: Int = 16,
                 boundaryHex: String = "03"): DataFrame = {
    require(minShared >= 1, s"affixDedup: minShared=$minShared must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val chunks = cdcChunks(df, id, text, w, boundaryHex)
    def levels(rev: Boolean, kind: String): DataFrame = {
      val win = Window.partitionBy(col(id))
        .orderBy(if (rev) col("start").desc else col("start").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      chunks
        .withColumn("__path",
          md5(concat_ws("", collect_list(col("chunk_md5")).over(win))))
        .withColumn("__cum", sum(col("chunk_len")).over(win))
        .withColumn("__lvl", count(lit(1)).over(win))
        .filter(col("__cum") >= minShared)
        .select(lit(kind).as("kind"), col(id),
          col("__lvl"), col("__path"), col("__cum"))
    }
    val lvl = levels(rev = false, "prefix")
      .unionByName(levels(rev = true, "suffix"))
    val buckets = lvl.groupBy("kind", "__lvl", "__path")
      .agg(min(col(id)).as("partner"), count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
    val hits = lvl.join(buckets, Seq("kind", "__lvl", "__path"))
      .filter(col(id) > col("partner"))
    hits.groupBy(col("kind"), col(id))
      .agg(max_by(col("partner"), col("__cum")).as("partner"),
        max(col("__cum")).as("shared_chars"))
      .select(col("kind"), col(id), col("partner"), col("shared_chars"))
  }

  /** The remediation half of [[affixDedup]] (the 90f2 pattern: find
    * the duplicated region, then CUT it): every doc that shares a
    * prefix (suffix) with an earlier doc loses those shared chars —
    * the boilerplate survives once, on each group's representative,
    * instead of once per page. Cuts clamp so a doc that is pure
    * boilerplate (prefix + suffix cover everything) strips to empty
    * rather than negative. Output: (id, clean, cut_prefix,
    * cut_suffix); pass-through docs carry cuts of 0. Same chunk-grain
    * floor as the finder — the cut lands at the last shared chunk
    * boundary, never mid-divergence. */
  def affixStrip(df: DataFrame, id: String, text: String,
                 minShared: Long = 32L, w: Int = 16,
                 boundaryHex: String = "03"): DataFrame = {
    val aff = affixDedup(df, id, text, minShared, w, boundaryHex)
    val pre = aff.filter(col("kind") === "prefix")
      .select(col(id), col("shared_chars").as("__pre"))
    val suf = aff.filter(col("kind") === "suffix")
      .select(col(id), col("shared_chars").as("__suf"))
    df.join(pre, Seq(id), "left").join(suf, Seq(id), "left")
      .withColumn("__p", coalesce(col("__pre"), lit(0L)))
      .withColumn("__s", coalesce(col("__suf"), lit(0L)))
      .withColumn("__keep",
        greatest(length(col(text)).cast("long") - col("__p") - col("__s"),
          lit(0L)))
      .select(col(id),
        col(text).substr((col("__p") + 1L).cast("int"),
          col("__keep").cast("int")).as("clean"),
        col("__p").as("cut_prefix"), col("__s").as("cut_suffix"))
  }

  /** MEASURED LSH recall/precision audit on a deterministic sample —
    * the empirical twin of [[lshPlan]]'s theoretical S-curve: of the
    * sample's TRUE near-dup pairs (exact shingle-set jaccard ≥
    * `threshold`, quadratic within the sample), how many do the
    * engine-portable band buckets actually propose, and how much of
    * the proposed candidate set survives verification. "Caught"
    * applies the SAME exact-jaccard verdict to the candidates, so
    * caught ⊆ true by construction and the two published rates are
    * exactly the knobs lshPlan trades: recall = caught/true (what
    * the bands find) and candidate_precision = caught/candidates
    * (verification work not wasted). The sample is md5-ranked
    * (engine-replayable) and the quadratic cross join is
    * sample-sized BY CONTRACT (the knnShapley broadcast discipline)
    * — at 100 TB you audit a stratified sample, never the corpus.
    * The band table is referenced twice by the self-join (the
    * 64-perm md5 signatures evaluate twice) — sample-sized, priced
    * in. Output: one row (n_docs, n_true_pairs, n_candidate_pairs,
    * n_caught, recall, candidate_precision); rates NULL when their
    * denominator is zero. */
  def lshRecallAudit(df: DataFrame, id: String, text: String,
                     sampleN: Int, seed: Long, w: Int = 3,
                     numBands: Int = 8, rowsPerBand: Int = 8,
                     threshold: Double = 0.5): DataFrame = {
    require(sampleN >= 2 && sampleN <= 100000,
      s"lshRecallAudit: sampleN=$sampleN must be in [2, 100000] — the " +
        "audit cross join is sample-sized by contract (stratify upstream " +
        "at corpus scale)")
    val sample = df
      .select(col(id).as("__d"), col(text).as("__text"))
      .withColumn("__u", graft.functions.BaseFns.md5Unif(col("__d"), seed))
      .orderBy(col("__u"), col("__d")).limit(sampleN)
      .select(col("__d"), col("__text"))
    val sh = sample.select(col("__d"),
      array_distinct(shingles(tokens(col("__text")), w)).as("__sh"))
    val truth = sh.select(col("__d").as("a"), col("__sh").as("__sa"))
      .crossJoin(broadcast(
        sh.select(col("__d").as("b"), col("__sh").as("__sb"))))
      .filter(col("a") < col("b"))
      .filter(jaccard(col("__sa"), col("__sb")) >= threshold)
      .select("a", "b")
    val bandRows = sample.select(col("__d"),
        explode(portableMinhashBands(col("__text"), w, numBands,
          rowsPerBand)).as("__b"))
      .select(col("__d"), col("__b.band").as("band"),
        col("__b.bucket").as("bucket"))
    val cands = bandRows.select(col("__d").as("a"), col("band"), col("bucket"))
      .join(bandRows.select(col("__d").as("b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val caught = cands.join(truth, Seq("a", "b")).select("a", "b")
    sample.agg(count(lit(1)).as("n_docs"))
      .crossJoin(truth.agg(count(lit(1)).as("n_true_pairs")))
      .crossJoin(cands.agg(count(lit(1)).as("n_candidate_pairs")))
      .crossJoin(caught.agg(count(lit(1)).as("n_caught")))
      .select(col("n_docs"), col("n_true_pairs"), col("n_candidate_pairs"),
        col("n_caught"),
        round(when(col("n_true_pairs") > 0,
          col("n_caught").cast("double") /
            col("n_true_pairs").cast("double")), 6).as("recall"),
        round(when(col("n_candidate_pairs") > 0,
          col("n_caught").cast("double") /
            col("n_candidate_pairs").cast("double")), 6)
          .as("candidate_precision"))
  }

  /** LSH S-curve detection probability: a pair with true jaccard `j`
    * is caught by at least one of `b` bands of `r` rows with
    * P = 1 − (1 − j^r)^b. The planning read behind every
    * (numPerm, numBands) choice in this file. */
  def lshDetectProb(j: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, r), b)

  /** Band planner: among the divisor splits b·r = numPerm, pick the
    * (bands, rowsPerBand) whose S-curve midpoint (1/b)^(1/r) sits
    * closest to `threshold` — the standard Leskovec/Rajaraman/Ullman
    * recipe. Low thresholds want many narrow bands (catch weak pairs,
    * eat false positives — the jaccard verify pass cleans them); high
    * thresholds want few wide bands. Driver-pure arithmetic; feed the
    * result straight to [[minhashLsh]]. Returns (bands, rowsPerBand,
    * detection probability at the threshold). */
  def lshPlan(numPerm: Int, threshold: Double): (Int, Int, Double) = {
    require(numPerm >= 2, s"lshPlan: numPerm=$numPerm must be >= 2")
    require(threshold > 0 && threshold < 1,
      s"lshPlan: threshold=$threshold must be in (0,1)")
    val splits = (1 to numPerm).filter(numPerm % _ == 0)
      .map(b => (b, numPerm / b))
    val (b, r) = splits.minBy { case (bb, rr) =>
      math.abs(math.pow(1.0 / bb, 1.0 / rr) - threshold) }
    (b, r, lshDetectProb(threshold, b, r))
  }

  /** Ensemble dedup POLICY — the decision layer a curation run
    * actually ships: compose the exact pass and the near-dup cluster
    * pass into ONE per-doc verdict with precedence.
    *
    *  1. exact groups by md5(text); group rep = min id; every other
    *     copy → `drop_exact` (cheapest signal wins first — near-dup
    *     machinery never sees byte-identical copies);
    *  2. [[minhashLsh]] over the REPS ONLY (the corpus minus exact
    *     copies — strictly smaller LSH input), verified-jaccard pairs
    *     → [[dedupClusters]] transitive components; a rep that is not
    *     its cluster's min → `drop_near`;
    *  3. survivors → `keep`.
    *
    * `kept_by` is the ULTIMATE keeper for every row (an exact copy of
    * a near-dropped rep points at the rep's cluster keeper, not the
    * rep), so `filter(verdict = 'keep')` and `groupBy(kept_by)` both
    * do what a pipeline means.
    *
    * Scale: one md5 groupBy + the banded LSH the standing pass
    * already runs + two id-keyed joins; no stage sees more than the
    * standing dedup does. The exact-group frame IS consumed by four
    * downstream subtrees and Catalyst recomputes shared subtrees —
    * persisting it was MEASURED SLOWER at 10× scale (7.5s vs 4.6s:
    * caching a text-wide join costs more than re-running page-cached
    * columnar scans), so the recompute stands; a deployment whose
    * source scans are genuinely cold materializes
    * [[exactGroupAssignments]] once and runs
    * [[ensembleDedupPrepared]] over the copy (verdict-identical,
    * spec-proven). Output: (id, verdict, kept_by). */
  def ensembleDedup(df: DataFrame, id: String, text: String,
                    w: Int = 3, numPerm: Int = 64, numBands: Int = 16,
                    threshold: Double = 0.5): DataFrame =
    ensembleDedupPrepared(exactGroupAssignments(df, id, text), id, text,
      w, numPerm, numBands, threshold)

  /** The materializable first stage of [[ensembleDedup]]: every row's
    * exact-duplicate representative as (id, rep, text). The COLD-SOURCE
    * knob: when source scans are genuinely cold (no page cache — the
    * case where the measured persist-vs-recompute A/B flips), land
    * THIS frame on parquet once and feed the copy to
    * [[ensembleDedupPrepared]] — the ensemble's four consumers then
    * re-read a compact columnar artifact instead of re-scanning the
    * raw source four times. */
  def exactGroupAssignments(df: DataFrame, id: String, text: String): DataFrame = {
    val hashed = df.select(col(id).as("__did"), md5(col(text)).as("__h"),
      col(text).as("__t"))
    val groups = hashed.groupBy("__h").agg(min(col("__did")).as("__rep"))
    hashed.join(groups, Seq("__h"))
      .select(col("__did").as(id), col("__rep").as("rep"), col("__t").as(text))
  }

  /** [[ensembleDedup]] over a prepared [[exactGroupAssignments]] frame
    * (id, rep, text) — verdict-identical to the recompute path
    * (OpsSpec proves it) with ZERO raw-source re-scans: the hot-path
    * form when the prepared frame is a materialized parquet copy. */
  def ensembleDedupPrepared(prepared: DataFrame, id: String, text: String,
                            w: Int = 3, numPerm: Int = 64, numBands: Int = 16,
                            threshold: Double = 0.5): DataFrame = {
    val withRep = prepared.select(col(id).as("__did"), col("rep").as("__rep"),
      col(text).as("__t"))
    val reps = withRep.filter(col("__did") === col("__rep"))
      .select(col("__did").as(id), col("__t").as(text))
    val pairs = minhashLsh(reps, id, text, w, numPerm, numBands, threshold)
      .select("a", "b")
    val clusters = dedupClusters(pairs)
      .select(col("doc_id").as("__rep2"), col("cluster_id").as("__cl"))
    val repVerdicts = reps.select(col(id).as("__rep2"))
      .join(clusters, Seq("__rep2"), "left")
      .select(col("__rep2"), coalesce(col("__cl"), col("__rep2")).as("__keep"))
    withRep.join(repVerdicts, col("__rep") === col("__rep2"))
      .select(col("__did").as(id),
        when(col("__did") =!= col("__rep"), "drop_exact")
          .when(col("__rep") =!= col("__keep"), "drop_near")
          .otherwise("keep").as("verdict"),
        col("__keep").as("kept_by"))
  }
}
