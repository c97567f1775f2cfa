package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.6):
  * language ID, quality scoring, token counting, fingerprinting.
  * Pure column compositions — codegen'd, linear scans, no shuffles.
  */
object TextAnalysis {

  // ---- language ID -------------------------------------------------------
  /** Tiny per-language stopword profiles (public common-word lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "en"),
    "it" -> Seq("il", "la", "gli", "e", "è", "un", "una", "di", "in", "per"))

  /** langId via the native codegen kernel (graft.plans.LangIdExpr) —
    * same heuristic as `langIdColumns` below, one generated-code call. */
  def langId(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.LangIdExpr(ColumnBridge.expr(text)))
  }

  /** Heuristic language ID (Column-composition reference form):
    * CJK-character ratio decides zh; otherwise the stopword profile
    * with the highest hit count wins (ties → lexicographically largest
    * code, matching the descending struct sort). */
  def langIdColumns(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\p{script=Han}]", ""))
    val toks = Dedup.tokens(text)
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    when(cjk > length(text) * 0.3, lit("zh"))
      .otherwise(sort_array(array(scores: _*), asc = false).getItem(0).getField("lang"))
  }

  // ---- quality scoring ---------------------------------------------------
  /** Quality features + a composite score in [0,1]: length band,
    * punctuation ratio, digit ratio, mean word length, stopword hit
    * ratio, alpha ratio. */
  def qualityFeatures(df: DataFrame, text: String): DataFrame = {
    val t = col(text)
    val n = length(t).cast("double")
    val toks = Dedup.tokens(t)
    val nw = size(toks).cast("double")
    val punct = (n - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double")
    val digits = (n - length(regexp_replace(t, "[0-9]", ""))).cast("double")
    val alpha = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
    val stopHits = size(array_intersect(toks,
      array(stopwords("en").map(lit): _*))).cast("double")
    df.withColumn("n_chars_q", n)
      .withColumn("n_words", nw)
      .withColumn("mean_word_len", alpha / greatest(nw, lit(1.0)))
      .withColumn("punct_ratio", punct / greatest(n, lit(1.0)))
      .withColumn("digit_ratio", digits / greatest(n, lit(1.0)))
      .withColumn("alpha_ratio", alpha / greatest(n, lit(1.0)))
      .withColumn("stop_ratio", stopHits / greatest(nw, lit(1.0)))
  }

  /** Composite quality score (weights are heuristic; deterministic). */
  def qualityScore(df: DataFrame, text: String): DataFrame =
    qualityFeatures(df, text).withColumn("quality",
      greatest(lit(0.0), least(lit(1.0),
        lit(0.25) * least(col("n_words") / lit(50.0), lit(1.0)) +
          lit(0.25) * col("alpha_ratio") +
          lit(0.25) * (lit(1.0) - least(col("punct_ratio") * lit(10.0), lit(1.0))) +
          lit(0.25) * (lit(1.0) - least(col("digit_ratio") * lit(10.0), lit(1.0))))))

  /** Flesch Reading Ease (Flesch 1948) — the classic readability
    * signal a curation run reads next to the Gopher rules: FRE =
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    * Sentences = runs of [.!?]; syllables = vowel-group runs per word
    * (≥1 each) — the standard corpus-scale heuristic (exact
    * hyphenation needs a dictionary; the RANKING is what filters
    * use). Every count is a codegen regexp/HOF projection, the word
    * array materializes ONCE per row (evaluation-shape rule), and the
    * formula is fixed-order IEEE — the oracle replays it bit-for-bit.
    * Docs with no words score NULL (no prose, no grade).
    * Output: input + n_words, n_sentences, n_syllables, fre. */
  def readability(df: DataFrame, text: String): DataFrame = {
    val words = split(trim(regexp_replace(lower(col(text)),
      "[^a-z0-9]+", " ")), " ")
    val out = df
      .withColumn("__w", filter(words, w => w =!= ""))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("n_sentences",
        greatest(lit(1L), size(regexp_extract_all(col(text),
          lit("[.!?]+"), lit(0))).cast("long")))
      .withColumn("n_syllables",
        aggregate(col("__w"), lit(0L), (acc, w) => acc +
          greatest(lit(1),
            size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))).cast("long")))
    out.withColumn("fre",
        when(col("n_words") > 0,
          lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double"))))
      .drop("__w")
  }

  // ---- token counting ----------------------------------------------------
  /** Whitespace tokens + a BPE-ish regex segmentation (letter runs,
    * digit runs, single punctuation marks) + a chars/4 heuristic. */
  def tokenCounts(df: DataFrame, text: String): DataFrame = {
    val t = col(text)
    df.withColumn("ws_tokens",
        when(length(trim(t)) === 0, lit(0))
          .otherwise(size(split(trim(t), "\\s+"))))
      .withColumn("bpe_ish_tokens",
        size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))
      .withColumn("approx_tokens", ceil(length(t).cast("double") / lit(4.0)).cast("long"))
  }

  /** Tokenizer FERTILITY audit per language — the multilingual-
    * tokenizer read behind per-language token budgets and serving-cost
    * estimates (Rust/Ács fertility: subword tokens per word; its
    * sibling chars-per-token is the compression read): languages a
    * tokenizer fragments (fertility ≫ 1.5) pay more context window
    * per sentence and train on fewer effective documents at the same
    * token budget — the mix designer needs the table before setting
    * per-language sampling weights. ONE partial-agg scan over
    * [[tokenCounts]]' codegen'd counters; exact integer sums, two
    * single divisions (engine-exact). Output per language: docs,
    * words, tokens, chars, fertility = tokens/words, chars_per_token.
    * Empty-text languages read NULL ratios, SQL-style. */
  def tokenizerFertility(df: DataFrame, lang: String,
                         text: String): DataFrame =
    tokenCounts(df, text)
      .groupBy(col(lang))
      .agg(count(lit(1)).as("docs"),
        sum(col("ws_tokens").cast("long")).as("words"),
        sum(col("bpe_ish_tokens").cast("long")).as("tokens"),
        sum(length(col(text)).cast("long")).as("chars"))
      .withColumn("fertility",
        when(col("words") === 0L, lit(null).cast("double"))
          .otherwise(col("tokens").cast("double") / col("words").cast("double")))
      .withColumn("chars_per_token",
        when(col("tokens") === 0L, lit(null).cast("double"))
          .otherwise(col("chars").cast("double") / col("tokens").cast("double")))

  // ---- document chunking ---------------------------------------------------
  /** Token-bounded chunking with overlap — the standard pretraining /
    * RAG preprocessing step: each document becomes
    * max(1, ceil((n - overlap) / (chunkTokens - overlap))) chunks of at
    * most `chunkTokens` whitespace tokens, consecutive chunks sharing
    * `overlap` tokens. Pure codegen projection + bounded posexplode —
    * no shuffle, no UDF; the token array is materialized as a column
    * ONCE per row so the per-chunk lambda only slices an attribute
    * (the evaluation-shape rule: lambdas must not re-evaluate outer
    * subtrees per element). */
  def chunkDocuments(df: DataFrame, id: String, text: String,
                     chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      s"chunking: need 0 <= overlap < chunkTokens (got overlap=$overlap, chunkTokens=$chunkTokens)")
    val step = chunkTokens - overlap
    df.withColumn("__toks", split(trim(col(text)), "\\s+"))
      .withColumn("__n",
        when(length(trim(col(text))) === 0, lit(0)).otherwise(size(col("__toks"))))
      .select(col(id), col("__n").as("doc_tokens"),
        posexplode(transform(
          sequence(lit(0), greatest(
            ceil((col("__n") - lit(overlap)).cast("double") / step).cast("int") - 1,
            lit(0))),
          i => concat_ws(" ", slice(col("__toks"), i * step + 1, lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
      // the chunk is slice(__toks, idx·step + 1, chunkTokens) of
      // whitespace-free tokens, so its token count is pure arithmetic
      // on the slice bounds — min(chunkTokens, n − idx·step), clamped
      // to 0 for the empty-doc placeholder chunk. The length guard
      // covers the one divergent edge: a chunk holding ONLY the empty
      // token that split() leaves behind non-space trailing/leading
      // whitespace (trim strips spaces only) renders as "" and must
      // count 0, as size(split("", " ")) did. Every non-empty chunk's
      // count equals size(split(chunk_text, " ")) exactly (empties
      // within a chunk are preserved by both forms).
      .withColumn("chunk_tokens",
        when(length(col("chunk_text")) === 0, lit(0))
          .otherwise(greatest(least(lit(chunkTokens),
            col("doc_tokens") - col("chunk_idx") * step), lit(0))))
  }

  // ---- TF-IDF ------------------------------------------------------------
  /** Top-k characteristic terms per document with smoothed TF-IDF
    * scores (idf = ln((N+1)/(df+1)) + 1).
    *
    * Scale shape: explode → (doc, term) partial-agg (map-side combine
    * absorbs within-doc repetition), a term-grain re-agg for document
    * frequency, one shuffle join of two term-keyed frames, and a
    * broadcast of the 1-row corpus count. Selection of the top terms
    * uses the integer (tf desc, term) ordering, so the chosen rows are
    * deterministic across engines even though the score itself is
    * libm-derived. */
  def tfidf(df: DataFrame, id: String, text: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(id), explode(Dedup.tokens(col(text))).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("dfc"))
    val nDocs = df.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy(col(id)).orderBy(col("tf").desc, col("term"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * (log((col("nd") + 1.0) / (col("dfc") + 1.0)) + 1.0), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col(id), col("term"), col("tf"), col("tfidf"))
  }

  // ---- unigram-LM perplexity proxy ---------------------------------------
  /** CCNet-style language-model quality proxy, with the corpus itself
    * as the unigram model: score(doc) = mean over tokens of
    * -ln p(term), where p(term) = corpus_count(term) / corpus_tokens.
    * Low score = typical text; high = rare-token soup (often junk).
    *
    * Scale shape: one explode → (doc, term) partial agg, a term-grain
    * re-agg for the model, a term-keyed shuffle join back (the model
    * frame usually broadcasts; AQE decides), and a doc-grain agg.
    * The per-term -ln p is weighted by the doc's term count, so the
    * join carries distinct (doc, term) rows, not every token. */
  def unigramLmScore(df: DataFrame, id: String, text: String): DataFrame = {
    val tf = df.select(col(id), explode(Dedup.tokens(col(text))).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val model = tf.groupBy("term").agg(sum("tf").as("cf"))
    val total = model.agg(sum("cf").as("ct"))
    tf.join(model, "term")
      .crossJoin(broadcast(total))
      .groupBy(col(id))
      .agg(
        sum(col("tf")).as("n_tokens"),
        // decimal accumulation: a double SUM is addition-order-dependent
        // and would break cross-engine hash comparison (Exact.dsum rule)
        round((sum((col("tf") * -log(col("cf").cast("double") / col("ct").cast("double")))
            .cast("decimal(38,18)")).cast("double")
          / sum(col("tf")).cast("double")), 6).as("lm_score"))
  }

  /** Interpolated bigram language-model score — the CCNet-grade
    * fluency read one order above [[unigramLmScore]] (Wenzek et al.
    * 2020 filter perplexity-ranks with a KenLM n-gram model; the
    * corpus-as-its-own-model bigram with unigram interpolation is the
    * engine-exact distributed analogue). Per doc: the mean over
    * bigram OCCURRENCES of −ln p(w₂|w₁) with the Jelinek–Mercer
    * mixture p = λ·c(w₁w₂)/c(w₁) + (1−λ)·(c(w₂)+1)/(N+V) — the
    * maximum-likelihood bigram backed off to the add-one unigram, so
    * p > 0 always and rote boilerplate (predictable continuations)
    * scores LOW while token salad scores high. λ = ½ keeps the weight
    * arithmetic exact. Docs with < 2 tokens have no bigram
    * occurrences and drop out (the explode-scorer contract).
    *
    * Engine-exact: counts are integers, both mixture terms are
    * single IEEE divisions of identical integers, λ-scaling is a
    * power of two, ln falls under the trig-family cross-engine
    * contract, per-doc sums are decimal(38,18)-accumulated, and the
    * score rounds to 6 decimals. Tokens are pre-filtered of empties
    * (`array_remove`) so both engines pair the identical adjacent
    * sequences.
    *
    * Shape: the corpus is scanned twice (token scan for the unigram
    * model, pair scan for the doc×bigram counts); the model tables
    * are vocabulary/bigram-bounded partial aggs; scoring is three
    * key-partitioned joins of the doc-bigram table against them plus
    * a broadcast 1-row totals table — no window, no driver data.
    * Output: (id, n_bigrams, lm2_score). */
  def bigramLmScore(df: DataFrame, id: String, text: String): DataFrame = {
    val clean = array_remove(Dedup.tokens(col(text)), "")
    val toks = df.select(col(id), clean.as("__w"))
    val m = greatest(size(col("__w")) - 1, lit(0))
    val pairs = toks
      .select(col(id), explode(zip_with(
        slice(col("__w"), lit(1), m), slice(col("__w"), lit(2), m),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__p"))
      .select(col(id), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val tf2 = pairs.groupBy(col(id), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val bigrams = tf2.groupBy("w1", "w2").agg(sum(col("tf")).as("c2"))
    // unigram model materialized once (r17, dedupClusters checkpoint
    // convention): `uni` is vocabulary-bounded but was referenced by
    // THREE consumers (totals, w1 join, w2 join), each re-running the
    // corpus token scan behind it — 3 of this query's 5 corpus scans
    val uni = Materialize.cp(df.select(explode(clean).as("__t")).filter(col("__t") =!= "")
      .groupBy("__t").agg(count(lit(1)).as("c1")))
    val totals = uni.agg(sum(col("c1")).as("n"), count(lit(1)).as("v"))
    val p = lit(0.5) * (col("c2").cast("double") / col("c1w1").cast("double")) +
      lit(0.5) * ((col("c1w2") + lit(1)).cast("double")
        / (col("n") + col("v")).cast("double"))
    tf2.join(bigrams, Seq("w1", "w2"))
      .join(uni.select(col("__t").as("w1"), col("c1").as("c1w1")), Seq("w1"))
      .join(uni.select(col("__t").as("w2"), col("c1").as("c1w2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .groupBy(col(id))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        round(sum((col("tf") * -log(p)).cast("decimal(38,18)")).cast("double")
          / sum(col("tf")).cast("double"), 6).as("lm2_score"))
  }

  /** Per-document token (Shannon) entropy in nats — the lexical-
    * diversity quality signal (MassiveText-family rules pair it with
    * repetition fractions): H = −Σ (tf/n)·ln(tf/n) over the doc's
    * token distribution. Boilerplate and keyword-stuffed pages sit
    * low; fluent prose sits near ln(vocabulary-per-doc). Also emits
    * the normalized form H/ln(n_distinct) ∈ [0,1] (NULL for
    * single-distinct-token docs, where it is undefined).
    *
    * Engine-exact: tf/n are IEEE divisions of exact integers, ln
    * under the trig-family contract, the per-doc sum
    * decimal(38,18)-accumulated, both outputs rounded to 6. Shape:
    * one explode + two partial aggs keyed by doc — a single shuffle
    * at any corpus size, no model table, no join.
    * Output: (id, n_tokens, n_distinct, entropy, entropy_norm). */
  /** Yule's characteristic K per stratum (Yule 1944) — the classic
    * lexical-concentration constant (how repetitive is the
    * vocabulary, independent of corpus size): K = 10⁴·(Σ_m m²·V_m −
    * N)/N² over the frequency-of-frequencies spectrum (V_m = types
    * occurring m times, N = tokens). High K = template/boilerplate-
    * heavy text (synthetic spam reads 2-10× natural prose); stable
    * under sampling where raw type/token ratios aren't — the
    * fingerprint beside Zipf slope (90n) and Heaps growth (90n2).
    *
    * Exactness: the spectrum is two keyed partial aggs of exact
    * integers; Σm²V_m folds as one more agg; K is ONE division of
    * exact decimals (string-bridged), scaled by the integer 10⁴ in
    * the numerator. Output per stratum: (key, n_tokens, n_types,
    * yule_k); degenerate strata (N < 2) read NULL. */
  def yuleK(df: DataFrame, stratum: Column, text: String): DataFrame = {
    val Dec = "decimal(38,0)"
    def d2d(c: Column): Column = c.cast("string").cast("double")
    val tf = df.select(stratum.cast("string").as("key"),
        explode(Dedup.tokens(col(text))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("key"), col("__t")).agg(count(lit(1)).as("__m"))
    val a = tf.groupBy("key").agg(
      sum(col("__m")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum((col("__m").cast(Dec) * col("__m").cast(Dec)).cast(Dec))
        .cast(Dec).as("__s2"))
    val nD = col("n_tokens").cast(Dec)
    a.select(col("key"), col("n_tokens"), col("n_types"),
        when(col("n_tokens") > 1L,
          d2d((lit(10000L).cast(Dec) * (col("__s2") - nD)).cast(Dec)) /
            d2d((nD * nD).cast(Dec))).as("yule_k"))
      .orderBy(col("key"))
  }

  def tokenEntropy(df: DataFrame, id: String, text: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(id), explode(Dedup.tokens(col(text))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(id), col("__t")).agg(count(lit(1)).as("__tf"))
    // doc-partitioned window over the doc's DISTINCT tokens — bounded
    // by per-doc vocabulary, and on the same key as the final agg so
    // both share one Exchange
    val withN = tf.withColumn("__n",
      sum(col("__tf")).over(Window.partitionBy(col(id))))
    val p = col("__tf").cast("double") / col("__n").cast("double")
    withN.groupBy(col(id))
      .agg(
        max(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(sum((p * -log(p)).cast("decimal(38,18)")).cast("double"), 6)
          .as("entropy"))
      .withColumn("entropy_norm",
        when(col("n_distinct") > 1,
          round(col("entropy") / log(col("n_distinct").cast("double")), 6)))
  }

  /** Blocklist filter (the C4 "bad words" pass, Raffel et al. 2020 —
    * C4 drops any page containing a term from a public blocklist):
    * per doc, the number of token occurrences hitting the list and
    * the drop flag. The list is dimension-sized by contract and
    * broadcast; occurrence counting is a left semi-style broadcast
    * join over the exploded tokens + one partial agg — one corpus
    * scan, no shuffle of the text itself. Zero-token docs keep
    * n_hits=0 via the left join back to the input keys.
    * Output: (id, n_hits, blocked). */
  def blocklist(df: DataFrame, id: String, text: String,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist: empty term list")
    val spark = df.sparkSession
    import spark.implicits._
    val tl = terms.toDF("__term")
    val hits = df.select(col(id), explode(Dedup.tokens(col(text))).as("__term"))
      .join(broadcast(tl), Seq("__term"))
      .groupBy(col(id)).agg(count(lit(1)).as("n_hits"))
    df.select(col(id)).join(hits, Seq(id), "left")
      .select(col(id), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("blocked", col("n_hits") > 0)
  }

  /** Vocabulary coverage / OOV ratio against the corpus's own top-V
    * vocabulary — the "will my tokenizer cover this doc" read used to
    * flag boilerplate/garbage before training and to size tokenizer
    * vocabularies. Vocabulary = the V most frequent tokens (EXACT
    * counts; ties to the lexicographically smaller token), built
    * in-plan and broadcast back; per-doc coverage counts token
    * OCCURRENCES inside the vocabulary. Integer counts + one final
    * IEEE division keep every value engine-exact (no logs, no
    * order-dependent double sums).
    *
    * Shape: token counts = one explode + partial-agg groupBy; top-V =
    * TakeOrdered (never a full sort); scoring = a second explode with
    * the broadcast vocab joined on, then one partial-agg per doc.
    * Zero-token docs have no occurrences and drop out (same contract
    * as the explode-based scorers above).
    * Output: (id, n_tokens, in_vocab, oov_ratio). */
  def vocabCoverage(df: DataFrame, id: String, text: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabCoverage: vocabSize=$vocabSize must be >= 1")
    val toks = df.select(col(id), explode(Dedup.tokens(col(text))).as("__tok"))
    val vocab = toks.groupBy("__tok").agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__tok")).limit(vocabSize)
      .select(col("__tok"), lit(1L).as("__in"))
    toks.join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__in"), lit(0L))).as("in_vocab"))
      .withColumn("oov_ratio",
        (col("n_tokens") - col("in_vocab")).cast("double")
          / col("n_tokens").cast("double"))
  }

  /** Vocabulary SHIFT between two corpus eras — the per-term
    * heavy-change read behind the distribution-level JS divergence
    * (which says THAT the mix moved, not WHAT moved): for every term
    * above a count floor, the occurrence-rate delta between the old
    * and new era, top-k by |shift|. The trending-vocabulary audit a
    * corpus curator runs between snapshots (a surging boilerplate
    * token, a new spam campaign, a collapsing source). Shape: one
    * explode → one (term × era) partial agg; the era totals are a
    * 1-row broadcast; top-k is TakeOrdered, never a full sort.
    * Engine-exact: integer counts, two exact divisions, one
    * subtraction. minCount floors the rare tail (a 1-occurrence term
    * has the noisiest possible rate). Output: (term, n_old, n_new,
    * rate_old, rate_new, shift = rate_new − rate_old). */
  def vocabShift(df: DataFrame, text: String, newEra: Column,
                 k: Int = 50, minCount: Long = 10L): DataFrame = {
    require(k >= 1 && minCount >= 1,
      s"vocabShift: need k >= 1, minCount >= 1 (got $k, $minCount)")
    val toks = df.select(newEra.as("__new"),
      explode(Dedup.tokens(col(text))).as("term"))
      .filter(col("term") =!= "")
    val counts = toks.groupBy("term")
      .agg(sum(when(col("__new"), 0L).otherwise(1L)).as("n_old"),
        sum(when(col("__new"), 1L).otherwise(0L)).as("n_new"))
    val tot = counts.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    counts.filter(col("n_old") + col("n_new") >= minCount)
      .crossJoin(broadcast(tot))
      .select(col("term"), col("n_old"), col("n_new"),
        (col("n_old").cast("double") / col("__to").cast("double"))
          .as("rate_old"),
        (col("n_new").cast("double") / col("__tn").cast("double"))
          .as("rate_new"))
      .withColumn("shift", col("rate_new") - col("rate_old"))
      .orderBy(abs(col("shift")).desc, col("term"))
      .limit(k)
  }

  // ---- corpus n-gram frequency -------------------------------------------
  /** Corpus-wide top-k word n-grams by occurrence count (ties broken
    * by gram text). Explode → partial-agg groupBy → global
    * TakeOrderedAndProject: one shuffle, top-k never materializes the
    * full frequency table on one node. */
  def ngramFreq(df: DataFrame, text: String, n: Int, k: Int): DataFrame =
    df.select(explode(Dedup.shinglesFast(col(text), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram")).limit(k)

  /** Bigram collocations ranked by PMI lift
    * n·c(ab) / (c(a)·c(b)) — the association measure behind phrase
    * mining and tokenizer-vocabulary seeding (Church & Hanks 1990).
    * Lift is monotone in PMI (PMI = log lift), and emitting the
    * log-free ratio keeps the output engine-exact: integer counts
    * ride into doubles untouched (< 2^53) and the single division is
    * IEEE-identical everywhere, where ln()'s last ulp is libm-specific.
    *
    * Shape: unigram and bigram counts are two partial aggs over the
    * SAME codegen'd shingle kernel (one corpus scan each, map-side
    * combine), the total is a 1-row broadcast, candidate bigrams are
    * cut to cnt ≥ minCount BEFORE the two shuffle joins that attach
    * c(a)/c(b) (the joins move the rare-bigram tail, never the
    * corpus), and top-k is TakeOrdered — no full sort.
    * Output: (bigram, cnt, lift). */
  def pmiBigrams(df: DataFrame, text: String, minCount: Int = 5,
                 k: Int = 50): DataFrame = {
    require(minCount >= 1, s"pmiBigrams: minCount must be >= 1 (got $minCount)")
    require(k >= 1, s"pmiBigrams: k must be >= 1 (got $k)")
    // w=1 shingles = the tokenizer itself, so unigram counts come from
    // the IDENTICAL kernel as bigram parts (no regex-class drift)
    val uni = df.select(explode(Dedup.shinglesFast(col(text), 1)).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c1"))
    val total = uni.agg(sum(col("c1")).as("n"))
    // short docs fall back to a single partial window without a
    // space — the contains-space filter keeps true bigrams only
    val bi = df.select(explode(Dedup.shinglesFast(col(text), 2)).as("bigram"))
      .filter(col("bigram").contains(" "))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    bi.withColumn("t1", split(col("bigram"), " ").getItem(0))
      .withColumn("t2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("t").as("t1"), col("c1").as("__ca")), Seq("t1"))
      .join(uni.select(col("t").as("t2"), col("c1").as("__cb")), Seq("t2"))
      .crossJoin(broadcast(total))
      .withColumn("lift",
        col("n").cast("double") * col("cnt").cast("double") /
          (col("__ca").cast("double") * col("__cb").cast("double")))
      .orderBy(col("lift").desc, col("bigram")).limit(k)
      .select("bigram", "cnt", "lift")
  }

  /** TextRank keyterms (Mihalcea & Tarau 2004) — graph-centrality
    * keyword extraction over the corpus co-occurrence graph: where
    * [[tfidf]] scores terms per document and [[pmiBigrams]] scores
    * PAIRS, TextRank scores single terms by how central they sit in
    * the adjacency structure (a term adjacent to many well-connected
    * terms outranks a merely frequent one — the classic
    * stopword-resistant keyphrase signal). Composition, not new
    * machinery: adjacent-word bigram counts (the [[pmiBigrams]]
    * kernel) above a count floor become undirected edges, and
    * [[Graph.pageRank]] runs its engine-exact fixed-iteration score
    * over them.
    *
    * Shape: one tokenize scan → bigram partial agg → floor cut, a
    * vocabulary-sized symmetrized edge distinct, the pageRank
    * iterations (edge-table joins — vocabulary-sized, not corpus-
    * sized), TakeOrdered(k). Output: (node, rank), top-k terms. */
  def textRank(df: DataFrame, text: String, minCount: Int = 5,
               iters: Int = 2, k: Int = 20): DataFrame = {
    require(minCount >= 1, s"textRank: minCount must be >= 1 (got $minCount)")
    require(k >= 1, s"textRank: k must be >= 1 (got $k)")
    val bi = df.select(explode(Dedup.shinglesFast(col(text), 2)).as("bigram"))
      .filter(col("bigram").contains(" "))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(split(col("bigram"), " ").getItem(0).as("src"),
        split(col("bigram"), " ").getItem(1).as("dst"))
      .filter(col("src") =!= col("dst") &&
        col("src") =!= "" && col("dst") =!= "")
    val sym = bi.unionByName(
        bi.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    Graph.pageRank(sym, "src", "dst", iters)
      .orderBy(col("rank").desc, col("node")).limit(k)
  }

  /** Adjacent-symbol pair counts inside words — the statistic the
    * first BPE merge maximizes (Sennrich et al. 2016): every 2-char
    * window of every word, counted corpus-wide. One tokenize scan,
    * one explode of ≤ |word| windows per word, one partial agg, and a
    * TakeOrdered(k) cut. The per-word window list is a transform over
    * an index sequence whose lambda touches only its index var and
    * the bound word attribute — no outer-subtree re-evaluation.
    * Output: (pair, cnt). */
  def bpePairs(df: DataFrame, text: String, k: Int = 40): DataFrame =
    df.select(explode(Dedup.shinglesFast(col(text), 1)).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(k)

  /** Train `merges` BPE merge rules on the corpus (Sennrich et al.
    * 2016) — the missing half of the tokenizer story next to
    * [[subwordTokenize]] (apply) and [[bpePairs]] (one round of pair
    * stats): this LEARNS the merge table.
    *
    * Scale shape: ONE corpus tokenize pass collapses to the
    * word-frequency table (vocab-sized — the corpus is never touched
    * again); each merge round is one pair-count partial agg + a
    * TakeOrdered(1) argmax over that table, with only the single
    * winning pair round-tripping the driver per round (the kmeansLloyd
    * iterate recipe). Words are carried as symbol strings
    * `|a||b||c|`; applying a merge is a non-overlapping left-to-right
    * `replace` of `|l||r|` with `|lr|` — exactly BPE's greedy
    * convention, and bit-identical in any engine with plain string
    * replace. Ties break (count desc, left asc, right asc);
    * integer-exact throughout. Stops early if no pair reaches
    * `minCount`. Output: (rank 1.., l_sym, r_sym, pair_count). */
  def bpeTrain(df: DataFrame, text: String, merges: Int,
               minCount: Long = 1L): DataFrame = {
    require(merges >= 1 && merges <= 64,
      s"bpeTrain: merges must be in [1, 64] (got $merges)")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE corpus pass; the word table is vocab-sized and persists for
    // the merge rounds (each round re-reads it, never the corpus)
    val words = df
      .select(explode(Dedup.tokens(col(text))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(concat(lit("|"),
        array_join(split(col("w"), ""), "||"), lit("|")).as("s"), col("wc"))
      .persist()
    try {
      var cur = words
      val learned =
        scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var r = 1
      var exhausted = false
      while (r <= merges && !exhausted) {
        val arr = split(expr("substring(s, 2, length(s) - 2)"), "\\|\\|")
        val top = cur.withColumn("__arr", arr)
          .select(explode(when(size(col("__arr")) >= 2,
            expr("""transform(sequence(1, size(__arr) - 1),
                    i -> struct(element_at(__arr, i) AS l,
                                element_at(__arr, i + 1) AS r))"""))
            .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("__p"),
            col("wc"))
          .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
          .agg(sum(col("wc")).as("c"))
          .filter(col("c") >= minCount)
          .orderBy(col("c").desc, col("l"), col("r")).limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, rr, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          learned += ((r, l, rr, c))
          // non-regex left-to-right replace: BPE's greedy application
          cur = cur.select(
            org.apache.spark.sql.functions.replace(col("s"),
              lit(s"|$l||$rr|"), lit(s"|$l$rr|")).as("s"), col("wc"))
          r += 1
        }
      }
      learned.toSeq.toDF("rank", "l_sym", "r_sym", "pair_count")
    } finally { words.unpersist(); () }
  }

  /** WordPiece merge-rule training (Schuster & Nakajima 2012; the
    * BERT tokenizer's learner) — [[bpeTrain]]'s LIKELIHOOD-scored
    * sibling: each round merges the pair maximizing
    * score = count(ab) / (count(a)·count(b)) — the unigram-LM
    * likelihood GAIN of the merge — instead of BPE's raw frequency,
    * so rare-but-cohesive pairs ("##ing" after a rare stem) win over
    * merely common ones. Same machinery: ONE corpus pass to the
    * persisted vocab-sized word table, per round one pair agg + one
    * symbol agg + a broadcast-sized argmax, greedy boundary-encoded
    * replace.
    *
    * Exactness: counts are exact longs; the score is ONE division of
    * exact integers (identical double on any engine), argmax breaks
    * ties by (l, r) ascending — the round unroll replays verbatim.
    * Output (rank, l_sym, r_sym, pair_count, score). */
  def wordPieceTrain(df: DataFrame, text: String, merges: Int,
                     minCount: Long = 1L): DataFrame = {
    require(merges >= 1 && merges <= 64,
      s"wordPieceTrain: merges must be in [1, 64] (got $merges)")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(Dedup.tokens(col(text))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(concat(lit("|"),
        array_join(split(col("w"), ""), "||"), lit("|")).as("s"), col("wc"))
      .persist()
    try {
      var cur = words
      val learned = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, Long, Double)]
      var r = 1
      var exhausted = false
      while (r <= merges && !exhausted) {
        val arr = split(expr("substring(s, 2, length(s) - 2)"), "\\|\\|")
        val withArr = cur.withColumn("__arr", arr)
        val sym = withArr
          .select(explode(col("__arr")).as("sym"), col("wc"))
          .groupBy("sym").agg(sum(col("wc")).as("sc"))
        val pairs = withArr
          .select(explode(when(size(col("__arr")) >= 2,
            expr("""transform(sequence(1, size(__arr) - 1),
                    i -> struct(element_at(__arr, i) AS l,
                                element_at(__arr, i + 1) AS r))"""))
            .otherwise(array().cast("array<struct<l:string,r:string>>")))
            .as("__p"), col("wc"))
          .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
          .agg(sum(col("wc")).as("c"))
          .filter(col("c") >= minCount)
        val top = pairs
          .join(broadcast(sym.select(col("sym").as("l"),
            col("sc").as("__scl"))), "l")
          .join(broadcast(sym.select(col("sym").as("r"),
            col("sc").as("__scr"))), "r")
          .withColumn("score", col("c").cast("double") /
            (col("__scl") * col("__scr")).cast("double"))
          .orderBy(col("score").desc, col("l"), col("r")).limit(1)
          .select("l", "r", "c", "score")
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, rr, c, sc) = (top(0).getString(0), top(0).getString(1),
            top(0).getLong(2), top(0).getDouble(3))
          learned += ((r, l, rr, c, sc))
          cur = cur.select(
            org.apache.spark.sql.functions.replace(col("s"),
              lit(s"|$l||$rr|"), lit(s"|$l$rr|")).as("s"), col("wc"))
          r += 1
        }
      }
      learned.toSeq.toDF("rank", "l_sym", "r_sym", "pair_count", "score")
    } finally { words.unpersist(); () }
  }

  /** Apply learned BPE merge rules — the inference half of
    * [[bpeTrain]]: every word takes the SAME boundary encoding and
    * the same greedy left-to-right replace, one rule per rank in
    * order (exactly how the trainer itself rewrote its word table, so
    * train→apply round-trips losslessly), all as ONE codegen
    * projection per document — the merges ride in as literals
    * (driver-small by the train contract; no join, no shuffle).
    * Output: input + `bpe_tokens` (subword array, word-major order) +
    * `n_bpe`. */
  def bpeApply(df: DataFrame, text: String,
               merges: Seq[(String, String)]): DataFrame = {
    require(merges.size <= 256,
      s"bpeApply: merge list must be driver-small (got ${merges.size})")
    def applyOne(w: Column): Column = {
      val enc = concat(lit("|"), array_join(split(w, ""), "||"), lit("|"))
      val merged = merges.foldLeft(enc)((acc, m) =>
        org.apache.spark.sql.functions.replace(acc,
          lit(s"|${m._1}||${m._2}|"), lit(s"|${m._1}${m._2}|")))
      split(merged.substr(lit(2), length(merged) - 2), "\\|\\|")
    }
    val subs = flatten(transform(
      filter(Dedup.tokens(col(text)), w => length(w) > 0), applyOne(_)))
    df.withColumn("bpe_tokens", subs)
      .withColumn("n_bpe", size(col("bpe_tokens")).cast("long"))
  }

  /** Chat/SFT template rendering — the supervised-data shaping step:
    * a turn table (conv_id, turn_idx, role, content) renders into ONE
    * training string per conversation — role-tagged turns in index
    * order, truncated to the first `maxTurns` (the context-length
    * guard). Assembly is an in-agg sort_array over turn structs —
    * conversation-sized arrays by construction (the shardManifest
    * digest pattern), ONE partial-aggregatable groupBy, no window.
    * The template is the simple `<|role|>content` + newline form;
    * real tokenizer special-token layouts are a string-literal swap.
    * Output: (conv_id, n_turns, kept_turns, rendered, n_chars). */
  def renderChat(turns: DataFrame, convId: String, turnIdx: String,
                 role: String, content: String, maxTurns: Int): DataFrame = {
    require(maxTurns >= 1, s"renderChat: maxTurns must be >= 1 (got $maxTurns)")
    val kept = slice(sort_array(collect_list(struct(
      col(turnIdx).as("i"), col(role).as("r"), col(content).as("c")))),
      1, maxTurns)
    turns.groupBy(col(convId))
      .agg(count(lit(1)).as("n_turns"), kept.as("__k"))
      .withColumn("kept_turns", size(col("__k")).cast("long"))
      .withColumn("rendered", concat_ws("\n", transform(col("__k"),
        e => concat(lit("<|"), e.getField("r"), lit("|>"), e.getField("c")))))
      .withColumn("n_chars", length(col("rendered")).cast("long"))
      .drop("__k")
  }

  // ---- Gopher-style quality rules ---------------------------------------
  /** Document-level quality-filter features in the style of the Gopher
    * rules (Rae et al. 2021, "Scaling Language Models", table A1):
    * word count bounds, mean word length, symbol-to-word ratio,
    * bullet/ellipsis line fractions, fraction of words with an
    * alphabetic character, stopword hits — plus the composite pass
    * flag. One linear scan, per-row column arithmetic only (ratios are
    * single IEEE divisions — engine-exact, no rounding). */
  def gopherRules(df: DataFrame, text: String): DataFrame = {
    val t = col(text)
    val words = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val nw = size(words).cast("double")
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nl = size(lines).cast("double")
    val charsInWords = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double")
    val symbolWords = size(filter(words,
      w => w.contains("#") || w.contains("..."))).cast("double")
    val bulletLines = size(filter(lines,
      l => ltrim(l).rlike("^[-*•]"))).cast("double")
    val ellipsisLines = size(filter(lines,
      l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("double")
    val stopHits = size(array_intersect(Dedup.tokens(t),
      array(stopwords("en").map(lit): _*)))
    df.withColumn("n_words", nw.cast("long"))
      .withColumn("mean_word_len", charsInWords.cast("double") / greatest(nw, lit(1.0)))
      .withColumn("alpha_word_frac", alphaWords / greatest(nw, lit(1.0)))
      .withColumn("symbol_word_frac", symbolWords / greatest(nw, lit(1.0)))
      .withColumn("bullet_line_frac", bulletLines / greatest(nl, lit(1.0)))
      .withColumn("ellipsis_line_frac", ellipsisLines / greatest(nl, lit(1.0)))
      .withColumn("stop_hits", stopHits)
      .withColumn("gopher_pass",
        nw >= 50 && nw <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("alpha_word_frac") >= 0.80 &&
          col("symbol_word_frac") <= 0.10 &&
          col("bullet_line_frac") <= 0.90 &&
          col("ellipsis_line_frac") <= 0.30 &&
          col("stop_hits") >= 2)
  }

  // ---- filter-funnel telemetry -------------------------------------------
  /** One-scan funnel telemetry for a chain of quality filters: how
    * many docs survive each cumulative stage (stage i = AND of the
    * first i predicates — the order the pipeline would apply them).
    * The whole funnel is ONE aggregate scan — N conditional counts in
    * a single partial agg, then a constant-size unpivot — so at 100 TB
    * the telemetry costs one pass, not one pass per stage, and the
    * counts are exact (not sampled). This is the report every
    * DataComp/DCLM-style filtering pipeline publishes before anyone
    * trusts its output.
    *
    * Output: (stage_idx, stage, survivors, kept_frac); stage_idx 0 is
    * the unfiltered input. */
  def filterFunnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "filterFunnel: no stages")
    val cums = stages.scanLeft(lit(true))((acc, s) => acc && s._2).tail
    val aggs = count(lit(1)).as("__n0") +:
      cums.zipWithIndex.map { case (c, i) => count(when(c, 1)).as(s"__n${i + 1}") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = ("input" +: stages.map(_._1)).zipWithIndex.map { case (nm, i) =>
      struct(lit(nm).as("stage"), col(s"__n$i").as("survivors"))
    }
    one.select(col("__n0"), posexplode(array(entries: _*)))
      .select(col("pos").cast("int").as("stage_idx"),
        col("col.stage").as("stage"),
        col("col.survivors").as("survivors"),
        (col("col.survivors").cast("double") / col("__n0").cast("double"))
          .as("kept_frac"))
  }

  // ---- repetition detection ----------------------------------------------
  /** Repetition features (the Gopher duplicate-content rules): fraction
    * of lines (and of their characters) that are duplicates of another
    * line in the same document, and the share of the document's word
    * bigrams taken by its single most frequent bigram.
    *
    * Scale shape: two explode→partial-agg pipelines keyed by
    * (doc, line) / (doc, bigram) — map-side combine absorbs the
    * within-doc repetition that this operator exists to find — then a
    * re-agg to doc grain and one join of two doc-grain frames. No
    * per-doc collect; skew (one giant doc) is bounded by the partial
    * aggregation. */
  def repetition(df: DataFrame, id: String, text: String): DataFrame = {
    val lines = df.select(col(id),
        explode(filter(split(col(text), "\n"), l => length(trim(l)) > 0)).as("line"))
    val lineStats = lines.groupBy(col(id), col("line"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("chars", length(col("line")).cast("long"))
      .groupBy(col(id))
      .agg(
        sum(col("cnt")).as("n_lines"),
        (sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).cast("double") /
          sum(col("cnt")).cast("double")).as("dup_line_frac"),
        (sum(when(col("cnt") > 1, col("cnt") * col("chars")).otherwise(0L)).cast("double") /
          sum(col("cnt") * col("chars")).cast("double")).as("dup_char_frac"))
    val bigrams = df.select(col(id),
        explode(Dedup.shinglesFast(col(text), 2)).as("bigram"))
    val bigramStats = bigrams.groupBy(col(id), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(id))
      .agg((max(col("cnt")).cast("double") / sum(col("cnt")).cast("double"))
        .as("top_bigram_frac"))
    lineStats.join(bigramStats, Seq(id), "full")
  }

  // ---- fingerprinting ----------------------------------------------------
  /** Winnowing fingerprint (Schleimer et al.): k-gram rolling hashes,
    * minimum per sliding window of w, distinct mins = fingerprint set.
    * Output: fingerprint array + a single 64-bit doc fingerprint. */
  def fingerprint(df: DataFrame, text: String, k: Int = 8, w: Int = 4): DataFrame = {
    val grams = Dedup.charNgrams(col(text), k)
    val hashes = transform(grams, g => xxhash64(g))
    // rolling min over width-w windows via shifted zip_with (least
    // skips the null padding) — single evaluation of the hash array,
    // see Dedup's EVALUATION-SHAPE RULE
    val windows = Dedup.slidingCombine(hashes, w, (a, b) => least(a, b))
    df.withColumn("fingerprints", array_sort(array_distinct(windows)))
      .withColumn("n_fingerprints", size(col("fingerprints")))
      // single 64-bit doc id: hash of the sorted fingerprint set (an
      // FNV multiply-fold would long-overflow under ANSI mode)
      .withColumn("doc_fingerprint",
        xxhash64(concat_ws(",", transform(col("fingerprints"), v => v.cast("string")))))
  }

  /** Engine-portable winnowing variant: k-gram hashes are md5-prefix
    * hex strings (identical in any engine), window minima are
    * lexicographic. Same selection semantics as `fingerprint` (which
    * uses the xxhash64 kernel and is engine-specific); this form is
    * hash-comparable against a SQL oracle. */
  def fingerprintPortable(df: DataFrame, id: String, text: String,
                          k: Int = 8, w: Int = 4): DataFrame = {
    val grams = Dedup.charNgrams(col(text), k)
    val hashes = transform(grams, g => substring(md5(g), 1, 16))
    // least() skips the null padding of partial tail windows
    val wins = Dedup.slidingCombine(hashes, w, (a, b) => least(a, b))
    df.select(col(id), array_sort(array_distinct(wins)).as("__fps"))
      .select(col(id),
        size(col("__fps")).as("n_fingerprints"),
        md5(concat_ws(",", col("__fps"))).as("doc_fingerprint"))
  }

  /** HTML/markup boilerplate strip — the standard first pass over
    * crawled pages before language-ID and quality scoring: drop
    * script/style blocks wholesale, then all tags, decode the six
    * common entities, collapse whitespace. RE2-class patterns only
    * (non-greedy + character classes, no lookaround), so a SQL engine
    * replays the identical cleanup; pure codegen projection, no
    * shuffle. &amp; decodes LAST so "&amp;lt;" becomes "&lt;" (the
    * literal), never "<". */
  def stripMarkup(text: Column): Column = {
    val noBlock = regexp_replace(text,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlock, "<[^>]+>", " ")
    val ent = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  // ---- scrubbing / redaction ---------------------------------------------
  // RE2-compatible patterns (no backrefs/lookaround) so a SQL engine
  // oracle can replicate them exactly.
  private val urlRe = "https?://[^\\s]+"
  /** Crawl-text normalization — the standard pre-tokenization cleanup
    * (C4-style): ASCII-fold the typographic unicode a crawl drags in
    * (curly quotes, en/em dashes, ellipsis), map unicode spaces (nbsp,
    * figure/narrow spaces, ideographic space) to plain space, strip
    * C0/DEL control characters (newline and tab survive), squash
    * space/tab runs, collapse 3+ newlines to a paragraph break, trim.
    * Pure codegen regex/translate projection — linear scan, no
    * shuffle; the 100 TB shape is a mapper. Order is part of the
    * contract: fold → spaces → strip → squash → collapse → trim
    * (folding first keeps a curly quote from surviving inside a
    * squashed run). Patterns use \x{...} escapes, which Java regex and
    * RE2 read identically — the oracle replays char for char. */
  def normalizeText(text: Column): Column = {
    val folded = translate(text,
      "‘’‚“”„–—", "'''\"\"\"--")
    val dots = regexp_replace(folded, "…", "...")
    val spaces = regexp_replace(dots,
      "[\\x{00A0}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]", " ")
    val noCtl = regexp_replace(spaces,
      "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}]", "")
    val squashed = regexp_replace(noCtl, "[ \t]+", " ")
    val paras = regexp_replace(squashed, "\n{3,}", "\n\n")
    trim(paras)
  }

  // ---- encoding / mojibake audit ------------------------------------------
  /** U+FFFD — what a decoder emits where bytes were unmappable. */
  val replacementCharRe: String = "\\x{FFFD}"
  /** C1 controls U+0080–U+009F — the tell of cp1252/latin-1 bytes
    * mis-decoded as latin-1 (real text never contains them). */
  val c1ControlRe: String = "[\\x{80}-\\x{9F}]"
  /** Double-encoded UTF-8 artifact bigrams: a UTF-8 lead byte
    * mis-decoded as latin-1/cp1252 (Â U+00C2, Ã U+00C3, â U+00E2)
    * followed by a mis-decoded continuation byte — U+0080–U+00BF
    * under latin-1, or cp1252's remap of the 0x80–0x9F range (€ ‚ ƒ
    * „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ” • – — ˜ ™ š › œ ž Ÿ). Catches the
    * classic "CafÃ©" / "â€™" corpus damage; a lone accented lead
    * letter in real words ("âge") is NOT flagged (the next char is an
    * ordinary letter outside the class). */
  val mojibakeRe: String =
    "[\\x{C2}\\x{C3}\\x{E2}]" +
      "[\\x{80}-\\x{BF}\\x{20AC}\\x{201A}\\x{0192}\\x{201E}\\x{2026}" +
      "\\x{2020}\\x{2021}\\x{02C6}\\x{2030}\\x{0160}\\x{2039}\\x{0152}" +
      "\\x{017D}\\x{2018}\\x{2019}\\x{201C}\\x{201D}\\x{2022}\\x{2013}" +
      "\\x{2014}\\x{02DC}\\x{2122}\\x{0161}\\x{203A}\\x{0153}\\x{017E}" +
      "\\x{0178}]"

  /** Encoding / mojibake audit — the pre-quality pass real crawls
    * need and clean-text quality rules assume away: double-encoded
    * UTF-8 ("CafÃ©", "â€™"), replacement characters (U+FFFD), and C1
    * control codes are each counted by an RE2-compatible rule (the
    * \x{...} escapes Java regex and RE2 read identically — the oracle
    * replays char for char), turned into per-doc rates, and folded
    * into one `suspect` flag at caller-tunable thresholds. Pure
    * codegen regex projection — linear scan, no shuffle; the 100 TB
    * shape is a mapper that gates the rest of the filter funnel.
    * Rates divide exact longs as doubles (per-row IEEE — bit-exact
    * cross-engine). Output: (id, n_chars, repl_n, moji_n, c1_n,
    * repl_rate, moji_rate, c1_rate, suspect). */
  def mojibakeAudit(df: DataFrame, id: String, text: String,
                    replThreshold: Double = 0.001,
                    mojiThreshold: Double = 0.002,
                    c1Threshold: Double = 0.001): DataFrame = {
    val t = coalesce(col(text), lit(""))
    df.select(col(id), length(t).cast("long").as("n_chars"),
        regexp_count(t, lit(replacementCharRe)).cast("long").as("repl_n"),
        regexp_count(t, lit(mojibakeRe)).cast("long").as("moji_n"),
        regexp_count(t, lit(c1ControlRe)).cast("long").as("c1_n"))
      .withColumn("repl_rate", col("repl_n").cast("double") /
        greatest(col("n_chars"), lit(1L)).cast("double"))
      .withColumn("moji_rate", col("moji_n").cast("double") /
        greatest(col("n_chars"), lit(1L)).cast("double"))
      .withColumn("c1_rate", col("c1_n").cast("double") /
        greatest(col("n_chars"), lit(1L)).cast("double"))
      .withColumn("suspect",
        col("repl_rate") > lit(replThreshold) ||
          col("moji_rate") > lit(mojiThreshold) ||
          col("c1_rate") > lit(c1Threshold))
  }

  /** REMEDIATION twin of [[mojibakeAudit]] — repair double-encoded
    * UTF-8 ("cafÃ©" → "café", "â€™" → "’") via the native codegen
    * kernel ([[graft.plans.TextKernelsBridge.fixMojibake]]): sloppy
    * cp1252/latin-1 re-encode + strict UTF-8 re-decode, up to 3
    * passes for double-double encodings, DOUBLE-gated against false
    * positives — a string with zero artifact-signature bigrams is
    * never touched, and a pass is accepted only when the re-decode is
    * valid UTF-8 AND strictly reduces the artifact count (the ftfy
    * badness heuristic: real text like "ï—…" has a byte image that IS
    * valid UTF-8, so strictness alone would over-correct it). Genuine
    * accents, CJK, emoji, and U+FFFD all abort to the original; a
    * string MIXING clean non-latin content with mojibake passes
    * through unchanged — segment-wise repair is the documented
    * escalation. Linear scan, whole-stage codegen; the audit gates,
    * this repairs, the funnel re-audits. */
  def fixMojibake(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.FixMojibakeExpr(ColumnBridge.expr(text)))
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private val phoneRe = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** PII / boilerplate scrub: redact URLs, emails, IPv4s and
    * +international phone numbers with typed placeholder tokens, and
    * count each kind (counts are over the ORIGINAL text, independent
    * per pattern). Pure codegen'd regex projection — linear scan, no
    * shuffle; the 100 TB shape is a mapper. Replacement order
    * url → email → ip → phone is part of the contract (a URL may
    * contain an '@'; redacting it first keeps the email count and the
    * redacted text consistent). */
  def scrub(df: DataFrame, text: String): DataFrame = {
    val t = col(text)
    df.withColumn("n_urls", regexp_count(t, lit(urlRe)).cast("int"))
      .withColumn("n_emails", regexp_count(t, lit(emailRe)).cast("int"))
      .withColumn("n_ips", regexp_count(t, lit(ipRe)).cast("int"))
      .withColumn("n_phones", regexp_count(t, lit(phoneRe)).cast("int"))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(t, urlRe, "<URL>"),
              emailRe, "<EMAIL>"),
            ipRe, "<IP>"),
          phoneRe, "<PHONE>"))
  }

  /** Corpus-wide domain frequency: extract every URL's host, count,
    * top-k (ties broken by domain). Explode → partial-agg groupBy →
    * TakeOrdered: one shuffle at term grain. */
  def topDomains(df: DataFrame, text: String, k: Int): DataFrame =
    df.select(explode(regexp_extract_all(col(text),
        lit("https?://([^/\\s]+)"), lit(1))).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("domain"))
      .limit(k)

  // ---- URL canonicalization ----------------------------------------------
  /** Canonical URL for crawl-dedup keying — the normalization step
    * that runs before any content dedup in a web pipeline, so that
    * `HTTPS://WWW.Site.COM:443/a/?utm_source=x&id=7#frag` and
    * `https://site.com/a?id=7` key identically:
    *   - scheme and host lowercased; leading `www.` stripped
    *   - default ports stripped (`:80` for http, `:443` for https)
    *   - fragment dropped
    *   - tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`,
    *     `mc_cid`, `mc_eid`); remaining params keep their order
    *   - trailing `/` stripped from the path (`/a/` → `/a`, root `/`
    *     → empty)
    * Non-URL input (no `scheme://`) passes through unchanged. Pure
    * codegen'd regex/array composition, RE2-compatible patterns —
    * linear scan, no shuffle, and a SQL engine replays it exactly. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host0 = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(regexp_replace(path0, "/+$", "") === "", lit(""))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query0 = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(query0, "&"),
      p => !(p.rlike("^(utm_[^=]*|fbclid|gclid|ref|mc_cid|mc_eid)(=|$)") || p === ""))
    val query = array_join(kept, "&")
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  // ---- corpus paragraph dedup (CCNet-style) ------------------------------
  /** Line-level exact dedup across the WHOLE corpus: every non-empty
    * trimmed line keeps only its first occurrence (ordered by doc id,
    * then line index — deterministic), and each document is rebuilt
    * from its surviving lines. This is the CCNet paragraph-dedup pass
    * that typically drops most boilerplate at web scale.
    *
    * Scale shape: one shuffle at LINE grain (window partitioned by the
    * line text — hot boilerplate lines are exactly the skewed keys AQE
    * splits), then one shuffle back to doc grain for reassembly. No
    * driver-side state; the line universe never materializes on one
    * node. */
  /** @param maxDocLines reassembly guard: a doc with more than this
    *   many KEPT lines is counted exactly but NOT re-materialized
    *   (dedup_text = "", truncated = true). This bounds the per-group
    *   collect_list buffer at maxDocLines lines, so one pathological
    *   document cannot blow an executor's agg buffer at 100 TB; the
    *   default (1M lines) is far above any sane document. */
  def paragraphDedup(df: DataFrame, id: String, text: String,
                     maxDocLines: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df
      .select(col(id), posexplode(
        filter(transform(split(col(text), "\n"), l => trim(l)),
          l => length(l) > 0)).as(Seq("idx", "line")))
    val perDoc = lines.groupBy(col(id)).agg(count(lit(1)).as("n_lines"))
    val keeper = Window.partitionBy(col("line")).orderBy(col(id), col("idx"))
    // kept-line count rides a window over the SAME id partitioning the
    // groupBy below reuses (one Exchange), so the guard costs no
    // additional shuffle; collect_list skips the nulled-out rows of
    // over-cap docs, keeping their agg buffer empty.
    val kept = lines
      .withColumn("__rk", row_number().over(keeper))
      .filter(col("__rk") === 1)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(id))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n",
          transform(array_sort(collect_list(
              when(col("__n") <= maxDocLines, struct(col("idx"), col("line"))))),
            s => s.getField("line"))).as("dedup_text"))
    df.select(col(id))
      .join(perDoc, Seq(id), "left")
      .join(kept, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"),
        coalesce(col("n_kept") > maxDocLines, lit(false)).as("truncated"))
  }

  // ---- duplicated n-gram spans (exact-substring dedup signal) ------------
  /** Maximal corpus-duplicated character spans per document — the
    * character-grain exact-duplication signal behind suffix-array
    * training-data dedup (reference datar_polars has no equivalent;
    * the metric is the MassiveText / RefinedWeb "fraction of
    * characters in duplicate n-grams" filter, computed here over
    * SPANS, i.e. the interval union of every duplicated k-gram).
    *
    * Definition: normalize like [[Dedup.charNgrams]] (lowercase,
    * whitespace collapse), take every character k-gram at every
    * position; a position is DUPLICATED when its k-gram occurs >=
    * minCount times corpus-wide (total multiplicity — within-doc
    * repeats count, exactly like a suffix array's duplicate spans).
    * Each covered position contributes the char interval
    * [pos, pos+k-1]; per doc, overlapping/adjacent intervals merge to
    * maximal spans (classic gaps-and-islands sweep).
    *
    * Returns one row per span: (doc_id, span_start, span_end,
    * span_len) — 1-based inclusive char offsets into the NORMALIZED
    * text. Aggregate with [[dupSpanStats]] for the per-doc filter
    * signal.
    *
    * Scale shape: positional grams are a map-side posexplode (k-gram
    * hashes via one md5 projection — 16-hex-prefix, engine-portable);
    * the multiplicity count is ONE partial-aggregatable groupBy on the
    * gram hash; coverage is a semi-join of positions against the
    * duplicated-gram keys (AQE splits hot boilerplate grams — no
    * window over the gram key, which skew could pin to one task); the
    * island sweep runs under windows partitioned BY DOC, bounded by
    * document length. Corpus cost is one row per character — the same
    * bound a distributed suffix array pays; for 100 TB use a stride
    * (emit every s-th position) to trade recall resolution for an s×
    * smaller shuffle: a duplicated span of length >= k + s - 1 still
    * contains an emitted duplicated gram on both strides.
    */
  def dupSpans(df: DataFrame, id: String, text: String, k: Int = 20,
               minCount: Int = 2, stride: Int = 1): DataFrame = {
    require(k >= 2, s"dupSpans: k=$k must be >= 2")
    require(minCount >= 2, s"dupSpans: minCount=$minCount must be >= 2")
    require(stride >= 1, s"dupSpans: stride=$stride must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val norm = regexp_replace(lower(col(text)), "\\s+", " ")
    // native kernel (one normalize + one digest per gram, codegen'd);
    // bit-identical to transform(Dedup.charNgrams(text, k),
    // g => substring(md5(g), 1, 16)) — spec-asserted
    val hashes = Dedup.charNgramMd5Fast(col(text), k)
    // one row per (strided) gram position; 1-based to match substr
    val positional = df
      .select(col(id).as("doc_id"), length(norm).as("n_chars"),
        posexplode(hashes).as(Seq("__p0", "__h")))
      .filter(col("n_chars") > 0 && pmod(col("__p0"), lit(stride)) === 0)
      .select(col("doc_id"), col("n_chars"),
        (col("__p0") + 1).as("pos"), col("__h"))
    val dupGrams = positional.groupBy("__h")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .select("__h")
    val covered = positional.join(dupGrams, Seq("__h"), "left_semi")
      // a shorter-than-k doc has ONE whole-doc gram: cap its interval
      .withColumn("__end", least(col("pos") + (k - 1), col("n_chars")))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val islands = covered
      .withColumn("__prev_end",
        max(col("__end")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__prev_end").isNull || col("pos") > col("__prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(byPos))
    islands.groupBy(col("doc_id"), col("__sid"))
      .agg(min(col("pos")).as("span_start"), max(col("__end")).as("span_end"))
      .select(col("doc_id"), col("span_start").cast("int"),
        col("span_end").cast("int"),
        (col("span_end") - col("span_start") + 1).cast("int").as("span_len"))
  }

  /** Per-doc rollup of [[dupSpans]]: span count, duplicated-char
    * count, longest span, and `dup_frac` (the MassiveText-style
    * duplicated-character fraction — the usual filter threshold).
    * Docs with no duplicated span get explicit zeros. */
  def dupSpanStats(df: DataFrame, id: String, text: String, k: Int = 20,
                   minCount: Int = 2, stride: Int = 1): DataFrame = {
    val norm = regexp_replace(lower(col(text)), "\\s+", " ")
    val stats = dupSpans(df, id, text, k, minCount, stride)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_dup_spans"),
        sum(col("span_len")).cast("int").as("dup_chars"),
        max(col("span_len")).cast("int").as("longest_dup_span"))
    df.select(col(id).as("doc_id"), length(norm).cast("int").as("n_chars"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("n_dup_spans"), lit(0)).as("n_dup_spans"),
        coalesce(col("dup_chars"), lit(0)).as("dup_chars"),
        coalesce(col("longest_dup_span"), lit(0)).as("longest_dup_span"),
        when(col("n_chars") > 0,
          coalesce(col("dup_chars"), lit(0)).cast("double") / col("n_chars"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Remediate [[dupSpans]] — the RefinedWeb/CCNet "remove duplicated
    * spans" step: rebuild each document's normalized text with the
    * corpus-duplicated spans CUT OUT, instead of dropping the whole
    * document for a boilerplate header. Spans are disjoint and ≥ k
    * chars, so a doc carries ≤ n/k of them — the per-doc span list is
    * a bounded collect_list and the rebuild is one aggregate-HOF fold
    * over the sorted spans (keep the gap before each span, then the
    * tail) — a projection after the dupSpans topology. Docs with no
    * duplicated span pass through unchanged.
    * Output: (id, n_chars, clean_text, clean_chars, removed_chars). */
  def stripDupSpans(df: DataFrame, id: String, text: String, k: Int = 20,
                    minCount: Int = 2, stride: Int = 1): DataFrame = {
    val norm = regexp_replace(lower(col(text)), "\\s+", " ")
    val spans = dupSpans(df, id, text, k, minCount, stride)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(
        col("span_start").as("s"), col("span_end").as("e")))).as("__spans"))
    df.select(col(id).as("doc_id"), norm.as("__ns"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("__spans", coalesce(col("__spans"),
        array().cast("array<struct<s:int,e:int>>")))
      .withColumn("__res", aggregate(col("__spans"),
        struct(lit(0).as("last"), lit("").as("acc")),
        (st, sp) => struct(
          sp.getField("e").as("last"),
          concat(st.getField("acc"),
            col("__ns").substr(st.getField("last") + 1,
              sp.getField("s") - st.getField("last") - 1)).as("acc"))))
      .withColumn("clean_text", concat(col("__res").getField("acc"),
        col("__ns").substr(col("__res").getField("last") + 1,
          length(col("__ns")) - col("__res").getField("last"))))
      .select(col("doc_id").as(id),
        length(col("__ns")).cast("long").as("n_chars"),
        col("clean_text"),
        length(col("clean_text")).cast("long").as("clean_chars"),
        (length(col("__ns")) - length(col("clean_text"))).cast("long")
          .as("removed_chars"))
  }

  // ---- domain token-distribution divergence ------------------------------
  /** Pairwise Jensen–Shannon divergence between per-domain token
    * distributions — the "how different are these sources, really"
    * read behind mixture design (near-identical domains waste mixture
    * slots; an outlier domain needs its own weight) and drift review
    * (this corpus snapshot vs the last). JS (Lin 1991) is the
    * symmetric, always-finite KL variant:
    * JS(P,Q) = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q)), bounded by
    * ln 2.
    *
    * Distributions are restricted to the corpus-wide exact top-V
    * vocabulary with everything else pooled into one OOV bucket
    * (unbounded vocabularies would make the pairwise stage corpus-
    * sized; the V-bucket restriction is the standard practical JS and
    * keeps everything after the first scan domain×V-sized). Add-one
    * smoothing over the observed support keeps every bucket positive,
    * so no zero-handling cases exist for engines to disagree on.
    *
    * Engine-exact by the repo's recipes: bucket counts are integers,
    * probabilities single IEEE divisions of identical integers, the
    * per-bucket terms use ln under the trig-family cross-engine
    * contract, the sum is decimal(38,18)-accumulated
    * (order-invariant), and the result rounds to 6 decimals.
    *
    * Shape: ONE tokenize scan (explode + partial-agg groupBy) is the
    * only pass over the corpus; the vocabulary cut is TakeOrdered(V);
    * everything downstream — per-domain counts re-agg, the
    * domains×support grid, the pairwise join — is (domains × V)-sized
    * however big the corpus. Domains are assumed dimension-like
    * (sources, languages: ≤ ~10⁴); the pair table is domains², which
    * is the semantics, not a plan accident.
    * Output: (domain_a, domain_b, n_terms, js_div) for domain_a <
    * domain_b. */
  def domainJsDivergence(df: DataFrame, domain: Column, text: Column,
                         vocabSize: Int): DataFrame = {
    require(vocabSize >= 1,
      s"domainJsDivergence: vocabSize=$vocabSize must be >= 1")
    val Oov = "__OOV__" // tokens are lowercased — uppercase cannot collide
    // TWO corpus tokenizes, down from SIXTEEN (r17, guide §1.2/§2.4):
    // the exploded scan collapses to per-(domain, token) counts
    // immediately — the global vocab cut re-aggregates THOSE counts
    // and the OOV bucketing sums them — and the (domains × vocab)
    // `counts` summary is materialized per the dedupClusters
    // checkpoint convention, so the four downstream consumers and the
    // pair join's two sides read the tiny checkpoint instead of each
    // re-running the corpus subtree. tokCounts itself stays LAZY: its
    // two consumers (vocab + counts) evaluate concurrently inside the
    // one checkpoint job, where an eager tokCounts materialization
    // would serialize a second fact-sized write for no scan saved
    // (the bm25-diamond measurement, OPTIMIZATION_r17.md §1).
    val tokCounts = df.select(domain.cast("string").as("domain"),
        explode(Dedup.tokens(text)).as("__tok"))
      .groupBy("domain", "__tok").agg(count(lit(1)).as("__c0"))
    val vocab = tokCounts.groupBy("__tok").agg(sum(col("__c0")).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__tok")).limit(vocabSize)
      .select(col("__tok"), lit(1).as("__in"))
    val counts = Materialize.cp(tokCounts.join(broadcast(vocab), Seq("__tok"), "left")
      .select(col("domain"),
        when(col("__in").isNotNull, col("__tok")).otherwise(lit(Oov)).as("term"),
        col("__c0"))
      .groupBy("domain", "term").agg(sum(col("__c0")).as("__c")))
    val totals = counts.groupBy("domain").agg(sum(col("__c")).as("__n"))
    val support = counts.select("term").distinct()
    val supportSize = support.agg(count(lit(1)).as("__v"))
    val dist = totals.crossJoin(support)
      .join(counts, Seq("domain", "term"), "left")
      .crossJoin(broadcast(supportSize))
      .select(col("domain"), col("term"), col("__v"),
        ((coalesce(col("__c"), lit(0L)) + lit(1)).cast("double")
          / (col("__n") + col("__v")).cast("double")).as("__p"))
    val a = dist.select(col("domain").as("domain_a"), col("term"),
      col("__v"), col("__p").as("__pa"))
    val b = dist.select(col("domain").as("domain_b"), col("term").as("__tb"),
      col("__p").as("__pb"))
    val term = (col("__pa") * log(lit(2.0) * col("__pa") / (col("__pa") + col("__pb")))
      + col("__pb") * log(lit(2.0) * col("__pb") / (col("__pa") + col("__pb"))))
    a.join(b, col("term") === col("__tb") && col("domain_a") < col("domain_b"))
      .groupBy("domain_a", "domain_b")
      .agg(max(col("__v")).as("n_terms"),
        round((sum(term.cast("decimal(38,18)")).cast("double") / lit(2.0)), 6)
          .as("js_div"))
  }

  // ---- Zipf's-law fit ------------------------------------------------------
  /** Least-squares fit of ln(freq) ~ ln(rank) over the corpus's top-N
    * terms — the Zipf slope is a one-number health read on a text
    * corpus: clean natural language sits near −1; templated/boiler-
    * plate corpora flatten (slope → 0 over the head) and OCR noise /
    * ID-heavy corpora steepen. Cheap enough to run per snapshot and
    * diff (pair with [[corpusDiff]] style monitoring).
    *
    * Topology: one tokenize+explode scan → partial-agg term counts
    * (ONE shuffle) → TakeOrdered top-N (driver-tiny for N ≤ 10⁴ at
    * any corpus scale) → rank via the sorted-rowid recipe (no
    * unpartitioned window) → closed-form OLS from decimal-exact sums
    * in a single 1-row aggregate.
    *
    * Engine-exact: ln() runs per row on identical doubles (IEEE
    * scalar); the five OLS sums accumulate as DECIMAL(38,18) (order-
    * independent), bridge to double through a string cast (the
    * [[graft.functions.Exact]] recipe), and the closed-form slope/
    * intercept/R² arithmetic is then identical double ops on
    * identical inputs. Results round to 6 digits.
    * Output: ONE row (n_terms, slope, intercept, r2). */
  def zipfFit(df: DataFrame, text: String, topN: Int = 200): DataFrame = {
    require(topN >= 2, s"zipfFit: topN=$topN must be >= 2 (OLS needs 2 points)")
    val tf = df.select(explode(Dedup.tokens(col(text))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val top = tf.orderBy(col("freq").desc, col("term")).limit(topN)
    val ranked = graft.core.Tibble.rowidToColumn(
      top, Seq(col("freq").desc, col("term")), "rank")
    // (18,12): |ln| < 1e6 with 12 exact fractional digits; the product
    // is decimal(37,24) — inside Spark's 38 cap, so NO precision-loss
    // rescale. The oracle mirrors with DECIMAL(19,12) (DuckDB needs
    // width >= 19 to run the multiply in int128 — the Exact.dprodSum
    // width asymmetry).
    val dec = (c: Column) => c.cast("decimal(18,12)")
    val s = ranked
      .select(log(col("rank").cast("double")).as("__x"),
        log(col("freq").cast("double")).as("__y"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(dec(col("__x"))).cast("string").cast("double").as("__sx"),
        sum(dec(col("__y"))).cast("string").cast("double").as("__sy"),
        sum(dec(col("__x")) * dec(col("__y"))).cast("string").cast("double").as("__sxy"),
        sum(dec(col("__x")) * dec(col("__x"))).cast("string").cast("double").as("__sxx"),
        sum(dec(col("__y")) * dec(col("__y"))).cast("string").cast("double").as("__syy"))
    val n = col("__n"); val sx = col("__sx"); val sy = col("__sy")
    val sxy = col("__sxy"); val sxx = col("__sxx"); val syy = col("__syy")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    s.select(col("__n").cast("long").as("n_terms"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / n, 6).as("intercept"),
      round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("r2"))
  }

  /** Heaps'-law vocabulary-growth fit: V(N) ≈ K·N^β — how fast the
    * corpus keeps yielding NEW terms as tokens stream past. The
    * operational read for a pretraining corpus: β far below the
    * ~0.4–0.6 natural-text band means the tail is exhausted
    * (duplicated/templated text keeps re-serving old terms); a β near
    * 1 means token soup (OCR noise, random ids). The Zipf slope
    * ([[zipfFit]]) checks the head of the term distribution; this
    * checks the tail-growth rate — together they fingerprint corpus
    * health in two numbers.
    *
    * Token order is deterministic: docs by id ascending, tokens by
    * position within the doc — so the curve replays bit-for-bit on
    * any engine. Scale shape: one tokenize scan; the global token
    * positions come from [[graft.functions.ScanFns.withCumsum]]'s
    * distributed prefix scan over per-doc counts (one range-
    * partitioned sort, NO global window on the token stream — the
    * oracle's row_number() replay is DuckDB-side only); per-term
    * first-occurrence is one partial agg; the `checkpoints` vocab
    * counts are conditional sums in ONE pass over the vocab-sized
    * firsts table (checkpoint k sits at ceil(T·k/checkpoints) tokens);
    * the OLS moments reuse [[zipfFit]]'s order-invariant
    * decimal(18,12) convention. Output: one row per checkpoint
    * (ckpt, n_tokens, vocab) with the shared fit (beta, ln_k, r2)
    * attached. */
  def heapsLaw(df: DataFrame, id: String, text: String,
               checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 2 && checkpoints <= 64,
      s"heapsLaw: checkpoints=$checkpoints must be in 2..64")
    val toks = df.select(col(id).as("__id"),
      array_remove(Dedup.tokens(col(text)), "").as("__tk"))
    val cum = graft.functions.ScanFns.withCumsum(
      toks.withColumn("__n", size(col("__tk")).cast("double")),
      col("__n"), Seq(col("__id")), "__cum")
    // 1-based global token position: tokens of prior docs + pos + 1
    val ex = cum.select(col("__cum"), col("__n"), posexplode(col("__tk")))
      .select(((col("__cum") - col("__n")).cast("long") + col("pos") + 1L)
        .as("__gpos"), col("col").as("__term"))
    // total tokens from the PLAIN token scan (Σ size == the exploded
    // row count, exactly) — counting `ex` re-ran the whole
    // rowid-cumsum sort just to count its rows (r17, guide §1.2)
    val total = toks.agg(
      coalesce(sum(greatest(size(col("__tk")), lit(0)).cast("long")),
        lit(0L)).as("__t"))
    val firsts = ex.groupBy(col("__term")).agg(min(col("__gpos")).as("__fp"))
      .crossJoin(broadcast(total))
    val ckptAt = (k: Int) => call_function("div",
      col("__t") * k + (checkpoints - 1), lit(checkpoints.toLong))
    val aggs = (1 to checkpoints).map(k =>
      sum(when(col("__fp") <= ckptAt(k), 1L).otherwise(0L)).as(s"__v$k")) :+
      max(col("__t")).as("__t")
    // ONE row, but its subtree is the whole first-position aggregation
    // over the prefix-scanned corpus — and the curve feeds both the
    // OLS aggregate and the closing crossJoin. Materialize (the
    // dedupClusters checkpoint convention) so that subtree runs once.
    val wide = Materialize.cp(firsts.agg(aggs.head, aggs.tail: _*))
    val stackArgs = (1 to checkpoints)
      .map(k => s"CAST($k AS BIGINT), __v$k").mkString(", ")
    val pts = wide.selectExpr(
      s"stack($checkpoints, $stackArgs) AS (ckpt, vocab)", "__t")
    val curve = pts.select(col("ckpt"),
      call_function("div", col("__t") * col("ckpt") + (checkpoints - 1),
        lit(checkpoints.toLong)).as("n_tokens"),
      col("vocab"))
    // OLS on (ln N, ln V) over the checkpoint table — zipfFit's
    // order-invariant decimal moment convention
    val dec = (c: Column) => c.cast("decimal(18,12)")
    val s = curve
      .select(log(col("n_tokens").cast("double")).as("__x"),
        log(col("vocab").cast("double")).as("__y"))
      .agg(count(lit(1)).cast("double").as("__fn"),
        sum(dec(col("__x"))).cast("string").cast("double").as("__sx"),
        sum(dec(col("__y"))).cast("string").cast("double").as("__sy"),
        sum(dec(col("__x")) * dec(col("__y"))).cast("string").cast("double").as("__sxy"),
        sum(dec(col("__x")) * dec(col("__x"))).cast("string").cast("double").as("__sxx"),
        sum(dec(col("__y")) * dec(col("__y"))).cast("string").cast("double").as("__syy"))
    val n = col("__fn"); val sx = col("__sx"); val sy = col("__sy")
    val sxy = col("__sxy"); val sxx = col("__sxx"); val syy = col("__syy")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val fit = s.select(round(slope, 6).as("beta"),
      round((sy - slope * sx) / n, 6).as("ln_k"),
      round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("r2"))
    curve.crossJoin(broadcast(fit))
  }

  // ---- subword tokenization -----------------------------------------------
  /** Demo subword vocabulary for [[subwordTokenize]]: frequent English
    * subwords + a single-letter fallback that deliberately EXCLUDES
    * j/q/x/z and digits, so rare characters really exercise the
    * `<unk>` path (a production vocab would come from a trained
    * tokenizer file — the kernel is vocabulary-agnostic). Order
    * doesn't matter (matching is by longest length). */
  val demoSubwords: Seq[String] = Seq(
    "ation", "tion", "ment", "ing", "ent", "ion", "ous", "ate", "ies",
    "the", "and", "ere", "her", "ter", "est", "ers", "con", "com",
    "pro", "per", "res", "ble",
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti",
    "es", "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to",
    "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co", "me",
    "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch",
    "ll", "be", "ma", "si", "om", "ur",
    "a", "e", "i", "o", "u", "n", "r", "s", "t", "l", "d", "c", "m",
    "h", "g", "p", "b", "f", "w", "y", "v", "k")

  /** Apply a subword (WordPiece/BPE-style) vocabulary by greedy
    * longest match — the real tokenizer-application step of a
    * pretraining pipeline, not the whitespace/regex approximations in
    * [[tokenCounts]]. Runs as ONE native codegen kernel call per row
    * ([[graft.plans.WordPieceCountExpr]]): the vocabulary compiles
    * once on the driver (hash set + max length) and rides to
    * executors as a codegen reference object — no join, no shuffle,
    * no per-row vocab scan. Token-budget math (n_subwords), tokenizer
    * fit (fertility = subwords/word — vocab-coverage quality per
    * doc), and byte-fallback pressure (n_unk) drop out of one scan.
    *
    * At 100 TB the alternative topology — tokenize DISTINCT words
    * once and broadcast-join back (Zipf makes distinct ≪ total) —
    * trades this scan's CPU for a shuffle; the kernel keeps the scan
    * shape so tokenization composes with any downstream filter
    * without a barrier.
    * Output: (id, n_words, n_subwords, n_unk, fertility). */
  def subwordTokenize(df: DataFrame, id: String, text: String,
                      vocab: Seq[String] = demoSubwords): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(vocab.nonEmpty && vocab.forall(_.nonEmpty),
      "subwordTokenize: vocabulary entries must be non-empty")
    val wp = ColumnBridge.column(
      graft.plans.WordPieceCountExpr(ColumnBridge.expr(col(text)), vocab))
    df.select(col(id), wp.as("__wp"))
      .select(col(id),
        col("__wp.n_words").cast("long").as("n_words"),
        col("__wp.n_subwords").cast("long").as("n_subwords"),
        col("__wp.n_unk").cast("long").as("n_unk"),
        when(col("__wp.n_words") > 0,
          round(col("__wp.n_subwords").cast("double")
            / col("__wp.n_words").cast("double"), 6)).as("fertility"))
  }

  // ---- cross-document novelty ---------------------------------------------
  /** Per-document novelty against the REST of the corpus: the
    * fraction of a document's distinct w-token shingles that appear
    * in no other document (1 − shared/total). The corpus-level dual
    * of [[repetition]] (which is within-doc): low novelty across a
    * source flags mirrored/templated content that per-pair dedup
    * (minhash) only catches above its jaccard threshold — this is the
    * soft tail BELOW the dedup threshold, the "diversity" read a
    * data-mixing decision needs.
    *
    * Topology — the key identity: a shingle with df==1 KNOWS its only
    * document (min(id) inside the same partial agg), so
    * n_shared(doc) = n_shingles(doc) − |{shingles whose only doc is
    * this doc}| and the pair table never has to meet the df table.
    * One tokenize+shingle+explode pass → ONE full-scale shuffle:
    * groupBy(shingle) agg(count, min(id)) whose map-side combine
    * absorbs hot boilerplate shingles (a 10⁹-doc shingle arrives at
    * its reducer as ≤#partitions partial rows, never as raw pairs —
    * the r14 join form shuffled the raw pairs three times and had the
    * hot shingle land whole on one task) → the df==1 sliver re-aggs
    * to doc grain (shingle-grain input, doc-grain output, both tiny
    * vs the corpus) → doc-grain join against n_shingles, which is a
    * pure PROJECTION (size of the distinct-shingle array — no explode,
    * no shuffle). The tokenize runs twice (once per branch) — map CPU,
    * cheaper at any scale than a second pair-table shuffle.
    * Output: (id, n_shingles, n_shared, novelty ∈ [0,1]). */
  def crossDocNovelty(df: DataFrame, id: String, text: String,
                      w: Int = 3): DataFrame = {
    require(w >= 1, s"crossDocNovelty: w=$w must be >= 1")
    val shs = array_distinct(Dedup.shingles(Dedup.tokens(col(text)), w))
    val totals = df.select(col(id), size(shs).cast("long").as("n_shingles"))
    val uniq = df.select(col(id), explode(shs).as("__sh"))
      .groupBy("__sh")
      .agg(count(lit(1)).as("__df"), min(col(id)).as("__only"))
      .filter(col("__df") === 1L)
      .groupBy(col("__only").as(id))
      .agg(count(lit(1)).as("__n_unique"))
    totals.join(uniq, Seq(id), "left")
      .select(col(id), col("n_shingles"),
        (col("n_shingles") - coalesce(col("__n_unique"), lit(0L))).as("n_shared"))
      .withColumn("novelty",
        round(lit(1.0) - col("n_shared").cast("double")
          / col("n_shingles").cast("double"), 6))
  }

  /** Good–Turing unseen mass + Chao1 richness — the corpus-planning
    * read behind "how much NEW vocabulary does the next crawl still
    * hold": P₀ = n₁/N (Good 1953 — the probability the next token is
    * an unseen type, read straight off the singleton count) and the
    * bias-corrected Chao1 lower bound on true vocabulary size
    * V̂ = V + n₁(n₁−1)/(2(n₂+1)) (Chao 1984) — [[heapsLaw]]'s
    * model-free complement (no fit, just the frequency-of-frequency
    * identities). ONE term-frequency partial agg then ONE 4-sum scan
    * of the (bounded) term table; all counts exact longs, the two
    * closing estimates fixed shapes of long→double casts and single
    * IEEE ops. Output (1 row): n_terms, n_tokens, n1, n2, p_unseen,
    * chao1. */
  def goodTuring(df: DataFrame, text: String): DataFrame = {
    val freq = df.select(explode(graft.ops.Dedup.tokens(col(text))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy("__t").agg(count(lit(1)).as("__c"))
    freq.agg(
      count(lit(1)).as("n_terms"),
      sum(col("__c")).as("__nt"),
      sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__c") === 2L, 1L).otherwise(0L)).as("n2"))
      .select(col("n_terms"),
        coalesce(col("__nt"), lit(0L)).cast("long").as("n_tokens"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
      .select(col("n_terms"), col("n_tokens"), col("n1"), col("n2"),
        when(col("n_tokens") === 0L, lit(null).cast("double"))
          .otherwise(col("n1").cast("double") / col("n_tokens").cast("double"))
          .as("p_unseen"),
        when(col("n_terms") === 0L, lit(null).cast("double"))
          .otherwise(col("n_terms").cast("double")
            + col("n1").cast("double") * (col("n1").cast("double") - 1.0)
              / ((col("n2").cast("double") + 1.0) * 2.0)).as("chao1"))
  }
}
