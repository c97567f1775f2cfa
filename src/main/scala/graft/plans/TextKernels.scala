package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM kernels for the text-signature hot paths.
  *
  * The Column-composition versions (ops/Dedup.scala) are correct and
  * linear, but Spark evaluates higher-order functions (transform /
  * aggregate / zip_with) INTERPRETED — they never enter whole-stage
  * codegen, so every shingle pays expression-tree walking overhead.
  * These kernels do the same work in one tight loop; the Expressions
  * below splice a static call into generated code (doGenCode), keeping
  * the 100 TB scan path fully codegen'd.
  *
  * Hashing uses Spark's own XXH64 (seed 42, the xxhash64 SQL default),
  * so signatures are stable across JVMs/executors.
  */
object TextKernels {
  final val Seed = 42L

  /** Lowercase alphanumeric word tokens, hashed — one pass, no regex.
    * Locale.ROOT lowercase (a Turkish-default JVM would otherwise fold
    * 'I' to dotless i, breaking cross-executor signature stability) and
    * code-point iteration for parity with \p{L}\p{N}. */
  def tokenHashes(text: UTF8String): Array[Long] = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[Long](32)
    var i = 0
    val n = s.length
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) { out += hashStr(sb.toString); sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += hashStr(sb.toString)
    if (out.isEmpty) out += hashStr("") // tokens("") convention: one empty token
    out.toArray
  }

  def hashStr(s: String): Long = {
    val b = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes, Seed)
  }

  @inline def hash2(a: Long, b: Long): Long =
    XXH64.hashLong(b, XXH64.hashLong(a, Seed))

  /** Distinct w-token rolling shingle hashes (<= size-w+1 windows,
    * min 1 partial window for short docs). */
  def shingleHashes(text: UTF8String, w: Int): Array[Long] = {
    val hs = tokenHashes(text)
    val nOut = math.max(hs.length - w + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](nOut * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](nOut)
    var i = 0
    while (i < nOut) {
      var h = hs(i)
      var k = 1
      while (k < w && i + k < hs.length) { h = hash2(h, hs(i + k)); k += 1 }
      if (seen.add(h)) out += h
      i += 1
    }
    out.toArray
  }

  /** Lowercase alphanumeric word tokens as strings — the string twin
    * of tokenHashes (same tokenizer, same [""] convention). */
  def tokenStrings(text: UTF8String): Array[String] = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[String](32)
    var i = 0
    val n = s.length
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += sb.toString
    if (out.isEmpty) out += ""
    out.toArray
  }

  /** w-token shingle STRINGS (space-joined; size-w+1 full windows, min
    * 1 partial window for short docs) — identical output to
    * `Dedup.shingles(Dedup.tokens(text), w)` but one codegen'd pass
    * instead of w interpreted zip_with levels that each re-tokenize. */
  def shingleStrings(text: UTF8String, w: Int): ArrayData = {
    val toks = tokenStrings(text)
    val nOut = math.max(toks.length - w + 1, 1)
    val out = new Array[Any](nOut)
    var i = 0
    while (i < nOut) {
      val sb = new java.lang.StringBuilder(16 * w)
      var k = 0
      while (k < w && i + k < toks.length) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: sig(j) = min over shingles of hash2(h, j). */
  def minhashSignature(text: UTF8String, w: Int, numPerm: Int): ArrayData = {
    val sh = shingleHashes(text, w)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = sh(i)
      var j = 0
      while (j < numPerm) {
        val v = hash2(h, j.toLong)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Engine-portable md5 minhash band buckets — the one-pass kernel
    * twin of `Dedup.portableMinhashBands` (bit-identical,
    * spec-asserted): hash j of shingle s = first 12 hex digits (= 6
    * bytes) of md5(s":"j) as a 48-bit long; sig_j = min over distinct
    * w-shingles; bucket b = comma-joined rows b·R..(b+1)·R-1. The
    * Column form pays numPerm interpreted md5/conv trees per shingle;
    * this is one tight loop per row, so the STREAMING near-dup's
    * signature cost stays inside whole-stage codegen at ingest rates.
    * Output rows are (band:int, bucket:string) structs. */
  def portableMinhashBands(text: UTF8String, w: Int, numBands: Int,
                           rowsPerBand: Int): ArrayData = {
    val numPerm = numBands * rowsPerBand
    val toks = tokenStrings(text)
    val nOut = math.max(toks.length - w + 1, 1)
    val seen = new java.util.HashSet[String](nOut * 2)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nOut) {
      val sb = new java.lang.StringBuilder(16 * w)
      var k = 0
      while (k < w && i + k < toks.length) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        var j = 0
        while (j < numPerm) {
          md.reset()
          val d = md.digest((s + ":" + j).getBytes("UTF-8"))
          // first 12 hex digits = first 6 digest bytes, big-endian
          val h = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
            ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
            ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder(16 * rowsPerBand)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sig(b * rowsPerBand + r))
        r += 1
      }
      out(b) = org.apache.spark.sql.catalyst.InternalRow(
        b, UTF8String.fromString(sb.toString))
      b += 1
    }
    new GenericArrayData(out)
  }

  private val HexDigits = "0123456789abcdef".getBytes("US-ASCII")

  /** md5-prefix hashes of normalized character n-grams — the one-pass
    * kernel twin of
    * `transform(Dedup.charNgrams(text, n), g => substring(md5(g), 1, 16))`
    * (bit-identical, spec-asserted). Normalization matches the Column
    * form exactly: UTF8String lowercase, then Java-regex `\s+` → one
    * space (no trim); grams are CODE-POINT windows (Java regex
    * split("") keeps supplementary pairs whole, so the Column form's
    * per-"char" pieces are code points). The Column form pays n-1
    * interpreted zip_with levels, each re-evaluating the normalize+
    * split subtree — at n=20 that is a ~20× re-scan per row; this is
    * one normalize, one digest per gram, inside whole-stage codegen. */
  def charNgramMd5(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString.replaceAll("\\s+", " ")
    val len = s.length
    // code-point start offsets (code-unit indices)
    val starts = new Array[Int](len + 1)
    var cnt = 0
    var i = 0
    while (i < len) {
      starts(cnt) = i
      cnt += 1
      i += Character.charCount(s.codePointAt(i))
    }
    starts(cnt) = len
    val md = java.security.MessageDigest.getInstance("MD5")
    def h16(g: String): UTF8String = {
      md.reset()
      val d = md.digest(g.getBytes("UTF-8"))
      val hex = new Array[Byte](16)
      var j = 0
      while (j < 8) {
        hex(2 * j) = HexDigits((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = HexDigits(d(j) & 0xf)
        j += 1
      }
      UTF8String.fromBytes(hex)
    }
    if (cnt < n) new GenericArrayData(Array[Any](h16(s)))
    else {
      val out = new Array[Any](cnt - n + 1)
      var j = 0
      while (j < cnt - n + 1) {
        out(j) = h16(s.substring(starts(j), starts(j + n)))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Content-defined chunk rows (start 1-based in code points,
    * chunk_len in code points, full chunk md5 hex) — the one-pass
    * kernel form of Dedup.cdcChunks' HOF chain. Works directly over
    * the UTF-8 byte array with code-point byte offsets (parity with
    * Spark's code-point substr), ONE reusable MessageDigest, and the
    * boundary test compares the digest's first byte numerically —
    * `(d(0) & 0xff) <= threshold` is exactly `substring(hex, 1, 2) <=
    * "%02x".format(threshold)` with zero hex-string allocation per
    * window. */
  def cdcChunks(text: UTF8String, w: Int, threshold: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // byte offset of each code point (boff(k) = start of cp k, 0-based)
    val boff = new Array[Int](text.numChars() + 1)
    var cp = 0
    var off = 0
    while (off < nBytes) {
      boff(cp) = off
      cp += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    boff(cp) = nBytes
    val n = cp // code points
    val md = java.security.MessageDigest.getInstance("MD5")
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](16)
    bounds += 1
    var p = 2 // candidate start positions, 1-based code points
    while (p <= n - w + 1) {
      md.reset()
      md.update(bytes, boff(p - 1), boff(p - 1 + w) - boff(p - 1))
      if ((md.digest()(0) & 0xff) <= threshold) bounds += p
      p += 1
    }
    val out = new Array[Any](bounds.length)
    var j = 0
    while (j < bounds.length) {
      val st = bounds(j)
      val en = if (j + 1 < bounds.length) bounds(j + 1) else n + 1
      md.reset()
      md.update(bytes, boff(st - 1), boff(en - 1) - boff(st - 1))
      val d = md.digest()
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = HexDigits((d(k) >> 4) & 0xf)
        hex(2 * k + 1) = HexDigits(d(k) & 0xf)
        k += 1
      }
      out(j) = InternalRow(st, (en - st).toLong, UTF8String.fromBytes(hex))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over distinct token hashes. */
  def simhash(text: UTF8String): Long = {
    val hs = tokenHashes(text)
    val seen = new java.util.HashSet[java.lang.Long](hs.length * 2)
    val votes = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      if (seen.add(h)) {
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Greedy longest-match subword counts (see [[WordPieceCountExpr]]):
    * for each normalized word, repeatedly emit the longest vocab entry
    * matching at the cursor, else one `<unk>` char. Returns
    * (n_words, n_subwords, n_unk) as an InternalRow. */
  def wordPieceCounts(text: UTF8String, vocab: WordPieceVocab): InternalRow = {
    val words = tokenStrings(text)
    var nw = 0; var ns = 0; var nu = 0
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        nw += 1
        var i = 0
        val n = w.length
        while (i < n) {
          var l = math.min(vocab.maxLen, n - i)
          var found = 0
          while (l >= 1 && found == 0) {
            if (vocab.set.contains(w.substring(i, i + l))) found = l
            l -= 1
          }
          ns += 1
          if (found > 0) i += found
          else { nu += 1; i += 1 }
        }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nw, ns, nu))
  }
}

object TextKernelsBridge {
  def shingleHashArray(text: UTF8String, w: Int): ArrayData =
    new GenericArrayData(TextKernels.shingleHashes(text, w))

  /** Stopword-profile language ID (same heuristic as
    * TextAnalysis.langId): CJK-char ratio decides zh; else the profile
    * with the most DISTINCT-token hits wins, ties lexicographic. */
  private val profiles: Array[(String, java.util.HashSet[String])] = {
    val m = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
      "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "en"),
      "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"),
      "it" -> Seq("il", "la", "gli", "e", "è", "un", "una", "di", "in", "per"))
    m.map { case (l, ws) =>
      val s = new java.util.HashSet[String](); ws.foreach(s.add); (l, s)
    }.toArray
  }

  def langId(text: UTF8String): UTF8String = {
    val s = text.toString
    var cjk = 0
    var i = 0
    while (i < s.length) {
      if (Character.UnicodeScript.of(s.codePointAt(i)) == Character.UnicodeScript.HAN) cjk += 1
      i += 1
    }
    if (s.nonEmpty && cjk > s.length * 0.3) return UTF8String.fromString("zh")
    // distinct lowercase tokens
    val toks = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder(16)
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    i = 0
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) { toks.add(sb.toString); sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) toks.add(sb.toString)
    // tie-break matches the Column form's descending struct sort:
    // equal scores pick the lexicographically LARGEST language code
    var best = ""; var bestScore = -1
    var p = 0
    while (p < profiles.length) {
      val (lang, ws) = profiles(p)
      var score = 0
      val it = ws.iterator()
      while (it.hasNext) if (toks.contains(it.next())) score += 1
      if (score > bestScore || (score == bestScore && lang > best)) {
        bestScore = score; best = lang
      }
      p += 1
    }
    UTF8String.fromString(best)
  }

  /** cp1252's 27 remapped points (0x80–0x9F) back to their bytes —
    * the inverse table a "sloppy cp1252" encode needs (chars ≤ 0xFF
    * encode as their latin-1 identity byte, covering the 5 holes
    * cp1252 leaves and plain latin-1 mis-decodes alike). */
  private val cp1252Inverse: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    Seq(0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
      0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
      0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
      0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
      0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
      0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
      0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F)
      .foreach { case (c, b) => m.put(c, b) }
    m
  }

  /** Repair double-encoded UTF-8 (the ftfy recipe's core move): map
    * each char back to the byte a latin-1/cp1252 MIS-decode would have
    * produced it from (identity for ≤ 0xFF, the cp1252 inverse for the
    * 27 remaps), strictly re-decode those bytes as UTF-8, and keep the
    * result only when the whole string round-trips — UTF-8's internal
    * structure makes an accidental valid decode of REAL latin text
    * essentially impossible ("café"'s é-byte alone is malformed UTF-8,
    * so genuine accents abort and the original survives). Up to 3
    * passes unwind double-double encodings. Strings carrying chars
    * outside latin-1 ∪ cp1252 (CJK, emoji, U+FFFD) abort to the
    * original — segment-wise repair of MIXED clean+broken strings is
    * the documented escalation, not this kernel. Null-safe via the
    * expression wrapper. */
  /** Mojibake-signature bigrams in `s` — the same rule as
    * TextAnalysis.mojibakeRe: a mis-decoded UTF-8 lead (Â/Ã/â)
    * followed by a mis-decoded continuation (latin-1 range or the
    * cp1252 remap set). The repair GATE: strings with zero signatures
    * are never touched, and a decode pass is accepted only when it
    * strictly REDUCES the count — without this, real text whose
    * latin-1 byte image happens to be valid UTF-8 ("ï—…" is
    * EF 97 85, a legal 3-byte sequence) would be "repaired" into
    * garbage (the ftfy badness heuristic). */
  private def artifactCount(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length - 1) {
      val c = s.charAt(i).toInt
      if (c == 0xC2 || c == 0xC3 || c == 0xE2) {
        val d = s.charAt(i + 1).toInt
        if ((d >= 0x80 && d <= 0xBF) ||
            cp1252Inverse.containsKey(Integer.valueOf(d))) n += 1
      }
      i += 1
    }
    n
  }

  def fixMojibake(text: UTF8String): UTF8String = {
    var s = text.toString
    var pass = 0
    var changed = true
    while (changed && pass < 3) {
      changed = false
      val before = artifactCount(s)
      if (before > 0) {
        val bytes = new Array[Byte](s.length)
        var ok = true
        var i = 0
        while (i < s.length && ok) {
          val c = s.charAt(i).toInt
          if (c <= 0xFF) bytes(i) = c.toByte
          else {
            val b = cp1252Inverse.get(c)
            if (b != null) bytes(i) = b.intValue.toByte else ok = false
          }
          i += 1
        }
        if (ok) {
          try {
            val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
              .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
              .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
            val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
            if (out != s && artifactCount(out) < before) {
              s = out; changed = true
            }
          } catch { case _: java.nio.charset.CharacterCodingException => () }
        }
      }
      pass += 1
    }
    UTF8String.fromString(s)
  }
}

/** shingle_hashes(text) — the distinct rolling w-shingle hash set. */
case class ShingleHashesExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextKernelsBridge.shingleHashArray(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernelsBridge.shingleHashArray($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** shingle_strings(text, w) — w-word shingle strings. */
case class ShingleStringsExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleStrings(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernels.shingleStrings($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): ShingleStringsExpr =
    copy(child = newChild)
}

/** minhash_signature(text) as a native expression — codegen'd via a
  * static kernel call (stays inside WholeStageCodegen). */
case class MinHashSignatureExpr(child: Expression, w: Int, numPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSignature(input.asInstanceOf[UTF8String], w, numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernels.minhashSignature($c, $w, $numPerm)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** portable_minhash_bands(text) — md5-derived band buckets (see
  * TextKernels.portableMinhashBands). */
case class PortableMinhashBandsExpr(child: Expression, w: Int,
                                    numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bucket", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "portable_minhash_bands"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.portableMinhashBands(input.asInstanceOf[UTF8String],
      w, numBands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernels.portableMinhashBands($c, $w, $numBands, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): PortableMinhashBandsExpr =
    copy(child = newChild)
}

/** char_ngram_md5(text) — md5-prefix hashes of normalized char
  * n-grams (see TextKernels.charNgramMd5). */
case class CharNgramMd5Expr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngram_md5"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.charNgramMd5(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernels.charNgramMd5($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgramMd5Expr =
    copy(child = newChild)
}

/** cdc_chunks(text) — content-defined chunk rows (see
  * TextKernels.cdcChunks). */
case class CdcChunksExpr(child: Expression, w: Int, threshold: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("chunk_len", LongType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.cdcChunks(input.asInstanceOf[UTF8String], w, threshold)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernels.cdcChunks($c, $w, $threshold)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

/** lang_id(text) as a native expression. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(input: Any): Any =
    TextKernelsBridge.langId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernelsBridge.langId($c)")
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** fix_mojibake(text) as a native expression: repair double-encoded
  * UTF-8 ([[TextKernelsBridge.fixMojibake]]); strings that don't
  * round-trip pass through unchanged. */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"
  override protected def nullSafeEval(input: Any): Any =
    TextKernelsBridge.fixMojibake(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernelsBridge.fixMojibake($c)")
  override protected def withNewChildInternal(newChild: Expression): FixMojibakeExpr =
    copy(child = newChild)
}

/** simhash(text) as a native expression. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Compiled greedy-longest-match subword vocabulary: membership set +
  * max token length (the longest-match probe never tries lengths the
  * vocab can't contain). Top-level class so generated Java can name
  * it directly in `ctx.addReferenceObj`. */
final class WordPieceVocab(val words: Array[String]) extends Serializable {
  val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.length * 2)
    words.foreach(s.add)
    s
  }
  val maxLen: Int =
    if (words.isEmpty) 1 else math.max(1, words.map(_.length).max)
}

/** wordpiece_counts(text) — greedy longest-match subword segmentation
  * over the [[TextKernels.tokenStrings]] word stream: at each word
  * position take the LONGEST vocab entry matching there; no match
  * emits a 1-char `<unk>` and advances one character. One pass, one
  * tight loop, codegen'd — the counting form of applying a trained
  * WordPiece/BPE vocabulary at corpus scale (the full token-id form
  * is the same loop emitting ids). Output struct:
  * (n_words, n_subwords, n_unk). */
case class WordPieceCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_unk", IntegerType, nullable = false)))
  override def prettyName: String = "wordpiece_counts"
  @transient private lazy val compiled = new WordPieceVocab(vocab.toArray)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordPieceCounts(input.asInstanceOf[UTF8String], compiled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", compiled,
      "graft.plans.WordPieceVocab")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernels.wordPieceCounts($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordPieceCountExpr =
    copy(child = newChild)
}
