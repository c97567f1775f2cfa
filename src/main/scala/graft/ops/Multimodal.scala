package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.6): image/audio/video as
  * opaque `binary` payloads with typed struct metadata. The decode
  * path (`decodePpm`) is a REAL byte-level image parser — PPM/P6 needs
  * no codec library, so the whole pipeline (schema, per-partition
  * batching, permissive corrupt-row handling) is exercised end-to-end
  * and oracle-checked. Codec-library formats (JPEG/WAV/MP4) drop into
  * the same mapPartitions slot with NO plan changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("source", StringType, nullable = true))), nullable = true)))

  /** Wrap any (id, string) frame as a media frame: payload = bytes. */
  def asMedia(df: DataFrame, id: String, payloadText: String,
              mime: String): DataFrame =
    df.select(col(id).cast("long").as("media_id"),
      encode(col(payloadText), "UTF-8").as("payload"),
      struct(lit(mime).as("mime"), lit("testdata").as("source")).as("meta"))

  // ---- real decode: PPM (P6) ---------------------------------------------
  // PPM needs no codec library — the header is ASCII, the pixels are
  // raw bytes — so this path is a genuine decoder: it byte-parses the
  // payload exactly as a JPEG decoder would sit in the same
  // mapPartitions slot.

  /** Deterministic synthetic P6 image per row: header + w*h*3 pixel
    * bytes derived from the md5 hex of `text` (ASCII, so chars ==
    * bytes and a SQL oracle can recompute the expected statistics). */
  def syntheticPpm(df: DataFrame, id: String, text: String,
                   w: Int, h: Int): DataFrame = {
    val n = w * h * 3
    val px = substring(rpad(repeat(md5(col(text)), n / 32 + 1), n, "0"), lit(1), n)
    df.select(col(id).cast("long").as("media_id"),
      concat(encode(lit(s"P6\n$w $h\n255\n"), "UTF-8"),
        encode(px, "UTF-8")).as("payload"),
      struct(lit("image/x-portable-pixmap").as("mime"),
        lit("synthetic").as("source")).as("meta"))
  }

  case class PpmFeatures(media_id: Long, ok: Boolean, width: Int, height: Int,
                         mean_px: Double, mean_r: Double, mean_g: Double,
                         mean_b: Double)

  /** Real P6 parser: magic, comment-tolerant ASCII header, 8-bit
    * RGB triplets; emits per-channel means. Malformed payloads yield
    * ok=false rows (PERMISSIVE semantics) instead of failing the
    * partition — at 100 TB some payloads WILL be corrupt. */
  def decodePpm(media: DataFrame): Dataset[PpmFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          try {
            val b = payload
            var p = 2
            require(b != null && b.length > 2 && b(0) == 'P'.toByte && b(1) == '6'.toByte,
              "not a P6 ppm")
            def skipWs(): Unit = {
              var more = true
              while (more && p < b.length) {
                val c = b(p)
                if (c == ' '.toByte || c == '\n'.toByte || c == '\t'.toByte || c == '\r'.toByte) p += 1
                else if (c == '#'.toByte) { while (p < b.length && b(p) != '\n'.toByte) p += 1 }
                else more = false
              }
            }
            def readInt(): Int = {
              skipWs()
              require(p < b.length && b(p) >= '0'.toByte && b(p) <= '9'.toByte, "bad header int")
              var v = 0
              while (p < b.length && b(p) >= '0'.toByte && b(p) <= '9'.toByte) {
                v = v * 10 + (b(p) - '0'); p += 1
              }
              v
            }
            val w = readInt(); val h = readInt(); val maxv = readInt()
            require(maxv == 255, "only 8-bit ppm supported")
            p += 1 // exactly one whitespace byte separates header and raster
            val n = w * h * 3
            require(n > 0 && b.length >= p + n, "truncated raster")
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < n) {
              val v = b(p + i) & 0xFF
              (i % 3) match { case 0 => sr += v; case 1 => sg += v; case _ => sb += v }
              i += 1
            }
            val pxCount = w.toLong * h
            PpmFeatures(id, ok = true, w, h, (sr + sg + sb).toDouble / n,
              sr.toDouble / pxCount, sg.toDouble / pxCount, sb.toDouble / pxCount)
          } catch {
            case _: Exception => PpmFeatures(id, ok = false, 0, 0, 0.0, 0.0, 0.0, 0.0)
          }
        }
      }
  }

  /** Nearest-neighbor resize of P6 payloads — the canonical image
    * preprocessing step (fixed-shape training inputs, thumbnails for
    * perceptual hashing) in the same mapPartitions byte-transform slot
    * as the decoders: header parsed exactly like [[decodePpm]], each
    * destination pixel (x,y) copies source pixel
    * (⌊x·srcW/dstW⌋, ⌊y·srcH/dstH⌋) — integer-exact addressing, so an
    * external engine replays the resampled statistics by string
    * indexing into the synthetic raster. Output rows carry the
    * re-headered payload (same media schema; meta marks the transform);
    * malformed payloads are DROPPED (permissive — the decode step
    * would reject them anyway, and a resize cannot invent bytes). */
  def resizePpm(media: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    require(dstW >= 1 && dstH >= 1,
      s"resizePpm: target dims must be >= 1 (got ${dstW}x$dstH)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          try {
            var p = 2
            require(b != null && b.length > 2 && b(0) == 'P'.toByte && b(1) == '6'.toByte,
              "not a P6 ppm")
            def skipWs(): Unit = {
              var more = true
              while (more && p < b.length) {
                val c = b(p)
                if (c == ' '.toByte || c == '\n'.toByte || c == '\t'.toByte || c == '\r'.toByte) p += 1
                else if (c == '#'.toByte) { while (p < b.length && b(p) != '\n'.toByte) p += 1 }
                else more = false
              }
            }
            def readInt(): Int = {
              skipWs()
              require(p < b.length && b(p) >= '0'.toByte && b(p) <= '9'.toByte, "bad header int")
              var v = 0
              while (p < b.length && b(p) >= '0'.toByte && b(p) <= '9'.toByte) {
                v = v * 10 + (b(p) - '0'); p += 1
              }
              v
            }
            val w = readInt(); val h = readInt(); val maxv = readInt()
            require(maxv == 255, "only 8-bit ppm supported")
            p += 1
            require(w > 0 && h > 0 && b.length >= p + w * h * 3, "truncated raster")
            val header = s"P6\n$dstW $dstH\n255\n".getBytes("US-ASCII")
            val out = new Array[Byte](header.length + dstW * dstH * 3)
            System.arraycopy(header, 0, out, 0, header.length)
            var q = header.length
            var y = 0
            while (y < dstH) {
              val sy = (y.toLong * h / dstH).toInt
              var x = 0
              while (x < dstW) {
                val sx = (x.toLong * w / dstW).toInt
                val sp = p + (sy * w + sx) * 3
                out(q) = b(sp); out(q + 1) = b(sp + 1); out(q + 2) = b(sp + 2)
                q += 3; x += 1
              }
              y += 1
            }
            Iterator.single((id, out))
          } catch { case _: Exception => Iterator.empty }
        }
      }
      .toDF("media_id", "payload")
      .withColumn("meta", struct(lit("image/x-portable-pixmap").as("mime"),
        lit("resized").as("source")))
  }

  case class PpmHash(media_id: Long, ok: Boolean, dhash: Long)

  /** Perceptual difference-hash (dHash) over P6 payloads — the
    * image-dedup signature: a 9×8 grid of block-mean grayscale values,
    * bit k = y·8+x set iff gray(x,y) < gray(x+1,y) (8 horizontal
    * gradients per row × 8 rows = 64 bits). Near-identical images
    * (re-encodes, small edits, thumbnails) land within a few bits —
    * feed the signatures to [[Dedup.hammingNearDupSigs]] for the
    * capped pigeonhole pair join.
    *
    * Block means compare EXACTLY via cross-multiplied integer sums
    * (sumA·nB < sumB·nA — no float division), so the hash is
    * bit-reproducible by any engine addressing the same bytes, and
    * scale-invariant under exact pixel replication (an upscaled copy
    * hashes identically). gray = r+g+b (unweighted — a monotone
    * stand-in for luma; the ordering, not the colorimetry, is what
    * dHash consumes). Images smaller than the 9×8 grid and malformed
    * payloads yield ok=false (PERMISSIVE, like [[decodePpm]]). */
  def dHashPpm(media: DataFrame): Dataset[PpmHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          try {
            var p = 2
            require(b != null && b.length > 2 && b(0) == 'P'.toByte && b(1) == '6'.toByte,
              "not a P6 ppm")
            def skipWs(): Unit = {
              var more = true
              while (more && p < b.length) {
                val c = b(p)
                if (c == ' '.toByte || c == '\n'.toByte || c == '\t'.toByte || c == '\r'.toByte) p += 1
                else if (c == '#'.toByte) { while (p < b.length && b(p) != '\n'.toByte) p += 1 }
                else more = false
              }
            }
            def readInt(): Int = {
              skipWs()
              require(p < b.length && b(p) >= '0'.toByte && b(p) <= '9'.toByte, "bad header int")
              var v = 0
              while (p < b.length && b(p) >= '0'.toByte && b(p) <= '9'.toByte) {
                v = v * 10 + (b(p) - '0'); p += 1
              }
              v
            }
            val w = readInt(); val h = readInt(); val maxv = readInt()
            require(maxv == 255, "only 8-bit ppm supported")
            p += 1 // exactly one whitespace byte separates header and raster
            require(w >= 9 && h >= 8, "image smaller than the 9x8 dhash grid")
            require(b.length >= p + w * h * 3, "truncated raster")
            // block gray sums: pixel (x,y) → grid cell (x*9/w, y*8/h)
            val sums = Array.ofDim[Long](8, 9)
            val cnts = Array.ofDim[Long](8, 9)
            var y = 0
            while (y < h) {
              val gy = y * 8 / h
              var x = 0
              while (x < w) {
                val i = p + (y * w + x) * 3
                val gray = (b(i) & 0xFF) + (b(i + 1) & 0xFF) + (b(i + 2) & 0xFF)
                val gx = x * 9 / w
                sums(gy)(gx) += gray
                cnts(gy)(gx) += 1
                x += 1
              }
              y += 1
            }
            var hash = 0L
            y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                // exact mean compare: sumL/nL < sumR/nR ⇔ sumL·nR < sumR·nL
                if (sums(y)(x) * cnts(y)(x + 1) < sums(y)(x + 1) * cnts(y)(x))
                  hash |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            PpmHash(id, ok = true, hash)
          } catch {
            case _: Exception => PpmHash(id, ok = false, 0L)
          }
        }
      }
  }

  // ---- real decode: WAV (RIFF/PCM) ---------------------------------------
  // WAV is the audio analogue of PPM: an ASCII-tagged chunk layout and
  // raw PCM samples, no codec library needed — so the audio decode
  // slot is a genuine RIFF chunk-walker, not a stub. Compressed
  // formats (MP3/FLAC) drop into the same mapPartitions slot.

  /** Deterministic synthetic 8-bit mono PCM WAV per row: a literal
    * RIFF/fmt/data header (all sizes little-endian, precomputed here)
    * followed by `nSamples` unsigned 8-bit samples taken from the md5
    * hex of `text` (ASCII chars == sample bytes, so a SQL oracle can
    * recompute the expected statistics). */
  def syntheticWav(df: DataFrame, id: String, text: String,
                   sampleRate: Int, nSamples: Int): DataFrame = {
    def le32(v: Int): String =
      f"${v & 0xFF}%02x${(v >> 8) & 0xFF}%02x${(v >> 16) & 0xFF}%02x${(v >> 24) & 0xFF}%02x"
    def le16(v: Int): String = f"${v & 0xFF}%02x${(v >> 8) & 0xFF}%02x"
    def tag(s: String): String = s.getBytes("US-ASCII").map(b => f"$b%02x").mkString
    val headerHex =
      tag("RIFF") + le32(36 + nSamples) + tag("WAVE") +
        tag("fmt ") + le32(16) + le16(1) /*PCM*/ + le16(1) /*mono*/ +
        le32(sampleRate) + le32(sampleRate) /*byteRate*/ +
        le16(1) /*blockAlign*/ + le16(8) /*bits*/ +
        tag("data") + le32(nSamples)
    val px = substring(rpad(repeat(md5(col(text)), nSamples / 32 + 1), nSamples, "0"),
      lit(1), nSamples)
    df.select(col(id).cast("long").as("media_id"),
      concat(unhex(lit(headerHex)), encode(px, "UTF-8")).as("payload"),
      struct(lit("audio/wav").as("mime"), lit("synthetic").as("source")).as("meta"))
  }

  case class WavFeatures(media_id: Long, ok: Boolean, sample_rate: Int,
                         channels: Int, bits: Int, n_samples: Long,
                         duration_sec: Double, mean_amp: Double, peak_amp: Int)

  case class WavWindow(media_id: Long, win_idx: Int, n: Long,
                       energy: Long, rms: Double)

  /** Windowed RMS energy over PCM samples — the audio-curation
    * feature (silence trimming, speech/noise gating, loudness
    * bucketing) one step past [[decodeWav]]'s whole-clip stats: the
    * same RIFF chunk walk, then fixed `windowSamples` windows each
    * emitting (n, Σa², rms) where a = sample−128 for 8-bit unsigned /
    * the signed value for 16-bit. The energy is an exact integer, the
    * rms a single sqrt of an exact ratio — an external engine replays
    * both from the synthetic byte stream. Tail windows run short;
    * malformed payloads are dropped (permissive, like the other
    * byte-transform ops). */
  def wavRmsWindows(media: DataFrame, windowSamples: Int): Dataset[WavWindow] = {
    require(windowSamples >= 1,
      s"wavRmsWindows: windowSamples must be >= 1 (got $windowSamples)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          try {
            def tagAt(p: Int, s: String): Boolean =
              p + 4 <= b.length && (0 until 4).forall(i => b(p + i) == s.charAt(i).toByte)
            def le32(p: Int): Int =
              (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
                ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
            def le16(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
            require(b != null && b.length >= 44 && tagAt(0, "RIFF") && tagAt(8, "WAVE"),
              "not a RIFF/WAVE payload")
            var p = 12
            var fmtSeen = false
            var bits = 0
            val samples = scala.collection.mutable.ArrayBuffer.empty[Int]
            val end = math.min(b.length.toLong, 8L + (le32(4) & 0xFFFFFFFFL)).toInt
            while (p + 8 <= end) {
              val size = le32(p + 4)
              require(size >= 0 && p + 8 + size <= end, "truncated chunk")
              if (tagAt(p, "fmt ")) {
                require(size >= 16 && le16(p + 8) == 1, "only PCM wav supported")
                bits = le16(p + 22)
                require(bits == 8 || bits == 16, "bad fmt")
                fmtSeen = true
              } else if (tagAt(p, "data")) {
                require(fmtSeen, "data before fmt")
                val d = p + 8
                if (bits == 8) { var i = 0; while (i < size) {
                  samples += ((b(d + i) & 0xFF) - 128); i += 1 } }
                else { require(size % 2 == 0, "odd 16-bit data size")
                  var i = 0; while (i < size) {
                    samples += ((le16(d + i) << 16) >> 16); i += 2 } }
              }
              p += 8 + size + (size & 1)
            }
            require(fmtSeen && samples.nonEmpty, "no PCM data")
            samples.grouped(windowSamples).zipWithIndex.map { case (w, idx) =>
              val energy = w.foldLeft(0L)((acc, a) => acc + a.toLong * a)
              WavWindow(id, idx, w.length.toLong, energy,
                math.sqrt(energy.toDouble / w.length))
            }
          } catch { case _: Exception => Iterator.empty }
        }
      }
  }

  /** Real RIFF/PCM parser: validates RIFF/WAVE magic, walks chunks
    * (unknown chunks skipped, word-aligned like the spec), reads the
    * fmt chunk (PCM only, 8-bit unsigned or 16-bit signed LE), and
    * streams the data chunk once for mean/peak amplitude. Malformed
    * payloads yield ok=false rows (PERMISSIVE — at 100 TB some
    * payloads WILL be corrupt). */
  def decodeWav(media: DataFrame): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          try {
            def tagAt(p: Int, s: String): Boolean =
              p + 4 <= b.length && (0 until 4).forall(i => b(p + i) == s.charAt(i).toByte)
            def le32(p: Int): Int =
              (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
                ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
            def le16(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
            require(b != null && b.length >= 44 && tagAt(0, "RIFF") && tagAt(8, "WAVE"),
              "not a RIFF/WAVE payload")
            var p = 12
            var fmtSeen = false
            var rate = 0; var channels = 0; var bits = 0
            var nSamples = 0L; var sum = 0L; var peak = Int.MinValue; var n = 0L
            // the walk ends at the declared RIFF body (8 + size word at
            // offset 4), clamped to the payload: trailing bytes past the
            // declared body (padding / ID3-style tails) are ignored per
            // the PERMISSIVE contract, not flagged ok=false
            val end = math.min(b.length.toLong, 8L + (le32(4) & 0xFFFFFFFFL)).toInt
            while (p + 8 <= end) {
              val size = le32(p + 4)
              require(size >= 0 && p + 8 + size <= end, "truncated chunk")
              if (tagAt(p, "fmt ")) {
                require(size >= 16, "short fmt chunk")
                require(le16(p + 8) == 1, "only PCM wav supported")
                channels = le16(p + 10)
                rate = le32(p + 12)
                bits = le16(p + 22)
                require(channels >= 1 && rate > 0 && (bits == 8 || bits == 16), "bad fmt")
                fmtSeen = true
              } else if (tagAt(p, "data")) {
                require(fmtSeen, "data before fmt")
                val d = p + 8
                if (bits == 8) {
                  var i = 0
                  while (i < size) {
                    val v = b(d + i) & 0xFF
                    sum += v; if (v > peak) peak = v; i += 1
                  }
                  n += size
                } else {
                  require(size % 2 == 0, "odd 16-bit data size")
                  var i = 0
                  while (i < size) {
                    val v = (le16(d + i) << 16) >> 16 // sign-extend
                    sum += v; if (v > peak) peak = v; i += 2
                  }
                  n += size / 2
                }
              }
              p += 8 + size + (size & 1) // chunks are word-aligned
            }
            require(fmtSeen && n > 0, "no PCM data")
            nSamples = n / channels
            WavFeatures(id, ok = true, rate, channels, bits, nSamples,
              nSamples.toDouble / rate, sum.toDouble / n, peak)
          } catch {
            case _: Exception => WavFeatures(id, ok = false, 0, 0, 0, 0L, 0.0, 0.0, 0)
          }
        }
      }
  }

  // ---- real decode: Y4M (YUV4MPEG2) --------------------------------------
  // Y4M is the video analogue of PPM: an ASCII stream header, an ASCII
  // "FRAME" marker per frame, then raw planar YUV bytes — no codec
  // library needed, so the video decode slot is a genuine stream
  // parser. Compressed codecs (H.264/VP9) drop into the same slot.

  /** Deterministic synthetic C420 Y4M clip per row: a constant stream
    * header, `frames` frames of w×h luma + quarter-size chroma planes,
    * all sample bytes taken from the md5 hex of `text` (ASCII, so a
    * SQL oracle can recompute the luma statistics). */
  def syntheticY4m(df: DataFrame, id: String, text: String,
                   w: Int, h: Int, frames: Int): DataFrame = {
    require(w % 2 == 0 && h % 2 == 0, "C420 needs even dimensions")
    val frameBytes = w * h + 2 * (w / 2) * (h / 2)
    val n = frames * frameBytes
    val px = substring(rpad(repeat(md5(col(text)), n / 32 + 1), n, "0"), lit(1), n)
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
    val body = (0 until frames).map { i =>
      concat(encode(lit("FRAME\n"), "UTF-8"),
        encode(substring(px, lit(i * frameBytes + 1), frameBytes), "UTF-8"))
    }.reduce(concat(_, _))
    df.select(col(id).cast("long").as("media_id"),
      concat(encode(lit(header), "UTF-8"), body).as("payload"),
      struct(lit("video/x-yuv4mpeg").as("mime"), lit("synthetic").as("source")).as("meta"))
  }

  case class Y4mFeatures(media_id: Long, ok: Boolean, width: Int, height: Int,
                         fps: Double, n_frames: Long, mean_luma: Double,
                         first_frame_luma: Double)

  /** Real YUV4MPEG2 stream parser: validates the magic, reads the
    * W/H/F header tags (unknown tags skipped), then walks FRAME
    * markers (per-frame parameters tolerated) accumulating luma-plane
    * statistics without materializing frames. Malformed payloads yield
    * ok=false rows (PERMISSIVE). */
  def decodeY4m(media: DataFrame): Dataset[Y4mFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          try {
            val magic = "YUV4MPEG2"
            require(b != null && b.length > magic.length + 1 &&
              (0 until magic.length).forall(i => b(i) == magic.charAt(i).toByte),
              "not a YUV4MPEG2 payload")
            var p = magic.length
            var w = 0; var h = 0; var fpsN = 25; var fpsD = 1
            // header tags: ' '-separated until newline
            while (p < b.length && b(p) != '\n'.toByte) {
              require(b(p) == ' '.toByte, "bad header separator")
              p += 1
              require(p < b.length, "truncated header")
              val tag = b(p); p += 1
              val start = p
              while (p < b.length && b(p) != ' '.toByte && b(p) != '\n'.toByte) p += 1
              val v = new String(b, start, p - start, "US-ASCII")
              tag match {
                case 'W' => w = v.toInt
                case 'H' => h = v.toInt
                case 'F' =>
                  val Array(nu, de) = v.split(":"); fpsN = nu.toInt; fpsD = de.toInt
                case _   => // Ip, A1:1, C420, X...: tolerated
              }
            }
            require(p < b.length && b(p) == '\n'.toByte, "unterminated header")
            p += 1
            require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0 && fpsD > 0, "bad geometry")
            val luma = w * h
            val frameBytes = luma + 2 * (w / 2) * (h / 2)
            var frames = 0L; var lumaSum = 0L; var firstSum = 0L
            while (p < b.length) {
              val fm = "FRAME"
              require(p + fm.length <= b.length &&
                (0 until fm.length).forall(i => b(p + i) == fm.charAt(i).toByte),
                "bad FRAME marker")
              p += fm.length
              while (p < b.length && b(p) != '\n'.toByte) p += 1 // frame params
              require(p < b.length, "unterminated FRAME header")
              p += 1
              require(p + frameBytes <= b.length, "truncated frame")
              var i = 0
              var s = 0L
              while (i < luma) { s += b(p + i) & 0xFF; i += 1 }
              if (frames == 0L) firstSum = s
              lumaSum += s
              frames += 1
              p += frameBytes
            }
            require(frames > 0, "no frames")
            Y4mFeatures(id, ok = true, w, h, fpsN.toDouble / fpsD, frames,
              lumaSum.toDouble / (frames * luma), firstSum.toDouble / luma)
          } catch {
            case _: Exception => Y4mFeatures(id, ok = false, 0, 0, 0.0, 0L, 0.0, 0.0)
          }
        }
      }
  }

  case class SceneCut(media_id: Long, frame_idx: Int, sad: Long,
                      mad: Double, cut: Boolean)

  /** Scene-change detection over the real Y4M stream walk — video
    * curation's shot segmentation (sample one frame per shot instead
    * of per second; drop static slideshows): for every consecutive
    * frame pair, the Sum of Absolute Differences over the LUMA plane
    * (exact integer), its per-pixel mean (one IEEE division), and a
    * cut flag at `threshold`. The same header/FRAME walk as
    * [[decodeY4m]], holding exactly two luma planes at a time —
    * payload-bounded state, frames never materialize downstream.
    * frame_idx i compares frame i to i−1 (1-based over pairs).
    * Malformed payloads drop (permissive). */
  def y4mSceneCuts(media: DataFrame, threshold: Double): Dataset[SceneCut] = {
    require(threshold >= 0, s"y4mSceneCuts: threshold must be >= 0")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          try {
            val magic = "YUV4MPEG2"
            require(b != null && b.length > magic.length + 1 &&
              (0 until magic.length).forall(i => b(i) == magic.charAt(i).toByte),
              "not a YUV4MPEG2 payload")
            var p = magic.length
            var w = 0; var h = 0
            while (p < b.length && b(p) != '\n'.toByte) {
              require(b(p) == ' '.toByte, "bad header separator")
              p += 1
              require(p < b.length, "truncated header")
              val tag = b(p); p += 1
              val start = p
              while (p < b.length && b(p) != ' '.toByte && b(p) != '\n'.toByte) p += 1
              val v = new String(b, start, p - start, "US-ASCII")
              tag match {
                case 'W' => w = v.toInt
                case 'H' => h = v.toInt
                case _   =>
              }
            }
            require(p < b.length && b(p) == '\n'.toByte, "unterminated header")
            p += 1
            require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, "bad geometry")
            val luma = w * h
            val frameBytes = luma + 2 * (w / 2) * (h / 2)
            var prev: Array[Int] = null
            val out = scala.collection.mutable.ArrayBuffer.empty[SceneCut]
            var idx = 0
            while (p < b.length) {
              val fm = "FRAME"
              require(p + fm.length <= b.length &&
                (0 until fm.length).forall(i => b(p + i) == fm.charAt(i).toByte),
                "bad FRAME marker")
              p += fm.length
              while (p < b.length && b(p) != '\n'.toByte) p += 1
              require(p < b.length, "unterminated FRAME header")
              p += 1
              require(p + frameBytes <= b.length, "truncated frame")
              val cur = new Array[Int](luma)
              var i = 0
              while (i < luma) { cur(i) = b(p + i) & 0xFF; i += 1 }
              if (prev != null) {
                var sad = 0L; i = 0
                while (i < luma) { sad += math.abs(cur(i) - prev(i)); i += 1 }
                val mad = sad.toDouble / luma
                out += SceneCut(id, idx, sad, mad, mad > threshold)
              }
              prev = cur; idx += 1
              p += frameBytes
            }
            require(idx > 0, "no frames")
            out.iterator
          } catch { case _: Exception => Iterator.empty }
        }
      }
  }

  /** Frame sampling: take every `stride`-th fixed-size block of the
    * payload (the video-frame-sample topology: explode bounded slices,
    * never materialize the whole payload per row downstream). Spark's
    * base64 is MIME-chunked (CRLF every 76 chars); strip the breaks so
    * the encoding is plain RFC-4648 like every other engine's. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val b64 = translate(base64(col("payload")), "\r\n", "")
    media.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0),
          greatest(((length(col("payload")) - 1) / (frameBytes * stride)).cast("int"), lit(0))),
        i => substring(b64, (i * frameBytes * stride + 1).cast("int"), frameBytes))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_b64")
  }

  private def substring(x: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column,
                        len: Int): org.apache.spark.sql.Column =
    call_function("substring", x, pos, lit(len))
}
