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
