package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.6): image/audio/video as
  * opaque `binary` payloads with typed struct metadata. The Spark-side
  * machinery — schema, partition-sized batching, per-partition decode
  * signature — is real; the actual codec step is STUBBED with a
  * deterministic fake (this container has no image/audio libraries),
  * clearly marked below. On a real cluster the stub body is replaced
  * by the codec call with NO plan changes.
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

  case class MediaFeatures(media_id: Long, byte_len: Long, width: Int,
                           height: Int, mean_px: Double, n_frames: Int)

  /** Per-partition "decode + feature extract". The iterator shape is
    * the real contract (a codec processes a partition's payloads in
    * one native session); the feature computation below is a
    * ===== DETERMINISTIC FAKE (STUB) =====
    * standing in for e.g. JPEG decode: dimensions and pixel stats are
    * derived from the payload bytes, so results are stable and
    * testable without codec libraries.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val len = bytes.length.toLong
          // --- STUB: replace from here with real codec calls ---
          val width = 64 + (math.abs(java.util.Arrays.hashCode(bytes)) % 512)
          val height = 64 + (math.abs(java.util.Arrays.hashCode(bytes.reverse)) % 512)
          val meanPx = if (len == 0) 0.0
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / len
          val nFrames = 1 + (len % 16).toInt
          // --- end STUB ---
          MediaFeatures(id, len, width, height, meanPx, nFrames)
        }
      }
  }

  /** Frame sampling: take every `stride`-th fixed-size block of the
    * payload (the video-frame-sample topology: explode bounded slices,
    * never materialize the whole payload per row downstream). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0),
          greatest(((length(col("payload")) - 1) / (frameBytes * stride)).cast("int"), lit(0))),
        i => substring(base64(col("payload")), (i * frameBytes * stride + 1).cast("int"), frameBytes))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_b64")

  private def substring(x: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column,
                        len: Int): org.apache.spark.sql.Column =
    call_function("substring", x, pos, lit(len))
}
