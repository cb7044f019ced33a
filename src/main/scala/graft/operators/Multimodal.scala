package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `BINARY` columns with typed
  * metadata, and per-partition batched decode/feature-extract.
  *
  * The Spark-side machinery — schema, partition-size control, batched
  * `mapPartitions` decode with a typed output schema — is real and tested.
  * The actual media decoding is STUBBED (no image/audio libraries in this
  * environment): [[StubCodec.decode]] derives deterministic pseudo-features
  * from the bytes, clearly marked, with the exact seam a libjpeg/ffmpeg
  * binding would plug into.
  *
  * Scale notes: media blobs dominate partition size, so the pipeline
  * repartitions by byte budget before decode (each task holds only its
  * batch); features (small) separate from blobs (large) after extraction,
  * so downstream analytics never reshuffles the heavy bytes.
  */
object Multimodal {

  /** A media record: opaque content + minimal metadata — the extended-point
    * pattern (address→id, blob→content) generalized. */
  final case class MediaRecord(media_id: Long, media_type: String,
                               content: Array[Byte])

  /** Typed decode output: metadata a real decoder would produce. */
  final case class MediaFeatures(media_id: Long, media_type: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 n_frames: Int, content_hash: String)

  /** STUB decoder — deterministic pseudo-decode standing in for the real
    * libjpeg/ffmpeg call. Every derived value is pure arithmetic over the
    * byte length + content hash so tests (and the SQL oracle) can verify
    * the plumbing end-to-end. */
  object StubCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      // ??? <- real binding goes here: ImageIO.read / av_frame_decode
      val n = r.content.length.toLong
      MediaFeatures(r.media_id, r.media_type, n,
        width = (64 + n % 577).toInt,
        height = (64 + (n * 31) % 421).toInt,
        n_frames = (1 + n % 24).toInt,
        content_hash = java.security.MessageDigest.getInstance("MD5")
          .digest(r.content).map("%02x".format(_)).mkString)
    }
  }

  /** Build a media table from any (id, text) source — fixture adapter that
    * treats document bytes as opaque blobs. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      (element_at(split(col("source"), ":"), 1)).as("media_type"),
      col("text").cast("binary").as("content"))

  /** Batched per-partition decode: repartition so each task's blob volume
    * stays bounded, then decode partition-at-a-time through the typed seam.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val parts = if (targetPartitions > 0) media.repartition(targetPartitions)
                else media
    parts.select(col("media_id"), col("media_type"), col("content"))
      .as[MediaRecord]
      .mapPartitions(_.map(StubCodec.decode))
  }
}
