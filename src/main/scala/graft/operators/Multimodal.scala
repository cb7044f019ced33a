package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `BINARY` columns with typed
  * metadata, and per-partition batched decode/feature-extract.
  *
  * The Spark-side machinery — schema, partition-size control, batched
  * `mapPartitions` decode with a typed output schema — is real and tested.
  * Decoding dispatches on content magic bytes ([[MediaCodec]]): formats the
  * JDK ships codecs for (PNG/GIF/BMP/JPEG via `javax.imageio`, WAV/AIFF via
  * `javax.sound.sampled`) yield REAL width/height/frame metadata; formats
  * needing external libraries this environment lacks (video, exotic image
  * codecs) fall through to [[StubCodec.decode]], which derives
  * deterministic pseudo-features from the bytes — clearly marked, with the
  * exact seam a libjpeg/ffmpeg binding would plug into.
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

  /** STUB decoder — deterministic pseudo-decode standing in for codecs the
    * environment lacks (libjpeg/ffmpeg). Every derived value is pure
    * arithmetic over the byte length + content hash so tests (and the SQL
    * oracle) can verify the plumbing end-to-end. */
  object StubCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.content.length.toLong
      MediaFeatures(r.media_id, r.media_type, n,
        width = (64 + n % 577).toInt,
        height = (64 + (n * 31) % 421).toInt,
        n_frames = (1 + n % 24).toInt,
        content_hash = md5Hex(r.content))
    }
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Content-sniffing decoder: formats the JDK decodes natively (PNG/GIF/
    * BMP via `javax.imageio`, WAV/AIFF via `javax.sound.sampled`) produce
    * REAL metadata; everything else falls through to [[StubCodec]]. The
    * dispatch is on magic bytes, not the metadata column — corrupt or
    * mislabeled content degrades to the stub instead of failing the task. */
  object MediaCodec {
    private def hasMagic(b: Array[Byte], at: Int, magic: String): Boolean =
      b.length >= at + magic.length &&
        magic.indices.forall(i => b(at + i) == magic.charAt(i).toByte)

    private def isImage(b: Array[Byte]): Boolean =
      (b.length >= 4 && b(0) == 0x89.toByte && hasMagic(b, 1, "PNG")) ||
        hasMagic(b, 0, "GIF8") || hasMagic(b, 0, "BM") ||
        // JPEG (FF D8 FF): javax.imageio ships a native JPEG reader, so the
        // most common image format gets REAL width/height, not the stub
        (b.length >= 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte &&
          b(2) == 0xFF.toByte)

    private def isAudio(b: Array[Byte]): Boolean =
      (hasMagic(b, 0, "RIFF") && hasMagic(b, 8, "WAVE")) ||
        (hasMagic(b, 0, "FORM") && hasMagic(b, 8, "AIFF"))

    def decode(r: MediaRecord): MediaFeatures =
      if (isImage(r.content)) decodeImage(r)
      else if (isAudio(r.content)) decodeAudio(r)
      else StubCodec.decode(r)

    /** Resize dispatch: real bilinear resize for JDK-decodable images
      * (falling back to the stub on decode failure, like [[decode]]);
      * AUDIO reports the same dimensional story as [[decodeAudio]] — 0×0,
      * a no-op "resize" (ADVICE r13: the stub's image-style src dims
      * contradicted decode's 0×0 for the same record); stub arithmetic
      * for everything else. */
    def resize(r: MediaRecord, maxDim: Int): ResizedMedia =
      if (isImage(r.content))
        resizeReal(r, maxDim).getOrElse(resizeStub(r, maxDim))
      else if (isAudio(r.content))
        ResizedMedia(r.media_id, r.media_type, 0, 0, 0, 0,
          md5Hex(r.content ++ ":resize:0x0".getBytes("UTF-8")))
      else resizeStub(r, maxDim)

    private def decodeImage(r: MediaRecord): MediaFeatures =
      try {
        // avoid ImageIO's disk-backed cache in executor threads
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) StubCodec.decode(r)
          else {
            val reader = readers.next()
            try {
              reader.setInput(in)
              MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
                width = reader.getWidth(0), height = reader.getHeight(0),
                n_frames = math.max(1, reader.getNumImages(true)),
                content_hash = md5Hex(r.content))
            } finally reader.dispose()
          }
        } finally in.close()
      } catch { case _: Exception => StubCodec.decode(r) }

    private def decodeAudio(r: MediaRecord): MediaFeatures =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        try MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
          width = 0, height = 0,
          n_frames = in.getFrameLength.toInt,
          content_hash = md5Hex(r.content))
        finally in.close()
      } catch { case _: Exception => StubCodec.decode(r) }
  }

  /** Build a media table from any (id, text) source — fixture adapter that
    * treats document bytes as opaque blobs. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      (element_at(split(col("source"), ":"), 1)).as("media_type"),
      col("text").cast("binary").as("content"))

  /** Frame sampling: every `stride`-th frame index per media record — the
    * fan-out step a video pipeline feeds to per-frame feature extraction.
    * Row-local `sequence` + `explode` (no shuffle); output is (media_id,
    * frame_idx, n_frames) with one row per sampled frame. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.select(col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"),
      col("n_frames"))

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
      .mapPartitions(_.map(MediaCodec.decode))
  }

  /** A resize result: source + target dimensions and the hash of the
    * resized content (the thumbnail a vision encoder ingests). */
  final case class ResizedMedia(media_id: Long, media_type: String,
                                src_width: Int, src_height: Int,
                                width: Int, height: Int,
                                content_hash: String)

  /** Aspect-preserving downscale arithmetic shared by the real and stub
    * paths (and re-spelled by the SQL twin): the longer side shrinks to
    * `maxDim`, integer division, floor 1; never upscales. */
  private[graft] def targetDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val long = math.max(w, h)
    if (long <= maxDim || long == 0) (w, h)
    else (math.max(1, w * maxDim / long), math.max(1, h * maxDim / long))
  }

  /** Batched per-partition RESIZE — the thumbnail/normalization step every
    * vision-data pipeline runs before feature extraction, through the same
    * magic-byte dispatch as [[decodeFeatures]]: formats the JDK decodes
    * (PNG/JPEG/GIF/BMP) are REALLY resized — `BufferedImage` +
    * bilinear `Graphics2D` draw, re-encoded as PNG, real output dims and a
    * hash of the real resized bytes (MultimodalSpec pins a genuine PNG
    * through the whole path); everything else degrades to the stub seam
    * (dims from [[StubCodec]] arithmetic scaled by [[targetDims]], hash =
    * md5 of the content + a `:resize:WxH` tag) so the plumbing — schema,
    * byte-budget partitioning, per-partition batching — still runs
    * end-to-end and the DuckDB twin can recompute it. Heavy bytes stay
    * inside the task (only dims + hash come out), the same
    * features-separate-from-blobs law as decode. */
  def resizeMedia(spark: SparkSession, media: DataFrame, maxDim: Int,
                  targetPartitions: Int = 0): Dataset[ResizedMedia] = {
    import spark.implicits._
    val parts = if (targetPartitions > 0) media.repartition(targetPartitions)
                else media
    parts.select(col("media_id"), col("media_type"), col("content"))
      .as[MediaRecord]
      .mapPartitions(_.map(r => MediaCodec.resize(r, maxDim)))
  }

  private[graft] def resizeReal(r: MediaRecord,
                                    maxDim: Int): Option[ResizedMedia] =
    try {
      // memory-backed image IO, like decodeImage: ImageIO.read(InputStream)
      // with the default useCache=true spins up a disk-backed
      // FileCacheImageInputStream in executor threads — temp-file churn,
      // fails on a read-only tmp (ADVICE r13)
      // NO explicit close: read(ImageInputStream) closes the stream itself
      // (javadoc), and a second close throws "IOException: closed" — which
      // the fallback catch would silently turn into the stub path for
      // EVERY image (caught by the real-PNG spec). Nothing leaks either
      // way: the stream is a wrapper over an in-memory byte array.
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.content)))
      if (img == null) None
      else {
        val (w, h) = targetDims(img.getWidth, img.getHeight, maxDim)
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try javax.imageio.ImageIO.write(out, "png", ios) finally ios.close()
        Some(ResizedMedia(r.media_id, r.media_type,
          img.getWidth, img.getHeight, w, h, md5Hex(bos.toByteArray)))
      }
    } catch { case _: Exception => None }

  private[graft] def resizeStub(r: MediaRecord,
                                    maxDim: Int): ResizedMedia = {
    val f = StubCodec.decode(r)
    val (w, h) = targetDims(f.width, f.height, maxDim)
    ResizedMedia(r.media_id, r.media_type, f.width, f.height, w, h,
      md5Hex(r.content ++ s":resize:${w}x$h".getBytes("UTF-8")))
  }
}
