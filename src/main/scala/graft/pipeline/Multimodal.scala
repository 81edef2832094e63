package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns travelling next to a typed
  * metadata struct. The Spark-side machinery — schema, partition-sized
  * batch processing via `mapPartitions`, deterministic output shapes —
  * is real and tested. IMAGE decode/resize is REAL (`javax.imageio`,
  * in the JDK: PNG/JPEG/BMP/GIF): payloads that decode get true
  * dimensions, pixel statistics, and nearest-neighbor resampling.
  * Audio/video kernels remain STUBBED (no codec libraries in this
  * container) behind `decodeStub`, which derives deterministic
  * pseudo-metadata from the bytes — the pipeline shape (schema in →
  * schema out, batch iteration, no driver-side collection) is exactly
  * what a real av-decoder drops into.
  */
object Multimodal {

  // ── real image kernels (javax.imageio — in the JDK) ────────────────────

  /** Decode an image payload: (width, height, mean pixel value over all
    * RGB channels in [0,255]). None when the bytes are not a decodable
    * image (callers fall back to the byte-level stub — the audio/video
    * path). One decoder instance per call; a vectorized decoder would
    * hoist init per partition (see [[decodeAndFeaturize]]). */
  private[pipeline] def decodeImage(payload: Array[Byte])
      : Option[(Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L
        var j = 0
        while (j < h) {
          var i = 0
          while (i < w) {
            val rgb = img.getRGB(i, j)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            i += 1
          }
          j += 1
        }
        Some((w, h, sum.toDouble / (w.toLong * h * 3)))
      }
    } catch { case _: Exception => None }

  /** Nearest-neighbor resample + PNG re-encode, or None when the payload
    * is not a decodable image. Nearest-neighbor (not smooth scaling) so
    * the output pixels are an exact deterministic function of the input
    * grid — the contract the gate and tests pin. */
  private[pipeline] def resizeImage(payload: Array[Byte], factor: Int)
      : Option[(Array[Byte], Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val nw = math.max(img.getWidth / factor, 1)
        val nh = math.max(img.getHeight / factor, 1)
        val out = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var j = 0
        while (j < nh) {
          var i = 0
          while (i < nw) {
            out.setRGB(i, j, img.getRGB(
              math.min(i * factor, img.getWidth - 1),
              math.min(j * factor, img.getHeight - 1)))
            i += 1
          }
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some((bos.toByteArray, nw, nh))
      }
    } catch { case _: Exception => None }

  /** Deterministic tiny RGB PNG for a seed — REAL image bytes for the
    * decode path without external fixtures (an LCG fills the pixel
    * grid, ImageIO encodes). */
  private[pipeline] def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = seed
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        x = x * 6364136223846793005L + 1442695040888963407L
        img.setRGB(i, j, ((x >>> 24) & 0xffffff).toInt)
        i += 1
      }
      j += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[pipeline] final case class ImageGen(media_id: Long, seed: Long,
      w: Int, h: Int)
  private[pipeline] final case class ImageRow(media_id: Long,
      payload: Array[Byte], mime: String, width: Int, height: Int)

  /** Media table with REAL PNG payloads, one deterministic image per
    * corpus row (dims derived from the text hash). The payloads exercise
    * the true decode path end-to-end; generation is distributed map
    * work, exactly like reading real bytes from a lakehouse column. */
  def syntheticImageTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("media_id"), xxhash64(col(textCol)).as("seed"),
        (pmod(xxhash64(col(textCol)), lit(13)) + 4).cast("int").as("w"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(11)) + 4).cast("int").as("h"))
      .as[ImageGen]
      .mapPartitions(_.map(g =>
        ImageRow(g.media_id, syntheticPng(g.seed, g.w, g.h), "image/png",
          g.w, g.h)))
      .toDF()
      .select(col("media_id"), col("payload"),
        struct(col("mime"), col("width"), col("height"),
          lit(1).as("n_frames"),
          lit(null).cast("int").as("sample_rate")).as("meta"))
  }

  /** Typed metadata carried with every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  /** Media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", mediaMetaType, nullable = false)))

  /** Manufacture a media table from any corpus table (docs → fake bytes).
    * In production this column arrives from the lakehouse as real bytes;
    * the point here is the downstream plumbing. */
  def syntheticMediaTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image/stub").as("mime"),
        (pmod(xxhash64(col(textCol)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1080)) + 1).cast("int").as("height"),
        lit(1).as("n_frames"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  /** STUB byte-level kernel for NON-IMAGE payloads (audio/video — no
    * codec libraries in this container): deterministic byte statistics
    * with the same shape a real av-decoder's summary would have. Image
    * payloads never reach this — [[decodeImage]] handles them for real. */
  private[pipeline] def decodeStub(payload: Array[Byte]): (Int, Double) = {
    // ??? real audio/video codec goes here — deterministic fake below.
    var sum = 0L; var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    (payload.length, if (payload.isEmpty) 0.0 else sum.toDouble / payload.length)
  }

  private val featDim = 8

  /** STUB feature extraction: fixed-size float vector per payload.
    * Real kernel = CNN/embedding model; fake = strided byte hashes with
    * the same shape/contract (dense, fixed dim, deterministic). */
  private[pipeline] def featureStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featDim)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      out(i % featDim) += (b * 2654435761L % 1000).toFloat / 1000f
      i += 1
    }
    out
  }

  /** Input/output records for the typed decode kernel. Staying in
    * `Dataset[T]` (instead of `df.rdd` + `Row`) keeps the operator inside
    * Catalyst: the surrounding plan keeps whole-stage codegen and AQE, and
    * rows cross the kernel boundary via encoders, not
    * InternalRow→Row→InternalRow conversions. */
  private[pipeline] final case class MediaIn(
      media_id: Long, payload: Array[Byte], mime: String)
  private[pipeline] final case class MediaDecoded(
      media_id: Long, mime: String, n_bytes: Int, mean_byte: Double,
      width: Option[Int], height: Option[Int], mean_pixel: Option[Double],
      features: Array[Float])

  /** Decode + feature-extract, batched per partition (the shape a real
    * vectorized decoder needs: one kernel init per partition, streaming
    * rows, no driver involvement). Image payloads decode for REAL
    * (true width/height/pixel mean via javax.imageio); anything else
    * gets null image fields plus the byte-level stub summary. */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaIn]
      .mapPartitions { rows =>
        // per-partition kernel init would go here (decoder handles etc.)
        rows.map { m =>
          val (n, mean) = decodeStub(m.payload)
          val img = decodeImage(m.payload)
          MediaDecoded(m.media_id, m.mime, n, mean,
            img.map(_._1), img.map(_._2), img.map(_._3),
            featureStub(m.payload))
        }
      }
      .toDF()
  }

  private[pipeline] final case class MediaResizeIn(
      media_id: Long, payload: Array[Byte], width: Int, height: Int)
  private[pipeline] final case class MediaResized(
      media_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** Resize, batched per partition like [[decodeAndFeaturize]]. Image
    * payloads get REAL nearest-neighbor resampling + PNG re-encode
    * ([[resizeImage]]); non-image payloads fall back to the byte-stride
    * STUB (every factor²-th byte — area scaling — with metadata dims
    * divided), the shape an av-downsampler drops into. */
  def resize(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    val stride = factor * factor
    media.select(col("media_id"), col("payload"),
      coalesce(col("meta.width"), lit(1)).as("width"),
      coalesce(col("meta.height"), lit(1)).as("height"))
      .as[MediaResizeIn]
      .mapPartitions { rows =>
        rows.map { m =>
          resizeImage(m.payload, factor) match {
            case Some((png, nw, nh)) => MediaResized(m.media_id, png, nw, nh)
            case None =>
              // ??? real audio/video downsampler goes here — strided fake.
              val n = m.payload.length
              val out = new Array[Byte](if (n == 0) 0 else (n + stride - 1) / stride)
              var i = 0
              while (i < out.length) { out(i) = m.payload(i * stride); i += 1 }
              MediaResized(m.media_id, out,
                math.max(m.width / factor, 1), math.max(m.height / factor, 1))
          }
        }
      }
      .toDF()
  }

  /** Frame-sampling plumbing for video-like payloads: the payload is cut
    * into fixed-size chunks ("frames"), exploded to one row per frame,
    * and every k-th frame is kept — the exact fan-out pattern a real
    * frame sampler produces, with no driver involvement. */
  def sampleFrames(media: DataFrame, chunkBytes: Int = 64, everyK: Int = 4): DataFrame = {
    val nChunks = greatest(ceil(length(col("payload")).cast("double") / chunkBytes), lit(1L))
    media.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0L), nChunks.cast("long") - 1),
        i => col("payload").substr((i * chunkBytes + 1).cast("int"), lit(chunkBytes))))
        .as(Seq("frame_idx", "frame_bytes")))
      .filter(pmod(col("frame_idx"), lit(everyK)) === 0)
  }
}
