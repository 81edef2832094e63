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
  * AUDIO decode/downsample is REAL (`javax.sound.sampled`, in the JDK:
  * WAV/AIFF/AU 16-bit PCM): true sample rate, frame count, RMS
  * amplitude, and frame-decimation resampling with WAV re-encode.
  * VIDEO decode is formally OUT OF SCOPE (no video codec exists in the
  * JDK or this container; see SURVEY §2.12): video payloads keep the
  * typed-batch interface as the contract — `decodeStub` derives
  * deterministic byte statistics with the same schema, and
  * [[sampleFrames]] exercises the real frame fan-out plumbing — so a
  * codec kernel drops in without touching any Spark-side code.
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

  // ── real audio kernels (javax.sound.sampled — in the JDK) ──────────────

  /** Decoded-audio summary: the codec's truth about a payload. */
  private[pipeline] final case class AudioStats(sampleRate: Int,
      channels: Int, nFrames: Long, rms: Double)

  /** Decode an audio payload (WAV/AIFF/AU via the JDK's
    * javax.sound.sampled): sample rate, channel count, frame count, and
    * RMS amplitude over all channels normalized to [0,1]. Restricted to
    * 16-bit signed PCM — the canonical interchange encoding — so the
    * sample arithmetic is exact; anything else returns None and falls
    * through to the byte-level stub. */
  private[pipeline] def decodeAudio(payload: Array[Byte]): Option[AudioStats] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val frameSize = fmt.getFrameSize
          val nFrames = bytes.length / frameSize
          val samples = nFrames.toLong * fmt.getChannels
          var sumSq = 0.0
          var i = 0
          val end = nFrames * frameSize
          while (i + 1 < end) {
            val s =
              if (fmt.isBigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            val x = s / 32768.0
            sumSq += x * x
            i += 2
          }
          Some(AudioStats(fmt.getSampleRate.toInt, fmt.getChannels,
            nFrames.toLong, if (samples == 0) 0.0 else math.sqrt(sumSq / samples)))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Downsample 16-bit PCM audio by frame decimation (keep every
    * `factor`-th frame, all channels; new rate = rate/factor) and
    * re-encode as WAV. Decimation — not interpolation — so every output
    * sample is an exact input sample, the deterministic contract the
    * gate pins. None when the payload is not decodable 16-bit PCM. */
  private[pipeline] def downsampleAudio(payload: Array[Byte], factor: Int)
      : Option[(Array[Byte], Int, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getSampleRate / factor < 1f) None
        else {
          val bytes = ais.readAllBytes()
          val fs = fmt.getFrameSize
          val nFrames = bytes.length / fs
          val outFrames = if (nFrames == 0) 0 else (nFrames + factor - 1) / factor
          val out = new Array[Byte](outFrames * fs)
          var f = 0
          while (f < outFrames) {
            System.arraycopy(bytes, f * factor * fs, out, f * fs, fs)
            f += 1
          }
          val ofmt = new javax.sound.sampled.AudioFormat(
            fmt.getSampleRate / factor, 16, fmt.getChannels, true, fmt.isBigEndian)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(out), ofmt, outFrames.toLong),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Some((bos.toByteArray, (fmt.getSampleRate / factor).toInt, outFrames.toLong))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Deterministic 16-bit mono PCM WAV for a seed — REAL audio bytes for
    * the decode path without external fixtures (an LCG fills the sample
    * stream, the JDK encodes the RIFF/WAVE container). */
  private[pipeline] def syntheticWav(seed: Long, sampleRate: Int,
      nFrames: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var x = seed
    var i = 0
    while (i < nFrames) {
      x = x * 6364136223846793005L + 1442695040888963407L
      val s = (x >>> 48).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private[pipeline] final case class AudioGen(media_id: Long, seed: Long,
      rate: Int, frames: Int)
  private[pipeline] final case class AudioRow(media_id: Long,
      payload: Array[Byte], mime: String, rate: Int, frames: Int)

  /** Media table with REAL WAV payloads, one deterministic clip per
    * corpus row (rate/length derived from the text hash). Exercises the
    * true audio decode path end-to-end, as distributed map work. */
  def syntheticAudioTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("media_id"), xxhash64(col(textCol)).as("seed"),
        (pmod(xxhash64(col(textCol), lit(2)), lit(5)).cast("int") * 2000 + 8000)
          .as("rate"),
        (pmod(xxhash64(col(textCol), lit(3)), lit(200)) + 50).cast("int")
          .as("frames"))
      .as[AudioGen]
      .mapPartitions(_.map(g =>
        AudioRow(g.media_id, syntheticWav(g.seed, g.rate, g.frames),
          "audio/wav", g.rate, g.frames)))
      .toDF()
      .select(col("media_id"), col("payload"),
        struct(col("mime"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          col("frames").as("n_frames"),
          col("rate").as("sample_rate")).as("meta"))
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

  /** STUB byte-level kernel for VIDEO-like payloads (out of scope — no
    * video codec in the JDK or this container): deterministic byte
    * statistics with the same shape a real decoder's summary would
    * have. Image and audio payloads never rely on this —
    * [[decodeImage]] / [[decodeAudio]] handle them for real. */
  private[pipeline] def decodeStub(payload: Array[Byte]): (Int, Double) = {
    // ??? a video codec kernel would go here — deterministic fake below.
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
      sample_rate: Option[Int], n_samples: Option[Long], rms: Option[Double],
      features: Array[Float])

  /** Decode + feature-extract, batched per partition (the shape a real
    * vectorized decoder needs: one kernel init per partition, streaming
    * rows, no driver involvement). Image payloads decode for REAL
    * (true width/height/pixel mean via javax.imageio); audio payloads
    * decode for REAL (true rate/frames/RMS via javax.sound.sampled);
    * anything else gets null media fields plus the byte-level stub
    * summary. */
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
          val au = if (img.isEmpty) decodeAudio(m.payload) else None
          MediaDecoded(m.media_id, m.mime, n, mean,
            img.map(_._1), img.map(_._2), img.map(_._3),
            au.map(_.sampleRate), au.map(_.nFrames), au.map(_.rms),
            featureStub(m.payload))
        }
      }
      .toDF()
  }

  private[pipeline] final case class AudioResampled(media_id: Long,
      payload: Array[Byte], sample_rate: Int, n_samples: Long)

  /** Downsample audio payloads by frame decimation (see
    * [[downsampleAudio]]), batched per partition like
    * [[decodeAndFeaturize]]. The emitted rate/frame columns are taken by
    * RE-DECODING the produced WAV — the codec's truth, not the
    * encoder's intent — so a round-trip break surfaces as a dropped or
    * mismatched row, never as silently wrong metadata. Non-audio
    * payloads are dropped. */
  def resampleAudio(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaIn]
      .mapPartitions(_.flatMap { m =>
        downsampleAudio(m.payload, factor).flatMap { case (wav, _, _) =>
          decodeAudio(wav).map(st =>
            AudioResampled(m.media_id, wav, st.sampleRate, st.nFrames))
        }
      })
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
              // ??? a video downsampler would go here (out of scope; audio
              // uses the real resampleAudio path) — strided fake below.
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
