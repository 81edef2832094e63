package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns travelling next to a typed
  * metadata struct. The Spark-side machinery — schema, partition-sized
  * batch processing via `mapPartitions`, deterministic output shapes —
  * is real and tested; the actual codec kernels are STUBBED (this
  * container has no image/audio libraries) behind `decodeStub`, which
  * derives deterministic pseudo-metadata/features from the bytes, so the
  * pipeline shape (schema in → schema out, batch iteration, no
  * driver-side collection) is exactly what a real decoder drops into.
  */
object Multimodal {

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

  /** STUB decode kernel: a real implementation would parse the payload
    * with an image/audio codec. This deterministic fake reads "pixels"
    * as byte statistics so tests can pin exact outputs. */
  private[pipeline] def decodeStub(payload: Array[Byte]): (Int, Double) = {
    // ??? real codec goes here — deterministic fake below.
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
      features: Array[Float])

  /** Decode + feature-extract, batched per partition (the shape a real
    * vectorized decoder needs: one kernel init per partition, streaming
    * rows, no driver involvement). */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaIn]
      .mapPartitions { rows =>
        // per-partition kernel init would go here (decoder handles etc.)
        rows.map { m =>
          val (n, mean) = decodeStub(m.payload)
          MediaDecoded(m.media_id, m.mime, n, mean, featureStub(m.payload))
        }
      }
      .toDF()
  }

  private[pipeline] final case class MediaResizeIn(
      media_id: Long, payload: Array[Byte], width: Int, height: Int)
  private[pipeline] final case class MediaResized(
      media_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** Resize, batched per partition like [[decodeAndFeaturize]]. The STUB
    * kernel keeps every factor²-th byte (area scaling — a factor-2
    * downscale quarters the payload) and divides the metadata dims; a
    * real implementation swaps in a pixel resampler with the identical
    * contract: smaller payload out, scaled dimensions, deterministic. */
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
          // ??? real resampling kernel goes here — strided fake below.
          val n = m.payload.length
          val out = new Array[Byte](if (n == 0) 0 else (n + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = m.payload(i * stride); i += 1 }
          MediaResized(m.media_id, out,
            math.max(m.width / factor, 1), math.max(m.height / factor, 1))
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
