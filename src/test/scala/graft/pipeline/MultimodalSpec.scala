package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the multimodal plumbing: typed decode/featurize kernel semantics
  * (including the raw `features array<float>` column the driver's
  * rows-only check can't hash) and the frame-sampling fan-out shape.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = {
    val docs = Seq(
      (1L, "hello world"),
      (2L, ""),
      (3L, "a" * 300)).toDF("doc_id", "text")
    Multimodal.syntheticMediaTable(docs)
  }

  test("decodeAndFeaturize matches the stub kernels row-for-row, raw arrays included") {
    val out = Multimodal.decodeAndFeaturize(media).orderBy("media_id").collect()
    assert(out.length === 3)

    val byId = out.map(r => r.getAs[Long]("media_id") -> r).toMap
    val texts = Map(1L -> "hello world", 2L -> "", 3L -> "a" * 300)
    for ((id, text) <- texts) {
      val payload = text.getBytes("UTF-8")
      val r = byId(id)
      assert(r.getAs[Int]("n_bytes") === payload.length)
      val expMean = if (payload.isEmpty) 0.0
        else payload.map(_ & 0xff).map(_.toLong).sum.toDouble / payload.length
      assert(r.getAs[Double]("mean_byte") === expMean)
      assert(r.getAs[String]("mime") === "image/stub")
      val feats = r.getSeq[Float](r.fieldIndex("features"))
      assert(feats.length === 8)
      assert(feats === Multimodal.featureStub(payload).toSeq)
    }
  }

  test("decodeAndFeaturize stays a typed Dataset plan (no RDD scan barrier)") {
    // The typed mapPartitions shows up as SerializeFromObject/MapPartitions/
    // DeserializeToObject — not as an ExistingRDD/LogicalRDD scan, which is
    // what the old df.rdd roundtrip produced (losing codegen + AQE above it).
    val plan = Multimodal.decodeAndFeaturize(media).queryExecution.optimizedPlan
    val rendered = plan.toString
    assert(!rendered.contains("LogicalRDD"), s"plan dropped to RDD:\n$rendered")
    assert(rendered.contains("MapPartitions"), s"expected typed MapPartitions:\n$rendered")
  }

  test("resize strides the payload by factor² and halves the dims") {
    val out = Multimodal.resize(media, factor = 2).orderBy("media_id")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val meta = media.select("media_id", "meta.width", "meta.height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val texts = Map(1L -> "hello world", 2L -> "", 3L -> "a" * 300)
    for ((id, text) <- texts) {
      val payload = text.getBytes("UTF-8")
      val r = out(id)
      val got = r.getAs[Array[Byte]]("payload")
      assert(got.length === (if (payload.isEmpty) 0 else (payload.length + 3) / 4))
      assert(got.toSeq === payload.indices.collect {
        case i if i % 4 == 0 => payload(i) }.toSeq)
      val (w, h) = meta(id)
      assert(r.getAs[Int]("width") === math.max(w / 2, 1))
      assert(r.getAs[Int]("height") === math.max(h / 2, 1))
    }
  }

  test("sampleFrames keeps every k-th fixed-size chunk") {
    val out = Multimodal.sampleFrames(media, chunkBytes = 4, everyK = 2)
      .orderBy("media_id", "frame_idx").collect()
    // doc 1: 11 bytes -> 3 chunks (0,1,2) -> keep 0,2
    val doc1 = out.filter(_.getAs[Long]("media_id") == 1L)
    assert(doc1.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2))
    assert(new String(doc1(0).getAs[Array[Byte]]("frame_bytes"), "UTF-8") === "hell")
    // empty payload still yields one (empty) frame row at idx 0
    val doc2 = out.filter(_.getAs[Long]("media_id") == 2L)
    assert(doc2.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0))
  }

  test("real image decode: PNG payloads yield true dimensions and pixel mean") {
    // pin a known image directly through the kernel
    val png = Multimodal.syntheticPng(seed = 7L, w = 8, h = 6)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 8 && img.getHeight === 6)
    val expMean = {
      var s = 0L
      for (j <- 0 until 6; i <- 0 until 8) {
        val rgb = img.getRGB(i, j)
        s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }
      s.toDouble / (8L * 6 * 3)
    }
    assert(Multimodal.decodeImage(png) === Some((8, 6, expMean)))

    // and end-to-end through the DataFrame path on real PNG payloads
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val out = Multimodal.decodeAndFeaturize(
      Multimodal.syntheticImageTable(docs)).orderBy("media_id").collect()
    val metas = Multimodal.syntheticImageTable(docs)
      .select("media_id", "meta.width", "meta.height").orderBy("media_id")
      .collect()
    out.zip(metas).foreach { case (r, m) =>
      assert(r.getAs[String]("mime") === "image/png")
      // decoded dims are the codec's truth and must equal the declared meta
      assert(r.getAs[Int]("width") === m.getInt(1))
      assert(r.getAs[Int]("height") === m.getInt(2))
      val mp = r.getAs[Double]("mean_pixel")
      assert(mp >= 0.0 && mp <= 255.0)
    }
  }

  test("real image resize: nearest-neighbor pixels, scaled dims, decodable output") {
    val docs = Seq((1L, "gamma")).toDF("doc_id", "text")
    val imgs = Multimodal.syntheticImageTable(docs)
    val orig = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      imgs.select("payload").head().getAs[Array[Byte]](0)))
    val r = Multimodal.resize(imgs, factor = 2).head()
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
    assert(resized.getWidth === math.max(orig.getWidth / 2, 1))
    assert(resized.getHeight === math.max(orig.getHeight / 2, 1))
    assert(r.getAs[Int]("width") === resized.getWidth)
    assert(r.getAs[Int]("height") === resized.getHeight)
    // nearest-neighbor: every output pixel is an exact input pixel
    for (j <- 0 until resized.getHeight; i <- 0 until resized.getWidth) {
      assert((resized.getRGB(i, j) & 0xffffff) ===
        (orig.getRGB(i * 2, j * 2) & 0xffffff))
    }
  }

  test("non-image payloads fall back to the av stub with null image fields") {
    val out = Multimodal.decodeAndFeaturize(media).orderBy("media_id").collect()
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("width")))
      assert(r.isNullAt(r.fieldIndex("height")))
      assert(r.isNullAt(r.fieldIndex("mean_pixel")))
    }
  }
}
