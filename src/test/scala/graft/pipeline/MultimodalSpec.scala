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

  test("real audio decode: WAV payloads yield true rate, frame count, and RMS") {
    // pin a known clip directly through the kernel: regenerate the same
    // LCG sample stream the synthesizer wrote and compute RMS from it
    val wav = Multimodal.syntheticWav(seed = 7L, sampleRate = 8000, nFrames = 100)
    val expSamples = {
      var x = 7L
      (0 until 100).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 48).toShort
      }
    }
    val expRms = math.sqrt(
      expSamples.map(s => (s / 32768.0) * (s / 32768.0)).sum / 100)
    val st = Multimodal.decodeAudio(wav).get
    assert(st.sampleRate === 8000)
    assert(st.channels === 1)
    assert(st.nFrames === 100L)
    assert(st.rms === expRms) // same doubles, same order — bit-exact

    // end-to-end through the DataFrame path on real WAV payloads
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val audio = Multimodal.syntheticAudioTable(docs)
    val out = Multimodal.decodeAndFeaturize(audio).orderBy("media_id").collect()
    val metas = audio.select("media_id", "meta.sample_rate", "meta.n_frames")
      .orderBy("media_id").collect()
    out.zip(metas).foreach { case (r, m) =>
      assert(r.getAs[String]("mime") === "audio/wav")
      // decoded rate/frames are the codec's truth = the declared meta
      assert(r.getAs[Int]("sample_rate") === m.getInt(1))
      assert(r.getAs[Long]("n_samples") === m.getInt(2).toLong)
      val rms = r.getAs[Double]("rms")
      assert(rms > 0.0 && rms <= 1.0)
      // audio rows carry no image fields
      assert(r.isNullAt(r.fieldIndex("width")))
    }
  }

  test("real audio downsample: decimated samples, halved rate, decodable output") {
    val wav = Multimodal.syntheticWav(seed = 42L, sampleRate = 16000, nFrames = 101)
    val (down, rate, frames) = Multimodal.downsampleAudio(wav, factor = 2).get
    assert(rate === 8000)
    assert(frames === 51L) // ceil(101 / 2)
    // the produced bytes are a REAL decodable WAV with the same facts
    val st = Multimodal.decodeAudio(down).get
    assert(st.sampleRate === 8000 && st.nFrames === 51L)
    // decimation contract: output sample k IS input sample 2k
    def pcm16le(payload: Array[Byte]): IndexedSeq[Short] = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val b = ais.readAllBytes(); ais.close()
      (0 until b.length / 2).map(i =>
        (((b(2 * i + 1) << 8) | (b(2 * i) & 0xff)).toShort))
    }
    val orig = pcm16le(wav)
    val dec = pcm16le(down)
    assert(dec === (0 until 51).map(k => orig(2 * k)))

    // end-to-end: every clip survives the resample round-trip
    val docs = Seq((1L, "gamma"), (2L, "delta")).toDF("doc_id", "text")
    val audio = Multimodal.syntheticAudioTable(docs)
    val res = Multimodal.resampleAudio(audio, factor = 2)
      .orderBy("media_id").collect()
    val metas = audio.select("media_id", "meta.sample_rate", "meta.n_frames")
      .orderBy("media_id").collect()
    assert(res.length === 2)
    res.zip(metas).foreach { case (r, m) =>
      assert(r.getAs[Int]("sample_rate") === m.getInt(1) / 2)
      assert(r.getAs[Long]("n_samples") === (m.getInt(2) + 1) / 2)
    }
  }

  test("image and audio decoders are mutually immune") {
    val png = Multimodal.syntheticPng(seed = 3L, w = 5, h = 5)
    val wav = Multimodal.syntheticWav(seed = 3L, sampleRate = 8000, nFrames = 10)
    assert(Multimodal.decodeAudio(png).isEmpty)
    assert(Multimodal.decodeImage(wav).isEmpty)
    assert(Multimodal.decodeStub("plain text".getBytes("UTF-8"))._1 === 10)
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
