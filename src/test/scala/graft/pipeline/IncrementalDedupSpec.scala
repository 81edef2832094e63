package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted-MinHash-index semantics: an incremental probe must find
  * EXACTLY the pairs the one-shot pipeline finds for the batch, appends
  * must be first-class and idempotent, and parameter drift must fail
  * loudly (a silent hash-family mismatch would "dedup" nothing). */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  // corpus with near-dups INSIDE the base, ACROSS base/batch, and
  // INSIDE the batch — plus unrelated docs on both sides
  private val baseDocs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1L, "completely different content about spark query engines and columnar io"),
    (2L, "rain falls softly on the quiet gray roofs of the old northern town")
  ).toDF("doc_id", "text")

  // planted near-dups sit at trigram-Jaccard ≥ 0.9: with 16 bands of
  // width 4 the band-collision probability is 1-(1-J⁴)¹⁶ ≈ 1-4e-8, so
  // recall assertions are deterministic in practice (a J=0.5 pair would
  // be missed ~36% of the time — below the LSH operating point)
  private val batchDocs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog and runs far away home tonight"), // ~doc 0
    (11L, "a fresh batch document about tensors and optimizers with new words"),
    (12L, "a fresh batch document about tensors and optimizers with new words indeed"), // ~doc 11
    (13L, "nothing here resembles anything else in any corpus at all")
  ).toDF("doc_id", "text")

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Double]("jaccard"))).toSet

  /** One-shot pipeline over the union, restricted to pairs touching the
    * batch — the ground truth every incremental result must equal. */
  private def oneShotBatchPairs(threshold: Double): Set[(Long, Long, Double)] =
    pairSet(Dedup.minhashNearDuplicates(baseDocs.union(batchDocs),
      threshold = threshold, minCollapseDups = Long.MaxValue)
      .filter(col("doc_a") >= 10 || col("doc_b") >= 10))

  test("incremental probe equals the one-shot pipeline pair-for-pair") {
    val dir = tmpDir("mh_probe")
    Dedup.buildMinhashIndex(baseDocs, dir)
    val inc = pairSet(Dedup.dedupAgainstIndex(batchDocs, dir,
      threshold = 0.3))
    assert(inc == oneShotBatchPairs(0.3))
    // and the planted structure is actually exercised: one cross pair,
    // one intra-batch pair
    assert(inc.exists { case (a, b, _) => a == 0L && b == 10L })
    assert(inc.exists { case (a, b, _) => a == 11L && b == 12L })
    assert(!inc.exists { case (a, b, _) => a == 13L || b == 13L })
    // no base-vs-base pair ever leaks into an incremental result
    assert(inc.forall { case (a, b, _) => a >= 10L || b >= 10L })
  }

  test("append makes documents first-class; replay and known ids are no-ops") {
    val dir = tmpDir("mh_append")
    Dedup.buildMinhashIndex(baseDocs, dir)
    Dedup.appendToMinhashIndex(batchDocs, dir)
    val rows = spark.read.parquet(s"$dir/minhash")
    assert(rows.count() == 7)
    // replayed append (a crashed job re-run) adds nothing
    Dedup.appendToMinhashIndex(batchDocs, dir)
    assert(spark.read.parquet(s"$dir/minhash").count() == 7)
    // intra-batch duplicate ids collapse to one row — the unique-id
    // invariant survives a careless batch too
    Dedup.appendToMinhashIndex(Seq(
      (15L, "some document text"), (15L, "some document text"),
      (10L, "already known id")).toDF("doc_id", "text"), dir)
    assert(spark.read.parquet(s"$dir/minhash").count() == 8)
    // a second batch probing the appended index sees base AND batch docs
    val probe2 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog and runs far away home today"),
      (21L, "a fresh batch document about tensors and optimizers with new words also")
    ).toDF("doc_id", "text")
    val got = pairSet(Dedup.dedupAgainstIndex(probe2, dir, threshold = 0.3))
    assert(got.exists { case (a, b, _) => a == 0L && b == 20L }) // built doc
    assert(got.exists { case (a, b, _) => a == 11L && b == 21L }) // appended doc
    // equals the one-shot ground truth over everything, restricted to
    // pairs touching probe2
    val all = baseDocs.union(batchDocs).union(probe2)
    val truth = pairSet(Dedup.minhashNearDuplicates(all, threshold = 0.3,
      minCollapseDups = Long.MaxValue)
      .filter(col("doc_a") >= 20 || col("doc_b") >= 20))
    assert(got == truth)
  }

  test("append-then-probe equals build-over-union") {
    val dirA = tmpDir("mh_app_a"); val dirB = tmpDir("mh_app_b")
    Dedup.buildMinhashIndex(baseDocs, dirA)
    Dedup.appendToMinhashIndex(batchDocs, dirA)
    Dedup.buildMinhashIndex(baseDocs.union(batchDocs), dirB)
    val probe = Seq(
      (30L, "the quick brown fox jumps over the lazy dog and runs far away now")
    ).toDF("doc_id", "text")
    assert(pairSet(Dedup.dedupAgainstIndex(probe, dirA, threshold = 0.3)) ==
      pairSet(Dedup.dedupAgainstIndex(probe, dirB, threshold = 0.3)))
  }

  test("compaction: fewer files, identical probe pairs, crash-swap heals") {
    val dir = tmpDir("mh_compact")
    Dedup.buildMinhashIndex(baseDocs, dir)
    // a long-running ingest: one small file set per appended batch
    (0 until 5).foreach { i =>
      Dedup.appendToMinhashIndex(Seq(
        (100L + i, s"append batch number $i with its own distinct words $i")
      ).toDF("doc_id", "text"), dir)
    }
    def files(): Seq[String] = new java.io.File(s"$dir/minhash").list()
      .toSeq.filterNot(n => n.startsWith("_") || n.startsWith("."))
    val probe = Seq(
      (200L, "the quick brown fox jumps over the lazy dog and runs far away"),
      (201L, "append batch number 3 with its own distinct words 3 again")
    ).toDF("doc_id", "text")
    val before = pairSet(Dedup.dedupAgainstIndex(probe, dir, threshold = 0.3))
    assert(before.exists { case (a, b, _) => a == 0L && b == 200L })
    assert(before.exists { case (a, b, _) => a == 103L && b == 201L })
    val nBefore = files().size
    val (fb, fa) = Dedup.compactMinhashIndex(spark, dir)
    assert(fb == nBefore && fa == files().size)
    assert(fa < fb, s"compaction must shrink the file count ($fb -> $fa)")
    assert(fa == 1) // 8 rows, one sorted run
    // pair-identical probes over the compacted index
    assert(pairSet(Dedup.dedupAgainstIndex(probe, dir, threshold = 0.3))
      == before)
    // replay is a no-op rewrite, never a corruption
    Dedup.compactMinhashIndex(spark, dir)
    assert(pairSet(Dedup.dedupAgainstIndex(probe, dir, threshold = 0.3))
      == before)

    // crash between the two swap moves: live moved away, committed
    // scratch pending — the next probe must roll the swap forward
    val fs = graft.io.SidecarFs
    spark.read.parquet(s"$dir/minhash").write
      .mode("overwrite").parquet(s"$dir/minhash__compact")
    assert(fs.moveQuiet(s"$dir/minhash", s"$dir/minhash__old"))
    assert(pairSet(Dedup.dedupAgainstIndex(probe, dir, threshold = 0.3))
      == before)
    assert(fs.isDirectory(s"$dir/minhash"))
    assert(!fs.isDirectory(s"$dir/minhash__old") &&
      !fs.isDirectory(s"$dir/minhash__compact"))

    // crash before the swap began: live intact, incomplete scratch
    // (no _SUCCESS) — scratch is dropped, probes unaffected
    fs.mkdirs(s"$dir/minhash__compact")
    assert(pairSet(Dedup.dedupAgainstIndex(probe, dir, threshold = 0.3))
      == before)
    assert(!fs.isDirectory(s"$dir/minhash__compact"))
  }

  test("probing a missing or half-built index fails loudly") {
    val none = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(batchDocs, tmpDir("mh_missing"))
    }
    assert(none.getMessage.contains("buildMinhashIndex"))
    // a crash mid-build leaves parquet but no params sidecar: refused
    val half = tmpDir("mh_half")
    baseDocs.limit(1).select(col("doc_id"), array(lit(1L)).as("shset"),
      array(lit(2L)).as("sig")).write.parquet(s"$half/minhash")
    intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(batchDocs, half)
    }
  }

  test("band count must divide the indexed signature length") {
    val dir = tmpDir("mh_bands")
    Dedup.buildMinhashIndex(baseDocs, dir, k = 64)
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(batchDocs, dir, bands = 7)
    }
    assert(e.getMessage.contains("divide"))
  }

  test("probe after a crashed append replays the first attempt's pairs") {
    // crash contract: a microbatch that appended itself but lost its
    // emission must, on replay, compute the SAME pairs — the batch's
    // own index copies are excluded from the probe's index side
    val dir = tmpDir("mh_replay")
    Dedup.buildMinhashIndex(baseDocs, dir)
    val first = pairSet(Dedup.dedupAgainstIndex(batchDocs, dir,
      threshold = 0.3))
    Dedup.appendToMinhashIndex(batchDocs, dir) // crash before emit ack
    val replay = pairSet(Dedup.dedupAgainstIndex(batchDocs, dir,
      threshold = 0.3))
    assert(replay == first)
  }

  test("streamingIngestDedup across a RESTART equals the one-shot pipeline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("mh_stream")
    val ckpt = tmpDir("mh_stream_ckpt")
    val emitted = scala.collection.mutable.ListBuffer[(Long, Long, Double)]()
    val source = MemoryStream[(Long, String)]
    def runOnce(): Unit =
      Dedup.streamingIngestDedup(
        source.toDF().toDF("doc_id", "text"), dir, threshold = 0.3) {
        pairs =>
          emitted ++= pairs.collect().map(r => (r.getAs[Long]("doc_a"),
            r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
      }.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    source.addData(baseDocs.as[(Long, String)].collect().toSeq: _*)
    runOnce() // first run ingests the base corpus, then terminates
    source.addData(batchDocs.as[(Long, String)].collect().toSeq: _*)
    runOnce() // restarted query resumes from the checkpoint
    // the restarted run found batch 2's cross-run pair (0, 10) against
    // the DURABLE index the first run left behind — and the union over
    // both runs equals the one-shot pipeline over everything
    val truth = pairSet(Dedup.minhashNearDuplicates(
      baseDocs.union(batchDocs), threshold = 0.3,
      minCollapseDups = Long.MaxValue))
    assert(emitted.toSet == truth)
    assert(emitted.exists { case (a, b, _) => a == 0L && b == 10L })
  }

  test("fuzz: random corpora under random microbatchings equal the one-shot " +
      "pipeline (with replayed appends injected)") {
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(): String =
      Seq.fill(6 + rnd.nextInt(10))(words(rnd.nextInt(words.length)))
        .mkString(" ")
    for (round <- 0 until 3) {
      // clustered corpus: some docs mutated copies of earlier ones, so
      // above-threshold pairs exist at every batch boundary
      val texts = scala.collection.mutable.ArrayBuffer[String]()
      for (i <- 0 until 40) {
        if (i > 0 && rnd.nextDouble() < 0.4) {
          val base = texts(rnd.nextInt(texts.length)).split(" ")
          texts += (base :+ words(rnd.nextInt(words.length))).mkString(" ")
        } else texts += doc()
      }
      val corpus = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
      val truth = pairSet(Dedup.minhashNearDuplicates(corpus,
        threshold = 0.5, minCollapseDups = Long.MaxValue))
      // random contiguous microbatching of the same corpus
      val cuts = (0 +: Seq.fill(2 + rnd.nextInt(3))(rnd.nextInt(40)) :+ 40)
        .distinct.sorted
      val dir = tmpDir(s"mh_fuzz$round")
      Dedup.buildMinhashIndex(corpus.limit(0), dir)
      val emitted = scala.collection.mutable.Set[(Long, Long, Double)]()
      cuts.sliding(2).foreach { case Seq(lo, hi) =>
        val batch = corpus.where(col("doc_id") >= lo && col("doc_id") < hi)
        val first = pairSet(Dedup.dedupAgainstIndex(batch, dir,
          threshold = 0.5))
        emitted ++= first
        Dedup.appendToMinhashIndex(batch, dir)
        if (rnd.nextBoolean()) { // crashed-append replay: must re-emit
          val replay = pairSet(Dedup.dedupAgainstIndex(batch, dir,
            threshold = 0.5))
          Dedup.appendToMinhashIndex(batch, dir)
          assert(replay == first, s"round $round: replay diverged")
        }
      }
      assert(emitted == truth,
        s"round $round cuts $cuts: incremental ${emitted.size} pairs vs " +
          s"one-shot ${truth.size}")
    }
  }

  test("in-place rebuild with a different hash family stays self-consistent") {
    val dir = tmpDir("mh_rebuild")
    Dedup.buildMinhashIndex(baseDocs, dir, k = 64)
    Dedup.buildMinhashIndex(baseDocs, dir, k = 32) // rebuild, new family
    // probe bands with the REBUILT k read from the sidecar, so matches
    // still surface; stored signatures are 32 wide
    val got = pairSet(Dedup.dedupAgainstIndex(batchDocs, dir,
      bands = 16, threshold = 0.3))
    assert(got.exists { case (a, b, _) => a == 0L && b == 10L })
    assert(spark.read.parquet(s"$dir/minhash")
      .select(size(col("sig"))).head().getInt(0) == 32)
  }

  test("id-column drift between build and probe is refused") {
    val dir = tmpDir("mh_idcol")
    Dedup.buildMinhashIndex(baseDocs, dir)
    intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(
        batchDocs.withColumnRenamed("doc_id", "id"), dir, idCol = "id")
    }
    intercept[IllegalArgumentException] {
      Dedup.appendToMinhashIndex(
        batchDocs.withColumnRenamed("doc_id", "id"), dir, idCol = "id")
    }
  }
}
