package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the dedup family on planted duplicates (the corpus
  * itself has none at sf0.001, so the pipeline's recall is pinned with
  * synthetic near-dups). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home tonight"), // near-dup of 0
    (2L, "completely different content about spark query engines and columnar io"),
    (3L, "the quick brown fox jumps over the lazy dog and runs far away home"), // exact dup of 0
    (4L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exactDedup collapses exact duplicates only") {
    val d = Dedup.exactDedup(base).collect()
    assert(d.length == 4) // 5 docs, one exact-dup pair
    val dup = d.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("dropExactDuplicates keeps first occurrence") {
    val kept = Dedup.dropExactDuplicates(base).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.sameElements(Array(0L, 1L, 2L, 4L)))
  }

  test("minhash near-dup finds the planted near-duplicate pair") {
    val pairs = Dedup.minhashNearDuplicates(base, k = 64, bands = 16,
      shingle = 3, threshold = 0.5).collect()
    val keys = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(keys.contains((0L, 1L)) || keys.contains((0L, 3L)))
    // exact duplicates always collide with jaccard 1.0
    val exact = pairs.find(r => r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 3L)
    assert(exact.exists(_.getAs[Double]("jaccard") == 1.0))
    // the unrelated document never pairs with anything
    assert(!pairs.exists(r => r.getAs[Long]("doc_a") == 2L || r.getAs[Long]("doc_b") == 2L))
  }

  test("exact-dup collapse path equals the direct LSH path pair-for-pair") {
    // a cliquey corpus: 3 exact-duplicate cliques (sizes 4, 3, 2) of
    // mutually near-dup texts, plus unrelated docs — the collapsed
    // pipeline (representatives + algebraic expansion) must reproduce
    // EXACTLY what direct LSH over all documents finds, jaccard doubles
    // included
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "the quick brown fox jumps over the lazy dog again and once"
    val t3 = "the quick brown fox leaps over the lazy dog again and again"
    val docs = (
      (0 until 4).map(i => (10L + i, t1)) ++
      (0 until 3).map(i => (20L + i, t2)) ++
      (0 until 2).map(i => (30L + i, t3)) ++
      Seq((40L, "completely unrelated text about databases and storage"),
        (41L, "another singleton document with its own words entirely"))
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val direct = norm(Dedup.minhashNearDuplicates(docs, threshold = 0.5,
      minCollapseDups = Long.MaxValue))
    val collapsed = norm(Dedup.minhashNearDuplicates(docs, threshold = 0.5,
      minCollapseDups = 1L))
    assert(collapsed === direct)
    // sanity: the cliques actually produced intra- and cross-group pairs
    assert(direct.exists { case (a, b, j) => a == 10L && b == 11L && j == 1.0 })
    assert(direct.exists { case (a, b, _) => a < 20L && b >= 20L })
    assert(!direct.exists { case (a, b, _) => a >= 40L || b >= 40L })
  }

  test("duplication probe is memoized per corpus; cached path is pair-identical") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi rho")).toDF("doc_id", "text")
    Dedup.probeCache.clear()
    def run() = Dedup.minhashNearDuplicates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val first = run()
    assert(Dedup.probeCache.size === 1, "probe result cached after first run")
    val cachedDups = Dedup.probeCache.values().iterator().next()
    assert(cachedDups === 1L) // one duplicate copy in the corpus
    val second = run() // probe skipped (same canonical plan), same pairs
    assert(Dedup.probeCache.size === 1)
    assert(second === first)
  }

  test("streaming near-dup equals batch pair-for-pair across micro-batch splits") {
    // real documents (sf0.001) fed in three arbitrary chunks: pairs whose
    // members arrive in DIFFERENT micro-batches must still surface (the
    // state store is the LSH index), plus planted cross-batch near- and
    // exact-dups, plus a replayed doc id (must not re-pair or self-pair)
    val corpus = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val planted = Seq(
      (900001L, "planted aurora borealis crossing the winter sky over quiet fjords tonight"),
      (900002L, "planted aurora borealis crossing the winter sky over quiet fjords today"), // near-dup of 900001
      (900003L, "planted aurora borealis crossing the winter sky over quiet fjords tonight")) // exact dup of 900001
    val all = corpus ++ planted
    val chunks = Seq(
      all.take(all.length / 3) :+ planted(0),
      all.slice(all.length / 3, 2 * all.length / 3) :+ planted(1),
      all.drop(2 * all.length / 3)) // tail re-delivers 900001/900002 and first-delivers 900003

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = Dedup.streamingNearDupPairs(mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("sdd8")
      .outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("sdd8").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // no self-pairs, no duplicate pairs despite 16 bands + replay
    assert(streamed.forall { case (a, b, _) => a < b })
    assert(streamed.map(p => (p._1, p._2)).distinct.length === streamed.length)

    val allDf = all.toSeq.toDF("doc_id", "text")
    val batch = Dedup.minhashNearDuplicates(allDf, minCollapseDups = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSet === batch.toSet) // bit-for-bit, jaccard included

    // the planted cross-batch pairs specifically
    val keys = streamed.map(p => (p._1, p._2)).toSet
    assert(keys.contains((900001L, 900002L)), "near-dup split across batches")
    assert(keys.contains((900001L, 900003L)), "exact dup split across batches")
    assert(streamed.find(p => p._1 == 900001L && p._2 == 900003L).get._3 === 1.0)
  }

  test("streaming near-dup horizon mode evicts state past the watermark") {
    // bounded-state deployment shape: dedup against a 10-minute sliding
    // horizon. A near-dup arriving after its twin left the horizon must
    // NOT pair (it would in unbounded mode) — that non-pair is the
    // eviction observable, since state internals aren't readable.
    def ts(min: Long) = new java.sql.Timestamp(1767225600000L + min * 60000L)
    def near(last: String) =
      s"orchid meadow sunrise over the eastern ridge with scattered morning $last"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = Dedup.streamingNearDupPairs(
      mem.toDF().toDF("doc_id", "text", "ts"),
      eventTimeCol = Some("ts"), horizonMs = 10L * 60000L)
    val q = out.writeStream.format("memory").queryName("sdd8_horizon")
      .outputMode("append").start()
    try {
      Seq(
        Seq((1L, near("fog"), ts(0))),   // wm after: t0
        Seq((2L, near("dew"), ts(5))),   // in horizon of 1 → pair (1,2)
        Seq((3L, "unrelated filler content about columnar shuffle services", ts(60))),
        Seq((4L, near("mist"), ts(61))), // wm t0+60: 1,2 evicted → NO pair
        Seq((5L, near("rain"), ts(62)))  // 4 still in horizon → pair (4,5)
      ).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("sdd8_horizon").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (4L, 5L)))
    // the same four docs batched (no horizon) pair across the gap — so
    // the missing (1,4)/(1,5)/(2,4)/(2,5) above is eviction at work,
    // not LSH recall
    val all = Seq((1L, near("fog")), (2L, near("dew")), (4L, near("mist")),
      (5L, near("rain"))).toDF("doc_id", "text")
    val unbounded = Dedup.minhashNearDuplicates(all, minCollapseDups = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unbounded.contains((1L, 4L)) && unbounded.contains((2L, 5L)))
    assert(got.subsetOf(unbounded))
  }

  test("dedup-on-ingest: a kv change feed composes into streaming near-dup") {
    // the storage engine's streaming source feeding the pipeline
    // operator: documents land in a graftkv table commit by commit and
    // near-dup pairs surface per micro-batch — dedup AT INGEST, no
    // separate batch pass. (Upsert caveat: a revised doc re-indexes
    // under its new content; superseded content stays indexed, which is
    // the conservative choice for training-data dedup.)
    import graft.connector.KvCommands
    def near(last: String) =
      s"velvet canyon river bends beneath the painted mesa after the first $last"
    val path = java.nio.file.Files.createTempDirectory("graft_dd_ingest")
      .toString + "/t"
    KvCommands.createTable(Seq((1L, near("rain"))).toDF("doc_id", "text"),
      path, Seq("doc_id"))
    val feed = spark.readStream.format("graftkv").load(path)
    val q = Dedup.streamingNearDupPairs(feed).writeStream.format("memory")
      .queryName("dd_ingest").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dd_ingest_ckpt").toString)
      .start()
    try {
      def pairs(): Set[(Long, Long)] = {
        q.processAllAvailable()
        spark.table("dd_ingest").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(pairs() === Set.empty) // snapshot: one doc, nothing to pair
      KvCommands.append(Seq((2L, near("snow")),
        (3L, "wholly unrelated text about shuffle partition sizing"))
        .toDF("doc_id", "text"), path)
      assert(pairs() === Set((1L, 2L)))
      KvCommands.append(Seq((4L, near("thaw"))).toDF("doc_id", "text"), path)
      assert(pairs() === Set((1L, 2L), (1L, 4L), (2L, 4L)))
      // a delete emits nothing on the change feed → no new pairs
      KvCommands.delete(spark, path, col("doc_id") === 3L)
      assert(pairs() === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    } finally q.stop()
  }

  test("streaming near-dup runs on the RocksDB state store provider") {
    // the provider a large-state deployment uses (bucket history doesn't
    // fit an in-memory HDFS-backed map at 100 TB): pins that the state
    // schema round-trips through RocksDB, not just the default provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val out = Dedup.streamingNearDupPairs(mem.toDF().toDF("doc_id", "text"))
      val q = out.writeStream.format("memory").queryName("sdd8_rocks")
        .outputMode("append").start()
      try {
        mem.addData(Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")))
        q.processAllAvailable()
        mem.addData(Seq((2L, "alpha beta gamma delta epsilon zeta eta theta iota")))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("sdd8_rocks").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet === Set((1L, 2L))) // cross-batch pair through RocksDB
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("nearDupClusters labels connected components; dropNearDuplicates keeps canonicals") {
    val pairs = Seq(
      (1L, 2L, 0.9), (2L, 3L, 0.8), // chain 1-2-3 → cluster 1
      (5L, 6L, 0.95)                // pair 5-6 → cluster 5
    ).toDF("doc_a", "doc_b", "jaccard")
    val clusters = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))

    val docs = Seq((1L, "a"), (2L, "a2"), (3L, "a3"), (4L, "solo"),
      (5L, "b"), (6L, "b2")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, pairs).collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L)) // one canonical per cluster + singleton
  }

  test("nearDupClusters converges on a chain far deeper than maxIters " +
      "(pointer jumping is O(log diameter))") {
    // a 60-hop duplicate chain (template-heavy corpus shape): one-hop
    // propagation needs 60 rounds; the default maxIters=20 must still
    // converge because each round also follows the label chain
    val chain = (0L until 60L).map(i => (i, i + 1, 0.9))
      .toDF("doc_a", "doc_b", "jaccard")
    val clusters = Dedup.nearDupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == 61 && clusters.values.forall(_ == 0L))
  }

  test("simhash: exact dup has distance 0, near-dup is close, unrelated far") {
    val sh = Dedup.simhash64(base).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) == sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(2L)))
    val nd = Dedup.simhashNearDuplicates(base, maxDist = 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(nd.contains((0L, 3L)))
  }

  test("jaccardVerify computes exact n-gram jaccard") {
    val pairs = Seq((0L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.jaccardVerify(base, pairs, threshold = 0.0).collect()
    assert(out.length == 1 && out.head.getAs[Double]("jaccard") == 1.0)
  }

  // ── substring-level dedup ───────────────────────────────────────────────

  private def substrResult(docs: org.apache.spark.sql.DataFrame, w: Int) =
    Dedup.dedupSubstrings(docs, windowTokens = w).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap

  test("dedupSubstrings removes a cross-document repeated span, keep-first") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta unique tail zero"),
      (1L, "prefix one alpha beta gamma delta epsilon zeta suffix one"),
      (2L, "totally different words with no shared span at all")
    ).toDF("doc_id", "text")
    val r = substrResult(docs, 6)
    // doc 0 holds the globally-first occurrence: untouched
    assert(r(0L) == (("alpha beta gamma delta epsilon zeta unique tail zero", 0L)))
    // doc 1 loses exactly the 6-token repeated window
    assert(r(1L) == (("prefix one suffix one", 6L)))
    assert(r(2L)._2 == 0L)
  }

  test("dedupSubstrings removes a WITHIN-document repeat (per-position counts)") {
    val docs = Seq(
      (7L, "a b c d e f X Y a b c d e f")
    ).toDF("doc_id", "text")
    val r = substrResult(docs, 6)
    assert(r(7L) == (("a b c d e f X Y", 6L)))
  }

  test("dedupSubstrings unions overlapping duplicate windows") {
    // a repeated 7-token run yields two overlapping 6-token duplicate
    // windows in the second doc; the union removes all 7 tokens, not 12
    val docs = Seq(
      (0L, "p q r s t u v tail"),
      (1L, "head p q r s t u v")
    ).toDF("doc_id", "text")
    val r = substrResult(docs, 6)
    assert(r(0L)._2 == 0L)
    assert(r(1L) == (("head", 7L)))
  }

  test("dedupSubstrings matches a brute-force reference on a random corpus") {
    val rnd = new scala.util.Random(41)
    val vocab = Array("a", "b", "c", "d", "e")
    val corpus = (0L until 40L).map { id =>
      (id, Seq.fill(rnd.nextInt(30) + 2)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }
    val w = 4
    // naive reference: materialize every window, count per gram text,
    // keep the (doc,pos)-minimal occurrence, union the rest, rebuild
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toIndexedSeq }.toMap
    val occ = for {
      (id, ws) <- toks.toSeq
      i <- 1 to math.max(ws.length - w + 1, 0)
    } yield (ws.slice(i - 1, i - 1 + w).mkString(" "), id, i)
    val expected = {
      val byGram = occ.groupBy(_._1).filter(_._2.size > 1)
      val killed = byGram.values.flatMap { os =>
        val keep = os.map(o => (o._2, o._3)).min
        os.filter(o => (o._2, o._3) != keep)
          .flatMap(o => (o._3 until o._3 + w).map(p => (o._2, p)))
      }.toSet
      toks.map { case (id, ws) =>
        val kept = ws.zipWithIndex.collect {
          case (t, i0) if !killed.contains((id, i0 + 1)) => t }
        id -> ((kept.mkString(" "), killed.count(_._1 == id).toLong))
      }
    }
    val got = substrResult(corpus.toDF("doc_id", "text"), w)
    assert(got == expected)
  }

  test("dedupSubstrings stays linear on a book-length mostly-duplicated doc") {
    // A 60k-token doc that is one long copy of another: the kill set is
    // ~60k positions, so a per-token array_contains rebuild is
    // O(len × kills) ≈ 3.6e9 comparisons — the round-10 verdict's
    // scale hazard. The array_except rebuild is O(len) and must finish
    // comfortably and EXACTLY (doc B collapses to its unique prefix).
    val n = 60000
    val body = (0 until n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (0L, body),
      (1L, s"zz0 zz1 zz2 $body")
    ).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val r = substrResult(docs, 8)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(r(0L) == ((body, 0L)))
    assert(r(1L) == (("zz0 zz1 zz2", n.toLong)))
    assert(sec < 120.0, s"rebuild took $sec s — quadratic regression?")
  }
}
