package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full-text retrieval: BM25 ranking (scan and index paths), phrase
  * search, and fuzzy (edit-distance) matching. The corpus gates check
  * these against DuckDB restatements; here the semantics are pinned on
  * planted fixtures where the right answer is computable by hand.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark scan fast spark spark"), // tf(spark)=3, dl=5
    (1L, "spark window"), //              tf(spark)=1, dl=2
    (2L, "table value other words here"),
    (3L, "scan scan scan scan scan scan scan scan"),
    (4L, "")
  ).toDF("doc_id", "text")

  /** Reference BM25 (k1=1.2, b=0.75, rational idf) computed in plain
    * Scala for the planted corpus. */
  private def refBm25(query: Seq[String]): Map[Long, Double] = {
    val toks = Map(
      0L -> Seq("spark", "scan", "fast", "spark", "spark"),
      1L -> Seq("spark", "window"),
      2L -> Seq("table", "value", "other", "words", "here"),
      3L -> Seq.fill(8)("scan"),
      4L -> Seq.empty[String])
    val n = toks.size.toDouble
    val sumDl = toks.values.map(_.size).sum.toDouble
    val avgdl = sumDl / n
    val df = query.map(q => q -> toks.values.count(_.contains(q))).toMap
    toks.flatMap { case (id, ws) =>
      val contribs = query.flatMap { q =>
        val tf = ws.count(_ == q).toDouble
        if (tf == 0) None
        else {
          val idf = (n - df(q) + 0.5) / (df(q) + 0.5)
          Some(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (ws.size / avgdl))))
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> contribs.map(c =>
        BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble)
    }
  }

  test("bm25TopK ranks by the reference formula, ties broken by doc_id") {
    val query = Seq("spark", "scan")
    val got = Retrieval.bm25TopK(docs, query, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val ref = refBm25(query)
    assert(got.map(_._1).toSet == ref.keySet)
    got.foreach { case (id, score, _) =>
      assert(math.abs(score - ref(id)) < 1e-9, s"doc $id: $score vs ${ref(id)}")
    }
    // descending scores, doc_id tiebreak
    val scores = got.map(_._2)
    assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    // n_terms: doc 0 matched both query terms
    assert(got.find(_._1 == 0L).get._3 == 2)
  }

  test("bm25TopK tolerates duplicate query terms (parser passes raw splits)") {
    // round 16 (advisor): SEARCH t FOR 'spark spark' splits to duplicate
    // terms; the map-side df map would throw DUPLICATED_MAP_KEY under
    // Spark 4's default mapKeyDedupPolicy=EXCEPTION unless deduped at
    // entry. Scores fold over array_distinct(qw), so dedup is identity.
    val dup = Retrieval.bm25TopK(docs, Seq("spark", "spark", "scan"), k = 10)
      .collect().toSeq
    val dis = Retrieval.bm25TopK(docs, Seq("spark", "scan"), k = 10)
      .collect().toSeq
    assert(dup == dis)
  }

  test("index probe returns exactly the scan-path ranking") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec").toString
    Retrieval.buildIndex(docs, dir)
    val query = Seq("spark", "scan")
    val scan = Retrieval.bm25TopK(docs, query, k = 10).collect().toSeq
    val probe = Retrieval.bm25SearchIndex(spark, dir, query, k = 10)
      .collect().toSeq
    assert(probe == scan)
  }

  test("appendToIndex: probe after append equals a scan of the full corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_app").toString
    val first = docs.filter(col("doc_id") < 3)
    val rest = docs.filter(col("doc_id") >= 3)
    Retrieval.buildIndex(first, dir)
    Retrieval.appendToIndex(spark, dir, rest)
    val query = Seq("spark", "scan")
    val scan = Retrieval.bm25TopK(docs, query, k = 10).collect().toSeq
    val probe = Retrieval.bm25SearchIndex(spark, dir, query, k = 10)
      .collect().toSeq
    assert(probe == scan)
  }

  test("appendToIndex is replay-idempotent (re-ingest converges)") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_idem").toString
    Retrieval.buildIndex(docs.filter(col("doc_id") < 3), dir)
    val rest = docs.filter(col("doc_id") >= 3)
    Retrieval.appendToIndex(spark, dir, rest)
    Retrieval.appendToIndex(spark, dir, rest) // the replayed micro-batch
    val probe = Retrieval.bm25SearchIndex(spark, dir, Seq("spark", "scan"),
      k = 10).collect().toSeq
    val scan = Retrieval.bm25TopK(docs, Seq("spark", "scan"), k = 10)
      .collect().toSeq
    assert(probe == scan)
  }

  test("appendToIndex on a MODIFIED doc deletes stale postings/positions") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_upd").toString
    val v1 = Seq((0L, "spark scan fast window"), (1L, "other text entirely"))
      .toDF("doc_id", "text")
    Retrieval.buildIndex(v1, dir)
    // doc 0 modified: 'scan'/'window' vanish, 'fast' moves, 'spark' stays
    Retrieval.appendToIndex(spark, dir,
      Seq((0L, "fast spark joins")).toDF("doc_id", "text"))
    val corpus = Seq((0L, "fast spark joins"), (1L, "other text entirely"))
      .toDF("doc_id", "text")
    // probe ≡ fresh scan of the UPDATED corpus (df/tf reflect the edit)
    for (q <- Seq(Seq("spark", "scan"), Seq("window"), Seq("fast", "joins")))
      assert(Retrieval.bm25SearchIndex(spark, dir, q, 10).collect().toSeq ==
        Retrieval.bm25TopK(corpus, q, 10).collect().toSeq, s"query $q")
    // stale positions must not produce phantom phrase matches: 'spark
    // scan' was a v1 adjacency of doc 0; 'fast spark' is the v2 one
    assert(Retrieval.phraseSearchIndex(spark, dir, Seq("spark", "scan"))
      .collect().isEmpty)
    assert(Retrieval.phraseSearchIndex(spark, dir, Seq("fast", "spark"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((0L, 1)))
  }

  test("indexSink maintains the index from a real stream") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_str").toString
    Retrieval.buildIndex(docs.filter(col("doc_id") < 0), dir) // empty seed
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData(Seq((0L, "spark scan fast spark spark"), (1L, "spark window")))
    in.addData(Seq((2L, "table value other words here"),
      (3L, "scan scan scan scan scan scan scan scan"), (4L, "")))
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(Retrieval.indexSink(dir))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val probe = Retrieval.bm25SearchIndex(spark, dir, Seq("spark", "scan"),
      k = 10).collect().toSeq
    val scan = Retrieval.bm25TopK(docs, Seq("spark", "scan"), k = 10)
      .collect().toSeq
    assert(probe == scan)
  }

  test("indexSink applies a streamed UPDATE of an existing doc") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_sup").toString
    import spark.implicits._
    Retrieval.buildIndex(
      Seq((5L, "anchor text here")).toDF("doc_id", "text"), dir)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(Retrieval.indexSink(dir))
      .start()
    // strictly separate micro-batches: v2 of doc 0 must arrive AFTER v1
    // is indexed (one batch holding both versions is not an update, it
    // is two rows with one key)
    in.addData(Seq((0L, "spark scan fast window")))
    q.processAllAvailable()
    in.addData(Seq((0L, "fast spark joins"))) // modified doc 0 streams in
    q.processAllAvailable()
    q.stop()
    val corpus = Seq((0L, "fast spark joins"), (5L, "anchor text here"))
      .toDF("doc_id", "text")
    for (t <- Seq(Seq("scan"), Seq("window"), Seq("spark", "joins")))
      assert(Retrieval.bm25SearchIndex(spark, dir, t, 10).collect().toSeq ==
        Retrieval.bm25TopK(corpus, t, 10).collect().toSeq, s"query $t")
    assert(Retrieval.phraseSearchIndex(spark, dir, Seq("spark", "scan"))
      .collect().isEmpty)
  }

  test("bm25TopKBatch equals per-query bm25TopK for every query") {
    val queries = Seq("qa" -> Seq("spark", "scan"), "qb" -> Seq("table"),
      "qc" -> Seq("nosuchterm"))
    val batch = Retrieval.bm25TopKBatch(docs, queries, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    queries.foreach { case (q, terms) =>
      val single = Retrieval.bm25TopK(docs, terms, k = 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      val got = batch.getOrElse(q, Array.empty).toSeq
        .map(t => (t._2, t._3, t._4))
      assert(got == single, s"query $q")
    }
  }

  test("index probe prunes to the queried term ranges") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec2").toString
    Retrieval.buildIndex(docs, dir)
    // the postings scan must push the term filter: a one-term query
    // reads fewer rows than the full postings table holds
    val one = graft.connector.KvCommands.table(spark, s"$dir/postings")
      .filter(col("term") === "window")
    assert(one.count() == 1)
  }

  test("index probe skips postings segments outside the queried terms") {
    import spark.implicits._
    // many distinct terms across many small segments: the lead-key
    // range prune must leave most of the postings table unread
    val corpus = (0L until 400L)
      .map(i => (i, s"w${"%03d".format(i % 200)} common"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ir_spec3").toString
    Retrieval.buildIndex(corpus, dir, maxSegBytes = Some(2048L))
    val res = Retrieval.bm25SearchIndex(spark, dir, Seq("w007"), k = 5)
    res.collect()
    val rep = graft.connector.KvCommands.pruningReport(res)
      .collect().map(r => (r.getAs[String]("table_path"),
        r.getAs[Long]("segments_live"), r.getAs[Long]("segments_read")))
    val post = rep.filter(_._1.contains("postings"))
    assert(post.nonEmpty, rep.mkString(", "))
    val (_, live, read) = post.head
    assert(live > 4, s"fixture should span many segments, got $live")
    assert(read < live / 2,
      s"term probe should skip most segments: read $read of $live")
  }

  test("docterms update probe reads few segments (runtime doc_id pruning)") {
    import spark.implicits._
    // the update path's cost claim — O(old tokens of the CHANGED docs)
    // — rests on the docterms semi-join pruning by its doc_id key
    // prefix at runtime (the kv18 machinery). Many small segments, one
    // re-ingested doc: most of docterms must stay unread.
    val corpus = (0L until 400L)
      .map(i => (i, s"t$i u$i v$i w$i x$i y$i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_dt").toString
    Retrieval.buildIndex(corpus, dir, maxSegBytes = Some(2048L))
    // the exact probe shape appendToIndex builds for a modest batch:
    // an explicit IN on the doc_id key prefix (static pruning — DPP on
    // the semi-join fallback is benefit-gated and skips small tables)
    val probe = graft.connector.KvCommands
      .table(spark, s"$dir/docterms")
      .filter(col("doc_id").isin(7L))
    probe.collect()
    val rep = graft.connector.KvCommands.pruningReport(probe)
      .collect().map(r => (r.getAs[String]("table_path"),
        r.getAs[Long]("segments_live"), r.getAs[Long]("segments_read")))
    val dt = rep.filter(_._1.contains("docterms"))
    assert(dt.nonEmpty, rep.mkString(", "))
    val (_, live, read) = dt.head
    assert(live > 4, s"fixture should span many segments, got $live")
    assert(read < live / 2,
      s"doc_id probe should skip most segments: read $read of $live")
  }

  test("phraseSearchIndex equals phraseCounts, including after append") {
    val d = Seq(
      (0L, "a b a b a"), (1L, "a a a"), (2L, "b a"), (3L, ""),
      (4L, "x a b x")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_pos").toString
    Retrieval.buildIndex(d.filter(col("doc_id") < 3), dir)
    Retrieval.appendToIndex(spark, dir, d.filter(col("doc_id") >= 3))
    for (phrase <- Seq(Seq("a", "b"), Seq("a", "a"), Seq("a", "b", "a"),
        Seq("missing"))) {
      val viaIndex = Retrieval.phraseSearchIndex(spark, dir, phrase)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val viaScan = Retrieval.phraseCounts(d, phrase)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(viaIndex == viaScan, s"phrase $phrase")
    }
  }

  test("phraseCounts: overlaps, multiplicity, and the empty document") {
    val d = Seq(
      (0L, "a b a b a"), //   "a b" at positions 1 and 3
      (1L, "a a a"), //       "a a" overlapping at 1 and 2
      (2L, "b a"),
      (3L, "")
    ).toDF("doc_id", "text")
    val ab = Retrieval.phraseCounts(d, Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(ab == Map(0L -> 2))
    val aa = Retrieval.phraseCounts(d, Seq("a", "a")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(aa == Map(1L -> 2))
  }

  test("fuzzy pairs: recall for every ED<=1 edit class, no false positives") {
    val rows = Seq(
      (1L, "kitten"), (2L, "sitten"), // substitution
      (3L, "kitte"), //                  deletion vs 1
      (4L, "kittens"), //                insertion vs 1
      (5L, "kitten"), //                 exact duplicate of 1
      (6L, "mitten"), //                 substitution vs 1
      (7L, "unrelated")
    ).toDF("id", "name")
    val got = FuzzyMatch.pairsWithinDistance1(rows, "id", "name")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference
    val vals = Seq(1L -> "kitten", 2L -> "sitten", 3L -> "kitte",
      4L -> "kittens", 5L -> "kitten", 6L -> "mitten", 7L -> "unrelated")
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- vals; (ib, sb) <- vals
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("fuzzy pairs match brute force on a random corpus") {
    val rnd = new scala.util.Random(42)
    val strs = (0L until 80L).map { i =>
      i -> (s"w${rnd.nextInt(20)}x${rnd.nextInt(10)}")
    }
    val df = strs.toDF("id", "name")
    val got = FuzzyMatch.pairsWithinDistance1(df, "id", "name")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("fuzzy pairs: duplicate-heavy corpus (rep-collapse) keeps id↔string" +
      " mapping and full pair set") {
    // one 40-strong exact-duplicate class + ED-1 neighbors + noise: the
    // pre-round-11 shape materialized all 40 occurrences in every shared
    // deletion bucket; the collapsed shape blocks on 4 distinct strings.
    val rows = ((0L until 40L).map(i => (i, "abcde")) ++
      Seq((100L, "abcdX"), (101L, "abde"), (102L, "zzzzz"))).toSeq
    val df = rows.toDF("id", "name")
    val got = FuzzyMatch.pairsWithinDistance1(df, "id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getInt(4))).toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, sa, sb, lev(sa, sb))).toSet
    assert(got == want) // 40·39/2 dist-0 + 2·40 dist-1 = 860 pairs
  }

  test("empty query returns the empty ranking (not an analysis error)") {
    assert(Retrieval.bm25TopK(docs, Seq.empty, k = 10).collect().isEmpty)
    assert(Retrieval.bm25TopKBatch(docs, Seq("q1" -> Seq.empty), k = 5)
      .collect().isEmpty)
  }

  test("deleteFromIndex: probe ≡ fresh scan of the shrunk corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_del").toString
    Retrieval.buildIndex(docs, dir)
    // delete doc 3 (the 'scan' monoculture — its removal changes df and
    // avgdl for every survivor) and doc 4 (empty text: doclen row with
    // dl=0 and NO docterms pairs — the doclen probe must not route
    // through the pair set)
    Retrieval.deleteIdsFromIndex(spark, dir, Seq(3L, 4L))
    val corpus = docs.filter(col("doc_id") < 3)
    for (q <- Seq(Seq("spark", "scan"), Seq("scan"), Seq("table")))
      assert(Retrieval.bm25SearchIndex(spark, dir, q, 10).collect().toSeq ==
        Retrieval.bm25TopK(corpus, q, 10).collect().toSeq, s"query $q")
    // positions died with the doc: no phantom phrase hits
    assert(Retrieval.phraseSearchIndex(spark, dir, Seq("scan", "scan"))
      .collect().isEmpty)
    // replayed delete converges (idempotent), absent ids are a no-op
    Retrieval.deleteIdsFromIndex(spark, dir, Seq(3L, 4L, 99L))
    assert(Retrieval.bm25SearchIndex(spark, dir, Seq("spark"), 10)
      .collect().toSeq ==
      Retrieval.bm25TopK(corpus, Seq("spark"), 10).collect().toSeq)
  }

  test("deleteFromIndex then appendToIndex re-creates the doc cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("ir_spec_dra").toString
    Retrieval.buildIndex(docs, dir)
    Retrieval.deleteIdsFromIndex(spark, dir, Seq(0L))
    Retrieval.appendToIndex(spark, dir,
      Seq((0L, "entirely new words now")).toDF("doc_id", "text"))
    val corpus = docs.filter(col("doc_id") =!= 0L)
      .union(Seq((0L, "entirely new words now")).toDF("doc_id", "text"))
    for (q <- Seq(Seq("spark"), Seq("entirely", "words"), Seq("fast")))
      assert(Retrieval.bm25SearchIndex(spark, dir, q, 10).collect().toSeq ==
        Retrieval.bm25TopK(corpus, q, 10).collect().toSeq, s"query $q")
  }

  test("index update fuzz: random create/update/delete batches ≡ fresh" +
      " scan at every step") {
    // randomized differential over the update path: each batch creates
    // new doc_ids, REWRITES existing ones, and DELETES one; after every
    // batch the index probe must equal a fresh scan of the current
    // corpus state for scoring AND phrase adjacency (stale
    // postings/positions from any earlier version would break the
    // hash-for-hash equality).
    val rnd = new scala.util.Random(17)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def randText(): String =
      Seq.fill(rnd.nextInt(10) + 1)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("ir_fuzz").toString
    var state = Map.empty[Long, String]
    val seed = (0L until 4L).map(i => i -> randText()).toMap
    state = seed
    Retrieval.buildIndex(seed.toSeq.toDF("doc_id", "text"), dir)
    for (round <- 1 to 4) {
      val creates = (0 until 2)
        .map(_ => (state.keys.max + 1 + rnd.nextInt(3)).toLong -> randText())
      val updates = rnd.shuffle(state.keys.toSeq).take(2)
        .map(_ -> randText())
      val batch = (creates ++ updates).toMap // one version per doc_id
      // odd rounds force the semi-join fallback (inListCap = 0) so the
      // fuzz covers BOTH probe shapes
      Retrieval.appendToIndex(spark, dir,
        batch.toSeq.toDF("doc_id", "text"),
        inListCap = if (round % 2 == 0) 10000 else 0)
      state = state ++ batch
      // delete one surviving doc per round (alternating probe shapes,
      // like the appends) — the deleted id must vanish from scoring,
      // df, avgdl, and phrase adjacency alike
      val victim = rnd.shuffle(state.keys.toSeq).head
      Retrieval.deleteFromIndex(spark, dir,
        Seq(victim).toDF("doc_id"),
        inListCap = if (round % 2 == 0) 10000 else 0)
      state = state - victim
      val corpus = state.toSeq.toDF("doc_id", "text")
      for (q <- Seq(Seq("alpha"), Seq("beta", "gamma"), vocab.toSeq))
        assert(Retrieval.bm25SearchIndex(spark, dir, q, 20)
          .collect().toSeq ==
          Retrieval.bm25TopK(corpus, q, 20).collect().toSeq,
          s"round $round query $q state $state")
      for (ph <- Seq(Seq("alpha", "beta"), Seq("gamma", "gamma")))
        assert(Retrieval.phraseSearchIndex(spark, dir, ph)
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
          Retrieval.phraseCounts(corpus, ph)
            .collect().map(r => (r.getLong(0), r.getInt(1))).toSet,
          s"round $round phrase $ph state $state")
    }
  }
}
