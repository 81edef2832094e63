package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cosineRef(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  private def vecs = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0.9f, 0.1f, 0f, 0f)),   // close to 0
    (2L, Seq(0f, 1f, 0f, 0f)),       // orthogonal to 0
    (3L, Seq(-1f, 0f, 0f, 0f)),      // opposite of 0
    (4L, Seq(2f, 0f, 0f, 0f))        // colinear with 0
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by exact cosine") {
    val q = Seq(1f, 0f, 0f, 0f)
    val top = Similarity.bruteForceTopK(vecs, q, k = 3).collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSeq == Seq(0L, 4L, 1L))
    assert(math.abs(top(0).getAs[Double]("sim") - 1.0) < 1e-12)
    assert(math.abs(top(2).getAs[Double]("sim") - cosineRef(q, Seq(0.9f, 0.1f, 0f, 0f))) < 1e-12)
  }

  test("banded multi-probe buckets recall non-colinear near-duplicates") {
    // planted pairs at cosine ≈ 0.95-0.99 (NOT colinear — signatures
    // differ in a few bits) among random distractors: the banded
    // multi-probe join must recall most of them, where a single
    // exact-signature bucket is a coin flip. Fixed seed → deterministic.
    val rnd = new scala.util.Random(7)
    val dim = 8
    def randVec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float], eps: Double): Array[Float] =
      v.map(x => (x + eps * rnd.nextGaussian()).toFloat)
    val planted = (0 until 6).map { i =>
      val v = randVec()
      (100L + i, 200L + i, v, perturb(v, 0.08))
    }
    val rows =
      planted.flatMap { case (ia, ib, va, vb) =>
        Seq((ia, va.toSeq), (ib, vb.toSeq)) } ++
        (0 until 50).map(i => (i.toLong, randVec().toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val truePairs = planted.collect {
      case (ia, ib, va, vb) if cosineRef(va.toSeq.map(identity), vb.toSeq.map(identity)) >= 0.9 =>
        (ia, ib)
    }.toSet
    assert(truePairs.size >= 4, s"seed produced too few true pairs: $truePairs")
    val found = Similarity.embeddingNearDupPairs(df, dim = dim,
      threshold = 0.9, nPlanes = 64, bands = 4, probeBits = 1)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val recalled = truePairs.count(found.contains)
    assert(recalled >= truePairs.size - 1,
      s"banded recall too low: $recalled of ${truePairs.size} ($found)")
    // verification is exact: nothing below the threshold survives
    val sims = Similarity.embeddingNearDupPairs(df, dim = dim,
      threshold = 0.9, nPlanes = 64, bands = 4, probeBits = 1)
      .collect().map(_.getAs[Double]("sim"))
    assert(sims.forall(_ >= 0.9))
  }

  test("int8 quantized top-k: high recall, bounded cosine error, zero-dim safe") {
    // seeded random corpus + a planted twin of the query: quantized
    // ranking must keep recall high and every quantized cosine within
    // the analytic error bound of the exact one
    val rnd = new scala.util.Random(13)
    val dim = 16
    val base = (0L until 200L).map { i =>
      // dim 7 is zero EVERYWHERE → scale 0 → quantizes to 0, no NaNs
      (i, Array.tabulate(dim)(j =>
        if (j == 7) 0f else rnd.nextGaussian().toFloat).toSeq)
    }
    val df = base.toDF("vec_id", "embedding")
    val q = base.head._2.map(_.toFloat)
    val scales = Similarity.quantizationScales(df, dim)
    assert(scales(7) == 0.0)
    val qdf = Similarity.quantize(df, scales)
    // the compact corpus carries only (id, qvec tinyint[], vnorm)
    assert(qdf.schema.fieldNames.toSeq == Seq("vec_id", "qvec", "vnorm"))
    assert(qdf.schema("qvec").dataType.simpleString == "array<tinyint>")
    val res = Similarity.quantizedTopK(qdf, scales, q, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(res.length == 10)
    assert(res.head._1 == 0L && math.abs(res.head._2 - 1.0) < 0.01,
      s"self not at rank 1: ${res.head}")
    val exact = Similarity.bruteForceTopK(df, q, 10).collect()
      .map(_.getLong(0)).toSet
    assert(res.count(p => exact.contains(p._1)) >= 8,
      s"recall too low: ${res.map(_._1).toSeq} vs $exact")
    // per-returned-id error bound: quantization perturbs each dim by
    // ≤ scale/2, so |cos_q − cos| ≤ Σ|q_i|·s_i/2 / (||q||·||v||); the
    // corpus is ~unit-norm gaussian, 0.02 is generous
    val byId = base.toMap
    res.foreach { case (id, sim) =>
      assert(math.abs(sim - cosineRef(q, byId(id))) <= 0.02,
        s"vec $id: quantized $sim vs exact ${cosineRef(q, byId(id))}")
    }
  }

  test("hyperplane signature: colinear vectors share it, opposite vectors differ") {
    val sigs = vecs.select($"vec_id",
      Similarity.hyperplaneSignature($"embedding", dim = 4, nPlanes = 16).as("sig"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("sig")).toMap
    assert(sigs(0L) == sigs(4L))
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(3L)) == 16) // all planes flip
  }

  test("annTopK finds the exact nearest neighbours on clustered data") {
    val q = Seq(1f, 0f, 0f, 0f)
    val top = Similarity.annTopK(vecs, q, k = 2, dim = 4, nPlanes = 16, probe = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(top == Seq(0L, 4L))
  }

  test("embeddingNearDupPairs reports colinear pair") {
    val pairs = Similarity.embeddingNearDupPairs(vecs, dim = 4, threshold = 0.95,
      nPlanes = 8).collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("ivfTopK probing every cell equals brute force; fewer cells is a subset search") {
    val emb = graft.Tables.table(spark, graft.TestSpark.sf, "embeddings")
      .limit(100).cache()
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val bf = Similarity.bruteForceTopK(emb, q, k = 5).collect().map(_.getAs[Long]("vec_id"))
    val full = Similarity.ivfTopK(emb, q, k = 5, nCentroids = 8, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(full.toSeq == bf.toSeq)
    // partial probe returns vectors only from probed cells (k results, ranked)
    val part = Similarity.ivfTopK(emb, q, k = 5, nCentroids = 8, nProbe = 2).collect()
    assert(part.length == 5)
    assert(part.map(_.getAs[Double]("sim")).toSeq.reverse.sorted.reverse ==
      part.map(_.getAs[Double]("sim")).toSeq)
  }

  test("AnnIndex: materialized probes match index-free search") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(200).cache()
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString + "/idx"
    AnnIndex.build(emb, dir, dim = q.length, nPlanes = 16, nCentroids = 8)

    // LSH probe over the precomputed signature column = recomputed-sig path
    val live = Similarity.annTopK(emb, q, k = 5, dim = q.length, nPlanes = 16, probe = 5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val idx = AnnIndex.annTopK(spark, dir, q, k = 5, dim = q.length,
      nPlanes = 16, probe = 5).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(idx == live)

    // IVF probing every cell recovers exact brute-force top-k
    val bf = Similarity.bruteForceTopK(emb, q, k = 5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val ivfAll = AnnIndex.ivfTopK(spark, dir, q, k = 5, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivfAll == bf)

    // partial probe reads only the probed cell partitions and stays ranked
    val part = AnnIndex.ivfTopK(spark, dir, q, k = 5, nProbe = 2).collect()
    assert(part.nonEmpty)
    assert(part.map(_.getAs[Double]("sim")).toSeq.reverse.sorted.reverse ==
      part.map(_.getAs[Double]("sim")).toSeq)
    // plan-level: the cell filter is a partition filter, not a data scan
    val plan = AnnIndex.ivfTopK(spark, dir, q, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      plan.take(1500))
  }

  test("knnJoinBruteForce equals per-query bruteForceTopK, pair-exact") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(150).cache()
    val qids = Seq(0L, 7L, 42L)
    val joined = Similarity.knnJoinBruteForce(
      emb.filter($"vec_id".isin(qids: _*)), emb, k = 4)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"))).toMap
    assert(joined.size == qids.size * 4)
    for (qid <- qids) {
      val q = emb.filter($"vec_id" === qid).select("embedding")
        .head().getSeq[Float](0)
      val single = Similarity.bruteForceTopK(emb, q, k = 4).collect()
      single.zipWithIndex.foreach { case (row, i) =>
        assert(joined((qid, i + 1)) ==
          ((row.getAs[Long]("vec_id"), row.getAs[Double]("sim"))),
          s"query $qid rank ${i + 1}")
      }
    }
  }

  test("AnnIndex.knnJoin: full probe equals brute force; partial probe is " +
      "cell-local, self-finding, and tombstone-aware") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(150).cache()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val dir = java.nio.file.Files.createTempDirectory("annknn").toString + "/idx"
    AnnIndex.build(emb, dir, dim = dim, nPlanes = 16, nCentroids = 8)
    val queries = emb.filter($"vec_id".isin(0L, 7L, 42L))
    // probing every cell is exact: equals the brute-force join
    val full = AnnIndex.knnJoin(spark, dir, queries, k = 4, nProbe = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"))).sorted.toSeq
    val bf = Similarity.knnJoinBruteForce(queries, emb, k = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"))).sorted.toSeq
    assert(full == bf)
    // partial probe: every query still finds itself at rank 1 (its own
    // assignment cell is the first probed) with k dense ranks
    val part = AnnIndex.knnJoin(spark, dir, queries, k = 4, nProbe = 2)
      .collect()
    val byQ = part.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 7L, 42L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq == Seq(1, 2, 3, 4))
      val r1 = rows.find(_.getAs[Int]("rk") == 1).get
      assert(r1.getAs[Long]("neighbor_id") == qid)
      assert(math.abs(r1.getAs[Double]("sim") - 1.0) < 1e-9)
    }
    // a tombstoned vector stops surfacing as anyone's neighbor
    AnnIndex.deleteIds(spark, dir, Seq(7L))
    val after = AnnIndex.knnJoin(spark, dir, queries, k = 4, nProbe = 8)
      .collect()
    assert(!after.exists(_.getAs[Long]("neighbor_id") == 7L))
    // 7 is gone as a neighbor but still valid as a QUERY vector
    assert(after.count(_.getAs[Long]("query_id") == 7L) == 4)
  }

  test("semanticDedup keeps one id per embedding cluster, singletons intact") {
    val rnd = new scala.util.Random(19)
    val dim = 16
    def randVec() = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    def near(v: Seq[Float]) = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    // one 3-member CHAIN {5, 9, 12} (each near-dups its predecessor —
    // the closure, not a single pair, must collapse it), one exact
    // pair {20, 21}, two singletons
    val base = randVec(); val n9 = near(base); val n12 = near(n9)
    val v20 = randVec()
    val all = Seq(
      (5L, base), (9L, n9), (12L, n12),
      (20L, v20), (21L, v20),
      (30L, randVec()), (31L, randVec())
    ).toDF("vec_id", "embedding")
    val survivors = Similarity.semanticDedup(all, dim = dim,
      threshold = 0.95, nPlanes = 64, bands = 4, probeBits = 1)
      .orderBy("vec_id").as[Long].collect().toSeq
    assert(survivors == Seq(5L, 20L, 30L, 31L))
  }

  test("knnJoin plan pin: cell-local equi-join, no cartesian/NL pair " +
      "space, no driver round-trip at ANY |Q|") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(150).cache()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val dir = java.nio.file.Files.createTempDirectory("annknnplan")
      .toString + "/idx"
    AnnIndex.build(emb, dir, dim = dim, nPlanes = 16, nCentroids = 8)
    // |Q| = corpus (the hard-negative-mining shape): construction-time
    // driver work must be INDEPENDENT of |Q| — per-query probe-cell
    // selection is column algebra over the centroid literals, never a
    // driver-side collect. Opening the index costs a constant footer/
    // schema job; what may not happen is jobs scaling with the query
    // side, so construct at |Q|=3 and |Q|=150 and compare job counts.
    def constructionJobs(tag: String, q: DataFrame): Int = {
      spark.sparkContext.setJobGroup(tag, "knnJoin construction")
      AnnIndex.knnJoin(spark, dir, q, k = 3, nProbe = 2)
      Thread.sleep(500) // status store is fed async
      val n = spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
      spark.sparkContext.clearJobGroup()
      n
    }
    val jSmall = constructionJobs("knn-construct-3", emb.limit(3))
    val jFull = constructionJobs("knn-construct-150", emb)
    assert(jFull <= jSmall,
      s"knnJoin construction ran $jFull jobs at |Q|=150 vs $jSmall at " +
        "|Q|=3 — driver work scaling with the query side")
    val df = AnnIndex.knnJoin(spark, dir, emb, k = 3, nProbe = 2)
    assert(df.count() == emb.count() * 3)
    // executed plan: the pair space is the cell equi-join — never a
    // cartesian or nested-loop product of queries × index
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(2000))
    assert(plan.contains("cell"), "join must key on the cell column")
    emb.unpersist()
  }

  test("knnJoin guard: ragged and null-element query vectors raise " +
      "instead of ranking null-sim garbage") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(40).cache()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val dir = java.nio.file.Files.createTempDirectory("annknnguard")
      .toString + "/idx"
    AnnIndex.build(emb, dir, dim = dim, nPlanes = 16, nCentroids = 4)
    // ragged: wrong dimension
    val ragged = emb.limit(1).select($"vec_id",
      expr("slice(embedding, 1, 3)").as("embedding"))
    val e1 = intercept[Exception] {
      AnnIndex.knnJoin(spark, dir, ragged, k = 2, nProbe = 2).collect()
    }
    assert(e1.getMessage.contains("knnJoin") ||
      Option(e1.getCause).exists(_.getMessage.contains("knnJoin")))
    // null element: full length, one NULL inside — would silently
    // degrade cell selection to the index tiebreak without the guard
    val nulled = emb.limit(1).select($"vec_id",
      expr("transform(embedding, (x, i) -> IF(i = 0, CAST(NULL AS FLOAT), x))")
        .as("embedding"))
    val e2 = intercept[Exception] {
      AnnIndex.knnJoin(spark, dir, nulled, k = 2, nProbe = 2).collect()
    }
    assert(e2.getMessage.contains("knnJoin") ||
      Option(e2.getCause).exists(_.getMessage.contains("knnJoin")))
    emb.unpersist()
  }

  test("knnJoinQuantized: int8-accurate batch ranking that never reads the " +
      "float vectors") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(150).cache()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val dir = java.nio.file.Files.createTempDirectory("annknnq").toString + "/idx"
    AnnIndex.build(emb, dir, dim = dim, nPlanes = 16, nCentroids = 8)
    val queries = emb.filter($"vec_id".isin(0L, 7L, 42L))
    val qdf = AnnIndex.knnJoinQuantized(spark, dir, queries, k = 4, nProbe = 8)
    val rows = qdf.collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 7L, 42L))
    // exact float sims for every returned pair, one broadcast join
    val exact = Similarity.knnJoinBruteForce(queries, emb, k = 150)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("sim")).toMap
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == Seq(1, 2, 3, 4))
      val r1 = rs.find(_.getAs[Int]("rk") == 1).get
      assert(r1.getAs[Long]("neighbor_id") == qid) // self within quant error
      assert(math.abs(r1.getAs[Double]("sim") - 1.0) < 0.01)
      rs.foreach { r =>
        val x = exact((qid, r.getAs[Long]("neighbor_id")))
        assert(math.abs(r.getAs[Double]("sim") - x) <= 0.02,
          s"quantized sim drifted: $r vs exact $x")
      }
    }
    // the scale claim: the INDEX scans project (qvec, vnorm) — the
    // float embedding column never leaves disk (the query-side scan
    // reads its own floats, which is the point of asymmetric ranking)
    val idxScans = qdf.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("FileScan parquet") &&
        l.contains("annknnq")).mkString("\n")
    assert(idxScans.nonEmpty && !idxScans.contains("embedding"), idxScans)
  }

  test("AnnIndex quantized IVF probe matches the float probe within int8 error") {
    val rnd = new scala.util.Random(29)
    val dim = 12
    val base = (0L until 300L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val df = base.toDF("vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("ann_quant").toString + "/idx"
    AnnIndex.build(df, path, dim, nCentroids = 8)
    val q = base.head._2.map(_.toFloat)
    val floatTop = AnnIndex.ivfTopK(spark, path, q, k = 10, nProbe = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val quantTop = AnnIndex.ivfTopKQuantized(spark, path, q, k = 10, nProbe = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(quantTop.length == 10)
    assert(quantTop.head._1 == 0L && math.abs(quantTop.head._2 - 1.0) < 0.01)
    val floatIds = floatTop.map(_._1).toSet
    assert(quantTop.count(p => floatIds.contains(p._1)) >= 8,
      s"quantized recall too low: ${quantTop.map(_._1).toSeq} vs $floatIds")
    val exactById = floatTop.toMap
    quantTop.foreach { case (id, sim) =>
      exactById.get(id).foreach(x => assert(math.abs(sim - x) <= 0.02,
        s"vec $id: quantized $sim vs float $x"))
    }
    // appends quantize on the PERSISTED grid (values beyond it clamp) —
    // the appended twin of the query must surface at rank 1 or 2
    val twin = Seq((9999L, q.map(v => v * 1.5f).toSeq)).toDF("vec_id", "embedding")
    AnnIndex.append(twin, path)
    val after = AnnIndex.ivfTopKQuantized(spark, path, q, k = 2, nProbe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(after == Set(0L, 9999L), s"appended twin not surfaced: $after")
  }

  test("AnnIndex.append grows the index in place with unchanged probe semantics") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(200).cache()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val dir = java.nio.file.Files.createTempDirectory("annidx_app").toString + "/idx"
    val base = emb.filter($"vec_id" % 2 === 0)
    val extra = emb.filter($"vec_id" % 2 =!= 0)
    AnnIndex.build(base, dir, dim = dim, nPlanes = 16, nCentroids = 8)
    AnnIndex.append(extra, dir) // dim/nPlanes come from the index itself
    val idx = spark.read.parquet(dir).cache()
    // every vector present exactly once
    assert(idx.count() == emb.count())
    assert(idx.select("vec_id").distinct().count() == emb.count())
    // routing invariant: every stored cell equals the nearest-centroid
    // assignment under the PERSISTED centroids (append never re-clusters)
    val cents = AnnIndex.loadCentroids(dir)
    val misrouted = idx.filter(
      AnnIndex.nearestCell(cents, col("embedding")) =!= col("cell")).count()
    assert(misrouted == 0)
    // an appended vector is findable: its own top-1 is itself at sim≈1
    val probes = extra.limit(3).collect()
    probes.foreach { r =>
      val q = r.getSeq[Float](1)
      val top = AnnIndex.ivfTopK(spark, dir, q, k = 1, nProbe = 8).head()
      assert(top.getAs[Long]("vec_id") == r.getLong(0))
      assert(math.abs(top.getAs[Double]("sim") - 1.0) < 1e-9)
    }
    // full-probe IVF over the appended index equals brute force over ALL
    val q0 = emb.filter($"vec_id" === 1).select("embedding").head().getSeq[Float](0)
    val bf = Similarity.bruteForceTopK(emb, q0, k = 5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val ivf = AnnIndex.ivfTopK(spark, dir, q0, k = 5, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivf == bf)
    idx.unpersist(); emb.unpersist()
  }

  test("compactAnnIndex collapses append small files; probes bit-identical;" +
      " tombstones and the drift ledger survive") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(240).cache()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val dir =
      java.nio.file.Files.createTempDirectory("annidx_cmp").toString + "/idx"
    AnnIndex.build(emb.filter($"vec_id" % 4 === 0), dir,
      dim = dim, nPlanes = 16, nCentroids = 8)
    (1 to 3).foreach(r => AnnIndex.append(emb.filter($"vec_id" % 4 === r), dir))
    val victims = emb.filter($"vec_id" % 10 === 7).select("vec_id").cache()
    AnnIndex.delete(spark, dir, victims)
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    val q = emb.filter($"vec_id" === 2).select("embedding")
      .head().getSeq[Float](0)
    def probe() = AnnIndex.ivfTopK(spark, dir, q, k = 8, nProbe = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getDouble(1))).toSeq
    def probeQ() = AnnIndex.ivfTopKQuantized(spark, dir, q, k = 8, nProbe = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getDouble(1))).toSeq
    val (beforeTop, beforeQTop) = (probe(), probeQ())
    val beforeRows = spark.read.parquet(dir).count()
    val driftBefore = AnnIndex.driftStats(dir)
    val (nBefore, nAfter) = AnnIndex.compactAnnIndex(spark, dir)
    assert(nAfter < nBefore,
      s"compaction did not shrink the file count: $nBefore -> $nAfter")
    // stored rows preserved exactly (tombstoned rows stay physical —
    // folding them is rebuildInPlace's job, and the ledger still counts
    // them), probes bit-identical, tombstones still hidden
    assert(spark.read.parquet(dir).count() == beforeRows)
    assert(probe() == beforeTop)
    assert(probeQ() == beforeQTop)
    assert(beforeTop.forall(p => !victimIds.contains(p._1)))
    assert(AnnIndex.driftStats(dir) == driftBefore)
    // idempotent: a second compaction is a no-op on the file count and
    // the probe answer
    val (n2Before, n2After) = AnnIndex.compactAnnIndex(spark, dir)
    assert(n2Before == nAfter && n2After == nAfter)
    assert(probe() == beforeTop)
    victims.unpersist(); emb.unpersist()
  }

  test("streamingIngestAnn: durable bootstrap→append across a restart;" +
      " replayed ids add nothing; probes equal brute force") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ann_stream")
    val dir = root.toString + "/idx"
    val ckpt = root.toString + "/ckpt"
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(120).cache()
    val all = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (batch1, batch2) = all.splitAt(60)
    val events =
      scala.collection.mutable.ListBuffer[(Long, Long, Boolean)]()
    val source = MemoryStream[(Long, Seq[Float])]
    def runOnce(): Unit =
      AnnIndex.streamingIngestAnn(
        source.toDF().toDF("vec_id", "embedding"), dir, nCentroids = 8,
        onBatch = (id, stats, rebuilt) =>
          events += ((id, stats.buildRows + stats.appendedRows, rebuilt)))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    source.addData(batch1.toSeq: _*)
    runOnce() // bootstraps the index from the first batch
    assert(spark.read.parquet(dir).count() == 60)
    assert(AnnIndex.driftStats(dir).buildRows == 60)
    // restart: batch 2 arrives MIXED with replayed batch-1 ids (the
    // crash-replay shape) — only the 60 fresh ids may land
    source.addData((batch1.take(20) ++ batch2).toSeq: _*)
    runOnce()
    val idx = spark.read.parquet(dir)
    assert(idx.count() == 120)
    assert(idx.select("vec_id").distinct().count() == 120)
    // growth hit 1.0 on the second batch -> in-place re-cluster ran
    assert(events.exists(_._3), s"no rebuild observed: $events")
    // full-probe IVF over the streamed index equals brute force over all
    val q = batch2.head._2
    val bf = Similarity.bruteForceTopK(emb, q, k = 6)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val ivf = AnnIndex.ivfTopK(spark, dir, q, k = 6, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivf == bf)
    // a pure replay run (all ids already stored) is a no-op on state
    source.addData(batch1.toSeq: _*)
    runOnce()
    assert(spark.read.parquet(dir).count() == 120)
    emb.unpersist()
  }

  test("streamingIngestAnn refuses an index dir with data but no params" +
      " sidecar") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ann_stream_bad")
    val dir = root.toString + "/idx"
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings").limit(40)
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    AnnIndex.build(emb, dir, dim = dim, nCentroids = 4)
    // simulate a crashed build: data present, params sidecar gone
    graft.io.SidecarFs.deleteIfExists(dir + "/_params.txt")
    val source = MemoryStream[(Long, Seq[Float])]
    source.addData((900L, Seq.fill(dim)(0.5f)))
    val q = AnnIndex.streamingIngestAnn(
      source.toDF().toDF("vec_id", "embedding"), dir)
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.getMessage.contains("params sidecar") ||
      Option(err.getCause).exists(_.getMessage.contains("params sidecar")))
  }

  test("drift ledger detects 2x drifted growth; the rebuild trigger restores probe recall") {
    // base corpus: two modes (e0, e1); drifted growth: four NEW modes
    // (e2..e5) the build-time centroids never saw. Fixed seed.
    val dim = 16
    val rnd = new scala.util.Random(11)
    def mode(axis: Int, id0: Long, n: Int): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)((rnd.nextGaussian() * 0.05).toFloat)
        v(axis) = (1.0 + rnd.nextGaussian() * 0.05).toFloat
        (id0 + i, v.toSeq)
      }
    val base = (mode(0, 0, 100) ++ mode(1, 100, 100)).toDF("vec_id", "embedding")
    val drifted = (2 to 5).flatMap(a => mode(a, 1000 + a * 100, 100))
      .toDF("vec_id", "embedding")
    val all = base.union(drifted).cache()

    def recallAt(dir: String, k: Int, nProbe: Int): Double = {
      val qs = Seq(2, 3, 4).map { axis =>
        val q = Array.fill(dim)(0f); q(axis) = 1f; q.toSeq
      }
      qs.map { q =>
        val truth = Similarity.bruteForceTopK(all, q, k).collect()
          .map(_.getAs[Long]("vec_id")).toSet
        val got = AnnIndex.ivfTopK(spark, dir, q, k, nProbe).collect()
          .map(_.getAs[Long]("vec_id")).toSet
        (truth & got).size.toDouble / k
      }.sum / qs.size
    }

    // WITHOUT the trigger: plain append — the ledger reports the drift
    // and recall under a partial probe is eroded
    val dirA = java.nio.file.Files.createTempDirectory("ann_drift_a")
      .toString + "/idx"
    AnnIndex.build(base, dirA, dim = dim, nPlanes = 16, nCentroids = 8)
    AnnIndex.append(drifted, dirA)
    val stats = AnnIndex.driftStats(dirA)
    assert(stats.buildRows == 200 && stats.appendedRows == 400)
    assert(math.abs(stats.growth - 2.0) < 1e-9)
    assert(stats.cosErosion > 0.0,
      s"drifted vectors must fit the old cells worse: $stats")
    assert(stats.needsRebuild(), s"2x drifted growth must trip the trigger: $stats")
    val recallStale = recallAt(dirA, k = 10, nProbe = 2)

    // WITH the trigger: appendAndMaintain rebuilds (fresh centroids over
    // the full corpus) and the same partial probe recovers recall
    val dirB = java.nio.file.Files.createTempDirectory("ann_drift_b")
      .toString + "/idx"
    AnnIndex.build(base, dirB, dim = dim, nPlanes = 16, nCentroids = 8)
    val rebuilt = AnnIndex.appendAndMaintain(spark, drifted, dirB)
    assert(rebuilt, "the drift trigger must fire on 2x drifted growth")
    val recallFresh = recallAt(dirB, k = 10, nProbe = 2)
    assert(recallFresh >= 0.8, s"post-rebuild recall $recallFresh < 0.8")
    assert(recallFresh > recallStale,
      s"rebuild must beat the stale clustering: $recallFresh <= $recallStale")
    // the rebuild reset the ledger: accounting starts over
    val statsB = AnnIndex.driftStats(dirB)
    assert(statsB.buildRows == 600 && statsB.appendedRows == 0)
    // nothing lost in the swap
    assert(spark.read.parquet(dirB).count() == 600)
    all.unpersist()
  }

  test("grid erosion alone trips the rebuild and refreshes the int8 scales") {
    // appended vectors point along the SAME modes as the base (cosine
    // is scale-invariant, so centroid fit is perfect and cosErosion ≈
    // 0) but at 10× magnitude: the build-time int8 grid clamps nearly
    // every component. Growth stays tiny. Only the gridErosion signal
    // can see this failure mode — without it, quantized-sim fidelity
    // would erode silently until the growth trigger fired much later.
    val dim = 16
    val rnd = new scala.util.Random(12)
    def mode(axis: Int, id0: Long, n: Int, scale: Float): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val v = Array.fill(dim)((rnd.nextGaussian() * 0.05 * scale).toFloat)
        v(axis) = ((1.0 + rnd.nextGaussian() * 0.05) * scale).toFloat
        (id0 + i, v.toSeq)
      }
    val base = (mode(0, 0, 100, 1f) ++ mode(1, 100, 100, 1f))
      .toDF("vec_id", "embedding")
    val big = (mode(0, 1000, 10, 10f) ++ mode(1, 1010, 10, 10f))
      .toDF("vec_id", "embedding")

    // signal shape: plain append, then read the ledger
    val dirA = java.nio.file.Files.createTempDirectory("ann_grid_a")
      .toString + "/idx"
    AnnIndex.build(base, dirA, dim = dim, nPlanes = 16, nCentroids = 8)
    AnnIndex.append(big, dirA)
    val stats = AnnIndex.driftStats(dirA)
    assert(stats.growth < 0.2, s"growth must stay under its trigger: $stats")
    assert(stats.cosErosion < 0.05,
      s"scaled-up same-direction vectors must fit the cells: $stats")
    assert(stats.gridErosion > 0.5,
      s"10× magnitude must clamp most components: $stats")
    assert(stats.needsRebuild(maxGrowth = 1.0, maxCosErosion = 0.05),
      s"grid erosion alone must trip the trigger: $stats")

    // end-to-end: appendAndMaintain rebuilds on the grid signal only
    // (growth/cos thresholds far out of reach) and refreshes the grid
    val dirB = java.nio.file.Files.createTempDirectory("ann_grid_b")
      .toString + "/idx"
    AnnIndex.build(base, dirB, dim = dim, nPlanes = 16, nCentroids = 8)
    val scalesBefore = AnnIndex.loadScales(dirB)
    val rebuilt = AnnIndex.appendAndMaintain(spark, big, dirB,
      maxGrowth = 5.0, maxCosErosion = 0.5)
    assert(rebuilt, "grid erosion alone must drive the rebuild")
    val scalesAfter = AnnIndex.loadScales(dirB)
    assert(scalesAfter.max > scalesBefore.max * 5,
      s"rebuild must refresh _scales.txt to the grown range: " +
        s"${scalesBefore.max} -> ${scalesAfter.max}")
    // fresh ledger, nothing lost
    val statsB = AnnIndex.driftStats(dirB)
    assert(statsB.buildRows == 220 && statsB.appendedRows == 0)
    assert(spark.read.parquet(dirB).count() == 220)
  }

  test("matches corpus embeddings against an in-test oracle") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings").limit(50).cache()
    val rows = emb.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](r.fieldIndex("embedding")))
    val q = rows.find(_._1 == 0L).get._2
    val expect = rows.map { case (id, v) => (id, cosineRef(q, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    val got = Similarity.bruteForceTopK(emb, q, k = 5).collect()
      .map(_.getAs[Long]("vec_id")).toSeq
    assert(got == expect)
  }

  test("AnnIndex.delete: tombstoned vectors vanish from every probe;" +
      " re-append and rebuild behave") {
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(120).cache()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val dir = java.nio.file.Files.createTempDirectory("ann_del")
      .toString + "/idx"
    AnnIndex.build(emb, dir, dim = dim, nPlanes = 16, nCentroids = 8)
    val victims = emb.filter($"vec_id" % 5 === 1)
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    AnnIndex.delete(spark, dir, victims.select("vec_id"))
    val survivors = emb.filter($"vec_id" % 5 =!= 1)
    // every probe path: no deleted id surfaces, and the full-probe IVF
    // ranking equals brute force over the SURVIVORS (df/ranking shifts
    // with the shrunk corpus, not just id filtering of the old answer)
    val q = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0)
    val bf = Similarity.bruteForceTopK(survivors, q, k = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val ivf = AnnIndex.ivfTopK(spark, dir, q, k = 8, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivf == bf)
    val lsh = AnnIndex.annTopK(spark, dir, q, k = 8, dim = dim, probe = 16)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(lsh.forall(!victimIds.contains(_)))
    val quant = AnnIndex.ivfTopKQuantized(spark, dir, q, k = 8, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(quant.forall(!victimIds.contains(_)))
    // drift ledger counts dead rows; a replayed delete is a no-op
    val delCount = victimIds.size.toLong
    assert(AnnIndex.driftStats(dir).deletedRows == delCount)
    AnnIndex.delete(spark, dir, victims.select("vec_id"))
    assert(AnnIndex.driftStats(dir).deletedRows == delCount)
    // a deleted id re-appended comes BACK (append un-tombstones it)
    val back = victims.limit(1).cache()
    val backId = back.head().getLong(0)
    AnnIndex.append(back, dir)
    assert(AnnIndex.driftStats(dir).deletedRows == delCount - 1)
    val backQ = back.head().getSeq[Float](1)
    assert(AnnIndex.ivfTopK(spark, dir, backQ, k = 1, nProbe = 8)
      .head().getAs[Long]("vec_id") == backId)
    // rebuild folds tombstones away physically: the sidecar is gone,
    // the dead rows are gone, the answer is unchanged. The re-appended
    // id exists TWICE physically (append of an existing id has always
    // duplicated — the supported vector-update path is rebuild, not
    // delete+re-add of a changed embedding), so expect 120 survivors
    // + 1 un-tombstoned original + 1 appended copy.
    AnnIndex.rebuildInPlace(spark, dir)
    assert(!new java.io.File(dir, "_deleted").exists())
    val expectRows = emb.count() - delCount + 2
    assert(spark.read.parquet(dir).count() == expectRows)
    val ivf2 = AnnIndex.ivfTopK(spark, dir, q, k = 8, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(ivf2.forall(id => !victimIds.contains(id) || id == backId))
    // heavy deletion alone trips the rebuild trigger
    assert(AnnDriftStatsProbe.deletedTrips())
    back.unpersist(); emb.unpersist()
  }

  test("AnnIndex tombstones: sidecar stays bounded under replays;" +
      " a crashed swap heals on read") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
      .limit(60).cache()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val dir = JFiles.createTempDirectory("ann_del_bound").toString + "/idx"
    AnnIndex.build(emb, dir, dim = dim, nPlanes = 16, nCentroids = 4)
    val victims = emb.filter($"vec_id" % 7 === 3).select("vec_id")
    val nVictims = victims.count()
    val deleted = JPaths.get(dir, "_deleted")
    def sidecarRows(): Long = spark.read.parquet(deleted.toString).count()

    // the sidecar holds exactly the dead rows — a replayed delete, a
    // delete of absent ids, and a mixed batch all leave it unchanged
    // (pre-fix it grew by the full request every call while
    // deletedFraction stayed flat, unbounding the broadcast anti-join)
    AnnIndex.delete(spark, dir, victims)
    assert(sidecarRows() == nVictims)
    AnnIndex.delete(spark, dir, victims) // replay
    assert(sidecarRows() == nVictims)
    AnnIndex.deleteIds(spark, dir, Seq(999999L, 888888L)) // absent ids
    assert(sidecarRows() == nVictims)
    AnnIndex.delete(spark, dir,
      victims.union(spark.range(777777L, 777780L).select($"id".as("vec_id"))))
    assert(sidecarRows() == nVictims)
    // absent-id deletes against a tombstone-free index create nothing
    val dir2 = JFiles.createTempDirectory("ann_del_none").toString + "/idx"
    AnnIndex.build(emb, dir2, dim = dim, nPlanes = 16, nCentroids = 4)
    AnnIndex.deleteIds(spark, dir2, Seq(424242L))
    assert(!AnnIndex.hasDeleted(dir2))

    // crash between swap steps (2) and (3): live dir moved away, the
    // committed __new never moved in — pre-fix hasDeleted()==false and
    // every tombstoned vector silently resurfaced. Recovery must roll
    // the swap forward on the next read.
    val nw = JPaths.get(dir, "_deleted__new")
    val old = JPaths.get(dir, "_deleted__old")
    spark.read.parquet(deleted.toString).limit(2).write
      .mode("overwrite").parquet(nw.toString)
    assert(JFiles.exists(nw.resolve("_SUCCESS")))
    JFiles.move(deleted, old)
    assert(AnnIndex.hasDeleted(dir), "committed __new must roll forward")
    assert(!JFiles.isDirectory(old) && !JFiles.isDirectory(nw))
    assert(sidecarRows() == 2)

    // crash during step (1): __new has no _SUCCESS — the old list stays
    // authoritative and the orphan is dropped
    JFiles.move(deleted, old)
    JFiles.createDirectory(nw) // incomplete rewrite (no _SUCCESS)
    assert(AnnIndex.hasDeleted(dir), "incomplete __new must roll back")
    assert(sidecarRows() == 2)
    assert(!JFiles.isDirectory(old) && !JFiles.isDirectory(nw))

    // crash after step (3): stray __old next to a live dir is dropped
    spark.read.parquet(deleted.toString).limit(1).write
      .mode("overwrite").parquet(old.toString)
    assert(AnnIndex.hasDeleted(dir))
    assert(!JFiles.isDirectory(old))
    assert(sidecarRows() == 2)
    emb.unpersist()
  }
}

/** Pure-ledger check kept out of the Spark test body. */
private object AnnDriftStatsProbe {
  def deletedTrips(): Boolean =
    AnnIndex.AnnDriftStats(buildRows = 100, buildMeanCos = 0.9,
      appendedRows = 0, appendMeanCos = 0.0, deletedRows = 30)
      .needsRebuild()
}
