package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators: per-group quality top-k, stratified mixing,
  * sequence packing. Packing is order-dependent (not SQL-expressible),
  * so its invariants are pinned here instead of by the DuckDB gate. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topKPerGroup keeps the k best per group with deterministic ties") {
    val docs = Seq(
      (1L, "en", 10), (2L, "en", 30), (3L, "en", 30), (4L, "en", 5),
      (5L, "de", 7), (6L, "de", 9)
    ).toDF("doc_id", "lang", "score")
    val top2 = Curation.topKPerGroup(docs, "lang", "score", k = 2)
      .select("lang", "doc_id", "rank_in_group")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // en: scores 30,30 → tie broken by doc_id asc (2 before 3)
    assert(top2 == Set(("en", 2L, 1), ("en", 3L, 2), ("de", 6L, 1), ("de", 5L, 2)))
  }

  test("epochShuffle: reproducible permutation, complete shards, seed varies order") {
    val docs = spark.range(0, 3000).select(col("id").as("doc_id"),
      concat(lit("d"), col("id")).as("text"))
    val e1 = Curation.epochShuffle(docs, nShards = 8, seed = 3L)
      .select("doc_id", "shuffle_key", "shard", "pos_in_shard")
    val e2 = Curation.epochShuffle(docs, nShards = 8, seed = 3L)
      .select("doc_id", "shuffle_key", "shard", "pos_in_shard")
    // deterministic: same seed, same full assignment
    assert(e1.collect().map(_.toSeq).toSet == e2.collect().map(_.toSeq).toSet)
    val rows = e1.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // every doc exactly once
    assert(rows.map(_._1).toSet == (0L until 3000L).toSet)
    // positions are 0..count-1 contiguous within each shard
    rows.groupBy(_._3).foreach { case (shard, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (0L until rs.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // shards are roughly balanced (affine-mod-p spreads a dense id range)
    val sizes = rows.groupBy(_._3).values.map(_.length)
    assert(sizes.size == 8 && sizes.min > 3000 / 8 / 2, sizes.toSeq.toString)
    // a different seed produces a genuinely different order
    val e3 = Curation.epochShuffle(docs, nShards = 8, seed = 4L)
      .select("doc_id", "shard", "pos_in_shard").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val moved = rows.count { case (id, _, sh, pos) => e3(id) != ((sh, pos)) }
    assert(moved > 2000, s"seed change moved only $moved docs")
    // ids beyond the modulus still shuffle totally (tie-broken by id)
    val big = spark.range(0, 100)
      .select((col("id") * 1000000007L * 4 + col("id")).as("doc_id"))
    val eb = Curation.epochShuffle(big, nShards = 4, seed = 0L).collect()
    assert(eb.length == 100)
    // degenerate sharding (nShards=1: the whole corpus sorts in ONE
    // task — the sizing rule's worst case) stays correct, just
    // serial: one shard, a contiguous total order, the same relative
    // order the 8-shard run gives ids that share a shard there
    val one = Curation.epochShuffle(docs, nShards = 1, seed = 3L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("shard"), r.getAs[Long]("pos_in_shard")))
    assert(one.forall(_._2 == 0))
    assert(one.map(_._3).sorted.toSeq == (0L until 3000L).toSeq)
    val pos1 = one.map(t => t._1 -> t._3).toMap
    rows.groupBy(_._3).values.foreach { rs =>
      val inShard = rs.sortBy(_._4).map(_._1)
      assert(inShard.map(pos1).sorted.toSeq == inShard.map(pos1).toSeq,
        "shard-relative order must be a subsequence of the 1-shard order")
    }
    // shard-parallel plan: the position window partitions by shard
    // (one shuffle), never a global (empty-partition) sort
    val plan = Curation.epochShuffle(docs, nShards = 8, seed = 3L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected a window node")
    assert(!plan.contains(", [], ["),
      "position window must be shard-partitioned, not a global sort")
  }

  test("stratifiedSample is seed-deterministic and drops absent strata") {
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("zh").as("lang"))
    val frac = Map("en" -> 0.3)
    val a = Curation.stratifiedSample(docs, "lang", frac, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(docs, "lang", frac, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same seed must reproduce the same sample")
    val langs = Curation.stratifiedSample(docs, "lang", frac, seed = 7L)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"), "strata without a fraction are dropped")
    // 1000 en rows at 0.3: well within ±50% of expectation
    assert(a.size > 150 && a.size < 450, s"got ${a.size}")
  }

  test("packSequences: every doc packed once, budget respected, deterministic") {
    val docs = spark.range(0, 500).select(col("id").as("doc_id"),
      // texts of 1..40 whitespace tokens
      concat_ws(" ", array_repeat(lit("tok"), (col("id") % 40 + 1).cast("int")))
        .as("text"))
    val budget = 100
    val packed = Curation.packSequences(docs, budgetTokens = budget,
      numGroups = 8).collect()
    assert(packed.map(_.doc_id).toSet == (0L until 500L).toSet,
      "every document must appear in exactly one pack")
    val byPack = packed.groupBy(_.pack_id)
    byPack.foreach { case (pid, ds) =>
      val total = ds.map(_.n_tokens).sum
      assert(total <= budget || ds.length == 1,
        s"pack $pid holds $total tokens across ${ds.length} docs")
      // pack_seq is a contiguous 0-based walk in doc order
      assert(ds.sortBy(_.doc_id).map(_.pack_seq).toSeq == ds.indices,
        s"pack $pid has a non-contiguous sequence")
    }
    // deterministic run to run (fixed hash partitioning + in-partition sort)
    val again = Curation.packSequences(docs, budgetTokens = budget,
      numGroups = 8).collect()
    assert(again.map(p => (p.doc_id, p.pack_id, p.pack_seq)).toSet ==
      packed.map(p => (p.doc_id, p.pack_id, p.pack_seq)).toSet)
    // LAYOUT-INDEPENDENT (round-14): the assignment is a pure function
    // of (id mod numGroups, id order, token counts) — re-derive it in
    // plain Scala and match row for row. A physical-partition-derived
    // pack id (the pre-r14 scheme) cannot pass this.
    val expect = (0L until 500L).map(id => (id, (id % 40 + 1).toInt))
      .groupBy { case (id, _) => id % 8 }
      .flatMap { case (grp, ds) =>
        var local = -1L; var used = 0; var seq = 0; var open = false
        ds.sortBy(_._1).map { case (id, n) =>
          if (!open || used + n > budget) { local += 1; used = 0; seq = 0; open = true }
          used += n
          val out = (id, (grp << 32) | local, seq)
          seq += 1
          out
        }
      }.toSet
    assert(packed.map(p => (p.doc_id, p.pack_id, p.pack_seq)).toSet == expect)
  }

  test("splitByCluster: near-dup clusters never straddle the train/eval " +
      "boundary; singletons split by own id; deterministic") {
    val docs = spark.range(0, 400).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    // three planted clusters (chains and a pair) + 394 singletons
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), // cluster 1
      (10L, 11L, 0.8), // cluster 10
      (20L, 21L, 0.95), (21L, 22L, 0.95), (22L, 23L, 0.95) // cluster 20
    ).toDF("doc_a", "doc_b", "jaccard")
    val out = Curation.splitByCluster(docs, pairs, trainPct = 80, seed = 7L)
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 400)
    // every doc of a cluster shares the cluster id AND the side
    val byCluster = out.groupBy(_._2)
    assert(byCluster(1L).map(_._1).toSet == Set(1L, 2L, 3L))
    assert(byCluster(20L).map(_._1).toSet == Set(20L, 21L, 22L, 23L))
    byCluster.values.foreach(ds =>
      assert(ds.map(_._3).distinct.length == 1,
        s"cluster ${ds.head._2} straddles the split"))
    // singletons label themselves
    assert(out.find(_._1 == 100L).get._2 == 100L)
    // deterministic; a different seed moves a nontrivial fraction
    val again = Curation.splitByCluster(docs, pairs, trainPct = 80, seed = 7L)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.forall { case (id, _, s) => again(id) == s })
    val other = Curation.splitByCluster(docs, pairs, trainPct = 80, seed = 8L)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.count { case (id, _, s) => other(id) != s } > 20)
    // realized proportion tracks trainPct (cluster-weighted buckets)
    val trainFrac = out.count(_._3 == "train").toDouble / out.length
    assert(trainFrac > 0.65 && trainFrac < 0.95, s"train frac $trainFrac")
    // empty pair set: everything is a singleton, nothing is dropped
    val solo = Curation.splitByCluster(docs,
      Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "jaccard"),
      trainPct = 50, seed = 0L).collect()
    assert(solo.length == 400)
  }

  test("packStats reports fill ratios consistent with the packing") {
    val docs = spark.range(0, 200).select(col("id").as("doc_id"),
      concat_ws(" ", array_repeat(lit("t"), 10)).as("text")) // 10 tokens each
    val packed = Curation.packSequences(docs, budgetTokens = 50, numGroups = 4)
    val stats = Curation.packStats(packed, budgetTokens = 50).collect()
    // 10-token docs into 50-token packs → every full pack holds 5 docs
    assert(stats.forall(r => r.getLong(1) <= 5))
    assert(stats.forall(r => math.abs(
      r.getDouble(3) - r.getLong(2).toDouble / 50) < 1e-9))
    assert(stats.map(_.getLong(1)).sum == 200L)
  }

  test("curateCorpus gates quality, drops exact and near dups, then packs") {
    val long = ("spark native analytics engine builds sorted segment " +
      "stores with pruned columnar scans and pushed filters today") // 16 tok
    val docs = Seq(
      (0L, long),                       // survives (canonical)
      (1L, long),                       // exact dup of 0 → dropped
      (2L, long + " tonight"),          // near dup of 0 → dropped
      (3L, "too short to train on"),    // 5 tokens < gate → dropped
      (4L, "a completely different corpus document about stream " +
        "processing watermarks state stores and event time joins")
    ).toDF("doc_id", "text")
    val packed = Curation.curateCorpus(docs, minTokens = 10,
      budgetTokens = 512, threshold = 0.5)
    val kept = packed.collect().map(_.doc_id).toSet
    assert(kept == Set(0L, 4L), s"got $kept")
    // both fit one 512-token budget; pack ids are globally unique longs
    assert(packed.collect().forall(_.n_tokens <= 512))
  }

  test("chunkDocuments: overlap, short docs, covered-tail starts, empties") {
    val docs = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (1L, "a b c"), //                                  shorter than chunk
      (2L, "") //                                        no chunks
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocuments(docs, chunkTokens = 5, overlapTokens = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // doc 0: starts 1, 4, 7 (start 10 dropped — chunk@7 covers t7..t10)
    assert(got.filter(_._1 == 0L) == Seq(
      (0L, 1, "t1 t2 t3 t4 t5", 5),
      (0L, 2, "t4 t5 t6 t7 t8", 5),
      (0L, 3, "t7 t8 t9 t10", 4)))
    assert(got.filter(_._1 == 1L) == Seq((1L, 1, "a b c", 3)))
    assert(!got.exists(_._1 == 2L))
    // every token position is covered by at least one chunk
    val covered = got.filter(_._1 == 0L).flatMap { case (_, i, txt, n) =>
      val start = 1 + (i - 1) * 3
      start until (start + n)
    }.toSet
    assert(covered == (1 to 10).toSet)
  }

  test("mixtureFractions: binding stratum keeps all, others hit the target") {
    // counts: a=100, b=200, c=50; target 0.5/0.25/0.25 →
    // T = min(100/0.5, 200/0.25, 50/0.25) = 200 (a and c both bind)
    val docs = spark.range(0, 350).select(col("id").as("doc_id"),
      when(col("id") < 100, "a").when(col("id") < 300, "b")
        .otherwise("c").as("src"))
    val fr = Curation.mixtureFractions(docs, "src",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    assert(fr("a") == 1.0 && fr("c") == 1.0)
    assert(math.abs(fr("b") - 0.25) < 1e-12, fr)
    // absent stratum: weight on a source with zero rows never divides
    val fr2 = Curation.mixtureFractions(docs, "src",
      Map("a" -> 0.5, "nope" -> 0.5))
    assert(fr2 == Map("a" -> 1.0), fr2)
    // resample realizes the mixture: a kept whole, b ≈ 50 of 200
    val sampled = Curation.mixtureResample(docs, "src",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), seed = 7L)
    val byS = sampled.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("a") == 100 && byS("c") == 50, byS)
    assert(math.abs(byS("b") - 50.0) <= 4.0 * math.sqrt(200 * 0.25 * 0.75) + 1,
      byS)
    // NON-DYADIC weights: w·(n/w)/n evaluates to 0.999…9 in floating
    // point — the binding stratum's fraction must still be EXACTLY 1.0
    // (keeps-everything is a documented invariant, not a statistical one)
    val fr3 = Curation.mixtureFractions(docs, "src",
      Map("a" -> (1.0 / 3.0), "b" -> (2.0 / 3.0)))
    assert(fr3("a") == 1.0, fr3) // T = min(300, 300) — both bind
    assert(fr3("b") == 1.0, fr3)
    val fr4 = Curation.mixtureFractions(docs, "src",
      Map("a" -> (1.0 / 3.0), "b" -> (1.0 / 3.0), "c" -> (1.0 / 3.0)))
    assert(fr4("c") == 1.0, fr4) // c binds: T = 150
    assert(math.abs(fr4("a") - 0.5) < 1e-12 &&
      math.abs(fr4("b") - 0.25) < 1e-12, fr4)
  }
}
