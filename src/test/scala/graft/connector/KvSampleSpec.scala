package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pushed TABLESAMPLE (SupportsPushDownTableSample): a deterministic
  * per-KEY Bernoulli applied in the cursor before value decode. Hashing
  * the encoded composite key — not a per-row RNG stream — is what makes
  * sampling correct on a merge-on-read store: every generation of a
  * key draws the same verdict, so upserts, tombstones, and compaction
  * never change a sample. */
class KvSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graftkv_sample_$tag").toString + "/t"

  private def pushedSample(df: DataFrame): Boolean =
    graft.PlanTestUtils.kvScans(df).exists(_.description().contains("sample="))

  private def hasSampleExec(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Sample")

  test("df.sample pushes into the scan: no Sample node, band-correct, deterministic") {
    val path = tmpDir("basic")
    spark.range(20000).select(col("id").as("k"), (col("id") % 100).as("x"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    def q = KvCommands.table(spark, path).sample(0.2, 4242L)
    assert(pushedSample(q), "sample did not push")
    assert(!hasSampleExec(q), "pushed sample must remove Spark's Sample node")
    val rows = q.collect()
    // binomial band: sd = sqrt(.2*.8/20000) ~ 0.0028; 5 sd is generous
    assert(math.abs(rows.length / 20000.0 - 0.2) < 0.015, s"${rows.length}")
    // deterministic: the same seed yields the same rows, twice
    assert(q.collect().map(_.getLong(0)).sorted.sameElements(
      rows.map(_.getLong(0)).sorted))
    // a different seed yields a different subset
    val other = KvCommands.table(spark, path).sample(0.2, 99L)
      .collect().map(_.getLong(0)).toSet
    assert(other != rows.map(_.getLong(0)).toSet)
    // every sampled row is a real row
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) % 100))
  }

  test("sample composes with pushed filters and stays a subset") {
    val path = tmpDir("filter")
    spark.range(10000).select(col("id").as("k"), (col("id") % 7).as("x"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    val full = KvCommands.table(spark, path).sample(0.3, 7L)
      .collect().map(_.getLong(0)).toSet
    // sample-then-filter: Spark pushes the Sample (it sits directly on
    // the relation) and then pushes the filter into the same scan
    val filtered = KvCommands.table(spark, path).sample(0.3, 7L)
      .filter(col("k") >= 2000 && col("k") < 5000)
    assert(pushedSample(filtered))
    val got = filtered.collect().map(_.getLong(0)).toSet
    // per-key hashing: the filtered sample IS the full sample's slice
    assert(got == full.filter(k => k >= 2000 && k < 5000))
    // filter-then-sample keeps Spark's own Sample node (the pushdown
    // contract only reaches a Sample directly above the relation) —
    // results still land in the band, just from Spark's sampler
    val notPushed = KvCommands.table(spark, path)
      .filter(col("k") < 5000).sample(0.3, 7L)
    assert(!pushedSample(notPushed))
    assert(math.abs(notPushed.count() / 5000.0 - 0.3) < 0.03)
  }

  test("sampling is generation-consistent: upserts/compaction never change it") {
    val path = tmpDir("gen")
    spark.range(5000).select(col("id").as("k"), lit(1L).as("x"))
      .write.format("graftkv").option("key", "k").mode("overwrite").save(path)
    def sampleKeys() = KvCommands.table(spark, path).sample(0.25, 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val before = sampleKeys()
    // overwrite a slice of keys (overlapping generation) and delete some
    KvCommands.append(spark.range(1000).select(col("id").as("k"),
      lit(2L).as("x")), path)
    KvCommands.delete(spark, path, col("k") >= 4500)
    val after = sampleKeys()
    // same sampled KEY set (minus deletions), values from the new
    // generation — the merge ran on the sampled subset correctly
    assert(after.keySet == before.keySet.filter(_ < 4500))
    assert(after.forall { case (k, x) => x == (if (k < 1000) 2L else 1L) })
    // compaction makes the physical layout catch up; the sample must not move
    KvCommands.compact(spark, path)
    assert(sampleKeys() == after, "compaction changed the sample")
  }

  test("sample + limit and sample + orderBy/limit stay correct (no topN pushdown)") {
    val path = tmpDir("limit")
    spark.range(8000).select(col("id").as("k"), col("id").as("x"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "32768").mode("overwrite").save(path)
    val s = KvCommands.table(spark, path).sample(0.5, 5L)
    assert(s.limit(100).count() == 100,
      "limit over a pushed sample must still deliver the full limit")
    // top-k over the sample == driver-side sort of the sampled rows
    // (the metadata topN selection must NOT engage under a sample)
    val topk = s.orderBy(col("k").desc).limit(10).collect().map(_.getLong(0))
    val truth = s.collect().map(_.getLong(0)).sorted.reverse.take(10)
    assert(topk.sameElements(truth))
  }

  test("fuzz: the sampled read IS the hash predicate through random histories") {
    // the pushed sample's contract, pinned independently: keep iff
    // xxhash64(encoded composite key, seed) maps below the fraction.
    // Re-derive that predicate HERE (test-side, from the codec) and
    // check the sampled read equals the full read filtered by it after
    // every random upsert/delete/compaction — determinism is what makes
    // sampling reproducible across job retries at 100 TB.
    val rnd = new scala.util.Random(2024)
    val path = tmpDir("fuzz")
    val seed = 31L
    val frac = 0.3
    spark.range(2000).select(col("id").as("k"), col("id").as("x"))
      .write.format("graftkv").option("key", "k").mode("overwrite").save(path)
    val m = GraftKvMeta.read(path).get
    val codec = graft.store.RowCodec(m.schema, m.keys, m.encoding)
    def keepKey(k: Long): Boolean = {
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](k, 0L))
      val kb = codec.encodeKey(row)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        kb, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, kb.length, seed)
      (h >>> 11) * 1.1102230246251565e-16 < frac
    }
    def check(round: Int): Unit = {
      val full = KvCommands.table(spark, path)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val sampled = KvCommands.table(spark, path).sample(frac, seed)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(sampled == full.filter { case (k, _) => keepKey(k) },
        s"round $round")
    }
    check(0)
    for (round <- 1 to 6) {
      rnd.nextInt(3) match {
        case 0 | 1 => KvCommands.append(
          spark.range(1 + rnd.nextInt(300)).select(
            (col("id") * (1 + rnd.nextInt(7))).as("k"),
            (col("id") + round * 10000).as("x")), path)
        case 2 =>
          val mdl = 2 + rnd.nextInt(5)
          KvCommands.delete(spark, path, col("k") % mdl === rnd.nextInt(mdl))
      }
      if (round % 2 == 0) KvCommands.compactMinor(spark, path)
      check(round)
    }
    KvCommands.compact(spark, path)
    check(99)
  }

  test("metadata aggregates refuse under a sample; plain count stays in band") {
    val path = tmpDir("agg")
    spark.range(30000).select(col("id").as("k"), (col("id") % 9).as("x"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    val c = KvCommands.table(spark, path).sample(0.1, 3L).count()
    assert(math.abs(c / 30000.0 - 0.1) < 0.01, s"$c")
  }
}
