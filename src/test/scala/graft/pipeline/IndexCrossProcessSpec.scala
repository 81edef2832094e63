package graft.pipeline

import graft.TestSpark
import graft.io.SidecarFs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS maintenance fuzz for the two durable indexes: a forked
  * JVM (own Spark session) streams append batches into a MinHash dedup
  * index and an IVF ANN index while this JVM compacts them in a loop.
  * The per-index maintenance lease (KvMaintenance.withLease) is the
  * only thing arbitrating — in-JVM locks can't see the child. Without
  * it, any append landing between a compactor's snapshot read and its
  * directory swap is silently deleted with `__old`.
  *
  * Pass criteria (the r14 verdict's item-5 contract): no lost rows on
  * either index, no duplicate ids, probes exact after the dust
  * settles, and a crashed compaction swap heals on the next probe. */
class IndexCrossProcessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scheme-qualified (file:) paths — the same Hadoop resolution the
    * indexes use on shared storage; `java.nio` would treat these as
    * relative paths, so passing proves the Hadoop path is exercised. */
  private def schemeTmp(tag: String): String =
    "file:" + java.nio.file.Files.createTempDirectory(s"graft_$tag")
      .toAbsolutePath

  /** The parent test JVM was forked with Spark's JDK-17 --add-opens
    * set; the child SparkSession needs the same flags. */
  private def inheritedJvmFlags: Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
  }

  test("forked-JVM ingest races parent compaction on BOTH index types: " +
      "no lost rows, no dup ids, probes exact") {
    val root = schemeTmp("idx_xproc")
    val mhDir = root + "/mh"
    val annDir = root + "/ann"

    // seed both indexes from the parent
    val seedDocs = (0 until 40).map { i =>
      (i.toLong, s"seed document $i with tokens ${i * 7} ${i * 13} " +
        s"${i * 29} trailing words for shingling")
    }.toDF("doc_id", "text")
    Dedup.buildMinhashIndex(seedDocs, mhDir)
    val seedVecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 17 - 8).toFloat +
        (if (d == 0) (i % 997) / 1000.0f else 0f)))
    }.toDF("vec_id", "embedding")
    AnnIndex.build(seedVecs, annDir, dim = 8, nPlanes = 16, nCentroids = 4)

    val nBatches = 5
    val rows = 20
    val base = 1000L
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ inheritedJvmFlags ++ Seq(
      "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.pipeline.IndexMaintFuzzMain",
      mhDir, annDir, base.toString, nBatches.toString, rows.toString)
    val child = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).start()
    val drain = new Thread(() =>
      child.getInputStream.transferTo(java.io.OutputStream.nullOutputStream()))
    drain.setDaemon(true); drain.start()

    // compact both indexes in a loop while the child is appending —
    // every iteration is a full snapshot-rewrite-swap racing the
    // child's append commits, serialized only by the lease
    var compactions = 0
    while (child.isAlive) {
      Dedup.compactMinhashIndex(spark, mhDir, targetRowsPerFile = 64L)
      AnnIndex.compactAnnIndex(spark, annDir, targetRowsPerFile = 64L)
      compactions += 1
    }
    assert(child.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "child JVM timed out")
    assert(child.exitValue() == 0, "child JVM failed")
    assert(compactions > 0, "no compaction actually raced the child")
    // one more of each so the final layout is post-race deterministic
    Dedup.compactMinhashIndex(spark, mhDir, targetRowsPerFile = 64L)
    AnnIndex.compactAnnIndex(spark, annDir, targetRowsPerFile = 64L)

    val expected = 40L + nBatches.toLong * rows

    // MinHash: every id present exactly once
    val mhIds = spark.read.parquet(s"$mhDir/minhash").select("doc_id")
    assert(mhIds.count() == expected, "minhash index lost or duped rows")
    assert(mhIds.distinct().count() == expected)
    // probe exactness: a batch duplicating one child doc's text must
    // surface exactly that near-dup pair (and nothing else)
    val dupOf = base + 7
    val probe = Seq((900000L,
      s"child document $dupOf with tokens ${dupOf * 7} ${dupOf * 13} " +
        s"${dupOf * 29} trailing words for shingling")).toDF("doc_id", "text")
    val pairs = Dedup.dedupAgainstIndex(probe, mhDir, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((dupOf, 900000L)), s"probe pairs: $pairs")

    // ANN: every id present exactly once, probe of a child vector is
    // exact (top-1 = itself at cosine 1)
    val annIds = spark.read.parquet(annDir).select("vec_id")
    assert(annIds.count() == expected, "ann index lost or duped rows")
    assert(annIds.distinct().count() == expected)
    val qid = base + (nBatches - 1).toLong * rows + 3
    val q = Array.tabulate(8)(d => ((qid * 31 + d * 7) % 17 - 8).toFloat +
      (if (d == 0) (qid % 997) / 1000.0f else 0f))
    val top = AnnIndex.ivfTopK(spark, annDir, q.toSeq, k = 1, nProbe = 4)
      .select("vec_id").as[Long].head()
    assert(top == qid, s"ANN probe returned $top, expected $qid")

    SidecarFs.deleteRecursively(root)
  }

  test("a crashed MinHash compaction swap heals on the next probe") {
    val root = schemeTmp("mh_heal")
    val mhDir = root + "/mh"
    val docs = (0 until 30).map { i =>
      (i.toLong, s"heal document $i with tokens ${i * 7} ${i * 13} " +
        s"${i * 29} trailing words for shingling")
    }.toDF("doc_id", "text")
    Dedup.buildMinhashIndex(docs, mhDir)
    // simulate a crash BETWEEN the two swap moves: committed __compact
    // beside a live dir moved out to __old — the loud no-live state
    val live = s"$mhDir/minhash"
    spark.read.parquet(live).write.mode("overwrite")
      .parquet(s"$mhDir/minhash__compact")
    SidecarFs.move(live, s"$mhDir/minhash__old")
    assert(!SidecarFs.isDirectory(live))
    // the next probe must roll the swap forward and answer exactly
    val dupOf = 11L
    val probe = Seq((900000L,
      s"heal document $dupOf with tokens ${dupOf * 7} ${dupOf * 13} " +
        s"${dupOf * 29} trailing words for shingling")).toDF("doc_id", "text")
    val pairs = Dedup.dedupAgainstIndex(probe, mhDir, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((dupOf, 900000L)), s"probe pairs: $pairs")
    assert(SidecarFs.isDirectory(live), "swap not rolled forward")
    assert(!SidecarFs.isDirectory(s"$mhDir/minhash__old"))
    SidecarFs.deleteRecursively(root)
  }
}
