package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz: for random corpora under random micro-batch
  * slicings, the streaming near-dup operator must emit EXACTLY the batch
  * pipeline's pair set (ids and jaccard values both). The batch operator
  * is itself DuckDB-oracle-checked (`dd3`), so this transitively anchors
  * the streaming path to the exhaustive all-pairs oracle on corpora the
  * gate never sees — including heavy duplicate cliques, empty/short
  * texts, and singleton batches.
  */
class StreamingDedupFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  /** A corpus with planted structure: near-dup groups (a base sentence
    * plus light mutations), exact-dup cliques, unrelated docs, and a few
    * degenerate short/empty texts. */
  private def corpus(rnd: scala.util.Random): Seq[(Long, String)] = {
    var id = 0L
    def nextId() = { id += 1; id }
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    (0 until rnd.between(2, 5)).foreach { g =>
      val base = Vector.fill(rnd.between(8, 14))(words(rnd.nextInt(words.size)))
      (0 until rnd.between(2, 5)).foreach { m =>
        val text = if (m == 0) base else {
          // mutate one position; stays over the 0.7 jaccard threshold
          val i = rnd.nextInt(base.size)
          base.updated(i, words(rnd.nextInt(words.size)))
        }
        docs += nextId() -> text.mkString(" ")
      }
    }
    (0 until rnd.between(0, 3)).foreach { _ =>
      val text = Vector.fill(rnd.between(6, 10))(
        words(rnd.nextInt(words.size))).mkString(" ")
      (0 until rnd.between(2, 4)).foreach(_ => docs += nextId() -> text)
    }
    (0 until rnd.between(2, 6)).foreach { _ =>
      docs += nextId() -> Vector.fill(rnd.between(10, 20))(
        s"u${rnd.nextInt(100000)}").mkString(" ")
    }
    if (rnd.nextBoolean()) docs += nextId() -> ""
    if (rnd.nextBoolean()) docs += nextId() -> "solo"
    rnd.shuffle(docs.toSeq)
  }

  /** Random partition of the corpus into 1..5 ordered chunks. */
  private def slices(rnd: scala.util.Random,
      docs: Seq[(Long, String)]): Seq[Seq[(Long, String)]] = {
    val n = rnd.between(1, 6)
    val cuts = (Seq(0, docs.size) ++
      Seq.fill(n - 1)(rnd.nextInt(docs.size + 1))).sorted
    cuts.sliding(2).map { case Seq(a, b) => docs.slice(a, b) }.toSeq
      .filter(_.nonEmpty)
  }

  test("streaming == batch over 8 random corpora and slicings") {
    val rnd = new scala.util.Random(20260813L)
    (0 until 8).foreach { trial =>
      val docs = corpus(rnd)
      val chunks = slices(rnd, docs)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val sink = s"sdd_fuzz_$trial"
      val q = Dedup.streamingNearDupPairs(mem.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val streamed = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = Dedup.minhashNearDuplicates(
          docs.toDF("doc_id", "text"), minCollapseDups = Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed === batch,
        s"trial $trial: ${docs.size} docs in ${chunks.size} chunks")
    }
  }
}
