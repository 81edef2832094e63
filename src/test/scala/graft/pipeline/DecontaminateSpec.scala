package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination semantics on planted train/eval overlap. */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val evalDocs = Seq(
    (1000L, "the quick brown fox jumps over the lazy dog"),
    (1001L, "colorless green ideas sleep furiously tonight")
  ).toDF("doc_id", "text")

  private val train = Seq(
    // verbatim benchmark inclusion — every trigram contaminated
    (1L, "the quick brown fox jumps over the lazy dog"),
    // long doc QUOTING one benchmark line: overlap capped by the quote
    (2L, "in this essay we study how the quick brown fox jumps over the " +
      "lazy dog and draw several unrelated conclusions about many other " +
      "topics entirely of our own invention with no benchmark content"),
    // disjoint
    (3L, "completely unrelated prose about segment manifests and commits"),
    // short doc (< n tokens): single whole-doc shingle, not in eval
    (4L, "two words")
  ).toDF("doc_id", "text")

  test("overlapStats counts distinct contaminated grams per doc") {
    val st = Decontaminate.overlapStats(train, evalDocs, shingle = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: all 7 trigrams of the 9-token doc overlap
    assert(st(1L) == ((7L, 7L, 1.0)))
    // doc 2: some overlap (the quoted sentence), strictly partial
    val (g2, o2, r2) = st(2L)
    assert(o2 >= 7L && o2 < g2 && r2 > 0.0 && r2 < 0.5, st(2L))
    // doc 3: zero
    assert(st(3L)._2 == 0L && st(3L)._3 == 0.0)
    // doc 4: one whole-doc shingle, no overlap
    assert(st(4L) == ((1L, 0L, 0.0)))
  }

  test("decontaminate drops verbatim inclusions, keeps quoted + clean docs") {
    val kept = Decontaminate.decontaminate(train, evalDocs, shingle = 3,
      maxRatio = 0.5).select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(2L, 3L, 4L)))
  }

  test("streaming decontamination equals batch and runs stateless") {
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    mem.addData(train.as[(Long, String)].collect().toSeq: _*)
    mem.addData((5L, null: String)) // null text must survive, like batch
    val stream = mem.toDF().toDF("doc_id", "text")
    val out = Decontaminate.decontaminateStream(stream, evalDocs,
      shingle = 3, maxRatio = 0.5).select("doc_id")
    spark.catalog.dropTempView("dc_spec_sink")
    val q = out.writeStream.format("memory").queryName("dc_spec_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("dc_spec_sink").as[Long].collect().sorted
    val nullTrain = Seq((5L, null: String)).toDF("doc_id", "text")
    val batch = Decontaminate.decontaminate(train.union(nullTrain), evalDocs,
      shingle = 3, maxRatio = 0.5).select("doc_id").as[Long].collect().sorted
    assert(batch.contains(5L), "batch must keep the null-text doc")
    assert(streamed.sameElements(batch))
    // stateless by construction: zero stateful operators in EVERY batch
    // (recentProgress must be non-empty or the claim is untested)
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(_.stateOperators.isEmpty),
      q.recentProgress.map(_.json).mkString("\n"))
  }

  test("empty eval side keeps everything with zero overlap") {
    val kept = Decontaminate.decontaminate(train,
      evalDocs.filter(lit(false)), shingle = 3, maxRatio = 0.0)
    assert(kept.count() == train.count())
  }
}
