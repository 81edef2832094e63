package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One ranked entry of a [[BoundedTopK]] result: the sort pair that
  * decided the ranking plus one opaque rider value. */
final case class TopKEntry(score: Double, id: Long, extra: Long)

/** Aggregation buffer / result: entries sorted best-first, length ≤ k. */
final case class TopKList(entries: Seq[TopKEntry])

/** Bounded top-k-per-group aggregate (round 16): the `row_number() OVER
  * (PARTITION BY g ORDER BY score DESC, id ASC) <= k` pattern as a real
  * aggregate with PARTIAL, map-side truncation.
  *
  * Why (guide §2.3, "aggregate before you shuffle"): Spark 4's
  * WindowGroupLimit optimization already bounds what the rank-filtered
  * window form shuffles, but its pipeline still SORTS the full
  * candidate set on the map side (below the partial group-limit) and
  * sorts again after the exchange. This aggregate keeps a ≤ k
  * best-first buffer per group in the map-side hash aggregate — no
  * sort on either side, O(1) rejection per non-qualifying row — and
  * the exchange moves at most k entries per (group, map task).
  * Measured ~8% wall on the 20k-vector knnJoin self-join (interleaved
  * same-process A/B, tools/AnnProbe); the structural win is sortless
  * single-pass truncation at any scale. `collect_list` +
  * `slice(sort_array)` has no partial truncation at all (the full
  * group crosses the wire), which is why it lost in the r15 pre-top-k
  * experiment.
  *
  * ORDER CONTRACT — identical to the window it replaces: score
  * descending with Spark SQL double semantics (NaN greatest, -0.0 equal
  * to 0.0), ties broken by id ascending. Inputs must have non-null
  * score and id (the consumers construct both; a null raises loudly
  * rather than silently diverging from the window's NULLS LAST
  * placement). The rejection fast path compares one candidate against
  * the current k-th entry, so a full buffer rejects in O(1).
  */
final case class BoundedTopK(k: Int) extends Aggregator[
    (java.lang.Double, java.lang.Long, java.lang.Long), TopKList, TopKList] {
  require(k >= 1, s"bounded_top_k needs k >= 1, got $k")

  /** -0.0 == 0.0, as SQL comparison semantics (Double.compare alone
    * would order them and could swap a tie's id-based winner). */
  @inline private def norm(d: Double): Double = if (d == 0.0) 0.0 else d

  /** Strict "ranks strictly before": score desc (NaN greatest, like
    * Spark's double ordering), then id asc. */
  @inline private def beats(s: Double, id: Long, t: TopKEntry): Boolean = {
    val c = java.lang.Double.compare(norm(s), norm(t.score))
    if (c != 0) c > 0 else id < t.id
  }

  override def zero: TopKList = TopKList(Vector.empty)

  override def reduce(b: TopKList, in: (java.lang.Double, java.lang.Long,
      java.lang.Long)): TopKList = {
    require(in._1 != null && in._2 != null,
      "bounded_top_k: null score or id (the window form would rank " +
        "NULLS LAST; pass a non-null sort pair)")
    insert(b, in._1.doubleValue, in._2.longValue,
      if (in._3 == null) 0L else in._3.longValue)
  }

  private def insert(b: TopKList, s: Double, id: Long, ex: Long): TopKList = {
    val es = b.entries
    if (es.length >= k && !beats(s, id, es.last)) b // O(1) reject
    else {
      val i = es.indexWhere(e => beats(s, id, e)) match {
        case -1 => es.length
        case x => x
      }
      TopKList(((es.take(i) :+ TopKEntry(s, id, ex)) ++ es.drop(i)).take(k))
    }
  }

  override def merge(x: TopKList, y: TopKList): TopKList =
    y.entries.foldLeft(x)((acc, e) => insert(acc, e.score, e.id, e.extra))

  override def finish(b: TopKList): TopKList = b

  override def bufferEncoder: Encoder[TopKList] = Encoders.product[TopKList]
  override def outputEncoder: Encoder[TopKList] = Encoders.product[TopKList]
}

object BoundedTopK {

  /** Conf toggle for every bounded-top-k consumer (A/B evidence +
    * escape hatch); default on. */
  val ToggleKey = "spark.graft.topkAggregate"

  /** `bounded_top_k(k, score, id, extra)` as an aggregate Column:
    * array<struct<score,id,extra>> of the group's top k by (score desc,
    * id asc), best first — unwrap with posexplode for (row, rank). */
  def bounded_top_k(k: Int, score: Column, id: Column,
      extra: Column): Column =
    udaf(BoundedTopK(k), Encoders.tuple(
      Encoders.DOUBLE, Encoders.LONG, Encoders.LONG))(score, id, extra)
      .getField("entries")
}
