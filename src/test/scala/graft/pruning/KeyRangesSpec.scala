package graft.pruning

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** KeyRanges — the bounded disjoint-range coalescing of a large runtime
  * IN set, and its three-valued evaluation against key/zone bindings. */
class KeyRangesSpec extends AnyFunSuite {

  private def binding(dt: DataType, lo: Any, hi: Any) = Map("k" ->
    TriEval.Binding(dt, TriEval.ValueRange(
      Some(TriEval.normalize(dt, lo)), loInc = true,
      Some(TriEval.normalize(dt, hi)), hiInc = true)))

  test("coalesce splits at the largest gaps for numeric types") {
    // two dense clusters with a huge gap between them; cap of 2 ranges
    val vals: Seq[Any] = (0L until 100L) ++ (100000L until 100100L)
    val kr = KeyRanges.coalesce("k", LongType, vals, maxRanges = 2).get
    assert(kr.los.toSeq == Seq(0L, 100000L))
    assert(kr.his.toSeq == Seq(99L, 100099L))
  }

  test("gaps spanning more than half the Long domain still split (no subtraction wrap)") {
    // raw Long subtraction would wrap negative here, ranking the
    // domain-wide gap as the SMALLEST — the splits would all land in
    // the dense runs and one range would span the whole domain
    val vals: Seq[Any] =
      (0L until 100L).map(Long.MinValue + _) ++ (0L until 100L).map(Long.MaxValue - _)
    val kr = KeyRanges.coalesce("k", LongType, vals, maxRanges = 2).get
    assert(kr.los.length == 2)
    assert(kr.his.toSeq(0) == Long.MinValue + 99L, kr.his.toSeq.toString)
    assert(kr.los.toSeq(1) == Long.MaxValue - 99L, kr.los.toSeq.toString)
  }

  test("a dense integer run collapses to one exact range at any cap") {
    val kr = KeyRanges.coalesce("k", LongType, (5L to 5000L), maxRanges = 3).get
    // largest gaps inside a dense run are all 1 — splits land somewhere,
    // but the union covers exactly [5, 5000]
    assert(kr.los.head == 5L && kr.his.last == 5000L)
    assert(kr.los.length <= 3)
  }

  test("duplicates and nulls are dropped; all-null yields None") {
    val kr = KeyRanges.coalesce("k", LongType,
      Seq(3L, null, 3L, 7L, 7L, null), maxRanges = 10).get
    assert(kr.los.toSeq == Seq(3L, 7L) && kr.his.toSeq == Seq(3L, 7L))
    assert(KeyRanges.coalesce("k", LongType, Seq(null, null), 4).isEmpty)
  }

  test("types without a numeric measure fall back to equal-count runs") {
    val vals: Seq[Any] = Seq("a", "b", "c", "m", "n", "z")
    val kr = KeyRanges.coalesce("k", StringType, vals, maxRanges = 2).get
    assert(kr.los.length == 2)
    assert(kr.los.head == "a" && kr.his.last == "z")
    // every original value is covered
    vals.foreach { v =>
      assert(kr.eval(binding(StringType, v, v)) == TriEval.True, v)
    }
  }

  test("eval: point bindings decide exactly") {
    val kr = KeyRanges("k", LongType, Array[Any](10L, 50L), Array[Any](20L, 60L))
    assert(kr.eval(binding(LongType, 15L, 15L)) == TriEval.True)
    assert(kr.eval(binding(LongType, 10L, 10L)) == TriEval.True)
    assert(kr.eval(binding(LongType, 20L, 20L)) == TriEval.True)
    assert(kr.eval(binding(LongType, 25L, 25L)) == TriEval.False)
    assert(kr.eval(binding(LongType, 5L, 5L)) == TriEval.False)
    assert(kr.eval(binding(LongType, 70L, 70L)) == TriEval.False)
  }

  test("eval: interval bindings — within / disjoint / straddling") {
    val kr = KeyRanges("k", LongType, Array[Any](10L, 50L), Array[Any](20L, 60L))
    // entirely inside one range → True
    assert(kr.eval(binding(LongType, 12L, 18L)) == TriEval.True)
    // in the gap between ranges → False (this IS the segment prune)
    assert(kr.eval(binding(LongType, 25L, 45L)) == TriEval.False)
    // below all / above all → False
    assert(kr.eval(binding(LongType, 0L, 5L)) == TriEval.False)
    assert(kr.eval(binding(LongType, 65L, 99L)) == TriEval.False)
    // straddles a boundary → Unknown (scan keeps it; join re-filters)
    assert(kr.eval(binding(LongType, 18L, 30L)) == TriEval.Unknown)
    assert(kr.eval(binding(LongType, 15L, 55L)) == TriEval.Unknown)
    // no binding for the column → Unknown
    assert(kr.eval(Map.empty) == TriEval.Unknown)
  }

  test("toValueRanges intersects with critical-point sets") {
    val kr = KeyRanges("k", LongType, Array[Any](10L, 50L), Array[Any](20L, 60L))
    val full = Seq(TriEval.ValueRange.full)
    val x = CriticalPoints.intersect(full, kr.toValueRanges, LongType)
    assert(x == kr.toValueRanges)
    val mr = CriticalPoints.MultiRange(x, LongType)
    assert(mr.contains(15L) && !mr.contains(30L) && mr.contains(60L))
    assert(mr.intersects(55L, 70L) && !mr.intersects(25L, 45L))
  }
}
