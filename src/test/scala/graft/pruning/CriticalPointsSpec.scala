package graft.pruning

import graft.pruning.TriEval._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of the pruning algebra — the pure counterparts of the
  * reference's CriticalPointsTestSuite (incl. its named edge cases
  * `k=8 OR k>8` and `k<8 AND k>8`). */
class CriticalPointsSpec extends AnyFunSuite {

  private def ranges(f: Filter*): Seq[ValueRange] =
    CriticalPoints.qualifiedRanges(f.toSeq, "k", LongType)

  private def mr(f: Filter*): CriticalPoints.MultiRange =
    CriticalPoints.MultiRange(ranges(f: _*), LongType)

  test("k = 8 OR k > 8 → [8] ∪ (8, ∞)") {
    val r = ranges(Or(EqualTo("k", 8L), GreaterThan("k", 8L)))
    assert(r == Seq(
      ValueRange.point(8L),
      ValueRange(Some(8L), loInc = false, None, hiInc = true)))
    val m = mr(Or(EqualTo("k", 8L), GreaterThan("k", 8L)))
    assert(!m.contains(7L) && m.contains(8L) && m.contains(100L))
    assert(!m.pastAll(7L) && !m.pastAll(1000000L))
  }

  test("k < 8 AND k > 8 → unsatisfiable (no qualified ranges)") {
    val r = ranges(LessThan("k", 8L), GreaterThan("k", 8L))
    assert(r.isEmpty)
    val m = mr(LessThan("k", 8L), GreaterThan("k", 8L))
    assert(!m.contains(8L) && m.pastAll(0L))
  }

  test("IN-list qualifies exactly the point ranges") {
    val r = ranges(In("k", Array(3L, 7L, 11L)))
    assert(r == Seq(3L, 7L, 11L).map(ValueRange.point))
    val m = mr(In("k", Array(3L, 7L, 11L)))
    assert(m.contains(7L) && !m.contains(5L))
    assert(m.pastAll(12L) && !m.pastAll(11L))
  }

  test("conjunctive band k >= 10 AND k < 20") {
    val m = mr(GreaterThanOrEqual("k", 10L), LessThan("k", 20L))
    assert(!m.contains(9L) && m.contains(10L) && m.contains(19L) && !m.contains(20L))
    assert(m.pastAll(20L))
  }

  test("NOT distributes three-valued: NOT(k < 8) keeps [8, ∞)") {
    val m = mr(Not(LessThan("k", 8L)))
    assert(!m.contains(7L) && m.contains(8L) && m.contains(9L))
  }

  test("no filters → full domain") {
    assert(ranges() == Seq(ValueRange.full))
  }

  test("filters on other columns don't constrain the dimension") {
    val r = ranges(EqualTo("other", 5L))
    assert(r == Seq(ValueRange.full))
  }

  test("three-valued eval over multi-dimensional segment bounds") {
    // segment with k1 pinned to 5, k2 spanning [10, 20]
    val bound = Map(
      "k1" -> Binding(LongType, ValueRange.point(5L)),
      "k2" -> Binding(LongType,
        ValueRange(Some(10L), loInc = true, Some(20L), hiInc = true)))
    // predicate on the second dimension prunes when provably false
    assert(TriEval.eval(And(EqualTo("k1", 5L), GreaterThan("k2", 25L)), bound) == TriEval.False)
    assert(TriEval.eval(And(EqualTo("k1", 5L), GreaterThan("k2", 15L)), bound) == TriEval.Unknown)
    assert(TriEval.eval(And(EqualTo("k1", 5L), GreaterThan("k2", 5L)), bound) == TriEval.True)
    // wrong leading point prunes regardless of the second dimension
    assert(TriEval.eval(EqualTo("k1", 6L), bound) == TriEval.False)
    // key columns are non-nullable: IsNull is decidable
    assert(TriEval.eval(IsNull("k1"), bound) == TriEval.False)
    assert(TriEval.eval(IsNotNull("k2"), bound) == TriEval.True)
  }

  test("string dimension ordering") {
    val r = CriticalPoints.qualifiedRanges(
      Seq(GreaterThanOrEqual("s", "m")), "s", StringType)
    val m = CriticalPoints.MultiRange(r, StringType)
    assert(!m.contains("a") && m.contains("m") && m.contains("z"))
  }
}
