package graft.codec

import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  private def unsignedSorted(codes: Seq[Long]): Boolean =
    codes.sliding(2).forall {
      case Seq(a, b) => java.lang.Long.compareUnsigned(a, b) < 0
      case _ => true
    }

  test("codeLong is monotone into u64 order") {
    val vs = Seq(Long.MinValue, -1000000L, -1L, 0L, 1L, 42L, Long.MaxValue)
    assert(unsignedSorted(vs.map(ZOrder.codeLong)))
  }

  test("codeDouble is monotone (negatives, zeros, infinities)") {
    val vs = Seq(Double.NegativeInfinity, -1e300, -2.5, -Double.MinPositiveValue,
      0.0, Double.MinPositiveValue, 1.0, 2.5, 1e300, Double.PositiveInfinity)
    assert(unsignedSorted(vs.map(ZOrder.codeDouble)))
    // -0.0 canonicalizes to +0.0 (SQL equality)
    assert(ZOrder.codeDouble(-0.0) == ZOrder.codeDouble(0.0))
  }

  test("codeUtf8 is monotone with UTF-8 byte order on short strings") {
    val vs = Seq("", "A", "Aa", "B", "a", "aa", "ab", "b", "é", "中")
    val codes = vs.map(s =>
      ZOrder.codeUtf8(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    codes.sliding(2).zip(vs.sliding(2)).foreach {
      case (Seq(a, b), Seq(x, y)) =>
        assert(java.lang.Long.compareUnsigned(a, b) <= 0,
          s"codeUtf8('$x') !<= codeUtf8('$y')")
      case _ => ()
    }
  }

  test("zValueBits interleaves dim 0 most significant") {
    // k=2, bits=2: (x1 y1 x0 y0)
    assert(ZOrder.zValueBits(Array(0L, 0L), 2) == 0L)
    assert(ZOrder.zValueBits(Array(3L, 0L), 2) == 10L) // 1010
    assert(ZOrder.zValueBits(Array(0L, 3L), 2) == 5L) // 0101
    assert(ZOrder.zValueBits(Array(2L, 1L), 2) == 9L) // 1001
  }

  test("zValue matches zValueBits on truncated codes") {
    val codes = Array(ZOrder.codeLong(123456789L), ZOrder.codeLong(-42L))
    val bits = ZOrder.bitsPerDim(2)
    assert(ZOrder.zValue(codes) ==
      ZOrder.zValueBits(codes.map(ZOrder.truncate(_, bits)), bits))
    assert(ZOrder.zValue(codes) >= 0L)
  }

  /** Exhaustive 2-dim oracle: with an unconstrained budget the quadtree
    * cover is EXACT — a point's z lies in the cover iff the point is in
    * the box — and the cover is sorted, disjoint, and merged. */
  test("zRanges exact cover, exhaustive at k=2 bits=4") {
    val bits = 4
    val n = 1 << bits
    val zOf = Array.tabulate(n, n)((x, y) =>
      ZOrder.zValueBits(Array(x.toLong, y.toLong), bits))
    for (xl <- 0 until n; xh <- xl until n; yl <- 0 until n; yh <- yl until n) {
      val rs = ZOrder.zRanges(Array(xl.toLong, yl.toLong),
        Array(xh.toLong, yh.toLong), bits, maxRanges = Int.MaxValue)
      assert(rs.sliding(2).forall {
        case Seq(a, b) => a._2 + 1 < b._1 // sorted, disjoint, merged
        case _ => true
      }, s"cover not sorted/merged for box ($xl-$xh, $yl-$yh): $rs")
      var x = 0
      while (x < n) {
        var y = 0
        while (y < n) {
          val z = zOf(x)(y)
          val inBox = x >= xl && x <= xh && y >= yl && y <= yh
          val inCover = rs.exists(r => z >= r._1 && z <= r._2)
          assert(inBox == inCover,
            s"box ($xl-$xh, $yl-$yh) point ($x,$y) z=$z inBox=$inBox inCover=$inCover")
          y += 1
        }
        x += 1
      }
    }
  }

  test("zRanges budget coarsens soundly and stays bounded") {
    val bits = 8
    val rs = ZOrder.zRanges(Array(3L, 200L), Array(130L, 230L), bits, maxRanges = 8)
    assert(rs.length <= 16, s"budget blown: ${rs.length} ranges")
    // soundness: every box point's z is covered
    for (x <- 3L to 130L; y <- 200L to 230L) {
      val z = ZOrder.zValueBits(Array(x, y), bits)
      assert(rs.exists(r => z >= r._1 && z <= r._2), s"($x,$y) uncovered")
    }
  }

  test("zRanges exhaustive at k=3 bits=3") {
    val bits = 3
    val n = 1 << bits
    val box = (Array(1L, 0L, 5L), Array(6L, 3L, 7L))
    val rs = ZOrder.zRanges(box._1, box._2, bits, maxRanges = Int.MaxValue)
    for (x <- 0 until n; y <- 0 until n; w <- 0 until n) {
      val z = ZOrder.zValueBits(Array(x.toLong, y.toLong, w.toLong), bits)
      val inBox = x >= 1 && x <= 6 && y <= 3 && w >= 5
      assert(inBox == rs.exists(r => z >= r._1 && z <= r._2), s"($x,$y,$w)")
    }
  }

  test("scaledCode: full per-dim resolution on narrow domains, clamped outside") {
    val bits = ZOrder.bitsPerDim(2) // 31
    // domain 0..99: range 99 needs 7 bits → shift 0, codes ARE the offsets
    val minC = ZOrder.codeLong(0L)
    val shift = ZOrder.shiftFor(ZOrder.codeLong(99L) - minC, bits)
    assert(shift == 0)
    assert((0L to 99L).map(v =>
      ZOrder.scaledCode(ZOrder.codeLong(v), minC, shift, bits)) == (0L to 99L))
    // below min clamps to 0, far above max clamps to the cell ceiling
    assert(ZOrder.scaledCode(ZOrder.codeLong(-5L), minC, shift, bits) == 0L)
    assert(ZOrder.scaledCode(ZOrder.codeLong(Long.MaxValue), minC, shift, bits) ==
      (1L << bits) - 1)
    // monotone at any shift
    val wideShift = ZOrder.shiftFor(
      ZOrder.codeLong(Long.MaxValue) - ZOrder.codeLong(Long.MinValue), bits)
    val samples = Seq(Long.MinValue, -1L, 0L, 1L, 1L << 40, Long.MaxValue)
    val scaled = samples.map(v => ZOrder.scaledCode(
      ZOrder.codeLong(v), ZOrder.codeLong(Long.MinValue), wideShift, bits))
    assert(scaled == scaled.sorted)
  }

  test("zValueScaled equals zValueBits over scaled codes") {
    val mins = Array(ZOrder.codeLong(10L), ZOrder.codeLong(-50L))
    val shifts = Array(0, 1)
    val codes = Array(ZOrder.codeLong(42L), ZOrder.codeLong(13L))
    val bits = ZOrder.bitsPerDim(2)
    val expected = ZOrder.zValueBits(
      Array(
        ZOrder.scaledCode(codes(0), mins(0), shifts(0), bits),
        ZOrder.scaledCode(codes(1), mins(1), shifts(1), bits)), bits)
    assert(ZOrder.zValueScaled(codes, mins, shifts) == expected)
  }

  test("ZDim round-trips through serialization, legacy form parses") {
    val dims = Seq(ZDim("a", -123456789L, 7), ZDim("b", 0L, 0))
    assert(ZDim.parse(ZDim.serialize(dims), 31) == dims)
    assert(ZDim.parse("a,b", 31) ==
      Seq(ZDim.legacy("a", 31), ZDim.legacy("b", 31)))
  }

  test("full-domain box covers [0, maxZ] in one range") {
    val bits = ZOrder.bitsPerDim(2)
    val full = (1L << bits) - 1
    val rs = ZOrder.zRanges(Array(0L, 0L), Array(full, full), bits)
    assert(rs == IndexedSeq((0L, ZOrder.maxZ(2))))
  }
}
