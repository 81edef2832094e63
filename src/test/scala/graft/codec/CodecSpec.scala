package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the order-preserving codec: encoded unsigned-byte
  * comparison must equal value comparison, and decode must invert encode
  * — for every supported type, including the IEEE edge cases the
  * reference flags as hard (NaN, ±0.0, ±Inf). Seeded random sampling
  * (1000 cases per property) instead of scalacheck's harness, which the
  * offline build can't wire into scalatest. */
class CodecSpec extends AnyFunSuite {

  private val N = 1000
  private def sign(i: Int): Int = Integer.signum(i)

  test("long: round-trip and order") {
    val r = new Random(1)
    val interesting = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    val vals = interesting ++ Seq.fill(N)(r.nextLong())
    for (a <- vals) assert(OrderedCodec.decodeLong(OrderedCodec.encodeLong(a)) == a)
    for (_ <- 1 to N) {
      val (a, b) = (r.nextLong(), r.nextLong())
      assert(sign(OrderedCodec.compare(OrderedCodec.encodeLong(a), OrderedCodec.encodeLong(b)))
        == sign(java.lang.Long.compare(a, b)))
    }
  }

  test("int/short/byte: round-trip and order") {
    val r = new Random(2)
    for (_ <- 1 to N) {
      val (a, b) = (r.nextInt(), r.nextInt())
      assert(OrderedCodec.decodeInt(OrderedCodec.encodeInt(a)) == a)
      assert(sign(OrderedCodec.compare(OrderedCodec.encodeInt(a), OrderedCodec.encodeInt(b)))
        == sign(Integer.compare(a, b)))
      val (s1, s2) = (a.toShort, b.toShort)
      assert(OrderedCodec.decodeShort(OrderedCodec.encodeShort(s1)) == s1)
      assert(sign(OrderedCodec.compare(OrderedCodec.encodeShort(s1), OrderedCodec.encodeShort(s2)))
        == sign(java.lang.Short.compare(s1, s2)))
      val (b1, b2) = (a.toByte, b.toByte)
      assert(OrderedCodec.decodeByte(OrderedCodec.encodeByte(b1)) == b1)
      assert(sign(OrderedCodec.compare(OrderedCodec.encodeByte(b1), OrderedCodec.encodeByte(b2)))
        == sign(java.lang.Byte.compare(b1, b2)))
    }
  }

  test("double: round-trip and IEEE total order incl. edge cases") {
    val edge = Seq(Double.NegativeInfinity, -Double.MaxValue, -1.5, -0.0, 0.0,
      Double.MinPositiveValue, 1.5, Double.MaxValue, Double.PositiveInfinity, Double.NaN)
    for (a <- edge; b <- edge) {
      assert(sign(OrderedCodec.compare(OrderedCodec.encodeDouble(a), OrderedCodec.encodeDouble(b)))
        == sign(java.lang.Double.compare(a, b)), s"order($a, $b)")
    }
    val r = new Random(3)
    for (_ <- 1 to N) {
      val a = java.lang.Double.longBitsToDouble(r.nextLong())
      val b = java.lang.Double.longBitsToDouble(r.nextLong())
      assert(java.lang.Double.compare(
        OrderedCodec.decodeDouble(OrderedCodec.encodeDouble(a)), a) == 0)
      assert(sign(OrderedCodec.compare(OrderedCodec.encodeDouble(a), OrderedCodec.encodeDouble(b)))
        == sign(java.lang.Double.compare(a, b)))
    }
  }

  test("float: round-trip and order") {
    val r = new Random(4)
    for (_ <- 1 to N) {
      val a = java.lang.Float.intBitsToFloat(r.nextInt())
      val b = java.lang.Float.intBitsToFloat(r.nextInt())
      assert(java.lang.Float.compare(
        OrderedCodec.decodeFloat(OrderedCodec.encodeFloat(a)), a) == 0)
      assert(sign(OrderedCodec.compare(OrderedCodec.encodeFloat(a), OrderedCodec.encodeFloat(b)))
        == sign(java.lang.Float.compare(a, b)))
    }
  }

  test("string: round-trip and order") {
    val r = new Random(5)
    def s() = r.alphanumeric.take(r.nextInt(12)).mkString
    for (_ <- 1 to N) {
      val (a, b) = (s(), s())
      assert(OrderedCodec.decodeString(OrderedCodec.encodeString(a))._1 == a)
      assert(sign(OrderedCodec.compare(OrderedCodec.encodeString(a), OrderedCodec.encodeString(b)))
        == sign(Integer.signum(a.compareTo(b))))
    }
  }

  test("compareUtf8 equals UTF-8 byte order incl. supplementary-plane chars") {
    val samples = Seq("", "a", "ab", "￿", "", "𐀀" /* U+10000 */,
      "😀" /* emoji */, "z￿", "z𐀀", "ß", "日本")
    for (a <- samples; b <- samples) {
      val byByte = Integer.signum(OrderedCodec.compare(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")))
      assert(Integer.signum(OrderedCodec.compareUtf8(a, b)) == byByte,
        s"compareUtf8(${a.codePoints().toArray.toSeq}, ${b.codePoints().toArray.toSeq})")
    }
  }

  test("string terminator keeps composite prefix order sound") {
    // ("ab", "c…") must sort before ("abc", "") at the byte level
    val k1 = OrderedCodec.encodeString("ab") ++ OrderedCodec.encodeString("c")
    val k2 = OrderedCodec.encodeString("abc") ++ OrderedCodec.encodeString("")
    assert(OrderedCodec.compare(k1, k2) < 0)
  }

  test("successor is strictly greater") {
    val r = new Random(6)
    for (_ <- 1 to N) {
      val a = Array.fill(r.nextInt(16))(r.nextInt().toByte)
      assert(OrderedCodec.compare(a, OrderedCodec.successor(a)) < 0)
    }
  }
}
