package graft.store

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the stringformat codec (reference StringBytesUtils,
  * bytesUtils.scala:251-358, + typed comparators, comparators.scala):
  * key/value round-trips must be lossless for every supported type, and
  * `compareKeys` must equal value-domain comparison even where byte order
  * disagrees ("10" < "9" lexicographically).
  */
class StringCodecSpec extends AnyFunSuite {

  private val N = 1000

  private val schema = StructType(Seq(
    StructField("k1", LongType, nullable = false),
    StructField("k2", StringType, nullable = false),
    StructField("v1", IntegerType, nullable = true),
    StructField("v2", DoubleType, nullable = true),
    StructField("v3", StringType, nullable = true),
    StructField("v4", BooleanType, nullable = true)))

  private val codec = RowCodec(schema, Seq("k1", "k2"), RowCodec.StringFormat)

  private def row(k1: Long, k2: String, v1: Any, v2: Any, v3: String, v4: Any) =
    new GenericInternalRow(Array[Any](k1, UTF8String.fromString(k2), v1, v2,
      if (v3 == null) null else UTF8String.fromString(v3), v4))

  test("key round-trip is lossless") {
    val r = new Random(11)
    for (_ <- 1 to N) {
      val k1 = r.nextLong()
      val k2 = r.alphanumeric.take(r.nextInt(10)).mkString
      val enc = codec.encodeKey(row(k1, k2, null, null, null, null))
      val dec = codec.decodeKey(enc)
      assert(dec(0) == k1)
      assert(dec(1).asInstanceOf[UTF8String].toString == k2)
    }
  }

  test("value round-trip is lossless incl. nulls and IEEE edge doubles") {
    val edge = Seq(Double.NegativeInfinity, -Double.MaxValue, -0.0, 0.0,
      Double.MinPositiveValue, 1.5, Double.MaxValue, Double.PositiveInfinity, Double.NaN)
    for (d <- edge) {
      val dec = codec.decodeValue(codec.encodeValue(row(1L, "x", 42, d, "s", true)))
      assert(java.lang.Double.compare(dec(1).asInstanceOf[Double], d) == 0, s"double $d")
    }
    val dec = codec.decodeValue(codec.encodeValue(row(1L, "x", null, null, null, null)))
    assert(dec.forall(_ == null))
    val r = new Random(12)
    for (_ <- 1 to N) {
      val (i, d) = (r.nextInt(), r.nextDouble() * 1e9 - 5e8)
      val s = r.alphanumeric.take(r.nextInt(10)).mkString
      val out = codec.decodeValue(codec.encodeValue(row(1L, "x", i, d, s, r.nextBoolean())))
      assert(out(0) == i)
      assert(out(1) == d)
      assert(out(2).asInstanceOf[UTF8String].toString == s)
    }
  }

  test("compareKeys is value order even where byte order disagrees") {
    // the canonical stringformat trap: "10" < "9" in bytes, 10 > 9 in value
    def key(k1: Long, k2: String) = codec.encodeKey(row(k1, k2, null, null, null, null))
    assert(codec.compareKeys(key(10L, "a"), key(9L, "a")) > 0)
    assert(codec.compareKeys(key(-5L, "a"), key(3L, "a")) < 0)
    assert(codec.compareKeys(key(7L, "ab"), key(7L, "b")) < 0)
    val r = new Random(13)
    for (_ <- 1 to N) {
      val (a1, b1) = (r.nextLong() % 100000, r.nextLong() % 100000)
      val (a2, b2) = (r.alphanumeric.take(3).mkString, r.alphanumeric.take(3).mkString)
      val expect = if (a1 != b1) java.lang.Long.compare(a1, b1) else a2.compareTo(b2)
      assert(Integer.signum(codec.compareKeys(key(a1, a2), key(b1, b2)))
        == Integer.signum(expect), s"($a1,$a2) vs ($b1,$b2)")
    }
  }

  test("compareKeys treats a leading-dim prefix as a floor bound") {
    def key(k1: Long, k2: String) = codec.encodeKey(row(k1, k2, null, null, null, null))
    val prefix = codec.encodeLeading(100L)
    assert(codec.compareKeys(key(99L, "zzz"), prefix) < 0)
    assert(codec.compareKeys(key(100L, ""), prefix) > 0) // extends the prefix
    assert(codec.compareKeys(key(101L, "a"), prefix) > 0)
  }

  test("binary codec tables reject nothing; stringformat rejects binary columns") {
    val withBin = schema.add("b", BinaryType)
    RowCodec(withBin, Seq("k1", "k2")) // fine in binary mode
    val e = intercept[IllegalArgumentException] {
      RowCodec(withBin, Seq("k1", "k2"), RowCodec.StringFormat)
    }
    assert(e.getMessage.contains("stringformat"))
  }

  test("writer enforces typed order for stringformat segments") {
    val dir = java.nio.file.Files.createTempDirectory("strfmt").toString
    val w = new SegmentFile.Writer(dir, "s0", indexEvery = 2, cmp = codec.compareKeys)
    def key(k1: Long) = codec.encodeKey(row(k1, "x", null, null, null, null))
    // value order 2 < 10 (byte order would reject: "10" < "2")
    w.write(key(2L), Array[Byte](1))
    w.write(key(10L), Array[Byte](1))
    w.write(key(11L), Array[Byte](1))
    val meta = w.close()
    assert(codec.decodeKey(meta.minKey)(0) == 2L)
    assert(codec.decodeKey(meta.maxKey)(0) == 11L)
    // floor lookup under the typed comparator
    val full = SegmentFile.readMeta(dir, "s0")
    assert(SegmentFile.floorOffset(full, codec.encodeLeading(1L), codec.compareKeys) == 0L)
  }
}
