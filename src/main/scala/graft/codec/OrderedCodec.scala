package graft.codec

import java.nio.charset.StandardCharsets

/** Order-preserving binary codec: for every supported type,
  * unsigned-lexicographic comparison of encodings equals value
  * comparison. This is what makes range pruning over raw composite keys
  * sound (reference semantics: /root/reference
  * src/main/scala/org/apache/spark/sql/hbase/util/bytesUtils.scala —
  * re-derived, not ported: sign-bit flip for integrals, monotone bit
  * trick for IEEE floats, NUL-terminated UTF-8 for strings).
  *
  * Pure Scala, no Spark dependencies; property-tested by CodecSpec.
  */
object OrderedCodec {

  // ── integral types: flip the sign bit, big-endian ──────────────────────

  def encodeLong(v: Long): Array[Byte] = {
    val x = v ^ Long.MinValue
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (x >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def decodeLong(b: Array[Byte], off: Int = 0): Long = {
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (b(off + i) & 0xffL); i += 1 }
    x ^ Long.MinValue
  }

  def encodeInt(v: Int): Array[Byte] = {
    val x = v ^ Int.MinValue
    Array((x >>> 24).toByte, (x >>> 16).toByte, (x >>> 8).toByte, x.toByte)
  }

  def decodeInt(b: Array[Byte], off: Int = 0): Int = {
    var x = 0
    var i = 0
    while (i < 4) { x = (x << 8) | (b(off + i) & 0xff); i += 1 }
    x ^ Int.MinValue
  }

  def encodeShort(v: Short): Array[Byte] = {
    val x = v ^ Short.MinValue
    Array((x >>> 8).toByte, x.toByte)
  }

  def decodeShort(b: Array[Byte], off: Int = 0): Short =
    ((((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)) ^ Short.MinValue).toShort

  def encodeByte(v: Byte): Array[Byte] = Array(((v ^ 0x80) & 0xff).toByte)
  def decodeByte(b: Array[Byte], off: Int = 0): Byte = ((b(off) & 0xff) ^ 0x80).toByte

  def encodeBoolean(v: Boolean): Array[Byte] = Array(if (v) 1.toByte else 0.toByte)
  def decodeBoolean(b: Array[Byte], off: Int = 0): Boolean = b(off) != 0

  // ── IEEE floats: monotone total-order bit trick ────────────────────────
  // non-negative → set sign bit; negative → invert all bits. Orders
  // -Inf < … < -0.0 < +0.0 < … < +Inf < NaN.

  def encodeDouble(v: Double): Array[Byte] = {
    var bits = java.lang.Double.doubleToLongBits(v)
    bits = if (bits >= 0) bits ^ Long.MinValue else ~bits
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (bits >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def decodeDouble(b: Array[Byte], off: Int = 0): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) { bits = (bits << 8) | (b(off + i) & 0xffL); i += 1 }
    bits = if (bits < 0) bits ^ Long.MinValue else ~bits
    java.lang.Double.longBitsToDouble(bits)
  }

  def encodeFloat(v: Float): Array[Byte] = {
    var bits = java.lang.Float.floatToIntBits(v)
    bits = if (bits >= 0) bits ^ Int.MinValue else ~bits
    Array((bits >>> 24).toByte, (bits >>> 16).toByte, (bits >>> 8).toByte, bits.toByte)
  }

  def decodeFloat(b: Array[Byte], off: Int = 0): Float = {
    var bits = 0
    var i = 0
    while (i < 4) { bits = (bits << 8) | (b(off + i) & 0xff); i += 1 }
    bits = if (bits < 0) bits ^ Int.MinValue else ~bits
    java.lang.Float.intBitsToFloat(bits)
  }

  // ── strings: UTF-8 + NUL terminator (composite-key-safe) ───────────────
  // A terminator after each non-final string key keeps prefix ordering
  // sound ("ab","c" < "abc","" at the byte level requires the 0x00).
  // UTF-8 itself is lexicographic-order-preserving for codepoints.

  def encodeString(v: String): Array[Byte] = {
    require(v.indexOf('\u0000') < 0,
      "string key values may not contain NUL (reserved as key terminator)")
    val utf = v.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](utf.length + 1)
    System.arraycopy(utf, 0, out, 0, utf.length)
    out(utf.length) = 0
    out
  }

  /** Returns (value, bytesConsumed incl. terminator). */
  def decodeString(b: Array[Byte], off: Int = 0): (String, Int) = {
    var end = off
    while (b(end) != 0) end += 1
    (new String(b, off, end - off, StandardCharsets.UTF_8), end - off + 1)
  }

  /** Compare two Strings in UTF-8 byte order without encoding them
    * (UTF-16 code-unit order disagrees for supplementary-plane
    * codepoints: surrogates sort below [U+E000, U+FFFF] in UTF-16 but
    * above them in UTF-8/codepoint order — remap both ranges before
    * comparing). Allocation-free: runs in the per-record seek path. */
  def compareUtf8(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        if (ca < 0xd800 || cb < 0xd800) return ca - cb
        val xa = if (ca >= 0xe000) ca - 0x800 else ca + 0x2000
        val xb = if (cb >= 0xe000) cb - 0x800 else cb + 0x2000
        return xa - xb
      }
      i += 1
    }
    a.length - b.length
  }

  // ── unsigned byte-array comparison (the store's key order) ─────────────

  def compare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Smallest byte array strictly greater than every array with prefix
    * `a` of the same length — `a` with a trailing 0x00 appended (for
    * turning inclusive point ranges into exclusive scan ends). */
  def successor(a: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length + 1)
    System.arraycopy(a, 0, out, 0, a.length)
    out
  }
}
