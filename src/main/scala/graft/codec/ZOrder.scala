package graft.codec

import org.apache.spark.sql.types._

/** Z-order (Morton) clustering math for multi-dimensional kv tables
  * (extension scope — the reference keys strictly lexicographically; see
  * SURVEY §2.8). A z-clustered table's physical leading key is the bit
  * interleave of its clustering dimensions' order-preserving codes, so
  * a box predicate over the dimensions touches a set of z-intervals
  * whose total length shrinks geometrically with the box — at 100 TB a
  * `(customer BETWEEN …) AND (order BETWEEN …)` box reads the few
  * segments whose z-span intersects the box's quadtree cover instead of
  * the whole table (the classic multi-dim-on-a-sorted-store layout,
  * cf. Tropf & Herzog's BIGMIN; implemented here as a budgeted quadtree
  * range cover, which doubles as the reader's seek ranges).
  *
  * Everything operates on unsigned-comparable 64-bit "dim codes":
  * a monotone map from a dimension's value order onto u64 order,
  * derived from the same bit tricks as [[OrderedCodec]] (sign-bit flip
  * for integrals, IEEE negative-complement for floats, big-endian UTF-8
  * prefix for strings). Codes are LOSSY for strings (8-byte prefix) —
  * sound, because z pruning is always an over-approximation and the box
  * predicate itself stays residual-enforced row-by-row.
  */
object ZOrder {

  /** Interleaved bits per dimension: total interleaved bits k*bitsPerDim
    * stays ≤ 63 so a z-value is always a non-negative Long (signed order
    * = unsigned order, so the stored LongType key column sorts right). */
  def bitsPerDim(k: Int): Int = {
    require(k >= 2 && k <= 6, s"z-order wants 2..6 dimensions, got $k")
    63 / k
  }

  def totalBits(k: Int): Int = k * bitsPerDim(k)

  /** Largest z-value for k dims (all-ones interleave). */
  def maxZ(k: Int): Long = (1L << totalBits(k)) - 1

  // ── order-preserving u64 dim codes ───────────────────────────────────

  def codeLong(v: Long): Long = v ^ Long.MinValue

  def codeDouble(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (v == 0.0d) 0.0d else v)
    if (b < 0) ~b else b ^ Long.MinValue
  }

  def codeBoolean(v: Boolean): Long = if (v) Long.MinValue else 0L // u64: 2^63 > 0

  def codeUtf8(b: Array[Byte]): Long = {
    var r = 0L
    var i = 0
    while (i < 8) {
      r = (r << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    r
  }

  /** The u64 code of a (normalized, external-form) dimension value — the
    * same map the write-side [[graft.functions.ZValue]] expression
    * applies, so query-box codes and stored z-values agree. Null sorts
    * first (code 0), mirroring the key codec's null handling. */
  def dimCode(dt: DataType, v: Any): Long =
    if (v == null) 0L
    else dt match {
      case LongType | TimestampType | TimestampNTZType =>
        codeLong(v.asInstanceOf[Number].longValue())
      case IntegerType | DateType | ShortType | ByteType =>
        codeLong(v.asInstanceOf[Number].longValue())
      case DoubleType | FloatType => codeDouble(v.asInstanceOf[Number].doubleValue())
      case BooleanType => codeBoolean(v.asInstanceOf[Boolean])
      case _: StringType => codeUtf8(
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case BinaryType => codeUtf8(v.asInstanceOf[Array[Byte]])
      case other =>
        throw new IllegalArgumentException(s"unsupported z-order dimension type $other")
    }

  /** Truncate a u64 code to its top `bits` bits (monotone). */
  def truncate(code: Long, bits: Int): Long = code >>> (64 - bits)

  // ── per-dim range normalization ──────────────────────────────────────
  //
  // Raw u64 codes put all their entropy at the top, so top-bit
  // truncation collapses any dimension whose values span a small part
  // of the type's domain (ints 0..99 all share their top 31 bits). A
  // z-clustered table therefore records, per dim, the table's min code
  // and a shift sized to the observed code RANGE at create time; both
  // the write kernel and the query box pass values through the same
  // (subtract min, shift right, clamp) map, so codes use the full
  // per-dim resolution and out-of-range appends clamp consistently on
  // both sides (clustering degrades gracefully, correctness holds —
  // pruning is interval math over the same clamped codes rows store).

  /** Smallest shift s with (range >>> s) < 2^bits. */
  def shiftFor(range: Long, bits: Int): Int = {
    val significant = 64 - java.lang.Long.numberOfLeadingZeros(range)
    math.max(0, significant - bits)
  }

  /** Normalize a full u64 code into `bits`-wide resolution: unsigned
    * distance from `minCode`, shifted, clamped to [0, 2^bits-1]. */
  def scaledCode(code: Long, minCode: Long, shift: Int, bits: Int): Long = {
    if (java.lang.Long.compareUnsigned(code, minCode) <= 0) return 0L
    val scaled = (code - minCode) >>> shift // unsigned diff: code > minCode
    val max = (1L << bits) - 1
    if (java.lang.Long.compareUnsigned(scaled, max) > 0) max else scaled
  }

  /** z-value of full u64 dim codes under per-dim normalization — the
    * kernel a z-clustered table's `_z` column stores. */
  def zValueScaled(codes: Array[Long], mins: Array[Long],
      shifts: Array[Int]): Long = {
    val bits = bitsPerDim(codes.length)
    val t = new Array[Long](codes.length)
    var i = 0
    while (i < codes.length) {
      t(i) = scaledCode(codes(i), mins(i), shifts(i), bits)
      i += 1
    }
    zValueBits(t, bits)
  }

  // ── interleave ───────────────────────────────────────────────────────

  /** Interleave truncated codes (each `bits` wide) round-robin, dim 0
    * most significant — bit (bits-1-d) of dim j lands at interleaved
    * position (total-1 - (d*k + j)). */
  def zValueBits(trunc: Array[Long], bits: Int): Long = {
    val k = trunc.length
    var z = 0L
    var d = 0
    while (d < bits) {
      var j = 0
      while (j < k) {
        z = (z << 1) | ((trunc(j) >>> (bits - 1 - d)) & 1L)
        j += 1
      }
      d += 1
    }
    z
  }

  /** z-value of full u64 dim codes at the k-derived bit width. */
  def zValue(codes: Array[Long]): Long = {
    val bits = bitsPerDim(codes.length)
    zValueBits(codes.map(truncate(_, bits)), bits)
  }

  // ── box → z-range cover ──────────────────────────────────────────────

  /** Quadtree cover of the box `[boxLo(i), boxHi(i)]` (inclusive,
    * truncated codes, `bits` wide each) as sorted disjoint inclusive
    * z-ranges. Exact when the node budget suffices; once `maxRanges`
    * ranges are emitted, remaining subtrees emit their WHOLE z-interval
    * — a sound over-approximation that keeps the cover size bounded at
    * any bit width. Adjacent ranges merge, so the result is minimal for
    * downstream seek/early-stop use. */
  def zRanges(boxLo: Array[Long], boxHi: Array[Long], bits: Int,
      maxRanges: Int = 256): IndexedSeq[(Long, Long)] = {
    val k = boxLo.length
    require(boxHi.length == k && k >= 1 && bits * k <= 63)
    val total = bits * k
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

    def emit(z: Long, depth: Int): Unit = {
      val rem = total - depth
      val lo = z << rem
      val hi = lo + ((1L << rem) - 1)
      if (out.nonEmpty && out.last._2 + 1 == lo)
        out(out.length - 1) = (out.last._1, hi)
      else out += ((lo, hi))
    }

    // dimVal(i) = the dimBits(i) fixed top bits of dim i on this node's path
    def go(depth: Int, z: Long, dimVal: Array[Long], dimBits: Array[Int]): Unit = {
      var i = 0
      var contained = true
      while (i < k) {
        val sh = bits - dimBits(i)
        val lo = dimVal(i) << sh
        val hi = lo + ((1L << sh) - 1)
        if (lo > boxHi(i) || hi < boxLo(i)) return // disjoint: prune subtree
        if (lo < boxLo(i) || hi > boxHi(i)) contained = false
        i += 1
      }
      if (contained || depth == total || out.length >= maxRanges) emit(z, depth)
      else {
        val d = depth % k
        val v = dimVal(d)
        dimBits(d) += 1
        dimVal(d) = v << 1
        go(depth + 1, z << 1, dimVal, dimBits)
        dimVal(d) = (v << 1) | 1
        go(depth + 1, (z << 1) | 1, dimVal, dimBits)
        dimVal(d) = v
        dimBits(d) -= 1
      }
    }

    go(0, 0L, new Array[Long](k), new Array[Int](k))
    out.toIndexedSeq
  }
}

/** One z-clustering dimension as persisted in the table meta: column
  * name + the create-time code normalization (min code, right shift).
  * Serialized `name~minCode~shift`; a bare `name` (legacy) means the
  * un-normalized top-bit map. */
final case class ZDim(name: String, minCode: Long, shift: Int)

object ZDim {
  def legacy(name: String, bits: Int): ZDim = ZDim(name, 0L, 64 - bits)

  def serialize(dims: Seq[ZDim]): String =
    dims.map(d => s"${d.name}~${d.minCode}~${d.shift}").mkString(",")

  def parse(s: String, bits: Int): Seq[ZDim] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      part.split("~", -1) match {
        case Array(n, m, sh) => ZDim(n, m.toLong, sh.toInt)
        case Array(n) => legacy(n, bits)
        case _ => throw new IllegalStateException(s"corrupt z-dim spec '$part'")
      }
    }
}
