package graft.store

import graft.codec.OrderedCodec
import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binds a per-table codec to a Spark schema: composite-key encode/decode
  * and a value codec for non-key columns (null = flag byte, mirroring the
  * reference's null-as-absent-cell convention).
  *
  * Two encodings, selected per table (reference DDL `IN stringformat`,
  * HBaseSQLParser.scala:84,153):
  *
  *  - `binary` — order-preserving binary (reference binaryformat,
  *    util/bytesUtils.scala:25-248 semantics re-derived in OrderedCodec):
  *    unsigned byte order of encoded keys == composite value order.
  *  - `stringformat` — every field is its decimal/string representation
  *    (reference StringBytesUtils, util/bytesUtils.scala:251-358),
  *    NUL-terminated per key dimension. Byte order of numeric encodings
  *    is NOT value order ("10" < "9"), so everything that orders keys —
  *    the segment writer's sort check, sparse-index floor lookups —
  *    goes through [[compareKeys]], the typed-comparator path (reference
  *    util/comparators.scala:26-263: parse back, compare in the value
  *    domain). Segments stay sorted by VALUE order (Spark's ordered
  *    write delivers it), so range pruning over decoded min/max keys
  *    stays sound in both encodings.
  */
final case class RowCodec(schema: StructType, keyCols: Seq[String],
    encoding: String = RowCodec.Binary) {

  require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
    s"key columns $keyCols must exist in ${schema.fieldNames.mkString(",")}")
  require(RowCodec.Encodings.contains(encoding),
    s"unknown graftkv encoding '$encoding' (expected ${RowCodec.Encodings.mkString("/")})")

  private val isString = encoding == RowCodec.StringFormat

  val keyFields: Seq[StructField] = keyCols.map(schema(_))
  val valueFields: Seq[StructField] =
    schema.fields.toSeq.filterNot(f => keyCols.contains(f.name))
  /** ordinal in the full table schema for each key / value field */
  private val keyOrdinals = keyCols.map(schema.fieldIndex).toArray
  private val valueOrdinals = valueFields.map(f => schema.fieldIndex(f.name)).toArray

  if (isString) (keyFields ++ valueFields).foreach { f =>
    require(RowCodec.stringable(f.dataType),
      s"stringformat tables support primitive/string columns only; " +
        s"${f.name} is ${f.dataType.simpleString}")
  }

  // ── key side ───────────────────────────────────────────────────────────

  /** Canonical string form of one field value (stringformat cells/keys).
    * Round-trips exactly for every supported type because each value's
    * own toString IS the canonical form: integrals/micros/date-ints via
    * decimal digits, Double/Float via java.lang.*.toString (shortest
    * exact repr), booleans as true/false. */
  private def stringRepr(dt: DataType, v: Any): String = v.toString

  private def parseString(dt: DataType, s: String): Any = dt match {
    case LongType | TimestampType | TimestampNTZType => s.toLong
    case IntegerType | DateType => s.toInt
    case ShortType => s.toShort
    case ByteType => s.toByte
    case BooleanType => s.toBoolean
    case DoubleType => s.toDouble
    case FloatType => s.toFloat
    case _: StringType => UTF8String.fromString(s)
    case other => throw new IllegalArgumentException(s"unsupported stringformat type $other")
  }

  /** Canonicalize IEEE zeros in KEY positions: SQL equality (and the
    * normalized filter domain, TriEval.normalize) treats -0.0 = +0.0,
    * but both the order-preserving bit trick and the stringformat repr
    * separate them — a stored -0.0 key would sort below a `k = 0.0`
    * point range and never match. Keys canonicalize at every encode
    * entry point (write, seek bound, bloom); VALUE cells are stored
    * verbatim. */
  private def canonKey(v: Any): Any = v match {
    case d: java.lang.Double if d.doubleValue() == 0.0d => java.lang.Double.valueOf(0.0d)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    case other => other
  }

  // ── DECIMAL (binary encoding only) ─────────────────────────────────────
  // All values of one DecimalType(p, s) column share scale s, so the
  // UNSCALED integer's order is the value order. p ≤ 18 rides the
  // sign-flipped long (8 bytes); wider precisions sign-extend the
  // unscaled BigInteger's two's complement to 16 bytes and flip the
  // sign bit — fixed width either way, so composite keys stay
  // prefix-safe, and unsigned byte order == value order. (The reference
  // PARSED decimal DDL but refused to store it, HBaseSQLParser.scala:
  // 234-249 vs HBaseCatalog.scala:425-446 — this beats it. Metadata
  // claims follow the narrow/wide split: p ≤ 18 columns publish V13
  // zones + exact unscaled SUM + NDV/null counts and, since round 10,
  // V11 quantile summaries over the unscaled long; wide decimals stay
  // claim-free — claim-or-nothing either way.)

  private def decimalWidth(dt: DecimalType): Int = if (dt.precision <= 18) 8 else 16

  private def encodeDecimal(dt: DecimalType, dec: Decimal): Array[Byte] =
    if (dt.precision <= 18) OrderedCodec.encodeLong(dec.toUnscaledLong)
    else {
      val bi = dec.toJavaBigDecimal.unscaledValue()
      val out = new Array[Byte](16)
      if (bi.signum() < 0) java.util.Arrays.fill(out, 0xff.toByte)
      val tb = bi.toByteArray // minimal two's complement, big-endian
      System.arraycopy(tb, 0, out, 16 - tb.length, tb.length)
      out(0) = (out(0) ^ 0x80).toByte
      out
    }

  private def decodeDecimal(dt: DecimalType, b: Array[Byte], off: Int): Decimal =
    if (dt.precision <= 18)
      Decimal.createUnsafe(OrderedCodec.decodeLong(b, off), dt.precision, dt.scale)
    else {
      val tmp = java.util.Arrays.copyOfRange(b, off, off + 16)
      tmp(0) = (tmp(0) ^ 0x80).toByte
      Decimal(new java.math.BigDecimal(new java.math.BigInteger(tmp), dt.scale),
        dt.precision, dt.scale)
    }

  /** External/filter-domain value → Decimal at this column's type (key
    * encode entry points may see catalyst Decimal, java BigDecimal from
    * pushed filters, or a plain number from tests). Rescaling NEVER
    * rounds: Decimal.set's HALF_UP would silently turn a pushed bound
    * with finer scale (`> 50.005` against DECIMAL(12,2)) into `> 50.01`
    * — an exclusive bound that wrongly excludes boundary keys. A value
    * that doesn't fit the column scale exactly throws instead, and
    * every filter-domain caller degrades to an unpruned read (Spark's
    * type coercion casts such literals before pushdown today, so this
    * is a guard, not a hot path). */
  private def toDecimal(dt: DecimalType, v: Any): Decimal = {
    def exact(bd: java.math.BigDecimal): Decimal = {
      val r = try bd.setScale(dt.scale, java.math.RoundingMode.UNNECESSARY)
        catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"value $bd does not fit ${dt.simpleString} exactly") }
      Decimal(r, dt.precision, dt.scale)
    }
    v match {
      case d: Decimal =>
        if (d.scale == dt.scale) d else exact(d.toJavaBigDecimal)
      case d: java.math.BigDecimal => exact(d)
      case d: BigDecimal => exact(d.bigDecimal)
      case n: Number => exact(new java.math.BigDecimal(n.toString))
      case other => throw new IllegalArgumentException(
        s"cannot encode $other as ${dt.simpleString}")
    }
  }

  private def encodeKeyField(dt: DataType, v0: Any): Array[Byte] = {
    val v = canonKey(v0)
    if (isString) {
      val s = stringRepr(dt, v)
      require(s.indexOf('\u0000') < 0,
        "string key values may not contain NUL (reserved as key terminator)")
      val utf = s.getBytes(UTF_8)
      val out = new Array[Byte](utf.length + 1)
      System.arraycopy(utf, 0, out, 0, utf.length)
      out(utf.length) = 0
      out
    } else dt match {
      case LongType | TimestampType | TimestampNTZType => OrderedCodec.encodeLong(v.asInstanceOf[Long])
      case IntegerType | DateType => OrderedCodec.encodeInt(v.asInstanceOf[Int])
      case ShortType => OrderedCodec.encodeShort(v.asInstanceOf[Short])
      case ByteType => OrderedCodec.encodeByte(v.asInstanceOf[Byte])
      case BooleanType => OrderedCodec.encodeBoolean(v.asInstanceOf[Boolean])
      case DoubleType => OrderedCodec.encodeDouble(v.asInstanceOf[Double])
      case FloatType => OrderedCodec.encodeFloat(v.asInstanceOf[Float])
      case d: DecimalType => encodeDecimal(d, toDecimal(d, v))
      case _: StringType => OrderedCodec.encodeString(v.toString)
      case other => throw new IllegalArgumentException(s"unsupported key type $other")
    }
  }

  /** Encode the composite key of a full-schema row. Key columns are
    * non-nullable by contract (reference: key cols declared NOT NULL). */
  def encodeKey(row: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    var i = 0
    while (i < keyOrdinals.length) {
      val f = keyFields(i)
      val v = row.get(keyOrdinals(i), f.dataType)
      require(v != null, s"null in key column ${f.name}")
      out.write(encodeKeyField(f.dataType, v))
      i += 1
    }
    out.toByteArray
  }

  /** NUL-scan: end index of the field starting at `off`. */
  private def nulEnd(bytes: Array[Byte], off: Int): Int = {
    var end = off
    while (end < bytes.length && bytes(end) != 0) end += 1
    end
  }

  /** Decode a composite key into (values in keyCols order). */
  def decodeKey(bytes: Array[Byte]): Array[Any] = {
    val out = new Array[Any](keyFields.length)
    var off = 0
    var i = 0
    while (i < keyFields.length) {
      if (isString) {
        val end = nulEnd(bytes, off)
        out(i) = parseString(keyFields(i).dataType,
          new String(bytes, off, end - off, UTF_8))
        off = end + 1
      } else keyFields(i).dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          out(i) = OrderedCodec.decodeLong(bytes, off); off += 8
        case IntegerType | DateType =>
          out(i) = OrderedCodec.decodeInt(bytes, off); off += 4
        case ShortType => out(i) = OrderedCodec.decodeShort(bytes, off); off += 2
        case ByteType => out(i) = OrderedCodec.decodeByte(bytes, off); off += 1
        case BooleanType => out(i) = OrderedCodec.decodeBoolean(bytes, off); off += 1
        case DoubleType => out(i) = OrderedCodec.decodeDouble(bytes, off); off += 8
        case FloatType => out(i) = OrderedCodec.decodeFloat(bytes, off); off += 4
        case d: DecimalType =>
          out(i) = decodeDecimal(d, bytes, off); off += decimalWidth(d)
        case _: StringType =>
          val (s, n) = OrderedCodec.decodeString(bytes, off)
          out(i) = UTF8String.fromString(s); off += n
        case other => throw new IllegalArgumentException(s"unsupported key type $other")
      }
      i += 1
    }
    out
  }

  // ── typed key comparison (the stringformat comparator path) ────────────

  /** Allocation-free signed-decimal parse of an ASCII slice (integral
    * stringformat dims on the hot write/seek paths). */
  private def parseLongAscii(b: Array[Byte], from: Int, until: Int): Long = {
    var i = from
    var neg = false
    if (i < until && b(i) == '-') { neg = true; i += 1 }
    var x = 0L
    while (i < until) { x = x * 10 + (b(i) - '0'); i += 1 }
    if (neg) -x else x
  }

  /** Compare two encoded composite keys in the VALUE domain. For binary
    * encoding this is plain unsigned byte order (encodings are
    * order-preserving); for stringformat it is the typed-comparator walk
    * (reference comparators.scala: parse each dimension back and compare
    * numerically). Either side may be a leading-dimension prefix (floor
    * lookups): a strict dimension-prefix of the other sorts first. */
  def compareKeys(a: Array[Byte], b: Array[Byte]): Int =
    if (!isString) OrderedCodec.compare(a, b)
    else {
      var offA = 0
      var offB = 0
      var i = 0
      while (i < keyFields.length && offA < a.length && offB < b.length) {
        val endA = nulEnd(a, offA)
        val endB = nulEnd(b, offB)
        val c = keyFields(i).dataType match {
          case _: StringType =>
            // UTF-8 byte order == codepoint order; compare slices raw
            var j = 0
            val n = math.min(endA - offA, endB - offB)
            var d = 0
            while (j < n && d == 0) {
              d = (a(offA + j) & 0xff) - (b(offB + j) & 0xff); j += 1
            }
            if (d != 0) d else (endA - offA) - (endB - offB)
          case DoubleType | FloatType =>
            java.lang.Double.compare(
              new String(a, offA, endA - offA, UTF_8).toDouble,
              new String(b, offB, endB - offB, UTF_8).toDouble)
          case BooleanType =>
            java.lang.Boolean.compare(a(offA) == 't', b(offB) == 't')
          case _ => // integrals, timestamps, dates
            java.lang.Long.compare(
              parseLongAscii(a, offA, endA), parseLongAscii(b, offB, endB))
        }
        if (c != 0) return c
        offA = endA + 1
        offB = endB + 1
        i += 1
      }
      Integer.compare(a.length - offA, b.length - offB)
    }

  // ── value side ─────────────────────────────────────────────────────────

  def encodeValue(row: InternalRow): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < valueOrdinals.length) {
      val f = valueFields(i)
      if (row.isNullAt(valueOrdinals(i))) out.writeByte(0)
      else {
        out.writeByte(1)
        if (isString) {
          val v = row.get(valueOrdinals(i), f.dataType)
          val b = stringRepr(f.dataType, v match {
            case u: UTF8String => u.toString
            case other => other
          }).getBytes(UTF_8)
          out.writeInt(b.length); out.write(b)
        } else f.dataType match {
          case LongType | TimestampType | TimestampNTZType => out.writeLong(row.getLong(valueOrdinals(i)))
          case IntegerType | DateType => out.writeInt(row.getInt(valueOrdinals(i)))
          case ShortType => out.writeShort(row.getShort(valueOrdinals(i)).toInt)
          case ByteType => out.writeByte(row.getByte(valueOrdinals(i)).toInt)
          case BooleanType => out.writeBoolean(row.getBoolean(valueOrdinals(i)))
          case DoubleType => out.writeDouble(row.getDouble(valueOrdinals(i)))
          case FloatType => out.writeFloat(row.getFloat(valueOrdinals(i)))
          case d: DecimalType =>
            out.write(encodeDecimal(d,
              row.getDecimal(valueOrdinals(i), d.precision, d.scale)))
          case _: StringType =>
            val b = row.getUTF8String(valueOrdinals(i)).getBytes
            out.writeInt(b.length); out.write(b)
          case BinaryType =>
            val b = row.getBinary(valueOrdinals(i))
            out.writeInt(b.length); out.write(b)
          case other =>
            throw new IllegalArgumentException(s"unsupported value type $other")
        }
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  // big-endian primitives (DataOutputStream wrote them) parsed straight
  // off the array: the decode path runs once per record per scan, and a
  // per-record DataInputStream + per-string copy was its dominant cost
  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def beLong(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 56) | ((b(o + 1) & 0xffL) << 48) |
      ((b(o + 2) & 0xffL) << 40) | ((b(o + 3) & 0xffL) << 32) |
      ((b(o + 4) & 0xffL) << 24) | ((b(o + 5) & 0xffL) << 16) |
      ((b(o + 6) & 0xffL) << 8) | (b(o + 7) & 0xffL)

  /** Decode value bytes into (values in valueFields order).
    * Allocation-light: primitives parse in place; strings wrap the
    * record's value array without copying (each record owns a fresh
    * array, so the shared backing is safe). */
  def decodeValue(bytes: Array[Byte]): Array[Any] = {
    val out = new Array[Any](valueFields.length)
    var off = 0
    var i = 0
    while (i < valueFields.length) {
      val flag = bytes(off); off += 1
      if (flag == 0) out(i) = null
      else if (isString) {
        val n = beInt(bytes, off); off += 4
        out(i) = parseString(valueFields(i).dataType,
          new String(bytes, off, n, UTF_8))
        off += n
      } else valueFields(i).dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          out(i) = beLong(bytes, off); off += 8
        case IntegerType | DateType =>
          out(i) = beInt(bytes, off); off += 4
        case ShortType =>
          out(i) = (((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)).toShort
          off += 2
        case ByteType => out(i) = bytes(off); off += 1
        case BooleanType => out(i) = bytes(off) != 0; off += 1
        case DoubleType =>
          out(i) = java.lang.Double.longBitsToDouble(beLong(bytes, off)); off += 8
        case FloatType =>
          out(i) = java.lang.Float.intBitsToFloat(beInt(bytes, off)); off += 4
        case d: DecimalType =>
          out(i) = decodeDecimal(d, bytes, off); off += decimalWidth(d)
        case _: StringType =>
          val n = beInt(bytes, off); off += 4
          out(i) = UTF8String.fromBytes(bytes, off, n); off += n
        case BinaryType =>
          val n = beInt(bytes, off); off += 4
          out(i) = java.util.Arrays.copyOfRange(bytes, off, off + n); off += n
        case other =>
          throw new IllegalArgumentException(s"unsupported value type $other")
      }
      i += 1
    }
    out
  }

  /** Row assembler in `projection` column order from decoded (key, value)
    * arrays — the reference's buildRow analog (HBaseRelation.scala:903-984):
    * key columns come from the row key, the rest from cells. The
    * projection mapping is resolved once, outside the per-row loop. */
  def projector(projection: Seq[String]): (Array[Any], Array[Any]) => InternalRow = {
    val fromKey: Array[Boolean] = projection.map(n => keyCols.contains(n)).toArray
    val srcIdx: Array[Int] = projection.map { n =>
      val ki = keyCols.indexOf(n)
      if (ki >= 0) ki else valueFields.indexWhere(_.name == n)
    }.toArray
    (key, value) => {
      val out = new Array[Any](srcIdx.length)
      var i = 0
      while (i < srcIdx.length) {
        out(i) = if (fromKey(i)) key(srcIdx(i)) else value(srcIdx(i))
        i += 1
      }
      new GenericInternalRow(out)
    }
  }

  /** Cross-version row assembler: projection fields come from the
    * CURRENT table schema, this codec carries the schema a segment was
    * WRITTEN with. Columns are matched by name AND type; a column the
    * segment predates (ALTER ADD) — or whose type changed via a
    * drop-and-recreate — reads as null. Key columns never change
    * (ALTER refuses), so they always resolve. */
  def compatProjector(projection: Seq[StructField]): (Array[Any], Array[Any]) => InternalRow = {
    val fromKey: Array[Boolean] = projection.map(f => keyCols.contains(f.name)).toArray
    val srcIdx: Array[Int] = projection.map { f =>
      val ki = keyCols.indexOf(f.name)
      if (ki >= 0) ki
      else valueFields.indexWhere(v => v.name == f.name && v.dataType == f.dataType)
    }.toArray
    (key, value) => {
      val out = new Array[Any](srcIdx.length)
      var i = 0
      while (i < srcIdx.length) {
        out(i) =
          if (srcIdx(i) < 0) null
          else if (fromKey(i)) key(srcIdx(i))
          else value(srcIdx(i))
        i += 1
      }
      new GenericInternalRow(out)
    }
  }

  /** Column-vector writer for the columnar scan path: decodes ONE
    * record's projected fields straight into `WritableColumnVector`s —
    * no per-row `InternalRow`, no boxing — and SKIPS unprojected value
    * fields byte-wise (a string cell that isn't selected is never
    * parsed, just stepped over). Projection fields come from the
    * CURRENT table schema; this codec carries the schema the segment
    * was written with, so the compat rules of [[compatProjector]] apply:
    * key columns resolve by name, value columns by name AND type, and a
    * column the segment predates reads as null. */
  def vectorWriter(projection: Seq[StructField])
      : (Array[Byte], Array[Byte],
         Array[org.apache.spark.sql.execution.vectorized.WritableColumnVector],
         Int) => Unit = {
    import org.apache.spark.sql.execution.vectorized.WritableColumnVector
    // per key dim / value field: index of the projected vector fed by it,
    // or -1 (decode-skip)
    val keyTargets: Array[Int] = keyFields.map(kf =>
      projection.indexWhere(_.name == kf.name)).toArray
    val valueTargets: Array[Int] = valueFields.map(vf =>
      projection.indexWhere(f => f.name == vf.name && f.dataType == vf.dataType)).toArray
    // projected columns fed by neither side (segment predates them)
    val missing: Array[Int] = projection.indices.filter(pi =>
      !keyTargets.contains(pi) && !valueTargets.contains(pi)).toArray
    val keyTypes = keyFields.map(_.dataType).toArray
    val valTypes = valueFields.map(_.dataType).toArray

    def putParsed(dt: DataType, vec: WritableColumnVector, rowId: Int,
        bytes: Array[Byte], off: Int, len: Int): Unit = dt match {
      // stringformat cell/key: parse the decimal/string repr
      case _: StringType => vec.putByteArray(rowId, bytes, off, len)
      case LongType | TimestampType | TimestampNTZType =>
        vec.putLong(rowId, parseLongAscii(bytes, off, off + len))
      case IntegerType | DateType =>
        vec.putInt(rowId, parseLongAscii(bytes, off, off + len).toInt)
      case ShortType => vec.putShort(rowId, parseLongAscii(bytes, off, off + len).toShort)
      case ByteType => vec.putByte(rowId, parseLongAscii(bytes, off, off + len).toByte)
      case BooleanType => vec.putBoolean(rowId, bytes(off) == 't')
      case DoubleType =>
        vec.putDouble(rowId, new String(bytes, off, len, UTF_8).toDouble)
      case FloatType =>
        vec.putFloat(rowId, new String(bytes, off, len, UTF_8).toFloat)
      case other => throw new IllegalArgumentException(s"unsupported stringformat type $other")
    }

    (key, value, vecs, rowId) => {
      // ── key walk ──
      var off = 0
      var i = 0
      while (i < keyTypes.length) {
        val tgt = keyTargets(i)
        if (isString) {
          val end = nulEnd(key, off)
          if (tgt >= 0) putParsed(keyTypes(i), vecs(tgt), rowId, key, off, end - off)
          off = end + 1
        } else keyTypes(i) match {
          case LongType | TimestampType | TimestampNTZType =>
            if (tgt >= 0) vecs(tgt).putLong(rowId, OrderedCodec.decodeLong(key, off))
            off += 8
          case IntegerType | DateType =>
            if (tgt >= 0) vecs(tgt).putInt(rowId, OrderedCodec.decodeInt(key, off))
            off += 4
          case ShortType =>
            if (tgt >= 0) vecs(tgt).putShort(rowId, OrderedCodec.decodeShort(key, off))
            off += 2
          case ByteType =>
            if (tgt >= 0) vecs(tgt).putByte(rowId, OrderedCodec.decodeByte(key, off))
            off += 1
          case BooleanType =>
            if (tgt >= 0) vecs(tgt).putBoolean(rowId, key(off) != 0)
            off += 1
          case DoubleType =>
            if (tgt >= 0) vecs(tgt).putDouble(rowId, OrderedCodec.decodeDouble(key, off))
            off += 8
          case FloatType =>
            if (tgt >= 0) vecs(tgt).putFloat(rowId, OrderedCodec.decodeFloat(key, off))
            off += 4
          case d: DecimalType =>
            if (tgt >= 0) vecs(tgt).putDecimal(rowId,
              decodeDecimal(d, key, off), d.precision)
            off += decimalWidth(d)
          case _: StringType =>
            // NUL-terminated UTF-8: the raw slice IS the string payload
            val end = nulEnd(key, off)
            if (tgt >= 0) vecs(tgt).putByteArray(rowId, key, off, end - off)
            off = end + 1
          case other => throw new IllegalArgumentException(s"unsupported key type $other")
        }
        i += 1
      }
      // ── value walk ──
      var voff = 0
      var j = 0
      while (j < valTypes.length) {
        val tgt = valueTargets(j)
        val flag = value(voff); voff += 1
        if (flag == 0) {
          if (tgt >= 0) vecs(tgt).putNull(rowId)
        } else if (isString) {
          val n = beInt(value, voff); voff += 4
          if (tgt >= 0) putParsed(valTypes(j), vecs(tgt), rowId, value, voff, n)
          voff += n
        } else valTypes(j) match {
          case LongType | TimestampType | TimestampNTZType =>
            if (tgt >= 0) vecs(tgt).putLong(rowId, beLong(value, voff))
            voff += 8
          case IntegerType | DateType =>
            if (tgt >= 0) vecs(tgt).putInt(rowId, beInt(value, voff))
            voff += 4
          case ShortType =>
            if (tgt >= 0) vecs(tgt).putShort(rowId,
              (((value(voff) & 0xff) << 8) | (value(voff + 1) & 0xff)).toShort)
            voff += 2
          case ByteType =>
            if (tgt >= 0) vecs(tgt).putByte(rowId, value(voff))
            voff += 1
          case BooleanType =>
            if (tgt >= 0) vecs(tgt).putBoolean(rowId, value(voff) != 0)
            voff += 1
          case DoubleType =>
            if (tgt >= 0) vecs(tgt).putDouble(rowId,
              java.lang.Double.longBitsToDouble(beLong(value, voff)))
            voff += 8
          case FloatType =>
            if (tgt >= 0) vecs(tgt).putFloat(rowId,
              java.lang.Float.intBitsToFloat(beInt(value, voff)))
            voff += 4
          case d: DecimalType =>
            if (tgt >= 0) vecs(tgt).putDecimal(rowId,
              decodeDecimal(d, value, voff), d.precision)
            voff += decimalWidth(d)
          case _: StringType =>
            val n = beInt(value, voff); voff += 4
            if (tgt >= 0) vecs(tgt).putByteArray(rowId, value, voff, n)
            voff += n
          case BinaryType =>
            val n = beInt(value, voff); voff += 4
            if (tgt >= 0) vecs(tgt).putByteArray(rowId, value, voff, n)
            voff += n
          case other => throw new IllegalArgumentException(s"unsupported value type $other")
        }
        j += 1
      }
      var mi = 0
      while (mi < missing.length) {
        vecs(missing(mi)).putNull(rowId); mi += 1
      }
    }
  }

  /** Leading-key-column value of an encoded key (for segment pruning
    * AND the per-record range checks on the scan hot loop — so the
    * binary arm decodes ONLY dimension 0 in place instead of paying a
    * full decodeKey (an Array[Any] plus every trailing dimension) per
    * record, matching what the stringformat arm always did). */
  def leadingKeyValue(keyBytes: Array[Byte]): Any = {
    if (isString) {
      val end = nulEnd(keyBytes, 0)
      parseString(keyFields.head.dataType, new String(keyBytes, 0, end, UTF_8)) match {
        case s: UTF8String => s.toString
        case v => v
      }
    } else keyFields.head.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        OrderedCodec.decodeLong(keyBytes, 0)
      case IntegerType | DateType => OrderedCodec.decodeInt(keyBytes, 0)
      case ShortType => OrderedCodec.decodeShort(keyBytes, 0)
      case ByteType => OrderedCodec.decodeByte(keyBytes, 0)
      case BooleanType => OrderedCodec.decodeBoolean(keyBytes, 0)
      case DoubleType => OrderedCodec.decodeDouble(keyBytes, 0)
      case FloatType => OrderedCodec.decodeFloat(keyBytes, 0)
      case d: DecimalType => decodeDecimal(d, keyBytes, 0)
      case _: StringType => OrderedCodec.decodeString(keyBytes, 0)._1
      case other =>
        throw new IllegalArgumentException(s"unsupported key type $other")
    }
  }

  /** Encode a leading-key-column value (external form) to its
    * per-encoding byte prefix, for sparse-index seeks. */
  def encodeLeading(v: Any): Array[Byte] =
    encodeKeyField(keyFields.head.dataType, v)

  /** Encode one key dimension's value (external/normalized form) — used
    * for per-dimension Bloom probes. */
  def encodeDimValue(dim: Int, v: Any): Array[Byte] =
    encodeKeyField(keyFields(dim).dataType, v)

  /** Encode one key dimension straight from a full-schema row (writer's
    * Bloom population path; zero canonicalization happens in
    * [[encodeKeyField]] like every other key encode). Names the column
    * on null. */
  def encodeKeyDim(row: InternalRow, dim: Int): Array[Byte] = {
    val f = keyFields(dim)
    val v = row.get(keyOrdinals(dim), f.dataType)
    require(v != null, s"null in key column ${f.name}")
    encodeKeyField(f.dataType, v)
  }

  /** All key-column values with strings in external form (for the
    * pruning module's value-domain comparisons). */
  def decodeKeyNormalized(keyBytes: Array[Byte]): Array[Any] =
    decodeKey(keyBytes).map {
      case s: UTF8String => s.toString
      case v => v
    }
}

object RowCodec {
  val Binary = "binary"
  val StringFormat = "stringformat"
  val Encodings: Set[String] = Set(Binary, StringFormat)

  /** Types representable in stringformat (reference StringBytesUtils
    * covers exactly the primitives + string). */
  def stringable(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType | IntegerType | DateType |
         ShortType | ByteType | BooleanType | DoubleType | FloatType |
         _: StringType => true
    case _ => false
  }
}
