package graft.store

import graft.codec.OrderedCodec
import java.io.{ByteArrayOutputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binds the order-preserving codec to a Spark schema: composite-key
  * encode/decode (order-preserving concatenation, reference semantics of
  * /root/reference src/main/scala/.../util/HBaseKVHelper.scala:25-97) and
  * a plain length-prefixed value codec for non-key columns (null = flag
  * byte, mirroring the reference's null-as-absent-cell convention).
  */
final case class RowCodec(schema: StructType, keyCols: Seq[String]) {

  require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
    s"key columns $keyCols must exist in ${schema.fieldNames.mkString(",")}")

  val keyFields: Seq[StructField] = keyCols.map(schema(_))
  val valueFields: Seq[StructField] =
    schema.fields.toSeq.filterNot(f => keyCols.contains(f.name))
  /** ordinal in the full table schema for each key / value field */
  private val keyOrdinals = keyCols.map(schema.fieldIndex).toArray
  private val valueOrdinals = valueFields.map(f => schema.fieldIndex(f.name)).toArray

  // ── key side (order-preserving) ────────────────────────────────────────

  private def encodeKeyField(dt: DataType, v: Any): Array[Byte] = dt match {
    case LongType | TimestampType | TimestampNTZType => OrderedCodec.encodeLong(v.asInstanceOf[Long])
    case IntegerType | DateType => OrderedCodec.encodeInt(v.asInstanceOf[Int])
    case ShortType => OrderedCodec.encodeShort(v.asInstanceOf[Short])
    case ByteType => OrderedCodec.encodeByte(v.asInstanceOf[Byte])
    case BooleanType => OrderedCodec.encodeBoolean(v.asInstanceOf[Boolean])
    case DoubleType => OrderedCodec.encodeDouble(v.asInstanceOf[Double])
    case FloatType => OrderedCodec.encodeFloat(v.asInstanceOf[Float])
    case _: StringType => OrderedCodec.encodeString(v.toString)
    case other => throw new IllegalArgumentException(s"unsupported key type $other")
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

  /** Decode a composite key into (values in keyCols order). */
  def decodeKey(bytes: Array[Byte]): Array[Any] = {
    val out = new Array[Any](keyFields.length)
    var off = 0
    var i = 0
    while (i < keyFields.length) {
      keyFields(i).dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          out(i) = OrderedCodec.decodeLong(bytes, off); off += 8
        case IntegerType | DateType =>
          out(i) = OrderedCodec.decodeInt(bytes, off); off += 4
        case ShortType => out(i) = OrderedCodec.decodeShort(bytes, off); off += 2
        case ByteType => out(i) = OrderedCodec.decodeByte(bytes, off); off += 1
        case BooleanType => out(i) = OrderedCodec.decodeBoolean(bytes, off); off += 1
        case DoubleType => out(i) = OrderedCodec.decodeDouble(bytes, off); off += 8
        case FloatType => out(i) = OrderedCodec.decodeFloat(bytes, off); off += 4
        case _: StringType =>
          val (s, n) = OrderedCodec.decodeString(bytes, off)
          out(i) = UTF8String.fromString(s); off += n
        case other => throw new IllegalArgumentException(s"unsupported key type $other")
      }
      i += 1
    }
    out
  }

  // ── value side (compact, not order-preserving) ─────────────────────────

  def encodeValue(row: InternalRow): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < valueOrdinals.length) {
      val f = valueFields(i)
      if (row.isNullAt(valueOrdinals(i))) out.writeByte(0)
      else {
        out.writeByte(1)
        f.dataType match {
          case LongType | TimestampType | TimestampNTZType => out.writeLong(row.getLong(valueOrdinals(i)))
          case IntegerType | DateType => out.writeInt(row.getInt(valueOrdinals(i)))
          case ShortType => out.writeShort(row.getShort(valueOrdinals(i)).toInt)
          case ByteType => out.writeByte(row.getByte(valueOrdinals(i)).toInt)
          case BooleanType => out.writeBoolean(row.getBoolean(valueOrdinals(i)))
          case DoubleType => out.writeDouble(row.getDouble(valueOrdinals(i)))
          case FloatType => out.writeFloat(row.getFloat(valueOrdinals(i)))
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

  /** Decode value bytes into (values in valueFields order). */
  def decodeValue(bytes: Array[Byte]): Array[Any] = {
    val out = new Array[Any](valueFields.length)
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    var i = 0
    while (i < valueFields.length) {
      if (in.readByte() == 0) out(i) = null
      else out(i) = valueFields(i).dataType match {
        case LongType | TimestampType | TimestampNTZType => in.readLong()
        case IntegerType | DateType => in.readInt()
        case ShortType => in.readShort()
        case ByteType => in.readByte()
        case BooleanType => in.readBoolean()
        case DoubleType => in.readDouble()
        case FloatType => in.readFloat()
        case _: StringType =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          UTF8String.fromBytes(b)
        case BinaryType =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          b
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

  /** Leading-key-column value of an encoded key (for segment pruning). */
  def leadingKeyValue(keyBytes: Array[Byte]): Any = decodeKey(keyBytes)(0) match {
    case s: UTF8String => s.toString
    case v => v
  }

  /** Encode a leading-key-column value (external form) to its
    * order-preserving byte prefix, for sparse-index seeks. */
  def encodeLeading(v: Any): Array[Byte] =
    encodeKeyField(keyFields.head.dataType, v)

  /** Encode one key dimension's value (external/normalized form) — used
    * for per-dimension Bloom probes. */
  def encodeDimValue(dim: Int, v: Any): Array[Byte] =
    encodeKeyField(keyFields(dim).dataType, v)

  /** Encode one key dimension straight from a full-schema row (writer's
    * Bloom population path). Canonicalizes -0.0 → +0.0 so the bloom hash
    * matches probe-side SQL equality, and names the column on null. */
  def encodeKeyDim(row: InternalRow, dim: Int): Array[Byte] = {
    val f = keyFields(dim)
    val v = row.get(keyOrdinals(dim), f.dataType)
    require(v != null, s"null in key column ${f.name}")
    val cv = v match {
      case d: java.lang.Double if d.doubleValue() == 0.0d => java.lang.Double.valueOf(0.0d)
      case fl: java.lang.Float if fl.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
      case other => other
    }
    encodeKeyField(f.dataType, cv)
  }

  /** All key-column values with strings in external form (for the
    * pruning module's value-domain comparisons). */
  def decodeKeyNormalized(keyBytes: Array[Byte]): Array[Any] =
    decodeKey(keyBytes).map {
      case s: UTF8String => s.toString
      case v => v
    }
}
