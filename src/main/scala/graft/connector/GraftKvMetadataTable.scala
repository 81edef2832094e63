package graft.connector

import graft.store.{RowCodec, SegmentFile}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES for graftkv: `graft.db.t.snapshots`
  * (the commit log — version, wall-clock, segment/row/byte totals) and
  * `graft.db.t.segments` (the live segment inventory — file, rows,
  * bytes, generation, tombstones, decoded leading-key bounds), each a
  * plain read-only SQL table, so table inspection composes with the
  * whole query surface (joins, filters, aggregates) instead of being a
  * bespoke SHOW command. Rows are computed ONCE at resolution time from
  * the packed planning stats — O(1) file reads per table (see
  * SegmentFile's packed-stats section), never a per-segment sweep — and
  * ship to the single scan partition as plain serializable values. */
object GraftKvMetadataTable {

  /** Metadata-table names resolvable under a base table identifier. */
  val Names: Set[String] = Set("snapshots", "segments", "columns")

  def forName(dir: String, meta: KvTableMeta, metaName: String): Option[Table] =
    metaName.toLowerCase match {
      case "snapshots" => Some(snapshots(dir))
      case "segments" => Some(segments(dir, meta))
      case "columns" => Some(columns(dir, meta))
      case _ => None
    }

  private def snapshots(dir: String): Table = {
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("n_segments", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = true),
      StructField("size_bytes", LongType, nullable = true)))
    val rows = SegmentFile.manifestVersions(dir).map { v =>
      val files = SegmentFile.readManifestVersion(dir, v).getOrElse(Set.empty)
      // a snapshot whose files the retention sweep already reclaimed
      // still lists (version + commit time + cardinality), with null
      // row/byte totals instead of an error
      val stats = scala.util.Try(SegmentFile.listSegmentsAsOf(dir, v)).toOption
      Array[Any](v,
        SegmentFile.manifestVersionMtime(dir, v) * 1000L,
        files.size.toLong,
        stats.map(ms => ms.map(_.count).sum).orNull,
        stats.map(ms => ms.map(_.sizeBytes).sum).orNull)
    }
    new GraftKvMetadataTable(s"$dir#snapshots", schema, rows.toArray)
  }

  private def segments(dir: String, m: KvTableMeta): Table = {
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      StructField("generation", LongType, nullable = false),
      StructField("tombstones", LongType, nullable = false),
      StructField("min_lead", StringType, nullable = false),
      StructField("max_lead", StringType, nullable = false)))
    val codec = RowCodec(m.schema, m.keys, m.encoding)
    val rows = SegmentFile.listSegments(dir).map { s =>
      Array[Any](s.file, s.count, s.sizeBytes, s.gen, s.tombstones,
        String.valueOf(codec.decodeKey(s.minKey)(0)),
        String.valueOf(codec.decodeKey(s.maxKey)(0)))
    }
    new GraftKvMetadataTable(s"$dir#segments", schema, rows.toArray)
  }

  /** `t.columns` — per-column statistics as a queryable relation (the
    * ANALYZE TABLE report, composable with the whole SQL surface):
    * distinct estimates from the V9 NDV sketches, exact null counts
    * from the V10 claims, zone-map bounds, and quartiles (p25/p50/p75,
    * as doubles in the column's ingestion encoding) from the V11
    * quantile summaries. A NULL statistic means the metadata cannot
    * claim it (overlap, tombstones, a pre-claim segment) — never a
    * wrong number. */
  private def columns(dir: String, m: KvTableMeta): Table = {
    val schema = StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("data_type", StringType, nullable = false),
      StructField("kind", StringType, nullable = false), // key | value
      StructField("distinct_count", LongType, nullable = true),
      StructField("null_count", LongType, nullable = true),
      StructField("min", StringType, nullable = true),
      StructField("max", StringType, nullable = true),
      StructField("p25", DoubleType, nullable = true),
      StructField("p50", DoubleType, nullable = true),
      StructField("p75", DoubleType, nullable = true)))
    val segs = SegmentFile.listSegments(dir)
    val cmp = RowCodec(m.schema, m.keys, m.encoding).compareKeys _
    val gateOk = SegmentFile.disjointTombstoneFree(segs, cmp)
    val sketches =
      try { if (gateOk) SegmentFile.ndvSketches(dir)
        else Map.empty[String, Seq[SegmentFile.NdvSketch]] }
      catch { case scala.util.control.NonFatal(_) =>
        Map.empty[String, Seq[SegmentFile.NdvSketch]] }
    val qsketches =
      try { if (gateOk) SegmentFile.qsSketches(dir)
        else Map.empty[String, Seq[SegmentFile.QuantileSketch]] }
      catch { case scala.util.control.NonFatal(_) =>
        Map.empty[String, Seq[SegmentFile.QuantileSketch]] }
    val rows = m.schema.fields.map { f =>
      val isKey = m.keys.contains(f.name)
      val ndv: Any =
        if (!gateOk) null
        else SegmentFile.mergedNdvEstimate(segs, sketches, f.name)
          .map(Long.box).orNull
      val nulls: Any =
        if (!gateOk) null
        else if (isKey) Long.box(0L)
        else SegmentFile.mergedNullCount(segs, f.name).map(Long.box).orNull
      val zones = segs.map(_.zoneStats.find(z =>
        z.name == f.name && z.dataType == f.dataType))
      // exactness gate: a truncated string zone (V12, >cap codepoints)
      // bounds the column with a prefix CLAIM — a value the table may
      // not contain. min/max here report VALUES, so any inexact entry
      // degrades the cell to NULL (the "never a wrong number" contract;
      // the agg-pushdown path applies the same gate)
      val (mn, mx): (Any, Any) =
        if (segs.isEmpty || zones.exists(_.isEmpty) ||
          zones.exists(z => !z.get.exact)) (null, null)
        else {
          val zcmp = graft.pruning.TriEval.comparator(f.dataType)
          val lt = Ordering.fromLessThan[Any]((a, b) => zcmp(a, b) < 0)
          (zones.map(_.get.min).min(lt), zones.map(_.get.max).max(lt))
        }
      val quartiles: Seq[Any] =
        if (!gateOk || !SegmentFile.quantileSketchable(f.dataType)) Seq(null, null, null)
        else SegmentFile.mergedQuantileSummaries(segs, qsketches, f.name) match {
          case Some(sum) if sum.count > 0 =>
            // decimal summaries store the UNSCALED long — rescale for
            // the value-domain display column
            val rescale: Double => Double = f.dataType match {
              case d: DecimalType =>
                v => java.math.BigDecimal.valueOf(v.toLong, d.scale).doubleValue()
              case _ => identity
            }
            Seq(0.25, 0.5, 0.75).map(p =>
              sum.query(p).map(v => Double.box(rescale(v))).orNull)
          case _ => Seq(null, null, null)
        }
      Array[Any](f.name, f.dataType.simpleString,
        if (isKey) "key" else "value", ndv, nulls,
        Option(mn).map(_.toString).orNull, Option(mx).map(_.toString).orNull,
        quartiles(0), quartiles(1), quartiles(2))
    }
    new GraftKvMetadataTable(s"$dir#columns", schema, rows.toArray)
  }
}

final class GraftKvMetadataTable(tableName: String, tableSchema: StructType,
    rows: Array[Array[Any]]) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def description(): String = s"GraftKvMetadataScan($tableName)"
        override def planInputPartitions(): Array[InputPartition] =
          Array(KvMetadataPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          new KvMetadataReaderFactory(tableSchema)
      }
    }
}

/** The pre-computed rows, as plain serializable values (Long / String /
  * null) converted to internal form reader-side. */
final case class KvMetadataPartition(rows: Array[Array[Any]])
    extends InputPartition

final class KvMetadataReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[KvMetadataPartition].rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean = it.hasNext && {
        val vals = it.next().zip(schema.fields).map {
          case (null, _) => null
          case (v, f) => f.dataType match {
            case StringType => UTF8String.fromString(v.toString)
            case LongType | TimestampType => v.asInstanceOf[java.lang.Long].longValue
            case DoubleType => v.asInstanceOf[java.lang.Double].doubleValue
            case other => throw new IllegalStateException(
              s"unsupported metadata column type $other")
          }
        }
        current = new GenericInternalRow(vals.toArray[Any])
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
