package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.store.RowCodec

/** DSv2 row-level operations — SQL `UPDATE`, `MERGE INTO`, and
  * subquery-conditioned `DELETE` on kv tables — as a DELTA write
  * (`SupportsDelta`), not a group rewrite: Spark rewrites the statement
  * into a plan that emits only the CHANGED rows, and this write lands
  * them as ordinary Put-upsert records and tombstones. An UPDATE/MERGE
  * therefore costs a pruned scan plus an append proportional to the
  * touched rows — never a table rewrite (the group-based alternative
  * rewrites every affected segment). This completes the DML story the
  * reference's store expresses as HBase Put/Delete mutations
  * (reference HBaseRelation.scala insert/delete paths) at the SQL
  * statement level its parser never had.
  *
  * Ordering contract: deletes commit at generation g, puts at g+1. A
  * key-moving UPDATE can tombstone a key one task while another task's
  * update moves a row INTO that key; the generation split makes the
  * incoming row win deterministically (SQL semantics: the statement's
  * final assignment owns the key), independent of task/file order.
  */
class GraftKvRowLevelOperation(path: String, schema: StructType,
    keys: Seq[String], encoding: String,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The candidate-row scan is the ordinary table scan: filter/column
    * pushdown and segment pruning all apply to finding the rows a
    * statement touches. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftKvScanBuilder(path, schema, keys, encoding, None, None, None)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftKvDeltaWrite(path, schema, keys, encoding,
          info.rowIdSchema().orElse(StructType(keys.map(schema(_)))))
    }

  /** Row identity = the primary key (the HBase row-key analog). */
  override def rowId(): Array[NamedReference] =
    keys.map(k => Expressions.column(k)).toArray

  /** Updates arrive as (id, newRow) and are applied as one Put — plus a
    * tombstone of the old id when the update moves the key. Splitting
    * every update into delete+reinsert would put a tombstone AND a new
    * version on the SAME key in one commit, leaving the merge order to
    * file-name ties. */
  override def representUpdateAsDeleteAndInsert(): Boolean = false
}

class GraftKvDeltaWrite(path: String, schema: StructType, keys: Seq[String],
    encoding: String, idSchema: StructType) extends DeltaWrite {

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    // driver-side generation claim, one-writer contract (same rule as
    // GraftKvWriteBuilder): tombstones at gen, puts at gen+1
    private val gen: Long =
      (try graft.store.SegmentFile.listSegments(path).map(_.gen)
      catch { case _: Exception => Seq.empty[Long] })
        .maxOption.getOrElse(0L) + 1L

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
      new GraftKvDeltaWriterFactory(path, schema, keys, encoding, idSchema, gen)

    override def commit(messages: Array[WriterCommitMessage]): Unit =
      GraftKvCommitProtocol.commitAppend(path,
        messages.collect { case GraftKvCommit(files) => files }.flatten.toSet,
        schema, keys, encoding)

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      GraftKvCommitProtocol.abortFiles(path, messages)
  }
}

class GraftKvDeltaWriterFactory(path: String, schema: StructType,
    keys: Seq[String], encoding: String, idSchema: StructType, gen: Long)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftKvDeltaWriter(path, schema, keys, encoding, idSchema, gen,
      partitionId, taskId)
}

/** Buffers this task's delta in key order and replays it through the
  * ordinary segment writers at commit, reusing all the storage
  * machinery (segment rotation, blooms, zone maps). Buffering sidesteps
  * any distribution/ordering demand on Spark's delta plan; the held
  * volume is the statement's delta for this task — the rows a row-level
  * statement touches, not the table. */
class GraftKvDeltaWriter(path: String, schema: StructType, keys: Seq[String],
    encoding: String, idSchema: StructType, gen: Long,
    partitionId: Int, taskId: Long) extends DeltaWriter[InternalRow] {

  private val codec = RowCodec(schema, keys, encoding)
  private val idCodec = RowCodec(idSchema, keys, encoding)
  private val ord = new java.util.Comparator[Array[Byte]] {
    def compare(a: Array[Byte], b: Array[Byte]): Int = codec.compareKeys(a, b)
  }
  private val puts = new java.util.TreeMap[Array[Byte], InternalRow](ord)
  private val dels = new java.util.TreeMap[Array[Byte], InternalRow](ord)
  private var files = List.empty[String]

  /** Memory bound: past this many buffered rows the maps drain into
    * segments and clear — an unbounded UPDATE streams through in sorted
    * chunks (overlapping segments are legal; merge-on-read + compaction
    * own them). Cross-chunk and cross-task same-key conflicts all
    * resolve by the gen/gen+1 split, so chunking never changes results. */
  private val FlushRows = 1 << 16

  override def insert(row: InternalRow): Unit = {
    val r = row.copy()
    puts.put(codec.encodeKey(r), r)
    maybeFlush()
  }

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    val r = row.copy()
    val newKey = codec.encodeKey(r)
    val oldKey = idCodec.encodeKey(id)
    // a key-preserving update is a plain Put; a key-moving one also
    // tombstones the vacated key
    if (codec.compareKeys(oldKey, newKey) != 0) dels.put(oldKey, id.copy())
    puts.put(newKey, r)
    maybeFlush()
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    dels.put(idCodec.encodeKey(id), id.copy())
    maybeFlush()
  }

  override def write(row: InternalRow): Unit = insert(row)

  private def maybeFlush(): Unit =
    if (puts.size + dels.size >= FlushRows) flushChunk()

  private def flushChunk(): Unit = {
    def drain(rows: java.util.TreeMap[Array[Byte], InternalRow],
        rowSchema: StructType, g: Long, tombstone: Boolean): Unit =
      if (!rows.isEmpty) {
        val w = new GraftKvDataWriter(path, rowSchema, keys, partitionId,
          taskId, encoding, gen = g, tombstone = tombstone)
        rows.values().forEach(r => w.write(r))
        w.commit() match { case GraftKvCommit(fs) => files = files ++ fs }
        rows.clear()
      }
    // a key deleted in this chunk that also receives a put is owned by
    // the put (same rule the gen/gen+1 split applies across chunks/tasks)
    puts.keySet().forEach(k => dels.remove(k))
    drain(dels, idSchema, gen, tombstone = true)
    drain(puts, schema, gen + 1L, tombstone = false)
  }

  override def commit(): WriterCommitMessage = {
    flushChunk()
    GraftKvCommit(files)
  }

  /** Chunk flushes land files before the task commits — delete them on
    * abort (anything a crash strands is invisible behind the manifest
    * and reclaimed by the retention sweep / dropTable). */
  override def abort(): Unit =
    files.foreach { f =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, f))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(path, f.stripSuffix(".kv") + ".kvmeta"))
    }
  override def close(): Unit = ()
}
