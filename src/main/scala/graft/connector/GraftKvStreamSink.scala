package graft.connector

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import graft.store.RowCodec

/** Native streaming sink: `df.writeStream.format("graftkv")` — the
  * DSv2 restatement of the reference's real-time put path (S9) without
  * the foreachBatch detour. Each micro-batch appends Put records
  * through the shared commit protocol EXACTLY ONCE:
  *
  *  - Writers buffer-sort per task in bounded chunks (the delta
  *    writer's approach), so the unsorted stream needs no
  *    distribution/ordering support from the streaming engine.
  *  - Epoch idempotence: commit writes a marker file (atomic rename)
  *    carrying the committed file list BEFORE the manifest swap. A
  *    replayed epoch (driver restart re-runs the batch and re-offers
  *    commit) finds the marker, re-unions the marker's files into the
  *    manifest (a no-op if the first attempt finished; a repair if it
  *    crashed between marker and swap), and sweeps the replay's files
  *    instead of double-appending. If the first attempt's files are
  *    gone (a graceful abort deleted them), the replay commits its own
  *    files — sources replay a micro-batch deterministically, so the
  *    content is the same.
  *  - Generations are base + epochId + 1: monotone within a query and
  *    across restarts (a re-created sink's base only grows), so the kv
  *    streaming SOURCE sees each epoch as an ordinary commit window.
  */
class GraftKvStreamingWrite(path: String, schema: StructType,
    keys: Seq[String], encoding: String, queryId: String)
    extends StreamingWrite {

  private val baseGen: Long =
    (try graft.store.SegmentFile.listSegments(path).map(_.gen)
    catch { case _: Exception => Seq.empty[Long] })
      .maxOption.getOrElse(0L)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftKvStreamingWriterFactory(path, schema, keys, encoding, baseGen)

  private def marker(epochId: Long) =
    Paths.get(path, s"._graft_epoch-$queryId-$epochId")

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.collect {
      case GraftKvCommit(files) => files
    }.flatten.toSet
    val m = marker(epochId)
    if (Files.exists(m)) {
      val prior = new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
        .split("\n").filter(_.nonEmpty).toSet
      if (prior.forall(f => Files.exists(Paths.get(path, f)))) {
        // first attempt's files are all present: (re-)union them into
        // the manifest — no-op if already live, repair if the crash hit
        // between marker and swap — and drop the replay's duplicates
        GraftKvCommitProtocol.commitAppend(path, prior, schema, keys, encoding)
        GraftKvCommitProtocol.abortFiles(path, messages)
      } else {
        // first attempt was aborted after the marker: its files are
        // gone, so the replay's (identical) batch is the commit
        writeMarker(m, fresh)
        GraftKvCommitProtocol.commitAppend(path, fresh, schema, keys, encoding)
      }
    } else {
      writeMarker(m, fresh)
      GraftKvCommitProtocol.commitAppend(path, fresh, schema, keys, encoding)
    }
  }

  private def writeMarker(m: java.nio.file.Path, files: Set[String]): Unit = {
    Files.createDirectories(m.getParent)
    val tmp = m.resolveSibling(m.getFileName.toString + ".tmp")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, m, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftKvCommitProtocol.abortFiles(path, messages)
}

class GraftKvStreamingWriterFactory(path: String, schema: StructType,
    keys: Seq[String], encoding: String, baseGen: Long)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftKvBufferedPutWriter(path, schema, keys, encoding,
      baseGen + epochId + 1, partitionId, taskId)
}

/** Put writer for unsorted input: buffers rows in key order and drains
  * into segments in bounded chunks (within-chunk duplicate keys keep
  * the later put — same Put-upsert rule as the sorted path's lookahead
  * buffer; across chunks/tasks the merge-on-read generation order
  * resolves). Memory is bounded by the chunk, not the batch. */
class GraftKvBufferedPutWriter(path: String, schema: StructType,
    keys: Seq[String], encoding: String, gen: Long,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val codec = RowCodec(schema, keys, encoding)
  private val rows = new java.util.TreeMap[Array[Byte], InternalRow](
    new java.util.Comparator[Array[Byte]] {
      def compare(a: Array[Byte], b: Array[Byte]): Int = codec.compareKeys(a, b)
    })
  private var files = List.empty[String]
  private val FlushRows = 1 << 16

  override def write(row: InternalRow): Unit = {
    val r = row.copy()
    rows.put(codec.encodeKey(r), r)
    if (rows.size >= FlushRows) flush()
  }

  private def flush(): Unit = if (!rows.isEmpty) {
    val w = new GraftKvDataWriter(path, schema, keys, partitionId, taskId,
      encoding, gen = gen)
    rows.values().forEach(r => w.write(r))
    w.commit() match { case GraftKvCommit(fs) => files = files ++ fs }
    rows.clear()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    GraftKvCommit(files)
  }

  override def abort(): Unit =
    files.foreach { f =>
      Files.deleteIfExists(Paths.get(path, f))
      Files.deleteIfExists(Paths.get(path, f.stripSuffix(".kv") + ".kvmeta"))
    }

  override def close(): Unit = ()
}
