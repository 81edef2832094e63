package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Sidecar + commit-protocol I/O through the Hadoop `FileSystem` API.
  *
  * The index layers (ANN centroids/params/drift/tombstones, MinHash
  * params/commit marker, kv table meta) write their parquet payloads
  * through Spark — any Hadoop filesystem — but their small sidecar
  * files and directory-swap commit protocols used to go through
  * `java.nio.file`, pinning every index to the driver's LOCAL disk. At
  * cluster scale an index lives on shared storage (HDFS, S3, …) next
  * to its data, so all sidecar I/O funnels through here instead: paths
  * are plain strings (scheme-qualified or not), each op resolves the
  * owning `FileSystem` from the active session's Hadoop conf, and the
  * semantics match what the crash-recovery state machines assumed from
  * `java.nio.file.Files` (move fails when the source vanished or the
  * destination exists; recursive delete; read/write whole small files).
  *
  * Atomicity notes, by backend: rename is atomic on HDFS and local
  * disk — the 4-step directory-swap commits rely only on rename plus
  * re-checks, so they hold there. On object stores without atomic
  * rename (raw S3A) the swap degrades to fail-loud, never
  * silent-corrupt: the `_SUCCESS`-marker checks and the bounded
  * re-verify in the swap reject a half-applied state.
  */
object SidecarFs {

  /** Hadoop conf: the active session's (so `spark.hadoop.*` settings
    * apply to sidecars exactly as to the parquet payloads), else a
    * plain default. Cached per session — `newHadoopConf()` clones the
    * full conf and meta reads happen per query plan. */
  @volatile private var cached: (AnyRef, Configuration) = null
  def hadoopConf: Configuration = {
    val key: AnyRef = SparkSession.getActiveSession.orNull
    val c = cached
    if (c != null && (c._1 eq key)) c._2
    else {
      val conf = key match {
        case s: SparkSession => s.sessionState.newHadoopConf()
        case _ => new Configuration()
      }
      cached = (key, conf)
      conf
    }
  }

  private def fsOf(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** `dir/name` with the scheme of `dir` preserved. */
  def child(dir: String, name: String): String =
    new Path(dir, name).toString

  /** Fully-qualified canonical form — stable lock/caching key for a
    * path however it was spelled (relative, absolute, with scheme). */
  def qualified(path: String): String = {
    val p = new Path(path)
    fsOf(p).makeQualified(p).toString
  }

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fsOf(p).exists(p)
  }

  def isDirectory(path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).mkdirs(p): Unit
  }

  def readString(path: String): String = {
    val p = new Path(path)
    val in = fsOf(p).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Whole-file overwrite (sidecars are small; a torn read of a
    * mid-overwrite file is prevented by the callers' commit protocols,
    * or use [[writeStringAtomic]] where a file IS the commit point). */
  def writeString(path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fsOf(p).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write to a hidden temp sibling, then rename OVER the target: a
    * racing reader — same JVM or another OS process — sees either the
    * old or the new complete file, never a half-written one and never
    * a missing one.
    *
    * Scheme split: HDFS's overwrite-rename is atomic, so remote
    * schemes go through `FileContext.rename(OVERWRITE)`. The LOCAL
    * AbstractFileSystem implements overwrite-rename as
    * delete-then-rename (ChecksumFs further splits it into data + crc
    * sub-renames) — concurrent committers half-win and readers see a
    * missing-file window, which the kv meta CAS protocol (concurrent
    * committers are its NORMAL case, cross-process included) cannot
    * tolerate. Local targets therefore publish through
    * `java.nio.file.Files.move(ATOMIC_MOVE, REPLACE_EXISTING)` — the
    * POSIX rename(2) guarantee — with the temp ALSO written via nio so
    * no checksum shadow is ever created for these files (a stale crc
    * paired with new content would poison later checksummed reads;
    * absent crc files are simply not verified). */
  def writeStringAtomic(path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(p)
    val qp = fs.makeQualified(p)
    if ("file".equals(qp.toUri.getScheme)) {
      val dst = java.nio.file.Paths.get(qp.toUri.getPath)
      val tmp = dst.resolveSibling(
        s".${qp.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.write(tmp,
        content.getBytes(StandardCharsets.UTF_8))
      // drop any stale checksum shadow from an earlier Hadoop-written
      // generation BEFORE the move: a brief crc-less old file verifies
      // fine, old-crc-with-new-content does not
      java.nio.file.Files.deleteIfExists(
        dst.resolveSibling(s".${qp.getName}.crc"))
      java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new Path(qp.getParent,
        s".${qp.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      writeString(tmp.toString, content)
      val fc = FileContext.getFileContext(qp.toUri, hadoopConf)
      fc.rename(tmp, qp, Options.Rename.OVERWRITE)
    }
  }

  /** Delete a file if present (non-recursive); no-op when absent. */
  def deleteIfExists(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).delete(p, false): Unit
  }

  def deleteRecursively(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).delete(p, true): Unit
  }

  /** Rename that tolerates losing a cross-process race — `false` when
    * the source is missing or the destination already exists (the
    * `java.nio` `Files.move` failure modes the recovery state machines
    * re-evaluate on), `true` on success. Never moves INTO an existing
    * destination directory: on the local scheme the check-then-rename
    * window would let Hadoop's rename NEST src under a destination a
    * racing recovery created, so local paths rename through
    * `java.nio.file.Files.move` (atomic failure on missing src /
    * existing dst — the exact semantics the swap machines were built
    * on); remote schemes keep the pre-checked Hadoop rename, where
    * HDFS rename onto an existing path returns false rather than
    * nesting. */
  def moveQuiet(src: String, dst: String): Boolean = {
    val sp = new Path(src)
    val fs = fsOf(sp)
    val qsp = fs.makeQualified(sp)
    val qdp = fs.makeQualified(new Path(dst))
    if ("file".equals(qsp.toUri.getScheme)) {
      try {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(qsp.toUri.getPath),
          java.nio.file.Paths.get(qdp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.NoSuchFileException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.DirectoryNotEmptyException => false
      }
    } else if (!fs.exists(qsp) || fs.exists(qdp)) false
    else fs.rename(qsp, qdp)
  }

  /** Strict rename — for single-maintainer swaps where losing the race
    * is a caller bug, not a tolerated outcome. */
  def move(src: String, dst: String): Unit =
    require(moveQuiet(src, dst), s"rename $src -> $dst failed " +
      "(source missing or destination exists)")
}
