package graft.connector

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Cross-process SINGLE-WRITER LEASE for derived-artifact maintenance
  * (secondary-index / materialized-view refresh).
  *
  * Why: a refresh applies a CDC delta computed against the watermark it
  * READ — two refreshes interleaved with base commits can each apply a
  * correct-in-isolation delta whose COMPOSITION is wrong (the matview's
  * relative counts double-apply; the index strands ghost entries whose
  * tombstones nobody will ever write) while the last meta write claims
  * the artifact in sync. Refreshes are therefore serialized per
  * artifact: one holder at a time, everyone else SKIPS (staleness — the
  * rewrite simply keeps not using the artifact — is the documented
  * degradation; wrong answers are not).
  *
  * Mechanics: create-if-absent of `._graft_maint_lease` (hard-link CAS
  * with an exclusive-create fallback, the manifest-commit primitive). A
  * fresh lease blocks acquisition; a lease older than `leaseMs` is a
  * crashed/stalled holder and is STOLEN (delete + retry once). A holder
  * that lost its lease to a thief and kept writing is the ZOMBIE case:
  * refreshers re-check their meta just before publishing and route to a
  * rebuild instead (see the refresh implementations) — the lease bounds
  * normal concurrency, the meta re-check bounds expiry races.
  */
object KvMaintenance {

  /** Default lease: generous vs any sane refresh, small vs a wedged
    * process holding maintenance hostage. */
  val DefaultLeaseMs: Long = 30L * 60 * 1000

  final case class Lease(path: Path, token: String)

  private def leasePath(artifactDir: String): Path =
    Paths.get(artifactDir, "._graft_maint_lease")

  private def tryCreate(p: Path, token: String): Boolean = {
    val tmp = p.resolveSibling(
      s"._graft_maint_lease.tmp-${token.take(8)}")
    Files.writeString(tmp, token)
    try {
      Files.createLink(p, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
        try {
          Files.write(p, token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  /** Acquire the artifact's maintenance lease, or None when a live
    * holder exists. A stale lease (older than `leaseMs`) is stolen via
    * an ATOMIC RENAME — of two concurrent stealers exactly one wins
    * the move (the loser's move throws), so a delete-then-create race
    * can never hand the lease to both. */
  def acquire(artifactDir: String,
      leaseMs: Long = DefaultLeaseMs): Option[Lease] = {
    val p = leasePath(artifactDir)
    val token = java.util.UUID.randomUUID().toString
    var attempts = 0
    while (attempts < 3) {
      if (tryCreate(p, token)) return Some(Lease(p, token))
      val age =
        try System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis
        catch { case _: Exception => -1L } // vanished — retry the create
      if (age >= 0 && age < leaseMs) return None // live holder
      // atomic steal: only the single successful mover may retry the
      // create; a failed move means another stealer (or the create
      // loop) got there first — loop and re-evaluate
      try Files.move(p,
        p.resolveSibling(s"._graft_maint_lease.stolen-${token.take(8)}"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: Exception => () }
      try Files.deleteIfExists(
        p.resolveSibling(s"._graft_maint_lease.stolen-${token.take(8)}"))
      catch { case _: Exception => () }
      attempts += 1
    }
    None
  }

  /** Does `l` still name the CURRENT lease? A holder must re-check this
    * immediately before publishing anything irreversible — a stolen
    * lease means a successor may have run, and the holder's writes are
    * suspect (the refresh implementations quarantine instead). */
  def stillHeld(l: Lease): Boolean =
    try Files.exists(l.path) && Files.readString(l.path) == l.token
    catch { case _: Exception => false }

  /** Release — removes only OUR lease, atomically: the lease file is
    * MOVED to a private name first (single winner), its content
    * verified, and a foreign lease (a thief's, stolen after ours
    * expired) is moved back if the slot is still free. A thief whose
    * lease was transiently displaced fails its own pre-publish
    * `stillHeld` check — the backstop for the unrestorable corner. */
  def release(l: Lease): Unit =
    try {
      val trash = l.path.resolveSibling(
        s"._graft_maint_lease.rel-${l.token.take(8)}")
      Files.move(l.path, trash, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      if (Files.readString(trash) == l.token) Files.delete(trash)
      else {
        // we displaced a thief's live lease — put it back if possible
        try Files.move(trash, l.path,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: Exception => Files.deleteIfExists(trash) }
      }
    } catch { case _: Exception => () }
}
