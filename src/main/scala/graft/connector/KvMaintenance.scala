package graft.connector

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Cross-process SINGLE-WRITER LEASE + intent-marker protocol for
  * derived-artifact maintenance (secondary-index / materialized-view
  * refresh).
  *
  * Why: a refresh applies a CDC delta computed against the watermark it
  * READ — two refreshes interleaved with base commits can each apply a
  * correct-in-isolation delta whose COMPOSITION is wrong (the matview's
  * relative counts double-apply; the index strands ghost entries whose
  * tombstones nobody will ever write) while the last meta write claims
  * the artifact in sync. Refreshes therefore serialize per artifact:
  * one holder at a time, everyone else SKIPS (staleness — the rewrite
  * simply keeps not using the artifact — is the documented degradation;
  * wrong answers are not).
  *
  * Mechanics: create-if-absent of `._graft_maint_lease` (hard-link CAS
  * with an exclusive-create fallback, the manifest-commit primitive). A
  * fresh lease blocks acquisition; a lease older than `leaseMs` is a
  * crashed/stalled holder and is STOLEN by an atomic rename whose
  * moved content is VERIFIED against what the stealer observed — a
  * rename that turns out to have displaced a different (fresh) lease
  * is restored, so concurrent stealers cannot both win. A holder that
  * lost its lease and kept writing is the ZOMBIE case: refreshers
  * re-check `stillHeld` just before publishing and QUARANTINE (suspect
  * marker) instead.
  *
  * RESIDUAL WINDOW (documented, not closed): the lease has no fencing
  * token on the artifact's data/meta files themselves, so a zombie
  * that passes its `stillHeld` check and then stalls can still publish
  * stale meta over a successor's (or append data a successor's
  * incremental read composes with) — this requires a lease EXPIRY
  * (≥ 30 min stall) plus a precise interleaving, and the suspect
  * quarantine catches every case where either party survives to its
  * publish tail. Full closure would need per-artifact fenced commits;
  * the practical guidance is the default lease being far above any
  * sane refresh duration.
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
    * an atomic rename, and the MOVED CONTENT is verified against the
    * stale content observed — a steal that displaced someone else's
    * fresh lease (the observe-to-move race) restores it and retries. */
  def acquire(artifactDir: String,
      leaseMs: Long = DefaultLeaseMs): Option[Lease] = {
    val p = leasePath(artifactDir)
    val token = java.util.UUID.randomUUID().toString
    var attempts = 0
    while (attempts < 3) {
      if (tryCreate(p, token)) return Some(Lease(p, token))
      val observed =
        try {
          val age = System.currentTimeMillis() -
            Files.getLastModifiedTime(p).toMillis
          if (age < leaseMs) return None // live holder
          Some(Files.readString(p))
        } catch { case _: Exception => None } // vanished — retry create
      observed match {
        case None => ()
        case Some(staleContent) =>
          val moved = p.resolveSibling(
            s"._graft_maint_lease.stolen-${token.take(8)}")
          try {
            Files.move(p, moved, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            // verify we moved the lease we OBSERVED as stale — losing
            // this check would let two stealers both acquire (one by
            // displacing the other's fresh lease)
            if (Files.readString(moved) == staleContent)
              Files.deleteIfExists(moved)
            else {
              // displaced a fresh lease — put it back if the slot is
              // still free; otherwise leave the file for the sweeper
              // (its holder's stillHeld check fails safe)
              try Files.move(moved, p,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              catch { case _: Exception => () }
              return None
            }
          } catch { case _: Exception => () } // lost the move race — loop
      }
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
    * expired) is moved back if the slot is still free. When the slot
    * was re-taken the displaced lease file is LEFT ON DISK (aged tmp
    * sweep reclaims it) — its holder's `stillHeld` check fails safe;
    * deleting it would tell us nothing and lose the record. */
  def release(l: Lease): Unit =
    try {
      val trash = l.path.resolveSibling(
        s"._graft_maint_lease.rel-${l.token.take(8)}")
      Files.move(l.path, trash, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      if (Files.readString(trash) == l.token) Files.delete(trash)
      else {
        try Files.move(trash, l.path,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: Exception => () } // leave for the sweep
      }
    } catch { case _: Exception => () }

  // ── intent markers (shared by index and matview refresh) ──────────────
  // One marker file per artifact. Content semantics:
  //  - a lease TOKEN: an incremental apply is (or was) in flight under
  //    that lease — plus watermark-in-sync it means "completed but died
  //    before the clear" (reclaimable);
  //  - "suspect-<id>": a zombie detected its own writes may be corrupt —
  //    NEVER reclaimable; the next refresh must rebuild absolutely.

  private val SuspectPrefix = "suspect"

  def markerPath(artifactDir: String): Path =
    Paths.get(artifactDir, "._graft_maint_intent")

  def markerExists(artifactDir: String): Boolean =
    Files.exists(markerPath(artifactDir))

  /** Marker content at refresh start (None = absent; unreadable reads
    * as a fresh suspect so the caller rebuilds). */
  def readMarker(artifactDir: String): Option[String] =
    try {
      if (!Files.exists(markerPath(artifactDir))) None
      else Some(Files.readString(markerPath(artifactDir)).trim)
    } catch { case _: Exception => Some(s"$SuspectPrefix-unreadable") }

  def isSuspect(content: Option[String]): Boolean =
    content.exists(_.startsWith(SuspectPrefix))

  /** Write the in-flight marker for an incremental apply (content = the
    * holder's lease token, so only this holder's publish clears it). */
  def markInFlight(artifactDir: String, l: Lease): Unit =
    Files.writeString(markerPath(artifactDir), l.token)

  /** Quarantine: unique suspect content — never equal to any token or
    * to a previously-observed marker, so no publish tail clears it. */
  def quarantine(artifactDir: String): Unit =
    Files.writeString(markerPath(artifactDir),
      s"$SuspectPrefix-${java.util.UUID.randomUUID().toString.take(8)}")

  /** Clear the marker iff its CURRENT content is ours to clear: our
    * lease token, or exactly the content we observed at start (our
    * rebuild healed it). A concurrent zombie's fresh marker — different
    * content by construction — survives. */
  def clearIfOwned(artifactDir: String, l: Lease,
      observedAtStart: Option[String]): Unit = {
    val ours =
      try !Files.exists(markerPath(artifactDir)) || {
        val c = Files.readString(markerPath(artifactDir)).trim
        c == l.token || observedAtStart.contains(c)
      } catch { case _: Exception => false }
    if (ours) Files.deleteIfExists(markerPath(artifactDir))
  }
}
