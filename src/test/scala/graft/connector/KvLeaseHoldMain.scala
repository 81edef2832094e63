package graft.connector

/** Child-process lease holder for the cross-process maintenance-lease
  * test (KvMaintenanceSpec): acquires the artifact lease, holds it for
  * `holdMs`, releases, exits 0 — or exits 2 if the lease was taken. */
object KvLeaseHoldMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, holdMsS) = args
    KvMaintenance.acquire(dir) match {
      case None => sys.exit(2)
      case Some(l) =>
        Thread.sleep(holdMsS.toLong)
        KvMaintenance.release(l)
    }
  }
}
