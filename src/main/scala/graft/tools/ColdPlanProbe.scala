package graft.tools

/** Scratch diagnostic for cold planning cost at high segment counts
  * (r15 verdict item 7: plan100k_cold 3.0–4.6 s): times each component
  * of the cold path separately — the version discovery (directory
  * listing fallback), the manifest read, the packed-stats parse, and
  * the authoritative-set comparison — so the fix targets the measured
  * wall, not a guess. Usage: ColdPlanProbe <tableDir> <reps>. Pure
  * driver-side; no SparkSession needed.
  */
object ColdPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val reps = args(1).toInt
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    (1 to reps).foreach { i =>
      println(s"rep $i")
      graft.store.SegmentFile.clearPlanningCache()
      val vs = time("manifestVersions (listing)") {
        graft.store.SegmentFile.manifestVersions(dir)
      }
      val v = vs.last
      val live = time("readManifestVersion") {
        graft.store.SegmentFile.readManifestVersion(dir, v).get
      }
      println(s"  versions=${vs.length} head=$v live=${live.size}")
      graft.store.SegmentFile.clearPlanningCache()
      time("currentVersion (cold)") {
        graft.store.SegmentFile.currentVersion(dir)
      }
      time("currentVersion (warm)") {
        graft.store.SegmentFile.currentVersion(dir)
      }
      graft.store.SegmentFile.clearPlanningCache()
      time("planningStats (cold, full)") {
        graft.store.SegmentFile.planningStatsProbe(dir)
      }
      time("planningStats (warm)") {
        graft.store.SegmentFile.planningStatsProbe(dir)
      }
    }
  }
}
