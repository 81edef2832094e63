package graft.connector

import graft.TestSpark
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance-lease protocol: concurrent refreshes serialize (one
  * holder, losers stay safely stale), stale leases are stolen, and
  * suspect intent markers force a rebuild instead of being reclaimed. */
class KvMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lease: exclusive acquire, release, stale steal") {
    val dir = Files.createTempDirectory("kv_lease").toString
    val l1 = KvMaintenance.acquire(dir)
    assert(l1.isDefined)
    assert(KvMaintenance.acquire(dir).isEmpty, "second acquire must fail")
    KvMaintenance.release(l1.get)
    val l2 = KvMaintenance.acquire(dir)
    assert(l2.isDefined, "released lease must be reacquirable")
    // stale steal: with a zero lease window the live lease is stealable
    val l3 = KvMaintenance.acquire(dir, leaseMs = 0L)
    assert(l3.isDefined, "stale lease must be stolen")
    // the original holder's late release must NOT delete the thief's lease
    KvMaintenance.release(l2.get)
    assert(KvMaintenance.acquire(dir).isEmpty, "thief's lease must survive")
    KvMaintenance.release(l3.get)
  }

  test("the lease excludes across OS processes") {
    val dir = Files.createTempDirectory("kv_lease_x").toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val child = new ProcessBuilder(javaBin, "-cp",
      System.getProperty("java.class.path"),
      "graft.connector.KvLeaseHoldMain", dir, "4000")
      .redirectErrorStream(true).start()
    // wait for the child to actually hold the lease
    val deadline = System.currentTimeMillis() + 30000
    while (!Files.exists(Paths.get(dir, "._graft_maint_lease")) &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(Files.exists(Paths.get(dir, "._graft_maint_lease")),
      "child never acquired the lease")
    assert(KvMaintenance.acquire(dir).isEmpty,
      "a foreign process's live lease must exclude this one")
    assert(child.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(child.exitValue() == 0)
    val after = KvMaintenance.acquire(dir)
    assert(after.isDefined, "released lease must be reacquirable")
    KvMaintenance.release(after.get)
  }

  private def baseFixture(prefix: String): String = {
    val p = Files.createTempDirectory(prefix).toString + "/t"
    KvCommands.createTable(
      spark.range(2000).select(col("id").as("pk"), (col("id") % 50).as("c"),
        (col("id") % 7).as("grp")),
      p, Seq("pk"))
    p
  }

  test("concurrent index refreshes: one wins, none corrupt") {
    val p = baseFixture("kv_lease_idx")
    KvIndex.create(spark, p, "ic", Seq("c"))
    // two base commits, then two racing refreshes
    KvCommands.append(spark.range(2000, 2400)
      .select(col("id").as("pk"), (col("id") % 50).as("c"),
        (col("id") % 7).as("grp")), p)
    KvCommands.update(spark, p, col("pk") < 100, Map("c" -> lit(999L)))
    val threads = (0 until 2).map { _ =>
      new Thread(() => { KvIndex.refresh(spark, p, "ic"); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // whoever won, a final (serial) refresh must land in-sync and exact
    KvIndex.refresh(spark, p, "ic")
    assert(KvIndex.get(p, "ic").exists(KvIndex.inSync(p, _)))
    val viaIndex = KvCommands.table(spark, p).filter(col("c") === 999L)
      .select("pk").as[Long].collect().sorted
    assert(viaIndex.sameElements(Array.range(0, 100).map(_.toLong)))
  }

  test("concurrent matview refreshes never double-apply the delta") {
    val p = baseFixture("kv_lease_mv")
    KvMatView.create(spark, p, "mv", Seq("grp"), Seq("c"))
    KvCommands.append(spark.range(2000, 2500)
      .select(col("id").as("pk"), (col("id") % 50).as("c"),
        (col("id") % 7).as("grp")), p)
    val threads = (0 until 2).map { _ =>
      new Thread(() => { KvMatView.refresh(spark, p, "mv"); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    KvMatView.refresh(spark, p, "mv") // a loser's skip catches up here
    val stored = KvMatView.read(spark, p, "mv")
      .select("grp", "cnt", "sum_c").as[(Long, Long, Long)].collect().toSet
    val expect = KvCommands.table(spark, p).groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum("c").as("sum_c"))
      .as[(Long, Long, Long)].collect().toSet
    assert(stored == expect, s"stored=$stored expect=$expect")
  }

  test("zombie publish loses the meta CAS deterministically") {
    val dir = Files.createTempDirectory("kv_cas").toString
    // initial publish (create)
    assert(KvMaintenance.casPublishMeta(dir, "_m", "w=1")(_.isEmpty))
    // the zombie reads the meta under its lease, then stalls
    val zombieRead = KvMaintenance.readVersionedMeta(dir, "_m")
    assert(zombieRead.contains("w=1"))
    // meanwhile its lease expires and a successor publishes, fenced on
    // the same observed content — it wins
    assert(KvMaintenance.casPublishMeta(dir, "_m", "w=2")(_ == zombieRead))
    // the zombie wakes and publishes keyed on what IT read: it must
    // lose, and the successor's meta must survive untouched
    assert(!KvMaintenance.casPublishMeta(dir, "_m", "w=zombie")(_ == zombieRead))
    assert(KvMaintenance.readVersionedMeta(dir, "_m").contains("w=2"))
    // N racers fenced on the same observed content: exactly one wins
    val start = KvMaintenance.readVersionedMeta(dir, "_m")
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val ts = (0 until 8).map(i => new Thread(() => {
      if (KvMaintenance.casPublishMeta(dir, "_m", s"racer-$i")(_ == start))
        wins.incrementAndGet()
      ()
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(wins.get == 1, s"${wins.get} racers won the same CAS slot")
  }

  test("a late data append after publish self-invalidates the artifact") {
    val p = baseFixture("kv_fence_data")
    KvIndex.create(spark, p, "ic", Seq("c"))
    assert(KvIndex.get(p, "ic").exists(KvIndex.inSync(p, _)))
    // simulate a fenced-out zombie's parting data write landing AFTER
    // the successor's publish: any commit bumps the index table's own
    // manifest past the published dataVersion
    KvCommands.append(
      spark.range(1).select(lit(999L).as("c"), lit(999999L).as("pk")),
      KvIndex.indexPath(p, "ic"))
    assert(KvIndex.get(p, "ic").exists(d => !KvIndex.inSync(p, d)),
      "ghost-bearing index must drop out of sync")
    assert(KvIndex.usableForPlanning(p).isEmpty,
      "ghost-bearing index must drop out of planning")
    // refresh heals by absolute rebuild (never a diff on ghost data)
    KvIndex.refresh(spark, p, "ic")
    assert(KvIndex.get(p, "ic").exists(KvIndex.inSync(p, _)))
    val viaIndex = KvCommands.table(spark, p).filter(col("c") === 999L)
    assert(viaIndex.count() == 0, "the ghost entry must not resurface")
    // matview analog
    KvMatView.create(spark, p, "mv", Seq("grp"), Seq("c"))
    KvCommands.append(
      spark.range(1).select(lit(77L).as("grp"), lit(1L).as("__cnt"),
        lit(0L).as("__sum_c"), lit(0L).as("__nn_c")),
      KvMatView.mvPath(p, "mv"))
    assert(KvMatView.get(p, "mv").exists(d => !KvMatView.inSync(p, d)))
    assert(KvMatView.usableForPlanning(p).isEmpty)
    KvMatView.refresh(spark, p, "mv")
    assert(KvMatView.get(p, "mv").exists(KvMatView.inSync(p, _)))
    assert(KvMatView.read(spark, p, "mv")
      .filter(col("grp") === 77L).count() == 0,
      "the ghost group must not resurface")
  }

  test("suspect intent marker blocks planning and forces a healing rebuild") {
    val p = baseFixture("kv_lease_suspect")
    KvMatView.create(spark, p, "mv", Seq("grp"), Seq("c"))
    val mvDir = KvMatView.mvPath(p, "mv")
    // simulate a zombie's parting shot: suspect marker at a MATCHING
    // watermark (content possibly corrupt)
    KvMaintenance.quarantine(mvDir)
    assert(KvMatView.get(p, "mv").exists(d => !KvMatView.inSync(p, d)))
    assert(KvMatView.usableForPlanning(p).isEmpty)
    // refresh must REBUILD (not reclaim the marker), then be usable
    KvMatView.refresh(spark, p, "mv")
    assert(KvMatView.get(p, "mv").exists(KvMatView.inSync(p, _)))
    assert(!KvMaintenance.markerExists(mvDir))
    // index analog
    KvIndex.create(spark, p, "ic", Seq("c"))
    KvMaintenance.quarantine(KvIndex.indexPath(p, "ic"))
    assert(KvIndex.usableForPlanning(p).isEmpty)
    KvIndex.refresh(spark, p, "ic")
    assert(KvIndex.get(p, "ic").exists(KvIndex.inSync(p, _)))
  }
}
