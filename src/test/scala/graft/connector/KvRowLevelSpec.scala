package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level DML on kv tables through the DSv2 delta path: UPDATE,
  * key-moving UPDATE, MERGE INTO, and subquery-conditioned DELETE all
  * land as Put-upserts + tombstones (append-only; compaction erases).
  * The adversarial case is a key-moving UPDATE where one row vacates a
  * key another row moves into — the gen/gen+1 split must make the
  * incoming row win regardless of task layout. */
class KvRowLevelSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft_rl", classOf[GraftKvCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_rl.root",
      Files.createTempDirectory("graft_rl_catalog").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_rl.db")
    s
  }
  import spark.implicits._

  private var n = 0
  private def freshTable(rows: Seq[(Long, String, Double)]): String = {
    n += 1
    val t = s"graft_rl.db.t$n"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING, x DOUBLE) " +
      "TBLPROPERTIES ('key'='k')")
    rows.toDF("k", "v", "x").createOrReplaceTempView(s"src$n")
    spark.sql(s"INSERT INTO $t SELECT * FROM src$n")
    t
  }

  private def state(t: String): Map[Long, (String, Double)] =
    spark.sql(s"SELECT * FROM $t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("SQL UPDATE rewrites only the matching rows") {
    val t = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    spark.sql(s"UPDATE $t SET v = 'hit', x = x * 10 WHERE k <= 2")
    assert(state(t) == Map(
      1L -> (("hit", 10.0)), 2L -> (("hit", 20.0)), 3L -> (("c", 3.0))))
  }

  test("key-moving UPDATE: the incoming row owns a vacated key") {
    val t = freshTable(Seq((1L, "r1", 1.0), (2L, "r2", 2.0), (3L, "r3", 3.0)))
    // every row shifts down one key: 1->0, 2->1, 3->2 — keys 1 and 2 are
    // each vacated by one row and claimed by another, possibly in
    // different tasks
    spark.sql(s"UPDATE $t SET k = k - 1")
    assert(state(t) == Map(
      0L -> (("r1", 1.0)), 1L -> (("r2", 2.0)), 2L -> (("r3", 3.0))))
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    val t = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    Seq((1L, "a2", 10.0), (3L, "DEL", 0.0), (9L, "new", 9.0))
      .toDF("k", "v", "x").createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING merge_src AS src ON tgt.k = src.k
         |WHEN MATCHED AND src.v = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.v, x = src.x
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state(t) == Map(
      1L -> (("a2", 10.0)), 2L -> (("b", 2.0)), 9L -> (("new", 9.0))))
  }

  test("DELETE with a subquery condition takes the row-level path") {
    val t = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    Seq(1L, 3L).toDF("dk").createOrReplaceTempView("del_keys")
    // not expressible as pushed filters -> canDeleteWhere=false -> the
    // delta row-level DELETE must carry it
    spark.sql(s"DELETE FROM $t WHERE k IN (SELECT dk FROM del_keys)")
    assert(state(t) == Map(2L -> (("b", 2.0))))
  }

  test("UPDATE appends a delta, it does not rewrite the table") {
    val t = freshTable((1L to 100L).map(k => (k, s"r$k", k.toDouble)))
    val path = spark.conf.get("spark.sql.catalog.graft_rl.root") + s"/db/t$n"
    val before = graft.store.SegmentFile.readManifest(path).get
    spark.sql(s"UPDATE $t SET v = 'hit' WHERE k = 42")
    val after = graft.store.SegmentFile.readManifest(path).get
    // every original segment is still live — nothing was rewritten —
    // and the delta added at most one put segment (no keys moved)
    assert(before.subsetOf(after), "update must not drop live segments")
    assert((after -- before).sizeIs <= 1, s"delta too large: ${after -- before}")
    assert(state(t)(42L) == (("hit", 42.0)))
  }

  test("fuzz: random SQL DML sequence tracks the model through compactions") {
    val t = freshTable((1L to 20L).map(k => (k, s"v$k", k.toDouble)))
    val path = spark.conf.get("spark.sql.catalog.graft_rl.root") + s"/db/t$n"
    val model = scala.collection.mutable.Map(
      (1L to 20L).map(k => k -> ((s"v$k", k.toDouble))): _*)
    val rnd = new scala.util.Random(7)
    for (round <- 0 until 10) {
      rnd.nextInt(4) match {
        case 0 => // ranged UPDATE (delta row-level path)
          val lo = rnd.nextLong(30); val hi = lo + rnd.nextLong(10)
          spark.sql(s"UPDATE $t SET x = x + 1, v = concat(v, '+') " +
            s"WHERE k BETWEEN $lo AND $hi")
          model.keys.filter(k => k >= lo && k <= hi).toSeq.foreach { k =>
            val (v, x) = model(k); model(k) = (v + "+", x + 1)
          }
        case 1 => // ranged DELETE (tombstone path)
          val lo = rnd.nextLong(30); val hi = lo + rnd.nextLong(6)
          spark.sql(s"DELETE FROM $t WHERE k BETWEEN $lo AND $hi")
          model.keys.filter(k => k >= lo && k <= hi).toSeq
            .foreach(model.remove)
        case 2 => // MERGE: random source updates/inserts
          val src = Seq.fill(rnd.nextInt(8) + 3)(
            (rnd.nextLong(40), s"m$round-${rnd.nextInt(100)}", round.toDouble))
            .groupBy(_._1).map(_._2.head).toSeq // MERGE rejects dup keys
          src.toDF("k", "v", "x").createOrReplaceTempView(s"fz$round")
          spark.sql(s"""MERGE INTO $t AS tgt USING fz$round AS s
            |ON tgt.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          src.foreach { case (k, v, x) => model(k) = (v, x) }
        case 3 =>
          KvCommands.compactMinor(spark, path)
      }
      assert(state(t) == model.toMap, s"diverged after round $round")
    }
  }

  test("row-level ops stay append-only history: snapshots replay, compaction applies") {
    val t = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    val path = spark.conf.get("spark.sql.catalog.graft_rl.root") + s"/db/t$n"
    val v0 = KvCommands.snapshots(path).last
    spark.sql(s"UPDATE $t SET v = 'u' WHERE k = 1")
    // history: the pre-update snapshot still reads the original row
    assert(KvCommands.tableAsOf(spark, path, v0).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b"))
    // physical erase via compaction changes nothing visible
    KvCommands.compact(spark, path)
    assert(state(t) == Map(1L -> (("u", 1.0)), 2L -> (("b", 2.0))))
  }
}
