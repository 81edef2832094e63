package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing of the kv read path: a fixed-seed stream of
  * random predicates runs against the SAME data stored as graftkv (both
  * codecs) and as parquet; result sets must be identical. This sweeps
  * the whole pruning/seek/decode surface — critical-point ranges,
  * IN-list re-seeks, dimension descent, bloom pruning, residual
  * re-evaluation, columnar batch decode — with predicate shapes no
  * hand-written case covers. */
class KvFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val parquet: DataFrame =
    graft.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  private lazy val kvPaths: Map[String, String] = {
    Seq(graft.store.RowCodec.Binary, graft.store.RowCodec.StringFormat).map { enc =>
      val p = Files.createTempDirectory(s"graftkv_fuzz_$enc").toString + "/t"
      KvCommands.createTable(parquet, p, Seq("l_orderkey", "l_linenumber"), enc)
      enc -> p
    }.toMap
  }

  /** Random predicate over the composite key + a residual column. The
    * generator leans on the shapes the pruning algebra claims to handle
    * exactly: points, ranges, IN-lists, disjunctions, negations, and
    * conjunctions that pin the lead dim (dimension descent). */
  private def randomPredicate(rnd: scala.util.Random, maxKey: Long): Column = {
    def lead = col("l_orderkey")
    def second = col("l_linenumber")
    def qty = col("l_quantity")
    def k(): Long = rnd.nextLong(maxKey + 100) // sometimes out of domain
    rnd.nextInt(10) match {
      case 0 => lead === k()
      case 1 => lead.between(k(), k())
      case 2 => lead.isin(Seq.fill(rnd.nextInt(6) + 1)(k()): _*)
      case 3 => lead > k() && lead <= k()
      case 4 => !lead.between(k(), k())
      case 5 => lead < k() || lead > k()
      case 6 => second === (rnd.nextInt(9) + 1) // beyond domain sometimes
      case 7 => lead === k() && second > rnd.nextInt(5)
      case 8 => lead.between(k(), k()) && qty < rnd.nextInt(60)
      case 9 => (lead === k() || lead === k()) && second =!= rnd.nextInt(7)
    }
  }

  test("random predicates: kv scans equal parquet under both codecs") {
    val maxKey = parquet.agg(max("l_orderkey")).head().getLong(0)
    val rnd = new scala.util.Random(42)
    val preds = Seq.fill(40)(randomPredicate(rnd, maxKey))
    val expected = preds.map(p =>
      parquet.filter(p).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
        .toSet)
    for ((enc, path) <- kvPaths) {
      val kv = KvCommands.table(spark, path)
      preds.zip(expected).zipWithIndex.foreach { case ((p, exp), i) =>
        val got = kv.filter(p).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
          .toSet
        assert(got == exp,
          s"predicate #$i [$p] on $enc: kv=${got.size} rows, parquet=${exp.size}")
      }
    }
  }
}
