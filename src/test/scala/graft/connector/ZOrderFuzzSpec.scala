package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the z-order ENFORCEMENT path: the box cover is
  * intersected into the lead-range set the readers enforce, so an
  * unsound cover would silently DROP rows (not just prune badly). Every
  * random predicate shape — closed/open boxes, points, IN-lists,
  * one-sided bounds, residuals on non-dim columns, OR shapes the box
  * extraction must ignore — must return exactly the plain-DataFrame
  * answer over the same rows. */
class ZOrderFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graftkv_zfuzz").toString + "/t"

  test("random predicates over a 2-dim z table match the DataFrame oracle") {
    val src = spark.range(20000).select(
      (col("id") % 211).as("a"),
      ((col("id") * 7919) % 499).as("b"),
      (col("id") * 3).as("v")).cache()
    // key must be unique: (a, b) collides for this synthetic, so key on
    // a uid third dim the queries never touch (the l_uid pattern)
    val keyed = src.withColumn("u", col("v"))
    val path = tmpTable()
    KvCommands.createZOrderTable(keyed, path, Seq("a", "b", "u"),
      maxSegBytes = Some(32768L))
    val back = KvCommands.table(spark, path)

    val rnd = new scala.util.Random(42)
    def rv(max: Int): Long = rnd.nextInt(max).toLong
    def randomPred(): Column = rnd.nextInt(8) match {
      case 0 => // closed box
        col("a").between(rv(211), rv(211)) && col("b").between(rv(499), rv(499))
      case 1 => col("a") === rv(211) // dim point
      case 2 => col("a").isin(rv(211), rv(211), rv(211)) // IN-list
      case 3 => col("b") >= rv(499) // one-sided
      case 4 => col("a") < rv(211) && col("b") > rv(499) // mixed strict
      case 5 => // residual on a non-dim column composes
        col("a").between(rv(211), rv(211)) && col("v") % 2 === 0
      case 6 => // OR shape: box extraction must IGNORE it, results stay exact
        (col("a") === rv(211)) || (col("b") === rv(499))
      case _ => // contradiction sometimes, empty result must be empty
        col("a") > rv(211) && col("a") < rv(100)
    }

    (1 to 60).foreach { i =>
      // regenerate the predicate with a fixed structure per iteration so
      // both sides see the SAME literals
      val seed = rnd.nextLong()
      def pred(): Column = { rnd.setSeed(seed); randomPred() }
      val exp = src.filter(pred()).select("a", "b", "v")
        .collect().map(_.toSeq).toSet
      val got = back.filter(pred()).select("a", "b", "v")
        .collect().map(_.toSeq).toSet
      assert(got == exp,
        s"iteration $i (seed $seed): z table returned ${got.size} rows, " +
          s"oracle ${exp.size}; missing=${(exp -- got).take(3)} " +
          s"extra=${(got -- exp).take(3)}")
    }
  }

  test("random predicates over a string×long z table match the oracle") {
    val src = (0 until 8000).map { i =>
      (f"u${i % 97}%03d", (i / 97).toLong, i.toLong)
    }.toDF("user", "seq", "v").cache()
    val path = tmpTable()
    KvCommands.createZOrderTable(src, path, Seq("user", "seq"),
      maxSegBytes = Some(16384L))
    val back = KvCommands.table(spark, path)

    val rnd = new scala.util.Random(7)
    def ru(): String = f"u${rnd.nextInt(97)}%03d"
    def randomPred(): Column = rnd.nextInt(5) match {
      case 0 => col("user") === ru() && col("seq").between(rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)
      case 1 => col("user") >= ru() && col("user") <= ru()
      case 2 => col("user").isin(ru(), ru())
      case 3 => col("seq") === rnd.nextInt(80).toLong
      case _ => col("user") > ru() && col("seq") < rnd.nextInt(80).toLong
    }

    (1 to 40).foreach { i =>
      val seed = rnd.nextLong()
      def pred(): Column = { rnd.setSeed(seed); randomPred() }
      val exp = src.filter(pred()).collect().map(_.toSeq).toSet
      val got = back.filter(pred()).select("user", "seq", "v")
        .collect().map(_.toSeq).toSet
      assert(got == exp, s"iteration $i (seed $seed): got ${got.size}, " +
        s"oracle ${exp.size}")
    }
  }
}
