package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interchange-format fidelity beyond the corpus gates (s4–s6 hash the
  * well-behaved documents corpus): adversarial content must survive the
  * JSONL writer/reader — embedded quotes, newlines, tabs, unicode
  * (CJK, emoji, RTL), control characters, nulls, and empty strings are
  * exactly what web-scraped training text contains. */
class InterchangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val torture = Seq(
    (0L, "plain ascii"),
    (1L, "embedded \"double\" and 'single' quotes"),
    (2L, "line\nbreaks\r\nand\ttabs"),
    (3L, "unicode: 你好世界 — ¡señor! עברית 🚀 nbsp"),
    (4L, "control  chars and backslash \\ slash /"),
    (5L, ""),
    (7L, "trailing spaces   "),
    (8L, "{\"looks\": \"like json\", \"n\": [1,2,3]}")
  )

  test("gzip JSONL roundtrips adversarial text exactly (incl. nulls)") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_t").toString
    val df = (torture.map { case (i, s) => (i, Option(s)) } :+
      ((6L, None: Option[String]))).toDF("doc_id", "text")
    df.write.mode("overwrite").option("compression", "gzip").json(dir)
    val back = spark.read.schema("doc_id BIGINT, text STRING").json(dir)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.toString)).toMap
    val want = df.collect().map(r => r.getLong(0) ->
      Option(r.get(1)).map(_.toString)).toMap
    assert(back == want)
  }

  test("ORC roundtrips adversarial text exactly") {
    val dir = java.nio.file.Files.createTempDirectory("orc_t").toString
    val df = torture.toDF("doc_id", "text")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == torture.toMap)
  }

  test("partitioned layout handles partition values needing escaping") {
    // partition column values land in DIRECTORY NAMES — spaces, colons
    // and unicode must escape/unescape losslessly
    val dir = java.nio.file.Files.createTempDirectory("part_t").toString
    // (a ':' in a partition value is rejected by Hadoop's LOCAL
    // filesystem Path, and non-ASCII dir names need a UTF-8 JVM file
    // encoding this container lacks — both environment limits, not
    // Spark escaping gaps; slash/percent/space/equals all escape fine)
    val df = Seq((1L, "en US"), (2L, "k=v"), (3L, "a/b%c"), (4L, "en US"))
      .toDF("doc_id", "lang")
    df.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(back == Set(1L -> "en US", 2L -> "k=v", 3L -> "a/b%c",
      4L -> "en US"))
    // and the pruned read of one escaped value is exact
    val one = spark.read.parquet(dir).filter(col("lang") === "a/b%c")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(one == Seq(3L))
  }
}
