package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("v")).head().get(0)

  test("native whitespace_tokens ≡ regex split+filter on random strings " +
      "(incl. unicode, every \\s char, empties)") {
    val rng = new scala.util.Random(421)
    val alphabet = "ab \t\n\f\r.é中 -"
    val cases = Seq("", " ", "a", " a ", "a  b", "\t\n x \r\n",
      " nbsp is not ws ", "多 语 言", "ab\fc") ++
      (1 to 300).map(_ => (0 until rng.nextInt(40))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = cases.toDF("t").select(
      col("t"),
      TextFunctions.tokens(col("t")).as("native"),
      filter(split(col("t"), "\\s+"), t => length(t) > 0).as("regex"))
    val bad = df.filter(not(col("native") === col("regex"))).collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
    // null text behaves like the regex path (null in, null out)
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextFunctions.tokens(col("t"))).head().isNullAt(0)
    assert(n)
  }

  test("tokenCount counts whitespace tokens, collapsing runs") {
    assert(one(TextFunctions.tokenCount(col("t")), "a b  c\td") == 4)
    assert(one(TextFunctions.tokenCount(col("t")), "  leading and trailing  ") == 3)
  }

  test("wordShingles produces n-token windows") {
    val sh = one(TextFunctions.wordShingles(col("t"), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSeq == Seq("a b c", "b c d"))
    // shorter than n → whole text as one shingle
    val short = one(TextFunctions.wordShingles(col("t"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(short.toSeq == Seq("a b"))
  }

  test("quality score is in [0,1] and ranks clean text above symbol soup") {
    val clean = one(TextFunctions.qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog and it is a fine day in the park")
      .asInstanceOf[Double]
    val soup = one(TextFunctions.qualityScore(col("t")),
      "@#$%^&*()!!! ~~ ++ == ;;; @#$%").asInstanceOf[Double]
    assert(clean >= 0 && clean <= 1 && soup >= 0 && soup <= 1)
    assert(clean > soup)
  }

  test("langId picks the stopword-dominant language") {
    assert(one(TextFunctions.langId(col("t")),
      "the cat and the dog sat in that house and it was warm") == "en")
    assert(one(TextFunctions.langId(col("t")),
      "der hund und die katze das ist nicht ein problem") == "de")
    assert(one(TextFunctions.langId(col("t")),
      "el perro y la casa de que los gatos para una familia") == "es")
    assert(one(TextFunctions.langId(col("t")), "xyzzy plugh") == "und")
    assert(one(TextFunctions.langId(col("t")), "你好世界你好世界") == "zh")
  }

  test("redactPii masks emails, urls, and long digit runs") {
    val df = Seq(
      "mail me at jane.doe+x@example.co.uk today",
      "see https://example.com/a?b=1 and http://x.io",
      "id 1234567890 but keep 12345 and the year 2024",
      "clean text stays clean"
    ).toDF("text").select(TextFunctions.redactPii(col("text")).as("r"))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "mail me at [EMAIL] today",
      "see [URL] and [URL]",
      "id [NUM] but keep 12345 and the year 2024",
      "clean text stays clean"))
  }

  test("fingerprints are normalization-invariant") {
    val a = one(TextFunctions.fingerprintMd5(col("t")), "Hello   World")
    val b = one(TextFunctions.fingerprintMd5(col("t")), "hello world ")
    assert(a == b)
  }

  test("rolling hash: equal text equal hash, window-local change moves it") {
    val h1 = one(RollingHash.rolling_hash(col("t"), 8), "abcdefghijklmnop")
    val h2 = one(RollingHash.rolling_hash(col("t"), 8), "abcdefghijklmnop")
    val h3 = one(RollingHash.rolling_hash(col("t"), 8), "abcdefghijklmnoq")
    assert(h1 == h2 && h1 != h3)
    assert(one(RollingHash.rolling_hash(col("t"), 8), "") == 0L)
  }

  test("rolling hash works inside whole-stage codegen over a table") {
    val n = graft.Tables.table(spark, TestSpark.sf, "documents")
      .select(RollingHash.rolling_hash(col("text")).as("h"))
      .filter(col("h").isNotNull).count()
    assert(n == 500)
  }
}
