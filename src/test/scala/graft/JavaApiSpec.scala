package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives the Java-facing API check ([[JavaApi]]): the engine is usable
  * from plain Java — DSv2 reads/writes and the SQL-registered native
  * functions — with no Scala-only types on the call path. */
class JavaApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Java callers can write, read, and query through the engine") {
    val dir = java.nio.file.Files.createTempDirectory("java_api").toString
    assert(JavaApi.writeAndCount(spark, s"$dir/t") == 100L)
    assert(JavaApi.rollingHashFromSql(spark) != 0L)
  }
}
