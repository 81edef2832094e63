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

  test("Java DDL/DML lifecycle: CREATE → INSERT → SELECT → upsert → DELETE") {
    // the reference pins Java interop for its SQL surface
    // (src/test/java/.../JavaAPISuite.java:34-80: CREATE with composite
    // PK → INSERT → SELECT from a Java context); this drives the same
    // flow through the catalog plugin + parser extension, plus the DML
    // the reference lacked
    val root = java.nio.file.Files.createTempDirectory("java_crud").toString
    assert(JavaApi.catalogCrud(spark, root) == 2L)
  }
}
