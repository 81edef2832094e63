package graft;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;

/**
 * Java-facing surface check (reference ships a Java API suite,
 * src/test/java/.../JavaAPISuite.java): everything a Java user needs —
 * reading the graftkv source, SQL over the catalog, the native SQL
 * functions — is plain Spark Java API against this library. Driven from
 * JavaApiSpec (scalatest), since the build's test framework is
 * scalatest-only.
 */
public final class JavaApi {

  private JavaApi() {}

  /** Create a kv table from Java, read it back with a pushed filter. */
  public static long writeAndCount(SparkSession spark, String kvPath) {
    Dataset<Row> df = spark.range(1000)
        .selectExpr("id as k", "id * 2 as v");
    df.write().format("graftkv").option("key", "k")
        .mode("overwrite").save(kvPath);
    Dataset<Row> back = spark.read().format("graftkv").load(kvPath);
    return back.filter("k >= 100 and k < 200").count();
  }

  /** The SQL-registered native expressions work from Java sessions too. */
  public static long rollingHashFromSql(SparkSession spark) {
    Row r = spark.sql("SELECT rolling_hash('the quick brown fox', 8) AS h")
        .head();
    return r.getLong(0);
  }

  /**
   * Full DDL/DML lifecycle through the catalog plugin from plain Java —
   * the reference's JavaAPISuite flow (CREATE with a composite primary
   * key, INSERT, SELECT) completed with UPDATE-by-upsert and DELETE.
   * Returns the row count surviving at the end (expected: 2).
   */
  public static long catalogCrud(SparkSession spark, String catalogRoot) {
    String cat = "gjava" + Math.abs(catalogRoot.hashCode() % 100000);
    spark.conf().set("spark.sql.catalog." + cat,
        "graft.connector.GraftKvCatalog");
    spark.conf().set("spark.sql.catalog." + cat + ".root", catalogRoot);
    String t = cat + ".db.java_t";
    // DECIMAL money column: stored natively in the kv codec (round 9)
    spark.sql("CREATE TABLE " + t
        + " (region STRING, id BIGINT, payload STRING, amount DECIMAL(12,2))"
        + " TBLPROPERTIES ('key'='region,id')");
    spark.sql("INSERT INTO " + t + " VALUES"
        + " ('eu', 1, 'a', 1.50), ('eu', 2, 'b', 2.50), ('us', 1, 'c', 3.50)");
    // point SELECT through the pushed composite-key filter
    Row row = spark.sql(
        "SELECT payload FROM " + t + " WHERE region = 'eu' AND id = 2").head();
    if (!row.getString(0).equals("b")) {
      throw new IllegalStateException("point lookup returned " + row);
    }
    // Put-upsert: same key replaces the row (exact decimal round-trip)
    spark.sql("INSERT INTO " + t + " VALUES ('eu', 2, 'b2', 9.50)");
    Row upd = spark.sql(
        "SELECT payload, amount FROM " + t
        + " WHERE region = 'eu' AND id = 2").head();
    if (!upd.getString(0).equals("b2")
        || upd.getDecimal(1).compareTo(new java.math.BigDecimal("9.50")) != 0) {
      throw new IllegalStateException("upsert not applied: " + upd);
    }
    // DELETE routes through the tombstone write path
    spark.sql("DELETE FROM " + t + " WHERE region = 'us'");
    long n = spark.sql("SELECT * FROM " + t).count();
    // graft statement extensions parse from Java sessions too
    Row detail = spark.sql("DESCRIBE DETAIL " + t).head();
    if (detail.getLong(detail.fieldIndex("tombstones")) < 1) {
      throw new IllegalStateException("tombstone not recorded: " + detail);
    }
    spark.sql("DROP TABLE " + t);
    return n;
  }
}
