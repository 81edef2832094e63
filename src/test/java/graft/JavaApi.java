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
}
