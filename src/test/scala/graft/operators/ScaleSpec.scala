package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed parquet tables join with no shuffle (co-located join)") {
    // the parquet-side analog of the kv storage-partitioned join: both
    // sides pre-hashed into the same bucket count on the join key, so
    // the sort-merge join reads bucket-to-bucket with zero Exchange —
    // at 100 TB this is the difference between joining in place and
    // re-shuffling both tables every query
    spark.sql("DROP TABLE IF EXISTS graft_bucket_fact")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_dim")
    spark.range(20000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .write.bucketBy(8, "k").sortBy("k").format("parquet")
      .saveAsTable("graft_bucket_fact")
    spark.range(5000).select(col("id").as("k"), (col("id") % 3).as("w"))
      .write.bucketBy(8, "k").sortBy("k").format("parquet")
      .saveAsTable("graft_bucket_dim")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-exchange decision (a broadcast would hide it)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_bucket_fact")
        .join(spark.table("graft_bucket_dim"), "k")
      assert(j.count() == 5000)
      val plan = j.queryExecution.sparkPlan.toString
      assert(!plan.contains("Exchange"), plan.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_dim")
    }
  }

  test("saltedJoin equals the plain join, for inner and left joins") {
    val fact = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "v")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")

    val plainInner = fact.join(dim, Seq("k"), "inner")
      .collect().map(_.toSeq).toSet
    val saltedInner = Scale.saltedJoin(fact, dim, "k", nSalts = 4)
      .collect().map(_.toSeq).toSet
    assert(saltedInner == plainInner)

    val plainLeft = fact.join(dim, Seq("k"), "left")
      .collect().map(_.toSeq).toSet
    val saltedLeft = Scale.saltedJoin(fact, dim, "k", nSalts = 4, joinType = "left")
      .collect().map(_.toSeq).toSet
    assert(saltedLeft == plainLeft)
  }

  test("saltedJoin actually spreads a hot key over multiple salts") {
    val fact = spark.range(1000).select(lit(42L).as("k"), col("id").as("v"))
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("k"), col("v")), lit(8)).cast("int"))
    assert(salted.select("__salt").distinct().count() == 8)
  }

  test("parallelizeInput is the identity on small inputs (volume gate)") {
    // r15 verdict item 1: the guard used to shuffle even a sub-MB corpus
    // to 32 partitions; the volume gate must return the SAME frame (no
    // exchange, no plan change) when the input is under the byte floor
    val small = spark.range(1000).toDF().coalesce(1)
    assert(Scale.parallelizeInput(small) eq small)
  }

  test("parallelizeInput repartitions a large under-split input to all cores") {
    spark.conf.set(Scale.ParallelizeMinBytesPerCoreKey, "1")
    try {
      val p = spark.sparkContext.defaultParallelism
      val one = spark.range(100000).toDF().coalesce(1)
      val out = Scale.parallelizeInput(one)
      assert(out.rdd.getNumPartitions == p,
        s"expected $p partitions, got ${out.rdd.getNumPartitions}")
      assert(out.count() == 100000)
      // an input already split to >= cores is left untouched even when
      // the volume gate passes
      val wide = spark.range(100000).toDF().repartition(p)
      assert(Scale.parallelizeInput(wide) eq wide)
    } finally spark.conf.unset(Scale.ParallelizeMinBytesPerCoreKey)
  }

  test("coLocate range-partitions and sorts within partitions") {
    val df = Scale.coLocate(
      graft.Tables.table(spark, TestSpark.sf, "orders"), "o_orderkey", 4)
    assert(df.rdd.getNumPartitions == 4)
    val ordered = df.mapPartitions { it =>
      val ks = it.map(_.getAs[Long]("o_orderkey")).toSeq
      Iterator.single(ks == ks.sorted)
    }(org.apache.spark.sql.Encoders.scalaBoolean).collect()
    assert(ordered.forall(identity))
  }
}
