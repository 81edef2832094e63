package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-path rewrites for skew and data placement. Semantics-preserving
  * by construction — the salted join is oracle-checked against the plain
  * join in the correctness gate. */
object Scale {

  /** Skew-safe equi-join: the fact side gets a deterministic salt in
    * [0, nSalts), the dim side is replicated once per salt, and the join
    * key becomes (key, salt) — a hot key's rows now spread over nSalts
    * shuffle partitions instead of one straggler task. Use when AQE's
    * skew handling isn't enough (e.g. sort-merge join on a power-law
    * key at 100 TB). Deterministic: the salt is a hash of the fact row's
    * join key and secondary columns, not rand(). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      nSalts: Int = 8, joinType: String = "inner",
      saltBy: Seq[String] = Nil): DataFrame = {
    // right/full outer would emit nSalts copies of unmatched dim rows
    // (the dim side is replicated) — only fact-preserving joins are sound
    require(Set("inner", "left", "leftouter", "cross")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltCols: Seq[Column] =
      (key +: (if (saltBy.nonEmpty) saltBy else fact.columns.toSeq.filterNot(_ == key)))
        .map(col)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(nSalts)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Input-parallelism guard (optimization guide §2.5, "input skew: one
    * huge unsplittable file … otherwise repartition immediately after
    * the read"): when a source scan yields fewer partitions than the
    * session's parallelism, redistribute rows round-robin so downstream
    * per-row map work (tokenize / shingle / hash kernels) uses every
    * core. The driver corpus is single-row-group parquet — ONE scan
    * task per table regardless of cores — which otherwise serializes
    * every CPU-heavy map stage. Scale-adaptive by construction: at real
    * scale inputs arrive in ≥ cores splits and this is the identity (the
    * shuffle fires only on under-split inputs, and then moves only the
    * small under-split bytes). Retry-deterministic: keyless repartition
    * sorts before round-robin (SPARK-23207, on by default). */
  def parallelizeInput(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Pre-partition a fact table for repeated co-located joins/aggs on
    * `key`: one range shuffle now, none later (bucketing analog without
    * a metastore). */
  def coLocate(df: DataFrame, key: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col(key))
      .sortWithinPartitions(key)
}
