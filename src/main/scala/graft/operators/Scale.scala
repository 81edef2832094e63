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

  /** Pre-partition a fact table for repeated co-located joins/aggs on
    * `key`: one range shuffle now, none later (bucketing analog without
    * a metastore). */
  def coLocate(df: DataFrame, key: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col(key))
      .sortWithinPartitions(key)
}
