package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching: all pairs within Levenshtein distance 1,
  * without the all-pairs join.
  *
  * Blocking is the FastSS deletion-neighborhood scheme: two strings are
  * within edit distance 1 iff they share a key in {s} ∪ del1(s) (equal →
  * share s; substitution at i → share del_i; insert/delete → the shorter
  * string IS a deletion of the longer). So candidate generation is an
  * equi-join on generated keys — shuffle O(Σ len(s)) — with exact
  * `levenshtein` verification only inside key buckets; recall is exact by
  * construction, precision restored by the verify filter. At 100 TB this
  * is the difference between |S|·avg_len shuffled rows and |S|² pairs.
  */
object FuzzyMatch {

  /** The string plus every single-character deletion, de-duplicated. */
  def deletionKeys(s: Column): Column =
    array_distinct(concat(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s))))))

  /** All (id_a < id_b) pairs with levenshtein(s_a, s_b) <= 1.
    * Returns (id_a, id_b, s_a, s_b, dist).
    *
    * Candidates are generated BUCKET-LOCALLY: group by deletion key,
    * emit the intra-bucket pairs with a higher-order transform — one
    * shuffle of O(Σ len) rows and zero joins. (A self-join formulation
    * builds an |S|·avg_len-row hash relation that Spark happily
    * broadcasts three reps in a row — measured at 5 s and a poisoned
    * JVM for every query after it at sf0.1; this shape is 0.4 s.)
    * Bucket width is bounded by the number of strings within one edit
    * of each other sharing a key — quadratic only where the OUTPUT is. */
  def pairsWithinDistance1(df: DataFrame, idCol: String,
      strCol: String): DataFrame = {
    val keyed = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"), explode(deletionKeys(col("s"))).as("k"))
    val buckets = keyed.groupBy("k")
      .agg(collect_list(struct(col("id"), col("s"))).as("xs"))
      .filter(size(col("xs")) > 1)
    buckets
      .select(explode(flatten(transform(col("xs"), (x, i) =>
        transform(slice(col("xs"), i + lit(2), size(col("xs"))), y =>
          struct(
            when(x("id") < y("id"), x("id")).otherwise(y("id")).as("id_a"),
            when(x("id") < y("id"), y("id")).otherwise(x("id")).as("id_b"),
            when(x("id") < y("id"), x("s")).otherwise(y("s")).as("s_a"),
            when(x("id") < y("id"), y("s")).otherwise(x("s")).as("s_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.s_a"), col("p.s_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("int"))
      .filter(col("dist") <= 1)
      .distinct() // the same pair can share several deletion keys
  }
}
