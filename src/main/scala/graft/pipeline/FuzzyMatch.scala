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
    * Bucket width is bounded by the number of DISTINCT strings within
    * one edit of each other sharing a key — exact duplicates collapse
    * to one class row before blocking (round 11; previously a
    * duplicate-heavy corpus put every occurrence in every shared
    * bucket), and pairs expand from verified class pairs, so work is
    * quadratic only where the OUTPUT is. */
  def pairsWithinDistance1(df: DataFrame, idCol: String,
      strCol: String): DataFrame = {
    // Collapse exact duplicates FIRST (the dd3 rep-collapse pattern):
    // one row per DISTINCT string carrying its sorted id list. A
    // duplicate-heavy corpus (the normal pre-dedup state) would
    // otherwise materialize one bucket row per deletion key holding
    // EVERY duplicate occurrence — (dup-class size × key count) structs
    // with full strings. After the collapse a bucket row holds one
    // entry per distinct neighborhood string, each id list exists once,
    // and everything downstream of blocking runs on distinct strings.
    // one row per distinct string: a fixed-width representative id,
    // plus the full id list ONLY for true duplicate classes (null for
    // singletons) — so the exploded deletion-key stage below stays as
    // narrow as the pre-collapse shape on an already-deduped corpus,
    // and array costs materialize only where duplicates exist
    val classes = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .groupBy("s")
      .agg(min(col("id")).as("rep"),
        when(count(lit(1)) > 1, sort_array(collect_list(col("id"))))
          .as("dup_ids"))

    // dist-0 pairs: all id pairs inside one equality class. Quadratic
    // only in the OUTPUT (every emitted pair is a true pair).
    val intra = classes.filter(col("dup_ids").isNotNull)
      .select(col("s"), explode(flatten(transform(col("dup_ids"), (x, i) =>
        transform(slice(col("dup_ids"), i + lit(2), size(col("dup_ids"))),
          y => struct(x.as("id_a"), y.as("id_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("s").as("s_a"),
        col("s").as("s_b"), lit(0).cast("int").as("dist"))

    // dist-1 CLASS pairs over distinct strings, bucket-locally
    // (join-free); verified and de-duplicated on the class pair —
    // strictly cheaper than de-duplicating expanded id pairs
    val keyed = classes.select(col("s"), col("rep"), col("dup_ids"),
      explode(deletionKeys(col("s"))).as("k"))
    val buckets = keyed.groupBy("k")
      .agg(collect_list(struct(col("s"), col("rep"), col("dup_ids")))
        .as("xs"))
      .filter(size(col("xs")) > 1)
    val classPairs = buckets
      .select(explode(flatten(transform(col("xs"), (x, i) =>
        transform(slice(col("xs"), i + lit(2), size(col("xs"))), y =>
          struct(
            when(x("s") < y("s"), x).otherwise(y).as("a"),
            when(x("s") < y("s"), y).otherwise(x).as("b"))))))
        .as("p"))
      .select(col("p.a.s").as("s_a"), col("p.b.s").as("s_b"),
        col("p.a.rep").as("rep_a"), col("p.b.rep").as("rep_b"),
        col("p.a.dup_ids").as("da"), col("p.b.dup_ids").as("db"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("int"))
      .filter(col("dist") === 1) // strings are distinct: dist 0 impossible
      .distinct() // the same class pair can share several deletion keys

    // expand each verified class pair to its id pairs (output-bound);
    // singleton × singleton — the post-exact-dedup common case — is a
    // plain projection of the two representatives
    val cross = classPairs
      .select(col("s_a"), col("s_b"), col("dist"),
        explode(coalesce(col("da"), array(col("rep_a")))).as("x"),
        col("db"), col("rep_b"))
      .select(col("s_a"), col("s_b"), col("dist"), col("x"),
        explode(coalesce(col("db"), array(col("rep_b")))).as("y"))
      .select(
        when(col("x") < col("y"), col("x")).otherwise(col("y")).as("id_a"),
        when(col("x") < col("y"), col("y")).otherwise(col("x")).as("id_b"),
        when(col("x") < col("y"), col("s_a")).otherwise(col("s_b"))
          .as("s_a"),
        when(col("x") < col("y"), col("s_b")).otherwise(col("s_a"))
          .as("s_b"),
        col("dist"))

    intra.unionByName(cross)
  }
}
