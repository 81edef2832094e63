package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: same-process A/B of one session conf over a named
  * SparkEntry query — reps INTERLEAVED (A,B,A,B,…) so machine drift
  * (page cache, JIT, background load) cancels out of the comparison;
  * cross-process A/B on this sandbox drifts ±30% and proves nothing.
  * Usage: AbProbe <sfDir> <name> <reps> <confKey> <valA> <valB>
  * ("unset" as a value unsets the conf for that arm). */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val name = args(1); val reps = args(2).toInt
    val key = args(3); val valA = args(4); val valB = args(5)
    def setArm(v: String): Unit =
      if (v == "unset") spark.conf.unset(key) else spark.conf.set(key, v)
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed warmup per arm (codegen + fixture builds)
    Seq(valA, valB).foreach { v => setArm(v); once() }
    val rec = collection.mutable.Map("A" -> Vector.empty[Double],
      "B" -> Vector.empty[Double])
    (1 to reps).foreach { _ =>
      Seq("A" -> valA, "B" -> valB).foreach { case (arm, v) =>
        setArm(v); rec(arm) :+= once()
      }
    }
    def stats(xs: Vector[Double]): String = {
      val s = xs.sorted
      f"median ${s(s.length / 2)}%.3f  min ${s.head}%.3f  max ${s.last}%.3f"
    }
    println(s"A ($key=$valA): ${stats(rec("A"))}")
    println(s"B ($key=$valB): ${stats(rec("B"))}")
    spark.stop()
  }
}
