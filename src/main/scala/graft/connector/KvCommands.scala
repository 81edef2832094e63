package graft.connector

import graft.store.SegmentFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** DDL/DML command surface over graftkv tables — the Spark-native
  * restatement of the reference's parser-level commands
  * (/root/reference src/main/scala/.../execution/hbaseCommands.scala):
  * CREATE (O1) → createTable, DROP (O2) → dropTable, INSERT SELECT (O7)
  * → append, LOAD DATA (O8) → bulkLoadCsv, SHOW/DESCRIBE (O4/O5) →
  * describe. Each is a thin declarative wrapper: the heavy lifting
  * (range shuffle + sort + segment write) is the connector's
  * RequiresDistributionAndOrdering write path.
  */
object KvCommands {

  /** O1: CREATE TABLE ... (+ initial data). The key columns are the
    * composite primary key, in order; `encoding` picks the per-table
    * codec (binary | stringformat, reference DDL `IN stringformat`). */
  def createTable(df: DataFrame, path: String, keys: Seq[String],
      encoding: String = graft.store.RowCodec.Binary): Unit =
    df.write.format("graftkv")
      .option("key", keys.mkString(","))
      .option("encoding", encoding)
      .mode("overwrite")
      .save(path)

  /** O7: INSERT INTO t SELECT ... (append new sorted segments). */
  def append(df: DataFrame, path: String): Unit =
    df.write.format("graftkv").mode("append").save(path)

  /** Read back (the relation itself). */
  def table(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graftkv").load(path)

  /** O8: LOAD DATA INPATH — CSV with an explicit schema goes through the
    * same range-shuffle + sort + segment pipeline as any insert. */
  def bulkLoadCsv(spark: SparkSession, csvPath: String, schemaDdl: String,
      path: String, keys: Seq[String], delimiter: String = ","): Unit = {
    val df = spark.read
      .option("delimiter", delimiter)
      .schema(schemaDdl)
      .csv(csvPath)
    createTable(df, path, keys)
  }

  /** O2: DROP TABLE (logical+physical here — no catalog indirection). */
  def dropTable(path: String): Unit = {
    val d = new java.io.File(path)
    Option(d.list()).getOrElse(Array.empty[String])
      .filter(n => n.endsWith(".kv") || n.endsWith(".kvmeta") || n == "_graft_meta.json")
      .foreach(n => new java.io.File(d, n).delete())
    d.delete()
  }

  /** O5: DESCRIBE — one row per column: (name, type, KEY order / NONKEY),
    * plus per-segment region info if requested. */
  def describe(spark: SparkSession, path: String): DataFrame = {
    val KvTableMeta(schema, keys, _) = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    import scala.jdk.CollectionConverters._
    val rows = schema.fields.map { f =>
      val ki = keys.indexOf(f.name)
      Row(f.name, f.dataType.simpleString,
        if (ki >= 0) s"KEY($ki)" else "NONKEY")
    }.toSeq.asJava
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("col_name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("data_type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("role", org.apache.spark.sql.types.StringType))))
  }

  /** Region (segment) inventory: file, rows, bytes — SHOW-style metadata. */
  def segments(path: String): Seq[(String, Long, Long)] =
    SegmentFile.listSegments(path).map(m => (m.file, m.count, m.sizeBytes))

  /** Compaction: appends create key-overlapping segments (pruning still
    * correct, but a point lookup may touch several runs); rewriting the
    * table through the ordered write path restores disjoint sorted
    * segments — the major-compaction analog of an LSM/region store.
    * Safe in one step: new segments get fresh names and the overwrite
    * commit deletes the old files only after every task finished. */
  def compact(spark: SparkSession, path: String): Unit = {
    val m = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    createTable(table(spark, path), path, m.keys, m.encoding)
  }
}
