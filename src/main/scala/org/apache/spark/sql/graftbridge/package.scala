package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * converters, the supported pattern for libraries that ship native
  * Catalyst expressions (Spark 4 moved Column onto ColumnNode, so
  * third-party expressions must round-trip through these).
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A DSv2 literal from an external Scala value — `LiteralValue` is
    * `private[sql]`, so tests driving `SupportsRuntimeV2Filtering`
    * directly mint runtime predicates through this. */
  def v2Literal(value: Any, dt: org.apache.spark.sql.types.DataType)
      : connector.expressions.Literal[_] =
    connector.expressions.LiteralValue(
      org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(value), dt)

  /** True when the session's CacheManager holds no cached plans — the
    * bench's section-boundary assertion (explicit cache lifecycle: no
    * cached plan may survive a section sweep; CacheManager is
    * `private[sql]`, hence this bridge). */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** (count, bytes mem+disk) of BROADCAST blocks currently held by this
    * process's BlockManager. `spark.catalog.clearCache()` does NOT free
    * broadcast blocks — they are reclaimed only when ContextCleaner sees
    * the driver-side Broadcast objects garbage-collected — so a long
    * multi-section benchmark run can accumulate hundreds of dead build
    * relations that pin storage memory and slow every later broadcast
    * build. The bench reads this at section boundaries (before/after a
    * forced GC) to make that pressure measurable from the artifact
    * alone. (BlockManager is `private[spark]`, hence this bridge.) */
  def broadcastBlockStats(spark: SparkSession): (Int, Long) = {
    val bm = org.apache.spark.SparkEnv.get.blockManager
    val ids = bm.getMatchingBlockIds(_.isBroadcast)
    val bytes = ids.iterator.flatMap(bm.getStatus).map(s => s.memSize + s.diskSize).sum
    (ids.size, bytes)
  }

  /** Resolve the catalog a multipart table name targets, mirroring
    * Spark's own LookupCatalog rule: a first part naming a registered
    * catalog wins, anything else lands in the session's current catalog.
    * (CatalogManager itself is `private[sql]`, hence this bridge.) */
  def catalogOf(spark: SparkSession, nameParts: Seq[String])
      : org.apache.spark.sql.connector.catalog.CatalogPlugin =
    catalogAndRest(spark, nameParts)._1

  /** Look up a registered catalog by its registration name
    * (CatalogManager is `private[sql]`, hence this bridge). */
  def catalogByName(spark: SparkSession, name: String)
      : org.apache.spark.sql.connector.catalog.CatalogPlugin =
    spark.sessionState.catalogManager.catalog(name)

  /** Like [[catalogOf]], but also returns the name parts REMAINING after
    * catalog resolution (namespace + table). */
  def catalogAndRest(spark: SparkSession, nameParts: Seq[String])
      : (org.apache.spark.sql.connector.catalog.CatalogPlugin, Seq[String]) = {
    val cm = spark.sessionState.catalogManager
    nameParts match {
      case head +: rest if rest.nonEmpty && cm.isCatalogRegistered(head) =>
        (cm.catalog(head), rest)
      case _ => (cm.currentCatalog, nameParts)
    }
  }
}
