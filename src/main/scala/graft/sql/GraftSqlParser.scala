package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL statement surface for bulk load (reference
  * `LOAD DATA [LOCAL] INPATH f INTO TABLE t [FIELDS TERMINATED BY c]`,
  * HBaseSQLParser.scala:213-222): a thin parser interceptor that
  * recognizes the LOAD statement and hands everything else to Spark's
  * own parser. The command itself is declarative — CSV read with the
  * target table's schema, appended (or overwritten) THROUGH THE CATALOG
  * with `writeTo`, so the catalog's range-shuffle + sorted-segment write
  * path does the heavy lifting; there is no imperative load loop.
  *
  * Combined with CREATE TABLE ... TBLPROPERTIES('key'='...') on the
  * graft catalog, the whole reference CLI flow (create → load → query)
  * is plain SQL statements.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    parsePlan0(GraftSqlParser.rewriteApproximate(sqlText))

  private def parsePlan0(sqlText: String): LogicalPlan = sqlText match {
    // reference DDL surface verbatim (HBaseSQLParser.scala:77-157):
    // CREATE TABLE t(cols…, PRIMARY KEY(k…)) MAPPED BY ([ns.]htable,
    // COLS=[col=family.qualifier,…]) [IN stringformat] — sugar over the
    // graft catalog's CREATE TABLE + TBLPROPERTIES: the key order and
    // encoding become the real table layout, the hbase-side names are
    // recorded as persisted table properties (grammar parity — there is
    // no HBase here, the kv store itself plays that role)
    case GraftSqlParser.CreateMappedStmt(table, colsTxt, keysTxt, ns, htable,
        colMapTxt, encodingTxt) =>
      val cols = GraftSqlParser.splitTopLevel(colsTxt).map { d =>
        val t = d.trim
        val cut = t.indexWhere(_.isWhitespace)
        require(cut > 0, s"CREATE…MAPPED BY: malformed column def '$t'")
        t.take(cut) -> delegate.parseDataType(t.drop(cut).trim)
      }
      val keys = keysTxt.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val colMap = GraftSqlParser.splitTopLevel(colMapTxt).map { m =>
        val parts = m.split('=').map(_.trim)
        require(parts.length == 2 && parts(1).count(_ == '.') == 1,
          s"CREATE…MAPPED BY: COLS entry '$m' is not col=family.qualifier")
        parts(0) -> parts(1)
      }
      // the reference's own consistency rules (HBaseSQLParser.scala:100-110):
      // names distinct, keys ∪ mapped = all columns, keys ∩ mapped = ∅
      val colSet = cols.map(_._1).toSet
      val keySet = keys.toSet
      val mapSet = colMap.map(_._1).toSet
      require(colSet.size == cols.length && keySet.size == keys.length &&
        (keySet union mapSet) == colSet && (keySet intersect mapSet).isEmpty,
        "The Column Info of Create Table are not correct: PRIMARY KEY " +
          "columns and COLS-mapped columns must partition the column list")
      val encoding = Option(encodingTxt).map(_.toLowerCase) match {
        case None | Some("binaryformat") => graft.store.RowCodec.Binary
        case Some("stringformat") => graft.store.RowCodec.StringFormat
        case Some(other) => throw new IllegalArgumentException(
          s"CREATE…MAPPED BY: unknown encoding '$other' " +
            "(binaryformat | stringformat)")
      }
      GraftCreateMappedTableCommand(
        table.replace("`", "").split('.').toSeq,
        StructType(cols.map { case (n, dt) =>
          org.apache.spark.sql.types.StructField(n, dt) }),
        keys,
        Option(ns).map(n => s"$n.$htable").getOrElse(htable),
        colMap, encoding)
    // ALTER TABLE t ADD col type MAPPED BY (col=family.qualifier) —
    // the reference's schema-evolution sugar (HBaseSQLParser.scala:
    // 191-209): a metadata-only non-key column add, with the
    // hbase-side mapping folded into the persisted mapped.cols
    // property the CREATE form established
    case GraftSqlParser.AlterAddMappedStmt(table, col, colType, mcol, fam, qual)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      require(mcol.equalsIgnoreCase(col),
        s"ALTER TABLE…ADD…MAPPED BY: the mapping names '$mcol' but the " +
          s"added column is '$col'")
      GraftAlterAddMappedColCommand(table.replace("`", "").split('.').toSeq,
        col, delegate.parseDataType(colType), s"$fam.$qual")
    // ALTER TABLE t DROP col — the reference's COLUMN-less drop
    // (HBaseSQLParser.scala:185-189); key columns are refused by the
    // catalog, matching alterTableDropNonKey
    case GraftSqlParser.AlterDropStmt(table, col)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftAlterDropColCommand(table.replace("`", "").split('.').toSeq, col)
    // intercept ONLY when the target table resolves into a graft
    // catalog — Spark's own LOAD DATA (Hive-table file move) keeps its
    // stock semantics for every other catalog/table
    case GraftSqlParser.LoadStmt(_, path, overwrite, table, delim)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftLoadDataCommand(path,
        table.replace("`", "").split('.').toSeq,
        Option(delim), overwrite != null)
    case GraftSqlParser.ShowSnapshotsStmt(table)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftShowSnapshotsCommand(table.replace("`", "").split('.').toSeq)
    case GraftSqlParser.RefreshIndexStmt(idx, table)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftRefreshIndexCommand(idx,
        table.replace("`", "").split('.').toSeq)
    case GraftSqlParser.ShowIndexesStmt(table)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftShowIndexesCommand(table.replace("`", "").split('.').toSeq)
    case GraftSqlParser.CreateMvStmt(view, table, groupCols, sumCols, mmCols)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      def parse(s: String) = Option(s)
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      GraftCreateMvCommand(view, table.replace("`", "").split('.').toSeq,
        groupCols.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
        parse(sumCols), parse(mmCols))
    case GraftSqlParser.RefreshMvStmt(view, table)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftRefreshMvCommand(view, table.replace("`", "").split('.').toSeq)
    case GraftSqlParser.ShowMvsStmt(table)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftShowMvsCommand(table.replace("`", "").split('.').toSeq)
    case GraftSqlParser.DropMvStmt(view, table)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftDropMvCommand(view, table.replace("`", "").split('.').toSeq)
    case GraftSqlParser.CompactStmt(table, major)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftCompactCommand(table.replace("`", "").split('.').toSeq,
        major != null)
    case GraftSqlParser.AnalyzeStmt(table, cols)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftAnalyzeCommand(table.replace("`", "").split('.').toSeq,
        Option(cols).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil))
    case GraftSqlParser.DescribeDetailStmt(table)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftDescribeDetailCommand(table.replace("`", "").split('.').toSeq)
    case GraftSqlParser.OptimizeStmt(table, dims)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftOptimizeCommand(table.replace("`", "").split('.').toSeq,
        Option(dims).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil))
    case GraftSqlParser.CloneStmt(src, dst, v)
        if GraftSqlParser.targetsGraftCatalog(
          src.replace("`", "").split('.').toSeq) &&
          GraftSqlParser.targetsGraftCatalog(
            dst.replace("`", "").split('.').toSeq) =>
      GraftCloneCommand(src.replace("`", "").split('.').toSeq,
        dst.replace("`", "").split('.').toSeq,
        Option(v).map(_.toLong))
    case GraftSqlParser.RestoreStmt(table, v)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      GraftRestoreCommand(table.replace("`", "").split('.').toSeq, v.toLong)
    case GraftSqlParser.VacuumStmt(table, n, unit)
        if GraftSqlParser.targetsGraftCatalog(
          table.replace("`", "").split('.').toSeq) =>
      val retainMs = (Option(n), Option(unit)) match {
        case (Some(v), Some(u)) =>
          val mult = u.toUpperCase.stripSuffix("S") match {
            case "MINUTE" => 60000L
            case "HOUR" => 3600000L
            case _ => 86400000L // DAY
          }
          v.toLong * mult
        case _ => 600000L // default grace = the compaction retention window
      }
      GraftVacuumCommand(table.replace("`", "").split('.').toSeq, retainMs)
    // SEARCH INDEX: the same ranking served from a MATERIALIZED
    // inverted index (Retrieval.buildIndex dir) — |query| key-range
    // probes, the corpus text is never read; bit-identical to the
    // scan-path SEARCH over the indexed corpus
    case GraftSqlParser.SearchIndexStmt(dir, terms, k) =>
      GraftSearchIndexCommand(dir, terms.trim.split("\\s+").toSeq,
        Option(k).map(_.toInt).getOrElse(10))
    // SEARCH is not Spark SQL at all (the delegate would throw), so no
    // catalog gate: any resolvable table/view with a doc_id + text-ish
    // column is searchable
    case GraftSqlParser.SearchStmt(table, terms, textCol, k) =>
      GraftSearchCommand(table.replace("`", "").split('.').toSeq,
        terms.trim.split("\\s+").toSeq,
        Option(textCol).map(_.replace("`", "")).getOrElse("text"),
        Option(k).map(_.toInt).getOrElse(10))
    // a SEARCH that the statement regex rejects (quote inside the term
    // literal, odd identifier, …) would otherwise fall through to the
    // Spark delegate, which throws an opaque error on the SEARCH
    // keyword — fail loudly with the statement's actual grammar
    case s if s.trim.matches("(?is)SEARCH\\s.*") =>
      throw new IllegalArgumentException(
        "SEARCH: malformed statement — expected SEARCH <table> FOR " +
          "'<terms>' [USING <col>] [TOP <k>]; terms are " +
          "whitespace-separated words and must not contain quotes")
    // same loud-failure treatment for a CREATE…MAPPED BY the statement
    // regex rejects — the Spark delegate can't parse MAPPED BY at all.
    // The keyword test runs on the literal/comment-masked text, so a
    // valid CTAS whose string literal or comment merely MENTIONS
    // "MAPPED BY" still delegates to Spark untouched
    case s if GraftSqlParser.maskProtected(s).trim
        .matches("(?is)CREATE\\s.*\\bMAPPED\\s+BY\\b.*") =>
      throw new IllegalArgumentException(
        "CREATE TABLE…MAPPED BY: malformed statement — expected " +
          "CREATE TABLE t(col type, …, PRIMARY KEY(k, …)) MAPPED BY " +
          "([ns.]htable, COLS=[col=family.qualifier, …]) [IN stringformat]")
    case s if GraftSqlParser.maskProtected(s).trim
        .matches("(?is)ALTER\\s.*\\bMAPPED\\s+BY\\b.*") =>
      throw new IllegalArgumentException(
        "ALTER TABLE…ADD…MAPPED BY: malformed statement (or the table " +
          "is not in a graft catalog) — expected ALTER TABLE t ADD " +
          "col type MAPPED BY (col=family.qualifier)")
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  /** LOAD [PARALL] DATA [LOCAL] INPATH 'p' [OVERWRITE] INTO TABLE t
    * [FIELDS TERMINATED BY 'c'] — LOCAL is accepted and ignored (all
    * paths are filesystem paths here). PARALL is the reference's
    * parallel-load variant (HBaseSQLParser.scala:213-222); both spellings
    * route to the same distributed range-shuffle write — in this
    * architecture every load IS the parallel path, so the keyword is
    * grammar parity, not a second code path. */
  private[sql] val LoadStmt =
    ("""(?is)\s*LOAD\s+(?:PARALL\s+)?DATA\s+(LOCAL\s+)?INPATH\s+'([^']+)'\s+(OVERWRITE\s+)?INTO\s+TABLE\s+""" +
      """([\w.`]+)(?:\s+FIELDS\s+TERMINATED\s+BY\s+'([^']*)')?\s*;?\s*""").r

  /** SHOW SNAPSHOTS FOR|IN [TABLE] t — the time-travel commit log. */
  private[sql] val ShowSnapshotsStmt =
    """(?is)\s*SHOW\s+SNAPSHOTS\s+(?:FOR|IN)\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r

  /** REFRESH INDEX i ON [TABLE] t — advance the index to the table's
    * current snapshot by applying the CDC diff since its watermark
    * (CREATE INDEX / DROP INDEX are stock Spark SQL via SupportsIndex). */
  private[sql] val RefreshIndexStmt =
    """(?is)\s*REFRESH\s+INDEX\s+(\w+)\s+ON\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r

  /** SHOW INDEXES FOR|IN [TABLE] t — name, columns, watermark, sync. */
  private[sql] val ShowIndexesStmt =
    """(?is)\s*SHOW\s+INDEXES\s+(?:FOR|IN)\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r

  /** CREATE MATERIALIZED VIEW v ON [TABLE] t GROUP BY c,..
    * [SUM (c,..)] [MINMAX (c,..)] — an incrementally-maintained
    * COUNT/SUM/MIN/MAX aggregate (KvMatView). */
  private[sql] val CreateMvStmt =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+ON\s+(?:TABLE\s+)?([\w.`]+)""" +
      """\s+GROUP\s+BY\s+([\w\s,]+?)(?:\s+SUM\s*\(([\w\s,]+)\))?""" +
      """(?:\s+MINMAX\s*\(([\w\s,]+)\))?\s*;?\s*""").r

  /** REFRESH MATERIALIZED VIEW v ON [TABLE] t — fold the CDC delta. */
  private[sql] val RefreshMvStmt =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s+ON\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r

  /** SHOW MATERIALIZED VIEWS FOR|IN [TABLE] t. */
  private[sql] val ShowMvsStmt =
    """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s+(?:FOR|IN)\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r

  /** DROP MATERIALIZED VIEW v ON [TABLE] t. */
  private[sql] val DropMvStmt =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(\w+)\s+ON\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r

  /** COMPACT TABLE t [MAJOR] — minor compaction (overlap groups only)
    * by default; MAJOR rewrites the whole table into disjoint runs. */
  private[sql] val CompactStmt =
    """(?is)\s*COMPACT\s+TABLE\s+([\w.`]+)(\s+MAJOR)?\s*;?\s*""".r

  /** CLONE TABLE s INTO d [VERSION AS OF n] — zero-copy snapshot clone
    * (hard-linked immutable segments; see KvCommands.cloneTable). */
  private[sql] val CloneStmt =
    ("""(?is)\s*CLONE\s+TABLE\s+([\w.`]+)\s+INTO\s+([\w.`]+)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""").r

  /** RESTORE TABLE t [TO] VERSION AS OF n — roll back to a retained
    * snapshot as a new forward commit (metadata-only; undoable until
    * the sweep). */
  private[sql] val RestoreStmt =
    ("""(?is)\s*RESTORE\s+TABLE\s+([\w.`]+)\s+(?:TO\s+)?""" +
      """VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r

  /** ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c,..] — build /
    * refresh the NDV sketch pack and report table rows plus per-column
    * distinct estimates and zone-map bounds (metadata-only; the same
    * numbers the CBO column statistics serve). */
  private[sql] val AnalyzeStmt =
    ("""(?is)\s*ANALYZE\s+TABLE\s+([\w.`]+)\s+COMPUTE\s+STATISTICS""" +
      """(?:\s+FOR\s+COLUMNS\s+([\w\s,]+?))?\s*;?\s*""").r

  /** VACUUM [TABLE] t [RETAIN n MINUTES|HOURS|DAYS] — reclaim replaced /
    * orphaned segment files and expired snapshot manifests older than
    * the retention window (default: the compaction grace window). */
  /** DESCRIBE DETAIL t — one-row table-health summary (the Delta-style
    * statement): storage layout, physical totals, maintenance signals,
    * and derived-artifact counts. */
  private[sql] val DescribeDetailStmt =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+([\w.`]+)\s*;?\s*""".r

  /** OPTIMIZE t [ZORDER BY (a, b, …)] — the Delta-style maintenance
    * statement: plain form runs MAJOR compaction; the ZORDER form
    * re-clusters the table (KvCommands.convertToZOrder). */
  private[sql] val OptimizeStmt =
    """(?is)\s*OPTIMIZE\s+([\w.`]+)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""".r

  private[sql] val VacuumStmt =
    ("""(?is)\s*VACUUM\s+(?:TABLE\s+)?([\w.`]+)""" +
      """(?:\s+RETAIN\s+(\d+)\s+(MINUTES?|HOURS?|DAYS?))?\s*;?\s*""").r

  /** SEARCH t FOR 'terms…' [USING col] [TOP k] — BM25 full-text ranking
    * over any table/view with a doc_id column and a text column
    * (default `text`); whitespace-separated query terms, k defaults
    * to 10. Runs [[graft.pipeline.Retrieval.bm25TopK]]. */
  private[sql] val SearchStmt =
    ("""(?is)\s*SEARCH\s+([\w.`]+)\s+FOR\s+'([^']+)'""" +
      """(?:\s+USING\s+([\w`]+))?(?:\s+TOP\s+(\d+))?\s*;?\s*""").r

  /** SEARCH INDEX 'dir' FOR 'terms…' [TOP k] — the same BM25 ranking
    * served from a MATERIALIZED inverted index (the dir a
    * `Retrieval.buildIndex` produced; filesystem-path operand in the
    * LOAD DATA INPATH tradition). */
  private[sql] val SearchIndexStmt =
    ("""(?is)\s*SEARCH\s+INDEX\s+'([^']+)'\s+FOR\s+'([^']+)'""" +
      """(?:\s+TOP\s+(\d+))?\s*;?\s*""").r

  /** CREATE TABLE t(cols…, PRIMARY KEY(k…)) MAPPED BY ([ns.]htable,
    * COLS=[c=f.q,…]) [IN fmt] — the reference's own DDL text
    * (HBaseSQLParser.scala:77-157). The column-def group is split on
    * top-level commas afterwards (types like DECIMAL(12,2) contain
    * commas the regex must not see as separators). */
  private[sql] val CreateMappedStmt =
    ("""(?is)\s*CREATE\s+TABLE\s+([\w.`]+)\s*\((.*)[,\s]\s*PRIMARY\s+KEY\s*\(([^)]*)\)\s*\)""" +
      """\s*MAPPED\s+BY\s*\(\s*(?:(\w+)\s*\.\s*)?([\w]+)\s*,\s*COLS\s*=\s*\[(.*?)\]\s*\)""" +
      """(?:\s+IN\s+(\w+))?\s*;?\s*""").r

  /** ALTER TABLE t ADD col type MAPPED BY (col=family.qualifier) — the
    * reference's add-one-mapped-column form (HBaseSQLParser.scala:
    * 191-209). The type group tolerates a parenthesized precision
    * (DECIMAL(12,2), VARCHAR(10)). */
  private[sql] val AlterAddMappedStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+(\w+)\s+""" +
      """(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s+""" +
      """MAPPED\s+BY\s*\(\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*\)\s*;?\s*""").r

  /** ALTER TABLE t DROP col — the reference's COLUMN-less drop
    * (HBaseSQLParser.scala:185-189). Spark's own DROP COLUMN(S) /
    * PARTITION / constraint forms are excluded so they keep their
    * stock semantics. */
  private[sql] val AlterDropStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+""" +
      """(?!(?:COLUMNS?|PARTITION|IF|CONSTRAINT|PRIMARY|FOREIGN|CHECK)\b)""" +
      """(\w+)\s*;?\s*""").r

  /** Split on commas NOT nested inside parentheses/brackets — the
    * column-def and COLS list separator. */
  private[sql] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Index-preserving mask of a statement's protected spans: the
    * CONTENTS of string literals ('…' and "…", honoring doubled-quote
    * and backslash escapes), backtick identifiers, `--` line comments
    * and bracketed block comments are blanked to spaces (the delimiter
    * characters stay). Same length as the input, so regex match
    * positions computed on the mask address the original text — the
    * shared foundation for every keyword test and rewrite that must
    * ignore quoted/commented content. */
  private[sql] def maskProtected(sql: String): String = {
    val a = sql.toCharArray
    val n = a.length
    var i = 0
    while (i < n) {
      a(i) match {
        case q @ ('\'' | '"' | '`') =>
          i += 1
          var closed = false
          while (i < n && !closed) {
            if (a(i) == '\\' && q != '`' && i + 1 < n) {
              a(i) = ' '; a(i + 1) = ' '; i += 2
            } else if (a(i) == q) {
              if (i + 1 < n && a(i + 1) == q) { a(i) = ' '; a(i + 1) = ' '; i += 2 }
              else { closed = true; i += 1 }
            } else { a(i) = ' '; i += 1 }
          }
        case '-' if i + 1 < n && a(i + 1) == '-' =>
          while (i < n && a(i) != '\n') { a(i) = ' '; i += 1 }
        case '/' if i + 1 < n && a(i + 1) == '*' =>
          // Spark's lexer NESTS bracketed comments (SPARK-28880):
          // depth-track so the tail of a nested comment stays masked
          a(i) = ' '; a(i + 1) = ' '; i += 2
          var depth = 1
          while (i < n && depth > 0) {
            if (i + 1 < n && a(i) == '*' && a(i + 1) == '/') {
              a(i) = ' '; a(i + 1) = ' '; i += 2; depth -= 1
            } else if (i + 1 < n && a(i) == '/' && a(i + 1) == '*') {
              a(i) = ' '; a(i + 1) = ' '; i += 2; depth += 1
            } else { a(i) = ' '; i += 1 }
          }
        case _ => i += 1
      }
    }
    new String(a)
  }

  /** `APPROXIMATE [(rsd)] COUNT(DISTINCT expr)` →
    * `approx_count_distinct(expr[, rsd])` — the reference's 1.4-era
    * approximate-aggregate syntax (HBaseSQLQuerySuite.scala:299-309)
    * rewritten onto the modern HLL++ aggregate before delegation, so it
    * works anywhere in a query. The expr group tolerates one level of
    * nested parens (e.g. a CAST). */
  private val ApproximateRe =
    ("""(?is)\bAPPROXIMATE\s*(?:\(\s*([0-9.eE+-]+)\s*\)\s*)?""" +
      """COUNT\s*\(\s*DISTINCT\s+((?:[^()]|\([^()]*\))*)\)""").r

  private[sql] def rewriteApproximate(sql: String): String = {
    if (!sql.toUpperCase.contains("APPROXIMATE")) return sql
    // match on the MASKED text (literals in any quote style, backtick
    // identifiers, and comments blanked — so quoted mentions never
    // rewrite and parens inside literals never confuse the expr group),
    // then splice replacements into the ORIGINAL by match position (the
    // expr may legitimately contain a string literal the mask blanked)
    val masked = maskProtected(sql)
    val ms = ApproximateRe.findAllMatchIn(masked).toSeq
    if (ms.isEmpty) return sql
    val sb = new StringBuilder
    var last = 0
    ms.foreach { m =>
      sb ++= sql.substring(last, m.start)
      val expr = sql.substring(m.start(2), m.end(2))
      sb ++= (Option(m.group(1)) match {
        case Some(rsd) => s"approx_count_distinct($expr, $rsd)"
        case None => s"approx_count_distinct($expr)"
      })
      last = m.end
    }
    sb ++= sql.substring(last)
    sb.toString
  }

  /** SQL keyword inventory for shell completion — the reference derives
    * its completer vocabulary by reflecting over parser fields
    * (HBaseSQLParser.scala:28-37 getKeywords); the modern analog
    * reflects over Spark's generated ANTLR lexer rule names (SELECT,
    * FROM, …) and adds this parser's own statement keywords. Computed
    * once; reflection failures degrade to the graft keywords alone. */
  lazy val keywords: Seq[String] = {
    val graftKw = Seq("LOAD", "PARALL", "DATA", "LOCAL", "INPATH",
      "OVERWRITE", "INTO", "TABLE", "FIELDS", "TERMINATED", "BY",
      "SHOW", "SNAPSHOTS", "FOR", "IN", "COMPACT", "MAJOR",
      "VACUUM", "RETAIN", "MINUTES", "HOURS", "DAYS",
      "CLONE", "VERSION", "AS", "OF", "RESTORE", "TO",
      "REFRESH", "INDEX", "INDEXES", "MATERIALIZED", "VIEW", "VIEWS", "MINMAX",
      "GROUP", "SUM", "ANALYZE", "COMPUTE", "STATISTICS", "COLUMNS",
      "DESCRIBE", "DETAIL", "OPTIMIZE", "ZORDER",
      "SEARCH", "USING", "TOP",
      "MAPPED", "COLS", "PRIMARY", "KEY", "APPROXIMATE", "DISTINCT")
    val sparkKw =
      try {
        Class.forName("org.apache.spark.sql.catalyst.parser.SqlBaseLexer")
          .getField("ruleNames").get(null).asInstanceOf[Array[String]]
          .filter(n => n.nonEmpty && n.forall(c => c.isUpper || c == '_') &&
            n.head.isUpper)
          .toSeq
      } catch { case _: Exception => Seq.empty }
    (graftKw ++ sparkKw).distinct.sorted
  }

  /** Does `nameParts` resolve into a [[graft.connector.GraftKvCatalog]]
    * in the active session? Inconclusive (no active session, resolution
    * error) counts as NO — the statement then keeps Spark's built-in
    * LOAD DATA semantics. */
  private[sql] def targetsGraftCatalog(nameParts: Seq[String]): Boolean =
    SparkSession.getActiveSession.exists { spark =>
      try org.apache.spark.sql.graftbridge.catalogOf(spark, nameParts)
        .isInstanceOf[graft.connector.GraftKvCatalog]
      catch { case _: Exception => false }
    }
}

/** Executable LOAD: CSV (delimiter-configurable) with the target table's
  * schema, written through the catalog. */
case class GraftLoadDataCommand(csvPath: String, table: Seq[String],
    delimiter: Option[String], overwrite: Boolean)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val tname = table.map(p => s"`$p`").mkString(".")
    val schema = spark.table(tname).schema
    val df = spark.read
      .option("delimiter", delimiter.getOrElse(","))
      .schema(schema)
      .csv(csvPath)
    if (overwrite) df.writeTo(tname).overwrite(org.apache.spark.sql.functions.lit(true))
    else df.writeTo(tname).append()
    Nil
  }
}

/** COMPACT TABLE t [MAJOR] — the maintenance statement: minor rewrites
  * only the overlapping segment groups (read-amplification repair after
  * upserts/deletes/streaming ingest); MAJOR rewrites everything into
  * disjoint sorted runs. Returns the number of segments rewritten. */
case class GraftCompactCommand(table: Seq[String], major: Boolean)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.IntegerType

  override val output: Seq[Attribute] = Seq(
    AttributeReference("segments_rewritten", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "COMPACT TABLE")
    val n =
      if (major) {
        val before = graft.store.SegmentFile.listSegments(dir).length
        graft.connector.KvCommands.compact(spark, dir)
        before
      } else graft.connector.KvCommands.compactMinor(spark, dir)
    Seq(Row(n))
  }
}

/** ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c,..] — metadata-only
  * statistics report: live rows/bytes/segments on the table row, and per
  * column the NDV estimate (merged V9 sketches — building/refreshing
  * the `_graft_ndv.vN` pack as a side effect, so the first CBO-enabled
  * query pays nothing) plus zone-map bounds. A NULL statistic means the
  * metadata cannot claim it (overlapping generations, tombstones, a
  * pre-sketch segment) — never a wrong number. */
case class GraftAnalyzeCommand(table: Seq[String], cols: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{LongType, StringType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("rows", LongType)(),
    AttributeReference("size_bytes", LongType)(),
    AttributeReference("distinct_count", LongType)(),
    AttributeReference("min", StringType)(),
    AttributeReference("max", StringType)(),
    AttributeReference("null_count", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.SegmentFile
    val dir = GraftCatalogPaths.tableDir(spark, table, "ANALYZE TABLE")
    val m = graft.connector.GraftKvMeta.read(dir).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $dir"))
    cols.foreach(c => require(m.schema.fieldNames.contains(c),
      s"no column '$c'"))
    val segs = SegmentFile.listSegments(dir)
    // Everything metadata-derived degrades to NULL — torn sidecars from a
    // crashed writer included, never a wrong number or a failed
    // statement. The shared metadata-aggregate gate guards ALL of it:
    // NDV (a sketch union over overlapping generations counts superseded
    // values), null counts, and the table row count itself — on an
    // uncompacted upserted or tombstoned table, count − 2·tombstones is
    // a heuristic (a tombstone without a live predecessor, or an upsert
    // chain, breaks the arithmetic), so the rows cell honors the same
    // "NULL, never a wrong number" contract as every column statistic.
    val cmp = graft.store.RowCodec(m.schema, m.keys, m.encoding).compareKeys _
    val gateOk = SegmentFile.disjointTombstoneFree(segs, cmp)
    val rows: Any =
      if (gateOk) Long.box(segs.map(_.count).sum) else null
    val bytes = segs.map(_.sizeBytes).sum
    val sketches =
      try { if (gateOk) SegmentFile.ndvSketches(dir)
        else Map.empty[String, Seq[SegmentFile.NdvSketch]] }
      catch { case scala.util.control.NonFatal(_) =>
        Map.empty[String, Seq[SegmentFile.NdvSketch]] }
    val targets =
      if (cols.nonEmpty) cols
      else m.schema.fieldNames.toSeq.filter(c =>
        graft.connector.GraftKvDataWriter.ndvSketchable(m.schema(c).dataType))
    val colRows = targets.map { c =>
      val ndv: Any =
        if (!gateOk) null
        else SegmentFile.mergedNdvEstimate(segs, sketches, c)
          .map(Long.box).orNull
      val zones = segs.map(_.zoneStats.find(z =>
        z.name == c && z.dataType == m.schema(c).dataType))
      // truncated string zones (exact=false) carry prefix CLAIMS, not
      // stored values — min/max report values, so they degrade to NULL
      // (same exactness gate as the metadata agg pushdown)
      val (mn, mx): (Any, Any) =
        if (segs.isEmpty || zones.exists(_.isEmpty) ||
          zones.exists(z => !z.get.exact)) (null, null)
        else {
          val zcmp = graft.pruning.TriEval.comparator(m.schema(c).dataType)
          val lt = Ordering.fromLessThan[Any]((a, b) => zcmp(a, b) < 0)
          (zones.map(_.get.min).min(lt), zones.map(_.get.max).max(lt))
        }
      val nulls: Any =
        if (!gateOk) null
        else if (m.keys.contains(c)) Long.box(0L) // keys are never null
        else SegmentFile.mergedNullCount(segs, c).map(Long.box).orNull
      Row(c, null, null, ndv,
        Option(mn).map(_.toString).orNull, Option(mx).map(_.toString).orNull,
        nulls)
    }
    Row("(table)", rows, bytes, null, null, null, null) +: colRows
  }
}

/** DESCRIBE DETAIL t — one-row table-health summary: layout (keys,
  * codec, z-dims), physical totals (segments/rows/bytes/tombstones),
  * maintenance signals (overlap depth = point-lookup read
  * amplification; tombstones and overlap both gate the metadata-only
  * aggregate paths), history (current version, retained snapshots),
  * and derived artifacts (secondary indexes, materialized views).
  * `live_rows` honors the shared "NULL, never a wrong number" gate —
  * on an uncompacted upserted/tombstoned table the physical counts
  * are not the live count. */
case class GraftDescribeDetailCommand(table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("encoding", StringType, nullable = false)(),
    AttributeReference("key_columns", StringType, nullable = false)(),
    AttributeReference("zorder_dims", StringType)(),
    AttributeReference("num_segments", LongType, nullable = false)(),
    AttributeReference("live_rows", LongType)(),
    AttributeReference("tombstones", LongType, nullable = false)(),
    AttributeReference("overlap_depth", IntegerType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("current_version", LongType)(),
    AttributeReference("num_snapshots", LongType, nullable = false)(),
    AttributeReference("num_indexes", LongType, nullable = false)(),
    AttributeReference("num_mat_views", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.SegmentFile
    val dir = GraftCatalogPaths.tableDir(spark, table, "DESCRIBE DETAIL")
    val m = graft.connector.GraftKvMeta.read(dir).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $dir"))
    val segs = SegmentFile.listSegments(dir)
    val cmp = graft.store.RowCodec(m.schema, m.keys, m.encoding).compareKeys _
    val gateOk = SegmentFile.disjointTombstoneFree(segs, cmp)
    Seq(Row(
      dir,
      m.encoding,
      m.keys.mkString(", "),
      if (m.zorder.isEmpty) null else m.zorder.map(_.name).mkString(", "),
      segs.length.toLong,
      if (gateOk) Long.box(segs.map(_.count).sum) else null,
      segs.map(_.tombstones).sum,
      graft.connector.KvCommands.overlapDepth(dir),
      segs.map(_.sizeBytes).sum,
      SegmentFile.currentVersion(dir).map(Long.box).orNull,
      SegmentFile.manifestVersions(dir).length.toLong,
      graft.connector.KvIndex.list(dir).length.toLong,
      graft.connector.KvMatView.list(dir).length.toLong))
  }
}

/** OPTIMIZE t [ZORDER BY (a, b, …)] — maintenance statement: the plain
  * form is MAJOR compaction (rewrite to one disjoint tombstone-free
  * run, restoring every metadata-claim path); the ZORDER form
  * re-clusters the table by the named dimensions (physical key becomes
  * the Morton interleave — see KvCommands.convertToZOrder; committed
  * through the manifest-CAS protocol, crash-safe at every step). */
case class GraftOptimizeCommand(table: Seq[String], dims: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{LongType, StringType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "OPTIMIZE")
    if (dims.isEmpty) {
      graft.connector.KvCommands.compact(spark, dir)
      val rows = graft.store.SegmentFile.listSegments(dir).map(_.count).sum
      Seq(Row("compacted", rows))
    } else {
      val rows = graft.connector.KvCommands.convertToZOrder(spark, dir, dims)
      Seq(Row(s"zordered(${dims.mkString(",")})", rows))
    }
  }
}

/** CLONE TABLE s INTO d [VERSION AS OF n] — freeze a table (or one of
  * its retained snapshots) as a new independent table without copying
  * data: segments are immutable, so the clone hard-links them and
  * starts its own manifest/commit history. */
case class GraftCloneCommand(src: Seq[String], dst: Seq[String],
    version: Option[Long]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val srcDir = GraftCatalogPaths.tableDir(spark, src, "CLONE TABLE")
    val dstDir = GraftCatalogPaths.tableDir(spark, dst, "CLONE TABLE")
    graft.connector.KvCommands.cloneTable(srcDir, dstDir, version)
    Nil
  }
}

/** RESTORE TABLE t [TO] VERSION AS OF n — time travel that WRITES: the
  * snapshot's segment set is republished as a new commit, so rollback
  * itself stays in the history (undoable until the sweep). */
case class GraftRestoreCommand(table: Seq[String], version: Long)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "RESTORE TABLE")
    graft.connector.KvCommands.restoreTable(dir, version)
    Nil
  }
}

/** VACUUM [TABLE] t [RETAIN n MINUTES|HOURS|DAYS] — the retention
  * maintenance statement: deletes replaced/orphaned segment files and
  * expired snapshot manifests older than the window. A long window is
  * the snapshot-retention guarantee; RETAIN 0 MINUTES reclaims
  * everything not live (in-flight scans planned against older
  * snapshots lose their files — same contract as any table format's
  * aggressive vacuum). */
case class GraftVacuumCommand(table: Seq[String], retainMs: Long)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.IntegerType

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_reclaimed", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "VACUUM")
    Seq(Row(graft.connector.KvCommands.sweepUnmanifested(dir, retainMs)))
  }
}

/** REFRESH INDEX i ON t — incremental index maintenance (snapshot-diff
  * CDC applied as index-table tombstones + puts; KvIndex.refresh). */
case class GraftRefreshIndexCommand(index: String, table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.LongType

  override val output: Seq[Attribute] = Seq(
    AttributeReference("base_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "REFRESH INDEX")
    Seq(Row(graft.connector.KvIndex.refresh(spark, dir, index).baseVersion))
  }
}

/** SHOW INDEXES FOR t — inventory with per-index sync state. */
case class GraftShowIndexesCommand(table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{BooleanType, LongType, StringType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("index_name", StringType, nullable = false)(),
    AttributeReference("columns", StringType, nullable = false)(),
    AttributeReference("base_version", LongType, nullable = false)(),
    AttributeReference("in_sync", BooleanType, nullable = false)(),
    AttributeReference("entries", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "SHOW INDEXES")
    graft.connector.KvIndex.describe(spark, dir).collect().toSeq
  }
}

/** CREATE MATERIALIZED VIEW v ON t GROUP BY ... [SUM (...)] [MINMAX (...)]. */
case class GraftCreateMvCommand(view: String, table: Seq[String],
    groupCols: Seq[String], sumCols: Seq[String],
    minMaxCols: Seq[String] = Nil)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "CREATE MATERIALIZED VIEW")
    graft.connector.KvMatView.create(spark, dir, view, groupCols, sumCols,
      minMaxCols)
    Nil
  }
}

/** REFRESH MATERIALIZED VIEW v ON t — CDC-incremental maintenance. */
case class GraftRefreshMvCommand(view: String, table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.LongType

  override val output: Seq[Attribute] = Seq(
    AttributeReference("base_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "REFRESH MATERIALIZED VIEW")
    Seq(Row(graft.connector.KvMatView.refresh(spark, dir, view).baseVersion))
  }
}

/** SHOW MATERIALIZED VIEWS FOR t. */
case class GraftShowMvsCommand(table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{BooleanType, LongType, StringType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("view_name", StringType, nullable = false)(),
    AttributeReference("group_columns", StringType, nullable = false)(),
    AttributeReference("sum_columns", StringType, nullable = false)(),
    AttributeReference("base_version", LongType, nullable = false)(),
    AttributeReference("in_sync", BooleanType, nullable = false)(),
    AttributeReference("null_rows_by_group_col", StringType)(),
    AttributeReference("minmax_columns", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "SHOW MATERIALIZED VIEWS")
    graft.connector.KvMatView.describe(spark, dir).collect().toSeq
  }
}

/** DROP MATERIALIZED VIEW v ON t. */
case class GraftDropMvCommand(view: String, table: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalogPaths.tableDir(spark, table, "DROP MATERIALIZED VIEW")
    graft.connector.KvMatView.drop(dir, view)
    Nil
  }
}

/** Resolve a graft-catalog table's filesystem dir from its SQL name. */
private[sql] object GraftCatalogPaths {
  def tableDir(spark: SparkSession, table: Seq[String], stmt: String): String = {
    val (plugin, rest) = org.apache.spark.sql.graftbridge.catalogAndRest(spark, table)
    val cat = plugin match {
      case c: graft.connector.GraftKvCatalog => c
      case other => throw new IllegalArgumentException(
        s"$stmt targets graftkv catalog tables; " +
          s"'${table.mkString(".")}' resolves to catalog '${other.name()}'")
    }
    cat.tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
      rest.dropRight(1).toArray, rest.last))
  }
}

/** SHOW SNAPSHOTS FOR t — one row per retained commit of the table's
  * time-travel log (version to feed `VERSION AS OF`, commit wall-clock,
  * live segment count, whether it is the current state). */
case class GraftShowSnapshotsCommand(table: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, TimestampType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("segments", IntegerType, nullable = false)(),
    AttributeReference("is_current", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.SegmentFile
    val dir = GraftCatalogPaths.tableDir(spark, table, "SHOW SNAPSHOTS")
    val vs = SegmentFile.manifestVersions(dir)
    vs.map { v =>
      Row(v,
        new java.sql.Timestamp(SegmentFile.manifestVersionMtime(dir, v)),
        SegmentFile.readManifestVersion(dir, v).map(_.size).getOrElse(0),
        v == vs.last)
    }
  }
}

/** CREATE TABLE … MAPPED BY — executable form of the reference DDL:
  * creates the table through a registered [[graft.connector.GraftKvCatalog]]
  * (an explicit `catalog.ns.t` name wins; a bare reference-style name
  * lands in the session's graft catalog — the current catalog if it is
  * one, else the single registered one). Key order and encoding become
  * the physical layout; the hbase-side names persist as table
  * properties. */
case class GraftCreateMappedTableCommand(table: Seq[String],
    tableSchema: StructType, keys: Seq[String], mappedTable: String,
    colMap: Seq[(String, String)], encoding: String)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.Identifier
    val (cat, rest) =
      GraftMappedDdl.resolveGraftCatalog(spark, table, "CREATE TABLE…MAPPED BY")
    val ns =
      if (rest.length > 1) rest.dropRight(1).toArray else cat.defaultNamespace()
    val props = new java.util.HashMap[String, String]()
    props.put("key", keys.mkString(","))
    props.put("encoding", encoding)
    props.put(graft.connector.GraftKvMeta.MappedTableProp, mappedTable)
    // ':' for '=': meta property values may not contain '='
    props.put(graft.connector.GraftKvMeta.MappedColsProp,
      colMap.map { case (c, fq) => s"$c:$fq" }.mkString(","))
    cat.createTable(Identifier.of(ns, rest.last), tableSchema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform], props)
    Nil
  }
}

/** Shared resolution for the reference's MAPPED BY DDL family: an
  * explicit `catalog.ns.t` name wins; a bare reference-style name lands
  * in the session's graft catalog — the current catalog if it is one,
  * else the single registered one (ambiguity or absence fail loudly
  * with the registration hint). */
private[sql] object GraftMappedDdl {
  def resolveGraftCatalog(spark: SparkSession, table: Seq[String],
      what: String): (graft.connector.GraftKvCatalog, Seq[String]) =
    org.apache.spark.sql.graftbridge.catalogAndRest(spark, table) match {
      case (c: graft.connector.GraftKvCatalog, r) => (c, r)
      case _ =>
        val names = spark.conf.getAll.collect {
          case (k, v) if k.startsWith("spark.sql.catalog.") &&
            !k.stripPrefix("spark.sql.catalog.").contains('.') &&
            v == classOf[graft.connector.GraftKvCatalog].getName =>
            k.stripPrefix("spark.sql.catalog.")
        }.toSeq.sorted
        names match {
          case Seq(one) =>
            (org.apache.spark.sql.graftbridge.catalogByName(spark, one)
              .asInstanceOf[graft.connector.GraftKvCatalog], table)
          case Seq() => throw new IllegalArgumentException(
            s"$what needs a graftkv catalog: register one " +
              "(spark.sql.catalog.<name> = " +
              s"${classOf[graft.connector.GraftKvCatalog].getName}) or " +
              "qualify the table name with it")
          case many => throw new IllegalArgumentException(
            s"$what: multiple graftkv catalogs registered " +
              s"(${many.mkString(", ")}) — qualify the table name with one")
        }
    }

  def identOf(cat: graft.connector.GraftKvCatalog, rest: Seq[String])
      : org.apache.spark.sql.connector.catalog.Identifier = {
    val ns =
      if (rest.length > 1) rest.dropRight(1).toArray else cat.defaultNamespace()
    org.apache.spark.sql.connector.catalog.Identifier.of(ns, rest.last)
  }
}

/** ALTER TABLE t ADD col type MAPPED BY (col=family.qualifier) —
  * executable form of the reference's add-mapped-column DDL
  * (reference execution/hbaseCommands.scala:56-74 alterTableAddNonKey):
  * a metadata-only non-key column add through the graft catalog, with
  * the hbase-side mapping appended to the persisted mapped.cols
  * property so DESCRIBE keeps the full mapping story. */
case class GraftAlterAddMappedColCommand(table: Seq[String], col: String,
    colType: org.apache.spark.sql.types.DataType, familyQualifier: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.TableChange
    val (cat, rest) =
      GraftMappedDdl.resolveGraftCatalog(spark, table, "ALTER TABLE…MAPPED BY")
    val ident = GraftMappedDdl.identOf(cat, rest)
    val prev = Option(cat.loadTable(ident).properties()
      .get(graft.connector.GraftKvMeta.MappedColsProp)).filter(_.nonEmpty)
    val entry = s"$col:$familyQualifier" // ':' for '=' (meta value rule)
    cat.alterTable(ident,
      TableChange.addColumn(Array(col), colType, true),
      TableChange.setProperty(graft.connector.GraftKvMeta.MappedColsProp,
        prev.map(p => s"$p,$entry").getOrElse(entry)))
    Nil
  }
}

/** ALTER TABLE t DROP col — executable form of the reference's
  * COLUMN-less drop (execution/hbaseCommands.scala:46-54
  * alterTableDropNonKey): key columns are refused by the catalog; the
  * column's mapped.cols entry is retired with it. */
case class GraftAlterDropColCommand(table: Seq[String], col: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.TableChange
    val (cat, rest) =
      GraftMappedDdl.resolveGraftCatalog(spark, table, "ALTER TABLE…DROP")
    val ident = GraftMappedDdl.identOf(cat, rest)
    val prop = graft.connector.GraftKvMeta.MappedColsProp
    val prev = Option(cat.loadTable(ident).properties().get(prop))
      .filter(_.nonEmpty)
    val remaining = prev.map(_.split(',').toSeq
      .filterNot(_.startsWith(s"$col:")).mkString(","))
    val mapChange: Seq[TableChange] = remaining match {
      case Some("") => Seq(TableChange.removeProperty(prop))
      case Some(m) if prev.contains(m) => Nil // column was never mapped
      case Some(m) => Seq(TableChange.setProperty(prop, m))
      case None => Nil
    }
    cat.alterTable(ident,
      (TableChange.deleteColumn(Array(col), false) +: mapChange): _*)
    Nil
  }
}

/** SEARCH INDEX 'dir' FOR 'terms…' [TOP k] — BM25 served from the
  * materialized inverted index: |query| key-range probes through the
  * kv engine, the corpus text never read; bit-identical to the
  * scan-path SEARCH over the indexed corpus. */
case class GraftSearchIndexCommand(dir: String, terms: Seq[String], k: Int)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("doc_id", LongType, nullable = true)(),
    AttributeReference("score", DoubleType, nullable = false)(),
    AttributeReference("n_terms", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    require(graft.connector.GraftKvMeta.read(s"$dir/postings").isDefined,
      s"SEARCH INDEX: no inverted index at $dir (expected the " +
        "postings/doclen/stats layout Retrieval.buildIndex produces)")
    import org.apache.spark.sql.functions.col
    graft.pipeline.Retrieval.bm25SearchIndex(spark, dir, terms, k)
      .select(col("doc_id").cast("long"), col("score"), col("n_terms"))
      .collect().toSeq
  }
}

/** SEARCH t FOR 'terms…' [USING col] [TOP k] — BM25 full-text ranking
  * as a first-class SQL statement. The heavy lifting is the
  * distributed [[graft.pipeline.Retrieval.bm25TopK]] plan; only the k
  * result rows ever reach the driver. */
case class GraftSearchCommand(table: Seq[String], terms: Seq[String],
    textCol: String, k: Int) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

  // nullable doc_id: the id column is cast from an arbitrary table
  // column, and a non-numeric id casting to null must surface as a
  // null row, not corrupt a non-nullable attribute
  override val output: Seq[Attribute] = Seq(
    AttributeReference("doc_id", LongType, nullable = true)(),
    AttributeReference("score", DoubleType, nullable = false)(),
    AttributeReference("n_terms", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val df = spark.table(table.mkString("."))
    require(df.columns.contains(textCol),
      s"SEARCH: column `$textCol` not found (USING <col> to pick one)")
    require(df.columns.contains("doc_id"),
      "SEARCH: column `doc_id` not found — SEARCH ranks per document " +
        "and needs a doc_id column on the table")
    val docs = df.select(col("doc_id").cast("long").as("doc_id"),
      col(textCol).cast("string").as("text"))
    graft.pipeline.Retrieval.bm25TopK(docs, terms, k).collect().toSeq
  }
}
