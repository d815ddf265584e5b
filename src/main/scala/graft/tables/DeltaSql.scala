package graft.tables

import graft.core.{Filter, FilterOp, Filters}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  In, LessThan, LessThanOrEqual, Literal, Not, Or}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the Delta write path: the DML/utility statements a
  * delta-spark user types, routed to this engine's operations on
  * `delta.`/path`` table references. SELECT statements belong to the
  * catalog's SQL interface (Catalog.sql, R18); this covers the
  * mutating side:
  *
  * {{{
  * DELETE FROM delta.`/p` WHERE a = 1 AND b > 2
  * UPDATE delta.`/p` SET a = a + 1, b = 'x' WHERE c in (1, 2)
  * MERGE INTO delta.`/p` USING src_view ON key1, key2
  *   [WHEN MATCHED AND <sql> THEN DELETE]
  * OPTIMIZE delta.`/p` [WHERE <partition-pred>] [ZORDER BY (c1, c2)]
  * VACUUM delta.`/p` [RETAIN 24 HOURS] [DRY RUN]
  * ALTER TABLE delta.`/p` ADD CONSTRAINT nm CHECK (sql)
  * ALTER TABLE delta.`/p` DROP CONSTRAINT nm
  * ALTER TABLE delta.`/p` ADD COLUMNS (c1 BIGINT, c2 STRING)
  * ALTER TABLE delta.`/p` RENAME COLUMN a TO b      (column mapping required)
  * ALTER TABLE delta.`/p` DROP COLUMN a              (column mapping required)
  * ALTER TABLE delta.`/p` SET TBLPROPERTIES ('k' = 'v', ...)
  * ALTER TABLE delta.`/p` UNSET TBLPROPERTIES ('k', ...)
  *   -- setting delta.columnMapping.mode on an unmapped table IS the
  *   -- mapping upgrade (ids + physical names assigned, protocol bumped)
  * ALTER TABLE delta.`/p` CLUSTER BY (c1, c2)
  * RESTORE delta.`/p` TO VERSION AS OF 3
  * RESTORE delta.`/p` TO TIMESTAMP AS OF '2026-01-01T00:00:00Z'
  * DESCRIBE DETAIL delta.`/p`
  * DESCRIBE HISTORY delta.`/p`
  * SHOW TBLPROPERTIES delta.`/p`
  * }}}
  *
  * WHERE predicates parse through Spark's own SQL parser and convert
  * to the engine's Filter algebra (DNF of comparisons/IN), so the
  * same predicate drives file pruning AND row filtering — shapes
  * outside the algebra refuse loudly rather than silently scanning
  * everything. MERGE keys are column names (equality merge, LWW
  * upsert semantics — the engine's merge operator).
  */
object DeltaSql {

  private val TableRef = """delta\.`([^`]+)`"""

  /** Execute one statement; returns a one-row frame with the
    * resulting table version (and counts where the operation reports
    * them).
    */
  def exec(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val s = sql.trim.stripSuffix(";").trim
    def result(version: Long, removed: Long = 0L): DataFrame =
      Seq((version, removed)).toDF("version", "files_removed")

    val delete = s"""(?is)^DELETE\\s+FROM\\s+$TableRef\\s+WHERE\\s+(.+)$$""".r
    val deleteAll = s"""(?is)^DELETE\\s+FROM\\s+$TableRef$$""".r
    val update = s"""(?is)^UPDATE\\s+$TableRef\\s+SET\\s+(.+?)\\s+WHERE\\s+(.+)$$""".r
    val merge = (s"""(?is)^MERGE\\s+INTO\\s+$TableRef\\s+USING\\s+(\\w+)\\s+ON\\s+([\\w\\s,]+?)""" +
      s"""(?:\\s+WHEN\\s+MATCHED\\s+AND\\s+(.+?)\\s+THEN\\s+DELETE)?$$""").r
    val optimize = (s"""(?is)^OPTIMIZE\\s+$TableRef(?:\\s+WHERE\\s+(.+?))?""" +
      s"""(?:\\s+ZORDER\\s+BY\\s+\\(([^)]+)\\))?$$""").r
    val vacuum =
      s"""(?is)^VACUUM\\s+$TableRef(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?(\\s+DRY\\s+RUN)?$$""".r
    val addCk = (s"""(?is)^ALTER\\s+TABLE\\s+$TableRef\\s+ADD\\s+CONSTRAINT\\s+(\\w+)""" +
      s"""\\s+CHECK\\s*\\((.+)\\)$$""").r
    val dropCk = s"""(?is)^ALTER\\s+TABLE\\s+$TableRef\\s+DROP\\s+CONSTRAINT\\s+(\\w+)$$""".r
    // greedy capture to the LAST ')': parameterized types —
    // DECIMAL(10,2), VARCHAR(n) — carry parentheses of their own
    val addCols = (s"""(?is)^ALTER\\s+TABLE\\s+$TableRef\\s+ADD\\s+COLUMNS?""" +
      s"""\\s*\\((.+)\\)$$""").r
    val setProps = (s"""(?is)^ALTER\\s+TABLE\\s+$TableRef\\s+SET\\s+TBLPROPERTIES""" +
      s"""\\s*\\((.+)\\)$$""").r
    val unsetProps = (s"""(?is)^ALTER\\s+TABLE\\s+$TableRef\\s+UNSET\\s+TBLPROPERTIES""" +
      s"""\\s*\\((.+)\\)$$""").r
    val clusterBy = s"""(?is)^ALTER\\s+TABLE\\s+$TableRef\\s+CLUSTER\\s+BY\\s+\\(([^)]+)\\)$$""".r
    val renameCol = (s"""(?is)^ALTER\\s+TABLE\\s+$TableRef\\s+RENAME\\s+COLUMN\\s+""" +
      s"""(\\w+)\\s+TO\\s+(\\w+)$$""").r
    val dropCol =
      s"""(?is)^ALTER\\s+TABLE\\s+$TableRef\\s+DROP\\s+COLUMN\\s+(\\w+)$$""".r
    val restore = s"""(?is)^RESTORE\\s+$TableRef\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)$$""".r
    val restoreTs =
      s"""(?is)^RESTORE\\s+$TableRef\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'$$""".r
    val descDetail = s"""(?is)^DESCRIBE\\s+DETAIL\\s+$TableRef$$""".r
    val descHistory = s"""(?is)^DESCRIBE\\s+HISTORY\\s+$TableRef$$""".r
    val showProps = s"""(?is)^SHOW\\s+TBLPROPERTIES\\s+$TableRef$$""".r
    val convert =
      """(?is)^CONVERT\s+TO\s+DELTA\s+(parquet|iceberg|hudi)\.`([^`]+)`$""".r

    s match {
      case delete(path, where) =>
        val (f, residual) = parseWhereSplit(spark, where,
          DeltaLog.snapshot(spark, path, withFiles = false).schema)
        val r = DeltaWrite.deleteWhere(spark, path, f, predicateSql = residual)
        result(r.version, r.filesRemoved)
      case deleteAll(path) =>
        // DELETE without WHERE: every row (empty filter list = true)
        val r = DeltaWrite.deleteWhere(spark, path, Seq.empty)
        result(r.version, r.filesRemoved)
      case update(path, sets, where) =>
        val (f, residual) = parseWhereSplit(spark, where,
          DeltaLog.snapshot(spark, path, withFiles = false).schema)
        val r = DeltaWrite.updateWhere(spark, path, f, parseAssignments(sets),
          predicateSql = residual)
        result(r.version, r.filesRemoved)
      case merge(path, view, keys, delPred) =>
        val r = DeltaWrite.merge(spark, path, spark.table(view),
          keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          deleteWhenMatched = Option(delPred))
        result(r.version, r.filesRemoved)
      case optimize(path, wherePred, zcols) =>
        val scoped = Option(wherePred).map(parseWhere(spark, _)).getOrElse(Seq.empty)
        val r = Option(zcols) match {
          case Some(cs) =>
            require(scoped.isEmpty,
              "OPTIMIZE WHERE cannot be combined with ZORDER BY (z-order rewrites globally)")
            DeltaWrite.optimizeZorder(spark, path,
              cs.split(",").map(_.trim).toSeq)
          case None =>
            // delta-spark parity: plain OPTIMIZE on a clustered table
            // CLUSTERS (incrementally); on an unclustered one it
            // bin-packs
            val snap = DeltaLog.snapshot(spark, path, withFiles = false)
            if (DeltaDdl.clusteringColumns(snap).nonEmpty) {
              require(scoped.isEmpty,
                "OPTIMIZE WHERE is not supported on clustered tables")
              DeltaWrite.optimizeClustered(spark, path)
            } else DeltaWrite.optimize(spark, path, where = scoped)
        }
        result(r.version, r.filesRemoved)
      case vacuum(path, hours, dry) =>
        val retainMs = Option(hours).map(_.toLong * 3600 * 1000)
          .getOrElse(7L * 24 * 3600 * 1000)
        val n = DeltaWrite.vacuum(spark, path, retainMs, dryRun = dry != null)
        Seq(n.toLong).toDF(if (dry != null) "files_would_delete" else "files_deleted")
      case addCk(path, name, pred) =>
        result(DeltaDdl.addCheckConstraint(spark, path, name, pred).version)
      case dropCk(path, name) =>
        result(DeltaDdl.dropCheckConstraint(spark, path, name).version)
      case addCols(path, colDefs) =>
        // `name TYPE` pairs parsed through Spark's own DDL parser so
        // every SQL type spelling works
        val fields = org.apache.spark.sql.types.StructType
          .fromDDL(colDefs).fields.toSeq
        result(DeltaDdl.addColumns(spark, path, fields).version)
      case renameCol(path, from, to) =>
        result(DeltaDdl.renameColumn(spark, path, from, to).version)
      case dropCol(path, name) =>
        result(DeltaDdl.dropColumn(spark, path, name).version)
      case setProps(path, props) =>
        // delta-spark parity: setting delta.columnMapping.mode on an
        // UNMAPPED table is the upgrade DDL — field ids + physical
        // names are assigned and the protocol rises, not just a config
        // write (which would corrupt reads: mapped mode with no
        // physical names)
        val parsed = parseProps(props)
        val requestedMode = parsed.get("delta.columnMapping.mode")
          .filter(m => m.nonEmpty && m != "none")
        val wantsMapping = requestedMode.isDefined
        val unmapped = !DeltaLog.snapshot(spark, path, withFiles = false)
          .metadata.isColumnMapped
        // delta-spark parity: only the none->name upgrade exists;
        // none->id would need data-file rewrites (parquet field ids),
        // so silently substituting 'name' would leave the table in a
        // mode the user never asked for — refuse instead
        if (wantsMapping && unmapped)
          require(requestedMode.contains("name"),
            s"cannot upgrade $path to column mapping mode " +
              s"'${requestedMode.get}': only 'name' mode can be enabled on an " +
              "existing table (id mode requires parquet field ids in every " +
              "data file — recreate the table with id mapping instead)")
        if (wantsMapping && unmapped) {
          val up = DeltaDdl.enableColumnMapping(spark, path)
          val rest = parsed - "delta.columnMapping.mode"
          if (rest.isEmpty) result(up.version)
          else result(DeltaWrite.setTableProperties(spark, path, rest).version)
        } else result(DeltaWrite.setTableProperties(spark, path, parsed).version)
      case unsetProps(path, keys) =>
        // keys as 'k1', 'k2' (quoted, comma-separated); mapping keys
        // refuse inside setTableProperties — they are load-bearing
        val ks = keys.split(",").map(_.trim.stripPrefix("'").stripSuffix("'")).toSet
        result(DeltaWrite.setTableProperties(
          spark, path, Map.empty, remove = ks).version)
      case clusterBy(path, cols) =>
        result(DeltaDdl.clusterBy(spark, path,
          cols.split(",").map(_.trim).toSeq).version)
      case restore(path, v) =>
        result(DeltaWrite.restore(spark, path, v.toLong).version)
      case restoreTs(path, ts) =>
        val millis = java.time.Instant.parse(ts).toEpochMilli
        result(DeltaWrite.restore(spark, path,
          DeltaLog.versionAtTimestamp(spark, path, millis)).version)
      case descDetail(path) =>
        val snap = DeltaLog.snapshot(spark, path)
        Seq((
          "delta", snap.metadata.id, path, snap.version,
          snap.files.size.toLong, snap.files.map(_.size).sum,
          snap.metadata.partitionColumns.mkString(","),
          DeltaDdl.clusteringColumns(snap).mkString(","),
          snap.protocol.minReaderVersion.toLong, snap.protocol.minWriterVersion.toLong))
          .toDF("format", "id", "location", "version", "num_files", "size_bytes",
            "partition_columns", "clustering_columns",
            "min_reader_version", "min_writer_version")
      case descHistory(path) =>
        // over the available JSON tail (aged-out prefixes have no
        // per-commit actions to describe)
        val (jsons, _) = DeltaLog.listLog(spark, path)
        require(jsons.nonEmpty, s"$path has no Delta log")
        DeltaLog.changeActions(spark, path, jsons.keySet.min, jsons.keySet.max)
          .map(vc => (vc.version, new java.sql.Timestamp(vc.timestamp),
            vc.adds.size.toLong, vc.removes.size.toLong))
          .toDF("version", "timestamp", "n_added_files", "n_removed_files")
          .orderBy(col("version").desc)
      case showProps(path) =>
        DeltaLog.snapshot(spark, path, withFiles = false)
          .metadata.configuration.toSeq.sortBy(_._1).toDF("key", "value")
      case convert(fmt, path) =>
        // the delta-spark CONVERT TO DELTA statement, covering the
        // whole triad: metadata-only in-place conversion (R54)
        val v = fmt.toLowerCase(java.util.Locale.ROOT) match {
          case "parquet" => DeltaConvert.fromParquet(spark, path)
          case "iceberg" => DeltaConvert.fromIceberg(spark, path)
          case "hudi"    => DeltaConvert.fromHudi(spark, path)
          case other => throw new IllegalStateException(s"unreachable format $other")
        }
        result(v)
      case _ =>
        throw new IllegalArgumentException(
          s"unsupported statement (see DeltaSql docs for the grammar): $s")
    }
  }

  /** `a = 1, b = 'x'` → Seq(("a", "1"), ("b", "'x'")). Splits on
    * top-level commas only (commas inside parens/quotes survive).
    */
  private[tables] def parseAssignments(sets: String): Seq[(String, String)] =
    splitTop(sets).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"malformed SET assignment: $a")
      (a.substring(0, i).trim, a.substring(i + 1).trim)
    }

  /** `'k' = 'v', k2 = v2` → Map. Quotes optional. */
  private[tables] def parseProps(props: String): Map[String, String] =
    splitTop(props).map { p =>
      val i = p.indexOf('=')
      require(i > 0, s"malformed TBLPROPERTIES entry: $p")
      def unq(x: String) = {
        val t = x.trim
        // SQL string literals escape a quote by doubling it
        if (t.startsWith("'") && t.endsWith("'") && t.length >= 2)
          t.substring(1, t.length - 1).replace("''", "'")
        else t
      }
      (unq(p.substring(0, i)), unq(p.substring(i + 1)))
    }.toMap

  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQ = false; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        // inside a quoted run, '' is an escaped quote, not a close+open
        case '\'' if inQ && i + 1 < s.length && s.charAt(i + 1) == '\'' =>
          i += 1
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case ',' if !inQ && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse a WHERE clause via Spark's SQL parser and convert to the
    * engine's DNF Filter algebra. Supported shapes: comparisons
    * between a column and a literal, IN / NOT IN literal lists, AND,
    * OR (distributed to DNF). Anything else refuses loudly — the
    * algebra is what drives file pruning, and silently widening a
    * predicate to "scan everything" would be a scale trap.
    */
  private[graft] def parseWhere(spark: SparkSession, where: String): Filters.Normalized = {
    val e = spark.sessionState.sqlParser.parseExpression(where)
    toDnf(e)
  }

  /** An already-parsed (resolved or not) predicate → the pruning
    * filter algebra — the DSv2 UPDATE path ([[graft.spark]]) hands
    * Catalyst conditions straight in; shapes outside the algebra
    * refuse loudly exactly like a SQL-string WHERE would.
    */
  private[graft] def exprToFilters(e: Expression): Filters.Normalized = toDnf(e)

  /** Parse a WHERE clause and SPLIT it for residual DML (r15): a
    * fully algebra-expressible predicate returns `(filters, None)` —
    * the proven exact route; anything else returns the fail-open
    * pruning over-approximation plus the ORIGINAL SQL for the writer
    * to evaluate row-by-row. The residual is validated by ANALYZING
    * it against the table schema, so unresolvable columns refuse at
    * statement time, and subqueries / non-deterministic functions
    * refuse loudly (the writers evaluate the predicate in more than
    * one scan — content, CDC, DV bitmap — so a non-deterministic one
    * would pick different rows per scan).
    */
  private[graft] def parseWhereSplit(
      spark: SparkSession,
      where: String,
      schema: => org.apache.spark.sql.types.StructType
  ): (Filters.Normalized, Option[String]) = {
    val e = spark.sessionState.sqlParser.parseExpression(where)
    try (toDnf(e), None)
    catch {
      case _: IllegalArgumentException =>
        // the schema (a log replay / metadata load) is fetched ONLY on
        // this residual branch — the algebraic fast path never needs it
        val probe = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
          .where(org.apache.spark.sql.graftbridge.Bridge.column(e))
        val cond = probe.queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }.getOrElse(throw new IllegalStateException(
          s"analysis probe lost the WHERE predicate: $where"))
        requireResidualSafe(cond, "the")
        // derive the pruning approximation from the ANALYZED condition
        // with type coercion's Cast(Literal) wrappers folded — an
        // un-coerced Int literal against Long column stats would
        // fail-open and prune nothing
        (exprToPruningFilters(foldCastLiterals(cond)), Some(where))
    }
  }

  /** Residual (outside-the-algebra) predicates evaluate as SQL
    * expressions inside the writers' scans — shapes that can't do
    * that soundly refuse loudly: a subquery doesn't render to a
    * writer-evaluable expression, and a non-deterministic predicate
    * would pick DIFFERENT rows in the writers' multiple passes
    * (content, CDC, DV bitmap).
    */
  private[graft] def requireResidualSafe(c: Expression, op: String): Unit = {
    require(!c.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
      s"$op WHERE with a subquery is not supported — materialize the " +
        "subquery and use MERGE")
    require(c.deterministic,
      s"$op WHERE must be deterministic — the predicate evaluates in " +
        "more than one writer scan")
  }

  /** Commands see the ANALYZED plan (no optimizer pass), so type
    * coercion's Cast(Literal) wrappers are still present — fold them
    * so the algebra translators see plain, correctly-typed literals.
    */
  private[graft] def foldCastLiterals(e: Expression): Expression = e.transformUp {
    case c: org.apache.spark.sql.catalyst.expressions.Cast
        if c.child.isInstanceOf[Literal] =>
      Literal.create(c.eval(null), c.dataType)
  }

  /** Best-effort OVER-approximation of an arbitrary predicate in the
    * pruning algebra — the residual-DML seam (r15): conjuncts outside
    * the algebra DROP (widening the candidate set — sound for FILE
    * PRUNING, never for row selection), and an OR branch outside the
    * algebra widens the whole disjunction to match-all (the empty
    * Normalized). Callers MUST still evaluate the full predicate
    * row-by-row on the scanned candidates.
    */
  private[graft] def exprToPruningFilters(e: Expression): Filters.Normalized = {
    def dnf(e: Expression): Filters.Normalized = e match {
      case Or(l, r) =>
        val (dl, dr) = (dnf(l), dnf(r))
        if (dl.isEmpty || dr.isEmpty) Seq.empty else dl ++ dr
      case And(l, r) =>
        (dnf(l), dnf(r)) match {
          case (Seq(), d) => d
          case (d, Seq()) => d
          case (dl, dr)   => for (lc <- dl; rc <- dr) yield lc ++ rc
        }
      case other =>
        try Seq(Seq(toFilter(other)))
        catch { case _: IllegalArgumentException => Seq.empty }
    }
    dnf(e)
  }

  private def toDnf(e: Expression): Filters.Normalized = e match {
    case Or(l, r) => toDnf(l) ++ toDnf(r)
    case And(l, r) =>
      // distribute AND over the two sides' DNF (cross product)
      for (lc <- toDnf(l); rc <- toDnf(r)) yield lc ++ rc
    case other => Seq(Seq(toFilter(other)))
  }

  private def toFilter(e: Expression): Filter = e match {
    case EqualTo(a, Literal(v, dt)) => Filter(attrName(a), FilterOp.Eq, lit(v, dt))
    case EqualTo(Literal(v, dt), a) => Filter(attrName(a), FilterOp.Eq, lit(v, dt))
    case Not(EqualTo(a, Literal(v, dt))) => Filter(attrName(a), FilterOp.Neq, lit(v, dt))
    case LessThan(a, Literal(v, dt)) => Filter(attrName(a), FilterOp.Lt, lit(v, dt))
    case LessThan(Literal(v, dt), a) => Filter(attrName(a), FilterOp.Gt, lit(v, dt))
    case LessThanOrEqual(a, Literal(v, dt)) => Filter(attrName(a), FilterOp.Le, lit(v, dt))
    case LessThanOrEqual(Literal(v, dt), a) => Filter(attrName(a), FilterOp.Ge, lit(v, dt))
    case GreaterThan(a, Literal(v, dt)) => Filter(attrName(a), FilterOp.Gt, lit(v, dt))
    case GreaterThan(Literal(v, dt), a) => Filter(attrName(a), FilterOp.Lt, lit(v, dt))
    case GreaterThanOrEqual(a, Literal(v, dt)) => Filter(attrName(a), FilterOp.Ge, lit(v, dt))
    case GreaterThanOrEqual(Literal(v, dt), a) => Filter(attrName(a), FilterOp.Le, lit(v, dt))
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      Filter(attrName(a), FilterOp.In,
        vs.map { case Literal(v, dt) => lit(v, dt) })
    case Not(In(a, vs)) if vs.forall(_.isInstanceOf[Literal]) =>
      Filter(attrName(a), FilterOp.NotIn,
        vs.map { case Literal(v, dt) => lit(v, dt) })
    case other =>
      throw new IllegalArgumentException(
        s"predicate shape not in the filter algebra (use the Scala API for " +
          s"arbitrary predicates): ${other.sql}")
  }

  private def attrName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.name
    case a: Attribute => a.name
    case other => throw new IllegalArgumentException(
      s"expected a column reference, got: ${other.sql}")
  }

  /** Catalyst literal → plain Scala value for the Filter algebra. */
  private def lit(v: Any, dt: org.apache.spark.sql.types.DataType): Any = v match {
    case u: UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal
    case other => other
  }
}
