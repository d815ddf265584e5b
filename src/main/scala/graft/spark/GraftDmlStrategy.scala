package graft.spark

import graft.tables.{DeltaSql, DeltaWrite, HudiTable, HudiWrite, IcebergWrite, ReadArgs}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.Bridge

/** Planner strategy serving SQL `UPDATE` and `MERGE INTO` over
  * [[GraftCatalog]] tables — the last asymmetry between graft SQL and
  * native-connector SQL (Spark's built-in planner only rewrites
  * row-level commands for SupportsRowLevelOperations tables; every
  * other table hits "not supported"). Registered automatically when
  * the catalog initializes, or via [[graft.GraftExtensions]].
  *
  * Routing (the SAME proven writers the DeltaSql/LakehouseSql front
  * doors call — minimal-IO copy-on-write / DV updates, not a
  * whole-table rewrite):
  *
  *  - `UPDATE graft.\`/p\` SET c = e, ... [WHERE pred]` →
  *    [[DeltaWrite.updateWhere]] (Delta, CoW/DV per table policy),
  *    [[IcebergWrite.updateWhere]] (CoW rewrite of the matched files
  *    in one snapshot), or a one-commit Hudi key-merged upsert of the
  *    rewritten matches (key/partition columns must not be SET). The
  *    WHERE may be ANY deterministic, subquery-free predicate (r15):
  *    shapes inside the pruning algebra ([[DeltaSql.exprToFilters]])
  *    route exactly; anything else splits — the algebra-expressible
  *    conjuncts prune files ([[DeltaSql.exprToPruningFilters]]) and
  *    the full predicate evaluates row-by-row in the writers.
  *  - `DELETE FROM graft.\`/p\` WHERE pred` with a predicate OUTSIDE
  *    the algebra takes the same split route here; algebra-shaped
  *    (and foldable/no-WHERE) deletes stay with the proven DSv2
  *    SupportsDelete path and its delete-all refusals.
  *  - `MERGE INTO graft.\`/p\` t USING src ON t.k = src.k ...` →
  *    [[DeltaWrite.merge]] / [[IcebergWrite.upsertEquality]] /
  *    [[HudiWrite.upsert]]. The ON clause must be a conjunction of
  *    key equalities (the native writers join by name). Clause
  *    surface (SQL first-match-wins semantics, statement order): any
  *    number of `WHEN MATCHED [AND c] THEN UPDATE SET * / SET x =
  *    expr / DELETE`, `WHEN NOT MATCHED [AND c] THEN INSERT * /
  *    INSERT (cols) VALUES (exprs)` (unassigned columns NULL-fill),
  *    and `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET /
  *    DELETE` (target-only expressions). The unconditional SET * /
  *    INSERT * key-upsert shape routes straight to the writers with
  *    no target read; every other shape pairs rows against a target
  *    snapshot and feeds the writers exactly the changed rows.
  *    DELETE clauses are Delta-only (the Iceberg/Hudi merge writers
  *    are pure key-upserts); unsupported shapes refuse LOUDLY with
  *    the supported form named — never a silently different
  *    semantics.
  */
object GraftDmlStrategy extends SparkStrategy {

  /** Idempotently add this strategy to a session's planner. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(GraftTarget(t), assignments, condition) =>
      planUpdate(t, assignments, condition) :: Nil
    case m: MergeIntoTable =>
      EliminateSubqueryAliases(m.targetTable) match {
        case GraftTarget(t) => planMerge(t, m) :: Nil
        case _              => Nil
      }
    case DeleteFromTable(target, cond) =>
      EliminateSubqueryAliases(target) match {
        case GraftTarget(t) =>
          // predicates INSIDE the pruning algebra keep the proven
          // DSv2 SupportsDelete route (planned by Spark's own
          // strategy); this strategy takes over only the shapes that
          // would otherwise fail at analysis — algebra conjuncts
          // prune files, the full predicate selects rows (r15).
          // FOLDABLE conditions (the parser's no-WHERE TrueLiteral,
          // `WHERE 1=1`) also stay with the DSv2 route: its
          // canDeleteWhere gate deliberately REFUSES delete-all on
          // Iceberg/Hudi (a position-delete/key-delete row per table
          // row), and the residual seam must not bypass that.
          val folded = DeltaSql.foldCastLiterals(cond)
          val translatable = folded.foldable || {
            try { DeltaSql.exprToFilters(folded); true }
            catch { case _: IllegalArgumentException => false }
          }
          if (translatable) Nil else planDelete(t, folded) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  private def planDelete(
      target: (GraftV2Table, LogicalPlan),
      cond: Expression): SparkPlan = {
    val (t, _) = target
    require(t.travelOpts.isEmpty,
      s"cannot DELETE FROM a time-traveled table (${t.path})")
    DeltaSql.requireResidualSafe(cond, "DELETE")
    val pruning = DeltaSql.exprToPruningFilters(cond)
    val predSql = unqualifiedSql(cond)
    GraftDmlExec(s"DELETE FROM ${t.format}.`${t.path}`", { spark =>
      t.format match {
        case "delta" =>
          DeltaWrite.deleteWhere(spark, t.path, pruning,
            predicateSql = Some(predSql))
        case "iceberg" =>
          IcebergWrite.deleteWhere(spark, t.path, pruning, Some(predSql))
        case _ =>
          // Hudi: the shared delete-by-predicate route (algebra
          // prunes, the full predicate selects, key replacecommit)
          HudiWrite.deleteMatching(spark, t.path, pruning, Some(predSql))
      }
      ()
    })
  }

  private object GraftTarget {
    def unapply(plan: LogicalPlan): Option[(GraftV2Table, LogicalPlan)] =
      EliminateSubqueryAliases(plan) match {
        // the optimizer may have already rewritten the relation into a
        // scan (V2ScanRelationPushDown runs before planning) — match both
        case r: DataSourceV2Relation => r.table match {
          case t: GraftV2Table => Some((t, r))
          case _               => None
        }
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          s.relation.table match {
            case t: GraftV2Table => Some((t, s))
            case _               => None
          }
        case _ => None
      }
  }

  // ------------------------------------------------------- UPDATE

  private def planUpdate(
      target: (GraftV2Table, LogicalPlan),
      assignments: Seq[Assignment],
      condition: Option[Expression]): SparkPlan = {
    val (t, _) = target
    val set = assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => throw new UnsupportedOperationException(
          s"UPDATE SET supports top-level columns, got ${other.sql}")
      }
      name -> unqualifiedSql(a.value)
    }
    // commands execute from the ANALYZED plan (no optimizer pass), so
    // type coercion's Cast(Literal) wrappers are still present — fold
    // them so the algebra translator sees plain literals. Predicates
    // OUTSIDE the pruning algebra no longer refuse (r15): the
    // algebra-expressible conjuncts OVER-approximate for file pruning
    // and the FULL predicate evaluates row-by-row in the writers.
    val folded = condition.map(DeltaSql.foldCastLiterals)
    val (filters, predicateSql) = folded match {
      case None => (graft.core.Filters.normalize(Seq.empty), None)
      case Some(c) =>
        try (DeltaSql.exprToFilters(c), None)
        catch {
          case _: IllegalArgumentException =>
            DeltaSql.requireResidualSafe(c, "UPDATE")
            (DeltaSql.exprToPruningFilters(c), Some(unqualifiedSql(c)))
        }
    }
    if (t.format == "delta")
      GraftDmlExec(s"UPDATE delta.`${t.path}`", { spark =>
        DeltaWrite.updateWhere(spark, t.path, filters, set,
          predicateSql = predicateSql); ()
      })
    else if (t.format == "iceberg")
      // copy-on-write rewrite of the matched files, one snapshot,
      // existing MoR deletes/DVs materialized (r15)
      GraftDmlExec(s"UPDATE iceberg.`${t.path}`", { spark =>
        IcebergWrite.updateWhere(spark, t.path, filters, set, predicateSql); ()
      })
    else
      // Hudi: rewrite the (pruned) matching rows and key-merge them
      // back in ONE atomic upsert commit. The record key and the
      // partition fields must not be SET — a changed key would insert
      // a new row instead of updating, a moved partition would
      // duplicate the key across partitions.
      GraftDmlExec(s"UPDATE hudi.`${t.path}`", { spark =>
        val fs = new org.apache.hadoop.fs.Path(t.path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val props = HudiWrite.readProps(fs, t.path)
        val keyCol = props.getOrElse("hoodie.table.recordkey.fields",
          throw new IllegalArgumentException(
            s"${t.path} has no hoodie.table.recordkey.fields"))
        val partFields = props.get("hoodie.table.partition.fields").toSeq
          .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        set.map(_._1).foreach(c => require(
          !keyCol.split(',').map(_.trim).contains(c) && !partFields.contains(c),
          s"cannot UPDATE key/partition column $c of a Hudi table"))
        val matching0 = new HudiTable(t.path.split('/').last, t.path)(
          spark, ReadArgs(filters = filters))
        // residual predicate: the algebra filters only PRUNED — apply
        // the full predicate to pick exactly the rows to rewrite
        val matching = predicateSql.map(ps => matching0.where(
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.expr(ps),
            org.apache.spark.sql.functions.lit(false)))).getOrElse(matching0)
        set.map(_._1).foreach(c => require(matching.columns.contains(c),
          s"SET column $c is not in the table schema"))
        // every assignment sees the PRE-update row (SQL UPDATE
        // semantics): one select, never chained withColumns
        val setMap = set.toMap
        val updated = matching.select(matching.columns.toSeq.map(c =>
          setMap.get(c)
            .map(e => org.apache.spark.sql.functions.expr(e).as(c))
            .getOrElse(org.apache.spark.sql.functions.col(c))): _*)
        if (!updated.isEmpty) HudiWrite.upsert(spark, updated, t.path)
        ()
      })
  }

  // -------------------------------------------------------- MERGE

  private def planMerge(
      target: (GraftV2Table, LogicalPlan),
      m: MergeIntoTable): SparkPlan = {
    val (t, relation) = target
    val shapeHint =
      "the graft catalog serves the key-upsert MERGE shape: ON equality " +
        "keys; any number of WHEN MATCHED [AND c] THEN UPDATE SET * / SET " +
        "x = expr / DELETE clauses (first match wins, statement order); " +
        "WHEN NOT MATCHED [AND c] THEN INSERT * / INSERT (cols) VALUES " +
        "(exprs); WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET / " +
        "DELETE"
    require(!m.withSchemaEvolution,
      s"MERGE WITH SCHEMA EVOLUTION is not supported through the graft catalog")

    // ON: conjunction of target-column = source-column equalities,
    // names matching pairwise (the native writers join by name)
    val targetAttrs = relation.outputSet
    def keys(e: Expression): Seq[String] = e match {
      case And(l, r) => keys(l) ++ keys(r)
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (tc, sc) =
          if (targetAttrs.contains(a)) (a, b)
          else if (targetAttrs.contains(b)) (b, a)
          else throw new UnsupportedOperationException(
            s"MERGE ON must compare target to source columns — $shapeHint")
        require(tc.name == sc.name,
          s"MERGE ON joins ${tc.name} to ${sc.name}; the native writers join " +
            "by NAME — alias the source column to match")
        Seq(tc.name)
      case other => throw new UnsupportedOperationException(
        s"MERGE ON must be a conjunction of column equalities, got " +
          s"${other.sql} — $shapeHint")
    }
    val keyCols = keys(m.mergeCondition).distinct

    // clause model — STATEMENT order kept everywhere; SQL semantics:
    // for each row the FIRST clause whose condition holds applies,
    // later clauses only see rows no earlier clause took
    sealed trait Clause
    case class UpdClause(cond: Option[Expression], assigns: Seq[Assignment])
        extends Clause // assigns empty = SET *
    case class DelClause(cond: Option[Expression]) extends Clause

    def assignName(a: Assignment): String = a.key match {
      case ar: AttributeReference => ar.name
      case other => throw new UnsupportedOperationException(
        s"UPDATE SET supports top-level columns, got ${other.sql}")
    }
    def isIdentity(as: Seq[Assignment]): Boolean = as.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name == v.name
      case _ => false
    }
    val matchedClauses: Seq[Clause] = m.matchedActions.map {
      case UpdateAction(cond, as, _) => UpdClause(cond, as)
      case u: UpdateStarAction       => UpdClause(u.condition, Seq.empty)
      case DeleteAction(cond)        => DelClause(cond)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN MATCHED action $other — $shapeHint")
    }
    val insertClauses: Seq[(Option[Expression], Seq[Assignment])] =
      m.notMatchedActions.map {
        case InsertAction(cond, as) => (cond, as)
        case i: InsertStarAction    => (i.condition, Seq.empty)
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED action $other — $shapeHint")
      }
    // NOT MATCHED BY SOURCE clauses see only the target row (SQL:
    // there is no source row — the analyzer rejects source
    // references; SET * has nothing to take a star from)
    val bySourceClauses: Seq[Clause] = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, as, _) =>
        require(as.nonEmpty,
          "WHEN NOT MATCHED BY SOURCE UPDATE needs explicit SET columns — " +
            "there is no source row to take * from")
        UpdClause(cond, as)
      case DeleteAction(cond) => DelClause(cond)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action $other — $shapeHint")
    }
    require(matchedClauses.nonEmpty || insertClauses.nonEmpty ||
      bySourceClauses.nonEmpty, s"MERGE needs at least one clause — $shapeHint")
    // deletes route through the writers' delete-keys path — Delta
    // implements it; the Iceberg/Hudi merge writers are pure
    // key-upserts, so a delete-bearing MERGE refuses at PLAN time
    val hasDelete =
      (matchedClauses ++ bySourceClauses).exists(_.isInstanceOf[DelClause])
    require(!hasDelete || t.format == "delta",
      "WHEN [NOT] MATCHED ... THEN DELETE is Delta-only through the graft " +
        s"catalog — $shapeHint")

    def fullIdentity(as: Seq[Assignment]): Boolean =
      as.isEmpty || (isIdentity(as) &&
        as.map(assignName).toSet == relation.output.map(_.name).toSet)
    def srcOnly(cond: Option[Expression]): Boolean =
      !cond.exists(_.references.toSeq.exists(targetAttrs.contains))
    // the direct key-upsert fast path needs no target read — exactly
    // the native writers' own shape: one UNconditional SET * (explicit
    // star, or identity assignments covering EVERY column: a partial
    // identity SET like `SET x = s.x` keeps the other columns' TARGET
    // values, which is NOT an upsert), optionally preceded by one
    // DELETE conditioned on SOURCE columns only (the writers evaluate
    // it on the source row), one unconditional full-width INSERT, and
    // nothing by source. Everything else pairs rows below in
    // statement-clause order.
    val directUpsert = bySourceClauses.isEmpty &&
      (insertClauses match {
        case Seq((None, as)) => fullIdentity(as)
        case _               => false
      }) &&
      (matchedClauses match {
        case Seq(UpdClause(None, as)) => fullIdentity(as)
        case Seq(DelClause(dc), UpdClause(None, as)) =>
          fullIdentity(as) && srcOnly(dc)
        case _ => false
      })
    // fast-path delete condition: rendered over bare source names
    val deleteWhen: Option[String] =
      if (!directUpsert) None
      else matchedClauses.collectFirst {
        case DelClause(c) => c.map(unqualifiedSql).getOrElse("true")
      }

    val sourcePlan = m.sourceTable
    GraftDmlExec(s"MERGE INTO ${t.format}.`${t.path}`", { spark =>
      import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}
      val source = Bridge.ofRows(spark, sourcePlan)
      // the pairing path consumes the source plan several times (pair
      // join, cardinality probe, insert anti-join, BY SOURCE key
      // anti-join, then the writer's own pruning/content scans) —
      // persist it once so an expensive or NON-DETERMINISTIC source
      // cannot route the same row through different clauses on
      // different scans
      if (!directUpsert) source.persist()
      try {
      // pairing path: hand the proven key-upsert writers an EFFECTIVE
      // source of exactly the rows that change — matched rows whose
      // firing clause is an update project through their SET
      // expressions, unmatched source rows project through their
      // insert clause, unmatched-by-source target rows through their
      // BY SOURCE update clause; rows firing no clause never appear,
      // so they stay untouched (no rewrite, no CDC row, no row-id
      // churn). Delete-firing rows contribute key tuples instead.
      // the pairing read is a SNAPSHOT of the target: capture the
      // Delta version first and commit with requireBase, so a
      // concurrent write between the read and the commit aborts
      // loudly (ConcurrentWriteException) instead of silently writing
      // stale _tgt_ values back (Iceberg/Hudi keep their documented
      // snapshot-isolation caveat — same as deleteWhere's)
      val requireBase: Option[Long] =
        if (directUpsert || t.format != "delta") None
        else Some(graft.tables.DeltaLog
          .snapshot(spark, t.path, withFiles = false).version)
      val (effectiveSource, deleteKeys): (org.apache.spark.sql.DataFrame,
          Option[org.apache.spark.sql.DataFrame]) =
        if (directUpsert) (source, None)
        else {
          val tgt = spark.read.format("graft").load(t.path)
          require(tgt.columns.forall(c => !c.startsWith("_tgt_")),
            "conditional MERGE reserves the _tgt_ column-name prefix")
          val tgtR = tgt.select(tgt.columns.toSeq.map(c =>
            col(c).as("_tgt_" + c)): _*)
          // exclusive first-match-wins firing columns for an ordered
          // clause list (a null condition is SQL-false); `pair` picks
          // the rendering frame — paired rows carry _tgt_ names,
          // insert rows carry bare source names
          def fires(conds: Seq[Option[Expression]], pair: Boolean)
              : Seq[org.apache.spark.sql.Column] = {
            var prior: org.apache.spark.sql.Column = lit(false)
            conds.map { c =>
              val rendered = c
                .map(e => if (pair) mergePairSql(e, targetAttrs)
                          else unqualifiedSql(e))
                .map(s => coalesce(expr(s), lit(false))).getOrElse(lit(true))
              val f = rendered && !prior
              prior = prior || rendered
              f
            }
          }
          def clauseCond(c: Clause): Option[Expression] = c match {
            case UpdClause(cond, _) => cond
            case DelClause(cond)    => cond
          }
          def updSets(clauses: Seq[Clause],
              fs: Seq[org.apache.spark.sql.Column])
              : Seq[(org.apache.spark.sql.Column, Map[String, String])] =
            clauses.zip(fs).collect {
              case (UpdClause(_, as), f) =>
                val sets: Map[String, String] =
                  if (as.isEmpty)
                    // SET *: every column from the SOURCE row (plain
                    // names resolve to the source side of the pair)
                    relation.output.map(a =>
                      a.name -> UnresolvedAttribute(Seq(a.name)).sql).toMap
                  else as.map(a =>
                    assignName(a) -> mergePairSql(a.value, targetAttrs)).toMap
                (f, sets)
            }
          def delAny(clauses: Seq[Clause],
              fs: Seq[org.apache.spark.sql.Column])
              : Option[org.apache.spark.sql.Column] =
            clauses.zip(fs).collect { case (DelClause(_), f) => f }
              .reduceOption(_ || _)
          // updated-row projection: SET columns from the (exclusive)
          // firing clause that sets them, everything else the TARGET
          // value (SQL UPDATE semantics)
          def updateProjection(rows: org.apache.spark.sql.DataFrame,
              us: Seq[(org.apache.spark.sql.Column, Map[String, String])])
              : org.apache.spark.sql.DataFrame =
            rows.where(us.map(_._1).reduce(_ || _))
              .select(tgt.columns.toSeq.map { c =>
                us.foldRight(col("_tgt_" + c)) { case ((f, sets), acc) =>
                  sets.get(c).map(e =>
                    when(f, expr(e).cast(tgt.schema(c).dataType)).otherwise(acc))
                    .getOrElse(acc)
                }.as(c)
              }: _*)

          // WHEN MATCHED: pair matched rows with the target ONCE
          // (target columns under _tgt_ names), split by the firing
          // clause — updates project, deletes contribute key tuples,
          // no-clause rows stay untouched (no rewrite, no CDC row)
          val (updated, delMatched) =
            if (matchedClauses.isEmpty) (None, None)
            else {
              val pairCond = keyCols.map(k => source(k) === tgtR("_tgt_" + k))
                .reduce(_ && _)
              val pairs = source.join(tgtR, pairCond, "inner")
              val fs = fires(matchedClauses.map(clauseCond), pair = true)
              // SQL MERGE cardinality rule: a target row matched by
              // MORE than one clause-firing source row is an ERROR —
              // proceeding would update the row twice (duplicate key
              // rows written) or both delete and update it with
              // arbitrary first-row-wins semantics
              val anyFire = fs.reduce(_ || _)
              val viol = pairs.where(anyFire)
                .groupBy(keyCols.map(c => col("_tgt_" + c)): _*)
                .count().where(col("count") > 1).limit(1).count() > 0
              if (viol) throw new UnsupportedOperationException(
                s"MERGE INTO ${t.path}: a target row matches more than one " +
                  "source row with an applying WHEN MATCHED clause " +
                  "(cardinality violation) — deduplicate the source on the " +
                  s"join keys (${keyCols.mkString(", ")})")
              val us = updSets(matchedClauses, fs)
              (if (us.isEmpty) None else Some(updateProjection(pairs, us)),
                delAny(matchedClauses, fs).map(f => pairs.where(f)
                  .select(keyCols.map(col): _*).distinct()))
            }
          // WHEN NOT MATCHED: unmatched source rows, the first firing
          // insert clause projects them (explicit column lists
          // NULL-fill unassigned columns); rows firing no clause do
          // not insert
          val inserts =
            if (insertClauses.isEmpty) None
            else {
              val tgtKeys = tgt.select(keyCols.map(col): _*)
              val un = source.join(tgtKeys, keyCols, "left_anti")
              val fs = fires(insertClauses.map(_._1), pair = false)
              Some(insertClauses.zip(fs).map { case ((_, as), f) =>
                val rows = un.where(f)
                if (as.isEmpty || (isIdentity(as) &&
                    as.map(assignName).toSet == tgt.columns.toSet))
                  // cast like the column-list branch below — an
                  // INT-typed source column must not write int32
                  // physical pages into a LONG table column
                  rows.select(tgt.columns.toSeq.map(c =>
                    col(c).cast(tgt.schema(c).dataType).as(c)): _*)
                else {
                  val sets = as.map(a =>
                    assignName(a) -> unqualifiedSql(a.value)).toMap
                  rows.select(tgt.columns.toSeq.map { c =>
                    sets.get(c)
                      .map(e => expr(e).cast(tgt.schema(c).dataType).as(c))
                      .getOrElse(lit(null).cast(tgt.schema(c).dataType).as(c))
                  }: _*)
                }
              }.reduce(_ unionByName _))
            }
          // WHEN NOT MATCHED BY SOURCE: target rows whose key has no
          // source row — conditions and SET values see the target only
          val (bySrcUpd, bySrcDel) =
            if (bySourceClauses.isEmpty) (None, None)
            else {
              val srcKeys = source.select(keyCols.map(k =>
                col(k).as("_tgt_" + k)): _*)
              val un = tgtR.join(srcKeys, keyCols.map("_tgt_" + _), "left_anti")
              val fs = fires(bySourceClauses.map(clauseCond), pair = true)
              val us = updSets(bySourceClauses, fs)
              (if (us.isEmpty) None else Some(updateProjection(un, us)),
                delAny(bySourceClauses, fs).map(f => un.where(f)
                  .select(keyCols.map(k => col("_tgt_" + k).as(k)): _*)
                  .distinct()))
            }
          val effective = Seq(updated, bySrcUpd, inserts).flatten
            .reduceOption(_ unionByName _)
            .getOrElse(spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), tgt.schema))
          val delKeys = Seq(delMatched, bySrcDel).flatten
            .reduceOption(_ unionByName _)
          (effective, delKeys)
        }
      t.format match {
        case "delta" =>
          DeltaWrite.merge(spark, t.path, effectiveSource, keyCols,
            deleteWhenMatched = if (directUpsert) deleteWhen else None,
            deleteKeys = deleteKeys,
            requireBase = requireBase)
        case "iceberg" =>
          IcebergWrite.upsertEquality(spark, effectiveSource, t.path, keyCols)
        case _ =>
          // Hudi upserts on the table's declared record key — a MERGE
          // keyed differently would silently change semantics: refuse.
          // The property is comma-joined for composite keys; compare
          // as a set so multi-key ON clauses can ever satisfy it
          val fs = new org.apache.hadoop.fs.Path(t.path)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val keyCol = HudiWrite.readProps(fs, t.path)
            .getOrElse("hoodie.table.recordkey.fields",
              throw new IllegalArgumentException(
                s"${t.path} has no hoodie.table.recordkey.fields"))
          val declared = keyCol.split(',').map(_.trim).filter(_.nonEmpty).toSet
          require(keyCols.toSet == declared,
            s"MERGE into a Hudi table must join on its record key " +
              s"(${declared.mkString(", ")}), got ${keyCols.mkString(", ")}")
          // the underlying writer upserts on ONE key column; a
          // composite-key table refuses with the real limitation
          // named, not an unsatisfiable join-key demand
          require(declared.size == 1,
            s"Hudi MERGE supports single-column record keys; ${t.path} " +
              s"declares the composite key (${declared.mkString(", ")})")
          HudiWrite.upsert(spark, effectiveSource, t.path)
      }
      } finally if (!directUpsert) { source.unpersist(); () }
      ()
    })
  }

  /** Render a merge-clause expression over the PAIRED frame: target
    * attributes become `_tgt_<name>`, source attributes keep their
    * names — both sides of a matched pair stay referenceable without
    * qualifier ambiguity.
    */
  private def mergePairSql(
      e: Expression,
      targetAttrs: org.apache.spark.sql.catalyst.expressions.AttributeSet): String =
    e.transform {
      case a: AttributeReference if targetAttrs.contains(a) =>
        UnresolvedAttribute(Seq("_tgt_" + a.name))
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql

  /** Render an expression as SQL over bare column names (the native
    * writers evaluate SET / delete conditions against unqualified
    * frames, so `t.c` qualifiers must not survive).
    */
  private def unqualifiedSql(e: Expression): String =
    e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql
}

/** Physical node for an eagerly-executed graft DML statement: the
  * side effect runs exactly once (commands execute via
  * executeCollect), returns no rows.
  */
case class GraftDmlExec(label: String, effect: SparkSession => Unit)
    extends SparkPlan {

  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil

  @transient private lazy val done: Array[InternalRow] = {
    effect(SparkSession.active); Array.empty
  }

  override def executeCollect(): Array[InternalRow] = done

  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.parallelize(Seq.empty[InternalRow], 1)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this

  override def simpleString(maxFields: Int): String = s"GraftDmlExec $label"
}
