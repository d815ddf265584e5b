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
  *    [[DeltaWrite.updateWhere]] (Delta, CoW/DV per table policy) or
  *    a one-commit Hudi key-merged upsert of the rewritten matches
  *    (key/partition columns must not be SET); Iceberg refuses toward
  *    MERGE — its write path has no atomic delete+append rewrite.
  *    The WHERE must sit in the pruning filter algebra
  *    ([[DeltaSql.exprToFilters]]) — same bar as DSv2 DELETE.
  *  - `MERGE INTO graft.\`/p\` t USING src ON t.k = src.k
  *     WHEN MATCHED [AND c] THEN DELETE / WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *` →
  *    [[DeltaWrite.merge]] / [[IcebergWrite.upsertEquality]] /
  *    [[HudiWrite.upsert]]. The key-upsert shape (equality ON, SET *,
  *    INSERT *) is what the native writers implement; other merge
  *    shapes refuse LOUDLY with the supported form named — never a
  *    silently different semantics.
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
    case _ => Nil
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
    // them so the algebra translator sees plain literals
    val filters = condition.map(c => DeltaSql.exprToFilters(foldCastLiterals(c)))
      .getOrElse(graft.core.Filters.normalize(Seq.empty))
    if (t.format == "delta")
      GraftDmlExec(s"UPDATE delta.`${t.path}`", { spark =>
        DeltaWrite.updateWhere(spark, t.path, filters, set); ()
      })
    else if (t.format == "iceberg")
      // copy-on-write rewrite of the matched files, one snapshot,
      // existing MoR deletes/DVs materialized (r15)
      GraftDmlExec(s"UPDATE iceberg.`${t.path}`", { spark =>
        IcebergWrite.updateWhere(spark, t.path, filters, set); ()
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
        val matching = new HudiTable(t.path.split('/').last, t.path)(
          spark, ReadArgs(filters = filters))
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
        "keys, WHEN MATCHED [AND c] THEN DELETE, WHEN MATCHED [AND c] THEN " +
        "UPDATE SET * / SET x = expr, WHEN NOT MATCHED THEN INSERT *"
    require(!m.withSchemaEvolution,
      s"MERGE WITH SCHEMA EVOLUTION is not supported through the graft catalog")
    require(m.notMatchedBySourceActions.isEmpty,
      s"WHEN NOT MATCHED BY SOURCE is not supported — $shapeHint")

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

    // WHEN MATCHED: at most one UPDATE — unconditional SET *
    // (identity assignments, the direct key-upsert fast path) OR a
    // conditional / expression-valued clause (r15: WHEN MATCHED
    // [AND c] THEN UPDATE SET x = expr, both sides referenceable) —
    // and at most one conditional DELETE. STATEMENT ORDER is honored
    // per SQL: for each matched row the FIRST clause whose condition
    // holds applies.
    var deleteCondE: Option[Option[Expression]] = None
    var update: Option[(Option[Expression], Seq[Assignment])] = None
    var deleteIdx = -1
    var updateIdx = -1
    def isIdentity(as: Seq[Assignment]): Boolean = as.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name == v.name
      case _ => false
    }
    m.matchedActions.zipWithIndex.foreach {
      case (UpdateAction(cond, as, _), i) =>
        require(update.isEmpty, s"at most one WHEN MATCHED UPDATE — $shapeHint")
        update = Some((cond, as)); updateIdx = i
      case (u: UpdateStarAction, i) =>
        require(update.isEmpty, s"at most one WHEN MATCHED UPDATE — $shapeHint")
        update = Some((u.condition, Seq.empty)); updateIdx = i
      case (DeleteAction(cond), i) =>
        require(deleteCondE.isEmpty, s"at most one WHEN MATCHED DELETE — $shapeHint")
        deleteCondE = Some(cond); deleteIdx = i
      case (other, _) => throw new UnsupportedOperationException(
        s"unsupported WHEN MATCHED action $other — $shapeHint")
    }
    require(update.isDefined || deleteCondE.isDefined,
      s"MERGE needs a WHEN MATCHED clause — $shapeHint")
    val (updateCond, updateAssigns) =
      update.getOrElse((None, Seq.empty[Assignment]))
    val deleteRefsTarget = deleteCondE.exists(
      _.exists(_.references.toSeq.exists(targetAttrs.contains)))
    // the direct key-upsert fast path needs no target read — only for
    // an UNconditional SET * (explicit star, or identity assignments
    // covering EVERY column: a partial identity SET like `SET x = s.x`
    // keeps the other columns' TARGET values, which is NOT an upsert)
    // whose optional DELETE clause PRECEDES it (the writers evaluate
    // the delete first) over SOURCE columns only (they evaluate it on
    // the source row). Everything else pairs matched rows below in
    // statement-clause order.
    val directUpsert = update.isDefined && updateCond.isEmpty &&
      (updateAssigns.isEmpty ||
        (isIdentity(updateAssigns) &&
          updateAssigns.flatMap(_.key match {
            case ar: AttributeReference => Some(ar.name)
            case _ => None
          }).toSet == relation.output.map(_.name).toSet)) &&
      (deleteCondE.isEmpty || (deleteIdx < updateIdx && !deleteRefsTarget))
    // fast-path delete condition: rendered over bare source names
    val deleteWhen: Option[String] =
      if (!directUpsert) None
      else deleteCondE.map(_.map(unqualifiedSql).getOrElse("true"))
    // pairing-path clause conditions in STATEMENT order: the later
    // clause only fires where the earlier one did not (SQL
    // first-match-wins); both may reference both sides
    val delPairSql: Option[String] =
      deleteCondE.map(_.map(c => mergePairSql(c, targetAttrs)).getOrElse("true"))
    val updPairSql: Option[String] =
      update.map(_._1.map(c => mergePairSql(c, targetAttrs)).getOrElse("true"))
    // SET keys must be top-level target columns; values may reference
    // BOTH sides (rendered over source names and _tgt_-prefixed
    // target names below)
    val setExprs: Seq[(String, String)] =
      if (directUpsert || update.isEmpty) Seq.empty
      else if (updateAssigns.isEmpty)
        // conditional SET *: every column from the SOURCE row (plain
        // names resolve to the source side of the paired frame)
        relation.output.map(a => a.name -> UnresolvedAttribute(Seq(a.name)).sql)
      else updateAssigns.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"UPDATE SET supports top-level columns, got ${other.sql}")
        }
        name -> mergePairSql(a.value, targetAttrs)
      }
    m.notMatchedActions match {
      case Seq(InsertAction(None, as)) if isIdentity(as) => ()
      case Seq(InsertStarAction(None))                   => ()
      case Seq() => throw new UnsupportedOperationException(
        "MERGE without WHEN NOT MATCHED THEN INSERT is not supported — the " +
          s"native writers always upsert; $shapeHint")
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED action(s) $other — $shapeHint")
    }

    val sourcePlan = m.sourceTable
    GraftDmlExec(s"MERGE INTO ${t.format}.`${t.path}`", { spark =>
      import org.apache.spark.sql.functions.{coalesce, col, expr, lit}
      val source = Bridge.ofRows(spark, sourcePlan)
      // conditional / expression-valued update: pair matched rows with
      // the target ONCE (target columns under _tgt_ names), project the
      // updated rows (SET columns from the expressions, the rest from
      // the TARGET — SQL UPDATE semantics), and hand the proven
      // key-upsert writers an EFFECTIVE source of exactly the rows
      // that change: matched rows failing the update condition never
      // appear, so they stay untouched (no rewrite, no CDC row, no
      // row-id churn). Delete-matched rows split off FIRST (clause
      // precedence) — matched ones delete by key, unmatched ones fall
      // through to INSERT per SQL clause semantics.
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
          val pairCond = keyCols.map(k => source(k) === tgtR("_tgt_" + k))
            .reduce(_ && _)
          val pairs = source.join(tgtR, pairCond, "inner")
          // clause conditions in STATEMENT order: the later clause
          // fires only where the earlier one did not
          def cond(sql: Option[String]) =
            sql.map(c => coalesce(expr(c), lit(false))).getOrElse(lit(false))
          val delC = cond(delPairSql)
          val updC = cond(updPairSql)
          val (delFires, updFires) =
            if (deleteIdx >= 0 && updateIdx >= 0 && deleteIdx < updateIdx)
              (delC, !delC && updC)
            else if (deleteIdx >= 0 && updateIdx >= 0)
              (!updC && delC, updC)
            else (delC, updC)
          val updated =
            if (update.isEmpty) None
            else Some(pairs.where(updFires)
              .select(tgt.columns.toSeq.map { c =>
                setExprs.toMap.get(c)
                  .map(e => expr(e).cast(tgt.schema(c).dataType).as(c))
                  .getOrElse(col("_tgt_" + c).as(c))
              }: _*))
          val delMatched = deleteCondE.map(_ => pairs.where(delFires)
            .select(keyCols.map(col): _*).distinct())
          // WHEN NOT MATCHED applies to every unmatched source row,
          // clause conditions notwithstanding (they only gate MATCHED)
          val tgtKeys = tgt.select(keyCols.map(col): _*)
          val inserts = source.join(tgtKeys, keyCols, "left_anti")
            .select(tgt.columns.map(col).toSeq: _*)
          (updated.fold(inserts)(_ unionByName inserts), delMatched)
        }
      t.format match {
        case "delta" =>
          DeltaWrite.merge(spark, t.path, effectiveSource, keyCols,
            deleteWhenMatched = if (directUpsert) deleteWhen else None,
            deleteKeys = deleteKeys,
            requireBase = requireBase)
        case "iceberg" =>
          require(deleteCondE.isEmpty,
            "WHEN MATCHED THEN DELETE is Delta-only through the graft catalog")
          IcebergWrite.upsertEquality(spark, effectiveSource, t.path, keyCols)
        case _ =>
          require(deleteCondE.isEmpty,
            "WHEN MATCHED THEN DELETE is Delta-only through the graft catalog")
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

  private def foldCastLiterals(e: Expression): Expression = e.transformUp {
    case c: org.apache.spark.sql.catalyst.expressions.Cast
        if c.child.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] =>
      org.apache.spark.sql.catalyst.expressions.Literal.create(c.eval(null), c.dataType)
  }

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
