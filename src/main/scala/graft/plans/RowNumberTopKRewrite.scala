package graft.plans

import graft.functions.TopKRows
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: `row_number() OVER (PARTITION BY p ORDER BY o) <= k`
  * filtered directly above its Window becomes a bounded-heap TopK
  * aggregate + explode.
  *
  * The window formulation shuffles *and sorts* every partition to
  * number rows it mostly discards; the rewrite ships at most k rows
  * per group through the shuffle and sorts nothing (see
  * graft.operators.TopK). The rule matches only the exact
  * Filter(rn <= lit, Window(single row_number alias)) shape with a
  * non-empty partition spec, so any query it touches is semantically
  * identical by construction; output attribute ids are preserved, so
  * parent operators resolve unchanged.
  *
  * Opt-in: inject with
  * `spark.experimental.extraOptimizations ++= Seq(RowNumberTopKRewrite)`
  * (or via a SparkSessionExtensions build); not registered by default.
  *
  * WHEN TO TURN IT ON — the measured crossover (graft.tools.TopKProbe,
  * sf0.1 lineitem ≈ 600k rows, local[32], top-2 per group, medians of
  * 7): the heap wins when groups are LARGE relative to k — 8 groups
  * (~75k rows each): 0.74 s vs the window's 0.99 s; 64 groups: 0.62 s
  * vs 0.84 s; ~1k groups: parity (0.81 vs 0.79); 20k groups (~30 rows
  * each): the window wins 0.93 vs 1.01 s. Spark 4's own
  * InferWindowGroupLimit already bounds each partition sort to k rows
  * per group MAP-SIDE, and its whole-stage-codegen sort of tiny
  * partitions beats this aggregate's interpreted per-row ord
  * evaluation; the heap's O(n)-no-sort advantage only cashes in once
  * per-group row counts reach the hundreds. Rule of thumb: enable for
  * top-k over FEW, FAT groups (domains, shards, labels); leave off for
  * high-cardinality keys (per-user, per-document top-k).
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
          w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(partitionSpec, orderSpec, _)), _)), _, _, child, _))
        if partitionSpec.nonEmpty =>
      extractLimit(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && k <= 10000 =>
          rewrite(f, w, alias, partitionSpec, orderSpec, unwrapGroupLimit(child, partitionSpec, orderSpec, k), k)
        case _ => f
      }
  }

  /** Spark's own InferWindowGroupLimit runs in the main optimizer
    * batch — BEFORE user-provided rules — and leaves a
    * [[WindowGroupLimit]] under the Window. Keeping it under the TopK
    * aggregate would execute BOTH top-k strategies (the group limit's
    * full partition sorts + exchange AND the bounded heap): strip it
    * when it matches the window spec and keeps ≥ k rows per group
    * (then it only drops rows the heap would drop anyway).
    */
  private def unwrapGroupLimit(
      child: LogicalPlan,
      partitionSpec: Seq[Expression],
      orderSpec: Seq[SortOrder],
      k: Int
  ): LogicalPlan = child match {
    case WindowGroupLimit(p2, o2, _: RowNumber, lim, inner)
        if lim >= k &&
          p2.length == partitionSpec.length &&
          p2.zip(partitionSpec).forall { case (a, b) => a.semanticEquals(b) } &&
          o2.length == orderSpec.length &&
          o2.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } =>
      inner
    case other => other
  }

  /** cond must be exactly `rnAttr <= k` / `rnAttr < k` / `k >= rnAttr`. */
  private def extractLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn)        => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case _ => None
  }

  private def rewrite(
      f: Filter,
      w: Window,
      rnAlias: Alias,
      partitionSpec: Seq[Expression],
      orderSpec: Seq[SortOrder],
      child: LogicalPlan,
      k: Int
  ): LogicalPlan = {
    val childOut = child.output

    // The TopKRows buffer compares its priority struct with Spark's
    // interpreted struct ordering: field-by-field ASCENDING with nulls
    // FIRST and NaN greatest. Each SortOrder must therefore be encoded
    // into fields that reproduce its exact direction AND null ordering
    // under those semantics, or the rule must bail out (the window
    // path stays correct, just slower):
    //  - nullable key: prepend an explicit null-rank flag so NULLS
    //    FIRST/LAST is honored (a naive UnaryMinus would promote nulls
    //    of a DESC NULLS LAST key to rank 1..k);
    //  - DESC integral: BitwiseNot, which reverses two's-complement
    //    order with no overflow (UnaryMinus wraps on MinValue / throws
    //    under ANSI);
    //  - DESC decimal: negation (Decimal(p,s) range is symmetric, so
    //    it cannot overflow);
    //  - DESC float/double: NaN-rank flag (NaN is the DESC maximum)
    //    then negation of the finite values;
    //  - anything else descending (strings, dates, ...): bail out.
    val ordFields: Option[Seq[Expression]] = {
      val converted = orderSpec.map(encodeSortOrder)
      if (converted.exists(_.isEmpty)) None else Some(converted.flatten.flatten)
    }

    ordFields match {
      case None => f // unsupported ordering shape: leave untouched
      case Some(ordExprs) =>
        // total order: sort keys then the full row as tie-break
        val ord = CreateStruct(ordExprs ++ childOut)
        val value = CreateStruct(childOut)
        val topK = TopKRows(value, ord, k).toAggregateExpression()
        val topAlias = Alias(topK, "_graft_top")()

        val groupAliases = partitionSpec.zipWithIndex.map {
          case (a: Attribute, _) => a
          case (e, i)            => Alias(e, s"_graft_g$i")()
        }
        val agg = Aggregate(
          groupAliases.map(_.toAttribute),
          (groupAliases.map(_.toAttribute) :+ topAlias).map(_.asInstanceOf[NamedExpression]),
          Project((child.output ++ groupAliases.collect { case a: Alias => a }).distinct, child))

        val posAttr = AttributeReference("pos", IntegerType, nullable = false)()
        val rowAttr = AttributeReference("col", value.dataType, nullable = false)()
        val gen = Generate(
          PosExplode(topAlias.toAttribute),
          unrequiredChildIndex = Seq(agg.output.indexOf(topAlias.toAttribute)),
          outer = false,
          qualifier = None,
          generatorOutput = Seq(posAttr, rowAttr),
          child = agg)

        // reproduce the original output attributes (same exprIds)
        val restored: Seq[NamedExpression] = f.output.map { out =>
          if (out.exprId == rnAlias.toAttribute.exprId) {
            val rank = Cast(Add(posAttr, Literal(1)), rnAlias.dataType)
            Alias(rank, out.name)(exprId = out.exprId)
          } else {
            val idx = childOut.indexWhere(_.exprId == out.exprId)
            if (idx >= 0)
              Alias(GetStructField(rowAttr, idx, Some(childOut(idx).name)), out.name)(exprId = out.exprId)
            else out // partition key attr flows through the aggregate
          }
        }
        Project(restored, gen)
    }
  }

  /** Encode one SortOrder as struct fields whose ascending/nulls-first
    * comparison equals the requested ordering; None = not encodable.
    */
  private def encodeSortOrder(so: SortOrder): Option[Seq[Expression]] = {
    val c = so.child
    // rank field placed before the key: nulls get rank 0 (sort first)
    // or 1 (sort last) per the SortOrder's null ordering.
    def nullRank: Expression = {
      val (nullV, otherV) = if (so.nullOrdering == NullsFirst) (0, 1) else (1, 0)
      If(IsNull(c), Literal(nullV), Literal(otherV))
    }
    def withNullRank(fields: Seq[Expression]): Seq[Expression] =
      if (c.nullable) nullRank +: fields else fields

    so.direction match {
      case Ascending =>
        // ascending struct comparison is natively nulls-first
        if (!c.nullable || so.nullOrdering == NullsFirst) Some(Seq(c))
        else Some(Seq(nullRank, c))
      case Descending =>
        val inverted: Option[Seq[Expression]] = c.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            Some(Seq(BitwiseNot(c)))
          case _: DecimalType =>
            Some(Seq(UnaryMinus(c, failOnError = false)))
          case FloatType | DoubleType =>
            // DESC places NaN first (it is the floating maximum); the
            // ascending buffer places NaN last, so rank NaN explicitly
            // before negating the finite values (negation reverses
            // order exactly for non-NaN IEEE values; +-0.0 compare
            // equal in Spark's ordering).
            Some(Seq(If(IsNaN(c), Literal(0), Literal(1)),
                     UnaryMinus(c, failOnError = false)))
          case _ => None
        }
        inverted.map(withNullRank)
    }
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }
}
