package graft

import graft.functions.{MinHashSigs, ShingleHashSet, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Spark session extension wiring the graft native expressions into
  * the SQL function registry, so `spark.sql` users can call them:
  *
  *   spark.sql("SELECT graft_minhash(text, 5, 8) FROM docs")
  *
  * Activate with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or call [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // SQL UPDATE / MERGE INTO over graft-catalog tables (E66): Spark's
    // built-in planner only serves SupportsRowLevelOperations tables;
    // this strategy routes the statements to the native writers.
    // (GraftCatalog.initialize also self-registers it, so catalog
    // users get DML without configuring extensions.)
    ext.injectPlannerStrategy(_ => graft.spark.GraftDmlStrategy)
    // streaming reads THROUGH the catalog (E66/r15):
    // spark.readStream.table("graft.`/p`") plants the DSv1 source
    // triad as the relation's v1 fallback
    ext.injectResolutionRule(s => graft.spark.GraftStreamingRule(s))
    // The window-top-k → bounded-heap rewrite
    // (graft.plans.RowNumberTopKRewrite) is deliberately NOT injected
    // here: Spark 4's InferWindowGroupLimit already bounds the shuffle
    // to k rows per group ahead of the exchange and stays inside
    // whole-stage codegen, and it measures ~20% faster than the
    // interpreted TypedImperativeAggregate heap on the bench pair.
    // The rule remains available as an explicit opt-in
    // (spark.experimental.extraOptimizations) for engines without a
    // group-limit optimization.
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash"),
      (exprs: Seq[Expression]) =>
        MinHashSigs(exprs.head, intArg(exprs(1), "k"), intArg(exprs(2), "numHashes"))),
    ("graft_shingle_hashset",
      new ExpressionInfo(classOf[ShingleHashSet].getName, "graft_shingle_hashset"),
      (exprs: Seq[Expression]) =>
        ShingleHashSet(exprs.head, intArg(exprs(1), "k"))),
    ("graft_sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1))),
    ("graft_iceberg_bucket",
      new ExpressionInfo(classOf[graft.functions.IcebergBucket].getName, "graft_iceberg_bucket"),
      (exprs: Seq[Expression]) =>
        graft.functions.IcebergBucket(exprs.head, intArg(exprs(1), "n"))),
    ("graft_cosine",
      new ExpressionInfo(classOf[graft.functions.VecCosine].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => graft.functions.VecCosine(exprs.head, exprs(1))),
    ("graft_l2sq",
      new ExpressionInfo(classOf[graft.functions.VecL2Sq].getName, "graft_l2sq"),
      (exprs: Seq[Expression]) => graft.functions.VecL2Sq(exprs.head, exprs(1))),
    ("graft_nfc_normalize",
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "graft_nfc_normalize"),
      (exprs: Seq[Expression]) => graft.functions.NfcNormalize(exprs.head)),
    ("graft_srp_signature",
      new ExpressionInfo(classOf[graft.functions.SrpSignature].getName, "graft_srp_signature"),
      // (vec, nbits, dim [, seed]) — the ±1 matrix is derived here so
      // SQL callers get the same deterministic hyperplanes as the
      // Scala API
      (exprs: Seq[Expression]) => {
        val seed = exprs.lift(3).map {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"seed must be a string literal, got $other")
        }.getOrElse("srp")
        graft.functions.SrpSignature(exprs.head,
          graft.functions.Srp.signMatrix(
            intArg(exprs(1), "nbits"), intArg(exprs(2), "dim"), seed))
      }),
    ("graft_frequent_items",
      new ExpressionInfo(
        classOf[graft.functions.FrequentItemsSketch].getName, "graft_frequent_items"),
      // aggregate: SELECT graft_frequent_items(item, k) — top items
      // with the Misra-Gries membership/error guarantees
      (exprs: Seq[Expression]) =>
        graft.functions.FrequentItemsSketch(
          org.apache.spark.sql.catalyst.expressions.Cast(
            exprs.head, org.apache.spark.sql.types.StringType),
          intArg(exprs(1), "k"))
          .toAggregateExpression()),
    ("graft_bloom_filter",
      new ExpressionInfo(
        classOf[graft.functions.BloomFilterAgg].getName, "graft_bloom_filter"),
      // aggregate: SELECT graft_bloom_filter(key, numBits [, numHashes])
      // — BINARY Bloom filter of the BIGINT keys (no false negatives)
      (exprs: Seq[Expression]) =>
        graft.functions.BloomFilterAgg(exprs.head, intArg(exprs(1), "numBits"),
          exprs.lift(2).map(intArg(_, "numHashes")).getOrElse(7))
          .toAggregateExpression()),
    ("graft_bloom_might_contain",
      new ExpressionInfo(
        classOf[graft.functions.BloomMightContain].getName, "graft_bloom_might_contain"),
      // SQL integer literals arrive as INT — widen the key to BIGINT
      (exprs: Seq[Expression]) =>
        graft.functions.BloomMightContain(exprs.head,
          org.apache.spark.sql.catalyst.expressions.Cast(
            exprs(1), org.apache.spark.sql.types.LongType))),
    ("graft_search_sorted",
      new ExpressionInfo(classOf[graft.operators.SearchSorted].getName, "graft_search_sorted"),
      // (value, bounds...) — boundaries as double literals
      (exprs: Seq[Expression]) => graft.operators.SearchSorted(exprs.head,
        exprs.tail.map {
          case Literal(d: Double, _) => d
          case Literal(i: Int, _)    => i.toDouble
          case Literal(l: Long, _)   => l.toDouble
          // SQL `1.0` parses as a decimal literal
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case other => throw new IllegalArgumentException(
            s"boundaries must be numeric literals, got $other")
        }))
  )

  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
