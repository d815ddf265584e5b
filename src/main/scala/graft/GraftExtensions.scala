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
    // window-top-k → bounded-heap aggregate rewrite (conservative
    // matching; see graft.plans.RowNumberTopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RowNumberTopKRewrite)
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
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1)))
  )

  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
