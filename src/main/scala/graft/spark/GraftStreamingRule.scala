package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.graftbridge.Bridge

/** Resolution rule making `spark.readStream.table("graft.`/p`")` work:
  * a [[GraftV2Table]] resolved into a streaming plan gets the V1
  * streaming relation (the SAME `format("graft")` DSv1 source triad —
  * Delta commit-log tail, Iceberg snapshot diffs, Hudi instant
  * fencing) planted as its `v1Relation` fallback; micro-batch
  * execution then runs through the proven sources with the table's
  * resolved output, checkpoints included. Injected by
  * [[graft.GraftExtensions]] (`spark.sql.extensions`).
  *
  * The typed CDC stream has a DIFFERENT schema than the table, so
  * `.option("cdc", "true")` through the table path would mis-bind the
  * resolved columns — refused loudly toward
  * `readStream.format("graft")`, which resolves the cdc schema.
  */
case class GraftStreamingRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case s: StreamingRelationV2 if s.table.isInstanceOf[GraftV2Table] =>
      import scala.jdk.CollectionConverters._
      val t = s.table.asInstanceOf[GraftV2Table]
      val opts = s.extraOptions.asScala.toMap
      if (opts.get("cdc").exists(_.toBoolean))
        throw new UnsupportedOperationException(
          "the typed CDC stream has its own schema; read it with " +
            "spark.readStream.format(\"graft\").option(\"cdc\", \"true\")" +
            ".load(path), not through the catalog table")
      val v1 = Bridge.v1StreamingRelation(spark, "graft",
        opts ++ Map("path" -> t.path, "format" -> t.format))
      val byName = v1.output.map(a => a.name -> a).toMap
      // re-expose the source's columns under the RESOLVED relation's
      // expression ids, so every downstream reference keeps binding
      Project(s.output.map { o =>
        val src = byName.getOrElse(o.name, throw new IllegalStateException(
          s"streaming source for ${t.path} lacks resolved column ${o.name}"))
        Alias(src, o.name)(exprId = o.exprId)
      }, v1)
  }
}
