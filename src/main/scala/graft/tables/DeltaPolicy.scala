package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side enforcement of Delta table policies, from the public
  * protocol (delta-io/delta PROTOCOL.md; the reference's tables are
  * produced by writers that enforce these — deltalake_table.py reads
  * them assuming they held):
  *
  *   - column invariants (`delta.invariants` field metadata,
  *     writer v2),
  *   - NOT NULL columns (schema `nullable=false`, writer v2),
  *   - CHECK constraints (`delta.constraints.*` table configuration,
  *     writer v3 / `checkConstraints` feature),
  *   - generated columns (`delta.generationExpression` field
  *     metadata, writer v4 / `generatedColumns` feature): computed
  *     when absent from the incoming frame, validated when present,
  *   - `delta.appendOnly` (writer v2): any commit removing data with
  *     `dataChange=true` is refused (pure rewrites like OPTIMIZE stay
  *     legal).
  *
  * Every DeltaWrite data path calls [[prepare]] before staging files.
  * All policy predicates are validated in ONE Spark job (a single
  * aggregate of violation counts), and the job is skipped entirely
  * for tables that declare no policy — plain-table writes pay zero
  * overhead. A constraint violation refuses the whole commit (the
  * protocol's contract: constrained tables never contain violating
  * rows), naming every violated policy and its violation count.
  */
private[tables] object DeltaPolicy {

  val GenerationExpressionKey = "delta.generationExpression"
  val InvariantsKey = "delta.invariants"
  val ConstraintPrefix = "delta.constraints."
  val AppendOnlyKey = "delta.appendOnly"

  // identity columns (writer v6 / `identityColumns` feature): values
  // minted by the writer as start + k·step, furthest minted value
  // tracked in the field's highWaterMark metadata
  val IdentityStartKey = "delta.identity.start"
  val IdentityStepKey = "delta.identity.step"
  val IdentityHwmKey = "delta.identity.highWaterMark"
  val IdentityAllowExplicitKey = "delta.identity.allowExplicitInsert"

  /** One identity column's declaration (+ current high-water mark). */
  final case class IdentitySpec(
      column: String,
      start: Long,
      step: Long,
      highWaterMark: Option[Long],
      allowExplicitInsert: Boolean)

  def identityColumns(meta: DeltaLog.Metadata): Seq[IdentitySpec] =
    meta.schema.fields.collect {
      case f if f.metadata.contains(IdentityStartKey) =>
        IdentitySpec(
          f.name,
          f.metadata.getLong(IdentityStartKey),
          f.metadata.getLong(IdentityStepKey),
          if (f.metadata.contains(IdentityHwmKey))
            Some(f.metadata.getLong(IdentityHwmKey)) else None,
          f.metadata.contains(IdentityAllowExplicitKey) &&
            f.metadata.getBoolean(IdentityAllowExplicitKey))
    }.toSeq

  private val mapper = new ObjectMapper()

  /** CHECK constraints: name → SQL predicate. */
  def constraints(meta: DeltaLog.Metadata): Map[String, String] =
    meta.configuration.collect {
      case (k, v) if k.startsWith(ConstraintPrefix) =>
        k.stripPrefix(ConstraintPrefix) -> v
    }

  /** Generated columns: column name → generation SQL. */
  def generationExpressions(meta: DeltaLog.Metadata): Map[String, String] =
    meta.schema.fields.collect {
      case f if f.metadata.contains(GenerationExpressionKey) =>
        f.name -> f.metadata.getString(GenerationExpressionKey)
    }.toMap

  /** Column invariants: column name → SQL predicate. The metadata
    * value is the protocol's JSON wrapper
    * `{"expression":{"expression":"<sql>"}}`.
    */
  def invariants(meta: DeltaLog.Metadata): Map[String, String] =
    meta.schema.fields.collect {
      case f if f.metadata.contains(InvariantsKey) =>
        val node = mapper.readTree(f.metadata.getString(InvariantsKey))
        f.name -> node.path("expression").path("expression").asText()
    }.toMap

  def notNullColumns(meta: DeltaLog.Metadata): Seq[String] =
    meta.schema.fields.filterNot(_.nullable).map(_.name).toSeq

  def isAppendOnly(meta: DeltaLog.Metadata): Boolean =
    meta.configuration.get(AppendOnlyKey).contains("true")

  /** Refuse operations that remove table data from an append-only
    * table (`dataChange=true` removes; OPTIMIZE-style rewrites with
    * `dataChange=false` remain legal per the protocol).
    */
  def requireNotAppendOnly(meta: DeltaLog.Metadata, op: String, tablePath: String): Unit =
    require(!isAppendOnly(meta),
      s"$op is not allowed: $tablePath is append-only (delta.appendOnly=true)")

  /** Fill in missing generated columns, then validate every declared
    * policy against the frame in one job. Returns the frame to write
    * (with generated columns materialized). Throws on any violation.
    */
  def prepare(df: DataFrame, meta: DeltaLog.Metadata, tablePath: String): DataFrame = {
    val gens = generationExpressions(meta)
    val schemaByName = meta.schema.fields.map(f => f.name -> f).toMap

    var out = df
    val checks = Seq.newBuilder[(String, Column)] // label → violation predicate
    gens.foreach { case (name, sql) =>
      val target = schemaByName(name).dataType
      if (!out.columns.contains(name))
        out = out.withColumn(name, expr(sql).cast(target))
      else
        // provided values must equal the generation result (null-safe)
        checks += (s"generated column $name != ($sql)" ->
          !(col(name) <=> expr(sql).cast(target)))
    }
    // a CHECK constraint / invariant is satisfied when its predicate
    // is TRUE or NULL (SQL constraint semantics); violation = IS FALSE
    constraints(meta).foreach { case (name, sql) =>
      checks += (s"CHECK constraint $name ($sql)" -> (coalesce(expr(sql), lit(true)) === false))
    }
    invariants(meta).foreach { case (name, sql) =>
      checks += (s"invariant on $name ($sql)" -> (coalesce(expr(sql), lit(true)) === false))
    }
    notNullColumns(meta).filter(out.columns.contains).foreach { name =>
      checks += (s"NOT NULL column $name" -> col(name).isNull)
    }

    val cs = checks.result()
    if (cs.isEmpty) return out
    val counts = out
      .select(cs.zipWithIndex.map { case ((_, p), i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"_c$i")
      }: _*)
      .head()
    val violated = cs.zipWithIndex.collect {
      case ((label, _), i) if !counts.isNullAt(i) && counts.getLong(i) > 0 =>
        s"$label: ${counts.getLong(i)} row(s)"
    }
    require(violated.isEmpty,
      s"write to $tablePath violates table policies — ${violated.mkString("; ")}")
    out
  }
}
