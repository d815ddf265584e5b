package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DateType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side conversion of log/manifest partition values to CATALYST
  * values, plus the scan-side attach helper. Together with
  * [[FileConstAttr]] this is the machinery that collapses the old
  * one-union-branch-per-partition-tuple scan assembly to ONE parquet
  * relation: partition values become per-file constants resolved
  * against `_metadata.file_path` instead of literal columns on
  * per-partition sub-plans (same values — the conversion below is the
  * same string→type cast the literal column used to do — but the plan
  * width no longer grows with partition cardinality, which is what a
  * 100 TB table with thousands of partitions needs from the driver).
  */
private[graft] object PartitionAttach {

  /** Delta log partition values are strings (PROTOCOL.md "Partition
    * Value Serialization") — same semantics as `lit(v).cast(dt)`,
    * evaluated once on the driver. LEGACY eval mode: an unparseable
    * value yields null rather than an ANSI throw, matching permissive
    * partition-directory parsing.
    */
  def fromString(v: String, dt: DataType, zone: String): Any =
    if (v == null) null
    else Cast(Literal(UTF8String.fromString(v), org.apache.spark.sql.types.StringType),
      dt, Option(zone), EvalMode.LEGACY).eval(null)

  /** Iceberg manifest partition values are typed Avro values —
    * mirrors the pre-r13 per-partition literal column: epoch-day ints ARE the
    * Catalyst DateType encoding; everything else goes through the
    * same literal+cast the per-partition column used.
    */
  def fromAvro(v: Any, dt: DataType, zone: String): Any = v match {
    case null                        => null
    case i: Int if dt == DateType    => i
    case other =>
      val l = Literal(IcebergMeta.avroValue(other))
      if (l.dataType == dt) l.value
      else Cast(l, dt, Option(zone), EvalMode.LEGACY).eval(null)
  }

  def sessionZone(spark: SparkSession): String =
    spark.sessionState.conf.sessionLocalTimeZone

  /** `df.withColumn(name, <per-file constant>)` — `df` must still
    * expose the scan's `_metadata` pseudo-column (attach BEFORE any
    * select that drops it). `attrs` is keyed by
    * [[DvDeleted.normalizePath]]-normalized absolute path.
    */
  def attach(df: DataFrame, name: String, attrs: Map[String, Any], dt: DataType): DataFrame =
    df.withColumn(name, constCol(attrs, dt))

  def constCol(attrs: Map[String, Any], dt: DataType): Column =
    Bridge.column(FileConstAttr(
      Bridge.expression(col("_metadata.file_path")), attrs, dt))

  /** ONE path→tuple map for k attached columns: `attrs` values are
    * [[tupleRow]]s laid out as `fields`; each column extracts its
    * ordinal from the SAME shared map object through a struct-typed
    * [[FileConstAttr]] — driver memory and closure weight are
    * O(files), not O(k·files), and whole-stage codegen's
    * subexpression elimination folds the k probes into one cached
    * per-file lookup.
    */
  def tupleField(
      attrs: Map[String, Any],
      fields: org.apache.spark.sql.types.StructType,
      i: Int): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.GetStructField(
      FileConstAttr(
        Bridge.expression(col("_metadata.file_path")), attrs, fields),
      i, Some(fields(i).name)))

  def tupleRow(values: Seq[Any]): Any =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      values.toArray)
}
