package graft.tables

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Lakehouse-semantics table over parquet.
  *
  * Re-expresses the query semantics of the reference's DeltalakeTable
  * (datarepo/core/tables/deltalake_table.py:69-304) — SQL-predicate
  * pushdown, schema normalization to a declared schema, keep-first
  * dedup on `uniqueColumns`, computed `extraCols` — on Spark's native
  * parquet source. (No delta-log jars ship in this environment; the
  * transaction-log replay itself is out of scope, the dataframe
  * semantics are what the engine reproduces.)
  *
  * Scale notes: normalization is pure projection (no shuffle); the
  * predicate is a Catalyst filter pushed into the scan; dedup is a
  * single hash-shuffle on the unique key using `min_by(struct(*), ord)`
  * (partial aggregation map-side) rather than a global sort.
  */
class LakehouseTable(
    val name: String,
    val uri: String,
    val schema: StructType,
    description: String = "",
    docsFilters: Seq[Filter] = Seq.empty,
    val uniqueColumns: Option[Seq[String]] = None,
    /** Column that defines "first" for keep-first dedup. When None,
      * dedup keeps an arbitrary-but-single row per key (the reference
      * keeps polars file order, which has no distributed analog).
      */
    val orderColumn: Option[String] = None,
    /** Computed columns appended after the scan: (expr, alias, typeAnnotation). */
    val extraCols: Seq[(Column, String, String)] = Seq.empty,
    val statsCols: Seq[String] = Seq.empty
) extends TableProtocol {

  override val tableMetadata: TableMetadata =
    TableMetadata("DELTA_LAKE", description, docsFilters)

  /** Raw SQL predicate read-arg key (reference DeltaInputFilters
    * accepts a raw predicate string).
    */
  val PredicateKey = "predicate"

  override def apply(spark: SparkSession, args: ReadArgs): DataFrame = {
    // An empty/fileless location yields an empty frame with the
    // declared schema (deltalake_table.py:_empty_normalized_df) rather
    // than a schema-inference failure.
    var df =
      try SchemaCache.readParquet(spark, uri) // footer schema cached per (session, path)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" ||
              e.getCondition == "PATH_NOT_FOUND" =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    df = SchemaNormalize.normalize(df, schema)

    // Predicate pushdown: either the DNF filter algebra or a raw SQL
    // predicate string (deltalake_table.py:datafusion_predicate_from_filters)
    args.extra.get(PredicateKey) match {
      case Some(sql: String) => df = df.where(expr(sql))
      case _                 => Filters.toColumn(args.filters).foreach(p => df = df.filter(p))
    }

    extraCols.foreach { case (c, alias, _) => df = df.withColumn(alias, c) }

    uniqueColumns.filter(_.nonEmpty) match {
      case Some(keys) =>
        // projection pushed below the dedup — rationale and tie-break
        // contract documented on Dedup.keepFirstProjected
        df = graft.operators.Dedup.keepFirstProjected(df, keys, orderColumn, args.columns)
      case None =>
        args.columns.foreach(cols => df = df.select(cols.map(col): _*))
    }
    df
  }

  override def getSchema(spark: SparkSession): TableSchema = {
    val partitions = docsFilters.map(f =>
      TablePartition(f.column, f.value.getClass.getSimpleName, f.value))
    val cols = TableSchema.columnsOf(schema, statsCols.toSet) ++
      extraCols.map { case (_, alias, t) => TableColumn(alias, t, readonly = true) }
    TableSchema(partitions, cols)
  }
}

/** Schema normalization: add missing columns as typed nulls, cast
  * every column to the declared type, reorder to the declared order
  * (deltalake_table.py:_normalize_df). Pure projection — free at any
  * scale.
  */
object SchemaNormalize {
  def normalize(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols = schema.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }
}

