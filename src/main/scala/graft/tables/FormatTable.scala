package graft.tables

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Generic single-format table over any Spark DataSource (csv, json,
  * orc, parquet, text, ...): the same Filter-algebra/column-pruning
  * read API as ParquetTable, for the formats the reference reads via
  * scan_* helpers. Schema may be declared (skips inference — at lake
  * scale schema inference is a full extra pass for csv/json) or
  * inferred when omitted.
  */
class FormatTable(
    val name: String,
    val uri: String,
    val format: String,
    val schema: Option[StructType] = None,
    val options: Map[String, String] = Map.empty,
    description: String = ""
) extends TableProtocol {

  override val tableMetadata: TableMetadata =
    TableMetadata(format.toUpperCase, description)

  override def apply(spark: SparkSession, args: ReadArgs): DataFrame = {
    var reader = spark.read.format(format).options(options)
    schema.foreach(s => reader = reader.schema(s))
    var df = reader.load(uri)
    Filters.toColumn(args.filters).foreach(p => df = df.filter(p))
    args.columns.foreach(cs => df = df.select(cs.map(col): _*))
    df
  }

  override def getSchema(spark: SparkSession): TableSchema =
    TableSchema(Seq.empty,
      TableSchema.columnsOf(schema.getOrElse(apply(spark, ReadArgs.empty).schema)))
}
