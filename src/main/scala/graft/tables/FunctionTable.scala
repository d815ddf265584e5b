package graft.tables

import graft.core.{TableMetadata, TablePartition, TableSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A table defined by a function, the analog of the reference's
  * `@table` decorator / FunctionTable (datarepo/core/tables/
  * decorator.py:16-83). The function receives the full ReadArgs and is
  * free to interpret filters/columns/extra args.
  */
class FunctionTable(
    val tableMetadata: TableMetadata,
    f: (SparkSession, ReadArgs) => DataFrame
) extends TableProtocol {

  override def apply(spark: SparkSession, args: ReadArgs): DataFrame = f(spark, args)

  override def getSchema(spark: SparkSession): TableSchema = {
    val partitions = tableMetadata.docsFilters.map(fl =>
      TablePartition(fl.column, fl.value.getClass.getSimpleName, fl.value))
    val df = apply(spark, ReadArgs(graft.core.Filters.normalize(tableMetadata.docsFilters)))
    TableSchema(partitions, TableSchema.columnsOf(df.schema))
  }
}

object FunctionTable {
  /** `table(description){ (spark, args) => df }` convenience, mirroring
    * the decorator form.
    */
  def table(description: String = "", isDeprecated: Boolean = false)(
      f: (SparkSession, ReadArgs) => DataFrame): FunctionTable =
    new FunctionTable(
      TableMetadata("FUNCTION", description, isDeprecated = isDeprecated), f)
}
