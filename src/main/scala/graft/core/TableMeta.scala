package graft.core

import org.apache.spark.sql.types.StructType

/** Read-only-API exposure options, mirroring RoapiOptions /
  * DeltaRoapiOptions (datarepo/core/tables/util.py:17-29).
  */
final case class RoapiOptions(
    useMemoryTable: Boolean = false,
    disable: Boolean = false,
    overrideName: Option[String] = None,
    reloadIntervalSeconds: Option[Int] = None
)

/** Documentation/metadata surface, mirroring the reference's
  * TableMetadata / TableSchema / TableColumn / TablePartition
  * (datarepo/core/tables/metadata.py:9-56).
  */
final case class TableMetadata(
    tableType: String,
    description: String = "",
    docsFilters: Seq[Filter] = Seq.empty,
    docsColumns: Option[Seq[String]] = None,
    latencyInfo: Option[String] = None,
    exampleNotebook: Option[String] = None,
    dataInput: Option[String] = None,
    isDeprecated: Boolean = false,
    roapiOpts: Option[RoapiOptions] = None
)

final case class TablePartition(columnName: String, typeAnnotation: String, value: Any)

final case class TableColumn(
    column: String,
    dataType: String,
    readonly: Boolean = false,
    filterOnly: Boolean = false,
    hasStats: Boolean = false
)

final case class TableSchema(partitions: Seq[TablePartition], columns: Seq[TableColumn])

object TableSchema {
  /** Build column descriptors from a Spark schema. */
  def columnsOf(schema: StructType, statsCols: Set[String] = Set.empty): Seq[TableColumn] =
    schema.fields.toSeq.map { f =>
      TableColumn(f.name, f.dataType.simpleString, hasStats = statsCols.contains(f.name))
    }
}
