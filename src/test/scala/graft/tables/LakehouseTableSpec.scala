package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class LakehouseTableSpec extends SparkSpec {
  import spark.implicits._

  private def writeRaw(): String = {
    val dir = tempDir("lake").toString + "/t"
    Seq(
      ("a", 1, "2024-01-01", 10.0),
      ("a", 2, "2024-01-01", 20.0),
      ("b", 3, "2024-01-02", 30.0)
    ).toDF("z", "seq", "date", "v").write.mode("overwrite").parquet(dir)
    dir
  }

  private val declared = StructType(Seq(
    StructField("z", StringType),
    StructField("seq", LongType),            // file has int -> cast
    StructField("date", StringType),
    StructField("v", DoubleType),
    StructField("extra_missing", StringType) // not in file -> null
  ))

  test("schema normalization: missing cols null, casts, declared order") {
    val t = new LakehouseTable("t", writeRaw(), declared)
    val df = t(spark, ReadArgs.empty)
    assert(df.columns.toSeq == declared.fieldNames.toSeq)
    assert(df.schema("seq").dataType == LongType)
    assert(df.where(col("extra_missing").isNull).count() == 3)
  }

  test("unique_columns keep-first dedup honors order column") {
    val t = new LakehouseTable("t", writeRaw(), declared,
      uniqueColumns = Some(Seq("z")), orderColumn = Some("seq"))
    val rows = t(spark, ReadArgs.empty).select("z", "seq").as[(String, Long)].collect().toMap
    assert(rows == Map("a" -> 1L, "b" -> 3L))
  }

  test("extra computed columns") {
    val t = new LakehouseTable("t", writeRaw(), declared,
      extraCols = Seq((col("v") * 2, "v2", "double")))
    val df = t(spark, ReadArgs.empty)
    assert(df.where(col("v2") === col("v") * 2).count() == 3)
    val schema = t.getSchema(spark)
    assert(schema.columns.exists(c => c.column == "v2" && c.readonly))
  }

  test("filter DNF and raw SQL predicate pushdown") {
    val t = new LakehouseTable("t", writeRaw(), declared)
    assert(t(spark, ReadArgs.where(Filter("z", "=", "a"))).count() == 2)
    val viaSql = t(spark, ReadArgs(extra = Map(t.PredicateKey -> "v > 15 and z = 'a'")))
    assert(viaSql.select("seq").as[Long].collect().toSeq == Seq(2L))
  }

  test("empty/fileless location yields an empty frame with the declared schema") {
    val empty = tempDir("lake-empty").toString + "/none"
    val t = new LakehouseTable("t", empty, declared)
    val df = t(spark, ReadArgs.empty)
    assert(df.columns.toSeq == declared.fieldNames.toSeq)
    assert(df.count() == 0)
  }

  test("column selection still dedups on unique columns first") {
    val t = new LakehouseTable("t", writeRaw(), declared,
      uniqueColumns = Some(Seq("z")), orderColumn = Some("seq"))
    val df = t(spark, ReadArgs(columns = Some(Seq("date"))))
    assert(df.columns.toSeq == Seq("date"))
    assert(df.count() == 2)
  }

  test("column selection prunes the scan before the keep-first aggregate") {
    val t = new LakehouseTable("t", writeRaw(), declared,
      uniqueColumns = Some(Seq("z")), orderColumn = Some("seq"))
    val df = t(spark, ReadArgs(columns = Some(Seq("v"))))
    // same rows a full-width dedup would keep (unique (key, order))
    assert(df.as[Double].collect().sorted.toSeq == Seq(10.0, 30.0))
    // the unrequested columns never enter the scan: the keep-first
    // struct is opaque to Catalyst, so pruning must happen table-side
    val plan = df.queryExecution.executedPlan.toString
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("z") && read.contains("seq") && read.contains("v"), read)
    assert(!read.contains("date"), s"unrequested column read: $read")
  }
}
