package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.spark.sql.types._

class FormatTableSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "tag", "v")

  private val declared = StructType(Seq(
    StructField("id", LongType), StructField("tag", StringType), StructField("v", DoubleType)))

  test("csv source with declared schema, filters, and pruning") {
    val dir = tempDir("fmt").toString + "/csv"
    data.write.mode("overwrite").option("header", "true").csv(dir)
    val t = new FormatTable("t", dir, "csv", Some(declared), Map("header" -> "true"))
    val df = t(spark, ReadArgs.where(Filter("v", ">", 2.0)).copy(columns = Some(Seq("id", "tag"))))
    assert(df.columns.toSeq == Seq("id", "tag"))
    assert(df.as[(Long, String)].collect().toSet == Set((2L, "b"), (3L, "c")))
  }

  test("json source with inferred schema") {
    val dir = tempDir("fmt").toString + "/json"
    data.write.mode("overwrite").json(dir)
    val t = new FormatTable("t", dir, "json")
    assert(t(spark, ReadArgs.where(Filter("tag", "in", Seq("a", "c")))).count() == 2)
    assert(t.getSchema(spark).columns.map(_.column).toSet == Set("id", "tag", "v"))
  }

  test("orc source round-trips") {
    val dir = tempDir("fmt").toString + "/orc"
    data.write.mode("overwrite").orc(dir)
    val t = new FormatTable("t", dir, "orc", Some(declared))
    assert(t(spark, ReadArgs.empty).count() == 3)
  }

  // this Spark build bundles the Avro FileFormat classes but not the
  // module's DataSourceRegister service entry, so the provider is
  // addressed by class name rather than the `avro` short name
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  test("avro source round-trips with filters and pruning") {
    val dir = tempDir("fmt").toString + "/avro"
    data.write.mode("overwrite").format(AvroProvider).save(dir)
    val t = new FormatTable("t", dir, AvroProvider, Some(declared))
    val df = t(spark, ReadArgs.where(Filter("id", "<=", 2L)).copy(columns = Some(Seq("tag"))))
    assert(df.columns.toSeq == Seq("tag"))
    assert(df.as[String].collect().toSet == Set("a", "b"))
  }

  test("xml source round-trips (Spark 4 native XML, rowTag records)") {
    val dir = tempDir("fmt").toString + "/xml"
    data.write.mode("overwrite").format("xml")
      .option("rowTag", "rec").save(dir)
    val t = new FormatTable("t", dir, "xml", Some(declared), Map("rowTag" -> "rec"))
    val df = t(spark, ReadArgs.where(Filter("tag", "!=", "b")))
    assert(df.count() == 2)
    assert(df.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }
}
