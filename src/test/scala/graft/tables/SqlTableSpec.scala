package graft.tables

import graft.core.{Filter, Filters}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SqlTableSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("implant_id", LongType),
    StructField("date", StringType),
    StructField("value", LongType)))

  private val t = new SqlTable("my_table", schema,
    SqlTableConfig(host = "localhost", database = "db1",
      username = Some("u"), password = Some("p")))

  test("uri construction mirrors the reference") {
    assert(t.config.uri == "clickhouse://u:p@localhost:8443/db1")
    assert(SqlTableConfig("h").uri == "clickhouse://h:8443/default")
  }

  test("select * with no filters") {
    assert(t.buildQuery() == "SELECT * FROM `db1`.`my_table`")
  }

  test("column selection keeps only valid columns") {
    assert(t.buildQuery(columns = Some(Seq("date", "nope"))) ==
      "SELECT `date` FROM `db1`.`my_table`")
    // all-invalid falls back to *
    assert(t.buildQuery(columns = Some(Seq("nope"))) ==
      "SELECT * FROM `db1`.`my_table`")
  }

  test("filters compile to an OR-of-ANDs WHERE clause") {
    val q = t.buildQuery(filters = Filters.normalizeDnf(Seq(
      Seq(Filter("implant_id", "=", 5), Filter("date", ">", "2024-01-01")),
      Seq(Filter("value", "in", Seq(1, 2))))))
    assert(q ==
      "SELECT * FROM `db1`.`my_table` WHERE (`implant_id` = 5 AND `date` > '2024-01-01') OR (`value` IN (1, 2))")
  }

  test("string escaping") {
    val q = t.buildQuery(filters = Filters.normalize(Seq(Filter("date", "=", "o'clock"))))
    assert(q.contains("'o''clock'"))
  }
}
