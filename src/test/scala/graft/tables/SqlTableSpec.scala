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

/** End-to-end: buildQuery output executed by a real JDBC engine
  * (embedded Derby, on Spark's classpath) through the same
  * `spark.read.format("jdbc").option("query", ...)` path a ClickHouse
  * deployment would use — only the jdbcUrl and identifier quote
  * differ.
  */
class SqlTableJdbcSpec extends graft.SparkSpec {
  import graft.core.{Filter, Filters}
  import org.apache.spark.sql.types._

  test("filtered+projected read executes over a live JDBC engine") {
    val url = "jdbc:derby:memory:graftsql;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE "items" ("id" INT, "name" VARCHAR(20), "price" DOUBLE)""")
      st.execute(
        """INSERT INTO "items" VALUES (1,'apple',1.5),(2,'banana',0.5),(3,'cherry',3.0)""")
      st.close()
    } finally conn.close()

    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("price", DoubleType)))
    val table = new SqlTable("items", schema,
      SqlTableConfig(host = "localhost", database = "APP",
        jdbcUrl = Some(url), identifierQuote = "\""))

    val df = table(spark, ReadArgs(
      filters = Filters.normalize(Seq(Filter("price", ">", 1.0))),
      columns = Some(Seq("id", "name"))))
    assert(df.columns.toSeq == Seq("id", "name"))
    import spark.implicits._
    assert(df.as[(Int, String)].collect().sortBy(_._1).toSeq ==
      Seq((1, "apple"), (3, "cherry")))

    // DNF with IN + string filter through the same path
    val df2 = table(spark, ReadArgs(
      filters = Filters.normalizeDnf(Seq(
        Seq(Filter("id", "in", Seq(2, 3))),
        Seq(Filter("name", "=", "apple"))))))
    assert(df2.count() == 3)
  }
}
