package graft.queries

import graft.SparkSpec

/** r16 CBO path: sessions with `spark.sql.cbo.enabled` read the bench
  * tables through per-session ANALYZEd catalog tables (real row/column
  * stats). Results must be identical to the plain path, the scan must
  * still read the same parquet location (metadata only — never
  * results), and non-CBO sessions must be untouched.
  */
class CboStatsSpec extends SparkSpec {

  test("CBO session: q03 results match the plain path bit-for-bit") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.cbo.enabled", "true")
    val plain = QueryCatalog.queries("q03_shipping_priority")(spark, sf())
      .collect().toSeq
    val cbo = QueryCatalog.queries("q03_shipping_priority")(s2, sf())
      .collect().toSeq
    assert(cbo == plain)
  }

  test("CBO session reads through an analyzed catalog table with real stats") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.cbo.enabled", "true")
    val df = Tables.table(s2, sf(), "orders")
    // the scan still reads the same files (stats are metadata only)
    assert(df.inputFiles.exists(_.contains("orders.parquet")))
    // real stats: row count present and exact. Stats visitors read the
    // ACTIVE session's conf (SQLConf.get is thread-local), so evaluate
    // them the way s2's own planner would.
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    try {
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined, "catalog row count missing under CBO")
      assert(stats.rowCount.get.toLong == df.count())
      // attribute-level stats survived onto the relation (ndv on the key)
      assert(stats.attributeStats.nonEmpty, "column stats missing under CBO")
    } finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("non-CBO sessions keep the plain ParquetTable path") {
    val df = Tables.table(spark, sf(), "orders")
    assert(df.queryExecution.optimizedPlan.stats.rowCount.isEmpty,
      "plain path must not consult catalog stats")
  }
}
