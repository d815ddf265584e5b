package graft.queries

import graft.SparkSpec

/** The federation gate query must not just be correct — each
  * format's scan has to PRUNE: Delta by hive partition, Iceberg by
  * the month() transform manifest entries. inputFiles is the planned
  * file set, so these assertions fail if any pruning path regresses.
  */
class LakehouseFedSpec extends SparkSpec {

  test("q_lakehouse_join plans pruned scans for all three formats") {
    val df = Wave6Queries.qLakehouseJoin(spark, sf())
    val files = df.inputFiles
    assert(files.nonEmpty)

    val cust = files.filter(_.contains("/customer/"))
    assert(cust.nonEmpty, "expected Delta customer files in the plan")
    assert(cust.forall(_.contains("c_mktsegment=BUILDING")),
      s"Delta scan not partition-pruned: ${cust.filterNot(_.contains("BUILDING")).take(3).mkString(", ")}")

    val (_, ordPath, _) = Wave6Queries.writtenLakehouse(spark, sf())
    val ordPlanned = files.filter(_.contains("/orders/")).toSet
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(ordPath, "data"), true)
    var all = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) all += 1 }
    assert(ordPlanned.nonEmpty, "expected Iceberg orders files in the plan")
    assert(ordPlanned.size < all,
      s"Iceberg month-transform pruning planned ${ordPlanned.size} of $all files — nothing pruned")

    val nat = files.filter(_.contains("/nation/"))
    assert(nat.nonEmpty, "expected Hudi nation files in the plan")
  }
}
