package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HudiMetaTablesSpec extends SparkSpec {
  import spark.implicits._

  test("timeline and fileSlices expose Hudi table state as DataFrames") {
    val dir = tempDir("hudi-meta").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "p"), dir, "id", Seq("p"),
      tableType = "MERGE_ON_READ")
    val i2 = HudiWrite.upsert(spark,
      Seq((1L, "a2", 0)).toDF("id", "v", "p"), dir)

    val tl = HudiMetaTables.timeline(spark, dir)
      .orderBy("instant")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(tl.map(_._1).toSeq == Seq(i1, i2))
    assert(tl.head._2 == "deltacommit" && tl(1)._2 == "deltacommit")
    assert(tl.head._4 == 2L, s"bulk insert wrote 2 records, got ${tl.head}")
    assert(tl(1)._4 == 1L)

    val slices = HudiMetaTables.fileSlices(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(2), r.getInt(4)))
    assert(slices.length == 2, slices.toSeq)
    // the MOR upsert attached a log file to p=0's group, none to p=1
    assert(slices.count(_._3 == 1) == 1 && slices.count(_._3 == 0) == 1, slices.toSeq)

    // as-of the bulk insert: no log files anywhere
    val before = HudiMetaTables.fileSlices(spark, dir, Some(i1))
      .select(sum("n_log_files")).as[Long].head()
    assert(before == 0L)
  }
}
