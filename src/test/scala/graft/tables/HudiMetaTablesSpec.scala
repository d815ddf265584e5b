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

  test("colStats renders the planner's per-group ranges, typed-decoded") {
    val dir = tempDir("hudi-meta-cs").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      (1 to 20).map(i => (f"k$i%03d", i, i.toDouble / 2)).toDF("k", "v", "d")
        .repartitionByRange(2, col("v")),
      dir, "k", tableType = "MERGE_ON_READ")
    def statsOf(col_ : String) = HudiMetaTables.colStats(spark, dir)
      .where(col("column") === col_)
      .select("file_id", "is_numeric", "min", "max")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2), r.getString(3)))

    // 2 range-partitioned groups: v splits at 10/11, numeric order
    val v0 = statsOf("v").sortBy(_._3.toInt)
    assert(v0.length == 2 && v0.forall(_._2))
    assert(v0.head._3 == "1" && v0.head._4 == "10" &&
      v0(1)._3 == "11" && v0(1)._4 == "20", v0.toSeq)
    // the record-key range rides under the hudi key column, code-point order
    val keys = statsOf(HudiWrite.RecordKeyCol)
    assert(keys.length == 2 && keys.forall(!_._2))
    assert(keys.map(_._3).sorted.toSeq == Seq("k001", "k011"))

    // a MOR log upsert widens its group's union range; the other
    // group's rows are untouched
    HudiWrite.upsert(spark, Seq(("k003", 500, 9.9)).toDF("k", "v", "d"), dir)
    val v1 = statsOf("v").sortBy(_._3.toInt)
    assert(v1.exists(r => r._3 == "1" && r._4 == "500"), v1.toSeq)
    assert(v1.exists(r => r._3 == "11" && r._4 == "20"), v1.toSeq)

    // as-of the bulk insert: the pre-upsert ranges
    assert(HudiMetaTables.colStats(spark, dir, Some(i1))
      .where(col("column") === "v").select("max")
      .as[String].collect().map(_.toInt).max == 20)

    // the SQL front door serves the same frame
    val viaSql = LakehouseSql.exec(spark, s"DESCRIBE STATS hudi.`$dir`")
    assert(viaSql.columns.toSeq == Seq(
      "partition", "file_id", "base_instant", "column", "is_numeric", "min", "max"))
    assert(viaSql.count() == HudiMetaTables.colStats(spark, dir).count())
  }
}
