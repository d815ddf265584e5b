package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IcebergMetaTablesSpec extends SparkSpec {
  import spark.implicits._

  test("snapshots/history/refs/files expose table state as DataFrames") {
    val root = tempDir("ice-meta-t").toString + "/t"
    val s1 = IcebergWrite.append(spark,
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "p"), root, Seq("p"))
    val s2 = IcebergWrite.append(spark,
      Seq((3L, "c", 0)).toDF("id", "v", "p"), root, Seq("p"))
    val b1 = IcebergWrite.appendToBranch(spark,
      Seq((4L, "d", 1)).toDF("id", "v", "p"), root, "side")
    IcebergWrite.deleteEquality(spark, root, Seq(1L).toDF("id"))

    val snaps = IcebergMetaTables.snapshots(spark, root)
      .orderBy("snapshot_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getString(4), r.getBoolean(6)))
    assert(snaps.length == 4)
    // main lineage: s1 → s2 → delete; the branch snapshot is off-line
    assert(snaps.map(_._1).toSeq == Seq(s1, s2, b1, b1 + 1))
    assert(snaps.find(_._1 == s2).get._2.contains(s1))
    assert(snaps.find(_._1 == b1).get._2.contains(s2)) // forked from head
    assert(snaps.find(_._1 == b1).get._4 == false, "branch snapshot on main lineage")
    assert(snaps.find(_._1 == b1 + 1).get._4 == true)
    assert(snaps.count(_._4) == 3)

    val hist = IcebergMetaTables.history(spark, root)
      .select("snapshot_id").as[Long].collect().toSeq
    assert(hist == Seq(s1, s2, b1 + 1), s"branch commits must not enter history: $hist")

    val refs = IcebergMetaTables.refs(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(refs == Set(("side", "branch", b1)))

    val files = IcebergMetaTables.files(spark, root)
    val byContent = files.groupBy("content").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byContent(0) == 3, s"3 data files (p=0 x2, p=1), got $byContent")
    assert(byContent(2) == 1, s"1 equality-delete file, got $byContent")
    assert(files.where(col("content") === 0)
      .select(sum("record_count")).as[Long].head() == 3L)
    val parts = files.where(col("content") === 0)
      .select(element_at(col("partition"), "p")).as[String].collect().toSet
    assert(parts == Set("0", "1"))

    // time travel: the files of the pre-delete snapshot carry no deletes
    val before = IcebergMetaTables.files(spark, root, Some(s2))
    assert(before.where(col("content") =!= 0).count() == 0)

    // readable per-column stats (the readable_metrics idea): bounds
    // decode by schema type and key by column NAME
    val p0 = files.where(col("content") === 0 &&
        element_at(col("partition"), "p") === "0" &&
        element_at(col("lower_bounds"), "id") === "1")
      .collect().head
    val lo = p0.getMap[String, String](p0.fieldIndex("lower_bounds"))
    val hi = p0.getMap[String, String](p0.fieldIndex("upper_bounds"))
    val nulls = p0.getMap[String, Long](p0.fieldIndex("null_value_counts"))
    assert(lo("id") == "1" && hi("id") == "1", (lo, hi))
    assert(lo("v") == "a" && hi("v") == "a")
    assert(nulls("id") == 0L && nulls("v") == 0L)
  }
}
