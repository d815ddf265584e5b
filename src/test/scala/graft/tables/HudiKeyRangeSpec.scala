package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Per-file-group record-key ranges in the commit metadata (the
  * bloom-index shape without a metadata table): narrow-key upserts
  * and deletes prune file groups by [min,max] BEFORE the key-index
  * scan, so untouched groups' base files are never opened.
  */
class HudiKeyRangeSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("commit stats carry key ranges; latestSlices unions them over MOR logs") {
    val dir = tempDir("hudi-kr").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq(("a01", 1), ("a05", 2)).toDF("k", "v").repartition(1), dir, "k",
      tableType = "MERGE_ON_READ")
    val fs = fsOf(dir)
    val s1 = HudiWrite.latestSlices(fs, dir, None)
    assert(s1.size == 1)
    assert(s1.head.keyRange.contains(("a01", "a05")), s1.head.keyRange)
    // log-borne update (a05, in range) + insert (a09, new group):
    // the logged group's union stays (a01,a05); the fresh group
    // carries its own range
    HudiWrite.upsert(spark, Seq(("a05", 9), ("a09", 9)).toDF("k", "v"), dir)
    val s2 = HudiWrite.latestSlices(fs, dir, None)
    val logged = s2.find(_.logFiles.nonEmpty).get
    assert(logged.keyRange.contains(("a01", "a05")), logged.keyRange)
    val fresh = s2.find(_.logFiles.isEmpty).get
    assert(fresh.keyRange.contains(("a09", "a09")), fresh.keyRange)
  }

  test("unionRange and rangePruned semantics") {
    import HudiWrite._
    assert(unionRange(Some(("a", "c")), Some(("b", "f"))) == Some(("a", "f")))
    assert(unionRange(Some(("a", "c")), None).isEmpty)
    assert(unionRange(None, Some(("a", "c"))).isEmpty)
    val slices = Seq(
      FileSlice("", "g1", "1", "p1", keyRange = Some(("a00", "a99"))),
      FileSlice("", "g2", "1", "p2", keyRange = Some(("b00", "b99"))),
      FileSlice("", "g3", "1", "p3", keyRange = None))
    // rangeless slices always survive (foreign commits can't prune)
    assert(rangePruned(slices, "a10", "a20").map(_.fileId) == Seq("g1", "g3"))
    assert(rangePruned(slices, "b99", "c50").map(_.fileId) == Seq("g2", "g3"))
    assert(rangePruned(slices, "c00", "c50").map(_.fileId) == Seq("g3"))
  }

  test("narrow-key upsert and delete NEVER open out-of-range groups' base files") {
    val dir = tempDir("hudi-kr-prune").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq(("a01", "x", 0), ("a05", "y", 0), ("b01", "z", 1), ("b05", "w", 1))
        .toDF("k", "v", "part").repartition(col("part")),
      dir, "k", Seq("part"))
    val fs = fsOf(dir)
    // destroy part=1's base file: if any scan touches it, the job fails
    val bFile = {
      val it = fs.listFiles(new Path(dir, "part=1"), true)
      var p: Path = null
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) p = f.getPath }
      p
    }
    assert(bFile != null)
    fs.delete(bFile, false)

    // a-narrow upsert: the b-group's range (b01..b05) cannot hold any
    // incoming key, so its (now missing) base file is never read
    val i2 = HudiWrite.upsert(spark, Seq(("a05", "Y2", 0)).toDF("k", "v", "part"), dir)
    val t = new HudiTable("t", dir)
    assert(t.incremental(spark, i1, Some(i2)).select("k", "v")
      .as[(String, String)].collect().toSeq == Seq(("a05", "Y2")))

    // same for delete
    HudiWrite.delete(spark, Seq("a01").toDF("k"), dir)
    val remaining = t(spark, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(graft.core.Filter("part", "=", 0)))))
    assert(remaining.select("k", "v").as[(String, String)].collect().sortBy(_._1).toSeq ==
      Seq(("a05", "Y2")))
  }
}
