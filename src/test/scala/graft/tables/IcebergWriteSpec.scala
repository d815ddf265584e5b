package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.hadoop.fs.Path

/** Native Iceberg append: create-then-extend with the Hadoop-catalog
  * commit protocol, snapshot history, time travel to the first
  * commit, refusal semantics, and the commit race (two concurrent
  * writers must BOTH land).
  */
class IcebergWriteSpec extends SparkSpec {
  import spark.implicits._

  test("append creates the table; second append extends it; time travel sees v1") {
    val dir = tempDir("icew").toString + "/t"
    val s1 = IcebergWrite.append(spark,
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "part"), dir, Seq("part"))
    val s2 = IcebergWrite.append(spark,
      Seq((3L, "c", 1)).toDF("id", "v", "part"), dir) // partitioning from spec
    assert(s1 == 1L && s2 == 2L)

    val t = new IcebergTable("t", dir)
    assert(t(spark, ReadArgs.empty).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)))
    // identity pruning still works on written tables
    val p1 = t(spark, ReadArgs.where(Filter("part", "=", 1)))
    assert(p1.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // first snapshot via time travel
    assert(t(spark, ReadArgs(extra = Map(t.SnapshotIdKey -> s1)))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("staged files land under data/ in Hive layout (qualified listings relativized)") {
    val dir = tempDir("icew-layout").toString + "/t"
    IcebergWrite.append(spark,
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "part"), dir, Seq("part"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergMeta.load(fs, dir)
    val files = IcebergMeta.planFiles(fs, meta.snapshots.maxBy(_.id)).map(_.path)
    assert(files.nonEmpty)
    files.foreach { p =>
      // fs.listFiles returns scheme-qualified paths; a raw stripPrefix
      // against the unqualified staging path would leak "file:/..." and
      // the staging dir name into the table layout
      assert(!p.contains("file:"), s"qualified path leaked into layout: $p")
      assert(!p.contains("_staging"), s"staging dir leaked into layout: $p")
      val rel = p.stripPrefix(new org.apache.hadoop.fs.Path(dir).toUri.getPath)
        .stripPrefix("/")
      assert(rel.matches("data/part=\\d+/[^/]+\\.parquet"), s"unexpected layout: $rel")
    }
    // staging dir cleaned up
    assert(!fs.listStatus(new Path(dir)).exists(_.getPath.getName.startsWith("_staging")))
  }

  test("deleteWhere writes position deletes the reader applies; time travel intact") {
    val dir = tempDir("icew-del").toString + "/t"
    val s1 = IcebergWrite.append(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1), (4L, "d", 1))
        .toDF("id", "v", "part"), dir, Seq("part"))
    val s2 = IcebergWrite.deleteWhere(spark, dir,
      graft.core.Filters.normalize(Seq(Filter("id", "in", Seq(2, 3)))))
    assert(s2 > s1)

    val t = new IcebergTable("t", dir)
    assert(t(spark, ReadArgs.empty).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L))
    // merge-on-read: NO data file rewritten — both partitions still
    // serve their original files, plus delete files in the plan
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergMeta.load(fs, dir)
    val files = IcebergMeta.planFiles(fs, meta.snapshots.maxBy(_.sequenceNumber))
    assert(files.count(_.content == 0) == files.filter(_.content == 0).map(_.path).distinct.size)
    assert(files.exists(_.content == 1), "expected a position delete file planned")
    // pre-delete snapshot still reads all rows
    assert(t(spark, ReadArgs(extra = Map(t.SnapshotIdKey -> s1)))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // a second delete composes; predicate touching partition col prunes
    IcebergWrite.deleteWhere(spark, dir,
      graft.core.Filters.normalize(Seq(Filter("part", "=", 1))))
    assert(t(spark, ReadArgs.empty).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // appended rows after a delete are untouched by it
    IcebergWrite.append(spark, Seq((5L, "e", 0)).toDF("id", "v", "part"), dir)
    assert(t(spark, ReadArgs.empty).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 5L))
    // no-match delete is a no-op (no new snapshot)
    val before = IcebergMeta.load(fs, dir).snapshots.size
    IcebergWrite.deleteWhere(spark, dir,
      graft.core.Filters.normalize(Seq(Filter("id", "=", 999))))
    assert(IcebergMeta.load(fs, dir).snapshots.size == before)
  }

  test("appends interleave with exported Delta history refusals and schema checks") {
    val delta = tempDir("icew-delta").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), delta)
    val e1 = intercept[IllegalArgumentException] {
      IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), delta)
    }
    assert(e1.getMessage.contains("Delta table"))

    val dir = tempDir("icew-schema").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val e2 = intercept[IllegalArgumentException] {
      IcebergWrite.append(spark, Seq((1, "a")).toDF("id", "v"), dir) // id: int, not long
    }
    assert(e2.getMessage.contains("schema mismatch"))
  }

  test("two racing appends both commit (put-if-absent + retry)") {
    val dir = tempDir("icew-race").toString + "/t"
    IcebergWrite.append(spark, Seq((0L, "seed")).toDF("id", "v"), dir)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        try IcebergWrite.append(spark,
          Seq((i.toLong * 10, s"w$i")).toDF("id", "v"), dir)
        catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"racing append failed: ${errors.peek()}")
    val got = new IcebergTable("t", dir)(spark, ReadArgs.empty)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(0L, 10L, 20L))
    // three snapshots, strictly increasing sequence numbers
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergMeta.load(fs, dir)
    assert(meta.snapshots.size == 3)
    assert(meta.snapshots.map(_.sequenceNumber).sorted == Seq(1L, 2L, 3L))
  }

  test("a UniForm-exported table stays Delta-owned: IcebergWrite refuses") {
    val dir = tempDir("icew-dv").toString + "/t"
    // single-writer-per-format invariant: the Delta log is the source
    // of truth for exported tables; an Iceberg-side append would fork
    // the two histories
    DeltaWrite.append(spark, (1L to 4L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    graft.export.IcebergUniform.export(spark, dir)
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.append(spark, Seq((9L, "x")).toDF("id", "v"), dir)
    }
    assert(e.getMessage.contains("Delta table"))
  }
}
