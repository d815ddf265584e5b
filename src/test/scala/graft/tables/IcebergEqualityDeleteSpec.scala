package graft.tables

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Native Iceberg EQUALITY-DELETE writes (v2 content=2 manifests with
  * equality_ids): scan-free deletes that graft's own reader — and the
  * sequence-gating rules any v2 reader implements — apply correctly.
  */
class IcebergEqualityDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def meta(root: String) = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    IcebergMeta.load(fs, root)
  }

  test("equality delete removes matching rows; time travel still sees them") {
    val root = tempDir("ice-eqdel").toString + "/t"
    val df = Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1), (4L, "d", 1))
      .toDF("id", "v", "part")
    val snap1 = IcebergWrite.append(spark, df, root, Seq("part"))
    val snap2 = IcebergWrite.deleteEquality(spark, root, Seq(2L, 3L).toDF("id"))
    assert(snap2 != snap1)

    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 4L))
    // the pre-delete snapshot is intact
    assert(t(spark, ReadArgs(extra = Map(t.SnapshotIdKey -> snap1)))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))

    // metadata shape: content=2 entries with the id field's equality
    // id, under an UNPARTITIONED spec appended WITHOUT moving default
    val m = meta(root)
    assert(m.specs.size == 2, m.specs)
    assert(m.specs(m.defaultSpecId).nonEmpty, "default spec must stay the partitioned one")
    assert(m.specs.values.exists(_.isEmpty), "an unpartitioned spec carries the global deletes")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = m.snapshots.find(_.id == snap2).get
    val eqFiles = IcebergMeta.planFiles(fs, snap).filter(_.content == 2)
    assert(eqFiles.nonEmpty)
    val idFieldId = m.schemaFieldIds.find(_._2 == "id").get._1
    assert(eqFiles.forall(_.equalityIds == Seq(idFieldId)), eqFiles.map(_.equalityIds))
  }

  test("sequence gating: rows appended AFTER the delete keep their key") {
    val root = tempDir("ice-eqdel-seq").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "old"), (2L, "keep")).toDF("id", "v"), root)
    IcebergWrite.deleteEquality(spark, root, Seq(1L).toDF("id"))
    // re-insert id 1 at a LATER sequence number: the delete must not
    // touch it (delete seq < data seq)
    IcebergWrite.append(spark, Seq((1L, "new")).toDF("id", "v"), root)
    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "new"), (2L, "keep")))
  }

  test("multi-column equality keys and repeated deletes") {
    val root = tempDir("ice-eqdel-multi").toString + "/t"
    IcebergWrite.append(spark,
      Seq((1L, "x", 10), (1L, "y", 20), (2L, "x", 30)).toDF("id", "v", "n"), root)
    IcebergWrite.deleteEquality(spark, root, Seq((1L, "x")).toDF("id", "v"))
    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs.empty).select("n").as[Int].collect().sorted.toSeq ==
      Seq(20, 30))
    // second equality delete reuses the existing unpartitioned spec
    IcebergWrite.deleteEquality(spark, root, Seq((2L, "x")).toDF("id", "v"))
    assert(t(spark, ReadArgs.empty).select("n").as[Int].collect().toSeq == Seq(20))
    val m = meta(root)
    assert(m.specs.values.count(_.isEmpty) == 1, m.specs)
  }

  test("atomic equality upsert: one snapshot carries deletes + inserts; latest-per-key") {
    val root = tempDir("ice-equp").toString + "/t"
    val snap1 = IcebergWrite.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val snap2 = IcebergWrite.upsertEquality(spark,
      Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), root, Seq("id"))

    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B2"), (3L, "c")))
    // exactly ONE new snapshot (delete + insert are atomic), and the
    // pre-upsert snapshot still serves the old values
    assert(meta(root).snapshots.map(_.id).sorted == Seq(snap1, snap2))
    assert(t(spark, ReadArgs(extra = Map(t.SnapshotIdKey -> snap1)))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // chained upserts converge to latest-per-key
    IcebergWrite.upsertEquality(spark, Seq((2L, "B3")).toDF("id", "v"), root, Seq("id"))
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B3"), (3L, "c")))

    // the incremental reader must refuse an upsert range (it is not
    // append-only)
    intercept[IllegalArgumentException] {
      t.incremental(spark, snap1, snap2).collect()
    }

    // creating commit on an absent table is a plain append
    val fresh = tempDir("ice-equp-fresh").toString + "/t"
    IcebergWrite.upsertEquality(spark, Seq((1L, "x")).toDF("id", "v"), fresh, Seq("id"))
    assert(new IcebergTable("t", fresh)(spark, ReadArgs.empty).count() == 1)
  }

  test("unknown key column and empty key frame refuse / no-op cleanly") {
    val root = tempDir("ice-eqdel-edge").toString + "/t"
    val snap1 = IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    intercept[IllegalArgumentException] {
      IcebergWrite.deleteEquality(spark, root, Seq(1L).toDF("nope"))
    }
    val same = IcebergWrite.deleteEquality(spark, root, Seq.empty[Long].toDF("id"))
    assert(same == snap1, "empty delete must not commit a snapshot")
  }
}
