package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Typed changelog read (HudiTable.changes): per-commit key diffs of
  * touched file groups into insert/delete rows — COW rewrites, MOR
  * log upserts and tombstones, and maintenance commits contributing
  * nothing.
  */
class HudiChangesSpec extends SparkSpec {
  import spark.implicits._

  private def changed(dir: String, from: String, to: Option[String] = None) =
    new HudiTable("t", dir).changes(spark, from, to)
      .select(col("id").as[Long], col("v").as[String],
        col(HudiTable.ChangeTypeCol).as[String],
        col(HudiTable.ChangeOrdinalCol).as[Int])
      .collect().toSet

  test("COW: upsert emits pre-image deletes + post-image inserts; delete emits deletes") {
    val dir = tempDir("hudi-chg-cow").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    HudiWrite.upsert(spark, Seq((2L, "B", 0), (4L, "d", 1)).toDF("id", "v", "part"), dir)
    HudiWrite.delete(spark, Seq(Tuple1(1L)).toDF("id"), dir)
    assert(changed(dir, i1) == Set(
      (2L, "b", "delete", 1), (2L, "B", "insert", 1), (4L, "d", "insert", 1),
      (1L, "a", "delete", 2)))
  }

  test("a wide range PAGES with bounded plan width (whole-history DESCRIBE CHANGES shape)") {
    val dir = tempDir("hudi-chg-page").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((0L, "z", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    (1 to 20).foreach(i => HudiWrite.upsert(spark,
      Seq((i.toLong, s"v$i", 0)).toDF("id", "v", "part"), dir))
    val t = new HudiTable("t", dir)
    val paged = t.changes(spark, i1, None, pageCommits = 5)
    val leaves = paged.queryExecution.logical.collectLeaves()
    assert(leaves.size <= 4, s"expected <= ceil(20/5) leaves, got ${leaves.size}")
    assert(leaves.forall(_.getClass.getSimpleName.contains("LogicalRDD")),
      leaves.map(_.getClass.getSimpleName).distinct.mkString(","))
    val got = paged
      .select(col("id").as[Long], col(HudiTable.ChangeTypeCol).as[String])
      .collect().toSet
    assert(got == (1 to 20).map(i => (i.toLong, "insert")).toSet)
    // row parity with the unpaged read
    assert(got == t.changes(spark, i1)
      .select(col("id").as[Long], col(HudiTable.ChangeTypeCol).as[String])
      .collect().toSet)
  }

  test("additive evolution: frames union under the widest schema, old rows null-filled") {
    val dir = tempDir("hudi-chg-evo").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    // NEW keys carrying a NEW column open fresh file groups under the
    // wider schema — the reachable additive-evolution shape; a later
    // delete touches only an OLD-schema group, so the range's frames
    // genuinely differ in columns (pre-r12 this union threw)
    HudiWrite.upsert(spark, Seq((3L, "c", 7L, 0)).toDF("id", "v", "w", "part"), dir)
    HudiWrite.delete(spark, Seq(Tuple1(1L)).toDF("id"), dir)
    val got = new HudiTable("t", dir).changes(spark, i1)
      .select("id", "v", "w", HudiTable.ChangeTypeCol)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)), r.getString(3)))
      .toSet
    assert(got == Set(
      (3L, "c", Some(7L), "insert"),
      (1L, "a", None, "delete")), got)
  }

  test("MOR: log upserts and tombstones; compaction contributes nothing") {
    val dir = tempDir("hudi-chg-mor").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "v", "part"),
      dir, "id", Seq("part"), tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((2L, "B", 0), (3L, "c", 0)).toDF("id", "v", "part"), dir)
    HudiWrite.delete(spark, Seq(Tuple1(1L)).toDF("id"), dir)
    val preCompact = changed(dir, i1)
    assert(preCompact == Set(
      (2L, "b", "delete", 1), (2L, "B", "insert", 1), (3L, "c", "insert", 1),
      (1L, "a", "delete", 2)))
    // compaction rewrites files but preserves keys and commit times —
    // the changelog across it must not change
    assert(HudiWrite.compact(spark, dir).nonEmpty)
    assert(changed(dir, i1) == preCompact)
  }

  test("full history from the epoch includes the bulk insert; empty range is empty") {
    val dir = tempDir("hudi-chg-full").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    assert(changed(dir, "") == Set((1L, "a", "insert", 1)))
    val empty = new HudiTable("t", dir).changes(spark, i1)
    assert(empty.count() == 0)
    assert(empty.columns.contains(HudiTable.ChangeTypeCol))
  }

  test("REPLAY INVARIANT: initial state + inserts − deletes == final state (randomized MOR ops)") {
    for (seed <- Seq(7, 23, 59)) {
      val rnd = new scala.util.Random(seed)
      val dir = tempDir(s"hudi-chg-prop$seed").toString + "/t"
      def batch(n: Int): Seq[(Long, String, Int)] =
        Seq.fill(n)((rnd.nextInt(20).toLong, s"v${rnd.nextInt(1000)}"))
          .groupBy(_._1).map(_._2.head).toSeq // hudi record keys unique per batch
          // partition derives from the KEY: partition paths are
          // stable per key (partition-changing upserts refuse)
          .map { case (id, v) => (id, v, (id % 2).toInt) }
      val i1 = HudiWrite.bulkInsert(spark, batch(8).toDF("id", "v", "part"),
        dir, "id", Seq("part"), tableType = "MERGE_ON_READ")
      (1 to 6).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => HudiWrite.upsert(spark, batch(4).toDF("id", "v", "part"), dir)
          case 1 => HudiWrite.delete(spark,
            batch(3).map(_._1).distinct.toDF("id"), dir)
          case _ => HudiWrite.compact(spark, dir); ()
        }
      }
      val t = new HudiTable("t", dir)
      def multiset(rows: Seq[(Long, String)]): Map[(Long, String), Int] =
        rows.groupBy(identity).view.mapValues(_.size).toMap
      val initial = t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i1)))
        .select(col("id").as[Long], col("v").as[String]).collect().toSeq
      val fin = t(spark, ReadArgs.empty)
        .select(col("id").as[Long], col("v").as[String]).collect().toSeq
      val chg = t.changes(spark, i1)
        .select(col("id").as[Long], col("v").as[String],
          col(HudiTable.ChangeTypeCol).as[String]).collect().toSeq
      val inserts = chg.collect { case (i, v, "insert") => (i, v) }
      val deletes = chg.collect { case (i, v, "delete") => (i, v) }
      val replayed = (multiset(initial ++ inserts).toSeq ++
        multiset(deletes).toSeq.map { case (k, n) => k -> -n })
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0).toMap
      assert(replayed == multiset(fin),
        s"seed $seed: replay diverged\nreplayed=$replayed\nfinal=${multiset(fin)}")
    }
  }

  test("partition-changing upserts refuse loudly (COW and MOR)") {
    // routing is by key: moving a key's partition would duplicate it
    // (old group's base stays live under its original path) — refused
    for (tt <- Seq("COPY_ON_WRITE", "MERGE_ON_READ")) {
      val dir = tempDir(s"hudi-chg-move-$tt").toString + "/t"
      HudiWrite.bulkInsert(spark,
        Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "part"),
        dir, "id", Seq("part"), tableType = tt)
      val e = intercept[UnsupportedOperationException] {
        HudiWrite.upsert(spark, Seq((2L, "B", 0)).toDF("id", "v", "part"), dir)
      }
      assert(e.getMessage.contains("partition path") &&
        e.getMessage.contains("'2'"), e.getMessage)
      // same-partition updates still work
      HudiWrite.upsert(spark, Seq((2L, "B2", 1)).toDF("id", "v", "part"), dir)
      val got = new HudiTable("t", dir)(spark, ReadArgs.empty)
        .select(col("id").as[Long], col("v").as[String]).collect().toSet
      assert(got == Set((1L, "a"), (2L, "B2")))
    }
  }

  test("pending-instant fence: a lower pending marker fences completed instants out") {
    val dir = tempDir("hudi-chg-fence").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(HudiWrite.fencedTimeline(fs, dir)._1.contains(i1))

    // a pending marker BELOW the completed instant fences everything:
    // None must mean "nothing safely consumable", never "unfenced"
    val low = new org.apache.hadoop.fs.Path(dir, ".hoodie/00000000000000001.commit.requested")
    fs.create(low, true).close()
    val (fenceLow, listLow) = HudiWrite.fencedTimeline(fs, dir)
    assert(fenceLow.isEmpty && listLow.isEmpty)
    intercept[IllegalArgumentException] {
      new HudiFeed(dir).head(spark)
    }
    fs.delete(low, false)

    // a pending marker ABOVE it fences only the future
    val high = new org.apache.hadoop.fs.Path(dir, ".hoodie/99999999999999999.deltacommit.inflight")
    fs.create(high, true).close()
    val (fenceHigh, listHigh) = HudiWrite.fencedTimeline(fs, dir)
    assert(fenceHigh.contains(i1) && listHigh.map(_._1) == Seq(i1))
  }

  test("changelog columns: instant and timestamp ride every row") {
    val dir = tempDir("hudi-chg-cols").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    val i2 = HudiWrite.upsert(spark, Seq((1L, "A", 0)).toDF("id", "v", "part"), dir)
    val rows = new HudiTable("t", dir).changes(spark, "", Some(i2))
    assert(rows.where(col(HudiTable.CommitInstantCol) === i2).count() == 2)
    assert(rows.where(col(HudiTable.CommitTimestampCol).isNull).count() == 0)
  }
}
