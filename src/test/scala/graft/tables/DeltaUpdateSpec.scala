package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.spark.sql.functions._

/** UPDATE ... SET: copy-on-write rewrite with SQL assignment
  * expressions over the pre-update row, stats-pruned to the files
  * that may hold matching rows.
  */
class DeltaUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def t(dir: String) = new DeltaTable("t", dir)
  private def where(f: Filter*) = Filters.normalize(f)

  test("updates exactly the TRUE-predicate rows; null predicates leave rows alone") {
    val dir = tempDir("delta-upd").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, Some(5L), "a"), (2L, None, "b"), (3L, Some(20L), "c"))
        .toDF("id", "qty", "v"), dir)
    DeltaWrite.updateWhere(spark, dir,
      where(Filter("qty", "<", 10L)), Seq("v" -> "'small'"))
    val got = t(dir)(spark, ReadArgs()).select("id", "v")
      .as[(Long, String)].collect().toMap
    // qty IS NULL -> predicate NULL -> untouched (SQL UPDATE semantics)
    assert(got == Map(1L -> "small", 2L -> "b", 3L -> "c"))
  }

  test("all SET expressions see the OLD row (swap two columns)") {
    val dir = tempDir("delta-upd-swap").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, 10L, 20L)).toDF("id", "a", "b"), dir)
    DeltaWrite.updateWhere(spark, dir, where(Filter("id", "=", 1L)),
      Seq("a" -> "b", "b" -> "a"))
    val r = t(dir)(spark, ReadArgs()).select("a", "b").as[(Long, Long)].head()
    assert(r == ((20L, 10L)))
  }

  test("stats pruning: files that cannot match are not rewritten") {
    val dir = tempDir("delta-upd-prune").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "lo")).toDF("id", "v"), dir)
    DeltaWrite.append(spark, Seq((100L, "hi")).toDF("id", "v"), dir)
    val res = DeltaWrite.updateWhere(spark, dir,
      where(Filter("id", ">", 50L)), Seq("v" -> "'HI'"))
    assert(res.filesRemoved == 1) // only the hi file rewritten
    val got = t(dir)(spark, ReadArgs()).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "lo", 100L -> "HI"))
  }

  test("CDF tables record update_preimage/update_postimage rows") {
    val dir = tempDir("delta-upd-cdf").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "old"), (2L, "keep")).toDF("id", "v"), dir)
    DeltaWrite.setTableProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    val res = DeltaWrite.updateWhere(spark, dir,
      where(Filter("id", "=", 1L)), Seq("v" -> "'new'"))
    val changes = DeltaChanges.between(spark, dir, res.version, res.version)
      .select("id", "v", DeltaChanges.ChangeTypeCol)
      .as[(Long, String, String)].collect().toSet
    assert(changes == Set(
      (1L, "old", "update_preimage"), (1L, "new", "update_postimage")))
  }

  test("an update violating a CHECK constraint refuses and commits nothing") {
    val dir = tempDir("delta-upd-ck").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, 5L)).toDF("id", "qty"), dir)
    DeltaDdl.addCheckConstraint(spark, dir, "qty_pos", "qty > 0")
    val before = DeltaLog.snapshot(spark, dir).version
    intercept[IllegalArgumentException] {
      DeltaWrite.updateWhere(spark, dir,
        where(Filter("id", "=", 1L)), Seq("qty" -> "-1"))
    }
    assert(DeltaLog.snapshot(spark, dir).version == before)
    assert(t(dir)(spark, ReadArgs()).select("qty").as[Long].head() == 5L)
  }

  test("row-tracked UPDATE keeps ids; updated rows get the new commit version") {
    val dir = tempDir("delta-upd-rt").toString + "/t"
    DeltaWrite.append(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir)
    DeltaWrite.setTableProperties(spark, dir, Map("delta.enableRowTracking" -> "true"))
    DeltaWrite.append(spark, (0L to 4L).map(i => (i, "x")).toDF("id", "v"), dir)
    def ids() = t(dir)(spark, ReadArgs(extra = Map(t(dir).RowIdsKey -> true)))
      .select("id", "_row_id", "_row_commit_version")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val before = ids()
    val res = DeltaWrite.updateWhere(spark, dir,
      where(Filter("id", "=", 2L)), Seq("v" -> "'upd'"))
    val after = ids()
    Seq(0L, 1L, 3L, 4L).foreach(i => assert(after(i) == before(i)))
    assert(after(2L)._1 == before(2L)._1)           // same row id
    assert(after(2L)._2.contains(res.version))      // new commit version
  }

  test("updating a partition column moves rows to the right partition dir") {
    val dir = tempDir("delta-upd-part").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "part"), dir, partitionBy = Seq("part"))
    DeltaWrite.updateWhere(spark, dir,
      where(Filter("id", "=", 1L)), Seq("part" -> "'b'"))
    val got = t(dir)(spark, ReadArgs.where(Filter("part", "=", "b")))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
    assert(t(dir)(spark, ReadArgs.where(Filter("part", "=", "a"))).count() == 0)
  }

  test("cleanupLog deletes only expired commits at or below the newest checkpoint") {
    val dir = tempDir("delta-cleanup").toString + "/t"
    (0 until 4).foreach(i =>
      DeltaWrite.append(spark, Seq((i.toLong, s"v$i")).toDF("id", "v"), dir))
    // no checkpoint yet -> nothing is cleanable regardless of age
    assert(DeltaWrite.cleanupLog(spark, dir, retentionMs = 0L) == 0)

    DeltaWrite.checkpoint(spark, dir) // at version 3
    DeltaWrite.append(spark, Seq((9L, "post")).toDF("id", "v"), dir) // version 4
    // inside the retention window nothing goes either
    assert(DeltaWrite.cleanupLog(spark, dir) == 0)

    val n = DeltaWrite.cleanupLog(spark, dir, retentionMs = 0L)
    assert(n == 4) // commits 0-3; the checkpoint and commit 4 stay
    // current reads replay checkpoint + post-checkpoint commit
    val got = t(dir)(spark, ReadArgs()).select("id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L, 3L, 9L))
    // time travel into the cleaned prefix refuses loudly, not wrongly
    intercept[Exception] {
      t(dir)(spark, ReadArgs(extra = Map(t(dir).VersionKey -> 1L))).count()
    }
    // a later checkpoint supersedes the old one, which then expires;
    // the NEWEST commit always survives (ICT monotonicity anchor)
    DeltaWrite.checkpoint(spark, dir)
    val n2 = DeltaWrite.cleanupLog(spark, dir, retentionMs = 0L)
    assert(n2 == 1) // only the version-3 checkpoint file
    assert(new java.io.File(dir + "/_delta_log", f"${4L}%020d.json").exists)
    assert(t(dir)(spark, ReadArgs()).count() == 5)
  }

  test("cleanupLog reclaims the sidecars of a superseded v2 checkpoint") {
    val dir = tempDir("delta-cleanup-v2").toString + "/t"
    DeltaWrite.append(spark, Seq((0L, "a")).toDF("id", "v"), dir)
    DeltaWrite.checkpointV2(spark, dir)
    val sidecarDir = new java.io.File(dir + "/_delta_log/_sidecars")
    val before = sidecarDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before > 0)
    DeltaWrite.append(spark, Seq((1L, "b")).toDF("id", "v"), dir)
    DeltaWrite.checkpointV2(spark, dir) // supersedes the first
    val n = DeltaWrite.cleanupLog(spark, dir, retentionMs = 0L)
    assert(n > 0)
    val after = sidecarDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before + 2, "superseded sidecars were not reclaimed")
    // the surviving checkpoint still replays
    assert(t(dir)(spark, ReadArgs()).count() == 2)
  }

  test("snapshot-derived rewrites never lose concurrent appends (refuse or serialize)") {
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.util.Try
    val dir = tempDir("delta-conc").toString + "/t"
    (0 until 3).foreach(i =>
      DeltaWrite.append(spark, Seq((i.toLong, "seed")).toDF("id", "v"), dir))
    val expected = scala.collection.mutable.Set(0L, 1L, 2L)
    (0 until 4).foreach { round =>
      val newId = 100L + round
      val opt = Future(Try(DeltaWrite.optimize(spark, dir, smallFileBytes = 1L << 20)))
      val app = Future(DeltaWrite.append(spark, Seq((newId, "race")).toDF("id", "v"), dir))
      Await.result(app, 120.seconds)
      val optRes = Await.result(opt, 120.seconds)
      expected += newId
      // optimize either committed against an unmoved table or refused
      // with ConcurrentWriteException — both leave every row intact
      optRes.failed.foreach(e => assert(e.isInstanceOf[DeltaWrite.ConcurrentWriteException], e))
      val got = t(dir)(spark, ReadArgs()).select("id").as[Long].collect().toSet
      assert(got == expected.toSet, s"round $round lost rows")
    }
  }
}
