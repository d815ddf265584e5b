package graft.operators

import graft.SparkSpec
import graft.core.{Filter, Filters}
import graft.tables.{DeltaDdl, DeltaLog, DeltaWrite}
import org.apache.spark.sql.types._

/** Incremental view maintenance: after every kind of base mutation the
  * refreshed view must equal the from-scratch aggregate; refreshes are
  * idempotent; the watermark/contents pair is race-guarded by the
  * conditional overwrite.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("cat")
  private val sums = Seq(("v", "sum_v"))

  private def mkBase(tag: String): String = {
    val dir = tempDir(s"ivm-$tag").toString + "/base"
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(
        StructField("cat", StringType),
        StructField("id", LongType),
        StructField("v", LongType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark,
      Seq.tabulate(60)(i => (s"c${i % 3}", i.toLong, i.toLong * 10)).toDF("cat", "id", "v"),
      dir)
    dir
  }

  private def viewRows(path: String): Set[(String, Long, Long)] = {
    val t = new graft.tables.DeltaTable("v", path)
    t(spark).select("cat", "n_rows", "sum_v").as[(String, Long, Long)].collect().toSet
  }

  private def expected(basePath: String): Set[(String, Long, Long)] =
    IncrementalView.fullCompute(spark, basePath, keys, sums)
      .as[(String, Long, Long)].collect().toSet

  test("refresh tracks appends, deletes, updates and overwrites exactly") {
    val base = mkBase("track")
    val view = tempDir("ivm-track-v").toString + "/view"
    IncrementalView.initialize(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base))

    DeltaWrite.append(spark,
      Seq(("c0", 100L, 7L), ("c3", 101L, 9L)).toDF("cat", "id", "v"), base)
    IncrementalView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after append")

    DeltaWrite.deleteWhere(spark, base,
      Filters.normalize(Seq(Filter("cat", "=", "c1"))))
    IncrementalView.refresh(spark, base, view, keys, sums)
    val afterDelete = viewRows(view)
    assert(afterDelete == expected(base), "after delete")
    assert(!afterDelete.exists(_._1 == "c1"), "emptied key must leave the view")

    DeltaWrite.updateWhere(spark, base,
      Filters.normalize(Seq(Filter("cat", "=", "c2"))), Seq("v" -> "v + 1"))
    IncrementalView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after update")

    // two commits folded into ONE refresh
    DeltaWrite.append(spark, Seq(("c0", 200L, 1L)).toDF("cat", "id", "v"), base)
    DeltaWrite.deleteWhere(spark, base,
      Filters.normalize(Seq(Filter("id", "=", 100L))))
    IncrementalView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after batched commits")

    DeltaWrite.overwrite(spark,
      Seq(("z", 1L, 5L), ("z", 2L, 6L), ("c0", 3L, 4L)).toDF("cat", "id", "v"), base)
    IncrementalView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after overwrite")
    assert(viewRows(view).map(_._1) == Set("z", "c0"))
  }

  test("refresh is idempotent and the watermark tracks the base head") {
    val base = mkBase("idem")
    val view = tempDir("ivm-idem-v").toString + "/view"
    val v0 = IncrementalView.initialize(spark, base, view, keys, sums)
    assert(IncrementalView.watermark(spark, view).contains(v0))

    DeltaWrite.append(spark, Seq(("c0", 300L, 2L)).toDF("cat", "id", "v"), base)
    val v1 = IncrementalView.refresh(spark, base, view, keys, sums)
    assert(v1 == v0 + 1 && IncrementalView.watermark(spark, view).contains(v1))

    val viewVersion = DeltaLog.snapshot(spark, view, withFiles = false).version
    // nothing new: no-op, no commit
    assert(IncrementalView.refresh(spark, base, view, keys, sums) == v1)
    assert(DeltaLog.snapshot(spark, view, withFiles = false).version == viewVersion)
  }

  test("refreshMerge tracks every mutation kind exactly, in place") {
    val base = mkBase("mtrack")
    val view = tempDir("ivm-mtrack-v").toString + "/view"
    IncrementalView.initialize(spark, base, view, keys, sums)

    DeltaWrite.append(spark,
      Seq(("c0", 100L, 7L), ("c3", 101L, 9L)).toDF("cat", "id", "v"), base)
    IncrementalView.refreshMerge(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after append")

    DeltaWrite.deleteWhere(spark, base,
      Filters.normalize(Seq(Filter("cat", "=", "c1"))))
    IncrementalView.refreshMerge(spark, base, view, keys, sums)
    val afterDelete = viewRows(view)
    assert(afterDelete == expected(base), "after delete")
    assert(!afterDelete.exists(_._1 == "c1"),
      "emptied key must leave the view via the matched-delete clause")

    DeltaWrite.updateWhere(spark, base,
      Filters.normalize(Seq(Filter("cat", "=", "c2"))), Seq("v" -> "v + 1"))
    IncrementalView.refreshMerge(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after update")

    // the two refresh shapes interoperate on one view
    DeltaWrite.append(spark, Seq(("c9", 300L, 3L)).toDF("cat", "id", "v"), base)
    IncrementalView.refresh(spark, base, view, keys, sums)
    DeltaWrite.append(spark, Seq(("c9", 301L, 4L)).toDF("cat", "id", "v"), base)
    val w = IncrementalView.refreshMerge(spark, base, view, keys, sums)
    assert(viewRows(view) == expected(base), "after mixed refresh shapes")
    assert(IncrementalView.watermark(spark, view).contains(w))

    // idempotent when current
    assert(IncrementalView.refreshMerge(spark, base, view, keys, sums) == w)
  }

  test("refreshMerge drops a key created and fully deleted inside one span") {
    val base = mkBase("mzero")
    val view = tempDir("ivm-mzero-v").toString + "/view"
    IncrementalView.initialize(spark, base, view, keys, sums)

    DeltaWrite.append(spark, Seq(("zz", 500L, 1L)).toDF("cat", "id", "v"), base)
    DeltaWrite.deleteWhere(spark, base,
      Filters.normalize(Seq(Filter("cat", "=", "zz"))))
    IncrementalView.refreshMerge(spark, base, view, keys, sums)
    val rows = viewRows(view)
    assert(rows == expected(base))
    assert(!rows.exists(_._1 == "zz"),
      "a zero-net new key must not insert via the NOT MATCHED clause")
  }

  test("refreshMerge refuses null group keys in the change span") {
    val base = mkBase("mnull")
    val view = tempDir("ivm-mnull-v").toString + "/view"
    IncrementalView.initialize(spark, base, view, keys, sums)
    DeltaWrite.append(spark,
      Seq((Option.empty[String], 600L, 5L)).toDF("cat", "id", "v"), base)
    intercept[IllegalArgumentException] {
      IncrementalView.refreshMerge(spark, base, view, keys, sums)
    }
    // the overwrite shape handles the same span fine
    IncrementalView.refresh(spark, base, view, keys, sums)
    val t = new graft.tables.DeltaTable("v", view)
    assert(t(spark).where("cat IS NULL").count() == 1)
  }

  test("a refresh from a stale view read refuses instead of clobbering") {
    val base = mkBase("race")
    val view = tempDir("ivm-race-v").toString + "/view"
    IncrementalView.initialize(spark, base, view, keys, sums)
    val staleVersion = DeltaLog.snapshot(spark, view, withFiles = false).version

    DeltaWrite.append(spark, Seq(("c0", 400L, 3L)).toDF("cat", "id", "v"), base)
    IncrementalView.refresh(spark, base, view, keys, sums) // moves the view

    // a writer still holding the pre-refresh view version must refuse
    intercept[DeltaWrite.ConcurrentWriteException] {
      DeltaWrite.overwrite(spark, Seq(("c0", 1L, 1L)).toDF("cat", "n_rows", "sum_v")
        .select($"cat", $"n_rows".cast("long"), $"sum_v".cast("long")),
        view, txn = Some((IncrementalView.AppId, 999L)),
        requireBase = Some(staleVersion))
    }
    assert(viewRows(view) == expected(base), "view unharmed by the refused write")
  }
}
