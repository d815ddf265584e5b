package graft.operators

import graft.SparkSpec
import graft.core.{Filter, Filters}
import graft.tables.{DeltaDdl, DeltaLog, DeltaTable, DeltaWrite, HudiWrite, IcebergTable, IcebergWrite, ReadArgs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Cross-format CDC replication: every source-format leg feeding
  * every different target format, the net-per-key fold, the
  * atomic/idempotent watermark story, and the loud refusals.
  */
class ReplicateSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, off: Int = 0) =
    Seq.tabulate(n)(i => ((i + off).toLong, s"name${i + off}", (i + off).toLong * 10))
      .toDF("id", "name", "v")

  private def mkDeltaSource(tag: String, n: Int = 20): String = {
    val dir = tempDir(s"repl-$tag").toString + "/src"
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("v", LongType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, rows(n), dir)
    dir
  }

  private def readTarget(path: String): Set[(Long, String, Long)] = {
    val fmt = graft.tables.ChangeFeed.detectFormat(spark, path).get
    val df: DataFrame = fmt match {
      case "delta"   => new DeltaTable("t", path)(spark)
      case "iceberg" => new IcebergTable("t", path)(spark, ReadArgs.empty)
      case "hudi"    => new graft.tables.HudiTable("t", path)(spark, ReadArgs.empty)
    }
    df.select("id", "name", "v").as[(Long, String, Long)].collect().toSet
  }

  private def readSource(path: String): Set[(Long, String, Long)] = {
    val feed = graft.tables.ChangeFeed.forPath(spark, path)
    feed.snapshotAt(spark, feed.head(spark))
      .select("id", "name", "v").as[(Long, String, Long)].collect().toSet
  }

  test("Delta CDF source replicates into an Iceberg target (one fold per churned key)") {
    val src = mkDeltaSource("d2i")
    val tgt = tempDir("repl-d2i-t").toString + "/replica"
    val v0 = Replicate.initialize(spark, src, tgt, Seq("id"), "iceberg")
    assert(readTarget(tgt) == readSource(src))
    assert(Replicate.watermark(spark, tgt).contains(v0))

    // churn: update a key twice across commits, insert, delete
    DeltaWrite.merge(spark, src,
      Seq((3L, "first", 1L)).toDF("id", "name", "v"), Seq("id"))
    DeltaWrite.merge(spark, src,
      Seq((3L, "final", 2L), (100L, "new", 5L)).toDF("id", "name", "v"), Seq("id"))
    DeltaWrite.deleteWhere(spark, src,
      Filters.normalize(Seq(Filter("id", "in", Seq(5, 6)))))

    val v1 = Replicate.sync(spark, src, tgt, Seq("id"))
    assert(v1 > v0)
    assert(readTarget(tgt) == readSource(src))
    assert(readTarget(tgt).exists(r => r._1 == 3L && r._2 == "final"))
    assert(!readTarget(tgt).exists(r => r._1 == 5L || r._1 == 6L))
    // already current → no-op, watermark unchanged
    assert(Replicate.sync(spark, src, tgt, Seq("id")) == v1)
  }

  test("a key inserted and deleted inside the range never lands") {
    val src = mkDeltaSource("net")
    val tgt = tempDir("repl-net-t").toString + "/replica"
    Replicate.initialize(spark, src, tgt, Seq("id"), "iceberg")
    DeltaWrite.append(spark, Seq((500L, "ghost", 1L)).toDF("id", "name", "v"), src)
    DeltaWrite.deleteWhere(spark, src,
      Filters.normalize(Seq(Filter("id", "=", 500))))
    Replicate.sync(spark, src, tgt, Seq("id"))
    assert(readTarget(tgt) == readSource(src))
    assert(!readTarget(tgt).exists(_._1 == 500L))
  }

  test("a key-changing UPDATE deletes the old key and inserts the new one") {
    val src = mkDeltaSource("keymove")
    val tgt = tempDir("repl-keymove-t").toString + "/replica"
    Replicate.initialize(spark, src, tgt, Seq("id"), "delta")
    DeltaWrite.updateWhere(spark, src,
      Filters.normalize(Seq(Filter("id", "=", 7))),
      Seq("id" -> "id + 1000"))
    Replicate.sync(spark, src, tgt, Seq("id"))
    val t = readTarget(tgt)
    assert(t == readSource(src))
    assert(!t.exists(_._1 == 7L) && t.exists(_._1 == 1007L))
  }

  test("Delta target applies upserts AND deletes in ONE atomic commit") {
    val src = mkDeltaSource("atomic")
    val tgt = tempDir("repl-atomic-t").toString + "/replica"
    Replicate.initialize(spark, src, tgt, Seq("id"), "delta")
    val vBefore = DeltaLog.snapshot(spark, tgt, withFiles = false).version
    DeltaWrite.merge(spark, src,
      Seq((1L, "upd", 9L), (200L, "ins", 9L)).toDF("id", "name", "v"), Seq("id"))
    DeltaWrite.deleteWhere(spark, src, Filters.normalize(Seq(Filter("id", "=", 2))))
    Replicate.sync(spark, src, tgt, Seq("id"))
    val vAfter = DeltaLog.snapshot(spark, tgt, withFiles = false).version
    assert(vAfter == vBefore + 1, "upserts + deletes + watermark ride one commit")
    assert(readTarget(tgt) == readSource(src))
  }

  test("Iceberg equality-upsert source replicates into a Hudi target") {
    val src = tempDir("repl-i2h").toString + "/src"
    val tgt = tempDir("repl-i2h-t").toString + "/replica"
    IcebergWrite.append(spark, rows(15), src)
    Replicate.initialize(spark, src, tgt, Seq("id"), "hudi")
    assert(readTarget(tgt) == readSource(src))

    IcebergWrite.upsertEquality(spark,
      Seq((4L, "upd4", 99L), (300L, "new", 1L)).toDF("id", "name", "v"),
      src, Seq("id"))
    IcebergWrite.deleteEquality(spark, src, Seq(Tuple1(9L)).toDF("id"))
    Replicate.sync(spark, src, tgt, Seq("id"))
    assert(readTarget(tgt) == readSource(src))
    assert(readTarget(tgt).exists(r => r._1 == 4L && r._2 == "upd4"))
    assert(!readTarget(tgt).exists(_._1 == 9L))
  }

  test("Hudi MOR source (log upserts + tombstones) replicates into a Delta target") {
    val src = tempDir("repl-h2d").toString + "/src"
    val tgt = tempDir("repl-h2d-t").toString + "/replica"
    HudiWrite.bulkInsert(spark, rows(15), src, "id", tableType = "MERGE_ON_READ")
    Replicate.initialize(spark, src, tgt, Seq("id"), "delta")
    assert(readTarget(tgt) == readSource(src))

    HudiWrite.upsert(spark,
      Seq((2L, "logged", 77L), (400L, "fresh", 3L)).toDF("id", "name", "v"), src)
    HudiWrite.delete(spark, Seq(Tuple1(11L)).toDF("id"), src)
    Replicate.sync(spark, src, tgt, Seq("id"))
    assert(readTarget(tgt) == readSource(src))
    assert(readTarget(tgt).exists(r => r._1 == 2L && r._2 == "logged"))
    assert(!readTarget(tgt).exists(_._1 == 11L))
  }

  test("a crash between the Iceberg delete and upsert commits replays idempotently") {
    val src = mkDeltaSource("crash")
    val tgt = tempDir("repl-crash-t").toString + "/replica"
    Replicate.initialize(spark, src, tgt, Seq("id"), "iceberg")
    DeltaWrite.merge(spark, src,
      Seq((1L, "upd", 42L)).toDF("id", "name", "v"), Seq("id"))
    DeltaWrite.deleteWhere(spark, src, Filters.normalize(Seq(Filter("id", "=", 8))))
    // simulate the first half of the two-commit apply landing WITHOUT
    // the watermark (crash before the upsert commit)
    IcebergWrite.deleteEquality(spark, tgt, Seq(Tuple1(8L)).toDF("id"))
    // replay: the full batch re-applies (delete of 8 again = no-op)
    Replicate.sync(spark, src, tgt, Seq("id"))
    assert(readTarget(tgt) == readSource(src))
    // and the watermark landed, so a further sync is a no-op
    val wm = Replicate.watermark(spark, tgt).get
    assert(Replicate.sync(spark, src, tgt, Seq("id")) == wm)
  }

  test("refusals: unkeyed source, null keys, existing target, missing watermark, no CDF") {
    val src = mkDeltaSource("refuse")
    val tgt = tempDir("repl-refuse-t").toString + "/replica"
    Replicate.initialize(spark, src, tgt, Seq("id"), "iceberg")

    // duplicate key arriving through the feed refuses the sync
    DeltaWrite.append(spark,
      Seq((900L, "a", 1L), (900L, "b", 2L)).toDF("id", "name", "v"), src)
    val eDup = intercept[IllegalArgumentException](
      Replicate.sync(spark, src, tgt, Seq("id")))
    assert(eDup.getMessage.contains("keyed source"))

    // existing target refuses initialize
    val eExists = intercept[IllegalArgumentException](
      Replicate.initialize(spark, src, tgt, Seq("id"), "iceberg"))
    assert(eExists.getMessage.contains("already exists"))

    // missing watermark refuses sync
    val bare = tempDir("repl-bare").toString + "/t"
    IcebergWrite.append(spark, rows(3), bare)
    val eWm = intercept[IllegalArgumentException](
      Replicate.sync(spark, src, bare, Seq("id")))
    assert(eWm.getMessage.contains("initialize"))

    // a Delta source without CDF refuses at initialize, not first sync
    val noCdf = tempDir("repl-nocdf").toString + "/src"
    DeltaWrite.append(spark, rows(5), noCdf)
    val eCdf = intercept[IllegalArgumentException](
      Replicate.initialize(spark, noCdf,
        tempDir("repl-nocdf-t").toString + "/t", Seq("id"), "delta"))
    assert(eCdf.getMessage.contains("change data feed"))

    // null keys refuse at initialize
    val nullSrc = tempDir("repl-null").toString + "/src"
    DeltaDdl.createTable(spark, nullSrc,
      StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("v", LongType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark,
      Seq((Some(1L), "a", 1L), (None, "b", 2L)).toDF("id", "name", "v"), nullSrc)
    val eNull = intercept[IllegalArgumentException](
      Replicate.initialize(spark, nullSrc,
        tempDir("repl-null-t").toString + "/t", Seq("id"), "delta"))
    assert(eNull.getMessage.contains("null values"))

    // Hudi replicas are single-key
    val eMulti = intercept[IllegalArgumentException](
      Replicate.initialize(spark, src,
        tempDir("repl-multi-t").toString + "/t", Seq("id", "name"), "hudi"))
    assert(eMulti.getMessage.contains("single record key"))
  }

  test("merge deleteKeys: absent keys are ignored, present keys die, one commit, CDC classified") {
    val dir = tempDir("mrg-dk").toString + "/t"
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("v", LongType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, rows(10), dir)
    val v0 = DeltaLog.snapshot(spark, dir, withFiles = false).version

    DeltaWrite.merge(spark, dir,
      Seq((0L, "upd0", 100L), (50L, "new", 1L)).toDF("id", "name", "v"),
      Seq("id"),
      deleteKeys = Some(Seq(3L, 4L, 999L).toDF("id"))) // 999 absent → ignored
    val v1 = DeltaLog.snapshot(spark, dir, withFiles = false).version
    assert(v1 == v0 + 1)
    val t = new DeltaTable("t", dir)(spark)
      .select("id", "name", "v").as[(Long, String, Long)].collect().toSet
    assert(!t.exists(r => r._1 == 3L || r._1 == 4L))
    assert(t.exists(r => r._1 == 0L && r._2 == "upd0"))
    assert(t.exists(_._1 == 50L))
    assert(t.size == 10 - 2 + 1)

    // CDC classified the delete-key rows as deletes (no insert fallthrough)
    val cdc = graft.tables.DeltaChanges.between(spark, dir, v1, v1)
    val byType = cdc.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType.get("delete").contains(2L), s"got $byType")
    assert(byType.get("insert").contains(1L))

    // empty source + non-empty deleteKeys still commits (and deletes)
    DeltaWrite.merge(spark, dir,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("id", LongType),
          StructField("name", StringType),
          StructField("v", LongType)))),
      Seq("id"),
      txn = Some("dk-test" -> 7L),
      deleteKeys = Some(Seq(Tuple1(0L)).toDF("id")))
    val after = new DeltaTable("t", dir)(spark)
      .select("id").as[Long].collect().toSet
    assert(!after.contains(0L))
    assert(DeltaLog.snapshot(spark, dir, withFiles = false)
      .txns.get("dk-test").contains(7L), "empty-source delete carries the txn")
  }

  test("a PARTITIONED replica lands partition-pruned reads after syncs") {
    // the replica is a real table of its format: partitionBy at
    // initialize must produce a layout the format's planner prunes
    for (tf <- Seq("delta", "iceberg", "hudi")) {
      val base = tempDir(s"repl-part-$tf").toString
      val (src, tgt) = (base + "/src", base + "/replica")
      DeltaDdl.createTable(spark, src, StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("part", LongType))),
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaWrite.append(spark,
        Seq.tabulate(12)(i => (i.toLong, s"n$i", (i % 3).toLong))
          .toDF("id", "name", "part"), src)
      Replicate.initialize(spark, src, tgt, Seq("id"), tf,
        partitionBy = Seq("part"))
      DeltaWrite.merge(spark, src,
        Seq((1L, "U", 1L), (100L, "N", 2L)).toDF("id", "name", "part"), Seq("id"))
      Replicate.sync(spark, src, tgt, Seq("id"))

      val fs = graft.core.Filters.normalize(Seq(Filter("part", "=", 1)))
      val pruned: DataFrame = tf match {
        case "delta"   => new DeltaTable("t", tgt)(spark, ReadArgs(filters = fs))
        case "iceberg" => new IcebergTable("t", tgt)(spark, ReadArgs(filters = fs))
        case "hudi"    => new graft.tables.HudiTable("t", tgt)(spark, ReadArgs(filters = fs))
      }
      // DATA files must prune to the filtered partition (an Iceberg
      // scan also lists the upsert's equality-DELETE files — they
      // apply to the pruned candidates and are not data)
      val dataFiles = tf match {
        case "iceberg" =>
          val deletes = graft.tables.IcebergMetaTables.files(spark, tgt)
            .where(org.apache.spark.sql.functions.col("content") =!= 0)
            .select("file_path")
            .as[String].collect().map(_.split('/').last).toSet
          pruned.inputFiles.filterNot(f => deletes(f.split('/').last))
        case _ => pruned.inputFiles
      }
      assert(dataFiles.nonEmpty && dataFiles.forall(_.contains("part=1")),
        s"$tf replica reads are not partition-pruned: ${dataFiles.toSeq}")
      assert(pruned.select("id").as[Long].collect().toSet ==
        Set(1L, 4L, 7L, 10L))
      val full: DataFrame = tf match {
        case "delta"   => new DeltaTable("t", tgt)(spark)
        case "iceberg" => new IcebergTable("t", tgt)(spark, ReadArgs.empty)
        case "hudi"    => new graft.tables.HudiTable("t", tgt)(spark, ReadArgs.empty)
      }
      val feed = graft.tables.ChangeFeed.forPath(spark, src)
      val want = feed.snapshotAt(spark, feed.head(spark))
        .select("id", "name", "part").as[(Long, String, Long)].collect().toSet
      assert(full.select("id", "name", "part")
        .as[(Long, String, Long)].collect().toSet == want)
    }
  }

  test("a DV-flagged Delta replica applies syncs without rewriting data files") {
    val src = mkDeltaSource("dvrepl")
    val tgt = tempDir("repl-dvrepl-t").toString + "/replica"
    Replicate.initialize(spark, src, tgt, Seq("id"), "delta")
    // opt the replica into deletion vectors: every later sync's merge
    // routes through mergeDv — O(changed rows) applies on wide replicas
    DeltaWrite.setTableProperties(spark, tgt,
      Map("delta.enableDeletionVectors" -> "true"))
    val filesBefore = DeltaLog.snapshot(spark, tgt).files.map(_.path).toSet

    DeltaWrite.merge(spark, src,
      Seq((3L, "upd", 1L), (300L, "new", 2L)).toDF("id", "name", "v"), Seq("id"))
    DeltaWrite.deleteWhere(spark, src,
      Filters.normalize(Seq(Filter("id", "=", 8))))
    Replicate.sync(spark, src, tgt, Seq("id"))

    assert(readTarget(tgt) == readSource(src))
    val snap = DeltaLog.snapshot(spark, tgt)
    assert(filesBefore.subsetOf(snap.files.map(_.path).toSet),
      "a DV-flagged replica must never rewrite a data file on sync")
    assert(snap.files.exists(_.dv.nonEmpty))
  }

  test("ADDITIVE source evolution propagates to every replica format") {
    // the Delta source gains a column mid-replication; the synced
    // replica evolves additively in each target format — old rows
    // null-filled, new rows carrying values
    for (tf <- Seq("delta", "iceberg", "hudi")) {
      val base = tempDir(s"repl-evo-$tf").toString
      val (src, tgt) = (base + "/src", base + "/replica")
      DeltaDdl.createTable(spark, src, StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType))),
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), src)
      Replicate.initialize(spark, src, tgt, Seq("id"), tf)

      DeltaDdl.addColumns(spark, src, Seq(StructField("score", LongType)))
      DeltaWrite.merge(spark, src,
        Seq((2L, "B", 20L), (3L, "new", 30L)).toDF("id", "name", "score"), Seq("id"))
      Replicate.sync(spark, src, tgt, Seq("id"))

      val got = (tf match {
        case "delta"   => new DeltaTable("t", tgt)(spark)
        case "iceberg" => new IcebergTable("t", tgt)(spark, ReadArgs.empty)
        case "hudi"    => new graft.tables.HudiTable("t", tgt)(spark, ReadArgs.empty)
      }).select("id", "name", "score")
        .as[(Long, String, Option[Long])].collect().toSet
      assert(got == Set((1L, "a", None), (2L, "B", Some(20L)), (3L, "new", Some(30L))),
        s"target format $tf diverged after evolution: $got")

      // deletes still apply after the evolution
      DeltaWrite.deleteWhere(spark, src,
        Filters.normalize(Seq(Filter("id", "=", 1))))
      Replicate.sync(spark, src, tgt, Seq("id"))
      assert(readTarget2(tgt).map(_._1) == Set(2L, 3L))
    }
  }

  test("a DELETE-ONLY batch carrying a fresh source evolution still applies (delta)") {
    // evolution + delete in ONE un-synced range: the batch's
    // survivors are EMPTY but their schema is evolved — the replica
    // must evolve before the merge's schema check, not crash
    val base = tempDir("repl-evo-delonly").toString
    val (src, tgt) = (base + "/src", base + "/replica")
    DeltaDdl.createTable(spark, src, StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), src)
    Replicate.initialize(spark, src, tgt, Seq("id"), "delta")
    DeltaDdl.addColumns(spark, src, Seq(StructField("score", LongType)))
    DeltaWrite.deleteWhere(spark, src,
      Filters.normalize(Seq(Filter("id", "=", 1))))
    Replicate.sync(spark, src, tgt, Seq("id"))
    assert(readTarget2(tgt).map(_._1) == Set(2L))
    assert(DeltaLog.snapshot(spark, tgt, withFiles = false)
      .schema.fieldNames.contains("score"),
      "the evolution must reach the replica even on a delete-only batch")
  }

  private def readTarget2(path: String): Set[(Long, String)] = {
    val fmt = graft.tables.ChangeFeed.detectFormat(spark, path).get
    val df: DataFrame = fmt match {
      case "delta"   => new DeltaTable("t", path)(spark)
      case "iceberg" => new IcebergTable("t", path)(spark, ReadArgs.empty)
      case "hudi"    => new graft.tables.HudiTable("t", path)(spark, ReadArgs.empty)
    }
    df.select("id", "name").as[(Long, String)].collect().toSet
  }

  test("REPLAY INVARIANT: random churn + interleaved syncs converge every format pair") {
    // the 3x3 matrix under one randomized property: whatever keyed
    // churn the source takes, and WHENEVER syncs land between ops,
    // the replica after a final sync equals the source's final state
    val rnd = new scala.util.Random(41)
    def someRows(): DataFrame =
      Seq.fill(4)((rnd.nextInt(15).toLong, s"v${rnd.nextInt(1000)}", rnd.nextInt(50).toLong))
        .groupBy(_._1).map(_._2.head).toSeq // one row per key per batch
        .toDF("id", "name", "v")
    def someKeys(): DataFrame =
      Seq.fill(3)(rnd.nextInt(15).toLong).distinct.toDF("id")
    def churn(fmt: String, src: String): Unit = (fmt, rnd.nextInt(3)) match {
      case ("delta", 0)   => DeltaWrite.merge(spark, src, someRows(), Seq("id"))
      case ("delta", 1)   =>
        val ks = someKeys().as[Long].collect().toSeq
        DeltaWrite.deleteWhere(spark, src,
          Filters.normalize(Seq(Filter("id", "in", ks))))
      // maintenance rewrites move rows between files without changing
      // them — they must contribute NOTHING to the replicated stream
      case ("delta", _)   => DeltaWrite.optimize(spark, src, smallFileBytes = 1L << 30)
      case ("iceberg", 0) => IcebergWrite.upsertEquality(spark, someRows(), src, Seq("id"))
      case ("iceberg", 1) => IcebergWrite.deleteEquality(spark, src, someKeys())
      case ("iceberg", _) =>
        graft.tables.IcebergMaintenance.rewriteDataFiles(spark, src); ()
      case ("hudi", 0)    => HudiWrite.upsert(spark, someRows(), src)
      case ("hudi", 1)    => HudiWrite.delete(spark, someKeys(), src)
      case ("hudi", _)    => HudiWrite.compact(spark, src); ()
    }
    def mkSource(fmt: String, dir: String): Unit = fmt match {
      case "delta" =>
        DeltaDdl.createTable(spark, dir, StructType(Seq(
          StructField("id", LongType),
          StructField("name", StringType),
          StructField("v", LongType))),
          configuration = Map("delta.enableChangeDataFeed" -> "true"))
        DeltaWrite.append(spark, rows(12), dir)
      case "iceberg" => IcebergWrite.append(spark, rows(12), dir)
      case "hudi" =>
        HudiWrite.bulkInsert(spark, rows(12), dir, "id", tableType = "MERGE_ON_READ")
    }
    val formats = Seq("delta", "iceberg", "hudi")
    for (sf <- formats; tf <- formats) {
      val base = tempDir(s"repl-prop-$sf-$tf").toString
      val (src, tgt) = (base + "/src", base + "/replica")
      mkSource(sf, src)
      Replicate.initialize(spark, src, tgt, Seq("id"), tf)
      (1 to 4).foreach { _ =>
        churn(sf, src)
        if (rnd.nextBoolean()) Replicate.sync(spark, src, tgt, Seq("id"))
      }
      Replicate.sync(spark, src, tgt, Seq("id"))
      assert(readTarget(tgt) == readSource(src),
        s"$sf -> $tf diverged after randomized churn")
      // syncing again with no new commits is a commitless no-op
      val wm = Replicate.watermark(spark, tgt)
      assert(Replicate.sync(spark, src, tgt, Seq("id")) == wm.get)
    }
  }

  test("DROPPED source column: Refuse names the column and the way out; Tombstone null-fills") {
    // a COLUMN-MAPPED Delta source (rename/drop need mapping) with CDF
    val dir = tempDir("repl-drop").toString + "/src"
    def mapped(name: String, dt: org.apache.spark.sql.types.DataType, id: Int) =
      StructField(name, dt, nullable = true,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", id.toLong)
          .putString(DeltaLog.PhysicalNameKey, f"col-$id%02d").build())
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(mapped("id", LongType, 1), mapped("name", StringType, 2),
        mapped("v", LongType, 3))),
      configuration = Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "3"))
    DeltaWrite.append(spark, rows(6), dir)

    val tgt = tempDir("repl-drop-t").toString + "/replica"
    Replicate.initialize(spark, dir, tgt, Seq("id"), "delta")

    // the source DROPS v (metadata-only under mapping), then churns
    graft.tables.DeltaDdl.dropColumn(spark, dir, "v")
    DeltaWrite.merge(spark, dir,
      Seq((1L, "ONE"), (100L, "new")).toDF("id", "name"), Seq("id"))

    // default policy: refuse, naming the column and both ways out
    val e = intercept[IllegalArgumentException] {
      Replicate.sync(spark, dir, tgt, Seq("id"))
    }
    assert(e.getMessage.contains("v") && e.getMessage.contains("Tombstone") &&
      e.getMessage.contains("recreate"), e.getMessage)

    // tombstone policy: the replica keeps v; churned rows write null,
    // untouched rows keep their historical values
    Replicate.sync(spark, dir, tgt, Seq("id"),
      onDrop = Replicate.DropPolicy.Tombstone)
    val got = new DeltaTable("t", tgt)(spark)
      .select("id", "name", "v").as[(Long, String, Option[Long])].collect().toSet
    assert(got.contains((1L, "ONE", None)) && got.contains((100L, "new", None)))
    assert(got.contains((2L, "name2", Some(20L))), s"historical value lost: $got")
    // steady state: another churned batch keeps tombstoning
    DeltaWrite.merge(spark, dir, Seq((2L, "TWO")).toDF("id", "name"), Seq("id"))
    Replicate.sync(spark, dir, tgt, Seq("id"),
      onDrop = Replicate.DropPolicy.Tombstone)
    assert(new DeltaTable("t", tgt)(spark)
      .select("id", "name", "v").as[(Long, String, Option[Long])]
      .collect().toSet.contains((2L, "TWO", None)))
  }

  test("syncAll keeps two tables current under one watermark namespace") {
    val srcA = mkDeltaSource("multi-a")
    val srcB = mkDeltaSource("multi-b", n = 8)
    val base = tempDir("repl-multi-t").toString
    val specs = Seq(
      Replicate.TableSpec(srcA, base + "/a", Seq("id"), "iceberg"),
      Replicate.TableSpec(srcB, base + "/b", Seq("id"), "delta"))

    // first call initializes BOTH
    val wm0 = Replicate.syncAll(spark, specs)
    assert(wm0.keySet == Set(base + "/a", base + "/b"))
    assert(readTarget(base + "/a") == readSource(srcA))
    assert(readTarget(base + "/b") == readSource(srcB))

    // churn only A; the second call advances A and no-ops B
    DeltaWrite.merge(spark, srcA,
      Seq((1L, "A1", 7L), (900L, "new", 9L)).toDF("id", "name", "v"), Seq("id"))
    val wm1 = Replicate.syncAll(spark, specs)
    assert(wm1(base + "/a") > wm0(base + "/a"))
    assert(wm1(base + "/b") == wm0(base + "/b"))
    assert(readTarget(base + "/a") == readSource(srcA))
    assert(readTarget(base + "/b") == readSource(srcB))

    // duplicate target refuses
    intercept[IllegalArgumentException] {
      Replicate.syncAll(spark, specs :+ specs.head)
    }
  }

  test("syncAll: one failing table does not discard the others' advanced watermarks") {
    val srcA = mkDeltaSource("multi-fail-a")
    val srcB = mkDeltaSource("multi-fail-b", n = 8)
    val base = tempDir("repl-multi-f").toString
    val good = Replicate.TableSpec(srcA, base + "/a", Seq("id"), "iceberg")
    val bad = Replicate.TableSpec(
      base + "/nowhere", base + "/b", Seq("id"), "delta") // source missing
    // every table is ATTEMPTED: A advances (initializes), B's failure
    // surfaces in the same exception WITH A's watermark attached
    val e = intercept[Replicate.SyncAllException] {
      Replicate.syncAll(spark, Seq(good, bad))
    }
    assert(e.advanced.keySet == Set(base + "/a"))
    assert(e.failures.keySet == Set(base + "/b"))
    assert(readTarget(base + "/a") == readSource(srcA))
    // A's replica is committed and exactly-once state intact: a retry
    // with only the good spec no-ops (same watermark, no double apply)
    val wm = Replicate.syncAll(spark, Seq(good))
    assert(wm(base + "/a") == e.advanced(base + "/a"))
  }
}
