package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.hadoop.fs.Path

/** Native Hudi COPY_ON_WRITE: bulk insert + snapshot read, upsert
  * merge semantics (rewrite affected file groups, preserve untouched
  * commit times), time travel, incremental queries, partition
  * pruning, and the timeline protocol.
  */
class HudiSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("bulk insert round-trips; meta columns are dropped; layout is Hudi-named") {
    val dir = tempDir("hudi-bi").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    val t = new HudiTable("t", dir)
    val got = t(spark, ReadArgs.empty).select("id", "v", "part")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)))
    assert(!t(spark, ReadArgs.empty).columns.exists(_.startsWith("_hoodie")))
    // base files follow <fileId>_<token>_<instant>.parquet under hive dirs
    val files = t(spark, ReadArgs.empty).inputFiles
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.matches(".*/part=\\d+/[0-9a-f-]+_0-0-0_\\d{17}\\.parquet"), f)
    }
    // timeline protocol artifacts
    val hoodie = new Path(dir, ".hoodie")
    val names = fsOf(dir).listStatus(hoodie).map(_.getPath.getName).toSet
    assert(names.contains("hoodie.properties"))
    assert(names.exists(_.endsWith(".commit")))
    assert(names.exists(_.endsWith(".commit.requested")))
    assert(names.exists(_.endsWith(".inflight")))
  }

  test("upsert rewrites only affected groups; update + insert; time travel sees v1") {
    val dir = tempDir("hudi-up").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    val i2 = HudiWrite.upsert(spark,
      Seq((2L, "B", 0), (4L, "d", 1)).toDF("id", "v", "part"), dir)
    assert(i2 > i1)

    val t = new HudiTable("t", dir)
    val now = t(spark, ReadArgs.empty).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(now == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    // time travel to the first instant: pre-upsert contents
    val v1 = t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i1)))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(v1 == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // copy-on-write: part=1's group (id 3) was NOT touched by the
    // update of id 2 — its base file is still the i1 file
    val files = t(spark, ReadArgs.empty).inputFiles
    assert(files.exists(f => f.contains("part=1") && f.contains(s"_$i1.parquet")),
      s"untouched group should still serve the $i1 slice: ${files.mkString(", ")}")
    assert(files.exists(f => f.contains("part=0") && f.contains(s"_$i2.parquet")),
      s"affected group should serve the $i2 slice: ${files.mkString(", ")}")
  }

  test("incremental returns exactly the changed rows with their new values") {
    val dir = tempDir("hudi-incr").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dir, "id")
    val i2 = HudiWrite.upsert(spark, Seq((2L, "B"), (4L, "d")).toDF("id", "v"), dir)
    val i3 = HudiWrite.upsert(spark, Seq((5L, "e")).toDF("id", "v"), dir)

    val t = new HudiTable("t", dir)
    // (i1, i2]: the update and the insert, nothing else — rows 1,3
    // were rewritten into the new base file but KEPT commit time i1
    val d12 = t.incremental(spark, i1, Some(i2)).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(d12 == Seq((2L, "B"), (4L, "d")))
    // (i1, latest]
    val d1l = t.incremental(spark, i1).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(d1l == Seq((2L, "B"), (4L, "d"), (5L, "e")))
    // (i3, latest]: empty
    assert(t.incremental(spark, i3).count() == 0L)
  }

  test("partition pruning plans only matching partitions; exact filter re-applied") {
    val dir = tempDir("hudi-prune").toString + "/t"
    HudiWrite.bulkInsert(spark,
      (0L until 20L).map(i => (i, s"v$i", (i % 4).toInt)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    val t = new HudiTable("t", dir)
    val filtered = t(spark, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(Filter("part", "=", 2)))))
    assert(filtered.inputFiles.forall(_.contains("part=2")))
    assert(filtered.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 20L).filter(_ % 4 == 2))
    // IN filter prunes to two partitions
    val in2 = t(spark, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(Filter("part", "in", Seq(0, 1))))))
    assert(in2.inputFiles.forall(f => f.contains("part=0") || f.contains("part=1")))
    assert(in2.count() == 10L)
    // no match: declared-empty frame, schema intact
    val none = t(spark, ReadArgs(
      filters = graft.core.Filters.normalize(Seq(Filter("part", "=", 99)))))
    assert(none.count() == 0L && none.columns.contains("v"))
  }

  test("refusals: non-Hudi path, wrong record key, mismatched partitioning") {
    val dir = tempDir("hudi-ref").toString
    intercept[IllegalArgumentException] {
      new HudiTable("t", dir + "/missing")(spark, ReadArgs.empty)
    }
    val t = dir + "/t"
    HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), t, "id")
    intercept[IllegalArgumentException] {
      HudiWrite.bulkInsert(spark, Seq((2L, "b")).toDF("id", "v"), t, "v")
    }
    intercept[IllegalArgumentException] {
      HudiWrite.bulkInsert(spark,
        Seq((2L, "b", 1)).toDF("id", "v", "p"), t, "id", Seq("p"))
    }
    intercept[IllegalArgumentException] {
      HudiWrite.upsert(spark, Seq(("x", 1L)).toDF("w", "n"), t)
    }
  }

  test("second bulk insert appends new file groups; both commits read") {
    val dir = tempDir("hudi-bi2").toString + "/t"
    HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id")
    HudiWrite.bulkInsert(spark, Seq((2L, "b")).toDF("id", "v"), dir, "id")
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    assert(t(spark, ReadArgs.empty).inputFiles.length == 2)
  }

  test("delete rewrites groups without the keys; full groups retire via replacecommit") {
    val dir = tempDir("hudi-del").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    // delete 2 (partial: group keeps 1) and 3 (its whole group empties)
    val i2 = HudiWrite.delete(spark, Seq(2L, 3L).toDF("id"), dir)

    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().toSeq == Seq(1L))
    // time travel: pre-delete snapshot intact
    assert(t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i1)))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the emptied group retired via a replacecommit action
    val names = fsOf(dir).listStatus(new Path(dir, ".hoodie"))
      .map(_.getPath.getName).toSet
    assert(names.contains(s"$i2.replacecommit"))
    assert(!names.contains(s"$i2.commit"))
    // markers re-marked to the COMPLETED action's upstream naming —
    // a commit-named requested with no .commit completion would read
    // as a forever-pending instant to real Hudi tooling
    assert(names.contains(s"$i2.replacecommit.requested"))
    assert(names.contains(s"$i2.replacecommit.inflight"))
    assert(!names.contains(s"$i2.commit.requested") && !names.contains(s"$i2.inflight"))
    // survivor row kept its ORIGINAL commit time (incremental contract)
    val keep = HudiWrite.readSlices(spark, dir,
      HudiWrite.latestSlices(fsOf(dir), dir, None))
    assert(keep.select(HudiWrite.CommitTimeCol).as[String].collect().toSeq == Seq(i1))
    // deleting unmatched keys is a no-op commit
    HudiWrite.delete(spark, Seq(99L).toDF("id"), dir)
    assert(t(spark, ReadArgs.empty).count() == 1L)
  }

  test("cluster rewrites layout sorted without phantom incremental changes") {
    val dir = tempDir("hudi-cl").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((3L, "c", 0), (1L, "a", 0)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    val i2 = HudiWrite.upsert(spark, Seq((2L, "b", 0)).toDF("id", "v", "part"), dir)
    val ic = HudiWrite.cluster(spark, dir, Seq("id"))

    val t = new HudiTable("t", dir)
    // same rows, now served entirely from the clustering instant's files
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val files = t(spark, ReadArgs.empty).inputFiles
    assert(files.length == 1 && files.head.contains(s"_$ic.parquet"))
    // rows are sorted inside the rewritten file
    val raw = spark.read.parquet(files.head).select("id").as[Long].collect().toSeq
    assert(raw == raw.sorted)
    // commit times preserved: a pure layout rewrite emits NO
    // incremental changes
    assert(t.incremental(spark, i2).count() == 0L)
    assert(t.incremental(spark, i1, Some(i2)).select("id").as[Long].collect().toSeq ==
      Seq(2L))
    // pre-cluster snapshot still time-travels
    assert(t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i1)))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // clustering mints replacecommit-named markers up front
    val names = fsOf(dir).listStatus(new Path(dir, ".hoodie"))
      .map(_.getPath.getName).toSet
    assert(names.contains(s"$ic.replacecommit.requested"))
    assert(names.contains(s"$ic.replacecommit.inflight"))
    assert(!names.contains(s"$ic.commit.requested") && !names.contains(s"$ic.inflight"))
  }

  test("partition-scoped cluster rewrites only the selected partition's groups") {
    val dir = tempDir("hudi-clp").toString + "/t"
    // two bulk inserts -> two file groups in each of part=0 and part=1
    HudiWrite.bulkInsert(spark,
      Seq((3L, "c", 0), (11L, "x", 1)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (12L, "y", 1)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    def groupsOf(p: String): Set[String] =
      HudiWrite.latestSlices(fsOf(dir), dir, None)
        .filter(_.partition == p).map(_.fileId).toSet
    val g1Before = groupsOf("part=1")
    assert(groupsOf("part=0").size == 2 && g1Before.size == 2)

    HudiWrite.cluster(spark, dir, Seq("id"), partitions = Some(Seq("part=0")))
    assert(groupsOf("part=0").size == 1, "part=0 clusters to one fresh group")
    assert(groupsOf("part=1") == g1Before, "part=1's groups carry untouched")
    assert(new HudiTable("t", dir)(spark, ReadArgs.empty)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 11L, 12L))

    // a typo'd partition path refuses instead of clustering nothing
    intercept[IllegalArgumentException] {
      HudiWrite.cluster(spark, dir, Seq("id"), partitions = Some(Seq("part=9")))
    }
  }

  test("file-group resolution drops the map literal above the broadcast threshold") {
    val dir = tempDir("hudi-fg").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 2)).toDF("id", "v", "part"),
      dir, "id", Seq("part"))
    val fs = fsOf(dir)
    val slices = HudiWrite.latestSlices(fs, dir, None)
    assert(slices.size == 3)
    def resolve(literalMax: Int) =
      HudiWrite.withFileGroup(spark, HudiWrite.readSlices(spark, dir, slices),
        slices, dir, literalMax = literalMax)
        .select(org.apache.spark.sql.functions.col(HudiWrite.RecordKeyCol).as("k"),
          org.apache.spark.sql.functions.col("_fg"))
    val viaLiteral = resolve(literalMax = 1000)
    val viaJoin = resolve(literalMax = 1)
    // same resolution either way
    assert(viaLiteral.as[(String, String)].collect().toSet ==
      viaJoin.as[(String, String)].collect().toSet)
    assert(viaJoin.as[(String, String)].collect().toMap.values.toSet == slices.map(_.fileId).toSet)
    // above the threshold the serialized plan carries NO path→fg map
    // literal — the mapping rides a broadcast (path, fileId) frame
    assert(viaLiteral.queryExecution.optimizedPlan.toString.contains("element_at"))
    val joinPlan = viaJoin.queryExecution.optimizedPlan.toString
    assert(!joinPlan.contains("element_at"), joinPlan.take(400))
    assert(joinPlan.contains("Join"), joinPlan.take(400))
  }

  test("a Hudi table composes into the catalog and its SQL front door") {
    import graft.catalog.{Catalog, MapDatabase}
    val dir = tempDir("hudi-cat").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, "id")
    val cat = new Catalog(Map("lake" -> new MapDatabase(Map(
      "hudi_t" -> new HudiTable("hudi_t", dir)))))
    cat.registerAllViews(spark)
    val got = spark.sql("SELECT v FROM lake_hudi_t WHERE id = 2").as[String].collect()
    assert(got.toSeq == Seq("b"))
  }

  test("a commit racing past its base snapshot on the same file group is refused and rolled back") {
    val dir = tempDir("hudi-occ").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, "id")
    val fs = fsOf(dir)
    // a second writer lands an upsert on key 2's file group
    HudiWrite.upsert(spark, Seq((2L, "B")).toDF("id", "v"), dir)
    // the slice the upsert REWROTE (bulk insert may have split the
    // two rows into separate groups — pick by instant, not uuid order)
    val g = HudiWrite.latestSlices(fs, dir, None).filter(_.instant > i1).head

    // first writer, planned against base=i1, tries to publish a
    // rewrite of the same group: must refuse and roll back its file
    val fakeRel = s"${g.fileId}_0-0-0_99999999999999999.parquet"
    val fakePath = new Path(dir, fakeRel)
    val out = fs.create(fakePath, true); out.write(Array[Byte](1)); out.close()
    val e = intercept[RuntimeException] {
      HudiWrite.completeCommitGuarded(fs, dir, Some(i1), "99999999999999999",
        "upsert", Seq(HudiWrite.WrittenFile(g.partition, g.fileId, fakeRel, 1L)),
        Map.empty)
    }
    assert(e.getMessage.contains("concurrent commit touched"))
    assert(!fs.exists(fakePath), "conflicting staged file must roll back")
    assert(!fs.exists(new Path(dir, ".hoodie/99999999999999999.commit")))

    // racing upserts of DIFFERENT keys in the same group: both land
    // (the loser replans and retries), final state carries both
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(HudiWrite.upsert(spark, Seq((1L, "A2")).toDF("id", "v"), dir))
    val f2 = Future(HudiWrite.upsert(spark, Seq((2L, "B2")).toDF("id", "v"), dir))
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "A2"), (2L, "B2")))
  }

  test("a fully-emptied table stays readable: empty frame, schema intact") {
    val dir = tempDir("hudi-empty").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id")
    HudiWrite.delete(spark, Seq(1L).toDF("id"), dir)
    val t = new HudiTable("t", dir)
    val empty = t(spark, ReadArgs.empty)
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("id", "v"))
    assert(t.incremental(spark, i1).count() == 0L)
    assert(t.getSchema(spark).columns.map(_.column).toSet == Set("id", "v"))
    // the table comes back to life on a new upsert
    HudiWrite.upsert(spark, Seq((2L, "b")).toDF("id", "v"), dir)
    assert(t(spark, ReadArgs.empty).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("upserting rows with NULL partition values routes to a real new group") {
    val dir = tempDir("hudi-nullpart").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", Some(0))).toDF("id", "v", "part"), dir, "id", Seq("part"))
    HudiWrite.upsert(spark,
      Seq((2L, "b", Option.empty[Int])).toDF("id", "v", "part"), dir)
    val t = new HudiTable("t", dir)
    val got = t(spark, ReadArgs.empty).select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
    // the null-partition file group has a minted uuid id, not the
    // hive default-partition sentinel leaking in as a fileId
    val slices = HudiWrite.latestSlices(fsOf(dir), dir, None)
    assert(slices.forall(s => !s.fileId.contains("HIVE_DEFAULT")), slices.toString)
  }

  test("clean deletes only slices outside the retention window") {
    val dir = tempDir("hudi-clean").toString + "/t"
    val i1 = HudiWrite.bulkInsert(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, "id")
    val i2 = HudiWrite.upsert(spark, Seq((1L, "A")).toDF("id", "v"), dir)
    val i3 = HudiWrite.upsert(spark, Seq((2L, "B")).toDF("id", "v"), dir)
    val fs = fsOf(dir)
    val all = HudiWrite.allWrittenSlices(fs, dir)
    assert(all.forall(s => fs.exists(new Path(dir, s.relPath))))

    // retain 2: snapshots as of i2 and i3 stay fully readable
    val dry = HudiMaintenance.clean(spark, dir, retainLast = 2, dryRun = true)
    val deleted = HudiMaintenance.clean(spark, dir, retainLast = 2)
    assert(dry.toSet == deleted.toSet)
    val t = new HudiTable("t", dir)
    assert(t(spark, ReadArgs.empty).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "A"), (2L, "B")))
    assert(t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i2)))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "A"), (2L, "b")))
    deleted.foreach(rel => assert(!fs.exists(new Path(dir, rel))))
    // the i1-only slice of key 1's group (superseded at i2) is gone,
    // so pre-window time travel fails on the missing file
    assert(deleted.nonEmpty)
    intercept[Exception] {
      t(spark, ReadArgs(extra = Map(t.AsOfInstantKey -> i1))).collect()
    }
    // idempotent
    assert(HudiMaintenance.clean(spark, dir, retainLast = 2).isEmpty)
  }

  test("getSchema reports data columns and partition fields") {
    val dir = tempDir("hudi-schema").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 3)).toDF("id", "v", "part"), dir, "id", Seq("part"))
    val schema = new HudiTable("t", dir).getSchema(spark)
    assert(schema.partitions.map(_.columnName) == Seq("part"))
    assert(schema.columns.map(_.column).toSet == Set("id", "v", "part"))
    assert(!schema.columns.exists(_.column.startsWith("_hoodie")))
  }
}
