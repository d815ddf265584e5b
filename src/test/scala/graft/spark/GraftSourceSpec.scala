package graft.spark

import graft.SparkSpec
import graft.tables.{DeltaWrite, HudiWrite, IcebergWrite}
import org.apache.spark.sql.functions.col

/** The graft DataSource: Spark SQL reads native Delta/Iceberg/Hudi
  * tables as first-class relations, with WHERE clauses pruning
  * through the graft Filter algebra and projections pruning columns.
  */
class GraftSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq.tabulate(12)(i =>
    (i.toLong, s"n$i", (i % 3).toLong)).toDF("id", "name", "part")

  test("reader API + SQL view + direct-path SQL over all three formats, auto-detected") {
    val base = tempDir("graft-src").toString
    val (d, i, h) = (base + "/d", base + "/i", base + "/h")
    DeltaWrite.append(spark, rows, d, Seq("part"))
    IcebergWrite.append(spark, rows, i, Seq("part"))
    HudiWrite.bulkInsert(spark, rows, h, "id", Seq("part"))

    for (p <- Seq(d, i, h)) {
      // DataFrame reader, format auto-detected from the layout
      val df = spark.read.format("graft").load(p)
      assert(df.select("id").as[Long].collect().sorted.toSeq == (0L to 11L))
      // SQL view: arbitrary Spark SQL over the relation
      spark.read.format("graft").load(p).createOrReplaceTempView("gsrc")
      val agg = spark.sql(
        "SELECT part, count(*) AS n FROM gsrc GROUP BY part ORDER BY part")
        .as[(Long, Long)].collect().toSeq
      assert(agg == Seq((0L, 4L), (1L, 4L), (2L, 4L)))
      // SQL DDL form: USING graft OPTIONS
      spark.sql("DROP VIEW IF EXISTS gddl")
      spark.sql(s"CREATE TEMPORARY VIEW gddl USING graft OPTIONS (path '$p')")
      assert(spark.sql("SELECT count(*) FROM gddl").as[Long].head() == 12L)
      spark.sql("DROP VIEW gddl")
    }
  }

  test("WHERE pushes into the graft pruning planner: only matching partitions open") {
    val base = tempDir("graft-src-prune").toString
    val (d, i, h) = (base + "/d", base + "/i", base + "/h")
    DeltaWrite.append(spark, rows, d, Seq("part"))
    IcebergWrite.append(spark, rows, i, Seq("part"))
    HudiWrite.bulkInsert(spark, rows, h, "id", Seq("part"))

    def scanRows(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.RowDataSourceScanExec =>
            s.metrics("numOutputRows").value
        }.getOrElse(fail("no data-source scan in the plan"))
    }
    for (p <- Seq(d, i, h)) {
      val q = spark.read.format("graft").load(p)
        .where(col("part") === 1).select("id", "name")
      // the translated filter is HANDLED by the relation: no Spark
      // re-filter, and the scan itself emits only the matching rows —
      // proof the predicate reached the graft pruning planner
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("EqualTo(part,1"),
        s"filter not pushed for $p:\n$plan")
      assert(q.select("id").as[Long].collect().toSet == Set(1L, 4L, 7L, 10L))
      assert(scanRows(q) == 4L, s"$p scan emitted unfiltered rows")
      // IN-lists translate too
      val in = spark.read.format("graft").load(p).where("part IN (0, 2)")
      assert(in.count() == 8L)
      assert(scanRows(in.select("id")) == 8L)
    }
  }

  test("untranslatable predicates stay with Spark and results remain exact") {
    val dir = tempDir("graft-src-resid").toString + "/d"
    DeltaWrite.append(spark, rows, dir, Seq("part"))
    spark.sql(s"CREATE TEMPORARY VIEW gresid USING graft OPTIONS (path '$dir')")
    val q = spark.sql(
      "SELECT id FROM gresid WHERE part = 1 AND name LIKE '%1%'")
    // LIKE is not in the algebra: Spark applies it over the pruned read
    assert(q.as[Long].collect().toSet == Set(1L, 10L))
  }

  test("time-travel options route to each format's reader") {
    val base = tempDir("graft-src-tt").toString
    val (d, i2) = (base + "/d", base + "/i")
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d)
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), d)
    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(d).count() == 1L)

    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), i2)
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), i2)
    val firstSnap = graft.tables.IcebergMetaTables.snapshots(spark, i2)
      .orderBy("snapshot_id").select("snapshot_id").as[Long].head()
    assert(spark.read.format("graft").option("snapshotId", firstSnap.toString)
      .load(i2).count() == 1L)
  }

  test("write side: save modes create/append/overwrite across formats") {
    import org.apache.spark.sql.SaveMode
    val base = tempDir("graft-src-w").toString
    def readAll(p: String) = spark.read.format("graft").load(p)
      .select("id", "v").as[(Long, String)].collect().toSet

    // delta: create (explicit format) → append (auto-detect) → overwrite
    val d = base + "/d"
    Seq((1L, "a")).toDF("id", "v").write.format("graft")
      .option("format", "delta").save(d)
    Seq((2L, "b")).toDF("id", "v").write.format("graft")
      .mode(SaveMode.Append).save(d)
    assert(readAll(d) == Set((1L, "a"), (2L, "b")))
    Seq((9L, "z")).toDF("id", "v").write.format("graft")
      .mode(SaveMode.Overwrite).save(d)
    assert(readAll(d) == Set((9L, "z")))

    // iceberg create + append
    val i = base + "/i"
    Seq((1L, "a")).toDF("id", "v").write.format("graft")
      .option("format", "iceberg").save(i)
    Seq((2L, "b")).toDF("id", "v").write.format("graft")
      .mode(SaveMode.Append).save(i)
    assert(readAll(i) == Set((1L, "a"), (2L, "b")))

    // hudi create needs recordKey; appends are key-merged upserts
    val h = base + "/h"
    intercept[IllegalArgumentException] {
      Seq((1L, "a")).toDF("id", "v").write.format("graft")
        .option("format", "hudi").save(h)
    }
    Seq((1L, "a")).toDF("id", "v").write.format("graft")
      .option("format", "hudi").option("recordKey", "id").save(h)
    Seq((1L, "A"), (2L, "b")).toDF("id", "v").write.format("graft")
      .mode(SaveMode.Append).save(h)
    assert(readAll(h) == Set((1L, "A"), (2L, "b")))

    // mode contracts
    intercept[IllegalArgumentException] {
      Seq((3L, "c")).toDF("id", "v").write.format("graft")
        .mode(SaveMode.ErrorIfExists).save(d)
    }
    Seq((3L, "c")).toDF("id", "v").write.format("graft")
      .mode(SaveMode.Ignore).save(d) // no-op on existing
    assert(readAll(d) == Set((9L, "z")))
    intercept[IllegalArgumentException] {
      Seq((3L, "c")).toDF("id", "v").write.format("graft").save(base + "/new")
    } // new table without explicit format refuses
  }

  test("streaming reads: net rows by default, typed changes with cdc=true") {
    import org.apache.spark.sql.streaming.OutputMode
    val base = tempDir("graft-src-stream").toString
    val d = base + "/d"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d)

    // net-rows tail (delta auto-detected)
    val sink1 = s"netsink_${System.nanoTime()}"
    val q1 = spark.readStream.format("graft").load(d)
      .writeStream.format("memory").queryName(sink1)
      .option("checkpointLocation", base + "/ck1")
      .outputMode(OutputMode.Append()).start()
    try {
      q1.processAllAvailable()
      DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), d)
      q1.processAllAvailable()
      assert(spark.table(sink1).select("id").as[Long].collect().toSet == Set(1L, 2L))
    } finally q1.stop()

    // typed cdc tail over a CDF-enabled table
    val c = base + "/c"
    graft.tables.DeltaDdl.createTable(spark, c,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), c)
    val sink2 = s"cdcsink_${System.nanoTime()}"
    val q2 = spark.readStream.format("graft").option("cdc", "true").load(c)
      .writeStream.format("memory").queryName(sink2)
      .option("checkpointLocation", base + "/ck2")
      .outputMode(OutputMode.Append()).start()
    try {
      q2.processAllAvailable()
      DeltaWrite.deleteWhere(spark, c,
        graft.core.Filters.normalize(Seq(graft.core.Filter("id", "=", 1))))
      q2.processAllAvailable()
      val types = spark.table(sink2).select("_change_type")
        .as[String].collect().toSet
      assert(types == Set("insert", "delete"))
    } finally q2.stop()
  }

  test("streaming read THROUGH the catalog: readStream.table with checkpoint restart") {
    import org.apache.spark.sql.streaming.OutputMode
    val base = tempDir("graft-cat-stream").toString
    val d = base + "/d"
    val ck = base + "/ck"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d)
    withCatalog {
      // file sink (recovery-capable) so the restart leg is exact
      val out = base + "/out"
      def run(): Unit = {
        val q = spark.readStream.table(s"graft.`$d`")
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", ck)
          .outputMode(OutputMode.Append()).start()
        try q.processAllAvailable() finally q.stop()
      }
      run()
      DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), d)
      run()
      assert(spark.read.parquet(out).select("id").as[Long].collect().toSet ==
        Set(1L, 2L))
      // restart from the SAME checkpoint: rows appended while the
      // query was down arrive exactly once, nothing replays
      DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), d)
      run()
      val rows = spark.read.parquet(out).select("id").as[Long].collect().toSeq
      assert(rows.sorted == Seq(1L, 2L, 3L),
        s"checkpoint restart must resume, not replay: $rows")
      // the typed cdc stream has a different schema — loudly routed to
      // the format reader instead of mis-binding the table's columns
      val e = intercept[Exception] {
        spark.readStream.option("cdc", "true").table(s"graft.`$d`")
          .writeStream.format("memory").queryName("nope")
          .option("checkpointLocation", base + "/ck2").start()
      }
      assert(e.getMessage.contains("cdc"), e.getMessage)
      // iceberg leg through the catalog too
      val i = base + "/i"
      IcebergWrite.append(spark, Seq((10L, "x")).toDF("id", "v"), i)
      val sink3 = s"catstream3_${System.nanoTime()}"
      val q3 = spark.readStream.table(s"graft.iceberg.`$i`")
        .writeStream.format("memory").queryName(sink3)
        .option("checkpointLocation", base + "/cki")
        .outputMode(OutputMode.Append()).start()
      try {
        q3.processAllAvailable()
        IcebergWrite.append(spark, Seq((11L, "y")).toDF("id", "v"), i)
        q3.processAllAvailable()
        assert(spark.table(sink3).select("id").as[Long].collect().toSet ==
          Set(10L, 11L))
      } finally q3.stop()
    }
  }

  test("refusals: non-lakehouse path, format mislabel") {
    val dir = tempDir("graft-src-bad").toString
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").load(dir + "/nope")
    }
    assert(e.getMessage.contains("not a Delta, Iceberg or Hudi"))
    val d = dir + "/d"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d)
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("format", "hudi").load(d)
    }
    assert(e2.getMessage.contains("delta table, not the requested hudi"))
  }

  test("streaming writes: format(\"graft\") delegates to the exactly-once sink triad") {
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.SparkSession
    val base = tempDir("graft-sink").toString

    // delta leg: append through the graft name, replay-safe via txnAppId
    locally {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val d = base + "/d"
      val q = in.toDF().toDF("id", "v").writeStream
        .format("graft")
        .option("format", "delta")
        .option("path", d)
        .option("txnAppId", "graft-sink-spec")
        .option("checkpointLocation", base + "/ck-d")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        in.addData((3L, "c"))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.format("graft").load(d)
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
      // the sink really is the E56 delta sink: batch ids ride txn marks
      assert(graft.tables.DeltaLog.snapshot(spark, d, withFiles = false)
        .txns.contains("graft-sink-spec"))
    }

    // iceberg leg through the same name
    locally {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val i = base + "/i"
      val q = in.toDF().toDF("id", "v").writeStream
        .format("graft")
        .option("format", "iceberg")
        .option("path", i)
        .option("txnAppId", "graft-sink-spec")
        .option("checkpointLocation", base + "/ck-i")
        .outputMode(OutputMode.Append()).start()
      try { in.addData((7L, "x")); q.processAllAvailable() } finally q.stop()
      assert(spark.read.format("graft").load(i)
        .as[(Long, String)].collect().toSet == Set((7L, "x")))
    }

    // a NEW table without an explicit format refuses at start
    locally {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val e = intercept[Exception] {
        in.toDF().toDF("id", "v").writeStream
          .format("graft")
          .option("path", base + "/nowhere")
          .option("txnAppId", "x")
          .option("checkpointLocation", base + "/ck-n")
          .outputMode(OutputMode.Append()).start()
      }
      assert(e.getMessage.contains("format"), e.getMessage)
    }
  }

  // ---------------- DSv2 catalog plugin ----------------

  private def withCatalog[A](body: => A): A = {
    spark.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    try body finally spark.conf.unset("spark.sql.catalog.graft")
  }

  test("DSv2 catalog: direct path SQL, auto-detected and format-pinned") {
    val base = tempDir("graft-cat").toString
    val (d, i, h) = (base + "/d", base + "/i", base + "/h")
    DeltaWrite.append(spark, rows, d, Seq("part"))
    IcebergWrite.append(spark, rows, i, Seq("part"))
    HudiWrite.bulkInsert(spark, rows, h, "id", Seq("part"))
    withCatalog {
      for (p <- Seq(d, i, h)) {
        val got = spark.sql(s"SELECT id FROM graft.`$p` ORDER BY id")
          .as[Long].collect().toSeq
        assert(got == (0L to 11L), s"direct SQL failed for $p")
      }
      // pinned-format namespace
      assert(spark.sql(s"SELECT count(*) FROM graft.delta.`$d`").as[Long].head() == 12L)
      assert(spark.sql(s"SELECT count(*) FROM graft.iceberg.`$i`").as[Long].head() == 12L)
      assert(spark.sql(s"SELECT count(*) FROM graft.hudi.`$h`").as[Long].head() == 12L)
      // mismatched pin refuses
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.hudi.`$d`").collect()
      }
      assert(e.getMessage.contains("delta table, not the requested hudi"))
      // arbitrary SQL composes (join through the catalog)
      val j = spark.sql(
        s"""SELECT a.part, count(*) AS n FROM graft.`$d` a
           |JOIN graft.`$i` b ON a.id = b.id GROUP BY a.part ORDER BY a.part""".stripMargin)
        .as[(Long, Long)].collect().toSeq
      assert(j == Seq((0L, 4L), (1L, 4L), (2L, 4L)))
    }
  }

  test("DSv2 catalog: INSERT INTO appends, INSERT OVERWRITE replaces") {
    val base = tempDir("graft-cat-ins").toString
    val (d, i, h) = (base + "/d", base + "/i", base + "/h")
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d)
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), i)
    HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), h, "id")
    withCatalog {
      spark.sql(s"INSERT INTO graft.`$d` VALUES (2, 'b')")
      spark.sql(s"INSERT INTO graft.`$i` VALUES (2, 'b')")
      // hudi INSERT is the format's own key-merged upsert
      spark.sql(s"INSERT INTO graft.`$h` VALUES (1, 'A'), (2, 'b')")
      def readIds(p: String) = spark.sql(s"SELECT id, v FROM graft.`$p`")
        .as[(Long, String)].collect().toSet
      assert(readIds(d) == Set((1L, "a"), (2L, "b")))
      assert(readIds(i) == Set((1L, "a"), (2L, "b")))
      assert(readIds(h) == Set((1L, "A"), (2L, "b")))

      spark.sql(s"INSERT OVERWRITE graft.`$d` VALUES (9, 'z')")
      assert(readIds(d) == Set((9L, "z")))
      spark.sql(s"INSERT OVERWRITE graft.`$i` VALUES (9, 'z')")
      assert(readIds(i) == Set((9L, "z")))
      val e = intercept[Exception] {
        spark.sql(s"INSERT OVERWRITE graft.`$h` VALUES (9, 'z')")
      }
      assert(e.getMessage.contains("Hudi"), e.getMessage)
    }
  }

  test("DSv2 catalog: DELETE FROM routes to each format's native delete") {
    val base = tempDir("graft-cat-del").toString
    val (d, i, h) = (base + "/d", base + "/i", base + "/h")
    DeltaWrite.append(spark, rows, d, Seq("part"))
    IcebergWrite.append(spark, rows, i, Seq("part"))
    HudiWrite.bulkInsert(spark, rows, h, "id", Seq("part"))
    withCatalog {
      spark.sql(s"DELETE FROM graft.`$d` WHERE part = 1")
      spark.sql(s"DELETE FROM graft.`$i` WHERE id >= 8")
      spark.sql(s"DELETE FROM graft.`$h` WHERE part = 2")
      def ids(p: String) = spark.sql(s"SELECT id FROM graft.`$p`")
        .as[Long].collect().toSet
      assert(ids(d) == (0L to 11L).filterNot(_ % 3 == 1).toSet)
      assert(ids(i) == (0L to 7L).toSet)
      assert(ids(h) == (0L to 11L).filterNot(_ % 3 == 2).toSet)
      // predicates outside the algebra run residually (r15): the full
      // predicate selects rows even though nothing prunes
      spark.sql(s"DELETE FROM graft.`$d` WHERE name LIKE 'n1%'")
      assert(ids(d) == Set(0L, 2L, 3L, 5L, 6L, 8L, 9L),
        "LIKE must delete n11 (n1/n10 were already gone)")
      // DELETE without WHERE: delta supports it, iceberg refuses via
      // its own contract
      spark.sql(s"DELETE FROM graft.`$d`")
      assert(ids(d).isEmpty)
    }
  }

  test("DSv2 catalog: filter, column and LIMIT pushdown reach the scan") {
    val dir = tempDir("graft-cat-push").toString + "/d"
    DeltaWrite.append(spark, rows, dir, Seq("part"))
    withCatalog {
      // filter + projection: the pushed filter is visible on the scan
      // node and the scan emits only matching rows
      val q = spark.sql(s"SELECT id FROM graft.`$dir` WHERE part = 1")
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("EqualTo(part,1"),
        s"filter not pushed:\n$plan")
      assert(q.as[Long].collect().toSet == Set(1L, 4L, 7L, 10L))

      // LIMIT lands inside the scan (the V1Scan bridge carries it), so
      // a LIMIT 1 probe never plans a full-table pass
      val lim = spark.sql(s"SELECT id FROM graft.`$dir` LIMIT 3")
      val scans = lim.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan
      }
      assert(scans.nonEmpty, "no DSv2 scan in the optimized plan")
      scans.map {
        case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper => w.v1Scan
        case other => other
      }.foreach {
        case b: GraftV1ScanBridge => // accessible: same package
          assert(b.pushedLimit.contains(3), s"limit not pushed: ${b.pushedLimit}")
        case other => fail(s"unexpected scan ${other.getClass}")
      }
      assert(lim.as[Long].collect().length == 3)
    }
  }

  test("DSv2 catalog: UPDATE routes to the native copy-on-write writer") {
    val dir = tempDir("graft-cat-upd").toString + "/d"
    DeltaWrite.append(spark, rows, dir, Seq("part"))
    withCatalog {
      spark.sql(s"UPDATE graft.`$dir` SET name = concat(name, '!') WHERE id >= 10")
      val got = spark.sql(s"SELECT id, name FROM graft.`$dir` ORDER BY id")
        .as[(Long, String)].collect().toSeq
      assert(got.filter(_._1 >= 10).map(_._2) == Seq("n10!", "n11!"))
      assert(got.filter(_._1 < 10).forall(r => r._2 == s"n${r._1}"))
      // SET expressions see PRE-update values; unconditioned UPDATE
      // touches every row
      spark.sql(s"UPDATE graft.delta.`$dir` SET id = id + 100")
      assert(spark.sql(s"SELECT min(id) FROM graft.`$dir`").as[Long].head() == 100L)
      // Iceberg UPDATE (r15): copy-on-write rewrite of the matched
      // files in one snapshot — values, predicates and the untouched
      // rows all exact
      val i = tempDir("graft-cat-updi").toString + "/i"
      IcebergWrite.append(spark,
        Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "v", "x"), i)
      spark.sql(s"UPDATE graft.`$i` SET v = concat(v, '!'), x = x + 1 WHERE id >= 2")
      assert(spark.sql(s"SELECT id, v, x FROM graft.`$i`")
        .as[(Long, String, Long)].collect().toSet ==
        Set((1L, "a", 10L), (2L, "b!", 21L), (3L, "c!", 31L)))

      // Hudi UPDATE: one atomic key-merged upsert of the rewritten
      // matches; SET sees pre-update values
      val h = tempDir("graft-cat-updh").toString + "/h"
      HudiWrite.bulkInsert(spark,
        Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "v", "x"),
        h, "id")
      spark.sql(s"UPDATE graft.`$h` SET v = concat(v, '!'), x = x + 1 WHERE id >= 2")
      assert(spark.sql(s"SELECT id, v, x FROM graft.`$h`")
        .as[(Long, String, Long)].collect().toSet ==
        Set((1L, "a", 10L), (2L, "b!", 21L), (3L, "c!", 31L)))
      // the record key is not updatable (a changed key would insert)
      val ek = intercept[Exception] {
        spark.sql(s"UPDATE graft.`$h` SET id = id + 100")
      }
      assert(ek.getMessage.contains("key/partition column"), ek.getMessage)
      // no-match UPDATE commits nothing
      val commits = new org.apache.hadoop.fs.Path(h, ".hoodie")
      val fs2 = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val n0 = fs2.listStatus(commits).count(_.getPath.getName.endsWith(".commit"))
      spark.sql(s"UPDATE graft.`$h` SET v = 'z' WHERE id = 999")
      assert(fs2.listStatus(commits)
        .count(_.getPath.getName.endsWith(".commit")) == n0)
    }
  }

  test("DSv2 catalog: MERGE INTO upserts through each format's native writer") {
    val base = tempDir("graft-cat-mrg").toString
    val (d, i, h) = (base + "/d", base + "/i", base + "/h")
    val init = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    DeltaWrite.append(spark, init, d)
    IcebergWrite.append(spark, init, i)
    HudiWrite.bulkInsert(spark, init, h, "id")
    Seq((2L, "B"), (3L, "c")).toDF("id", "v").createOrReplaceTempView("mrg_src")
    withCatalog {
      for (p <- Seq(d, i, h)) {
        spark.sql(
          s"""MERGE INTO graft.`$p` t USING mrg_src s ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        val got = spark.sql(s"SELECT id, v FROM graft.`$p`")
          .as[(Long, String)].collect().toSet
        assert(got == Set((1L, "a"), (2L, "B"), (3L, "c")), s"merge failed for $p")
      }
    }
  }

  test("DSv2 catalog: MERGE WHEN MATCHED AND cond THEN DELETE (Delta)") {
    val d = tempDir("graft-cat-mrgd").toString + "/d"
    DeltaWrite.append(spark, Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 0))
      .toDF("id", "v", "dead"), d)
    Seq((2L, "B", 1), (3L, "C", 0), (4L, "d", 0)).toDF("id", "v", "dead")
      .createOrReplaceTempView("mrg_del_src")
    withCatalog {
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mrg_del_src s ON t.id = s.id
           |WHEN MATCHED AND s.dead = 1 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = spark.sql(s"SELECT id, v FROM graft.`$d`")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a"), (3L, "C"), (4L, "d")))
    }
  }

  test("DSv2 catalog: MERGE WHEN MATCHED AND cond THEN UPDATE SET x = expr (triad)") {
    val base = tempDir("graft-cat-mrgc").toString
    val (d, i, h) = (base + "/d", base + "/i", base + "/h")
    val init = Seq((1L, "a", 5L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "v", "x")
    DeltaWrite.append(spark, init, d)
    IcebergWrite.append(spark, init, i)
    HudiWrite.bulkInsert(spark, init, h, "id")
    // source: id=1 (s.x>t.x → updated), id=2 (s.x<t.x → kept
    // UNTOUCHED), id=4 (unmatched → inserted)
    Seq((1L, "A", 7L), (2L, "B", 6L), (4L, "d", 40L)).toDF("id", "v", "x")
      .createOrReplaceTempView("mrg_cond_src")
    withCatalog {
      for (p <- Seq(d, i, h)) {
        spark.sql(
          s"""MERGE INTO graft.`$p` t USING mrg_cond_src s ON t.id = s.id
             |WHEN MATCHED AND s.x > t.x THEN UPDATE SET v = upper(s.v), x = s.x + t.x
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        val got = spark.sql(s"SELECT id, v, x FROM graft.`$p`")
          .as[(Long, String, Long)].collect().toSet
        // id=1: SET sees both sides (x = 7+5); id=2 untouched (its
        // matched source row fails the condition); id=3 untouched
        // (unmatched by source); id=4 inserted verbatim
        assert(got == Set((1L, "A", 12L), (2L, "b", 20L),
          (3L, "c", 30L), (4L, "d", 40L)), s"conditional merge failed for $p")
      }
      // conditional SET *: the whole source row, only where cond holds
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mrg_cond_src s ON t.id = s.id
           |WHEN MATCHED AND s.id = 2 THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.sql(s"SELECT id, v, x FROM graft.`$d` WHERE id IN (1, 2)")
        .as[(Long, String, Long)].collect().toSet ==
        Set((1L, "A", 12L), (2L, "B", 6L)))
      // conditional update COMPOSES with the conditional delete
      Seq((1L, "kill", 0L), (4L, "up", 99L), (9L, "kill", 0L))
        .toDF("id", "v", "x").createOrReplaceTempView("mrg_cond_del_src")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mrg_cond_del_src s ON t.id = s.id
           |WHEN MATCHED AND s.v = 'kill' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET x = s.x
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val after = spark.sql(s"SELECT id, v, x FROM graft.`$d`")
        .as[(Long, String, Long)].collect().toSet
      // id=1 delete-matched → gone; id=4 updated (x=99, v kept);
      // id=9 delete-conditioned but UNMATCHED → inserts (SQL clause
      // fall-through); others untouched
      assert(after == Set((2L, "B", 6L), (3L, "c", 30L),
        (4L, "d", 99L), (9L, "kill", 0L)), after.toString)
    }
  }

  test("DSv2 catalog: MERGE honors matched-clause STATEMENT ORDER; delete-only works") {
    val base = tempDir("graft-cat-mrgo").toString
    // UPDATE before DELETE: SQL first-match-wins — rows satisfying the
    // update condition update; only the REST delete
    val d1 = base + "/d1"
    DeltaWrite.append(spark,
      Seq((1L, 5L), (2L, 20L), (3L, 30L)).toDF("id", "x"), d1)
    Seq((1L, 7L), (2L, 6L), (9L, 90L)).toDF("id", "x")
      .createOrReplaceTempView("mrg_ord_src")
    withCatalog {
      spark.sql(
        s"""MERGE INTO graft.`$d1` t USING mrg_ord_src s ON t.id = s.id
           |WHEN MATCHED AND s.x > t.x THEN UPDATE SET x = s.x
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.sql(s"SELECT id, x FROM graft.`$d1`")
        .as[(Long, Long)].collect().toSet ==
        Set((1L, 7L),            // update clause fired first (s.x > t.x)
          (3L, 30L),             // unmatched by source: untouched
          (9L, 90L)))            // inserted; id=2 fell through to DELETE
      // DELETE before UPDATE: the delete wins where its condition holds
      val d2 = base + "/d2"
      DeltaWrite.append(spark,
        Seq((1L, 5L), (2L, 20L)).toDF("id", "x"), d2)
      spark.sql(
        s"""MERGE INTO graft.`$d2` t USING mrg_ord_src s ON t.id = s.id
           |WHEN MATCHED AND s.x > t.x THEN DELETE
           |WHEN MATCHED THEN UPDATE SET x = s.x + 100
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.sql(s"SELECT id, x FROM graft.`$d2`")
        .as[(Long, Long)].collect().toSet ==
        Set((2L, 106L), (9L, 90L))) // id=1 deleted (7 > 5); id=2 updated
      // delete-ONLY merge (no update clause): matched rows delete,
      // unmatched insert, everything else untouched
      val d3 = base + "/d3"
      DeltaWrite.append(spark,
        Seq((1L, 5L), (2L, 20L)).toDF("id", "x"), d3)
      spark.sql(
        s"""MERGE INTO graft.`$d3` t USING mrg_ord_src s ON t.id = s.id
           |WHEN MATCHED AND s.x < t.x THEN DELETE
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.sql(s"SELECT id, x FROM graft.`$d3`")
        .as[(Long, Long)].collect().toSet ==
        Set((1L, 5L),            // matched but condition false: kept
          (9L, 90L)))            // inserted; id=2 deleted (6 < 20)
    }
  }

  test("DSv2 catalog: unsupported MERGE shapes refuse with the shape named") {
    val d = tempDir("graft-cat-mrgr").toString + "/d"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d)
    Seq((1L, "A")).toDF("id", "v").createOrReplaceTempView("mrg_bad_src")
    withCatalog {
      // WHEN NOT MATCHED BY SOURCE is served since late r15 — with
      // every target row matched, the clause is a no-op here
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mrg_bad_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(spark.sql(s"SELECT id, v FROM graft.`$d`")
        .as[(Long, String)].collect().toSeq == Seq((1L, "A")))
      // non-equality ON
      val e2 = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO graft.`$d` t USING mrg_bad_src s ON t.id >= s.id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      assert(e2.getMessage.contains("conjunction of column equalities"),
        e2.getMessage)
      // MERGE into a Hudi table keyed off its record key
      val h = tempDir("graft-cat-mrgrh").toString + "/h"
      HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), h, "id")
      Seq(("a", 9L)).toDF("v", "id").createOrReplaceTempView("mrg_bad_hudi")
      val e3 = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO graft.`$h` t USING mrg_bad_hudi s ON t.v = s.v
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      assert(e3.getMessage.contains("record key"), e3.getMessage)
      // an insert-only MERGE (no WHEN MATCHED clause) is served since
      // late r15: matched rows stay untouched, unmatched rows insert
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mrg_bad_src s ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.sql(s"SELECT id, v FROM graft.`$d`")
        .as[(Long, String)].collect().toSeq == Seq((1L, "A")))
      // a delete condition referencing TARGET columns routes through
      // the pairing path and evaluates correctly (r15 — previously a
      // refusal): target row (1,'a') matches t.v = 'a' and deletes
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mrg_bad_src s ON t.id = s.id
           |WHEN MATCHED AND t.v = 'a' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.sql(s"SELECT count(*) FROM graft.`$d` WHERE v = 'a'")
        .as[Long].head() == 0L)
    }
  }

  test("DSv2 catalog: CREATE TABLE + CTAS across the triad") {
    val base = tempDir("graft-cat-create").toString
    withCatalog {
      // plain CREATE, pinned namespace, partitioned
      spark.sql(s"CREATE TABLE graft.delta.`$base/d` (id BIGINT, v STRING, p INT) " +
        "PARTITIONED BY (p)")
      spark.sql(s"INSERT INTO graft.`$base/d` VALUES (1, 'a', 0), (2, 'b', 1)")
      assert(spark.sql(s"SELECT id FROM graft.`$base/d` WHERE p = 1")
        .as[Long].collect().toSeq == Seq(2L))
      // USING spelling + TBLPROPERTIES land in the Delta config
      spark.sql(s"CREATE TABLE graft.`$base/d2` (id BIGINT) USING delta " +
        "TBLPROPERTIES ('delta.appendOnly' = 'true')")
      assert(graft.tables.DeltaLog.snapshot(spark, s"$base/d2", withFiles = false)
        .metadata.configuration.get("delta.appendOnly").contains("true"))
      // iceberg CREATE: empty first snapshot reads as zero rows
      spark.sql(s"CREATE TABLE graft.iceberg.`$base/i` (id BIGINT, v STRING)")
      assert(spark.sql(s"SELECT count(*) FROM graft.`$base/i`").as[Long].head() == 0L)
      spark.sql(s"INSERT INTO graft.`$base/i` VALUES (7, 'x')")
      assert(spark.sql(s"SELECT id, v FROM graft.`$base/i`")
        .as[(Long, String)].head() == ((7L, "x")))
      // hudi CREATE needs the record key property
      val eh = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.hudi.`$base/h0` (id BIGINT)")
      }
      assert(eh.getMessage.contains("recordKey"), eh.getMessage)
      spark.sql(s"CREATE TABLE graft.hudi.`$base/h` (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('recordKey' = 'id')")
      spark.sql(s"INSERT INTO graft.`$base/h` VALUES (1, 'a'), (2, 'b')")
      // hudi insert is the key-merged upsert: a second insert of an
      // existing key replaces it
      spark.sql(s"INSERT INTO graft.`$base/h` VALUES (1, 'A2')")
      assert(spark.sql(s"SELECT id, v FROM graft.`$base/h`")
        .as[(Long, String)].collect().toSet == Set((1L, "A2"), (2L, "b")))
      // CTAS
      spark.sql(s"CREATE TABLE graft.delta.`$base/ctas` AS " +
        s"SELECT id, v FROM graft.`$base/i`")
      assert(spark.sql(s"SELECT id, v FROM graft.`$base/ctas`")
        .as[(Long, String)].head() == ((7L, "x")))
      // existing table refuses CREATE
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.delta.`$base/d` (id BIGINT)")
      }
      assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
    }
  }

  test("DSv2 catalog: ALTER TABLE DDL routes to the native Delta DDL") {
    val d = tempDir("graft-cat-alter").toString + "/d"
    DeltaWrite.append(spark, Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("id", "v", "x"), d)
    withCatalog {
      // mapping upgrade via SET TBLPROPERTIES (the delta-spark shape)
      spark.sql(s"ALTER TABLE graft.`$d` SET TBLPROPERTIES " +
        "('delta.columnMapping.mode' = 'name')")
      assert(graft.tables.DeltaLog.snapshot(spark, d, withFiles = false)
        .metadata.isColumnMapped)
      spark.sql(s"ALTER TABLE graft.`$d` RENAME COLUMN v TO label")
      spark.sql(s"ALTER TABLE graft.`$d` DROP COLUMN x")
      spark.sql(s"ALTER TABLE graft.`$d` ADD COLUMNS (score DOUBLE)")
      val got = spark.sql(s"SELECT id, label, score FROM graft.`$d` ORDER BY id")
        .as[(Long, String, Option[Double])].collect().toSeq
      assert(got == Seq((1L, "a", None), (2L, "b", None)))
      // id-mode upgrade refuses here too
      val d2 = tempDir("graft-cat-alter2").toString + "/d"
      DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d2)
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$d2` SET TBLPROPERTIES " +
          "('delta.columnMapping.mode' = 'id')")
      }
      assert(e.getMessage.contains("'id'"), e.getMessage)
      // non-delta ALTER refuses with the append-evolution hint
      val i = tempDir("graft-cat-alter3").toString + "/i"
      IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), i)
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$i` ADD COLUMNS (z INT)")
      }
      assert(e2.getMessage.contains("evolves on append"), e2.getMessage)
      // SHOW TBLPROPERTIES surfaces the live Delta configuration
      // (provider/location are Spark-reserved keys SHOW hides; the
      // live Delta configuration is the point)
      val props = spark.sql(s"SHOW TBLPROPERTIES graft.`$d`")
        .as[(String, String)].collect().toMap
      assert(props.get("delta.columnMapping.mode").contains("name"), props)
      // UNSET TBLPROPERTIES routes too
      spark.sql(s"ALTER TABLE graft.`$d` SET TBLPROPERTIES ('tier' = 'gold')")
      spark.sql(s"ALTER TABLE graft.`$d` UNSET TBLPROPERTIES ('tier')")
      assert(!spark.sql(s"SHOW TBLPROPERTIES graft.`$d`")
        .as[(String, String)].collect().toMap.contains("tier"))
    }
  }

  test("DSv2 catalog: DROP refuses, DROP PURGE deletes, RENAME refuses permanently") {
    val d = tempDir("graft-cat-drop").toString + "/d"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d)
    withCatalog {
      val e = intercept[Exception](spark.sql(s"DROP TABLE graft.`$d`"))
      assert(e.getMessage.contains("PURGE"), e.getMessage)
      assert(new java.io.File(d).exists)
      spark.sql(s"DROP TABLE graft.`$d` PURGE")
      assert(!new java.io.File(d).exists)
      // a non-table path cannot be purged (loadTable gates it)
      val plain = tempDir("graft-cat-nodrop").toString + "/x"
      new java.io.File(plain).mkdirs()
      intercept[Exception](spark.sql(s"DROP TABLE graft.`$plain` PURGE"))
      assert(new java.io.File(plain).exists)
      val d2 = tempDir("graft-cat-ren").toString + "/d2"
      DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d2)
      val er = intercept[Exception](
        spark.sql(s"ALTER TABLE graft.`$d2` RENAME TO graft.`${d2}x`"))
      assert(er.getMessage.contains("permanently"), er.getMessage)
    }
  }

  test("DSv2 catalog: VERSION/TIMESTAMP AS OF time travel across the triad") {
    val base = tempDir("graft-cat-tt").toString
    val d = base + "/d"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), d)
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), d)
    withCatalog {
      // delta: numeric version
      assert(spark.sql(s"SELECT id FROM graft.`$d` VERSION AS OF 0")
        .as[Long].collect().toSeq == Seq(1L))
      assert(spark.sql(s"SELECT id FROM graft.`$d`")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      // TIMESTAMP AS OF "now" resolves to the head version
      val now = java.sql.Timestamp.from(java.time.Instant.now().plusSeconds(1))
      assert(spark.sql(s"SELECT count(*) FROM graft.`$d` TIMESTAMP AS OF '$now'")
        .as[Long].head() == 2L)
      // time-traveled tables are read-only through the catalog
      val ew = intercept[Exception] {
        spark.sql(s"DELETE FROM graft.`$d` VERSION AS OF 0 WHERE id = 1")
      }
      assert(ew.getMessage.toLowerCase.contains("time-traveled") ||
        ew.getMessage.toLowerCase.contains("syntax"), ew.getMessage)

      // iceberg: snapshot id AND named ref through VERSION AS OF
      val i = base + "/i"
      val s0 = IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), i)
      IcebergWrite.setRef(spark, i, "audit", snapshotId = Some(s0))
      IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), i)
      assert(spark.sql(s"SELECT id FROM graft.`$i` VERSION AS OF $s0")
        .as[Long].collect().toSeq == Seq(1L))
      assert(spark.sql(s"SELECT id FROM graft.`$i` VERSION AS OF 'audit'")
        .as[Long].collect().toSeq == Seq(1L))
      assert(spark.sql(s"SELECT id FROM graft.`$i`")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))

      // hudi: instant travel (first commit's instant)
      val h = base + "/h"
      HudiWrite.bulkInsert(spark, Seq((1L, "a")).toDF("id", "v"), h, "id")
      val fs = new org.apache.hadoop.fs.Path(h)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val first = fs.listStatus(new org.apache.hadoop.fs.Path(h, ".hoodie"))
        .map(_.getPath.getName).filter(_.endsWith(".commit"))
        .map(_.stripSuffix(".commit")).min
      HudiWrite.upsert(spark, Seq((2L, "b")).toDF("id", "v"), h)
      assert(spark.sql(s"SELECT id FROM graft.`$h` VERSION AS OF '$first'")
        .as[Long].collect().toSeq == Seq(1L))
      assert(spark.sql(s"SELECT id FROM graft.`$h`")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    }
  }
}
