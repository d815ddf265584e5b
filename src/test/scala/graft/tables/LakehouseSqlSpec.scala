package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LakehouseSqlSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq(
    (1L, "a", 0), (2L, "b", 0), (3L, "c", 1), (4L, "d", 1), (5L, "e", 2))
    .toDF("id", "v", "p")

  test("iceberg: SELECT prunes manifests, DELETE routes, DESCRIBE lists") {
    val root = tempDir("lake-sql-i").toString + "/t"
    IcebergWrite.append(spark, data, root, Seq("p"))

    val sel = LakehouseSql.exec(spark,
      s"SELECT id, v FROM iceberg.`$root` WHERE p = 1")
    assert(sel.columns.toSeq == Seq("id", "v"))
    assert(sel.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // the WHERE rides the Filter algebra → only the p=1 file planned
    assert(sel.inputFiles.nonEmpty && sel.inputFiles.forall(_.contains("p=1")),
      sel.inputFiles.toSeq)

    LakehouseSql.exec(spark, s"DELETE FROM iceberg.`$root` WHERE id = 3")
    assert(LakehouseSql.exec(spark, s"SELECT * FROM iceberg.`$root`")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L))

    // time travel: the pre-delete snapshot still shows id 3
    val snaps = IcebergMetaTables.snapshots(spark, root)
      .orderBy("snapshot_id").select("snapshot_id").as[Long].collect()
    assert(LakehouseSql.exec(spark,
      s"SELECT id FROM iceberg.`$root` SNAPSHOT AS OF ${snaps.head}")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))

    assert(LakehouseSql.exec(spark, s"DESCRIBE SNAPSHOTS iceberg.`$root`").count() == 2)
    assert(LakehouseSql.exec(spark, s"DESCRIBE FILES iceberg.`$root`")
      .where(col("content") === 1).count() == 1)
    val expired = LakehouseSql.exec(spark, s"EXPIRE SNAPSHOTS iceberg.`$root` KEEP 1")
    assert(expired.count() == 1)
  }

  test("hudi: SELECT with IN filter, key-resolving DELETE, DESCRIBE TIMELINE") {
    val root = tempDir("lake-sql-h").toString + "/t"
    HudiWrite.bulkInsert(spark, data, root, "id", Seq("p"))

    val sel = LakehouseSql.exec(spark,
      s"SELECT id FROM hudi.`$root` WHERE p in (0, 2)")
    assert(sel.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))

    LakehouseSql.exec(spark, s"DELETE FROM hudi.`$root` WHERE v = 'b'")
    assert(LakehouseSql.exec(spark, s"SELECT id FROM hudi.`$root`")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L, 5L))

    // time travel to the bulk-insert instant: the delete not yet applied
    val i1 = HudiMetaTables.timeline(spark, root)
      .orderBy("instant").select("instant").as[String].head()
    assert(LakehouseSql.exec(spark,
      s"SELECT id FROM hudi.`$root` AS OF '$i1'")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))

    assert(LakehouseSql.exec(spark, s"DESCRIBE TIMELINE hudi.`$root`").count() == 2)
    assert(LakehouseSql.exec(spark, s"DESCRIBE SLICES hudi.`$root`").count() >= 3)
  }

  test("SUMMARIZE profiles every atomic column of a lakehouse table") {
    val root = tempDir("lake-sql-s").toString + "/t"
    IcebergWrite.append(spark, data, root, Seq("p"))
    val prof = LakehouseSql.exec(spark, s"SUMMARIZE iceberg.`$root`")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof.keySet == Set("id", "v", "p"))
    assert(prof.values.forall(_ == 5L))
  }

  test("OPTIMIZE WHERE routes to the scoped Iceberg rewrite") {
    val root = tempDir("lake-sql-o").toString + "/t"
    (1 to 2).foreach(_ => IcebergWrite.append(spark, data, root, Seq("p")))
    val sid = LakehouseSql.exec(spark, s"OPTIMIZE iceberg.`$root` WHERE p = 1")
      .collect()(0).getLong(0)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergMeta.load(fs, root)
    assert(meta.currentSnapshotId.contains(sid))
    assert(meta.snapshots.find(_.id == sid).flatMap(_.operation).contains("replace"))
  }

  test("CLUSTER BY routes to Hudi clustering, optionally partition-scoped") {
    val root = tempDir("lake-sql-c").toString + "/t"
    HudiWrite.bulkInsert(spark, data, root, "id", Seq("p"))
    HudiWrite.bulkInsert(spark,
      Seq((6L, "f", 0), (7L, "g", 1)).toDF("id", "v", "p"), root, "id", Seq("p"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def groups(p: String) =
      HudiWrite.latestSlices(fs, root, None).filter(_.partition == p).map(_.fileId).toSet
    val g1 = groups("p=1")
    assert(groups("p=0").size >= 2 && g1.size >= 2)
    LakehouseSql.exec(spark, s"CLUSTER hudi.`$root` BY (id) PARTITIONS ('p=0')")
    assert(groups("p=0").size == 1 && groups("p=1") == g1)
    assert(new HudiTable("t", root)(spark, ReadArgs.empty)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("OPTIMIZE ZORDER BY routes to the z-ordered Iceberg rewrite") {
    val root = tempDir("lake-sql-z").toString + "/t"
    val rows = (for { a <- 0 until 8; b <- 0 until 8 }
      yield ((a * 8 + b).toLong, a, b)).toDF("id", "a", "b")
    IcebergWrite.append(spark, rows, root)
    LakehouseSql.exec(spark, s"OPTIMIZE iceberg.`$root` ZORDER BY (a, b)")
    val read = new IcebergTable("t", root)(spark, ReadArgs.empty)
    val files = read.inputFiles
    assert(files.length == 1)
    val inFile = spark.read.parquet(files.head).coalesce(1)
    val ab = inFile.select("a", "b").as[(Int, Int)].collect().toSeq
    assert(ab != ab.sortBy(identity), "ZORDER BY produced a lexicographic layout")
    assert(read.count() == 64)
  }

  test("COMPACT routes to Hudi MOR compaction with optional partition scope") {
    val root = tempDir("lake-sql-mc").toString + "/t"
    HudiWrite.bulkInsert(spark, data, root, "id", Seq("p"),
      tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark,
      Seq((1L, "A", 0), (3L, "C", 1)).toDF("id", "v", "p"), root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def loggedParts = HudiWrite.latestSlices(fs, root, None)
      .filter(_.logFiles.nonEmpty).map(_.partition).toSet
    assert(loggedParts == Set("p=0", "p=1"))
    val i = LakehouseSql.exec(spark, s"COMPACT hudi.`$root` PARTITIONS ('p=0')")
      .collect()(0).getString(0)
    assert(i.nonEmpty && loggedParts == Set("p=1"))
    // nothing left to compact there: empty instant comes back
    assert(LakehouseSql.exec(spark, s"COMPACT hudi.`$root` PARTITIONS ('p=0')")
      .collect()(0).getString(0).isEmpty)
  }

  test("INSERT INTO iceberg creates+appends from a SELECT; UPSERT merges by key") {
    val root = tempDir("lake-sql-wi").toString + "/t"
    data.createOrReplaceTempView("lh_spec_src")
    val snap1 = LakehouseSql.exec(spark,
      s"INSERT INTO iceberg.`$root` SELECT id, v FROM lh_spec_src WHERE p < 2")
      .collect()(0).getLong(0)
    assert(snap1 == 1L)
    assert(LakehouseSql.exec(spark, s"SELECT id FROM iceberg.`$root`")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // second INSERT appends
    LakehouseSql.exec(spark,
      s"INSERT INTO iceberg.`$root` SELECT id, v FROM lh_spec_src WHERE p = 2")
    // UPSERT: replace id=1, insert id=9 — one atomic snapshot
    Seq((1L, "A!"), (9L, "i")).toDF("id", "v")
      .createOrReplaceTempView("lh_spec_up")
    LakehouseSql.exec(spark,
      s"UPSERT INTO iceberg.`$root` USING lh_spec_up ON id")
    val got = LakehouseSql.exec(spark, s"SELECT id, v FROM iceberg.`$root`")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "A!"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (9L, "i")))
    // MERGE spelling routes identically
    Seq((2L, "B!")).toDF("id", "v").createOrReplaceTempView("lh_spec_up2")
    LakehouseSql.exec(spark, s"MERGE INTO iceberg.`$root` USING lh_spec_up2 ON id")
    assert(LakehouseSql.exec(spark, s"SELECT v FROM iceberg.`$root` WHERE id = 2")
      .as[String].collect().toSeq == Seq("B!"))
  }

  test("INSERT INTO hudi bulk-inserts with the table's key; UPSERT merges") {
    val root = tempDir("lake-sql-wh").toString + "/t"
    HudiWrite.bulkInsert(spark, data, root, "id", Seq("p"))
    Seq((6L, "f", 2), (7L, "g", 0)).toDF("id", "v", "p")
      .createOrReplaceTempView("lh_spec_hsrc")
    val instant = LakehouseSql.exec(spark,
      s"INSERT INTO hudi.`$root` SELECT id, v, p FROM lh_spec_hsrc")
      .collect()(0).getString(0)
    assert(instant.nonEmpty)
    assert(LakehouseSql.exec(spark, s"SELECT id FROM hudi.`$root`")
      .as[Long].collect().sorted.toSeq == (1L to 7L))
    Seq((1L, "A!", 0), (8L, "h", 1)).toDF("id", "v", "p")
      .createOrReplaceTempView("lh_spec_hup")
    LakehouseSql.exec(spark, s"UPSERT INTO hudi.`$root` USING lh_spec_hup")
    val got = LakehouseSql.exec(spark, s"SELECT id, v FROM hudi.`$root`")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (1L to 8L) && got.head._2 == "A!" && got.last._2 == "h")
    // INSERT INTO a nonexistent hudi table refuses (key is a creation decision)
    intercept[IllegalArgumentException] {
      LakehouseSql.exec(spark,
        s"INSERT INTO hudi.`${root}_nope` SELECT id, v, p FROM lh_spec_hsrc")
    }
  }

  test("unsupported shapes refuse loudly") {
    intercept[IllegalArgumentException] {
      LakehouseSql.exec(spark, "SELECT sum(x) FROM iceberg.`/p`")
    }
    intercept[IllegalArgumentException] {
      LakehouseSql.exec(spark, "TRUNCATE iceberg.`/p`")
    }
  }

  test("DESCRIBE CHANGES serves the typed change stream through SQL") {
    import org.apache.spark.sql.functions.col
    val dir = tempDir("lhsql-chg").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    IcebergWrite.upsertEquality(spark, Seq((2L, "B")).toDF("id", "v"), dir, Seq("id"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val firstSeq = IcebergMeta.load(fs, dir).snapshots.map(_.sequenceNumber).min
    val got = LakehouseSql.exec(spark,
      s"DESCRIBE CHANGES iceberg.`$dir` AFTER $firstSeq")
      .select(col("id").as[Long], col("v").as[String],
        col(DeltaChanges.ChangeTypeCol).as[String])
      .collect().toSet
    assert(got == Set((2L, "b", "delete"), (2L, "B", "insert")))
    // format mismatch refuses
    val e = intercept[IllegalArgumentException] {
      LakehouseSql.exec(spark, s"DESCRIBE CHANGES hudi.`$dir` AFTER 0")
    }
    assert(e.getMessage.contains("not a hudi table"))

    // Delta leg: CDF versions ride as _commit_version
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val ddir = tempDir("lhsql-chg-d").toString + "/t"
    DeltaDdl.createTable(spark, ddir,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), ddir) // v1
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), ddir) // v2
    val dgot = LakehouseSql.exec(spark, s"DESCRIBE CHANGES delta.`$ddir` AFTER 1 TO 2")
      .select(col("id").as[Long], col(DeltaChanges.ChangeTypeCol).as[String],
        col(DeltaChanges.CommitVersionCol).as[Long])
      .collect().toSet
    assert(dgot == Set((2L, "insert", 2L)))

    // Hudi leg: instants ride as _commit_version Longs
    val hdir = tempDir("lhsql-chg-h").toString + "/t"
    val hi1 = HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0)).toDF("id", "v", "part"), hdir, "id", Seq("part"))
    HudiWrite.upsert(spark, Seq((1L, "A", 0)).toDF("id", "v", "part"), hdir)
    val hgot = LakehouseSql.exec(spark, s"DESCRIBE CHANGES hudi.`$hdir` AFTER $hi1")
      .select(col("id").as[Long], col("v").as[String],
        col(DeltaChanges.ChangeTypeCol).as[String])
      .collect().toSet
    assert(hgot == Set((1L, "a", "delete"), (1L, "A", "insert")))
  }

  test("CREATE / SYNC / DESCRIBE REPLICA drive cross-format replication from SQL") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val base = tempDir("lhsql-repl").toString
    val (src, tgt) = (base + "/src", base + "/replica")
    DeltaDdl.createTable(spark, src,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), src)

    val wm0 = LakehouseSql.exec(spark,
      s"CREATE REPLICA iceberg.`$tgt` FROM delta.`$src` ON (id)")
      .select("watermark").as[Long].head()
    assert(new IcebergTable("t", tgt)(spark, ReadArgs.empty)
      .select(col("id").as[Long], col("v").as[String]).collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    DeltaWrite.merge(spark, src,
      Seq((2L, "B"), (9L, "new")).toDF("id", "v"), Seq("id"))
    DeltaWrite.deleteWhere(spark, src,
      graft.core.Filters.normalize(Seq(graft.core.Filter("id", "=", 1))))
    val wm1 = LakehouseSql.exec(spark,
      s"SYNC REPLICA iceberg.`$tgt` FROM delta.`$src` ON (id)")
      .select("watermark").as[Long].head()
    assert(wm1 > wm0)
    assert(new IcebergTable("t", tgt)(spark, ReadArgs.empty)
      .select(col("id").as[Long], col("v").as[String]).collect().toSet ==
      Set((2L, "B"), (3L, "c"), (9L, "new")))

    val d = LakehouseSql.exec(spark, s"DESCRIBE REPLICA iceberg.`$tgt`")
      .as[(String, Long)].head()
    assert(d == ("iceberg", wm1))

    // format mislabels refuse before any engine dispatch
    val e = intercept[IllegalArgumentException] {
      LakehouseSql.exec(spark, s"SYNC REPLICA hudi.`$tgt` FROM delta.`$src` ON (id)")
    }
    assert(e.getMessage.contains("not hudi"))
    val e2 = intercept[IllegalArgumentException] {
      LakehouseSql.exec(spark, s"DESCRIBE REPLICA delta.`$src`")
    }
    assert(e2.getMessage.contains("no replication watermark"))
  }
}
