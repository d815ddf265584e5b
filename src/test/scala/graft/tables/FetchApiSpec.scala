package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.spark.sql.types._

/** Reference partition/path fetch API parity
  * (`fetch_df_by_partition` deltalake_table.py:302-340,
  * `fetch_dfs_by_paths` deltalake_table.py:343-376): direct fetches
  * of named partitions / named files, with the reference's
  * missing-partition → EMPTY-normalized-frame behavior rather than an
  * error.
  */
class FetchApiSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- Delta

  private def deltaFixture(): (String, DeltaTable) = {
    val dir = tempDir("fetch-delta").toString + "/t"
    val df = Seq(
      (1L, "a", 0), (2L, "b", 0), (3L, "c", 1), (4L, "d", 1), (5L, "e", 2)
    ).toDF("id", "v", "part")
    DeltaWrite.append(spark, df, dir, partitionBy = Seq("part"))
    (dir, new DeltaTable("t", dir))
  }

  test("delta byPartitions fetches exactly the named partitions") {
    val (_, t) = deltaFixture()
    val df = t.byPartitions(spark, Seq(Filter("part", "=", 1)))
    assert(df.select("id").as[Long].collect().toSet == Set(3L, 4L))
    // partition-value matching is exact: no file of another partition opens
    assert(df.inputFiles.nonEmpty && df.inputFiles.forall(_.contains("part=1")))
    // multiple partitions via `in`
    val two = t.byPartitions(spark, Seq(Filter("part", "in", Seq(0, 2))))
    assert(two.select("id").as[Long].collect().toSet == Set(1L, 2L, 5L))
  }

  test("delta byPartitions: missing partition is an empty normalized frame") {
    val (_, t) = deltaFixture()
    val df = t.byPartitions(spark, Seq(Filter("part", "=", 99)))
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("id", "v", "part"))
    assert(df.schema("part").dataType == IntegerType)
  }

  test("delta byPartitions refuses non-partition columns") {
    val (_, t) = deltaFixture()
    val e = intercept[IllegalArgumentException] {
      t.byPartitions(spark, Seq(Filter("id", "=", 1L)))
    }
    assert(e.getMessage.contains("partition columns"))
  }

  test("delta byPartitions honors versionAsOf") {
    val (dir, t) = deltaFixture()
    DeltaWrite.append(spark, Seq((6L, "f", 1)).toDF("id", "v", "part"),
      dir, partitionBy = Seq("part"))
    assert(t.byPartitions(spark, Seq(Filter("part", "=", 1)))
      .count() == 3)
    assert(t.byPartitions(spark, Seq(Filter("part", "=", 1)), versionAsOf = Some(0L))
      .select("id").as[Long].collect().toSet == Set(3L, 4L))
  }

  test("delta byPaths reads exactly the named live files, relative or absolute") {
    val (dir, t) = deltaFixture()
    val snap = DeltaLog.snapshot(spark, dir)
    val paths = snap.files.map(_.path).sorted
    val one = t.byPaths(spark, Seq(paths.head))
    assert(one.count() > 0 && one.columns.toSeq == Seq("id", "v", "part"))
    // absolute spelling of the same file reads identically; duplicates collapse
    val abs = dir.stripSuffix("/") + "/" + paths.head
    assert(t.byPaths(spark, Seq(abs, paths.head)).count() == one.count())
    // all files = full table
    assert(t.byPaths(spark, paths).count() == 5)
    // partition column came back typed (it is not stored in the data file)
    assert(one.schema("part").dataType == IntegerType)
  }

  test("delta byPaths refuses paths that are not live in the snapshot") {
    val (dir, t) = deltaFixture()
    val e = intercept[IllegalArgumentException] {
      t.byPaths(spark, Seq("part=0/nonexistent.parquet"))
    }
    assert(e.getMessage.contains("not live"))
    // a removed file refuses too (reading it would resurrect dead rows)
    val v0 = DeltaLog.snapshot(spark, dir).files.map(_.path)
    DeltaWrite.overwrite(spark, Seq((9L, "z", 0)).toDF("id", "v", "part"),
      dir, partitionBy = Seq("part"))
    val gone = intercept[IllegalArgumentException] {
      t.byPaths(spark, Seq(v0.head))
    }
    assert(gone.getMessage.contains("not live"))
    // but the old version still serves it under versionAsOf
    assert(t.byPaths(spark, Seq(v0.head), versionAsOf = Some(0L)).count() > 0)
  }

  // -------------------------------------------------------- Parquet

  private def parquetFixture(scheme: PartitioningScheme): (String, ParquetTable) = {
    val base = tempDir("fetch-pt").toString
    for (impl <- Seq(11, 12); date <- Seq("2024-01-01", "2024-01-02")) {
      val sub = scheme match {
        case PartitioningScheme.Hive      => s"implant_id=$impl/date=$date"
        case PartitioningScheme.Directory => s"$impl/$date"
      }
      Seq((s"v-$impl-$date", impl)).toDF("payload", "reading")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/$sub")
    }
    (base, new ParquetTable("t", base,
      partitioning = Seq(Partition("implant_id", IntegerType), Partition("date", StringType)),
      partitioningScheme = scheme))
  }

  for (scheme <- Seq(PartitioningScheme.Hive, PartitioningScheme.Directory)) {
    test(s"parquet $scheme byPartitions fetches the named partitions") {
      val (_, t) = parquetFixture(scheme)
      val df = t.byPartitions(spark,
        Seq(Filter("implant_id", "=", 11), Filter("date", "=", "2024-01-01")))
      assert(df.select("payload").as[String].collect().toSeq == Seq("v-11-2024-01-01"))
      assert(df.schema("implant_id").dataType == IntegerType)
    }

    test(s"parquet $scheme byPartitions: missing partition is an empty normalized frame") {
      val (_, t) = parquetFixture(scheme)
      val df = t.byPartitions(spark,
        Seq(Filter("implant_id", "=", 99), Filter("date", "=", "2024-01-01")))
      assert(df.count() == 0)
      assert(df.columns.toSet == Set("payload", "reading", "implant_id", "date"))
      assert(df.schema("implant_id").dataType == IntegerType)
    }

    test(s"parquet $scheme byPaths reads the named files with partition columns re-attached") {
      val (base, t) = parquetFixture(scheme)
      val sub = scheme match {
        case PartitioningScheme.Hive      => "implant_id=12/date=2024-01-02"
        case PartitioningScheme.Directory => "12/2024-01-02"
      }
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val leaf = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/$sub"))
        .map(_.getPath.getName).find(_.endsWith(".parquet")).get
      val df = t.byPaths(spark, Seq(s"$sub/$leaf"))
      assert(df.select("payload").as[String].collect().toSeq == Seq("v-12-2024-01-02"))
      assert(df.select("implant_id").as[Int].collect().toSeq == Seq(12))
      assert(df.select("date").as[String].collect().toSeq == Seq("2024-01-02"))
    }
  }

  test("parquet byPartitions refuses non-partition columns") {
    val (_, t) = parquetFixture(PartitioningScheme.Hive)
    val e = intercept[IllegalArgumentException] {
      t.byPartitions(spark, Seq(Filter("payload", "=", "x")))
    }
    assert(e.getMessage.contains("partition columns"))
  }

  test("parquet byPaths refuses a path that does not exist") {
    val (_, t) = parquetFixture(PartitioningScheme.Hive)
    val e = intercept[IllegalArgumentException] {
      t.byPaths(spark, Seq("implant_id=11/date=2024-01-01/nope.parquet"))
    }
    assert(e.getMessage.contains("not a file"))
  }

  test("parquet byPaths refuses a directory (reads exactly the named files)") {
    val (_, t) = parquetFixture(PartitioningScheme.Hive)
    val e = intercept[IllegalArgumentException] {
      t.byPaths(spark, Seq("implant_id=11/date=2024-01-01"))
    }
    assert(e.getMessage.contains("directory"))
  }

  test("parquet byPaths refuses an absolute path outside the table root") {
    val (_, t) = parquetFixture(PartitioningScheme.Hive)
    val other = tempDir("fetch-other").toString
    Seq(("x", 1)).toDF("payload", "reading")
      .coalesce(1).write.mode("overwrite").parquet(other)
    val leaf = new java.io.File(other).listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    val e = intercept[IllegalArgumentException] {
      t.byPaths(spark, Seq(s"$other/$leaf"))
    }
    assert(e.getMessage.contains("outside the root"))
  }

  test("parquet byPaths accepts a file:-scheme spelling of an in-root path") {
    val (base, t) = parquetFixture(PartitioningScheme.Hive)
    val sub = "implant_id=11/date=2024-01-01"
    val leaf = new java.io.File(s"$base/$sub").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    val df = t.byPaths(spark, Seq(s"file:$base/$sub/$leaf"))
    assert(df.select("payload").as[String].collect().toSeq == Seq("v-11-2024-01-01"))
    assert(df.select("implant_id").as[Int].collect().toSeq == Seq(11))
  }

  test("parquet directory byPaths refuses a depth-mismatched path") {
    val (base, t) = parquetFixture(PartitioningScheme.Directory)
    // a file at depth 1 instead of the declared 2 must not silently
    // zip to wrong partition values
    Seq(("stray", 0)).toDF("payload", "reading")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/stray")
    val leaf = new java.io.File(s"$base/stray").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    val e = intercept[IllegalArgumentException] {
      t.byPaths(spark, Seq(s"stray/$leaf"))
    }
    assert(e.getMessage.contains("partition level"))
  }

  test("parquet hive byPaths unescapes partition values like Spark discovery") {
    val base = tempDir("fetch-esc").toString
    // Spark escapes '/' in a partition VALUE as %2F in the dir name;
    // apply() reads it back unescaped, and byPaths must agree
    Seq(("esc", "a/b")).toDF("payload", "k")
      .coalesce(1).write.partitionBy("k").mode("overwrite").parquet(base)
    val t = new ParquetTable("t", base,
      partitioning = Seq(Partition("k", StringType)))
    val viaApply = t(spark, ReadArgs()).select("k").as[String].collect().toSeq
    assert(viaApply == Seq("a/b"))
    val dir = new java.io.File(base).listFiles()
      .map(_.getName).find(_.startsWith("k=")).get
    val leaf = new java.io.File(s"$base/$dir").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    val df = t.byPaths(spark, Seq(s"$dir/$leaf"))
    assert(df.select("k").as[String].collect().toSeq == Seq("a/b"))
  }

  test("parquet byPaths refuses a dot-segment escape of the table root") {
    val (base, t) = parquetFixture(PartitioningScheme.Hive)
    val other = tempDir("fetch-escape").toString
    Seq(("x", 1)).toDF("payload", "reading")
      .coalesce(1).write.mode("overwrite").parquet(other)
    val leaf = new java.io.File(other).listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    // "$base/../<other>/<leaf>" string-prefixes the root but resolves
    // outside it — dot segments must be normalized before the check
    val sneaky = s"$base/../${new java.io.File(other).getName}/$leaf"
    val e = intercept[IllegalArgumentException] {
      t.byPaths(spark, Seq(sneaky))
    }
    assert(e.getMessage.contains("outside the root"))
  }

  test("parquet byPartitions on an empty-but-existing table root is empty, not an error") {
    val base = tempDir("fetch-empty").toString
    val t = new ParquetTable("t", base,
      partitioning = Seq(Partition("implant_id", IntegerType), Partition("date", StringType)))
    val df = t.byPartitions(spark,
      Seq(Filter("implant_id", "=", 1), Filter("date", "=", "2024-01-01")))
    assert(df.count() == 0)
    assert(df.columns.toSet == Set("implant_id", "date"))
    assert(df.schema("implant_id").dataType == IntegerType)
  }
}
