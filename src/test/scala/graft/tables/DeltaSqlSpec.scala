package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL DML surface: statements route to the engine's Delta
  * operations, WHERE clauses convert to the pruning-capable Filter
  * algebra, unsupported shapes refuse loudly.
  */
class DeltaSqlSpec extends SparkSpec {
  import spark.implicits._

  private def t(dir: String) = new DeltaTable("t", dir)
  private def ref(dir: String) = s"delta.`$dir`"

  test("DELETE routes through deleteWhere with a DNF predicate") {
    val dir = tempDir("sql-del").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")).toDF("id", "v"), dir)
    DeltaSql.exec(spark, s"DELETE FROM ${ref(dir)} WHERE v = 'a' OR id >= 4")
    val got = t(dir)(spark, ReadArgs()).select("id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("UPDATE parses multi-assignment SET with expressions over the old row") {
    val dir = tempDir("sql-upd").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, 10L, 20L)).toDF("id", "a", "b"), dir)
    DeltaSql.exec(spark, s"UPDATE ${ref(dir)} SET a = b, b = a WHERE id = 1")
    val r = t(dir)(spark, ReadArgs()).select("a", "b").as[(Long, Long)].head()
    assert(r == ((20L, 10L)))
  }

  test("MERGE upserts from a registered view; matched-delete clause") {
    val dir = tempDir("sql-merge").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "old"), (2L, "stay"), (3L, "kill")).toDF("id", "v"), dir)
    Seq((1L, "new"), (3L, "DEL"), (4L, "ins")).toDF("id", "v")
      .createOrReplaceTempView("merge_src")
    DeltaSql.exec(spark,
      s"MERGE INTO ${ref(dir)} USING merge_src ON id " +
        "WHEN MATCHED AND v = 'DEL' THEN DELETE")
    val got = t(dir)(spark, ReadArgs()).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "stay", 4L -> "ins"))
  }

  test("OPTIMIZE WHERE compacts only the matching partitions") {
    val dir = tempDir("sql-optw").toString + "/t"
    // two appends per partition -> 2 small files in each of a and b
    (1 to 2).foreach { i =>
      DeltaWrite.append(spark,
        Seq((i.toLong, "a"), (i + 10L, "b")).toDF("id", "p"), dir,
        partitionBy = Seq("p"))
    }
    def filesPer(p: String) = DeltaLog.snapshot(spark, dir).files
      .count(_.partitionValues.get("p").flatten.contains(p))
    assert(filesPer("a") == 2 && filesPer("b") == 2)

    val r = DeltaSql.exec(spark, s"OPTIMIZE ${ref(dir)} WHERE p = 'a'")
    assert(r.select("files_removed").as[Long].head() == 2L)
    assert(filesPer("a") == 1 && filesPer("b") == 2, "only partition a rewrites")
    val got = t(dir)(spark, ReadArgs()).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 11L, 12L))

    // data-column predicates can't scope a whole-file rewrite
    intercept[IllegalArgumentException] {
      DeltaSql.exec(spark, s"OPTIMIZE ${ref(dir)} WHERE id = 1")
    }
  }

  test("OPTIMIZE, ZORDER, VACUUM, TBLPROPERTIES, CONSTRAINT, CLUSTER BY, RESTORE all route") {
    val dir = tempDir("sql-util").toString + "/t"
    (1 to 4).foreach(i =>
      DeltaWrite.append(spark, Seq((i.toLong, i * 10L)).toDF("id", "x"), dir))

    val opt = DeltaSql.exec(spark, s"OPTIMIZE ${ref(dir)}")
    assert(opt.select("files_removed").as[Long].head() == 4L)

    DeltaSql.exec(spark, s"OPTIMIZE ${ref(dir)} ZORDER BY (id, x)")
    assert(DeltaLog.snapshot(spark, dir).files
      .forall(_.tags.get(DeltaWrite.ZOrderTag).contains("id,x:8")))

    // DRY RUN reports the same candidates without deleting anything
    val dry = DeltaSql.exec(spark, s"VACUUM ${ref(dir)} RETAIN 0 HOURS DRY RUN")
      .select("files_would_delete").as[Long].head()
    assert(dry >= 4L)
    val vac = DeltaSql.exec(spark, s"VACUUM ${ref(dir)} RETAIN 0 HOURS")
    assert(vac.select("files_deleted").as[Long].head() == dry)
    assert(t(dir)(spark, ReadArgs()).count() == 4L) // live data intact

    DeltaSql.exec(spark,
      s"ALTER TABLE ${ref(dir)} SET TBLPROPERTIES ('graft.note' = 'hi')")
    assert(DeltaLog.snapshot(spark, dir).metadata.configuration
      .get("graft.note").contains("hi"))

    DeltaSql.exec(spark, s"ALTER TABLE ${ref(dir)} ADD CONSTRAINT xpos CHECK (x > 0)")
    intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((9L, -1L)).toDF("id", "x"), dir)
    }
    DeltaSql.exec(spark, s"ALTER TABLE ${ref(dir)} DROP CONSTRAINT xpos")

    DeltaSql.exec(spark,
      s"ALTER TABLE ${ref(dir)} ADD COLUMNS (note STRING, score BIGINT)")
    val evolved = DeltaLog.snapshot(spark, dir).schema
    assert(evolved.fieldNames.toSeq == Seq("id", "x", "note", "score"))
    assert(t(dir)(spark, ReadArgs()).where("note IS NULL").count() == 4L)
    // parameterized types carry their own parentheses
    DeltaSql.exec(spark, s"ALTER TABLE ${ref(dir)} ADD COLUMNS (amt DECIMAL(10,2))")
    assert(DeltaLog.snapshot(spark, dir).schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))

    DeltaSql.exec(spark, s"ALTER TABLE ${ref(dir)} CLUSTER BY (x)")
    assert(DeltaDdl.clusteringColumns(DeltaLog.snapshot(spark, dir)) == Seq("x"))
    // plain OPTIMIZE now clusters (delta-spark parity on clustered tables)
    DeltaSql.exec(spark, s"OPTIMIZE ${ref(dir)}")
    assert(DeltaLog.snapshot(spark, dir).files
      .forall(_.tags.get(DeltaWrite.ZOrderTag).contains("x:8")))

    // RESTORE on an un-vacuumed table (restore refuses once targets
    // are reclaimed — separate table)
    val dir2 = tempDir("sql-restore").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, 1L)).toDF("id", "x"), dir2)
    DeltaWrite.append(spark, Seq((2L, 2L)).toDF("id", "x"), dir2)
    DeltaSql.exec(spark, s"RESTORE ${ref(dir2)} TO VERSION AS OF 0")
    assert(t(dir2)(spark, ReadArgs()).count() == 1L)
  }

  test("utility statements: DELETE-all, RESTORE TO TIMESTAMP, DESCRIBE, SHOW") {
    val dir = tempDir("sql-util2").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "part"), dir, partitionBy = Seq("part"))
    Thread.sleep(1100) // distinct commit timestamps (mtime may be second-granular)
    DeltaWrite.setTableProperties(spark, dir, Map("graft.k" -> "v1"))

    val detail = DeltaSql.exec(spark, s"DESCRIBE DETAIL ${ref(dir)}")
    val d = detail.select("format", "num_files", "partition_columns")
      .as[(String, Long, String)].head()
    assert(d == (("delta", 2L, "part")))

    val hist = DeltaSql.exec(spark, s"DESCRIBE HISTORY ${ref(dir)}")
      .select("version", "n_added_files").as[(Long, Long)].collect().toMap
    assert(hist(0L) == 2L && hist.contains(1L))

    val props = DeltaSql.exec(spark, s"SHOW TBLPROPERTIES ${ref(dir)}")
      .as[(String, String)].collect().toMap
    assert(props.get("graft.k").contains("v1"))

    // timestamp-based restore back past the property change
    val t0 = DeltaLog.changeActions(spark, dir, 0, 0).head.timestamp
    DeltaSql.exec(spark, s"RESTORE ${ref(dir)} TO TIMESTAMP AS OF " +
      s"'${java.time.Instant.ofEpochMilli(t0)}'")
    assert(!DeltaLog.snapshot(spark, dir).metadata.configuration.contains("graft.k"))

    DeltaSql.exec(spark, s"DELETE FROM ${ref(dir)}")
    assert(t(dir)(spark, ReadArgs()).count() == 0L)
  }

  test("IN / NOT IN and AND-over-OR distribute to DNF") {
    val dir = tempDir("sql-dnf").toString + "/t"
    DeltaWrite.append(spark,
      (1L to 8L).map(i => (i, if (i % 2 == 0) "e" else "o")).toDF("id", "v"), dir)
    DeltaSql.exec(spark,
      s"DELETE FROM ${ref(dir)} WHERE id IN (1, 2, 3) AND (v = 'o' OR id = 2)")
    val got = t(dir)(spark, ReadArgs()).select("id").as[Long].collect().toSet
    assert(got == Set(4L, 5L, 6L, 7L, 8L))
  }

  test("TBLPROPERTIES values with SQL-escaped quotes parse intact") {
    val dir = tempDir("sql-esc").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, 2L)).toDF("id", "x"), dir)
    // the '' escape and a comma AFTER it must not mis-split or
    // mis-unquote (the comma sits inside the quoted run)
    DeltaSql.exec(spark,
      s"ALTER TABLE ${ref(dir)} SET TBLPROPERTIES ('k' = 'it''s, fine', 'k2' = 'v2')")
    val conf = DeltaLog.snapshot(spark, dir).metadata.configuration
    assert(conf.get("k").contains("it's, fine"))
    assert(conf.get("k2").contains("v2"))
  }

  test("CONVERT TO DELTA routes all three source formats") {
    import spark.implicits._
    // parquet: hive-layout dir converts in place
    val pq = tempDir("sql-conv-pq").toString + "/t"
    Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "p")
      .write.partitionBy("p").parquet(pq)
    DeltaSql.exec(spark, s"CONVERT TO DELTA parquet.`$pq`")
    assert(new DeltaTable("t", pq)(spark, ReadArgs.empty).count() == 2)
    // iceberg: native table converts
    val ice = tempDir("sql-conv-ice").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "x")).toDF("id", "v"), ice)
    DeltaSql.exec(spark, s"CONVERT TO DELTA iceberg.`$ice`")
    assert(new DeltaTable("t", ice)(spark, ReadArgs.empty).count() == 1)
    // hudi: native table converts
    val hud = tempDir("sql-conv-hud").toString + "/t"
    HudiWrite.bulkInsert(spark, Seq((5L, "z")).toDF("id", "v"), hud, "id")
    DeltaSql.exec(spark, s"CONVERT TO DELTA hudi.`$hud`")
    assert(new DeltaTable("t", hud)(spark, ReadArgs.empty).count() == 1)
  }

  test("predicates outside the filter algebra run residually (r15)") {
    val dir = tempDir("sql-refuse").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    // non-matching residual: nothing deleted ('a' has length 1)
    DeltaSql.exec(spark, s"DELETE FROM ${ref(dir)} WHERE length(v) > 3")
    assert(new DeltaTable("t", dir)(spark, ReadArgs.empty).count() == 1)
    // non-deterministic predicates still refuse (more than one scan)
    val e = intercept[IllegalArgumentException] {
      DeltaSql.exec(spark, s"DELETE FROM ${ref(dir)} WHERE rand() < 2")
    }
    assert(e.getMessage.contains("deterministic"))
    // matching residual deletes the row
    DeltaSql.exec(spark, s"DELETE FROM ${ref(dir)} WHERE v LIKE 'a%'")
    assert(new DeltaTable("t", dir)(spark, ReadArgs.empty).count() == 0)
    intercept[IllegalArgumentException] {
      DeltaSql.exec(spark, s"CREATE TABLE ${ref(dir)} (x INT)")
    }
  }

  test("mapping lifecycle through SQL: upgrade via SET TBLPROPERTIES, rename, drop") {
    val dir = tempDir("sql-map").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "x"), dir)
    // upgrade: the property write routes through enableColumnMapping
    DeltaSql.exec(spark,
      s"ALTER TABLE ${ref(dir)} SET TBLPROPERTIES ('delta.columnMapping.mode' = 'name')")
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.metadata.isColumnMapped && snap.protocol.minWriterVersion >= 5)
    assert(snap.metadata.schema("id").metadata
      .contains(DeltaLog.PhysicalNameKey))

    DeltaSql.exec(spark, s"ALTER TABLE ${ref(dir)} RENAME COLUMN v TO label")
    DeltaSql.exec(spark, s"ALTER TABLE ${ref(dir)} DROP COLUMN x")
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs.empty).columns.toSeq == Seq("id", "label"))
    assert(t(spark, ReadArgs.empty).select("id", "label")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // DML over the renamed column through SQL
    DeltaSql.exec(spark, s"UPDATE ${ref(dir)} SET label = 'B' WHERE id = 2")
    assert(t(spark, ReadArgs.empty).where(col("id") === 2L)
      .select("label").as[String].head() == "B")
  }

  test("UNSET TBLPROPERTIES removes keys; mapping keys refuse (load-bearing)") {
    val dir = tempDir("sql-unset").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    DeltaSql.exec(spark,
      s"ALTER TABLE ${ref(dir)} SET TBLPROPERTIES ('team' = 'ml', 'tier' = 'gold')")
    DeltaSql.exec(spark, s"ALTER TABLE ${ref(dir)} UNSET TBLPROPERTIES ('tier')")
    val conf = DeltaLog.snapshot(spark, dir, withFiles = false).metadata.configuration
    assert(conf.get("team").contains("ml") && !conf.contains("tier"), conf)
    // removing an absent key is a no-op commit-wise
    val v = DeltaLog.snapshot(spark, dir, withFiles = false).version
    DeltaSql.exec(spark, s"ALTER TABLE ${ref(dir)} UNSET TBLPROPERTIES ('nope')")
    assert(DeltaLog.snapshot(spark, dir, withFiles = false).version == v)
    // column-mapping configuration is load-bearing: never removable
    DeltaSql.exec(spark,
      s"ALTER TABLE ${ref(dir)} SET TBLPROPERTIES ('delta.columnMapping.mode' = 'name')")
    val e = intercept[IllegalArgumentException] {
      DeltaSql.exec(spark,
        s"ALTER TABLE ${ref(dir)} UNSET TBLPROPERTIES ('delta.columnMapping.mode')")
    }
    assert(e.getMessage.contains("load-bearing"), e.getMessage)
  }

  test("SET TBLPROPERTIES mode='id' on an UNMAPPED table refuses (delta-spark parity)") {
    val dir = tempDir("sql-map-id").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    // upstream refuses the none->id upgrade (id mode needs parquet
    // field ids in every data file); silently substituting 'name'
    // would leave the table in a mode the user never asked for
    val e = intercept[IllegalArgumentException] {
      DeltaSql.exec(spark,
        s"ALTER TABLE ${ref(dir)} SET TBLPROPERTIES ('delta.columnMapping.mode' = 'id')")
    }
    assert(e.getMessage.contains("'id'") && e.getMessage.contains("name"),
      e.getMessage)
    assert(!DeltaLog.snapshot(spark, dir, withFiles = false).metadata.isColumnMapped,
      "the refused upgrade must not have committed anything")
  }
}
