package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DeltaDdlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(f: Filter*) = Filters.normalize(f)

  private def readAll(path: String) = {
    val snap = DeltaLog.snapshot(spark, path)
    DeltaRead.readFiles(spark, path, snap.metadata, snap.files)
  }

  // ---------- CHECK constraints ----------

  test("createTable with a constraint refuses violating appends, accepts valid ones") {
    val path = tempDir("ddl_ck").toString + "/t"
    DeltaDdl.createTable(spark, path,
      StructType(Seq(StructField("id", LongType), StructField("qty", LongType))),
      configuration = Map("delta.constraints.qty_pos" -> "qty > 0"))
    assert(DeltaLog.snapshot(spark, path).protocol.minWriterVersion >= 3)

    DeltaWrite.append(spark, Seq((1L, 5L), (2L, 7L)).toDF("id", "qty"), path)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((3L, -1L)).toDF("id", "qty"), path)
    }
    assert(e.getMessage.contains("qty_pos"))
    // NULL predicate result satisfies a CHECK constraint (SQL semantics)
    DeltaWrite.append(spark,
      Seq((4L, Some(3L)), (5L, None)).toDF("id", "qty"), path)
    assert(readAll(path).count() === 4)
  }

  test("addCheckConstraint validates existing rows and bumps the writer protocol") {
    val path = tempDir("ddl_add").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, 10L), (2L, 20L)).toDF("id", "qty"), path)
    assert(DeltaLog.snapshot(spark, path).protocol.minWriterVersion === 2)

    // a constraint the data violates is refused outright
    val e = intercept[IllegalArgumentException] {
      DeltaDdl.addCheckConstraint(spark, path, "qty_small", "qty < 15")
    }
    assert(e.getMessage.contains("existing rows"))
    assert(!DeltaLog.snapshot(spark, path).metadata.configuration.contains("delta.constraints.qty_small"))

    DeltaDdl.addCheckConstraint(spark, path, "qty_pos", "qty > 0")
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.metadata.configuration("delta.constraints.qty_pos") === "qty > 0")
    assert(snap.protocol.minWriterVersion === 3)

    intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((3L, 0L)).toDF("id", "qty"), path)
    }
    // dropping the constraint re-opens the gate
    DeltaDdl.dropCheckConstraint(spark, path, "qty_pos")
    DeltaWrite.append(spark, Seq((3L, 0L)).toDF("id", "qty"), path)
    assert(readAll(path).count() === 3)
  }

  test("constraints are enforced on MERGE sources") {
    val path = tempDir("ddl_merge").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, 10L)).toDF("id", "qty"), path)
    DeltaDdl.addCheckConstraint(spark, path, "qty_pos", "qty > 0")
    intercept[IllegalArgumentException] {
      DeltaWrite.merge(spark, path, Seq((1L, -5L)).toDF("id", "qty"), Seq("id"))
    }
    DeltaWrite.merge(spark, path, Seq((1L, 99L)).toDF("id", "qty"), Seq("id"))
    assert(readAll(path).select("qty").as[Long].head() === 99L)
  }

  // ---------- column invariants + NOT NULL ----------

  test("column invariants from field metadata are enforced") {
    val path = tempDir("ddl_inv").toString + "/t"
    val md = new MetadataBuilder().putString(
      "delta.invariants", """{"expression":{"expression":"id >= 0"}}""").build()
    DeltaDdl.createTable(spark, path,
      StructType(Seq(StructField("id", LongType, nullable = true, md),
        StructField("v", StringType))))
    DeltaWrite.append(spark, Seq((0L, "a"), (7L, "b")).toDF("id", "v"), path)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((-1L, "bad")).toDF("id", "v"), path)
    }
    assert(e.getMessage.contains("invariant"))
    assert(readAll(path).count() === 2)
  }

  test("NOT NULL columns refuse null values") {
    val path = tempDir("ddl_nn").toString + "/t"
    DeltaDdl.createTable(spark, path,
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("v", StringType))))
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), path)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark,
        Seq((Some(2L), "b"), (None, "null-id")).toDF("id", "v"), path)
    }
    assert(e.getMessage.contains("NOT NULL"))
  }

  // ---------- generated columns ----------

  test("generated columns: computed when absent, validated when present, metadata survives") {
    val path = tempDir("ddl_gen").toString + "/t"
    val md = new MetadataBuilder().putString(
      "delta.generationExpression", "id * 2").build()
    DeltaDdl.createTable(spark, path,
      StructType(Seq(
        StructField("id", LongType),
        StructField("doubled", LongType, nullable = true, md))))
    assert(DeltaLog.snapshot(spark, path).protocol.minWriterVersion >= 4)

    // absent → computed
    DeltaWrite.append(spark, Seq(1L, 2L).toDF("id"), path)
    val got = readAll(path).orderBy("id").as[(Long, Long)].collect()
    assert(got === Array((1L, 2L), (2L, 4L)))

    // present and correct → accepted
    DeltaWrite.append(spark, Seq((5L, 10L)).toDF("id", "doubled"), path)
    // present and wrong → refused
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((6L, 99L)).toDF("id", "doubled"), path)
    }
    assert(e.getMessage.contains("generated column"))

    // the generation expression must survive all those appends
    val meta = DeltaLog.snapshot(spark, path).metadata
    assert(DeltaPolicy.generationExpressions(meta) === Map("doubled" -> "id * 2"))
  }

  test("base-column filters prune generated-column partitions (eq, in, range)") {
    val path = tempDir("ddl_genprune").toString + "/t"
    val md = new MetadataBuilder().putString(
      "delta.generationExpression", "CAST(ts AS DATE)").build()
    DeltaDdl.createTable(spark, path,
      StructType(Seq(
        StructField("id", LongType),
        StructField("ts", TimestampType),
        StructField("day", DateType, nullable = true, md))),
      partitionBy = Seq("day"))
    // three days, one file per partition
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-03-02 11:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-03-03 12:00:00")))
    DeltaWrite.append(spark, rows.toDF("id", "ts"), path, partitionBy = Seq("day"))
    val t = new DeltaTable("t", path)
    val all = t(spark)
    assert(all.inputFiles.length == 3)

    // equality on the BASE column prunes to the one matching partition
    val eq = t(spark, ReadArgs.where(
      Filter("ts", "=", java.sql.Timestamp.valueOf("2024-03-02 11:00:00"))))
    assert(eq.inputFiles.length == 1, eq.inputFiles.toSeq)
    assert(eq.select("id").as[Long].collect().toSeq == Seq(2L))

    // IN on the base column prunes to the members' partitions
    val in = t(spark, ReadArgs.where(Filter("ts", "in", Seq(
      java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
      java.sql.Timestamp.valueOf("2024-03-03 12:00:00")))))
    assert(in.inputFiles.length == 2, in.inputFiles.toSeq)
    assert(in.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))

    // range: CAST AS DATE is monotone, so ts >= v prunes days < day(v);
    // the boundary day itself must survive (>= widens to day >= date)
    val ge = t(spark, ReadArgs.where(
      Filter("ts", ">=", java.sql.Timestamp.valueOf("2024-03-02 00:00:00"))))
    assert(ge.inputFiles.length == 2, ge.inputFiles.toSeq)
    assert(ge.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))

    // strict < on a mid-day instant keeps the boundary day's file
    // (g collapses the day) but the exact predicate still filters rows
    val lt = t(spark, ReadArgs.where(
      Filter("ts", "<", java.sql.Timestamp.valueOf("2024-03-02 11:00:00"))))
    assert(lt.inputFiles.length == 2, lt.inputFiles.toSeq)
    assert(lt.select("id").as[Long].collect().sorted.toSeq == Seq(1L))

    // != derives nothing: all partitions read, exact rows returned
    val ne = t(spark, ReadArgs.where(
      Filter("ts", "!=", java.sql.Timestamp.valueOf("2024-03-02 11:00:00"))))
    assert(ne.inputFiles.length == 3)
    assert(ne.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))

    // DELETE with a base-column filter rewrites only the pruned file set
    val del = DeltaWrite.deleteWhere(spark, path, Filters.normalize(Seq(
      Filter("ts", "=", java.sql.Timestamp.valueOf("2024-03-01 10:00:00")))))
    assert(del.filesRemoved == 1, del)
    assert(t(spark).select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("generated substring prefix partitions prune on base equality") {
    val path = tempDir("ddl_genprefix").toString + "/t"
    val md = new MetadataBuilder().putString(
      "delta.generationExpression", "substring(name, 1, 1)").build()
    DeltaDdl.createTable(spark, path,
      StructType(Seq(
        StructField("name", StringType),
        StructField("pfx", StringType, nullable = true, md))),
      partitionBy = Seq("pfx"))
    DeltaWrite.append(spark,
      Seq("alpha", "beta", "gamma").toDF("name"), path, partitionBy = Seq("pfx"))
    val t = new DeltaTable("t", path)
    assert(t(spark).inputFiles.length == 3)
    val eq = t(spark, ReadArgs.where(Filter("name", "=", "beta")))
    assert(eq.inputFiles.length == 1, eq.inputFiles.toSeq)
    assert(eq.select("name").as[String].collect().toSeq == Seq("beta"))
    // monotone prefix: name >= 'b' prunes the 'a' partition
    val ge = t(spark, ReadArgs.where(Filter("name", ">=", "b")))
    assert(ge.inputFiles.length == 2, ge.inputFiles.toSeq)
    assert(ge.select("name").as[String].collect().sorted.toSeq == Seq("beta", "gamma"))

    // per-file min/max stats on `name` could prune these too — assert
    // the GENERATED derivation itself produced the partition conjuncts
    val meta = DeltaLog.snapshot(spark, path).metadata
    assert(GeneratedPruning.withDerived(spark,
      Filters.normalize(Seq(Filter("name", "=", "beta"))), meta)
      == Seq(Seq(Filter("name", "=", "beta"), Filter("pfx", "=", "b"))))
    assert(GeneratedPruning.withDerived(spark,
      Filters.normalize(Seq(Filter("name", ">=", "b"))), meta)
      == Seq(Seq(Filter("name", ">=", "b"), Filter("pfx", ">=", "b"))))
    assert(GeneratedPruning.withDerived(spark,
      Filters.normalize(Seq(Filter("name", "<", "c"))), meta)
      == Seq(Seq(Filter("name", "<", "c"), Filter("pfx", "<=", "c"))))
  }

  // ---------- append-only ----------

  test("delta.appendOnly: removes refused, appends and OPTIMIZE legal") {
    val path = tempDir("ddl_ao").toString + "/t"
    DeltaDdl.createTable(spark, path,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      configuration = Map("delta.appendOnly" -> "true"))
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), path)
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), path)

    intercept[IllegalArgumentException] {
      DeltaWrite.deleteWhere(spark, path, norm(Filter("id", "=", 1)))
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.deleteWhereDv(spark, path, norm(Filter("id", "=", 1)))
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.overwrite(spark, Seq((9L, "z")).toDF("id", "v"), path)
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.merge(spark, path, Seq((1L, "upd")).toDF("id", "v"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.restore(spark, path, 1L)
    }
    // OPTIMIZE is a pure rewrite (dataChange=false) — still legal
    DeltaWrite.optimize(spark, path)
    assert(readAll(path).count() === 2)
  }

  // ---------- rename / drop under column mapping ----------

  private def mappedTable(prefix: String): String = {
    val path = tempDir(prefix).toString + "/t"
    def f(name: String, phys: String, id: Int, dt: DataType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id.toLong).build())
    DeltaDdl.createTable(spark, path,
      StructType(Seq(f("id", "col-aaa", 1, LongType), f("name", "col-bbb", 2, StringType))),
      configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "2"))
    DeltaWrite.append(spark, Seq((1L, "ann"), (2L, "bob")).toDF("id", "name"), path)
    path
  }

  test("ADD COLUMNS is metadata-only: old rows null-fill, appends carry the column") {
    val path = tempDir("ddl_addcol").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    val before = DeltaLog.snapshot(spark, path)
    DeltaDdl.addColumns(spark, path,
      Seq(StructField("score", LongType, nullable = false))) // demoted to nullable
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.files.map(_.path).toSet === before.files.map(_.path).toSet,
      "no data file may change")
    assert(snap.schema.fieldNames.toSeq === Seq("id", "v", "score"))
    assert(snap.schema("score").nullable, "evolved-in columns must be nullable")
    val got = readAll(path).select("id", "v", "score")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got === Set((1L, "a", None), (2L, "b", None)))
    DeltaWrite.append(spark, Seq((3L, "c", 30L)).toDF("id", "v", "score"), path)
    assert(readAll(path).where(col("score") === 30L).count() === 1)
    // existing names (case-insensitively) and dups refuse
    intercept[IllegalArgumentException] {
      DeltaDdl.addColumns(spark, path, Seq(StructField("V", StringType)))
    }
    intercept[IllegalArgumentException] {
      DeltaDdl.addColumns(spark, path,
        Seq(StructField("x", LongType), StructField("X", StringType)))
    }
    // mapped tables mint a fresh id + UUID physical name (full
    // behavior asserted in DeltaColumnMappingSpec)
    val mPath = mappedTable("ddl_addcol_m")
    DeltaDdl.addColumns(spark, mPath, Seq(StructField("x", LongType)))
    val xf = DeltaLog.snapshot(spark, mPath).metadata.schema("x")
    assert(xf.metadata.contains(DeltaLog.PhysicalNameKey) &&
      xf.metadata.getString(DeltaLog.PhysicalNameKey).startsWith("col-"))
  }

  test("RENAME COLUMN is metadata-only: physical files keep matching") {
    val path = mappedTable("ddl_ren")
    val before = DeltaLog.snapshot(spark, path)
    DeltaDdl.renameColumn(spark, path, "name", "full_name")
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.files.map(_.path).toSet === before.files.map(_.path).toSet,
      "no data file may change")
    assert(snap.schema.fieldNames.toSeq === Seq("id", "full_name"))
    assert(snap.metadata.physicalName("full_name") === "col-bbb")
    val got = readAll(path).orderBy("id").as[(Long, String)].collect()
    assert(got === Array((1L, "ann"), (2L, "bob")))
    // appends after the rename use the new logical name
    DeltaWrite.append(spark, Seq((3L, "cyd")).toDF("id", "full_name"), path)
    assert(readAll(path).where(col("full_name") === "cyd").count() === 1)
    // renaming onto an existing name refuses
    intercept[IllegalArgumentException] {
      DeltaDdl.renameColumn(spark, path, "id", "full_name")
    }
  }

  test("DROP COLUMN is metadata-only and refuses partition/referenced columns") {
    val path = mappedTable("ddl_drop")
    DeltaDdl.dropColumn(spark, path, "name")
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq === Seq("id"))
    assert(readAll(path).columns.toSeq === Seq("id"))
    assert(readAll(path).orderBy("id").as[Long].collect() === Array(1L, 2L))
    intercept[IllegalArgumentException] { DeltaDdl.dropColumn(spark, path, "id") }

    // unmapped tables refuse both DDLs
    val plain = tempDir("ddl_plain").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "x")).toDF("id", "v"), plain)
    intercept[IllegalArgumentException] { DeltaDdl.renameColumn(spark, plain, "v", "w") }
    intercept[IllegalArgumentException] { DeltaDdl.dropColumn(spark, plain, "v") }
  }

  // ---------- shallow clone ----------

  test("shallow clone reads the source's files; both sides evolve independently") {
    val src = tempDir("ddl_clone_src").toString + "/t"
    DeltaWrite.append(spark, (1L to 10L).toDF("id").withColumn("v", col("id") * 10), src)
    // carry a deletion vector through the clone
    DeltaWrite.deleteWhereDv(spark, src, norm(Filter("id", "=", 4)))

    val dst = tempDir("ddl_clone_dst").toString + "/t"
    DeltaDdl.cloneShallow(spark, src, dst)

    val expected = (1L to 10L).filter(_ != 4L).map(i => (i, i * 10))
    assert(readAll(dst).orderBy("id").as[(Long, Long)].collect() === expected.toArray)

    // clone-side append is invisible to the source
    DeltaWrite.append(spark, Seq((100L, 1000L)).toDF("id", "v"), dst)
    assert(readAll(dst).count() === 10)
    assert(readAll(src).count() === 9)

    // clone-side DELETE rewrites into the clone, never the source
    DeltaWrite.deleteWhere(spark, dst, norm(Filter("id", "<=", 2)))
    assert(readAll(dst).orderBy("id").as[(Long, Long)].collect().head === ((3L, 30L)))
    assert(readAll(src).count() === 9)

    // vacuuming the clone must not reclaim source-owned files
    DeltaWrite.vacuum(spark, dst, retentionMs = 0L)
    assert(readAll(src).count() === 9, "source files survive clone vacuum")
    assert(readAll(dst).count() === 8)

    // cloning onto an existing table refuses
    intercept[IllegalArgumentException] { DeltaDdl.cloneShallow(spark, src, dst) }
  }

  test("DV DML on a shallow clone resolves the source's ABSOLUTE file paths") {
    val src = tempDir("ddl_clone_dv_src").toString + "/t"
    DeltaWrite.append(spark, (1L to 8L).toDF("id").withColumn("v", col("id") * 10), src)
    val dst = tempDir("ddl_clone_dv_dst").toString + "/t"
    DeltaDdl.cloneShallow(spark, src, dst)
    // the clone's add actions reference the SOURCE files absolutely;
    // the DV positional scan and bitmap keying must resolve them the
    // protocol's way, never concatenate base + absolute path
    DeltaWrite.deleteWhereDv(spark, dst, norm(Filter("id", "in", Seq(2, 5))))
    assert(readAll(dst).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L, 6L, 7L, 8L))
    // the DV rides the clone; the source is untouched
    assert(readAll(src).count() === 8)
    // update via DV on the clone too (same positional machinery)
    DeltaWrite.updateWhereDv(spark, dst, norm(Filter("id", "=", 3)),
      Seq("v" -> "999"))
    assert(readAll(dst).where(col("id") === 3L).select("v").as[Long].head() == 999L)
    assert(readAll(src).where(col("id") === 3L).select("v").as[Long].head() == 30L)
  }
}
