package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.spark.sql.types._

/** `typeWidening` table feature: ALTER COLUMN TYPE to a wider type is
  * metadata-only — old files keep their narrow physical type and the
  * scan widens natively; stats pruning stays sound across mixed-width
  * files; non-widening changes refuse.
  */
class DeltaTypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def read(dir: String, args: ReadArgs = ReadArgs()) =
    new DeltaTable("t", dir)(spark, args)

  test("int→long is metadata-only: mixed-width files read wide, exactly") {
    val dir = tempDir("tw-il").toString + "/t"
    DeltaWrite.append(spark, Seq((1, "a"), (2, "b")).toDF("id", "s").coalesce(1), dir)
    val before = DeltaLog.snapshot(spark, dir).files.map(_.path).toSet

    DeltaDdl.widenColumnType(spark, dir, "id", LongType)
    // no data file touched
    assert(DeltaLog.snapshot(spark, dir).files.map(_.path).toSet == before)

    DeltaWrite.append(spark, Seq((3000000000L, "c")).toDF("id", "s"), dir)
    val df = read(dir)
    assert(df.schema("id").dataType == LongType)
    assert(df.select("id", "s").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3000000000L, "c")))

    // typeChanges history + reader/writer feature per the public spec
    val meta = DeltaLog.snapshot(spark, dir, withFiles = false).metadata
    val tc = meta.schema("id").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 &&
      tc(0).getString("fromType") == "integer" && tc(0).getString("toType") == "long")
    val pr = DeltaLog.snapshot(spark, dir, withFiles = false).protocol
    assert(pr.minReaderVersion == 3 && pr.minWriterVersion == 7)
    assert(pr.readerFeatures.exists(_.contains("typeWidening")))
    assert(pr.writerFeatures.exists(_.contains("typeWidening")))
  }

  test("chained widenings append to the typeChanges history") {
    val dir = tempDir("tw-chain").toString + "/t"
    DeltaWrite.append(spark,
      Seq(1.toByte).toDF("b").selectExpr("CAST(b AS BYTE) AS b"), dir)
    DeltaDdl.widenColumnType(spark, dir, "b", ShortType)
    DeltaDdl.widenColumnType(spark, dir, "b", LongType)
    val meta = DeltaLog.snapshot(spark, dir, withFiles = false).metadata
    val tc = meta.schema("b").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.map(m => (m.getString("fromType"), m.getString("toType"))).toSeq ==
      Seq(("byte", "short"), ("short", "long")))
    assert(read(dir).as[Long].collect().toSeq == Seq(1L))
  }

  test("stats pruning stays sound across mixed-width files") {
    val dir = tempDir("tw-prune").toString + "/t"
    DeltaWrite.append(spark,
      (1 to 100).map(i => (i, "x")).toDF("id", "s").coalesce(1), dir)
    DeltaDdl.widenColumnType(spark, dir, "id", LongType)
    DeltaWrite.append(spark,
      (3000000000L to 3000000100L).map(i => (i, "y")).toDF("id", "s").coalesce(1), dir)

    val hi = read(dir, ReadArgs(
      filters = Filters.normalize(Seq(Filter("id", ">=", 3000000000L)))))
    assert(hi.inputFiles.length == 1, "narrow-stats file must prune")
    assert(hi.count() == 101)
    val lo = read(dir, ReadArgs(
      filters = Filters.normalize(Seq(Filter("id", "<=", 100L)))))
    assert(lo.inputFiles.length == 1, "wide-stats file must prune")
    assert(lo.count() == 100)
  }

  test("float→double and decimal precision/scale widening read exactly") {
    val dir = tempDir("tw-fd").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1.5f, BigDecimal("12.34"))).toDF("f", "d")
        .selectExpr("f", "CAST(d AS DECIMAL(6,2)) AS d").coalesce(1), dir)
    DeltaDdl.widenColumnType(spark, dir, "f", DoubleType)
    DeltaDdl.widenColumnType(spark, dir, "d", DecimalType(12, 4))
    val row = read(dir).selectExpr("f", "CAST(d AS STRING)").as[(Double, String)].head()
    assert(row._1 == 1.5d && row._2 == "12.3400")
  }

  test("non-widening changes refuse; partition and referenced columns refuse") {
    val dir = tempDir("tw-refuse").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, 1, java.sql.Date.valueOf("2024-01-01"), 5))
        .toDF("id", "n", "dt", "p"), dir, partitionBy = Seq("p"))
    // narrowing
    intercept[IllegalArgumentException] {
      DeltaDdl.widenColumnType(spark, dir, "id", IntegerType)
    }
    // not a widening pair (string target)
    intercept[IllegalArgumentException] {
      DeltaDdl.widenColumnType(spark, dir, "n", StringType)
    }
    // date→timestampNTZ: in the spec, refused here (no native conversion)
    intercept[IllegalArgumentException] {
      DeltaDdl.widenColumnType(spark, dir, "dt", TimestampNTZType)
    }
    // long→decimal needs ≥20 integral digits
    intercept[IllegalArgumentException] {
      DeltaDdl.widenColumnType(spark, dir, "id", DecimalType(18, 0))
    }
    // partition column (a legal pair, refused for being partitioning)
    intercept[IllegalArgumentException] {
      DeltaDdl.widenColumnType(spark, dir, "p", LongType)
    }
    // referenced by a constraint
    DeltaDdl.addCheckConstraint(spark, dir, "pos", "n > 0")
    intercept[IllegalArgumentException] {
      DeltaDdl.widenColumnType(spark, dir, "n", LongType)
    }
    // missing column
    intercept[IllegalArgumentException] {
      DeltaDdl.widenColumnType(spark, dir, "nope", LongType)
    }
  }

  test("widening to the current type is a no-op commit") {
    val dir = tempDir("tw-noop").toString + "/t"
    DeltaWrite.append(spark, Seq(1).toDF("id"), dir)
    val v = DeltaDdl.widenColumnType(spark, dir, "id", IntegerType).version
    assert(v == DeltaLog.snapshot(spark, dir, withFiles = false).version)
    assert(DeltaLog.snapshot(spark, dir, withFiles = false).protocol
      .readerFeatures.forall(!_.contains("typeWidening")))
  }

  test("time travel before the widen reads the narrow schema") {
    val dir = tempDir("tw-tt").toString + "/t"
    DeltaWrite.append(spark, Seq(7).toDF("id"), dir)      // v0
    DeltaDdl.widenColumnType(spark, dir, "id", LongType)  // v1
    val t = new DeltaTable("t", dir)
    val old = t(spark, ReadArgs(extra = Map(t.VersionKey -> 0L)))
    assert(old.schema("id").dataType == IntegerType)
    assert(read(dir).schema("id").dataType == LongType)
  }

  test("widening composes with column mapping (name mode)") {
    val dir = tempDir("tw-cm").toString + "/t"
    def mapped(name: String, dt: DataType, id: Long, phys: String) =
      StructField(name, dt, nullable = true,
        metadata = new MetadataBuilder()
          .putLong("delta.columnMapping.id", id)
          .putString(DeltaLog.PhysicalNameKey, phys).build())
    DeltaDdl.createTable(spark, dir,
      StructType(Seq(
        mapped("id", IntegerType, 1L, "col-01"),
        mapped("s", StringType, 2L, "col-02"))),
      configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "2"))
    DeltaWrite.append(spark, Seq((1, "a")).toDF("id", "s"), dir)
    DeltaDdl.widenColumnType(spark, dir, "id", LongType)
    val meta = DeltaLog.snapshot(spark, dir, withFiles = false).metadata
    // physical-name field metadata survived the type swap
    assert(meta.physicalName("id") == "col-01")
    assert(meta.schema("id").metadata
      .getMetadataArray("delta.typeChanges").length == 1)
    assert(read(dir).select("id", "s").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }
}
