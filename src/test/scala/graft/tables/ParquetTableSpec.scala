package graft.tables

import graft.SparkSpec
import graft.core.Filter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ParquetTableSpec extends SparkSpec {
  import spark.implicits._

  /** Write a two-level partitioned dataset in either layout. */
  private def writePartitioned(scheme: PartitioningScheme): String = {
    val base = tempDir("pt").toString
    for (impl <- Seq(11, 12); date <- Seq("2024-01-01", "2024-01-02")) {
      val sub = scheme match {
        case PartitioningScheme.Hive      => s"implant_id=$impl/date=$date"
        case PartitioningScheme.Directory => s"$impl/$date"
      }
      Seq((s"v-$impl-$date-1", impl * 10), (s"v-$impl-$date-2", impl * 10 + 1))
        .toDF("payload", "reading")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$base/$sub")
    }
    base
  }

  private def table(base: String, scheme: PartitioningScheme) =
    new ParquetTable("t", base,
      partitioning = Seq(Partition("implant_id", IntegerType), Partition("date", StringType)),
      partitioningScheme = scheme)

  test("hive layout: equality filters become a URI prefix (pruned listing)") {
    val base = writePartitioned(PartitioningScheme.Hive)
    val t = table(base, PartitioningScheme.Hive)
    val plan = t.buildPrefix(Seq(Seq(Filter("implant_id", "=", 11), Filter("date", "=", "2024-01-01"))))
    assert(plan.prefix == s"$base/implant_id=11/date=2024-01-01")
    assert(plan.remaining.isEmpty && plan.applied.size == 2)

    val df = t(spark, ReadArgs.where(Filter("implant_id", "=", 11), Filter("date", "=", "2024-01-01")))
    assert(df.count() == 2)
    // pinned partition columns re-attached with declared types
    assert(df.schema("implant_id").dataType == IntegerType)
    assert(df.select("implant_id").distinct().as[Int].collect().toSeq == Seq(11))
  }

  test("hive layout: prefix stops at first non-equality; residual filter still applied") {
    val base = writePartitioned(PartitioningScheme.Hive)
    val t = table(base, PartitioningScheme.Hive)
    val plan = t.buildPrefix(Seq(Seq(Filter("date", "=", "2024-01-02")))) // no implant filter
    assert(plan.prefix == base) // first partition not pinned -> no prefix
    val df = t(spark, ReadArgs.where(Filter("date", "=", "2024-01-02")))
    assert(df.count() == 4)
    assert(df.select("date").distinct().as[String].collect().toSeq == Seq("2024-01-02"))
  }

  test("directory layout: prefix + driver-side pruning of remaining levels") {
    val base = writePartitioned(PartitioningScheme.Directory)
    val t = table(base, PartitioningScheme.Directory)
    val df = t(spark, ReadArgs.where(Filter("implant_id", "=", 12), Filter("date", "=", "2024-01-02")))
    assert(df.count() == 2)
    assert(df.select("reading").as[Int].collect().toSet == Set(120, 121))
    assert(df.schema("date").dataType == StringType)

    // only the first level pinned -> second level enumerated + pruned
    val df2 = t(spark, ReadArgs.where(Filter("implant_id", "=", 12)))
    assert(df2.count() == 4)
  }

  test("DNF filters must agree across conjunctions to pin a partition") {
    val base = writePartitioned(PartitioningScheme.Hive)
    val t = table(base, PartitioningScheme.Hive)
    val plan = t.buildPrefix(Seq(
      Seq(Filter("implant_id", "=", 11)),
      Seq(Filter("implant_id", "=", 12))))
    assert(plan.prefix == base) // disagree -> no pinning
    val df = t(spark, ReadArgs.dnf(Seq(
      Seq(Filter("implant_id", "=", 11)),
      Seq(Filter("implant_id", "=", 12)))))
    assert(df.count() == 8)
  }

  test("conjunction fully consumed by pinning makes the residual TRUE") {
    val base = writePartitioned(PartitioningScheme.Hive)
    val t = table(base, PartitioningScheme.Hive)
    // Both conjunctions pin implant_id=11; the first is then fully
    // consumed, so it matches EVERY row under the pinned prefix — the
    // residual disjunction is TRUE and reading > 200 must NOT be
    // applied (it would silently drop the first disjunct's rows).
    val dnf = Seq(
      Seq(Filter("implant_id", "=", 11)),
      Seq(Filter("implant_id", "=", 11), Filter("reading", ">", 200)))
    val plan = t.buildPrefix(dnf)
    assert(plan.prefix == s"$base/implant_id=11")
    assert(plan.residual.isEmpty, s"residual should be empty (TRUE), got ${plan.residual}")
    assert(t(spark, ReadArgs.dnf(dnf)).count() == 4)
  }

  test("column pruning") {
    val base = writePartitioned(PartitioningScheme.Hive)
    val t = table(base, PartitioningScheme.Hive)
    val df = t(spark, ReadArgs(columns = Some(Seq("payload"))))
    assert(df.columns.toSeq == Seq("payload"))
  }

  test("buildFileFragment requires all partitions pinned") {
    val base = writePartitioned(PartitioningScheme.Hive)
    val t = table(base, PartitioningScheme.Hive)
    assert(t.buildFileFragment(Seq(Filter("implant_id", "=", 11), Filter("date", "=", "d"))) ==
      s"$base/implant_id=11/date=d/df.parquet")
    intercept[IllegalArgumentException] { t.buildFileFragment(Seq(Filter("implant_id", "=", 11))) }
  }
}
