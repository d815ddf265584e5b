package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Identity columns (writer v6 / `identityColumns`): writer-minted
  * BIGINT values `start + k·step`, unique across commits, advancing a
  * high-water mark persisted in the field metadata. Values live in the
  * data files (unlike row-tracking ids), so concurrent minting is
  * resolved by the optimistic-concurrency base: the hwm bump makes
  * every generating commit schema-changing, and a losing racer refuses
  * instead of committing overlapping values.
  *
  * No oracle query: generated values depend on the frame's physical
  * partitioning (monotonically_increasing_id), so only the invariants
  * — uniqueness, congruence, hwm monotonicity — are deterministic.
  */
class DeltaIdentitySpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(path: String, start: Long = 100L, step: Long = 3L,
      allowExplicit: Boolean = false): Unit =
    DeltaDdl.createTable(spark, path,
      StructType(Seq(
        StructField("id", LongType, nullable = true, DeltaDdl.identityMetadata(
          start, step, allowExplicit)),
        StructField("v", StringType))))

  private def ids(path: String): Seq[Long] = {
    val t = new DeltaTable("t", path)
    t(spark).select("id").as[Long].collect().toSeq
  }

  test("identity values are minted, unique, congruent, and the hwm persists") {
    val path = tempDir("ident_rt").toString + "/t"
    mkTable(path) // start 100, step 3
    assert(DeltaLog.snapshot(spark, path).protocol.minWriterVersion >= 6)

    DeltaWrite.append(spark, Seq("a", "b", "c").toDF("v"), path)
    val first = ids(path)
    assert(first.size == 3 && first.distinct.size == 3)
    assert(first.forall(i => i >= 100 && (i - 100) % 3 == 0), first)

    val hwm1 = DeltaPolicy.identityColumns(
      DeltaLog.snapshot(spark, path).metadata).head.highWaterMark
    assert(hwm1.contains(first.max), s"hwm $hwm1 vs ${first.max}")

    // second batch mints strictly beyond the first batch's mark
    DeltaWrite.append(spark, Seq("d", "e").toDF("v"), path)
    val all = ids(path)
    assert(all.size == 5 && all.distinct.size == 5)
    val second = all.filterNot(first.contains)
    assert(second.forall(_ > first.max), s"$second not beyond ${first.max}")
    assert(all.forall(i => (i - 100) % 3 == 0))
    val hwm2 = DeltaPolicy.identityColumns(
      DeltaLog.snapshot(spark, path).metadata).head.highWaterMark
    assert(hwm2.contains(all.max))
  }

  test("GENERATED ALWAYS refuses explicit values; allowExplicitInsert accepts them") {
    val path = tempDir("ident_expl").toString + "/t"
    mkTable(path)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((1L, "x")).toDF("id", "v"), path)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))

    val path2 = tempDir("ident_expl2").toString + "/t"
    mkTable(path2, allowExplicit = true)
    DeltaWrite.append(spark, Seq((1000L, "x")).toDF("id", "v"), path2)
    // explicit values advance the mark too, so minted values stay unique
    DeltaWrite.append(spark, Seq("y").toDF("v"), path2)
    val got = ids(path2)
    assert(got.contains(1000L) && got.distinct.size == 2)
    assert(got.filter(_ != 1000L).head > 1000L)
  }

  test("negative step descends and tracks the furthest (lowest) value") {
    val path = tempDir("ident_neg").toString + "/t"
    mkTable(path, start = 0L, step = -2L)
    DeltaWrite.append(spark, Seq("a", "b").toDF("v"), path)
    val first = ids(path)
    assert(first.forall(i => i <= 0 && i % 2 == 0), first)
    DeltaWrite.append(spark, Seq("c").toDF("v"), path)
    val all = ids(path)
    assert(all.distinct.size == 3)
    assert(all.filterNot(first.contains).head < first.min)
  }

  test("concurrent identity appenders mint disjoint values") {
    val path = tempDir("ident_race").toString + "/t"
    mkTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // every identity append carries a concurrency base (the hwm bump
    // is a schema change), so racers refuse; retry until committed
    def appendWithRetry(tag: String): Unit = {
      var done = false
      var tries = 0
      while (!done && tries < 20) {
        tries += 1
        try { DeltaWrite.append(spark, Seq(tag).toDF("v"), path); done = true }
        catch { case _: DeltaWrite.ConcurrentWriteException => }
      }
      assert(done, s"appender $tag never won in $tries tries")
    }
    val fs = (1 to 4).map(i => Future(appendWithRetry(s"w$i")))
    Await.result(Future.sequence(fs), 180.seconds)
    val all = ids(path)
    assert(all.size == 4 && all.distinct.size == 4, all)
    assert(all.forall(i => i >= 100 && (i - 100) % 3 == 0), all)
  }

  test("identity column cannot be a partition column") {
    // partition columns carry no per-file stats, so the hwm would
    // never advance and every append would re-mint the same values
    val path = tempDir("ident_part").toString + "/t"
    val e = intercept[IllegalArgumentException] {
      DeltaDdl.createTable(spark, path,
        StructType(Seq(
          StructField("id", LongType, nullable = true, DeltaDdl.identityMetadata()),
          StructField("v", StringType))),
        partitionBy = Seq("id"))
    }
    assert(e.getMessage.contains("partition"))
  }

  test("CDF overwrite carries the same minted identity values as the table") {
    // the mint expression is non-deterministic, so the change feed's
    // insert rows must come from the staged files, not a re-evaluation
    val path = tempDir("ident_cdf").toString + "/t"
    DeltaDdl.createTable(spark, path,
      StructType(Seq(
        StructField("id", LongType, nullable = true, DeltaDdl.identityMetadata()),
        StructField("v", StringType))),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, Seq("a", "b").toDF("v"), path)
    DeltaWrite.overwrite(spark, (1 to 20).map(i => s"n$i").toDF("v"), path)

    val tableIds = ids(path).sorted
    val feed = DeltaChanges.between(spark, path, 2L, 2L)
    val insertIds = feed.filter(col(DeltaChanges.ChangeTypeCol) === "insert")
      .select("id").as[Long].collect().toSeq.sorted
    assert(insertIds == tableIds,
      s"change feed minted $insertIds but the table holds $tableIds")
    // and the old rows left as deletes
    assert(feed.filter(col(DeltaChanges.ChangeTypeCol) === "delete").count() == 2)
  }

  test("UPDATE on an identity column refuses; other columns fine") {
    val path = tempDir("ident_upd").toString + "/t"
    mkTable(path)
    DeltaWrite.append(spark, Seq("a").toDF("v"), path)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.updateWhere(spark, path,
        graft.core.Filters.normalize(Seq(graft.core.Filter("v", "=", "a"))),
        Seq("id" -> "0"))
    }
    assert(e.getMessage.contains("identity"))
    DeltaWrite.updateWhere(spark, path,
      graft.core.Filters.normalize(Seq(graft.core.Filter("v", "=", "a"))),
      Seq("v" -> "'b'"))
    val t = new DeltaTable("t", path)
    assert(t(spark).select("v").as[String].collect().toSeq == Seq("b"))
  }
}
