package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Clustered tables: the `delta.clustering` domain + `clustering`
  * writer feature, with parameterless incremental OPTIMIZE — the
  * liquid-clustering surface (declare once, maintain lazily, spec
  * changes migrate on the next OPTIMIZE, not at ALTER time).
  */
class DeltaClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def sample(dir: String, n: Int = 256, parts: Int = 4): Unit =
    DeltaWrite.append(spark,
      (0 until n).map(i => (i.toLong, (i * 37 % 101).toLong, s"v$i"))
        .toDF("x", "y", "v").repartition(parts),
      dir)

  test("clusterBy records the domain and bumps the writer protocol") {
    val dir = tempDir("delta-clu").toString + "/t"
    sample(dir)
    DeltaDdl.clusterBy(spark, dir, Seq("x", "y"))
    val snap = DeltaLog.snapshot(spark, dir)
    assert(DeltaDdl.clusteringColumns(snap) == Seq("x", "y"))
    assert(snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.writerFeatures.exists(f =>
      f.contains("clustering") && f.contains("domainMetadata")))
    // re-declaring the same spec is a no-op commit-wise
    val v = snap.version
    DeltaDdl.clusterBy(spark, dir, Seq("x", "y"))
    assert(DeltaLog.snapshot(spark, dir).version == v)
  }

  test("optimizeClustered clusters incrementally: second run is a no-op, appends re-cluster only new data") {
    val dir = tempDir("delta-clu-opt").toString + "/t"
    sample(dir)
    DeltaDdl.clusterBy(spark, dir, Seq("x", "y"))
    val r1 = DeltaWrite.optimizeClustered(spark, dir)
    assert(r1.filesRemoved > 0)
    val snap1 = DeltaLog.snapshot(spark, dir)
    assert(snap1.files.forall(_.tags.get(DeltaWrite.ZOrderTag).contains("x,y:8")))

    // already clustered under the current spec -> nothing to do
    val r2 = DeltaWrite.optimizeClustered(spark, dir)
    assert(r2.filesRemoved == 0)

    // new data arrives unclustered; only IT is rewritten
    DeltaWrite.append(spark,
      Seq((1000L, 7L, "new"), (1001L, 8L, "new2")).toDF("x", "y", "v").coalesce(1),
      dir)
    val before = DeltaLog.snapshot(spark, dir).files
      .filter(_.tags.get(DeltaWrite.ZOrderTag).contains("x,y:8")).map(_.path).toSet
    val r3 = DeltaWrite.optimizeClustered(spark, dir)
    assert(r3.filesRemoved == 1) // just the fresh append's file
    val after = DeltaLog.snapshot(spark, dir)
    assert(before.subsetOf(after.files.map(_.path).toSet)) // old files untouched
    // table contents intact
    assert(after.files.nonEmpty)
    val t = new DeltaTable("t", dir)
    assert(t(spark, ReadArgs()).count() == 258L)
  }

  test("changing the clustering spec migrates lazily on the next OPTIMIZE") {
    val dir = tempDir("delta-clu-respec").toString + "/t"
    sample(dir)
    DeltaDdl.clusterBy(spark, dir, Seq("x"))
    DeltaWrite.optimizeClustered(spark, dir)
    assert(DeltaLog.snapshot(spark, dir).files
      .forall(_.tags.get(DeltaWrite.ZOrderTag).contains("x:8")))

    DeltaDdl.clusterBy(spark, dir, Seq("y")) // metadata-only: no rewrite yet
    val snapDecl = DeltaLog.snapshot(spark, dir)
    assert(snapDecl.files.forall(_.tags.get(DeltaWrite.ZOrderTag).contains("x:8")))

    val r = DeltaWrite.optimizeClustered(spark, dir) // now everything migrates
    assert(r.filesRemoved > 0)
    assert(DeltaLog.snapshot(spark, dir).files
      .forall(_.tags.get(DeltaWrite.ZOrderTag).contains("y:8")))
  }

  test("clustering domain survives checkpoint + log cleanup") {
    val dir = tempDir("delta-clu-cp").toString + "/t"
    sample(dir)
    DeltaDdl.clusterBy(spark, dir, Seq("x"))
    DeltaWrite.checkpoint(spark, dir)
    DeltaWrite.cleanupLog(spark, dir, retentionMs = 0L)
    assert(DeltaDdl.clusteringColumns(DeltaLog.snapshot(spark, dir)) == Seq("x"))
  }

  test("refusals: partition column, unknown column, >4 columns, un-clustered OPTIMIZE") {
    val dir = tempDir("delta-clu-ref").toString + "/t"
    DeltaWrite.append(spark,
      Seq((1L, "a", 2L)).toDF("x", "p", "y"), dir, partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      DeltaDdl.clusterBy(spark, dir, Seq("p"))
    }
    intercept[IllegalArgumentException] {
      DeltaDdl.clusterBy(spark, dir, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      DeltaDdl.clusterBy(spark, dir, Seq("a", "b", "c", "d", "e"))
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.optimizeClustered(spark, dir)
    }
  }
}
