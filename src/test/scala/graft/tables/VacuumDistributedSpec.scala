package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** vacuumDistributed: same semantics as the driver-side vacuum
  * (parity-asserted), with listing, active-set and deletion all
  * running as Spark jobs.
  */
class VacuumDistributedSpec extends SparkSpec {
  import spark.implicits._

  private def t(dir: String) = new DeltaTable("t", dir)
  private def where(f: Filter*) = Filters.normalize(f)

  private def dataFiles(dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val out = Set.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && !s.getPath.toString.contains("_delta_log") &&
        (s.getPath.getName.endsWith(".parquet") || s.getPath.getName.endsWith(".bin")))
        out += s.getPath.toUri.getPath
    }
    out.result()
  }

  test("reclaims exactly the expired tombstoned files; live data intact (partitioned + DV)") {
    val dir = tempDir("dvac").toString + "/t"
    DeltaWrite.append(spark,
      (1 to 40).map(i => (i.toLong, s"v$i", s"p${i % 3}")).toDF("id", "v", "part"),
      dir, partitionBy = Seq("part"))
    // copy-on-write delete -> tombstones; DV delete -> .bin file
    DeltaWrite.deleteWhere(spark, dir, where(Filter("id", "<=", 10L)))
    DeltaWrite.deleteWhereDv(spark, dir, where(Filter("id", "=", 20L)))
    val before = dataFiles(dir)
    val live = DeltaLog.snapshot(spark, dir)

    // inside the retention window nothing is reclaimed
    assert(DeltaWrite.vacuumDistributed(spark, dir) == 0L)
    assert(dataFiles(dir) == before)

    // dry run reports the same candidate count, touches nothing
    val dry = DeltaWrite.vacuumDistributed(spark, dir, retentionMs = 0L, dryRun = true)
    assert(dry > 0L && dataFiles(dir) == before)

    val n = DeltaWrite.vacuumDistributed(spark, dir, retentionMs = 0L)
    assert(n == dry)
    val after = dataFiles(dir)
    // every live file (and its DV) survives; reads still work
    val base = dir.stripSuffix("/")
    val activePaths = live.files.map(f => new Path(base, f.path).toUri.getPath).toSet ++
      live.files.flatMap(_.dv.flatMap(_.filePath(base))).map(_.toUri.getPath)
    assert(activePaths.subsetOf(after))
    assert(t(dir)(spark, ReadArgs()).count() == 29L) // 40 - 10 - 1
    // nothing unexpired or live was touched: removed = before - after
    assert((before -- after).size == n)
    // a second run finds nothing
    assert(DeltaWrite.vacuumDistributed(spark, dir, retentionMs = 0L) == 0L)
  }

  test("parity with the driver-side vacuum on an OPTIMIZE'd table") {
    val a = tempDir("dvac-par-a").toString + "/t"
    val b = tempDir("dvac-par-b").toString + "/t"
    Seq(a, b).foreach { d =>
      (1 to 6).foreach(i =>
        DeltaWrite.append(spark, Seq((i.toLong, i * 2L)).toDF("id", "x"), d))
      DeltaWrite.optimize(spark, d)
    }
    val na = DeltaWrite.vacuum(spark, a, retentionMs = 0L).toLong
    val nb = DeltaWrite.vacuumDistributed(spark, b, retentionMs = 0L)
    assert(na == nb)
    assert(dataFiles(a).size == dataFiles(b).size)
    assert(t(a)(spark, ReadArgs()).count() == t(b)(spark, ReadArgs()).count())
  }

  test("aged orphan staging files from a crashed write are reclaimed") {
    val dir = tempDir("dvac-staging").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new Path(dir, "_staging_deadbeef/part-00000-orphan.parquet")
    fs.mkdirs(orphan.getParent)
    val os = fs.create(orphan); os.write(1); os.close()
    assert(DeltaWrite.vacuumDistributed(spark, dir) == 0L) // in-flight-aged protection
    assert(DeltaWrite.vacuumDistributed(spark, dir, retentionMs = 0L) == 1L)
    assert(!fs.exists(orphan))
    assert(t(dir)(spark, ReadArgs()).count() == 1L)
  }

  test("untracked stray files age by mtime") {
    val dir = tempDir("dvac-stray").toString + "/t"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stray = new Path(dir, "stray_orphan.parquet")
    val os = fs.create(stray); os.write(1); os.close()
    assert(DeltaWrite.vacuumDistributed(spark, dir) == 0L) // young stray survives
    assert(fs.exists(stray))
    assert(DeltaWrite.vacuumDistributed(spark, dir, retentionMs = 0L) == 1L)
    assert(!fs.exists(stray))
    assert(t(dir)(spark, ReadArgs()).count() == 1L)
  }
}
