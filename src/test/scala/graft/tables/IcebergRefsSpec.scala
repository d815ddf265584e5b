package graft.tables

import graft.SparkSpec

/** Named snapshot refs (the spec's `refs` map): tags pin snapshots
  * through expiration, branches are movable heads, the reader
  * selects by name.
  */
class IcebergRefsSpec extends SparkSpec {
  import spark.implicits._

  test("tag a snapshot, read by ref, move and drop") {
    val root = tempDir("ice-refs").toString + "/t"
    val s1 = IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val s2 = IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)

    assert(IcebergWrite.setRef(spark, root, "train-v1", snapshotId = Some(s1)) == s1)
    // defaulting to the current snapshot; branch type accepted
    assert(IcebergWrite.setRef(spark, root, "main-line", refType = "branch") == s2)

    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs(extra = Map(t.RefKey -> "train-v1")))
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(t(spark, ReadArgs(extra = Map(t.RefKey -> "main-line")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // a branch moves; a re-set tag moves too (last write wins)
    val s3 = IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root)
    IcebergWrite.setRef(spark, root, "main-line", refType = "branch", Some(s3))
    assert(t(spark, ReadArgs(extra = Map(t.RefKey -> "main-line")))
      .count() == 3)

    // metadata-log tracks the previous metadata files per the spec
    locally {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val v = IcebergMeta.currentVersion(fs, root)
      val p = new org.apache.hadoop.fs.Path(root, s"metadata/v$v.metadata.json")
      val in = fs.open(p)
      val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      val log = IcebergMeta.elements(node.path("metadata-log"))
      assert(log.size == v - 1, s"metadata-log should track ${v - 1} prior versions")
      assert(log.last.path("metadata-file").asText().endsWith(s"v${v - 1}.metadata.json"))
    }

    assert(IcebergWrite.dropRef(spark, root, "train-v1") == s1)
    val e = intercept[IllegalArgumentException] {
      t(spark, ReadArgs(extra = Map(t.RefKey -> "train-v1"))).collect()
    }
    assert(e.getMessage.contains("not found"), e.getMessage)
    intercept[IllegalArgumentException] {
      IcebergWrite.dropRef(spark, root, "nope")
    }
  }

  test("expiration keeps ref-pinned snapshots alive past the retention count") {
    val root = tempDir("ice-refs-exp").toString + "/t"
    val s1 = IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root)
    IcebergWrite.setRef(spark, root, "pinned", snapshotId = Some(s1))

    val expired = IcebergMaintenance.expireSnapshots(spark, root, keepLast = 1)
    // the middle snapshot expires; s1 survives via the tag
    assert(expired.nonEmpty && !expired.contains(s1), expired)

    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs(extra = Map(t.RefKey -> "pinned")))
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(t(spark, ReadArgs.empty).count() == 3)
  }

  test("time-based expiration keeps snapshots at/after the cutoff plus pinned ones") {
    val root = tempDir("ice-exp-time").toString + "/t"
    val s1 = IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v"), root)
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v"), root)
    val expired = IcebergMaintenance.expireSnapshotsOlderThan(spark, root, mid)
    assert(expired == Seq(s1), expired)
    assert(new IcebergTable("t", root)(spark, ReadArgs.empty).count() == 3)
  }

  test("write-audit-publish: branch append stages, fastForward publishes") {
    val root = tempDir("ice-wap").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val t = new IcebergTable("t", root)

    // stage on a branch: main untouched, branch readable for audit
    val b1 = IcebergWrite.appendToBranch(
      spark, Seq((2L, "b")).toDF("id", "v"), root, "audit")
    assert(t(spark, ReadArgs.empty).count() == 1, "main moved on a branch write")
    assert(t(spark, ReadArgs(extra = Map(t.RefKey -> "audit")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // a second staged batch chains on the branch
    IcebergWrite.appendToBranch(spark, Seq((3L, "c")).toDF("id", "v"), root, "audit")
    assert(t(spark, ReadArgs.empty).count() == 1)

    // publish: main fast-forwards to the branch head
    IcebergWrite.fastForward(spark, root, "audit")
    assert(t(spark, ReadArgs.empty)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))

    // repeat publish is a no-op-shaped success; tag refuses
    IcebergWrite.fastForward(spark, root, "audit")
    IcebergWrite.setRef(spark, root, "pin", refType = "tag", Some(b1))
    intercept[IllegalArgumentException] {
      IcebergWrite.fastForward(spark, root, "pin")
    }
    assert(IcebergWrite.dropRef(spark, root, "audit") >= 0)
  }

  test("fastForward refuses diverged histories; branch keeps its own lineage") {
    val root = tempDir("ice-wap-div").toString + "/t"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    IcebergWrite.appendToBranch(spark, Seq((2L, "b")).toDF("id", "v"), root, "wip")
    // main moves independently → branch head no longer descends from it
    IcebergWrite.append(spark, Seq((9L, "z")).toDF("id", "v"), root)
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.fastForward(spark, root, "wip")
    }
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // both lines still read consistently
    val t = new IcebergTable("t", root)
    assert(t(spark, ReadArgs.empty)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 9L))
    assert(t(spark, ReadArgs(extra = Map(t.RefKey -> "wip")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // branch upserts refuse (append-then-publish is the WAP contract)
    intercept[IllegalArgumentException] {
      IcebergWrite.appendToBranch(spark, Seq((5L, "e")).toDF("id", "v"), root, "main")
    }
  }

  test("ref and snapshotId are mutually exclusive; unknown ref refuses") {
    val root = tempDir("ice-refs-excl").toString + "/t"
    val s1 = IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "v"), root)
    IcebergWrite.setRef(spark, root, "r1")
    val t = new IcebergTable("t", root)
    intercept[IllegalArgumentException] {
      t(spark, ReadArgs(extra = Map(t.RefKey -> "r1", t.SnapshotIdKey -> s1))).collect()
    }
    intercept[IllegalArgumentException] {
      t(spark, ReadArgs(extra = Map(t.RefKey -> "ghost"))).collect()
    }
  }
}
