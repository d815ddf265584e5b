package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range, shift: Float = 0.0f) =
    ids.map(i => (i.toLong, Seq.tabulate(8)(d => (i % 5) * 1.0f + d * 0.25f + shift)))
      .toDF("vec_id", "embedding")

  test("persisted index searches identically to the in-memory pipeline") {
    val root = tempDir("vecidx").toString + "/idx"
    val corpus = vecs(0 until 40)
    val model = VectorIndex.create(spark, corpus, "vec_id", "embedding",
      root, dims = 8, m = 4, ksub = 4)
    val queries = Pq.collectQueries(corpus, "vec_id", "embedding", 3)

    val direct = Pq.adcTopK(Pq.encode(corpus, "embedding", model),
      "vec_id", "pq_codes", model, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val viaIndex = VectorIndex.search(spark, root, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaIndex == direct)
  }

  test("loadModel round-trips the fitted model bit-exactly") {
    val root = tempDir("vecidx-m").toString + "/idx"
    val model = VectorIndex.create(spark, vecs(0 until 30), "vec_id", "embedding",
      root, dims = 8, m = 2, ksub = 3)
    assert(VectorIndex.loadModel(spark, root) == model)
  }

  test("addBatch encodes with the frozen model; new rows become searchable") {
    val root = tempDir("vecidx-b").toString + "/idx"
    val base = vecs(0 until 30)
    val model = VectorIndex.create(spark, base, "vec_id", "embedding",
      root, dims = 8, m = 4, ksub = 4)
    // the batch's codes must equal a manual encode with the SAME model
    // a far cluster: quantizes to the extreme centroids, so a query
    // there ranks batch rows ahead of every base row
    val batch = vecs(100 until 110, shift = 50.0f)
    VectorIndex.addBatch(spark, batch, "vec_id", "embedding", root)
    val expected = Pq.encode(batch, "embedding", model)
      .select(col("vec_id"), col("pq_codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val stored = new graft.tables.DeltaTable("c", s"$root/codes")(
      spark, graft.tables.ReadArgs.empty)
      .where(col("id") >= 100)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(stored == expected)
    // appended rows are part of the searchable corpus (codes tie with
    // same-quantization base rows, so assert membership, not rank)
    val q = Seq((999L, Seq.tabulate(8)(d => ((105 % 5) * 1.0f + d * 0.25f + 50.0f).toDouble)))
    val got = VectorIndex.search(spark, root, q, 60)
      .select("neighbor_id").as[Long].collect().toSet
    assert((100L until 110L).forall(got.contains),
      s"batch rows missing from search results: ${(100L until 110L).filterNot(got.contains)}")
  }

  test("filtered search pre-filters by payload and prunes code files") {
    import graft.core.Filter
    val root = tempDir("vecidx-f").toString + "/idx"
    val tagged = (0 until 40).map(i =>
      (i.toLong, Seq.tabulate(8)(d => (i % 5) * 1.0f + d * 0.25f), "evens"))
      .toDF("vec_id", "embedding", "src")
    val model = VectorIndex.create(spark, tagged, "vec_id", "embedding",
      root, dims = 8, m = 4, ksub = 4, payload = Seq("src"))
    VectorIndex.addBatch(spark,
      (100 until 120).map(i =>
        (i.toLong, Seq.tabulate(8)(d => (i % 5) * 1.0f + d * 0.25f), "odds"))
        .toDF("vec_id", "embedding", "src"),
      "vec_id", "embedding", root, payload = Seq("src"))

    val queries = Pq.collectQueries(tagged, "vec_id", "embedding", 2)
    val hits = VectorIndex.search(spark, root, queries, 5,
      where = Seq(Filter("src", "=", "odds")))
    // only odds rows rank, and the ranking equals the manual restriction
    val direct = Pq.adcTopK(
      new graft.tables.DeltaTable("c", s"$root/codes")(spark, graft.tables.ReadArgs.empty)
        .where(col("src") === "odds"),
      "id", "pq_codes", model, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val got = hits.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == direct)
    assert(got.map(_._2).forall(_ >= 100L))
    // the predicate reaches the Delta read: per-file payload stats
    // skip the evens file entirely (two appends = two disjoint files)
    val scanned = VectorIndex.search(spark, root, queries, 5,
      where = Seq(Filter("src", "=", "odds"))).inputFiles
    val all = new graft.tables.DeltaTable("c", s"$root/codes")(
      spark, graft.tables.ReadArgs.empty).inputFiles
    assert(all.length >= 2 && scanned.length < all.length,
      s"expected file pruning: scanned ${scanned.length} of ${all.length}")
  }

  test("addBatch refuses a payload column-set mismatch") {
    val root = tempDir("vecidx-p").toString + "/idx"
    val tagged = (0 until 20).map(i =>
      (i.toLong, Seq.tabulate(8)(d => (i % 5) * 1.0f + d * 0.25f), "a"))
      .toDF("vec_id", "embedding", "src")
    VectorIndex.create(spark, tagged, "vec_id", "embedding",
      root, dims = 8, m = 2, ksub = 3, payload = Seq("src"))
    intercept[IllegalArgumentException] {
      VectorIndex.addBatch(spark, vecs(30 until 40), "vec_id", "embedding", root)
    }
  }

  test("coarse index: probed search prunes to bucket directories, matches in-session IVF-PQ") {
    val root = tempDir("vecidx-ivf").toString + "/idx"
    val corpus = vecs(0 until 60)
    val model = VectorIndex.create(spark, corpus, "vec_id", "embedding",
      root, dims = 8, m = 4, ksub = 4, coarseK = 4, coarseIter = 2)
    val coarse = VectorIndex.loadCoarse(spark, root).get
    assert(coarse.size == 4)
    val queries = Pq.collectQueries(corpus, "vec_id", "embedding", 3)

    val direct = Pq.ivfPqTopK(
      Pq.encode(Similarity.assignNearest(corpus, "embedding", coarse), "embedding", model),
      "vec_id", "pq_codes", coarse, model, queries, nprobe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val probed = VectorIndex.search(spark, root, queries, 5, nprobe = 2)
    val got = probed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == direct)

    // the probe filter reaches the Delta read as PARTITION pruning:
    // only the probed centroid_id directories open
    val expectedBuckets = queries
      .flatMap(q => Pq.probeCentroids(coarse, q._2, 2)).toSet
    val opened = probed.inputFiles.toSeq
    assert(opened.nonEmpty && opened.forall(_.contains("centroid_id=")))
    val openedBuckets = opened
      .map(p => p.split("centroid_id=")(1).split("/")(0).toLong).toSet
    assert(openedBuckets == expectedBuckets,
      s"opened $openedBuckets, probes $expectedBuckets")
    val allBuckets = new graft.tables.DeltaTable("c", s"$root/codes")(
      spark, graft.tables.ReadArgs.empty).inputFiles.length
    assert(opened.size < allBuckets,
      s"probing must open fewer files than the full index ($allBuckets)")

    // exhaustive fallback (nprobe=0) still works on a coarse index
    val flat = VectorIndex.search(spark, root, queries, 5)
    assert(flat.count() == 3 * 5)
  }

  test("addBatch lands in coarse buckets; probed search finds the new rows") {
    val root = tempDir("vecidx-ivfb").toString + "/idx"
    val base = vecs(0 until 40)
    VectorIndex.create(spark, base, "vec_id", "embedding",
      root, dims = 8, m = 4, ksub = 4, coarseK = 4, coarseIter = 2)
    val coarse = VectorIndex.loadCoarse(spark, root).get
    val batch = vecs(100 until 105)
    VectorIndex.addBatch(spark, batch, "vec_id", "embedding", root)
    // every appended row sits in its assigned bucket directory
    val assigned = Similarity.assignNearest(batch, "embedding", coarse)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = new graft.tables.DeltaTable("c", s"$root/codes")(
      spark, graft.tables.ReadArgs.empty)
      .where(col("id") >= 100)
      .select("id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == assigned)
    // probing a batch vector's own bucket returns it among neighbors
    val q = Seq((batch.collect().head.getLong(0),
      batch.collect().head.getSeq[Float](1).map(_.toDouble).toSeq))
    val hits = VectorIndex.search(spark, root, q, 3, nprobe = 1).collect()
    assert(hits.nonEmpty)
  }

  test("rebalance: retrained coarse layer de-skews buckets; exhaustive parity holds") {
    val root = tempDir("vecidx-reb").toString + "/idx"
    // three well-separated clusters; the index trains on ONE of them,
    // so the frozen coarse layer funnels the two addBatch clusters
    // into a single hot bucket (the documented drift failure)
    VectorIndex.create(spark, vecs(0 until 90), "vec_id", "embedding", root,
      dims = 8, m = 4, ksub = 4, coarseK = 3, coarseIter = 3)
    VectorIndex.addBatch(spark, vecs(200 until 290, shift = 40.0f),
      "vec_id", "embedding", root)
    VectorIndex.addBatch(spark, vecs(400 until 490, shift = 80.0f),
      "vec_id", "embedding", root)
    def bucketSizes(): Seq[Long] = new graft.tables.DeltaTable(
      "c", s"$root/codes")(spark, graft.tables.ReadArgs.empty)
      .groupBy("centroid_id").count().collect().map(_.getLong(1)).sorted.toSeq
    val before = bucketSizes()
    assert(before.max >= 180, s"expected a skewed hot bucket, got $before")

    val q = Seq((0L, Seq.tabulate(8)(d => 42.0 + d * 0.25)))
    def exhaustive() = VectorIndex.search(spark, root, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val exhaustiveBefore = exhaustive()

    val newCoarse = VectorIndex.rebalance(spark, root)
    val after = bucketSizes()
    assert(after.sum == before.sum, s"rows lost/duplicated: $before -> $after")
    assert(after.max < before.max,
      s"rebalance must shrink the hot bucket: $before -> $after")
    assert(newCoarse.size == 3 &&
      VectorIndex.loadCoarse(spark, root).get == newCoarse)

    // codes are untouched — exhaustive ADC results identical pre/post
    assert(exhaustive() == exhaustiveBefore)
    // probed search prunes to the RETRAINED buckets and agrees with the
    // exhaustive ranking for an in-cluster query (nprobe=1 now suffices:
    // the query's whole cluster shares one rebalanced bucket)
    val probed = VectorIndex.search(spark, root, q, 5, nprobe = 1)
    val opened = probed.inputFiles.toSeq
    val got = probed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == exhaustiveBefore, s"probed $got vs exhaustive $exhaustiveBefore")
    assert(opened.nonEmpty && opened.forall(_.contains("centroid_id=")))

    // a flat (coarse-less) index refuses
    val e = intercept[IllegalArgumentException] {
      val flat = tempDir("vecidx-rebflat").toString + "/idx"
      VectorIndex.create(spark, vecs(0 until 20), "vec_id", "embedding", flat,
        dims = 8, m = 4, ksub = 4)
      VectorIndex.rebalance(spark, flat)
    }
    assert(e.getMessage.contains("flat"), e.getMessage)
  }

  test("nprobe on a flat index refuses loudly") {
    val root = tempDir("vecidx-np").toString + "/idx"
    val corpus = vecs(0 until 20)
    VectorIndex.create(spark, corpus, "vec_id", "embedding", root, dims = 8, m = 2, ksub = 3)
    val queries = Pq.collectQueries(corpus, "vec_id", "embedding", 2)
    val e = intercept[IllegalArgumentException] {
      VectorIndex.search(spark, root, queries, 3, nprobe = 2)
    }
    assert(e.getMessage.contains("coarse"))
  }

  test("deleteByIds: deleted ids never surface; only owning buckets rewritten") {
    val root = tempDir("vecidx-del").toString + "/idx"
    val corpus = vecs(0 until 60)
    VectorIndex.create(spark, corpus, "vec_id", "embedding",
      root, dims = 8, m = 4, ksub = 4, coarseK = 4, coarseIter = 2)
    val coarse = VectorIndex.loadCoarse(spark, root).get
    val queries = Pq.collectQueries(corpus, "vec_id", "embedding", 3)
    val before = VectorIndex.search(spark, root, queries, 60, nprobe = 4)
      .select("neighbor_id").as[Long].collect().toSet
    // pick two ids the probed search actually returns
    val victims = before.toSeq.sorted.take(2)
    assert(victims.nonEmpty)
    val codesPath = s"$root/codes"
    val owners = new graft.tables.DeltaTable("c", codesPath)(
      spark, graft.tables.ReadArgs.empty)
      .where(col("id").isin(victims: _*))
      .select("centroid_id").as[Long].collect().toSet

    val preVersion = graft.tables.DeltaLog
      .snapshot(spark, codesPath, withFiles = false).version
    val rewritten = VectorIndex.deleteByIds(spark, root, victims)
    assert(rewritten == owners.size)

    // a deleted id never surfaces again, probed or exhaustive
    val afterProbed = VectorIndex.search(spark, root, queries, 60, nprobe = 4)
      .select("neighbor_id").as[Long].collect().toSet
    val afterFlat = VectorIndex.search(spark, root, queries, 60)
      .select("neighbor_id").as[Long].collect().toSet
    victims.foreach { v =>
      assert(!afterProbed.contains(v) && !afterFlat.contains(v))
    }
    assert(afterProbed == before -- victims)

    // the delete commit's remove actions touch ONLY the owning buckets
    val removed = graft.tables.DeltaLog
      .changeActions(spark, codesPath, preVersion + 1, preVersion + 1)
      .flatMap(_.removes).map(_.path)
    assert(removed.nonEmpty)
    assert(removed.forall(p => owners.exists(o => p.contains(s"centroid_id=$o"))),
      s"rewrote outside owning buckets: $removed (owners $owners)")

    // deleting absent ids is a no-op: no commit
    assert(VectorIndex.deleteByIds(spark, root, Seq(99999L)) == 0)
    assert(graft.tables.DeltaLog.snapshot(spark, codesPath, withFiles = false).version ==
      preVersion + 1)
  }

  test("deleteByIds on a flat index removes the rows") {
    val root = tempDir("vecidx-delf").toString + "/idx"
    val corpus = vecs(0 until 20)
    VectorIndex.create(spark, corpus, "vec_id", "embedding", root, dims = 8, m = 2, ksub = 3)
    val queries = Pq.collectQueries(corpus, "vec_id", "embedding", 2)
    assert(VectorIndex.deleteByIds(spark, root, Seq(7L)) == 1)
    val got = VectorIndex.search(spark, root, queries, 20)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!got.contains(7L))
  }
}
