package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def countingJobs[A](body: => A): (A, Long) = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      (a, jobs.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** 8 vectors in 4 dims, m=2 subspaces of 2 dims. The subvectors take
    * only 2 distinct values per subspace, so with ksub=2 the learned
    * codebooks are EXACT (each centroid a distinct point) and ADC
    * distance equals true L2² — making expected neighbors computable
    * by hand.
    */
  private def corpus = Seq(
    (0L, Seq(0f, 0f, 10f, 10f)),
    (1L, Seq(0f, 0f, 10f, 10f)),
    (2L, Seq(0f, 0f, 20f, 20f)),
    (3L, Seq(0f, 0f, 20f, 20f)),
    (4L, Seq(6f, 6f, 10f, 10f)),
    (5L, Seq(6f, 6f, 10f, 10f)),
    (6L, Seq(6f, 6f, 20f, 20f)),
    (7L, Seq(6f, 6f, 20f, 20f))
  ).toDF("vec_id", "embedding")

  private def model = Pq.fit(corpus, "vec_id", "embedding", dims = 4, m = 2, ksub = 2)

  test("fit learns exact per-subspace codebooks on separable data") {
    val m = model
    assert(m.m == 2 && m.subDim == 2)
    // each subspace has exactly the two distinct subvectors as centroids
    val sub0 = m.codebooks(0).map(_._2).toSet
    val sub1 = m.codebooks(1).map(_._2).toSet
    assert(sub0 == Set(Seq(0.0, 0.0), Seq(6.0, 6.0)))
    assert(sub1 == Set(Seq(10.0, 10.0), Seq(20.0, 20.0)))
  }

  test("encode is scan-only, deterministic, and partitioning-invariant") {
    val m = model
    val once = Pq.encode(corpus, "embedding", m)
      .select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().sortBy(_._1)
    val again = Pq.encode(corpus.repartition(7), "embedding", m)
      .select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(once.toSeq == again.toSeq)
    assert(once.forall(_._2.length == 2))
    assert(once.forall(_._2.forall(c => c >= 0 && c < 2)))
    // identical vectors share identical codes
    assert(once(0)._2 == once(1)._2 && once(2)._2 == once(3)._2)
    // distinct cells get distinct code pairs
    assert(Seq(once(0), once(2), once(4), once(6)).map(_._2).distinct.size == 4)
  }

  test("adcTopK equals exact L2 ranking when codebooks are exact") {
    val m = model
    val encoded = Pq.encode(corpus, "embedding", m)
    val queries = Pq.collectQueries(corpus, "vec_id", "embedding", bound = 1L)
    assert(queries.map(_._1) == Seq(0L))
    val got = Pq.adcTopK(encoded, "vec_id", "pq_codes", m, queries, k = 3)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect().toSeq
    // query 0 = (0,0,10,10): exact distances — id1: 0, id4/5: 72,
    // id2/3: 200, id6/7: 272. Top-3 with id tie-break: 1, 4, 5.
    assert(got.map(_._2) == Seq(1L, 4L, 5L))
    assert(got.map(_._3) == Seq(0.0, 72.0, 72.0))
    assert(got.map(_._4) == Seq(1L, 2L, 3L))
  }

  test("lut rows match driver-side exact subvector distances") {
    val m = model
    val l = Pq.lut(m, Seq(0.0, 0.0, 10.0, 10.0))
    assert(l.length == 2)
    // subspace 0 centroids sorted by cid; distances to (0,0) are {0, 72}
    assert(l(0).toSet == Set(0.0, 72.0))
    assert(l(1).toSet == Set(0.0, 200.0))
  }

  test("probeCentroids orders by rounded distance with cid tie-break") {
    val coarse = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 0.0)), (2L, Seq(0.0, 10.0)))
    assert(Pq.probeCentroids(coarse, Seq(1.0, 0.0), 2) == Seq(0L, 1L))
    // (6,5): d²=61 to both 0 and 2, 41 to 1 → nearest 1, then tie → 0
    assert(Pq.probeCentroids(coarse, Seq(6.0, 5.0), 3) == Seq(1L, 0L, 2L))
    assert(Pq.probeCentroids(coarse, Seq(6.0, 5.0), 1) == Seq(1L))
  }

  test("ivfPqTopK with all buckets probed equals plain ADC; fewer probes restrict candidates") {
    val m = model
    val coarse = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)), (1L, Seq(6.0, 6.0, 20.0, 20.0)))
    val indexed = Pq.encode(
      Similarity.assignNearest(corpus, "embedding", coarse), "embedding", m)
    val queries = Pq.collectQueries(corpus, "vec_id", "embedding", bound = 1L)
    val full = Pq.ivfPqTopK(indexed, "vec_id", "pq_codes", coarse, m,
      queries, nprobe = 2, k = 3)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect().toSeq
    val adc = Pq.adcTopK(Pq.encode(corpus, "embedding", m), "vec_id", "pq_codes",
      m, queries, k = 3)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect().toSeq
    assert(full == adc)
    // nprobe=1: only the query's own bucket (centroid 0 ≡ ids 0,1,4,5)
    val one = Pq.ivfPqTopK(indexed, "vec_id", "pq_codes", coarse, m,
      queries, nprobe = 1, k = 3)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(one.map(_._2).toSet.subsetOf(Set(1L, 4L, 5L)))
  }

  test("qPqAnn is stable across reruns on real testdata") {
    val a = graft.queries.Wave6Queries.qPqAnn(spark, sf()).collect().toSeq
    val b = graft.queries.Wave6Queries.qPqAnn(spark, sf()).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("fit is bit-identical to m independent per-subspace k-means runs") {
    // the m-fold reference learner the one-scan fit replaced: each
    // subspace sliced out and trained alone — same init hash, same
    // greedy seeding, same decimal means
    val dims = 4; val m = 2; val ksub = 2; val maxIter = 3
    val d = dims / m
    val reference = (0 until m).map { j =>
      val sub = corpus.select(col("vec_id"),
        slice(col("embedding"), j * d + 1, d).as("_subv"))
      Similarity.kmeansCentroids(sub, "vec_id", "_subv", ksub, maxIter)
    }
    val fitted = Pq.fit(corpus, "vec_id", "embedding", dims, m, ksub, maxIter)
    assert(fitted.codebooks == reference)
  }

  test("fit shares each Lloyd round across all m codebooks: job count independent of m") {
    val maxIter = 3
    // warm up codegen/catalog so the counted runs are pure fit work
    Pq.fit(corpus, "vec_id", "embedding", dims = 4, m = 2, ksub = 2, maxIter = 1)
    val (_, jobsM2) = countingJobs {
      Pq.fit(corpus, "vec_id", "embedding", dims = 4, m = 2, ksub = 2, maxIter = maxIter)
    }
    val (_, jobsM4) = countingJobs {
      Pq.fit(corpus, "vec_id", "embedding", dims = 4, m = 4, ksub = 2, maxIter = maxIter)
    }
    // count + sample collect + one aggregation per Lloyd round (AQE
    // materializes each round's shuffle as its own job, so the
    // constant is small but AQE-dependent); the CLAIM is that m
    // doesn't multiply it — the old learner paid m × everything
    assert(jobsM4 == jobsM2, s"jobs must not grow with m: m=2 → $jobsM2, m=4 → $jobsM4")
    assert(jobsM2 <= 2 + 2 * maxIter, s"per-round job budget blown: $jobsM2")
  }
}
