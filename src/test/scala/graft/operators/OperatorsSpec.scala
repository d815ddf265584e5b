package graft.operators

import graft.SparkSpec
import graft.functions.{PortableHash, Vectors}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("TopK.perGroup equals the window row_number formulation") {
    val df = spark.read.parquet(sf("sf0.001") + "/part.parquet")
    val viaAgg = TopK.perGroup(df, Seq("p_brand"),
      org.apache.spark.sql.functions.struct(negate(col("p_retailprice")), col("p_partkey")), 3)
      .select("p_brand", "rank", "p_partkey")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3).select("p_brand", "rank", "p_partkey")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("keepFirst keeps the per-key minimizer of the order column") {
    val df = Seq(("k1", 2, "b"), ("k1", 1, "a"), ("k2", 5, "c")).toDF("k", "ord", "payload")
    val got = Dedup.keepFirst(df, Seq("k"), Some("ord"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "a", "k2" -> "c"))
  }

  test("keepFirst is deterministic under order-column ties") {
    val df = Seq(("k", 1, "z"), ("k", 1, "a")).toDF("k", "ord", "payload")
    val got = Dedup.keepFirst(df, Seq("k"), Some("ord")).select("payload").as[String].head()
    assert(got == "a") // ties broken by full-row order
  }

  test("exactByContent dedups on normalized text, keeps min id") {
    val df = Seq((1L, "Hello  "), (2L, "  hello"), (3L, "other")).toDF("id", "text")
    val got = Dedup.exactByContent(df, "text", "id").select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 3L))
  }
}

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  test("portable md5 hash matches the DuckDB construction") {
    // DuckDB: SELECT CAST('0x'||substr(md5('hello'),1,12) AS BIGINT) % 2147483647
    //         -> then affine j=0: (1000003*h + 12345) % p = 1980483631
    val h = Seq("hello").toDF("t")
      .select(PortableHash.affine(PortableHash.md5Mod(col("t")), 0).as("h"))
      .as[Long].head()
    assert(h == 1980483631L)
  }

  test("native MinHashSigs expression matches the declarative formulation") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").limit(100)
    val fast = NearDup.minhashSignatures(docs, "text").select("doc_id", "sig_0", "sig_1", "sig_7")
    val slow = NearDup.minhashSignaturesDeclarative(docs, "text").select("doc_id", "sig_0", "sig_1", "sig_7")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("signatures folded from the hashed shingle SET are bit-identical to the text pass") {
    // the one-md5-pass near-dup pipeline: MinHash over the sorted
    // DISTINCT hash set must equal MinHash over the raw text (a
    // duplicate shingle never changes a min) — including the n<k
    // whole-string shingle and repeated-shingle texts
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").limit(100)
      .select("doc_id", "text")
      .unionByName(Seq((100001L, "abc"), (100002L, "aaaaaaaaaaaa")).toDF("doc_id", "text"))
    val fromText = NearDup.minhashSignatures(docs, "text")
      .select(col("doc_id"), array((0 until 8).map(j => col(s"sig_$j")): _*).as("s"))
    val fromSet = docs.select(col("doc_id"),
      graft.functions.MinHashSigs.minhashFromHashes(
        graft.functions.TextHashExpressions.shingleHashSet(col("text"), 5), 8).as("s"))
    assert(fromText.exceptAll(fromSet).isEmpty && fromSet.exceptAll(fromText).isEmpty)
  }

  test("identical docs share all minhash signatures; disjoint docs do not") {
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"),
      (3L, "zzzz yyyy xxxx wwww vvvv")).toDF("doc_id", "text")
    val sigs = NearDup.minhashSignatures(df, "text", k = 5, numHashes = 8)
      .select("doc_id", "sig_0", "sig_3", "sig_7").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("minhashPairs finds exact duplicates with jaccard 1.0") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content with nothing shared")).toDF("doc_id", "text")
    val pairs = NearDup.minhashPairs(df, "doc_id", "text", threshold = 0.9)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }

  test("releaseCaches unpersists the operator-internal index frames") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    // delta-based so concurrently-running suites' caches don't interfere
    val before = spark.sparkContext.getPersistentRDDs.keySet
    NearDup.minhashPairs(df, "doc_id", "text").count() // materialize → banded+shsets cached
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty)
    NearDup.releaseCaches()
    // unpersist(blocking=false) is async on the block level but the
    // RDD is deregistered synchronously
    assert((spark.sparkContext.getPersistentRDDs.keySet & added).isEmpty)
    // previously returned frames still work (recompute)
    val pairs = NearDup.minhashPairs(df, "doc_id", "text")
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
    NearDup.releaseCaches()
  }

  test("maxBucket above every bucket size reproduces plain minhashPairs exactly") {
    val docs = (0L until 12L).map { i =>
      (i, if (i < 6) s"the quick brown fox jumps over dog $i" else s"unrelated text body $i ${i * 7}")
    }.toDF("doc_id", "text")
    val plain = NearDup.minhashPairs(docs, "doc_id", "text")
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    val capped = NearDup.minhashPairs(docs, "doc_id", "text", maxBucket = 1000)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(capped == plain)
    NearDup.releaseCaches()
  }

  test("oversized buckets star-link linearly and still cluster as one component") {
    // 40 identical docs: every band bucket has all 40 → all-pairs
    // would be 780 candidates; the star emits 39
    val docs = (1L to 40L).map(i => (i, "same boilerplate text repeated everywhere"))
      .toDF("doc_id", "text")
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text", maxBucket = 10)
    val got = pairs.select("a_id", "b_id", "jaccard", "star")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got.length == 39, s"expected 39 star edges, got ${got.length}")
    // these star edges VERIFY above the threshold, so they surface as
    // ordinary pairs: the tag marks only exemption-kept pairs
    assert(got.forall { case (a, _, j, star) => a == 1L && j == 1.0 && !star })
    val clusters = NearDup.dupClusters(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(clusters == (1L to 40L).map(_ -> 1L).toMap)
    NearDup.releaseCaches()
  }

  test("sub-threshold star edges survive verification tagged — connectivity holds") {
    // threshold above every achievable jaccard: ordinary candidates
    // all filter out, but the hot bucket's star edges must STILL
    // emit (tagged, exact jaccard reported) or the bucket's cluster
    // silently falls apart — the r10 guard's documented contract
    val docs = (1L to 40L).map(i => (i, "same boilerplate text repeated everywhere"))
      .toDF("doc_id", "text")
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text",
      maxBucket = 10, threshold = 1.5)
      .select("a_id", "b_id", "jaccard", "star")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(pairs.length == 39, s"expected 39 star edges, got ${pairs.length}")
    assert(pairs.forall { case (a, _, j, star) => a == 1L && j == 1.0 && star })
    val clusters = NearDup.dupClusters(
      NearDup.minhashPairs(docs, "doc_id", "text", maxBucket = 10, threshold = 1.5),
      "a_id", "b_id").as[(Long, Long)].collect().toMap
    assert(clusters == (1L to 40L).map(_ -> 1L).toMap)
    NearDup.releaseCaches()
  }

  test("minhashPairsVerified drops star edges — the 3-column contract") {
    val docs = (1L to 40L).map(i => (i, "same boilerplate text repeated everywhere"))
      .toDF("doc_id", "text")
    // threshold above every achievable jaccard: minhashPairs keeps 39
    // star edges for connectivity; the verified view must be EMPTY
    val verified = NearDup.minhashPairsVerified(docs, "doc_id", "text",
      maxBucket = 10, threshold = 1.5)
    assert(verified.columns.toSeq == Seq("a_id", "b_id", "jaccard"))
    assert(verified.count() == 0)
    // with a reachable threshold it equals the !star projection
    val all = NearDup.minhashPairs(docs, "doc_id", "text", maxBucket = 10)
      .where(!col("star")).select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val v = NearDup.minhashPairsVerified(docs, "doc_id", "text", maxBucket = 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(v == all)
    NearDup.releaseCaches()
  }

  test("DEFAULT maxBucket engages the star guard on a synthetic hot bucket") {
    // 10001 identical docs exceed DefaultMaxBucket (10000): the default
    // call must take the star path — 10000 linear edges around id 0 —
    // instead of the ~5·10⁷ all-pairs candidates a guardless default
    // would enumerate (which would also time this test out).
    val n = NearDup.DefaultMaxBucket + 1
    val docs = spark.range(n.toLong).toDF("doc_id")
      .withColumn("text", lit("same boilerplate text repeated everywhere"))
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text")
    val agg = pairs.agg(count(lit(1)), min(col("a_id")), max(col("a_id")), min(col("jaccard")))
      .as[(Long, Long, Long, Double)].head()
    assert(agg == ((n - 1).toLong, 0L, 0L, 1.0), agg)
    NearDup.releaseCaches()
  }

  test("containmentPairs catches subset duplication that Jaccard misses") {
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val filler = (0 until 40).map(i => s"unique filler token number $i windmill").mkString(" ")
    val docs = Seq(
      (1L, passage),
      (2L, s"$filler $passage"),
      (3L, "entirely different content nothing shared at all here")).toDF("doc_id", "text")
    // Jaccard at 0.5 misses the pair (passage is a sliver of doc 2)
    assert(NearDup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .where(col("a_id") === 1 && col("b_id") === 2).count() == 0)
    val got = NearDup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)), got)
    assert(got.head._3 == 1.0)
    NearDup.releaseCaches()
  }

  test("containmentPairs blocking: pairs sharing only super-common shingles drop") {
    // 25 docs share one passage (df 25 > maxDf 10); tails are runs of
    // a per-doc letter so no cross-doc tail shingle collides
    val docs = (1L to 25L).map(i =>
      (i, s"shared boilerplate passage here ${("" + ('a' + i.toInt).toChar) * 12}"))
      .toDF("doc_id", "text")
    val got = NearDup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.3, maxDf = 10)
    assert(got.count() == 0, "df-capped shingles must not block pairs")
    NearDup.releaseCaches()
  }

  test("dupClusters labels every connected doc with the cluster minimum") {
    // graph: 1-2, 2-3 (chain), 10-11 (pair), 20 isolated (not in pairs)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val got = NearDup.dupClusters(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("softDedup keeps by the exact 1/size md5 gate; singletons always survive") {
    import graft.functions.PortableHash
    // clusters: {1,2,3} and {10,11}; 20 unclustered
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val clusters = NearDup.dupClusters(pairs, "a_id", "b_id")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
      .withColumn("payload", col("doc_id") * 2)
    val kept = NearDup.softDedup(docs, "doc_id", clusters)
      .select("doc_id").as[Long].collect().sorted.toSeq

    // recompute membership independently with the same arithmetic
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"soft|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % PortableHash.Prime
    }
    val size = Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 10L -> 2L, 11L -> 2L, 20L -> 1L)
    val want = size.keys.filter(id => h(id) * size(id) < PortableHash.Prime).toSeq.sorted
    assert(kept == want)
    assert(kept.contains(20L)) // singleton: gate is h·1 < Prime, always true
    // schema preserved
    assert(NearDup.softDedup(docs, "doc_id", clusters).columns.toSeq ==
      Seq("doc_id", "payload"))
    // partitioning-invariant
    val kept2 = NearDup.softDedup(docs.repartition(7), "doc_id", clusters)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 == kept)
    NearDup.releaseCaches()
  }

  test("ngramJaccard: identity 1, disjoint 0") {
    val df = Seq(("same text", "same text"), ("aaaaaa", "zzzzzz")).toDF("a", "b")
    val got = df.select(NearDup.ngramJaccard(col("a"), col("b")).as("j")).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("simhash: identical inputs equal, hamming distance sane") {
    val df = Seq((1L, "spark rules ok"), (2L, "spark rules ok"), (3L, "other words here"))
      .toDF("id", "t")
    val sh = df.select(col("id"), NearDup.simhash(col("t")).as("s"))
    val m = sh.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(m(1L) >= 0 && m(1L) < (1L << 16))
    val hd = sh.as("a").crossJoin(sh.as("b"))
      .where(col("a.id") === 1 && col("b.id") === 3)
      .select(NearDup.hammingDistance(col("a.s"), col("b.s")).as("d")).as[Int].head()
    assert(hd > 0 && hd <= 16)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
    (2L, Seq(0.0f, 1.0f)), (100L, Seq(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("k-means init escalates an under-filled sample geometrically") {
    // adversarial ids: almost none pass the hash gate at the INITIAL
    // fraction (4k/n), forcing the escalation loop that replaced the
    // unconditional full-corpus fallback — the loop must converge by
    // widening the fraction ×4 per retry, never by collecting n rows
    // while the fraction is still < 1
    val k = 8
    val n = 600
    val fraction = 4.0 * k / n
    val cands = spark.range(0, 20000).toDF("id")
    val failing = cands
      .where(!Sampling.sampledBy(col("id"), fraction, salt = "kmeans-init"))
      .as[Long].take(n - 2)
    val passing = cands
      .where(Sampling.sampledBy(col("id"), fraction, salt = "kmeans-init"))
      .as[Long].take(2) // 2 < k survive the initial gate
    assert(failing.length == n - 2 && passing.length == 2)
    val corpus = (failing ++ passing).toSeq.toDF("vec_id")
      .withColumn("embedding", array((0 until 4).map(d =>
        (pmod(col("vec_id"), lit(5)) + lit(d * 0.25)).cast("float")): _*))
    val cs = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k, maxIter = 1)
    assert(cs.size == k)
    assert(cs.forall(_._2.length == 4))
  }

  test("native cosine/l2sq match the declarative HOF formulation on real data") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(50)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .limit(500)
    val diff = pairs.select(
      Vectors.cosine(col("a"), col("b")).as("fast"),
      Vectors.cosineDeclarative(col("a"), col("b")).as("slow"),
      Vectors.l2sq(col("a"), col("b")).as("fastd"),
      Vectors.l2sqDeclarative(col("a"), col("b")).as("slowd"))
      .where(col("fast") =!= col("slow") || col("fastd") =!= col("slowd"))
    assert(diff.count() == 0)
  }

  test("vector math: cosine of identical vectors is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assert(df.select(Vectors.cosine(col("a"), col("b"))).as[Double].head() == 1.0)
    assert(df.select(Vectors.l2sq(col("a"), col("b"))).as[Double].head() == 0.0)
  }

  test("bruteForceTopK ranks by similarity with id tie-break, excludes self") {
    val got = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 100L)) // 0.9939 > 0.0 > -1.0
  }

  test("hardNegatives ranks only different-label vectors, most-similar first") {
    val labeled = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0), // same label as anchor
      (2L, Seq(0.8f, 0.2f), 1), (3L, Seq(0.0f, 1.0f), 1),
      (100L, Seq(-1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(labeled,
      labeled.where(col("vec_id") === 0), "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").select("negative_id").as[Long].collect().toSeq
    // vec 1 (same label, sim 0.99) is EXCLUDED; the hard negative is
    // the near-miss vec 2, then 3, then the easy 100
    assert(got == Seq(2L, 3L, 100L))
  }

  test("ivfAssign buckets every vector to a deterministic centroid") {
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", stride = 100)
    assert(assigned.count() == 4)
    val m = assigned.select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(m(0L) == 0L && m(1L) == 0L && m(100L) == 100L)
    assert(Set(0L, 100L).contains(m(2L))) // orthogonal to both -> tie broken by centroid id
    assert(m(2L) == 0L)
  }

  test("ivfTopK searches only within the query's bucket") {
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", stride = 100)
    val res = Similarity.ivfTopK(assigned, "vec_id", "embedding",
      vecs.where(col("vec_id") === 0).select("vec_id"), k = 5)
    val neighbors = res.select("neighbor_id").as[Long].collect().toSet
    assert(!neighbors.contains(100L)) // different bucket
    assert(neighbors.contains(1L))
  }

  test("semDedup drops the higher-id member of an in-cluster near-dup pair") {
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", stride = 100)
    val kept = Similarity.semDedup(assigned, "vec_id", "embedding", threshold = 0.9)
      .select("vec_id", "kept").as[(Long, Long)].collect().toMap
    // cos(0,1)=0.9939 in the same bucket -> 1 dropped, min-id 0 kept;
    // 2 (orthogonal) and 100 (alone in its bucket) survive
    assert(kept == Map(0L -> 1L, 1L -> 0L, 2L -> 1L, 100L -> 1L))
  }

  test("semDedup never compares across clusters") {
    // 0 and 100 are antipodal (cos = -1) but in different buckets;
    // with a threshold of -1.0 every IN-cluster pair trips, yet both
    // bucket minima and the cross-bucket pair survive untouched
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", stride = 100)
    val kept = Similarity.semDedup(assigned, "vec_id", "embedding", threshold = -1.0)
      .select("vec_id", "kept").as[(Long, Long)].collect().toMap
    assert(kept == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 100L -> 1L))
  }

  test("semDedup keep set is partitioning-invariant and composes with kmeans assignment") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    def keepSet(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val assigned = Similarity.ivfAssign(df, "vec_id", "embedding", stride = 100)
      Similarity.semDedup(assigned, "vec_id", "embedding", threshold = 0.38)
        .where(col("kept") === 1L).select("vec_id").as[Long].collect().toSet
    }
    val k1 = keepSet(emb)
    val k2 = keepSet(emb.repartition(13))
    assert(k1 == k2)
    assert(k1.size < 500) // threshold chosen so some rows actually drop

    // the learned-index path plugs into the same pruning step
    val assigned = Similarity.kmeansIvfAssign(emb, "vec_id", "embedding", k = 5, maxIter = 2)
    val viaKmeans = Similarity.semDedup(assigned, "vec_id", "embedding", threshold = 0.38)
    assert(viaKmeans.count() == 500)
    val perBucketMin = viaKmeans
      .groupBy("centroid_id").agg(min("vec_id").as("min_id")).as[(Long, Long)].collect().toMap
    // the lowest id of every cluster survives by construction
    val keptIds = viaKmeans.where(col("kept") === 1L).select("vec_id").as[Long].collect().toSet
    assert(perBucketMin.values.forall(keptIds.contains))
  }

  // three well-separated 2-d blobs, 5 points each
  private def blobs = {
    val centers = Seq((0f, 0f), (10f, 10f), (-10f, 10f))
    val pts = for {
      (c, b) <- centers.zipWithIndex
      i <- 0 until 5
    } yield ((b * 5 + i).toLong, Seq(c._1 + i * 0.1f, c._2 - i * 0.1f), b)
    pts.toDF("vec_id", "embedding", "blob")
  }

  test("kmeans separates well-separated blobs and is deterministic") {
    val a1 = Similarity.kmeansIvfAssign(blobs, "vec_id", "embedding", k = 3, maxIter = 5)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    // every blob lands in exactly one cluster
    val blobToCids = blobs.select("vec_id", "blob").as[(Long, Int)].collect()
      .groupBy(_._2).view.mapValues(_.map(p => a1(p._1)).toSet).toMap
    assert(blobToCids.values.forall(_.size == 1), s"split blob: $blobToCids")
    assert(blobToCids.values.flatten.toSet.size == 3, s"merged blobs: $blobToCids")

    // bit-identical across a rerun AND a different input partitioning
    val a2 = Similarity.kmeansIvfAssign(blobs.repartition(7), "vec_id", "embedding", 3, 5)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(a1 == a2)
    val c1 = Similarity.kmeansCentroids(blobs, "vec_id", "embedding", 3, 5)
    val c2 = Similarity.kmeansCentroids(blobs.repartition(5), "vec_id", "embedding", 3, 5)
    assert(c1 == c2)
  }

  test("kmeans iterations do not increase within-cluster distance") {
    def inertia(maxIter: Int): Double = {
      val cents = Similarity.kmeansCentroids(blobs, "vec_id", "embedding", 3, maxIter)
        .toMap.view.mapValues(v => array(v.map(lit): _*)).toMap
      val assigned = Similarity.kmeansIvfAssign(blobs, "vec_id", "embedding", 3, maxIter)
      cents.map { case (cid, c) =>
        assigned.where(col("centroid_id") === cid)
          .select(sum(Vectors.l2sq(col("embedding"), c)).as("s"))
          .as[Option[Double]].head().getOrElse(0.0)
      }.sum
    }
    val i1 = inertia(1)
    val i5 = inertia(5)
    assert(i5 <= i1 + 1e-9, s"inertia grew: $i1 -> $i5")
  }

  test("kmeans keeps the previous centroid for an empty cluster") {
    // k=3 over 2 distinct points: one centroid can never win a point
    val tiny = Seq((0L, Seq(0f, 0f)), (1L, Seq(0f, 0f)), (2L, Seq(5f, 5f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(tiny, "vec_id", "embedding", k = 3, maxIter = 3)
    assert(cents.size == 3)
    assert(cents.map(_._1).toSet == Set(0L, 1L, 2L))
  }

  test("kmeans init is O(1) Spark jobs regardless of k") {
    // the r2 init ran one full-corpus TakeOrdered PER SEED; the
    // hash-sample + driver k-center init must not scale jobs with k
    def jobs(k: Int): Int = {
      val group = s"kmeans-init-jobs-$k"
      spark.sparkContext.setJobGroup(group, group, interruptOnCancel = false)
      try Similarity.kmeansCentroids(blobs, "vec_id", "embedding", k, maxIter = 0)
      finally spark.sparkContext.clearJobGroup()
      // statusTracker is listener-fed; give it a beat to settle
      Thread.sleep(500)
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val j3 = jobs(3)
    val j6 = jobs(6)
    assert(j3 == j6, s"init job count depends on k: $j3 (k=3) vs $j6 (k=6)")
    assert(j3 <= 4, s"init should be ~a count + one sample collect, saw $j3 jobs")
  }

  test("ivfTopK works over a kmeans-built index") {
    val assigned = Similarity.kmeansIvfAssign(blobs, "vec_id", "embedding", 3, 5)
    val res = Similarity.ivfTopK(assigned, "vec_id", "embedding",
      blobs.where(col("vec_id") === 0).select("vec_id"), k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(res == Set(1L, 2L, 3L)) // same-blob neighbors only
  }

  test("recallAtK: per-query hit counts, zero-hit queries kept, rank>k ignored") {
    def nbrs(rows: (Long, Long, Long)*) =
      rows.toDF("query_id", "neighbor_id", "rank")
    // q1: approx {10,11,12} vs exact {10,12,13} -> 2/3
    // q2: approx misses entirely -> 0/3
    // q3: only the rank-4 approx row would hit -> ignored at k=3 -> 1/3
    val approx = nbrs(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 40L, 1L), (2L, 41L, 2L), (2L, 42L, 3L),
      (3L, 30L, 1L), (3L, 90L, 2L), (3L, 91L, 3L), (3L, 31L, 4L))
    val exact = nbrs(
      (1L, 10L, 1L), (1L, 12L, 2L), (1L, 13L, 3L),
      (2L, 50L, 1L), (2L, 51L, 2L), (2L, 52L, 3L),
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L), (3L, 33L, 4L))
    val got = Similarity.recallAtK(approx, exact, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 0.6667), (2L, 3L, 0L, 0.0), (3L, 3L, 1L, 0.3333)))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessions split on gaps larger than the threshold") {
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(sec: Long) = java.sql.Timestamp.from(t0.plusSeconds(sec))
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(60), 2.0), (1L, ts(5000), 3.0), // gap > 1800s
      (2L, ts(0), 5.0)
    ).toDF("user_id", "ts", "value")
    val got = Sessionize.rollup(ev, "user_id", "ts", "value", gapSeconds = 1800)
      .select("user_id", "session_seq", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 5.0)))
  }

}
