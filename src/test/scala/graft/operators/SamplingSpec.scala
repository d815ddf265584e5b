package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1L to 10000L).toDF("id")

  test("hash-gated sample is deterministic and near the target fraction") {
    val a = ids.where(Sampling.sampledBy(col("id"), 0.3)).as[Long].collect().toSet
    val b = ids.repartition(7).where(Sampling.sampledBy(col("id"), 0.3)).as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02)
  }

  test("nested fractions: a smaller sample is a subset of a larger one") {
    val small = ids.where(Sampling.sampledBy(col("id"), 0.1)).as[Long].collect().toSet
    val large = ids.where(Sampling.sampledBy(col("id"), 0.5)).as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("splitLabel partitions every row exactly once with ~right sizes") {
    val labeled = ids.withColumn("s",
      Sampling.splitLabel(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = labeled.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") / 10000.0 - 0.8) < 0.02)
    assert(counts.keySet == Set("train", "val", "test"))
  }

  test("sample and split use decorrelated hash salts") {
    val sampled = ids.where(Sampling.sampledBy(col("id"), 0.5)).as[Long].collect().toSet
    val trains = ids.withColumn("s",
      Sampling.splitLabel(col("id"), Seq("train" -> 0.5, "rest" -> 0.5)))
      .where(col("s") === "train").select("id").as[Long].collect().toSet
    val overlap = (sampled & trains).size / 10000.0
    assert(math.abs(overlap - 0.25) < 0.02, s"expected ~independent, overlap=$overlap")
  }

  test("stratifiedSample applies per-group rates") {
    val df = (1L to 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val kept = Sampling.stratifiedSample(df, "id", "grp",
      rates = Map("g0" -> 1.0, "g1" -> 0.2), defaultRate = 0.0)
    val counts = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts("g0") == 1000)
    assert(math.abs(counts("g1") / 1000.0 - 0.2) < 0.05)
    assert(!counts.contains("g2"))
  }

  test("weightedSample keep rate scales with the weight column") {
    val df = (1L to 9000L).map(i => (i, (i % 3).toDouble / 2.0)).toDF("id", "w")
    val kept = df.where(Sampling.weightedSample(col("id"), col("w"), rate = 1.0))
      .groupBy("w").count().as[(Double, Long)].collect().toMap
    assert(!kept.contains(0.0)) // weight 0 -> never kept
    assert(math.abs(kept(0.5) / 3000.0 - 0.5) < 0.05)
    assert(kept(1.0) == 3000L) // min(1, w) = 1 -> always kept
    // deterministic and partitioning-invariant
    val a = df.where(Sampling.weightedSample(col("id"), col("w"), 0.7))
      .select("id").as[Long].collect().toSet
    val b = df.repartition(17)
      .where(Sampling.weightedSample(col("id"), col("w"), 0.7))
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("leakageSafeSplit: cluster members share one split; singletons degrade to splitLabel") {
    val docs = (1L to 60L).toDF("id")
    // docs 1..10 form one near-dup cluster with representative 1
    val clusters = (1L to 10L).map(i => (i, 1L)).toDF("id", "cluster_id")
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val asg = Sampling.leakageSafeSplit(docs, "id", clusters, splits)
      .as[(Long, String)].collect().toMap
    // every cluster member lands where the representative lands
    val repSplit = docs.where(col("id") === 1L)
      .select(Sampling.splitLabel(col("id"), splits)).as[String].head()
    assert((1L to 10L).forall(asg(_) == repSplit))
    // unclustered docs get exactly the plain per-id assignment
    val plain = docs.where(col("id") > 10L)
      .select(col("id"), Sampling.splitLabel(col("id"), splits).as("s"))
      .as[(Long, String)].collect().toMap
    assert((11L to 60L).forall(i => asg(i) == plain(i)))
    // both labels occur (the 50 singletons hash across the boundary)
    assert(asg.values.toSet == Set("train", "test"))
  }
}
