package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  // skewed domains: 60 / 30 / 10 docs
  private def docs = {
    val rows = (0 until 60).map(i => (i.toLong, "big")) ++
      (100 until 130).map(i => (i.toLong, "mid")) ++
      (200 until 210).map(i => (i.toLong, "small"))
    rows.toDF("doc_id", "domain")
  }

  test("quotas: T=1 keeps natural proportions, higher T flattens the mix") {
    val nat = Mixing.temperatureQuotas(docs, "domain", temperature = 1.0, targetFraction = 0.5)
    assert(nat.map(q => q.domain -> q.quota).toMap == Map("big" -> 30L, "mid" -> 15L, "small" -> 5L))
    val flat = Mixing.temperatureQuotas(docs, "domain", temperature = 8.0, targetFraction = 0.5)
    val fm = flat.map(q => q.domain -> q.quota).toMap
    // flattened: small domain gains share, big loses
    assert(fm("small") > 5L && fm("big") < 30L)
    // quotas never exceed domain size
    flat.foreach(q => assert(q.quota <= q.nDocs))
  }

  test("sample keeps exactly the bottom-quota docs per domain in md5 order") {
    val kept = Mixing.temperatureSample(docs, "doc_id", "domain", 2.0, 0.3)
      .select("doc_id", "domain").as[(Long, String)].collect().toSeq
    val quotas = Mixing.temperatureQuotas(docs, "domain", 2.0, 0.3)
      .map(q => q.domain -> q.quota).toMap
    // recompute membership independently from the hash order
    val order = docs
      .withColumn("_h", Mixing.mixOrder(col("doc_id"), "mix"))
      .select("domain", "doc_id", "_h").as[(String, Long, Long)].collect()
      .groupBy(_._1)
    val want = order.toSeq.flatMap { case (d, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(quotas(d).toInt).map(r => (r._2, d)).toSeq
    }.toSet
    assert(kept.toSet == want)
    assert(kept.groupBy(_._2).map { case (d, r) => d -> r.size.toLong } ==
      quotas.filter(_._2 > 0))
  }

  test("sample is partitioning-invariant") {
    val a = Mixing.temperatureSample(docs, "doc_id", "domain", 2.0, 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Mixing.temperatureSample(docs.repartition(7), "doc_id", "domain", 2.0, 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("non-string domain columns and NULL domains are handled, not crashed") {
    // integer domain column: quotas key on the string form
    val intDocs = ((0 until 20).map(i => (i.toLong, 1)) ++
      (100 until 110).map(i => (i.toLong, 2))).toDF("doc_id", "domain_id")
    val q = Mixing.temperatureQuotas(intDocs, "domain_id", 1.0, 0.5)
    assert(q.map(x => x.domain -> x.quota).toMap == Map("1" -> 10L, "2" -> 5L))
    val kept = Mixing.temperatureSample(intDocs, "doc_id", "domain_id", 1.0, 0.5)
    assert(kept.count() == 15L)

    // NULL domain: excluded from quotas, totals, and the sample
    val withNull = (Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, Some("b"))))
      .toDF("doc_id", "domain")
    val q2 = Mixing.temperatureQuotas(withNull, "domain", 1.0, 1.0)
    assert(q2.map(x => x.domain -> x.quota).toMap == Map("a" -> 2L, "b" -> 1L))
    val kept2 = Mixing.temperatureSample(withNull, "doc_id", "domain", 1.0, 1.0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 == Seq(1L, 2L, 4L))

    // all-null domain: empty quotas, empty sample, same schema
    val allNull = Seq((1L, Option.empty[String])).toDF("doc_id", "domain")
    assert(Mixing.temperatureQuotas(allNull, "domain", 1.0, 1.0).isEmpty)
    val s = Mixing.temperatureSample(allNull, "doc_id", "domain", 1.0, 1.0)
    assert(s.count() == 0L && s.columns.toSeq == Seq("doc_id", "domain"))
  }

  test("qDomainMix returns per-source rollups on real testdata") {
    val rows = graft.queries.Wave6Queries.qDomainMix(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) > 0))
  }
}
