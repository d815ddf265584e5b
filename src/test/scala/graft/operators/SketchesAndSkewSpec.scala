package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("approx distinct stays within the configured error of exact") {
    val df = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val row = Sketches.profile(df, "o_orderstatus", "o_custkey", "o_totalprice")
      .select("approx_distinct", "exact_distinct").as[(Long, Long)].collect()
    row.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.15,
        s"approx $approx too far from exact $exact")
    }
  }

  test("approx median lands between min and max") {
    val df = Seq.tabulate(1000)(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val m = Sketches.profile(df, "g", "id", "v").select("approx_median").as[Double].head()
    assert(m >= 400 && m <= 600)
  }
}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result") {
    // one pathologically hot key (90% of rows) + normal keys
    val left = (Seq.fill(900)(("hot", "l")) ++ (1 to 100).map(i => (s"k$i", "l")))
      .zipWithIndex.map { case ((k, t), i) => (k, s"$t$i") }.toDF("key", "lpay")
    val right = (Seq(("hot", 1.0)) ++ (1 to 100).map(i => (s"k$i", i.toDouble)))
      .toDF("key", "rpay")

    val plain = left.join(right, "key").select("key", "lpay", "rpay")
    val salted = SkewJoin.saltedInnerJoin(left, right, "key", saltFactor = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}

class ExtensionsSpec extends SparkSpec {

  test("graft expressions are callable from SQL after registration") {
    graft.GraftExtensions.register(spark)
    spark.read.parquet(sf("sf0.001") + "/documents.parquet").limit(5)
      .createOrReplaceTempView("ext_docs")
    val rows = spark.sql(
      """SELECT doc_id,
        |  element_at(graft_minhash(text, 5, 8), 1) AS sig0,
        |  size(graft_shingle_hashset(text, 5)) AS n_shingles,
        |  graft_sorted_intersect_count(
        |    graft_shingle_hashset(text, 5), graft_shingle_hashset(text, 5)) AS self_inter
        |FROM ext_docs""".stripMargin).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("sig0") >= 0)
      assert(r.getAs[Int]("n_shingles") == r.getAs[Int]("self_inter")) // |A ∩ A| = |A|
    }
  }

  test("vector/text/zorder expressions are callable from SQL") {
    graft.GraftExtensions.register(spark)
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(5)
      .createOrReplaceTempView("ext_emb")
    val rows = spark.sql(
      """SELECT vec_id,
        |  round(graft_cosine(embedding, embedding), 4) AS self_cos,
        |  graft_l2sq(embedding, embedding) AS self_d2,
        |  graft_srp_signature(embedding, 16, 64) AS sig,
        |  graft_search_sorted(CAST(vec_id AS DOUBLE), 1.0, 2.0, 3.0) AS bucket,
        |  graft_nfc_normalize('café') AS nfc
        |FROM ext_emb""".stripMargin).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("self_cos") == 1.0)
      assert(r.getAs[Double]("self_d2") == 0.0)
      assert(r.getAs[String]("nfc") == "café")
      assert(r.getAs[Int]("bucket") >= 0 && r.getAs[Int]("bucket") <= 3)
    }
    // SQL signature equals the Scala-API signature
    val viaSql = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("sig")).toMap
    val viaApi = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(5)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        graft.functions.Srp.signature(
          org.apache.spark.sql.functions.col("embedding"),
          graft.functions.Srp.signMatrix(16, 64)).as("sig"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("sig")).toMap
    assert(viaSql == viaApi)
  }
}

class FrequentItemsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // skewed stream: two heavy items over a long tail of singletons
  private def skewed = (
    Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 300).map(i => s"tail$i")
  ).zipWithIndex.map { case (v, i) => (i.toLong, v, if (i % 2 == 0) "a" else "b") }
    .toDF("id", "item", "grp")

  private def hitters(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, (Long, Long)] =
    df.agg(Sketches.approxHeavyHitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.item", "h.est", "h.n")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("Misra-Gries finds every item above the n/(k+1) frequency bound") {
    val k = 20
    val got = hitters(skewed, k)
    val n = got.values.head._2
    assert(n == 1000L)
    val bound = n / (k + 1) // 47
    // true counts: hot=500, warm=200 — both far above the bound
    assert(got.contains("hot") && got.contains("warm"))
    val exact = Map("hot" -> 500L, "warm" -> 200L)
    exact.foreach { case (item, ex) =>
      val est = got(item)._1
      assert(est <= ex && ex <= est + bound, s"$item est=$est exact=$ex bound=$bound")
    }
  }

  test("guarantees hold under any partitioning (merge order may differ)") {
    val k = 10
    Seq(skewed, skewed.repartition(13), skewed.repartition(1)).foreach { df =>
      val got = hitters(df, k)
      val n = got.values.head._2
      val bound = n / (k + 1)
      assert(got.contains("hot") && got.contains("warm"))
      assert(got.size <= k)
      assert(got("hot")._1 <= 500L && 500L <= got("hot")._1 + bound)
    }
  }

  test("grouped heavy hitters keep per-group bounds") {
    val k = 8
    val got = skewed.groupBy("grp")
      .agg(Sketches.approxHeavyHitters(col("item"), k).as("hh"))
      .select(col("grp"), explode(col("hh")).as("h"))
      .select("grp", "h.item", "h.est", "h.n")
      .as[(String, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> ((r._3, r._4))).toMap).toMap
    Seq("a", "b").foreach { g =>
      val m = got(g)
      val n = m.values.head._2
      assert(n == 500L) // half the rows per group
      assert(m.contains("hot")) // 250 per group >> bound
      val est = m("hot")._1
      assert(est <= 250L && 250L <= est + n / (k + 1))
    }
  }

  test("heavy hitters are callable from SQL after registration") {
    graft.GraftExtensions.register(spark)
    skewed.createOrReplaceTempView("hh_input")
    val got = spark.sql(
      "SELECT h.item, h.est FROM (SELECT explode(graft_frequent_items(item, 10)) AS h FROM hh_input)")
      .as[(String, Long)].collect().toMap
    assert(got.contains("hot") && got.contains("warm"))
  }
}
