package graft.tools

import graft.operators.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main: stage-by-stage timings of the heaviest
  * operators (usage: runMain graft.tools.Profile [sfDir]).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan

    val signed = NearDup.minhashSignatures(docs, "text", 5, 8)
    time("signatures (8 sigs)") { signed.select("sig_0", "sig_7").count() }

    val shsets = docs.select(
      col("doc_id").as("_sid"),
      array_distinct(graft.functions.Text.shingles(col("text"), 5)).as("_sh"))
    time("shingle sets") { shsets.count() }
    val sPersist = shsets.persist()
    time("shingle sets persist") { sPersist.count() }

    // stage-by-stage replication of minhashPairs
    val bands = 2; val rowsPerBand = 4
    val banded = signed.select(
      col("doc_id").as("_id"),
      array((0 until bands).map { b =>
        val sigs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(NearDup.sigCol(j)))
        struct(lit(b).as("band"), NearDup.bandKey(sigs).as("bh"))
      }: _*).as("_bands"))
      .select(col("_id"), explode(col("_bands")).as("_b"))
      .select(col("_id"), col("_b.band").as("band"), col("_b.bh").as("bh"))
      .persist()
    time("banded persist") { banded.count() }

    val candidates = banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .where(col("a._id") < col("b._id"))
      .select(col("a._id").as("a_id"), col("b._id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
      .persist()
    time("candidates join+dedup") { println("cand=" + candidates.count()) }

    val withSets = candidates
      .join(sPersist, col("a_id") === col("_sid")).withColumnRenamed("_sh", "a_sh").drop("_sid")
      .join(sPersist, col("b_id") === col("_sid")).withColumnRenamed("_sh", "b_sh").drop("_sid")
    time("attach shingle sets") { withSets.count() }

    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val union = (size(col("a_sh")) + size(col("b_sh"))).cast("double") - inter
    val verified = withSets.withColumn("jaccard", round(inter / union, 4))
      .where(col("jaccard") >= 0.5)
    time("exact jaccard verify") { println("pairs=" + verified.count()) }

    val withSetsB = candidates
      .join(broadcast(sPersist), col("a_id") === col("_sid")).withColumnRenamed("_sh", "a_sh").drop("_sid")
      .join(broadcast(sPersist), col("b_id") === col("_sid")).withColumnRenamed("_sh", "b_sh").drop("_sid")
    val verifiedB = withSetsB.withColumn("jaccard", round(inter / union, 4))
      .where(col("jaccard") >= 0.5)
    time("verify w/ broadcast shsets") { println("pairs=" + verifiedB.count()) }

    val pairs = NearDup.minhashPairs(docs, "doc_id", "text")
    time("minhashPairs full") { println("pairs=" + pairs.count()) }

    // cold-vs-warm per headline query: how much of the bench time is
    // one-off planning/listing vs repeatable execution
    for (name <- Seq("q03_shipping_priority", "q_dedup_unique", "q_dedup_exact", "q_sessionize")) {
      val fn = graft.queries.QueryCatalog.queries(name)
      time(s"$name cold") { fn(spark, sfDir).count() }
      time(s"$name warm") { fn(spark, sfDir).count() }
    }

    spark.stop()
  }
}
