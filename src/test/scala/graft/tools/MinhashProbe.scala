package graft.tools
import org.apache.spark.sql.SparkSession
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def time(n: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"==== $n: min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f all=${ts.map(t=>f"$t%.3f").mkString(",")}")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    // stage A: just the shingle hash sets (the one md5 pass)
    time("shingle_hash_only") {
      docs.select(graft.functions.TextHashExpressions.shingleHashSet(col("text"), 5).as("s"))
        .select(sum(size(col("s")))).collect()
    }
    // stage B: signatures from hash sets
    time("signatures") {
      graft.operators.NearDup.minhashSignatures(docs, "text", 5, 8)
        .select(sum(col(graft.operators.NearDup.sigCol(0)))).collect()
    }
    // full pairs
    time("pairs_full") {
      graft.operators.NearDup.minhashPairs(docs, "doc_id", "text", 5, 8, 2, 0.5)
        .select("a_id","b_id","jaccard").orderBy("a_id","b_id").count()
    }
    println("docs=" + docs.count())
    spark.stop()
  }
}
