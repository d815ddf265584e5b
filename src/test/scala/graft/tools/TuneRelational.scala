package graft.tools

import graft.queries.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Dev tool: sweep runtime confs over the relational headline queries
  * to locate the fixed-cost floor (usage: runMain
  * graft.tools.TuneRelational [sfDir]). All swept confs are
  * runtime-settable, so findings can be applied in Bench's session
  * without touching query code.
  */
object TuneRelational {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = Seq("q01_pricing_summary", "q03_shipping_priority",
      "q05_local_supplier", "q_dedup_unique", "q_upsert_merge")

    // warmup: codegen + classloading
    queries.foreach(q =>
      try QueryCatalog.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () })

    val sweeps: Seq[(String, Map[String, String])] = Seq(
      "base sp=32" -> Map.empty,
      "sp=8" -> Map("spark.sql.shuffle.partitions" -> "8"),
      "sp=16" -> Map("spark.sql.shuffle.partitions" -> "16"),
      "maxPart=16m" -> Map("spark.sql.files.maxPartitionBytes" -> "16m"),
      "maxPart=8m" -> Map("spark.sql.files.maxPartitionBytes" -> "8m"),
      "maxPart=4m" -> Map("spark.sql.files.maxPartitionBytes" -> "4m"),
      "sp=16+maxPart=8m" -> Map(
        "spark.sql.shuffle.partitions" -> "16",
        "spark.sql.files.maxPartitionBytes" -> "8m"),
      "noParallelismFirst" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false"),
      "maxPart=8m+noPF" -> Map(
        "spark.sql.files.maxPartitionBytes" -> "8m",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false")
    )

    val defaults = Map(
      "spark.sql.shuffle.partitions" -> cpus,
      "spark.sql.files.maxPartitionBytes" -> "134217728",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true")

    sweeps.foreach { case (label, confs) =>
      defaults.foreach { case (k, v) => spark.conf.set(k, v) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val times = queries.map { q =>
        val fn = QueryCatalog.queries(q)
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        f"$q=${best}%.3f"
      }
      println(s"[tune] $label: ${times.mkString(" ")}")
    }
    spark.stop()
  }
}
