package graft.tools

import graft.queries.QueryCatalog
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run a query once (after warmup) and print per-stage
  * wall/executor-CPU/shuffle metrics from a SparkListener — the
  * guide-§7 stage attribution without the (disabled) UI.
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> <query> [reps]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q03_shipping_priority")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // real catalog statistics for the bench tables (queries.Tables
      // registers + ANALYZEs them once per session) — fixes the
      // estimate-driven backwards broadcast side in q03/q05
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = QueryCatalog.queries(name)
    try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }

    final case class St(name: String, submitted: Long, completed: Long,
        tasks: Int, taskTimeMs: Long, cpuMs: Long, gcMs: Long,
        shufReadMB: Double, shufWriteMB: Double, inputMB: Double,
        fetchWaitMs: Long, maxTaskMs: Long)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    val taskAgg = new scala.collection.mutable.HashMap[Int, (Int, Long, Long, Long, Long, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val m = e.taskMetrics
        if (m != null) {
          val (n, t, c, g, f, mx) = taskAgg.getOrElse(e.stageId, (0, 0L, 0L, 0L, 0L, 0L))
          taskAgg(e.stageId) = (n + 1, t + e.taskInfo.duration,
            c + m.executorCpuTime / 1000000, g + m.jvmGCTime,
            f + m.shuffleReadMetrics.fetchWaitTime,
            math.max(mx, e.taskInfo.duration))
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        val si = e.stageInfo
        val (n, t, c, g, f, mx) = taskAgg.getOrElse(si.stageId, (0, 0L, 0L, 0L, 0L, 0L))
        stages += St(
          si.name.takeWhile(_ != '\n').take(60),
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          n, t, c, g,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576.0,
          si.taskMetrics.inputMetrics.bytesRead / 1048576.0,
          f, mx)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { r =>
      stages.clear(); taskAgg.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"== $name rep $r wall=$wall%.3f s ==")
      val t00 = stages.map(_.submitted).filter(_ > 0).minOption.getOrElse(0L)
      stages.sortBy(_.submitted).foreach { s =>
        println(f"  [${(s.submitted - t00) / 1000.0}%6.2f-${(s.completed - t00) / 1000.0}%6.2f] " +
          f"stage wall=${(s.completed - s.submitted) / 1000.0}%6.3f tasks=${s.tasks}%3d " +
          f"taskTime=${s.taskTimeMs / 1000.0}%7.3f cpu=${s.cpuMs / 1000.0}%7.3f gc=${s.gcMs / 1000.0}%5.2f " +
          f"maxTask=${s.maxTaskMs / 1000.0}%6.3f fetchWait=${s.fetchWaitMs / 1000.0}%5.2f " +
          f"in=${s.inputMB}%7.1fMB sr=${s.shufReadMB}%6.1fMB sw=${s.shufWriteMB}%6.1fMB  ${s.name}")
      }
    }
    spark.stop()
  }
}
