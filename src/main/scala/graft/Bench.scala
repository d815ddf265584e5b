package graft

import graft.queries.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (SURVEY.md §6) against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A query that throws is recorded in an `"errors"` object (name →
  * message) and forces a nonzero exit — a broken query can never
  * *improve* the bench total by timing its own failure.
  *
  * The `q_topk_window_ruleoff` / `q_topk_window_ruleon` pair runs the
  * same window-formulated top-k query with
  * [[graft.plans.RowNumberTopKRewrite]] disabled vs enabled,
  * demonstrating the E37 rewrite's payoff on the big fact table.
  *
  * SELF-DEFENSE AGAINST HOST LOAD: shared-host contention has skewed
  * three rounds of driver bench records (every untouched query inflates
  * together), so the JSON line now carries the evidence to adjudicate
  * itself: machine-wide CPU spent by OTHER processes during the
  * measured section (/proc/stat busy minus this JVM's own CPU time),
  * steal%, loadavg before/after, the per-query best-of-N spread, and
  * (r16) a fixed single-core calibration task timed before and after
  * the measured section against a committed quiet-window reference.
  * `"load_verdict"` is "load-clean" only when other-process CPU < 10%
  * of machine capacity AND steal < 2% AND the median TRIMMED spread
  * (worst rep dropped — first-run sf-scale codegen makes one rep an
  * outlier even on a provably idle host) ≤ 20% AND both calibration
  * samples are within 1.5× of the reference; any failing criterion
  * prints "load-skewed" — the r15 window (3-4× inflated minima, 53%
  * median spread, counters clean) is now machine-detectable without a
  * judge rerun.
  */
object Bench {
  /** (totalJiffies across all cpus, idle+iowait, steal) from /proc/stat. */
  private def procStat(): (Long, Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val p = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        val idle = p(3) + (if (p.length > 4) p(4) else 0L)
        val steal = if (p.length > 7) p(7) else 0L
        // fields 8/9 (guest, guest_nice) are ALREADY included in
        // user/nice — summing them double-counts VM guest time,
        // inflating the total and deflating other-CPU%
        (p.take(8).sum, idle, steal)
      } finally src.close()
    } catch { case _: Throwable => (-1L, 0L, 0L) }

  private def loadavg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** This JVM's cumulative CPU time in nanoseconds (-1 if unavailable). */
  private def ownCpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  /** Fixed single-core calibration task: a deterministic xorshift64
    * checksum loop whose wall time on THIS host's quiet windows is the
    * committed [[CalibrationRefSec]]. Run before and after the measured
    * section; a ratio well above 1 means the window itself was degraded
    * (hypervisor steal, frequency contention, oversubscription) even
    * when other-process CPU and steal counters look clean — the r15
    * failure mode, where untouched queries inflated 3-4× under a
    * "load-clean" verdict.
    */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0L
    while (i < 400000000L) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    // keep `acc` observable so the loop cannot be eliminated
    if (acc == 0x5DEECE66DL) System.err.println("calibration checksum collision")
    (System.nanoTime() - t0) / 1e9
  }

  /** Quiet-window wall seconds of [[calibrate]] on the reference host
    * (steady-state of repeated runs at loadavg 0.06, committed r16; a
    * contended window measured 1.06-2.53 s for the same loop). The
    * verdict flags the window when either calibration sample exceeds
    * this by >50%.
    */
  val CalibrationRefSec = 0.90
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      // scan-split size tuned to the measured fixed-cost floor: sf0.1
      // parquet files are 10-100 MB, so the 128 MB default planned 1-2
      // scan tasks per table and left local[32] idle during the scan
      // stage (q03/q05 measured ~35% faster at 8m, TuneRelational
      // sweep). Cluster deployments keep the 128 MB default: files are
      // checkpoint-compacted to ≥128 MB there and the executor count,
      // not the split count, bounds scan parallelism.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/Spark warmup: run EVERY headline query once on the smallest
    // SF so measured times reflect the query, not first-run
    // whole-stage-codegen compilation / classloading (each query
    // generates distinct code, so warming one query does not warm the
    // rest). Warmup failures are ignored (the measured run of the same
    // query will surface them).
    QueryCatalog.headlineNames.foreach { name =>
      try QueryCatalog.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val spreads = scala.collection.mutable.LinkedHashMap[String, Double]()
    val trimSpreads = scala.collection.mutable.LinkedHashMap[String, Double]()

    val loadStart = loadavg()
    val calibPre = calibrate()
    val (statT0, statI0, statS0) = procStat()
    val ownT0 = ownCpuNanos()

    // three measured runs per query, report the best: steady-state
    // cost (first-run whole-stage-codegen compilation is JVM warmup,
    // not query cost). r15's best-of-2 left the official record one
    // contended sample away from garbage; the third rep (VERDICT r15
    // #2c) is additions-only — the metric is still the per-query
    // minimum of steady-state reruns. The (max-min)/min spread per
    // query is load telemetry: on a quiet host steady-state reruns
    // repeat within a few percent, so a wide spread flags external
    // contention.
    def measure(name: String)(run: => Unit): Unit =
      try {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          run
          (System.nanoTime() - t0) / 1e9
        }
        results(name) = times.min
        spreads(name) = math.rint((times.max - times.min) / times.min * 1000) / 10
        // trimmed spread: drop the single worst rep (first-run sf-scale
        // codegen routinely makes one rep several times the min even on
        // a PROVABLY quiet host — measured 90.7% raw median spread with
        // other-cpu 0.0%/steal 0.0%, r16 baseline). The two best reps
        // agreeing within a few % is the steady-state stability signal;
        // genuine contention inflates them too.
        val trimmed = times.sorted.dropRight(1)
        trimSpreads(name) =
          math.rint((trimmed.max - trimmed.min) / trimmed.min * 1000) / 10
      } catch {
        case e: Throwable =>
          errors(name) = jsonSafe(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }

    QueryCatalog.headlineNames.foreach { name =>
      val fn = QueryCatalog.queries(name)
      measure(name) { fn(spark, sfDir).count(); () }
    }

    // E37 on/off pair (not part of the headline total: it is a plan
    // demonstration, and ruleoff would double-count the window cost)
    val topk = QueryCatalog.queries("q_topk_window")
    val rule = graft.plans.RowNumberTopKRewrite
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = saved.filterNot(_ == rule)
      measure("q_topk_window_ruleoff") { topk(spark, sfDir).count(); () }
      spark.experimental.extraOptimizations = saved.filterNot(_ == rule) :+ rule
      measure("q_topk_window_ruleon") { topk(spark, sfDir).count(); () }
    } finally spark.experimental.extraOptimizations = saved

    val headline = results.view.filterKeys(QueryCatalog.headlineNames.contains)
    val total = headline.values.sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString(""","errors":{""", ",", "}")
    val status = if (errors.isEmpty) "ok" else "fail"

    // load telemetry over the measured section (see object doc)
    val loadEnd = loadavg()
    val (statT1, statI1, statS1) = procStat()
    val ownT1 = ownCpuNanos()
    val calibPost = calibrate()
    val (otherPct, stealPct) =
      if (statT0 < 0 || statT1 <= statT0) (-1.0, -1.0)
      else {
        val dTotal = (statT1 - statT0).toDouble
        val dBusy = dTotal - (statI1 - statI0)
        // jiffies are USER_HZ=100 per cpu-second; own JVM nanos → jiffies
        val ownJiffies =
          if (ownT0 < 0 || ownT1 < ownT0) 0.0 else (ownT1 - ownT0) / 1e7
        (math.max(0.0, dBusy - ownJiffies) / dTotal * 100,
          (statS1 - statS0) / dTotal * 100)
      }
    val medianSpread = {
      val s = spreads.values.toSeq.sorted
      if (s.isEmpty) 0.0 else s(s.size / 2)
    }
    val medianTrimSpread = {
      val s = trimSpreads.values.toSeq.sorted
      if (s.isEmpty) 0.0 else s(s.size / 2)
    }
    // The verdict now has teeth the counters alone lacked (r15: 3-4×
    // inflated minima under "load-clean"): a wide median best-of-N
    // spread or a slowed single-core calibration loop flags the window
    // regardless of whose CPU the counters blame.
    val calibWorst = math.max(calibPre, calibPost) / CalibrationRefSec
    val loadVerdict =
      if (otherPct < 0) "load-unknown"
      else if (otherPct >= 10.0 || stealPct >= 2.0) "load-skewed"
      else if (medianTrimSpread > 20.0) "load-skewed"
      else if (calibWorst > 1.5) "load-skewed"
      else "load-clean"
    def r1(d: Double): Double = math.rint(d * 10) / 10
    def r2(d: Double): Double = math.rint(d * 100) / 100
    val spreadJson = spreads.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val trimSpreadJson = trimSpreads.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val loadJson =
      s""","load":{"loadavg_start":${r1(loadStart)},"loadavg_end":${r1(loadEnd)},""" +
        s""""other_cpu_pct":${r1(otherPct)},"steal_pct":${r1(stealPct)},""" +
        s""""median_spread_pct":$medianSpread,"spread_pct":$spreadJson,""" +
        s""""median_trim_spread_pct":$medianTrimSpread,"trim_spread_pct":$trimSpreadJson,""" +
        s""""calibration":{"ref_sec":$CalibrationRefSec,"pre_ratio":${r2(calibPre / CalibrationRefSec)},""" +
        s""""post_ratio":${r2(calibPost / CalibrationRefSec)}}},""" +
        s""""load_verdict":"$loadVerdict""""
    println(s"""{"metric":"total","value":$total,"unit":"sec","status":"$status","queries":$qs$errJson$loadJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }

  private def jsonSafe(s: String): String =
    Option(s).getOrElse("null")
      .replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\r\\n\\t]", " ").take(300)
}
