package graft.plans

import graft.SparkSpec
import graft.tables.{HudiTable, HudiWrite, ReadArgs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Union, Window}
import org.apache.spark.sql.functions.col

/** Plan-shape guarantees of the MOR merged read: log-free groups keep
  * the plain-parquet fast path (no per-key window/shuffle), and the
  * latest-per-key merge confines itself to the log-bearing groups.
  */
class HudiMorPlanSpec extends SparkSpec {
  import spark.implicits._

  private def windows(df: DataFrame): Seq[Window] =
    df.queryExecution.optimizedPlan.collect { case w: Window => w }

  test("COW reads never pay the merge: no Window in the plan") {
    val dir = tempDir("mor-plan-cow").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, "id")
    val df = new HudiTable("t", dir)(spark, ReadArgs.empty)
    assert(windows(df).isEmpty, df.queryExecution.optimizedPlan.toString)
  }

  test("MOR reads merge ONLY the log-bearing groups; filters push to the fast-path scan") {
    val dir = tempDir("mor-plan").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("id", "v", "part"),
      dir, "id", Seq("part"), tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((1L, "A2", 0)).toDF("id", "v", "part"), dir)

    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = new HudiTable("t", dir)(spark, ReadArgs.empty)
      val plan = df.queryExecution.optimizedPlan
      // exactly one merge window, and the plan is a union whose
      // OTHER side (part=1, no logs) is window-free
      assert(windows(df).size == 1, plan.toString)
      val union = plan.collectFirst { case u: Union => u }
        .getOrElse(fail(s"expected a Union of plain + merged sides:\n$plan"))
      val windowFreeSides = union.children.count(
        _.collect { case w: Window => w }.isEmpty)
      assert(windowFreeSides == 1, plan.toString)

      // a filter on the fast-path side still reaches its parquet scan
      val filtered = new HudiTable("t", dir)(spark, ReadArgs.where(
        graft.core.Filter("v", "=", "c")))
      val exec = filtered.queryExecution.executedPlan.toString
      assert(exec.contains("PushedFilters:") && exec.contains("EqualTo(v,c)"),
        s"filter not pushed to the plain side:\n$exec")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("compaction restores the window-free plan") {
    val dir = tempDir("mor-plan-compact").toString + "/t"
    HudiWrite.bulkInsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), dir, "id",
      tableType = "MERGE_ON_READ")
    HudiWrite.upsert(spark, Seq((1L, "A2")).toDF("id", "v"), dir)
    assert(windows(new HudiTable("t", dir)(spark, ReadArgs.empty)).size == 1)
    HudiWrite.compact(spark, dir)
    assert(windows(new HudiTable("t", dir)(spark, ReadArgs.empty)).isEmpty)
  }
}
