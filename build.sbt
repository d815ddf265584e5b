ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datarepospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// r16: 959 tests ran ~23.5 min in ONE forked JVM — past the driver's
// verification budget (the r15 gate's JVM was killed mid-suite, which
// surfaced as a "SparkContext was stopped" failure in GraftProperties).
// Suites now split across concurrently-forked JVM groups: each group
// gets its OWN SparkSession (suites that mutate session confs cannot
// race across JVMs), and the measured-heavy suites are pinned to
// distinct groups so no group carries two of them. Measured wall:
// 23.5 min -> ~4 min at 8 groups on 32 cores (each test session is
// local[4], so 8 groups fit without oversubscription).
val testGroupCount = 8
val pinnedHeavySuites: Map[String, Int] = Seq(
  "graft.operators.ReplicateSpec",
  "graft.spark.GraftSourceSpec",
  "graft.operators.GraphRankSpec",
  "graft.tables.HudiEvolutionSpec",
  "graft.tables.HudiChangesSpec",
  "graft.operators.ReplicateStreamSpec",
  "graft.tables.HudiMorSpec",
  "graft.GraftProperties",
  "graft.plans.ScanPlanWidthSpec",
  "graft.spark.ResidualDmlSpec",
  "graft.tables.LakehouseSqlSpec",
  "graft.tables.IcebergChangesSpec",
  "graft.tables.DeltaSpec",
  "graft.tables.DeltaFilesDatasetSpec",
  "graft.operators.VectorIndexSpec",
  "graft.streaming.ChangeFeedStreamSourceSpec",
  "graft.tables.MergeDvSpec",
  "graft.spark.MergeClauseSurfaceSpec",
  "graft.spark.MergeClausePropertySpec",
  "graft.operators.IncrementalViewSpec",
).zipWithIndex.map { case (n, i) => n -> (i % testGroupCount) }.toMap
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jo = (Test / javaOptions).value.toVector
  val base = baseDirectory.value
  tests.groupBy { t =>
    pinnedHeavySuites.getOrElse(t.name,
      math.abs(t.name.hashCode) % testGroupCount)
  }.toSeq.sortBy(_._1).map { case (i, ts) =>
    Tests.Group(s"g$i", ts,
      Tests.SubProcess(ForkOptions()
        .withWorkingDirectory(Some(base))
        .withRunJVMOptions(jo)))
  }
}
// default restriction runs forked test groups one at a time — lift it
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()))
// Forked run output goes straight to stdout (no sbt "[info] " prefix),
// so Bench/Verify JSON lines stay machine-parseable.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
