ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "integratorspark"
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
// r13: parallel suite execution. Two forked JVMs: "plan-serial" holds
// the suites that assert on cold-cache plan structure or mutate
// shared session conf (they also serialize against each other via the
// graft.SerialSuite lock, since testForkedParallel applies inside
// every group); "parallel" runs everything else concurrently — those
// suites were made parallel-safe by moving all conf overrides onto
// throwaway newSession()s. Keep serialSuites in sync with the
// `with SerialSuite` extends clauses.
Test / testForkedParallel := true
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val serialSuites = Set(
    "graft.GoldenShufflesSpec", "graft.PlanInvariantsSpec",
    "graft.plans.AdaptiveExecSpec", "graft.tools.ExplainSmokeSpec",
    "graft.sources.BucketingSpec", "graft.sources.RuntimeFilterSpec",
    "graft.sources.DppSpec", "graft.sources.CboStatsSpec",
    // the spark.catalog.clearCache() callers: a GLOBAL cache clear
    // mid-flight yields BlockNotFound / empty reads in concurrently
    // executing suites (measured r13) — they serialize here instead
    "graft.OpsPropertySpec", "graft.functions.InterpretedParitySpec",
    "graft.pipeline.PipelineEdgeCasesSpec",
    "graft.pipeline.ConnectedComponentsSpec")
  val (serial, par) = tests.partition(t => serialSuites(t.name))
  Seq(
    new Tests.Group("plan-serial", serial, Tests.SubProcess(opts)),
    new Tests.Group("parallel", par, Tests.SubProcess(opts)))
}
// Let the two groups' JVMs run concurrently (default caps forked test
// groups at 1); if the default rule's shape ever changes this filter
// is a no-op and the groups just run back-to-back.
Global / concurrentRestrictions := {
  (Global / concurrentRestrictions).value
    .filterNot(_ == Tags.limit(Tags.ForkedTestGroup, 1)) :+
    Tags.limit(Tags.ForkedTestGroup, 2)
}
// The grading driver parses the LAST stdout lines of `sbt runMain` for a
// bare JSON metric line. sbt's default output strategy prefixes forked
// output with "[info] " and appends a "[success] Total time" banner —
// both defeat a line-oriented JSON parser. Pass the child's stdout
// through raw and drop the success banner.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
  // 24g default: local[32] runs 32 executor threads in THIS heap, and
  // the shingle/md5-heavy dedup queries churn multi-GB of short-lived
  // garbage; at 8g the GC pauses bled 10-20 s into innocent-neighbor
  // query timings. The host has 128 GiB. On a real cluster this maps
  // to per-executor memory, sized per core count the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
