package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Shared per-JVM cache of every graded query's ANALYZED plan at the
  * static fixture tier (r14) — the two registry-wide expression gates
  * (DecimalCastBoundsSpec, TranscendentalProtocolSpec) each need all
  * ~354 analyzed plans, and analysis costs ~100–200 ms per key;
  * computing the pass once per JVM instead of once per suite keeps
  * the suite-wall-time line flat as the registry grows. Analyzed
  * plans are immutable trees, so sharing across concurrently-running
  * suites in the parallel group is safe. */
object StaticPlans {
  val sfStatic = "/root/testdata/sf0.001"
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, LogicalPlan]()

  def analyzed(spark: SparkSession, key: String): LogicalPlan =
    cache.computeIfAbsent(key,
      _ => SparkEntry.queries(key)(spark, sfStatic).queryExecution.analyzed)
}
