package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.DynamicPruning
import org.apache.spark.sql.execution.FileSourceScanExec

/** Dynamic partition pruning — the one SURVEY §4.1 scale-critical
  * optimizer path the plan suite never certified (VERDICT r7 item 1).
  * The graded `join_dpp_partitioned` key pins the RESULT through the
  * oracle; this spec pins the MECHANISM: the fact scan must carry a
  * runtime `dynamicpruningexpression` partition filter (static
  * pruning cannot fire — the dim filter is on a non-key attribute),
  * and executing the query must actually skip the non-matching year
  * directories, observable in the scan's partition-count metric.
  * Failing either assertion means 100 TB fact scans silently read
  * every partition. AQE scoped OFF like GoldenShufflesSpec: the
  * adaptive wrapper hides children from collect(), and the invariant
  * is structural. */
class DppSpec extends SparkSpec {

  test("join_dpp_partitioned prunes fact partitions dynamically") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.ops.Scans.joinDppPartitioned
        .run(spark, "/root/testdata/sf0.001")
      val dppScans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
            if s.partitionFilters.exists(_.exists(_.isInstanceOf[DynamicPruning])) => s
      }
      assert(dppScans.nonEmpty,
        "fact scan lost its dynamicpruningexpression partition filter:\n" +
          df.queryExecution.executedPlan.toString)

      // Runtime proof, not just plan shape: the fixture years span
      // 1995-2001 (7 directories); the dim's band='early' filter
      // survives years 1995-1997, so a fired DPP reads exactly 3.
      df.collect()
      val read = dppScans.head.metrics("numPartitions").value
      assert(read == 3L,
        s"DPP read $read fact partitions (expected 3 of 7 — pruning did not fire)")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
