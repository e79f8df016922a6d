package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — the row-level sibling of DPP
  * (DppSpec) and the remaining scale-critical optimizer path with no
  * certification: when a shuffle join's creation side carries a
  * selective filter, Catalyst's InjectRuntimeFilter builds a bloom
  * filter over the surviving join keys and pushes a `might_contain`
  * probe into the application side's scan stage, cutting the big
  * side's shuffle volume BEFORE the exchange. At 100 TB, where the
  * dim is too big to broadcast and the fact's join column is not the
  * partition column (so DPP can't fire), this is the one mechanism
  * that keeps the fact shuffle proportional to the filtered dim.
  *
  * The fixture is far below the default 10 GB application-side
  * threshold, so the size gates are conf'd down to let the rule
  * judge this plan; the assertions are structural (the rule fired
  * and the probe sits on the application side) plus a correctness
  * cross-check against the unfiltered join. */
class RuntimeFilterSpec extends SparkSpec with graft.SerialSuite {

  test("a selective dim filter injects a bloom probe into the fact side") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    try {
      val sf = "/root/testdata/sf0.001"
      def query = {
        val dim = Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        Tables.lineitem(spark, sf)
          .select(col("l_orderkey"), col("l_quantity"))
          .join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n"))
      }
      val df = query
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"InjectRuntimeFilter did not fire:\n$optimized")
      // The probe must land on the APPLICATION (lineitem) side —
      // filtering the dim by its own keys would be a no-op.
      val probeSide = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("might_contain") => f
      }
      assert(probeSide.nonEmpty &&
        probeSide.head.output.exists(_.name == "l_orderkey"),
        s"bloom probe not on the fact side:\n$optimized")
      // Filter semantics: the bloom probe may pass false positives
      // into the join but must never drop a matching row — results
      // identical to the same join with the rule disabled.
      val withFilter = df.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = query.collect().map(_.toString).sorted.toSeq
      assert(withFilter == without, "bloom-filtered join changed the results")
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
    }
  }
}
