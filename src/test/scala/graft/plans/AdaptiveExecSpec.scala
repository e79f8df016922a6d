package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE runtime re-planning — the two mechanisms the 100 TB posture
  * leans on beyond static planning, neither previously certified:
  *
  *  - skew-join split (OptimizeSkewedJoin): `join_skew_salted` grades
  *    MANUAL salting; at cluster scale the first line of defense is
  *    AQE splitting an oversized shuffle partition into parallel
  *    sub-reads, and a conf/regression that silently disabled it
  *    would resurrect the straggler problem salting exists for.
  *  - partition coalescing: with shuffle.partitions sized for the
  *    large stages, small intermediate shuffles must collapse their
  *    empty/tiny partitions or task-scheduling overhead dominates.
  *
  * Thresholds are conf'd down so the local fixture-scale shuffles
  * qualify. Assertions read the ADAPTIVE final plan; both the
  * AdaptiveSparkPlanExec wrapper AND QueryStageExec nodes are
  * traversal barriers (stages are leaves to collect()), hence the
  * stage-recursive flatten below. */
class AdaptiveExecSpec extends SparkSpec with graft.SerialSuite {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
  }

  /** Every node in the final adaptive plan, descending into
    * materialized query stages (collect() treats them as leaves). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case x => x }.flatMap {
      case q: QueryStageExec => q +: flatten(q.plan)
      case x => Seq(x)
    }

  test("AQE splits a skewed join partition into parallel sub-reads") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    try {
      // one hot key carrying 190k padded rows (~20 MB of shuffle
      // payload vs ~300 KB siblings) — the classic straggler shape.
      // The pad must SURVIVE the join (summed below) or column
      // pruning shrinks the hot partition under the skew threshold.
      val left = spark.range(0, 200000)
        .select(when(col("id") < 190000, 0L).otherwise(col("id")).as("k"),
          concat(lit("x" * 100), col("id")).as("pad"))
      val right = spark.range(0, 500).select(col("id").as("k2"))
      val joined = left.join(right, col("k") === col("k2"))
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("padlen"))
      val plan = finalPlan(joined)
      val skewJoins = flatten(plan).collect {
        case s: SortMergeJoinExec if s.isSkewJoin => s
      }
      assert(skewJoins.nonEmpty,
        s"OptimizeSkewedJoin did not fire on the hot-key join:\n$plan")
      // correctness under the split: only the hot key matches the
      // 0-499 dim (the 190000+ tail keys fall outside it)
      assert(joined.collect().head.getLong(0) == 190000L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("AQE coalesces a tiny shuffle below the session partition count") {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val agg = spark.range(0, 100)
      .groupBy((col("id") % 7).as("g")).agg(count(lit(1)).as("n"))
    val plan = finalPlan(agg)
    val reads = flatten(plan).collect { case r: AQEShuffleReadExec => r }
    assert(reads.nonEmpty, s"no AQEShuffleRead in the final plan:\n$plan")
    assert(reads.exists(_.partitionSpecs.size < parts),
      s"tiny shuffle kept all $parts partitions:\n$plan")
  }
}
