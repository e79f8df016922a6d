package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Dev-only golden-map generator (test sourceset — never ships):
  * prints every graded query's static-plan shuffle-exchange count in
  * the exact format GoldenShufflesSpec pins, against the SAME shared
  * test session the spec uses (plan shape depends on broadcast
  * sizing, so tool and spec must see identical conf + fixtures).
  *
  * Usage: Test / runMain graft.tools.ShuffleAudit
  * Paste the output block into GoldenShufflesSpec.golden after a
  * DELIBERATE plan change, with a PLANS.md note saying why.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val sf = "/root/testdata/sf0.001"
    // Exchanges are inserted by the EnsureRequirements PREPARATION
    // rule, so they only exist in executedPlan — and AQE must be off
    // or the adaptive wrapper hides the exchange nodes from collect()
    // (same conf scoping as GoldenShufflesSpec; single-threaded).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sf).queryExecution.executedPlan.collect {
        case _: ShuffleExchangeExec => 1
      }.sum
      println(s"""    "$name" -> $n,""")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    spark.stop()
  }
}
