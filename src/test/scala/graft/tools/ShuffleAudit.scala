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
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sf).queryExecution.sparkPlan.collect {
        case _: ShuffleExchangeExec => 1
      }.sum
      println(s"""    "$name" -> $n,""")
    }
    spark.stop()
  }
}
