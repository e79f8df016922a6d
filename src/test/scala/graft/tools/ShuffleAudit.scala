package graft.tools

import graft.{SparkEntry, StaticPlans}

/** Dev-only golden-map generator (test sourceset — never ships):
  * prints every graded query's static-plan shuffle count in the
  * exact format GoldenShufflesSpec pins, through the SAME shared
  * StaticPlans pass and the SAME paidShuffles counter the spec
  * asserts with (r19 — the tool previously re-planned keys itself
  * and counted only top-level exchanges; it now cannot drift from
  * the spec's protocol: AQE off, cold cache per key, sorted order,
  * InMemoryRelation.cachedPlan recursion).
  *
  * Usage: Test / runMain graft.tools.ShuffleAudit
  * Paste the output block into GoldenShufflesSpec.golden after a
  * DELIBERATE plan change, with a PLANS.md note saying why.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, _) =>
      val n = StaticPlans.paidShuffles(
        StaticPlans.physical(spark, name).executedPlan)
      println(s"""    "$name" -> $n,""")
    }
    spark.stop()
  }
}
