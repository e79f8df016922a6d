package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Registry-wide physical-plan invariants — the scale rules the plan
  * audit (PLANS.md) promises, enforced mechanically over every graded
  * query:
  *
  *  - NO single-partition window: a WindowExec with an empty
  *    partitionSpec funnels the whole input through one task (the
  *    round-2 scale-killer in the jaccard dictionary and
  *    win_distribution), so none may appear in any graded plan.
  *
  * Plans are inspected pre-AQE (`sparkPlan`): AQE's runtime wrapper
  * hides children from collect(), and the invariant is structural,
  * not data-dependent.
  */
class PlanInvariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no graded query plans a single-partition (unpartitioned) window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan
      val globals = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (globals.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned WindowExec in graded plans: ${offenders.mkString(", ")}")
  }
}
