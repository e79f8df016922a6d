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
class PlanInvariantsSpec extends SparkSpec with SerialSuite {


  private def offenders(pred: org.apache.spark.sql.execution.SparkPlan => Boolean,
      except: Set[String] = Set.empty): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => except(name) }
      .flatMap { case (name, _) =>
        // shared cold-cache physical pass (r15): four structural
        // sweeps over 360 keys read ONE planning pass per JVM
        val plan = StaticPlans.physical(spark, name).sparkPlan
        if (plan.exists(pred)) Some(name) else None
      }

  test("no graded query plans a single-partition (unpartitioned) window") {
    val bad = offenders {
      case w: WindowExec => w.partitionSpec.isEmpty
      case _ => false
    }
    assert(bad.isEmpty,
      s"unpartitioned WindowExec in graded plans: ${bad.mkString(", ")}")
  }

  test("no graded query plans a CartesianProduct") {
    // Every cross join in a graded plan must be a broadcast nested
    // loop (small side broadcast), never CartesianProductExec — the
    // all-pairs shuffle that cannot survive any scale-up.
    val bad = offenders(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
    assert(bad.isEmpty,
      s"CartesianProductExec in graded plans: ${bad.mkString(", ")}")
  }

  test("no custom expression in a graded plan is a CodegenFallback") {
    // The repo's expression contract: every graft.* Expression ships
    // real doGenCode (a CodegenFallback would evaluate interpreted
    // per row INSIDE an apparently-codegen'd span — invisible in
    // explain output, 3-10x in the hot path). Walk every expression
    // tree of every graded plan; InterpretedParitySpec proves the
    // eval twin agrees, this proves the codegen twin exists.
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, _) =>
      val plan = StaticPlans.physical(spark, name).sparkPlan
      val offending = plan.flatMap(_.expressions.flatMap(_.collect {
        case e if e.getClass.getName.startsWith("graft.") &&
            e.isInstanceOf[CodegenFallback] => e.getClass.getSimpleName
      })).distinct
      if (offending.nonEmpty) Some(s"$name: ${offending.mkString(",")}") else None
    }
    assert(bad.isEmpty,
      s"CodegenFallback custom expressions in graded plans: ${bad.mkString("; ")}")
  }

  test("no graded query explodes an interpreted higher-order expression") {
    // A Generate whose generator input is a higher-order function
    // (transform/zip_with/...) drops off the codegen path and
    // re-evaluates the interpreted lambda pathologically — measured
    // 3-10x slower than exploding an index sequence and computing per
    // row (see the langid/udtf_bigrams/contamination builds).
    // Exception: sim_lsh_bucketed explodes a transform over its ONE
    // probe row (9 evaluations total) and eval_ann_recall over its
    // fixed 8-row query panel (72 total) — structurally harmless.
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    val bad = offenders({
      case g: org.apache.spark.sql.execution.GenerateExec =>
        g.generator.children.exists(_.exists(_.isInstanceOf[HigherOrderFunction]))
      case _ => false
    }, except = Set("sim_lsh_bucketed", "eval_ann_recall"))
    assert(bad.isEmpty,
      s"Generate over higher-order expression in graded plans: ${bad.mkString(", ")}")
  }
}
