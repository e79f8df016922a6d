package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom grouped-top-k operator must return exactly the rows the
  * window row_number formulation returns (as a set — the operator
  * leaves presentation order to the caller), use the custom exec in
  * its plan, and handle groups smaller than k / duplicate sort keys. */
class GroupedTopKSpec extends SparkSpec {

  test("matches the window formulation on the part fixture") {
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    val viaCustom = GroupedTopK.topkPerGroup(
        part, Seq("p_brand"),
        Seq("p_retailprice" -> false, "p_partkey" -> true), 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .collect().toSet
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val viaWindow = part
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .collect().toSet
    assert(viaCustom == viaWindow)
    assert(viaCustom.nonEmpty)
  }

  test("plans through GroupedTopKExec with a clustering exchange") {
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    val df = GroupedTopK.topkPerGroup(
      part, Seq("p_brand"), Seq("p_retailprice" -> false), 2)
    // TreeNode rendering strips the Exec suffix; AQE hides children
    // from exists(), so assert on the rendered tree.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan)
    assert(plan.contains("Exchange hashpartitioning(p_brand"),
      s"clustering exchange missing:\n$plan")
  }

  test("the graded topk_per_group registry query plans through GroupedTopKExec") {
    val df = graft.SparkEntry.queries("topk_per_group")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan)
  }

  test("groups smaller than k are returned whole; ties respect the tie-break") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1L, 5.0), ("g1", 2L, 5.0), ("g1", 3L, 5.0), ("g1", 4L, 1.0),
      ("g2", 9L, 7.0)).toDF("g", "id", "v")
    val out = GroupedTopK.topkPerGroup(
        df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // g1: two best of the 5.0-tie by id → (1, 2); g2: whole group
    assert(out == Set(("g1", 1L), ("g1", 2L), ("g2", 9L)))
  }

  test("k larger than any group returns everything") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val out = GroupedTopK.topkPerGroup(df, Seq("g"), Seq("v" -> true), 100)
    assert(out.count() == 3)
  }

  test("null order values follow SortOrder defaults (nulls first ascending)") {
    import spark.implicits._
    val df = Seq(("g", Some(2)), ("g", None), ("g", Some(1)), ("g", Some(3)))
      .toDF("g", "v")
    val viaCustom = GroupedTopK.topkPerGroup(df, Seq("g"), Seq("v" -> true), 2)
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getInt(1))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getInt(1))).toSet
    // Spark sorts NULL FIRST ascending — both paths must keep {null, 1}
    assert(viaCustom == viaWindow && viaCustom == Set(None, Some(1)))
  }
}
