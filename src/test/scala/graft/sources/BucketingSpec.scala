package graft.sources

import graft.{SparkSpec, Tables}

/** Bucketed co-located join: the whole point is the ABSENCE of
  * shuffle exchanges in the physical plan — asserted here with
  * broadcast disabled so the planner can't sidestep the question. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the join key plans without exchanges") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
