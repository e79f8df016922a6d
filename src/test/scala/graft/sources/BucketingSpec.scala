package graft.sources

import graft.{SparkSpec, Tables}

/** Bucketed co-located join: the whole point is the ABSENCE of
  * shuffle exchanges in the physical plan — asserted here with
  * broadcast disabled so the planner can't sidestep the question. */
class BucketingSpec extends SparkSpec with graft.SerialSuite {

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

  test("an equality filter on the bucket column prunes to one bucket at scan") {
    // The read-side half of the bucketing story: the layout buys not
    // just exchange-free joins but bucket PRUNING — a point/IN
    // predicate on the bucket column must touch 1 of N buckets, not
    // scan the table. At 100 TB this is the difference between a key
    // lookup reading ~1/N of the fact and reading all of it. Asserted
    // structurally (the scan's optionalBucketSet) and by result.
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice"), "b_prune_orders", "o_orderkey", 8)
    try {
      val key = graft.Tables.orders(spark, sf)
        .select("o_orderkey").head().getLong(0)
      val df = spark.table("b_prune_orders")
        .filter(org.apache.spark.sql.functions.col("o_orderkey") === key)
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
      val buckets = scans.head.optionalBucketSet
      assert(buckets.isDefined && buckets.get.cardinality() == 1,
        "expected exactly 1 of 8 buckets selected:\n" +
          df.queryExecution.executedPlan)
      val rows = df.collect()
      assert(rows.nonEmpty && rows.forall(_.getLong(0) == key))
    } finally spark.sql("DROP TABLE IF EXISTS b_prune_orders")
  }
}
