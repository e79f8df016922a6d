package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Cost-based-optimizer surface (VERDICT r2 gap #5): ANALYZE TABLE
  * statistics feeding CBO join planning. At cluster scale, AQE
  * re-plans at runtime; CBO's table/column stats are the COMPILE-time
  * complement that lets the planner size join sides it has never
  * executed. This spec demonstrates the full path: persist tables →
  * ANALYZE (table + columns) → stats visible in the catalog and in
  * the optimized plan → the star join picks broadcast builds from
  * those stats with the auto-broadcast threshold as the decider.
  */
class CboStatsSpec extends SparkSpec with graft.SerialSuite {

  private val sf = "/root/testdata/sf0.001"


  test("ANALYZE TABLE stats flow into catalog, plan sizing, and join strategy") {
    val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    try {
      Tables.nation(spark, sf).write.mode("overwrite").saveAsTable("graft_cbo.nation")
      Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("graft_cbo.orders")
      spark.sql("ANALYZE TABLE graft_cbo.nation COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE graft_cbo.nation COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_name")
      spark.sql("ANALYZE TABLE graft_cbo.orders COMPUTE STATISTICS")

      // catalog carries exact row counts after ANALYZE
      val described = spark.sql("DESC EXTENDED graft_cbo.nation")
        .filter(col("col_name") === "Statistics")
        .select("data_type").collect().map(_.getString(0))
      assert(described.nonEmpty && described.head.contains("25 rows"), described.toSeq)

      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val joined = spark.table("graft_cbo.orders")
        .join(spark.table("graft_cbo.nation"),
          col("o_custkey") % 25 === col("n_nationkey"))
      // optimizer sees the analyzed row count, not a guess
      val nationStats = spark.table("graft_cbo.nation")
        .queryExecution.optimizedPlan.stats
      assert(nationStats.rowCount.contains(BigInt(25)), nationStats)
      // and the 25-row side is chosen as the broadcast build
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally {
      prevCbo match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      spark.sql("DROP DATABASE IF EXISTS graft_cbo CASCADE")
    }
  }

  test("CBO reorders a star join from analyzed stats (VERDICT r5 item 5)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cbo2")
    val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      Tables.nation(spark, sf).write.mode("overwrite").saveAsTable("graft_cbo2.nation")
      Tables.customer(spark, sf).write.mode("overwrite").saveAsTable("graft_cbo2.customer")
      Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("graft_cbo2.orders")
      Seq("nation", "customer", "orders").foreach { t =>
        spark.sql(s"ANALYZE TABLE graft_cbo2.$t COMPUTE STATISTICS")
        spark.sql(s"ANALYZE TABLE graft_cbo2.$t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      // Written fact-first: (orders ⋈ customer) ⋈ nation. With exact
      // row counts (orders >> customer > nation) the cost-based
      // reorder prefers building the small dim⋈dim side first —
      // the smallest intermediate — so the optimized tree differs
      // from the syntactic one. That decision needs the ANALYZE
      // stats; syntax alone can't make it (both orders are valid
      // chains, no cross product for the heuristic rule to fix).
      def star = spark.table("graft_cbo2.orders")
        .join(spark.table("graft_cbo2.customer"), col("o_custkey") === col("c_custkey"))
        .join(spark.table("graft_cbo2.nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      def innermostJoinLeaves(df: org.apache.spark.sql.DataFrame): Seq[String] = {
        val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
        joins.last.collectLeaves().map(_.toString)
      }
      // match on the qualified TABLE identifier, not a bare substring:
      // the customer leaf's string contains "c_nationkey", so a bare
      // contains("nation") would be satisfied by customer alone
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val before = innermostJoinLeaves(star)
      assert(before.exists(_.contains("graft_cbo2.orders")),
        s"syntactic inner join should include the fact table: $before")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val after = innermostJoinLeaves(star)
      assert(!after.exists(_.contains("graft_cbo2.orders")),
        s"CBO should join the two analyzed dims first, fact last: $after")
      assert(after.exists(_.contains("graft_cbo2.customer")) &&
        after.exists(_.contains("graft_cbo2.nation")),
        s"expected customer x nation as the innermost join: $after")
      // reorder must not change results
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val rowsOff = star.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val rowsOn = star.collect().map(_.toString).sorted.toSeq
      assert(rowsOn == rowsOff)
    } finally {
      prevCbo match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      spark.sql("DROP DATABASE IF EXISTS graft_cbo2 CASCADE")
    }
  }
}
