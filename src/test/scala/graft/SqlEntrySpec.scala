package graft

import org.apache.spark.sql.functions._

/** SURVEY §3 entry point B: every fixture table is reachable as a
  * temp view, and Spark SQL text produces the same results as the
  * DataFrame formulations — including through the session extension
  * (graft_dot in SQL). */
class SqlEntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registered views answer the flagship query identically to the DataFrame API") {
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val viaDf = ops.Aggregates.q1PricingSummary.run(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("star join over views matches the DataFrame star join") {
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, year(o_orderdate)
        |ORDER BY r_name, o_year""".stripMargin).collect()
    val viaDf = ops.Joins.joinStar3way.run(spark, sf).collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("the custom graft_dot expression is usable in SQL over the embeddings view") {
    Tables.registerViews(spark, sf)
    val sims = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS n2
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    assert(sims.length == 5 && sims.forall(_.getDouble(1) > 0.0))
  }
}
