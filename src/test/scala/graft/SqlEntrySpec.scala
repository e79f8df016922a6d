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

  test("events view serves the normalized timestamp through SQL text") {
    // Entry point B over the one table whose on-disk type has drifted
    // between fixture generations (ns through r8, µs since r9): the
    // registered view must serve Tables.events' NORMALIZED output —
    // session-UTC TimestampType — not the raw footer type, and SQL
    // text must see the same values as the DataFrame reader.
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      "SELECT event_id, ts FROM events ORDER BY event_id LIMIT 3")
    assert(viaSql.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val viaDf = Tables.events(spark, sf)
      .select("event_id", "ts").orderBy("event_id").limit(3)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("the custom graft_dot expression is usable in SQL over the embeddings view") {
    Tables.registerViews(spark, sf)
    val sims = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS n2
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    assert(sims.length == 5 && sims.forall(_.getDouble(1) > 0.0))
  }

  test("SQL-text and DataFrame forms of graft_cosine compile to the identical plan") {
    // VERDICT r8 item 5: the extension registration (entry point B)
    // must produce the SAME expression tree the DataFrame builders
    // produce — not merely the same rows. Canonicalized optimized
    // plans compare structurally (exprIds normalized), so any drift
    // between the two surfaces (a cast, a different child order, a
    // wrapper) fails here.
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      "SELECT vec_id, graft_cosine(embedding, embedding) AS c FROM embeddings")
    val viaDf = spark.table("embeddings")
      .select(col("vec_id"),
        functions.VectorFunctions.floatCosine(col("embedding"), col("embedding")).as("c"))
    assert(viaSql.queryExecution.optimizedPlan.canonicalized ==
      viaDf.queryExecution.optimizedPlan.canonicalized,
      s"SQL:\n${viaSql.queryExecution.optimizedPlan}\nDF:\n${viaDf.queryExecution.optimizedPlan}")
  }

  test("SQL-text and DataFrame forms of a litInt-parameterized expression match") {
    // Same contract for the builder path that folds the SQL `n`
    // argument into the expression's Int parameter (litInt): the
    // SQL literal 3 and the Scala literal 3 must yield one plan.
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      "SELECT doc_id, graft_shingle_hashes(split(text, ' '), 3) AS sh FROM documents")
    val viaDf = spark.table("documents")
      .select(col("doc_id"),
        functions.VectorFunctions.shingleHashes(split(col("text"), " "), 3).as("sh"))
    assert(viaSql.queryExecution.optimizedPlan.canonicalized ==
      viaDf.queryExecution.optimizedPlan.canonicalized,
      s"SQL:\n${viaSql.queryExecution.optimizedPlan}\nDF:\n${viaDf.queryExecution.optimizedPlan}")
  }
}
