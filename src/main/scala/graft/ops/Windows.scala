package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import graft.Protocol._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.5 — window functions.
  *
  * Every window ORDER BY carries a unique tie-break key (D1), so frame
  * contents — and therefore every analytic value — are identical
  * across engines and across partition counts. One shuffle per
  * distinct partitioning; Spark plans consecutive windows over the
  * same (partition, order) spec into a single WindowExec.
  */
object Windows {

  private def overCust = Window.partitionBy(col("o_custkey"))

  val winRankDenseRow: QDef = q(
    "win_rank_dense_row",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  rank()       OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  row_number() OVER w AS rn
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
    val w = overCust.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** lag/lead over the event stream; ts second-truncated (D4) and the
    * gap computed as an exact BIGINT of seconds. */
  val winLagLead: QDef = q(
    "win_lag_lead",
    """SELECT event_id, user_id,
      |  lag(event_type)  OVER w AS prev_type,
      |  lead(event_type) OVER w AS next_type,
      |  date_diff('second', lag(ts_sec) OVER w, ts_sec) AS gap_sec
      |FROM (SELECT event_id, user_id, event_type,
      |             date_trunc('second', ts) AS ts_sec FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |ORDER BY event_id""") { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsSec(col("ts")).as("ts_sec"))
      .select(col("event_id"), col("user_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        (unix_timestamp(col("ts_sec")) - unix_timestamp(lag(col("ts_sec"), 1).over(w)))
          .as("gap_sec"))
      .orderBy(col("event_id"))
  }

  /** Running exact-decimal revenue per customer over order date. */
  val winRunningSum: QDef = q(
    "win_running_sum",
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
    val w = overCust.orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("order_date"),
        outDouble(sum(money(col("o_totalprice"))).over(w)).as("run_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** 4-row sliding average — ROWS frame (RANGE + ties is ambiguous),
    * D3 avg from exact frame sum / frame count. */
  val winSlidingAvg: QDef = q(
    "win_sliding_avg",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS moving_avg
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
    val w = overCust.orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-3, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        (outDouble(sum(money(col("o_totalprice"))).over(w))
          / count(lit(1)).over(w)).as("moving_avg"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** ntile / percent_rank / cume_dist over a globally ordered key with
    * unique tie-break. Global window = single-partition sort: fine at
    * fixture scale, and the documented pattern is per-group at 100 TB. */
  val winDistribution: QDef = q(
    "win_distribution",
    """SELECT c_custkey, c_acctbal,
      |  ntile(4)       OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist()    OVER w AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""") { (s, d) =>
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("c_custkey"))
  }

  /** first/last_value with the frame made EXPLICIT — the default
    * (unbounded preceding .. current row) silently breaks last_value. */
  val winFirstLast: QDef = q(
    "win_first_last",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS best_order,
      |  last_value(o_orderkey)  OVER w AS worst_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
    val w = overCust.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("best_order"),
        last(col("o_orderkey")).over(w).as("worst_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Top-3 per group via row_number filter — the distributed top-k
    * pattern (no global sort; per-partition heap then one shuffle on
    * the group key). */
  val topkPerGroup: QDef = q(
    "topk_per_group",
    """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand
      |                       ORDER BY p_retailprice DESC, p_partkey) AS rn
      |  FROM part)
      |WHERE rn <= 3
      |ORDER BY p_brand, rn""") { (s, d) =>
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("p_brand"), col("rn"))
  }

  val all: Seq[QDef] = Seq(
    winRankDenseRow, winLagLead, winRunningSum, winSlidingAvg,
    winDistribution, winFirstLast, topkPerGroup)
}
