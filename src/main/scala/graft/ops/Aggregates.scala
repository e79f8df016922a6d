package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import graft.Protocol._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.4 — aggregation family.
  *
  * All aggregates follow the exact-decimal protocol (Protocol.scala):
  * partial/final hash aggregation commutes for exact decimal addition,
  * so these plans scale to any partition count without changing the
  * answer — the property that makes the same code correct at sf0.001
  * and at 100 TB.
  */
object Aggregates {

  /** Reusable oracle fragment: exact decimal cast of the fixture cols. */
  private val dQty   = "CAST(l_quantity AS DECIMAL(12,4))"
  private val dPrice = "CAST(l_extendedprice AS DECIMAL(12,2))"
  private val dDisc  = "CAST(l_discount AS DECIMAL(6,2))"
  private val dTax   = "CAST(l_tax AS DECIMAL(6,2))"

  /** Flagship: TPC-H Q1 shape — scan → pushed filter → hash agg with
    * map-side partials → sort. One shuffle (on the 2-col group key). */
  val q1PricingSummary: QDef = q(
    "q1_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(SUM($dQty) AS DOUBLE) AS sum_qty,
      |  CAST(SUM($dPrice) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM($dPrice * (1 - $dDisc)) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM($dPrice * (1 - $dDisc) * (1 + $dTax)) AS DOUBLE) AS sum_charge,
      |  CAST(SUM($dQty) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM($dPrice) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM($dDisc) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
    val l = Tables.lineitem(s, d)
    l.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        outDouble(sum(qty(col("l_quantity")))).as("sum_qty"),
        outDouble(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        outDouble(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))).as("sum_disc_price"),
        outDouble(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))) * (lit(1) + rate(col("l_tax"))))).as("sum_charge"),
        avgOf(sum(qty(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avgOf(sum(money(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        avgOf(sum(rate(col("l_discount"))), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val all: Seq[QDef] = Seq(q1PricingSummary)
}
