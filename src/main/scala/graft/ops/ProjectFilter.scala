package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import graft.Protocol._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — projection & filtering. */
object ProjectFilter {

  /** Per-line decimal arithmetic (the harmonized-measure computation):
    * charge = extendedprice * (1-discount) * (1+tax), exact decimals
    * cast to double per Protocol. Narrow transformation — no shuffle
    * except the final presentation sort. */
  val projectArithmetic: QDef = q(
    "project_arithmetic",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) AS DOUBLE) AS disc_price,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) * (1 + CAST(l_tax AS DECIMAL(6,2))) AS DOUBLE) AS charge
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, disc_price, charge""") { (s, d) =>
    // (l_orderkey, l_linenumber) is NOT unique — order by all outputs (D1).
    val l = Tables.lineitem(s, d)
    val discPrice = money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
    l.select(
        col("l_orderkey"), col("l_linenumber"),
        outDouble(discPrice).as("disc_price"),
        outDouble(discPrice * (lit(1) + rate(col("l_tax")))).as("charge"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_price"), col("charge"))
  }

  /** Compound predicate: AND/OR/NOT + IN + BETWEEN + LIKE. All of it
    * folds into one codegen'd filter stage over the scan. */
  val filterCompound: QDef = q(
    "filter_compound",
    """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
      |FROM part
      |WHERE p_size BETWEEN 5 AND 30
      |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#17')
      |  AND (p_name LIKE '%red%' OR p_type = 'ECONOMY')
      |  AND NOT (p_retailprice > 990.0)
      |ORDER BY p_partkey""") { (s, d) =>
    Tables.part(s, d)
      .filter(
        col("p_size").between(5, 30) &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#17") &&
        (col("p_name").like("%red%") || col("p_type") === "ECONOMY") &&
        !(col("p_retailprice") > 990.0))
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  val all: Seq[QDef] = Seq(projectArithmetic, filterCompound)
}
