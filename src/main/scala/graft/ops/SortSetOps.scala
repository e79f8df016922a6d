package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 (sort / limit / top-k) and §2.7 (set operations). */
object SortSetOps {

  /** Multi-key total-order sort (range-partitioned at scale). */
  val sortMultikey: QDef = q(
    "sort_multikey",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders
      |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC""") { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc, col("o_orderkey").asc)
  }

  /** Global top-k: orderBy + limit plans as TakeOrderedAndProject —
    * per-partition heaps, no global sort, O(k) driver result. */
  val topkGlobal: QDef = q(
    "topk_global",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 20""") { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  /** UNION ALL keeps duplicates; a source tag makes the output key
    * unique so the presentation order is total (D1). */
  val setUnionAll: QDef = q(
    "set_union_all",
    """SELECT * FROM (
      |  SELECT 'high_value' AS src, o_orderkey FROM orders WHERE o_totalprice > 450000
      |  UNION ALL
      |  SELECT 'recent' AS src, o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
      |) ORDER BY src, o_orderkey""") { (s, d) =>
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_totalprice") > 450000)
      .select(lit("high_value").as("src"), col("o_orderkey"))
    val b = o.filter(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
      .select(lit("recent").as("src"), col("o_orderkey"))
    a.unionAll(b).orderBy(col("src"), col("o_orderkey"))
  }

  val setUnionDistinct: QDef = q(
    "set_union_distinct",
    """SELECT o_orderkey FROM orders WHERE o_totalprice > 450000
      |UNION
      |SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
      |ORDER BY o_orderkey""") { (s, d) =>
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_totalprice") > 450000).select(col("o_orderkey"))
    val b = o.filter(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
      .select(col("o_orderkey"))
    a.union(b).distinct().orderBy(col("o_orderkey"))
  }

  /** INTERSECT (set semantics, like SQL). */
  val setIntersect: QDef = q(
    "set_intersect",
    """SELECT p_partkey FROM part WHERE p_size < 10
      |INTERSECT
      |SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 45
      |ORDER BY p_partkey""") { (s, d) =>
    val a = Tables.part(s, d).filter(col("p_size") < 10).select(col("p_partkey"))
    val b = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
      .select(col("l_partkey").as("p_partkey"))
    a.intersect(b).orderBy(col("p_partkey"))
  }

  /** EXCEPT: suppliers never used by any heavy line. */
  val setExcept: QDef = q(
    "set_except",
    """SELECT s_suppkey FROM supplier
      |EXCEPT
      |SELECT l_suppkey AS s_suppkey FROM lineitem WHERE l_quantity >= 49
      |ORDER BY s_suppkey""") { (s, d) =>
    val a = Tables.supplier(s, d).select(col("s_suppkey"))
    val b = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      .select(col("l_suppkey").as("s_suppkey"))
    a.except(b).orderBy(col("s_suppkey"))
  }

  /** Multiset INTERSECT ALL — duplicates kept min(countL, countR)
    * times (different operator than set INTERSECT: Catalyst plans a
    * counted left-semi aggregation, not a distinct). */
  val setIntersectAll: QDef = q(
    "set_intersect_all",
    """SELECT l_partkey AS pk FROM lineitem WHERE l_quantity >= 45
      |INTERSECT ALL
      |SELECT l_partkey AS pk FROM lineitem WHERE l_discount <= 0.02
      |ORDER BY pk""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val a = li.filter(col("l_quantity") >= 45).select(col("l_partkey").as("pk"))
    val b = li.filter(col("l_discount") <= 0.02).select(col("l_partkey").as("pk"))
    a.intersectAll(b).orderBy(col("pk"))
  }

  /** Multiset EXCEPT ALL — per-value count subtraction. */
  val setExceptAll: QDef = q(
    "set_except_all",
    """SELECT l_suppkey AS sk FROM lineitem WHERE l_quantity >= 30
      |EXCEPT ALL
      |SELECT l_suppkey AS sk FROM lineitem WHERE l_quantity >= 40
      |ORDER BY sk""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val a = li.filter(col("l_quantity") >= 30).select(col("l_suppkey").as("sk"))
    val b = li.filter(col("l_quantity") >= 40).select(col("l_suppkey").as("sk"))
    a.exceptAll(b).orderBy(col("sk"))
  }

  /** Per-brand Pareto frontier / skyline (r12c): the parts no other
    * same-brand part beats on BOTH (cheaper-or-equal price,
    * bigger-or-equal size, strictly better in one) — multi-objective
    * selection, the "best tradeoff set" ask the quadratic NOT-EXISTS
    * formulation (the oracle) answers at O(n²). The distributed plan
    * is O(n log n) and never compares pairs: (1) per-(brand, price)
    * max-size hash agg — grouping on the raw parquet DOUBLE is exact,
    * both engines group identical bit patterns; (2) a running strict
    * prior-max window over the per-PRICE table (cardinality = distinct
    * prices per brand, not rows — each window row is one price, so
    * rows-frame [-∞,-1] IS "all strictly cheaper prices"); (3) the
    * surviving frontier prices (≤ distinct sizes of them) broadcast
    * back against the part scan. At 100 TB the agg shuffles
    * (brand, price) partials, the window table stays
    * price-cardinality-sized, and step 3 degrades to an SMJ on the
    * same (brand, price) key the agg already laid out. */
  val paretoFrontierParts: QDef = q(
    "pareto_frontier_parts",
    """SELECT p_brand, p_partkey, p_size, p_retailprice
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q WHERE q.p_brand = p.p_brand
      |    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_brand, p_retailprice, p_partkey""") { (s, d) =>
    val p = Tables.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        col("p_retailprice"))
    val g = p.groupBy(col("p_brand"), col("p_retailprice"))
      .agg(max(col("p_size")).as("gmax"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = g.withColumn("m_lt", max(col("gmax")).over(w))
      .filter(col("m_lt").isNull || col("gmax") > col("m_lt"))
      .select(col("p_brand").as("fb"), col("p_retailprice").as("fp"),
        col("gmax"))
    p.join(broadcast(front),
        col("p_brand") === col("fb") &&
          col("p_retailprice") === col("fp") &&
          col("p_size") === col("gmax"))
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        col("p_retailprice"))
      .orderBy(col("p_brand"), col("p_retailprice"), col("p_partkey"))
  }

  val all: Seq[QDef] = Seq(
    sortMultikey, topkGlobal, setUnionAll, setUnionDistinct,
    setIntersect, setExcept, setIntersectAll, setExceptAll,
    paretoFrontierParts)
}
