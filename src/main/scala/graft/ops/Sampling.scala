package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import graft.Protocol._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reproducible sampling + data profiling — the pipeline utilities a
  * training-data build needs to be REPEATABLE: `df.sample()` depends
  * on partitioning and RNG stream, so both samplers here key off
  * md5(id) instead — the same rows are selected on any cluster, any
  * partition count, any engine (verified: DuckDB picks the identical
  * sample). */
object Sampling {

  /** ~10% deterministic sample: keep rows whose md5(doc_id) bucket is
    * 0 of 10. Scales embarrassingly (pure filter over the scan). */
  val sampleHashDocs: QDef = q(
    "sample_hash_docs",
    """SELECT doc_id, lang, n_chars
      |FROM documents
      |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10 = 0
      |ORDER BY doc_id""") { (s, d) =>
    Tables.documents(s, d)
      .filter(conv(substring(md5(col("doc_id").cast(StringType)), 1, 4), 16, 10)
        .cast(IntegerType) % 10 === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Stratified sample: exactly k=20 docs per language, chosen by the
    * md5(doc_id) order — per-stratum quotas without a global shuffle
    * of the data (one window per stratum). */
  val sampleStratifiedDocs: QDef = q(
    "sample_stratified_docs",
    """SELECT lang, doc_id
      |FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20
      |ORDER BY lang, doc_id""") { (s, d) =>
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** One-row column profile of `orders` — the data-quality report a
    * harmonization pipeline emits per ingest (nulls, cardinalities,
    * ranges, exact decimal totals). */
  val profileOrders: QDef = q(
    "profile_orders",
    """SELECT COUNT(*) AS n_rows,
      |  COUNT(DISTINCT o_custkey) AS nd_cust,
      |  COUNT(DISTINCT o_orderstatus) AS nd_status,
      |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_priority,
      |  CAST(min(o_orderdate) AS DATE) AS min_date,
      |  CAST(max(o_orderdate) AS DATE) AS max_date,
      |  CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_total,
      |  CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_total,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
      |FROM orders""") { (s, d) =>
    Tables.orders(s, d)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("nd_cust"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        sum(when(col("o_orderpriority").isNull, 1).otherwise(0)).cast(LongType)
          .as("n_null_priority"),
        min(col("o_orderdate")).cast(DateType).as("min_date"),
        max(col("o_orderdate")).cast(DateType).as("max_date"),
        outDouble(min(money(col("o_totalprice")))).as("min_total"),
        outDouble(max(money(col("o_totalprice")))).as("max_total"),
        outDouble(sum(money(col("o_totalprice")))).as("sum_total"))
  }

  val all: Seq[QDef] = Seq(sampleHashDocs, sampleStratifiedDocs, profileOrders)
}
