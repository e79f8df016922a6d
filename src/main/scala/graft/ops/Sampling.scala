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

  /** Token-budget sampling: per source, admit documents in md5 order
    * until a 2 000-token budget fills — the "mix N tokens of domain X"
    * primitive a training-data mixture build runs per domain. One
    * running-sum window per source (shuffles once on source, per-group
    * work linear), integer token counts throughout. */
  val sampleTokenBudget: QDef = q(
    "sample_token_budget",
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |c AS (
      |  SELECT source, doc_id, ntok,
      |    SUM(ntok) OVER (PARTITION BY source ORDER BY h, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM d)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_total,
      |  CAST(SUM(CASE WHEN cum <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(MAX(CASE WHEN cum <= 2000 THEN cum ELSE 0 END) AS BIGINT) AS tokens_kept,
      |  CAST(MAX(CASE WHEN cum <= 2000 THEN cum ELSE 0 END) AS DOUBLE) / 2000
      |    AS budget_util
      |FROM c GROUP BY source ORDER BY source""") { (s, d) =>
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("ntok"))
    val cum = docs.select(col("source"), col("doc_id"), col("ntok"),
      sum(col("ntok")).over(w).as("cum"))
    cum.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("cum") <= 2000, 1).otherwise(0)).cast(LongType).as("n_kept"),
        max(when(col("cum") <= 2000, col("cum")).otherwise(0L)).as("tokens_kept"),
        (max(when(col("cum") <= 2000, col("cum")).otherwise(0L))
          .cast(DoubleType) / 2000).as("budget_util"))
      .orderBy(col("source"))
  }

  /** Referential-integrity reconciliation between the order book and
    * its line items — the one-row audit an ingest pipeline publishes
    * per load: row counts both sides, childless parents, dangling
    * children (both via anti-joins — at scale these are the same
    * shuffles the FK join itself needs, so the audit is free riding
    * on the join layout). */
  val reconcileOrdersItems: QDef = q(
    "reconcile_orders_items",
    """SELECT
      |  (SELECT COUNT(*) FROM orders) AS n_orders,
      |  (SELECT COUNT(*) FROM lineitem) AS n_items,
      |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |     (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS n_childless,
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_dangling""") {
    (s, d) =>
    val o = Tables.orders(s, d).select(col("o_orderkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"))
    val nOrders = o.agg(count(lit(1)).as("n_orders"))
    val nItems = l.agg(count(lit(1)).as("n_items"))
    val childless = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_childless"))
    val dangling = l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_dangling"))
    nOrders.crossJoin(nItems).crossJoin(childless).crossJoin(dangling)
  }

  /** One-row corpus profile of `documents` (r11) — profile_orders'
    * twin for the text table: the per-ingest-batch health report a
    * corpus build monitors (volume, exact-duplicate mass, language /
    * source coverage, char inventory). Distinct-text counting goes
    * through md5 fingerprints in BOTH engines, so the shuffle carries
    * 16-byte digests, never document bodies — the form that survives
    * a 100 TB corpus (and the same digest the exact-dedup key keys
    * on). The derived ratios are exact integer micros (trunc division
    * of non-negative ints — identical in both engines). */
  val profileDocuments: QDef = q(
    "profile_documents",
    """SELECT COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_distinct_texts,
      |  (COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000 // COUNT(*) AS dup_frac_micro,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  COUNT(DISTINCT source) AS n_sources,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) * 1000000 // COUNT(*) AS BIGINT) AS avg_chars_micro,
      |  min(doc_id) AS min_doc,
      |  max(doc_id) AS max_doc
      |FROM documents""") { (s, d) =>
    Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .select(col("n_docs"), col("n_distinct_texts"),
        expr("(n_docs - n_distinct_texts) * 1000000 div n_docs").as("dup_frac_micro"),
        col("n_langs"), col("n_sources"), col("total_chars"),
        expr("total_chars * 1000000 div n_docs").as("avg_chars_micro"),
        col("min_doc"), col("max_doc"))
  }

  /** Class-balanced downsample (r11, third session) — rebalance a
    * skewed corpus to a 200-doc target with EQUAL per-language
    * quotas, the label-balancing step before fine-tune mixes. Unlike
    * `sample_stratified_docs` (fixed k per stratum), the quota here
    * is COMPUTED from the data (target div n_classes, via two tiny
    * count aggregates cross-joined — broadcast at any corpus size),
    * and membership keys off the md5(doc_id) order, so the selected
    * set is identical on any partitioning, cluster, or engine.
    * At 100 TB: the quota table is O(n_langs) rows (broadcast), the
    * window partitions by lang — one exchange over the corpus. */
  val sampleClassBalance: QDef = q(
    "sample_class_balance",
    """WITH quota AS (
      |  SELECT lang, 200 // (SELECT count(DISTINCT lang) FROM documents) AS q
      |  FROM documents GROUP BY lang),
      |ranked AS (
      |  SELECT lang, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT r.lang, r.doc_id, r.n_chars
      |FROM ranked r JOIN quota ON r.lang = quota.lang
      |WHERE r.rn <= quota.q
      |ORDER BY r.lang, r.doc_id""") { (s, d) =>
    val docs = Tables.documents(s, d)
    // class count derives from the per-class count table (O(n_langs)
    // rows), not a second corpus scan — the corpus is only read for
    // the groupBy and the window below
    val langCounts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val quota = langCounts
      .crossJoin(langCounts.agg(count(lit(1)).as("nc")))
      .select(col("lang"), expr("200 div nc").as("q"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
    docs.select(col("lang"), col("doc_id"), col("n_chars"),
        row_number().over(w).as("rn"))
      .join(broadcast(quota), Seq("lang"))
      .filter(col("rn") <= col("q"))
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Declarative data-quality rule check (r11c) — the constraint
    * gate an ingest pipeline publishes per batch: one row per rule
    * with violation and checked counts. Eight rules cover the rule
    * taxonomy — null keys, domain membership, value ranges,
    * distribution caps, and referential integrity (spelled NOT IN in
    * the oracle, executed as Spark LEFT ANTI joins — key columns are
    * non-null so the semantics coincide). Predicate rules fold into
    * ONE aggregate scan per table (count FILTER partials); only the
    * two FK rules pay joins, with the PK side broadcast while it
    * fits. Two of the rules fire on this corpus so both outcomes of
    * the gate are graded, not just the all-green path. */
  val dqRuleCheck: QDef = q(
    "dq_rule_check",
    """WITH o AS (
      |  SELECT 'orders_null_key' AS rule_id,
      |    CAST(count(*) FILTER (WHERE o_orderkey IS NULL OR o_custkey IS NULL) AS BIGINT)
      |      AS n_violations,
      |    CAST(count(*) AS BIGINT) AS n_checked
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders_nonpositive_total',
      |    CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT),
      |    CAST(count(*) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'orders_status_domain',
      |    CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) AS BIGINT),
      |    CAST(count(*) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'orders_total_gt_400k',
      |    CAST(count(*) FILTER (WHERE o_totalprice > 400000) AS BIGINT),
      |    CAST(count(*) AS BIGINT) FROM orders),
      |l AS (
      |  SELECT 'lineitem_discount_range' AS rule_id,
      |    CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
      |      AS n_violations,
      |    CAST(count(*) AS BIGINT) AS n_checked
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_discount_gt_8pct',
      |    CAST(count(*) FILTER (WHERE l_discount > 0.08) AS BIGINT),
      |    CAST(count(*) AS BIGINT) FROM lineitem),
      |fk1 AS (
      |  SELECT 'lineitem_orphan_order' AS rule_id,
      |    CAST(count(*) AS BIGINT) AS n_violations,
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_checked
      |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      |fk2 AS (
      |  SELECT 'orders_orphan_customer' AS rule_id,
      |    CAST(count(*) AS BIGINT) AS n_violations,
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_checked
      |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |SELECT * FROM o UNION ALL SELECT * FROM l
      |UNION ALL SELECT * FROM fk1 UNION ALL SELECT * FROM fk2
      |ORDER BY rule_id""") { (s, d) =>
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    def cnt(cond: org.apache.spark.sql.Column) =
      count(when(cond, lit(1))).as("n_violations")
    // predicate rules: ONE aggregate scan per table, one count FILTER
    // partial per rule
    val oRules = orders.agg(
      cnt(col("o_orderkey").isNull || col("o_custkey").isNull),
      count(lit(1)).as("n_checked"),
      count(when(col("o_totalprice") <= 0, lit(1))).as("v2"),
      count(when(!col("o_orderstatus").isin("F", "O", "P"), lit(1))).as("v3"),
      count(when(col("o_totalprice") > 400000, lit(1))).as("v4"))
    val lRules = lineitem.agg(
      cnt(col("l_discount") < 0 || col("l_discount") > 1),
      count(lit(1)).as("n_checked"),
      count(when(col("l_discount") > 0.08, lit(1))).as("v2"))
    val oneO = oRules.select(
      explode(array(
        struct(lit("orders_null_key").as("rule_id"),
          col("n_violations"), col("n_checked")),
        struct(lit("orders_nonpositive_total").as("rule_id"),
          col("v2").as("n_violations"), col("n_checked")),
        struct(lit("orders_status_domain").as("rule_id"),
          col("v3").as("n_violations"), col("n_checked")),
        struct(lit("orders_total_gt_400k").as("rule_id"),
          col("v4").as("n_violations"), col("n_checked")))).as("r"))
      .select(col("r.rule_id"), col("r.n_violations"), col("r.n_checked"))
    val oneL = lRules.select(
      explode(array(
        struct(lit("lineitem_discount_range").as("rule_id"),
          col("n_violations"), col("n_checked")),
        struct(lit("lineitem_discount_gt_8pct").as("rule_id"),
          col("v2").as("n_violations"), col("n_checked")))).as("r"))
      .select(col("r.rule_id"), col("r.n_violations"), col("r.n_checked"))
    // FK rules: LEFT ANTI joins. Only the CUSTOMER PK side is forced
    // broadcast — it is the genuinely small dimension. The orders PK
    // side is fact-adjacent (grows with the corpus), so it carries no
    // hint (ADVICE r11): AQE broadcasts it while it fits and falls
    // back to a shuffled anti join beyond that, instead of a forced
    // broadcast OOMing at scale.
    val fk1 = lineitem.join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n_checked")))
      .select(lit("lineitem_orphan_order").as("rule_id"),
        col("n_violations"), col("n_checked"))
    val fk2 = orders.join(
        broadcast(Tables.customer(s, d).select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(orders.agg(count(lit(1)).as("n_checked")))
      .select(lit("orders_orphan_customer").as("rule_id"),
        col("n_violations"), col("n_checked"))
    oneO.union(oneL).union(fk1).union(fk2).orderBy(col("rule_id"))
  }

  /** Systematic (every-k-th) sampling (r12) — the third deterministic
    * sampling design next to hash-threshold (`sample_hash_docs`) and
    * stratified-quota (`sample_stratified_docs`): within each source,
    * order by md5(doc_id) (a deterministic pseudo-random permutation)
    * and keep every 20th row. Systematic designs have lower variance
    * than Bernoulli at the same rate when the order is uncorrelated
    * with the measure — which the md5 order guarantees by
    * construction. One window per source stratum; membership is a
    * pure rank predicate, identical on any partitioning or engine. */
  val sampleSystematic: QDef = q(
    "sample_systematic",
    """SELECT source, doc_id, rn
      |FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE (rn - 1) % 20 = 0
      |ORDER BY source, doc_id""") { (s, d) =>
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), row_number().over(w).as("rn"))
      .filter((col("rn") - 1) % 20 === 0)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Weighted PPS sample (r12) — probability-proportional-to-size
    * selection of n=5 docs per source, weight = n_chars: the sampling
    * primitive behind "sample training docs proportional to token
    * count" (long docs must be over-picked or the token distribution
    * of the sample skews short). Systematic PPS over the deterministic
    * md5 order: a doc is selected iff the running-weight interval
    * (cum_before, cum] contains a selection point k·W/n, with
    * multiplicity = how many points it straddles (a doc heavier than
    * W/n is legitimately picked more than once). Everything is BIGINT
    * interval arithmetic — `(cum·n) div W` floors identically in both
    * engines, no float thresholds, so membership is partition- and
    * engine-independent. Scale: one per-source window cumsum (keys =
    * source cardinality), a pure filter after — no global pass, no
    * collect; the same code PPS-samples a 100 TB corpus stratum by
    * stratum. */
  val sampleWeightedPps: QDef = q(
    "sample_weighted_pps",
    """WITH d AS (
      |  SELECT source, doc_id, n_chars,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |c AS (
      |  SELECT source, doc_id, n_chars,
      |    SUM(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(n_chars) OVER (PARTITION BY source) AS w
      |  FROM d)
      |SELECT source, doc_id, n_chars,
      |  CAST((cum * 5) // w - ((cum - n_chars) * 5) // w AS BIGINT)
      |    AS multiplicity
      |FROM c
      |WHERE (cum * 5) // w > ((cum - n_chars) * 5) // w
      |ORDER BY source, doc_id""") { (s, d) =>
    val ord = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("source"))
    val c = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(ord))
      .withColumn("w", sum(col("n_chars")).over(tot))
    c.filter(expr("(cum * 5) div w > ((cum - n_chars) * 5) div w"))
      .select(col("source"), col("doc_id"), col("n_chars"),
        expr("(cum * 5) div w - ((cum - n_chars) * 5) div w")
          .as("multiplicity"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Token-balanced shard assignment (r12) — the write-planning step
    * before materializing a training corpus: pack docs (in the
    * deterministic md5 order) into ~10 000-char shards per language,
    * and publish the shard manifest (doc count, char total, key
    * range) that the downstream loader reads. shard_id is pure
    * integer arithmetic on the running total BEFORE the doc
    * (`cum_before div target`), so assignment is reproducible on any
    * engine and any partitioning — the property that lets a 1000-
    * executor writer produce byte-identical shards to a laptop run.
    * Scale: one per-lang window cumsum + one hash agg; at 100 TB the
    * same manifest computes per language partition with no global
    * coordination, and the manifest itself (shards × stats) is tiny. */
  val shardTokenBalanced: QDef = q(
    "shard_token_balanced",
    """WITH c AS (
      |  SELECT lang, doc_id, n_chars,
      |    SUM(n_chars) OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_chars AS cum_before
      |  FROM documents)
      |SELECT lang, CAST(cum_before // 10000 AS BIGINT) AS shard_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM c GROUP BY lang, shard_id
      |ORDER BY lang, shard_id""") { (s, d) =>
    val ord = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("cum_before", sum(col("n_chars")).over(ord) - col("n_chars"))
      .withColumn("shard_id", expr("cum_before div 10000L"))
      .groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"), col("shard_id"))
  }

  /** Join-key skew profile (r12c) — the report an operator reads
    * BEFORE launching a 100 TB fact-fact join: the top-10 heaviest
    * keys with their absolute counts, corpus share (ppm) and
    * multiple-of-average (ppm), i.e. exactly the keys a salting
    * scheme or AQE skew-split would target. Cost at any scale: one
    * key-cardinality hash agg (map-side partials), a one-row global
    * roll-up cross-broadcast back, and a top-10
    * TakeOrderedAndProject — the fact table itself shuffles only
    * key digests, never rows. Integer ppm arithmetic (both operands
    * non-negative, so DuckDB `//` floor ≡ Spark `div` truncation). */
  val profileKeySkew: QDef = q(
    "profile_key_skew",
    """WITH k AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM orders GROUP BY o_custkey),
      |t AS (
      |  SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
      |    CAST(COUNT(*) AS BIGINT) AS nd_keys FROM k)
      |SELECT o_custkey, n_rows,
      |  CAST(n_rows * 1000000 // total AS BIGINT) AS share_ppm,
      |  CAST(n_rows * nd_keys * 1000000 // total AS BIGINT) AS vs_avg_ppm
      |FROM k, t
      |ORDER BY n_rows DESC, o_custkey LIMIT 10""") { (s, d) =>
    val k = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_rows"))
    val t = k.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("nd_keys"))
    k.crossJoin(broadcast(t))
      .select(col("o_custkey"), col("n_rows"),
        expr("n_rows * 1000000L div total").as("share_ppm"),
        expr("n_rows * nd_keys * 1000000L div total").as("vs_avg_ppm"))
      .orderBy(col("n_rows").desc, col("o_custkey")).limit(10)
  }

  /** Freshness / SLA audit per stream (r12c) — the staleness report
    * an ingest monitor publishes each run: per event type its last
    * event time, the lag behind the globally freshest event, and the
    * volume inside the trailing 24 h window. The global max is a
    * one-row broadcast folded into the fact scan BEFORE the per-type
    * agg, so the whole audit is one pass + a one-row pre-agg — at
    * 100 TB the second "scan" for the max reads only the ts column
    * (and on sorted/partitioned layouts, only footer stats). Lag in
    * whole seconds via second-boundary diffs (identical to
    * floor-epoch subtraction in both engines); last_ts
    * second-truncated per the D4 timestamp rule. */
  val dqFreshnessSla: QDef = q(
    "dq_freshness_sla",
    """WITH mx AS (SELECT max(ts) AS gm FROM events),
      |e AS (SELECT event_type, ts, gm FROM events, mx)
      |SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(date_trunc('second', max(ts)) AS TIMESTAMP) AS last_ts,
      |  CAST(date_diff('second', max(ts), gm) AS BIGINT) AS lag_seconds,
      |  CAST(SUM(CASE WHEN ts >= gm - INTERVAL 24 HOUR
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_last_24h
      |FROM e GROUP BY event_type, gm ORDER BY event_type""") { (s, d) =>
    val mx = Tables.events(s, d).agg(max(col("ts")).as("gm"))
    Tables.events(s, d).select(col("event_type"), col("ts"))
      .crossJoin(broadcast(mx))
      // gm is single-valued; grouping on it too (like the oracle)
      // avoids an order-dependent first() in the aggregate list
      .groupBy(col("event_type"), col("gm"))
      .agg(count(lit(1)).as("n_rows"),
        date_trunc("second", max(col("ts"))).cast(TimestampType)
          .as("last_ts"),
        (unix_timestamp(max(col("gm"))) - unix_timestamp(max(col("ts"))))
          .as("lag_seconds"),
        sum(when(col("ts") >= col("gm") - expr("INTERVAL 24 HOURS"), 1)
          .otherwise(0)).cast(LongType).as("n_last_24h"))
      .select(col("event_type"), col("n_rows"), col("last_ts"),
        col("lag_seconds"), col("n_last_24h"))
      .orderBy(col("event_type"))
  }

  /** Deterministic Poisson(1) bootstrap (r12c) — three bootstrap
    * replicates of the corpus for metric confidence intervals, the
    * resampling a data-quality dashboard runs WITHOUT an RNG stream:
    * each (doc, replicate) draws its multiplicity from md5(doc:rep)
    * through the inverse Poisson(1) CDF quantized to 16 bits
    * (thresholds 24109/48218/60275/64291 = cumulative e⁻¹ series
    * ×65536) — identical draws on any engine, any partition count,
    * any cluster. The replicate axis explodes ROW-LOCALLY (×3, no
    * pre-shuffle), and only per-replicate aggregates ship — the
    * bootstrap never materializes a resampled corpus, which is what
    * makes it runnable at 100 TB. */
  val samplePoissonBootstrap: QDef = q(
    "sample_poisson_bootstrap",
    """WITH d AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |x AS (SELECT doc_id, ntok, unnest([0, 1, 2]) AS rep FROM d),
      |u AS (
      |  SELECT rep, ntok,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
      |      || CAST(rep AS VARCHAR)), 1, 4))::INT AS h
      |  FROM x),
      |k AS (
      |  SELECT rep, ntok,
      |    CASE WHEN h < 24109 THEN 0 WHEN h < 48218 THEN 1
      |         WHEN h < 60275 THEN 2 WHEN h < 64291 THEN 3
      |         ELSE 4 END AS m
      |  FROM u)
      |SELECT CAST(rep AS BIGINT) AS replicate,
      |  CAST(SUM(CASE WHEN m >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |  CAST(SUM(m) AS BIGINT) AS total_mult,
      |  CAST(SUM(m * ntok) AS BIGINT) AS token_mass
      |FROM k GROUP BY rep ORDER BY replicate""") { (s, d) =>
    val x = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("ntok"))
      .select(col("doc_id"), col("ntok"),
        explode(array(lit(0), lit(1), lit(2))).as("rep"))
    val h = conv(substring(md5(concat(col("doc_id").cast(StringType),
      lit(":"), col("rep").cast(StringType))), 1, 4), 16, 10)
      .cast(IntegerType)
    val k = x.select(col("rep"), col("ntok"),
      when(h < 24109, 0).when(h < 48218, 1).when(h < 60275, 2)
        .when(h < 64291, 3).otherwise(4).as("m"))
    k.groupBy(col("rep").cast(LongType).as("replicate"))
      .agg(sum(when(col("m") >= 1, 1).otherwise(0)).cast(LongType)
        .as("n_docs"),
        sum(col("m")).cast(LongType).as("total_mult"),
        sum(col("m") * col("ntok")).cast(LongType).as("token_mass"))
      .orderBy(col("replicate"))
  }

  /** Leak-free train/valid/test split BY USER (r12c) — the
    * entity-level split an events model needs: splitting event ROWS
    * (split_train_holdout's doc-level shape) would leak a user's
    * behavior across sets, so the md5 membership decision hashes the
    * USER key (test = bucket 0, valid = bucket 1, train = the rest)
    * and every event follows its user. Disjointness is structural —
    * a user hashes to exactly one bucket on any engine and any
    * partitioning (the spec pins empty pairwise user intersections).
    * One row-local projection + one split-keyed agg. */
  val splitByUserLeakfree: QDef = q(
    "split_by_user_leakfree",
    """WITH e AS (
      |  SELECT CASE ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::INT
      |           % 10
      |    WHEN 0 THEN 'test' WHEN 1 THEN 'valid' ELSE 'train' END AS split,
      |    user_id, event_type,
      |    CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents
      |  FROM events)
      |SELECT split,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchases,
      |  CAST(SUM(cents) AS BIGINT) AS total_cents
      |FROM e GROUP BY split
      |ORDER BY split""") { (s, d) =>
    Tables.events(s, d)
      .select(
        when(conv(substring(md5(col("user_id").cast(StringType)), 1, 4), 16, 10)
            .cast(IntegerType) % 10 === 0, "test")
          .when(conv(substring(md5(col("user_id").cast(StringType)), 1, 4), 16, 10)
            .cast(IntegerType) % 10 === 1, "valid")
          .otherwise("train").as("split"),
        col("user_id"), col("event_type"),
        (qty(col("value")) * 100).cast(LongType).as("cents"))
      .groupBy(col("split"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(col("cents")).cast(LongType).as("total_cents"))
      .orderBy(col("split"))
  }

  /** Cross-table date-consistency audit (r12c) — the referential DQ
    * rule `dq_rule_check`'s single-table FILTERs can't see: a line
    * must not ship before its order is placed. The fixture genuinely
    * violates this (~49% of lines — synthetic dates are independent),
    * so the audit measures a real defect rate per order year rather
    * than vacuously passing. One fact⋈fact equi join on the order
    * key (the q3 shuffle shape) + a year-level agg; day deltas are
    * exact integer datediffs. */
  val dqOrderLineitemDates: QDef = q(
    "dq_order_lineitem_dates",
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_violations,
      |  CAST(MIN(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
      |    AS worst_days_early,
      |  CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
      |    * 1000000 // COUNT(*) AS BIGINT) AS violation_ppm
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""") { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("yr"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
          .as("n_violations"),
        min(datediff(col("l_shipdate"), col("o_orderdate"))).cast(LongType)
          .as("worst_days_early"))
      .select(col("yr"), col("n_lines"), col("n_violations"),
        col("worst_days_early"),
        expr("CAST(n_violations * 1000000 div n_lines AS BIGINT)")
          .as("violation_ppm"))
      .orderBy(col("yr"))
  }

  /** Benford expected first-digit shares, floor-half-up ppm of
    * log10(1+1/d) — hardcoded as integer literals in BOTH engines'
    * query text so no libm log appears anywhere (they sum to exactly
    * 1,000,000). Benford 1938 / Newcomb 1881. */
  private val benfordPpm = Seq(1 -> 301030, 2 -> 176091, 3 -> 124939,
    4 -> 96910, 5 -> 79181, 6 -> 66947, 7 -> 57992, 8 -> 51153, 9 -> 45757)

  /** Benford first-digit audit (r12e) — the fraud/fabrication screen
    * auditors run on financial columns: the first significant digit of
    * naturally-occurring amounts should follow log10(1+1/d), and a
    * synthesized or truncated column shows up as a flat or spiked
    * digit histogram. Graded against o_totalprice: per digit 1-9, the
    * observed order count, its round-half-up ppm share, the Benford
    * expectation, and the signed delta — a fixture like this one
    * (uniform-ish totals) FAILS the screen loudly, which is the point:
    * the audit measures deviation, it doesn't assume conformance. All
    * 9 digits are scaffolded via a literal grid LEFT JOIN (empty-
    * cohort discipline). Scale: the digit is a row-local string head
    * of the integer cents; one 9-group agg with map-side partials —
    * nothing scales with the table. */
  val dqBenfordDigits: QDef = q(
    "dq_benford_digits",
    s"""WITH obs AS (
      |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |grid AS (SELECT * FROM (VALUES
      |    ${benfordPpm.map { case (dg, p) => s"($dg, $p)" }.mkString(", ")})
      |  g(digit, exp_ppm)),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM obs),
      |j AS (
      |  SELECT g.digit, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
      |    CAST(floor(CAST(COALESCE(o.n, 0) AS DOUBLE) * 1000000
      |      / CAST(nt AS DOUBLE) + 0.5) AS BIGINT) AS obs_ppm,
      |    CAST(g.exp_ppm AS BIGINT) AS exp_ppm
      |  FROM grid g LEFT JOIN obs o ON o.digit = g.digit CROSS JOIN tot)
      |SELECT digit, n_orders, obs_ppm, exp_ppm,
      |  obs_ppm - exp_ppm AS delta_ppm
      |FROM j ORDER BY digit""") { (s, d) =>
    // persisted: the ≤9-row digit histogram feeds both the join and
    // the total — without it the fact table would be scanned twice
    val obs = Tables.orders(s, d)
      .select(substring((money(col("o_totalprice")) * 100).cast(LongType)
        .cast(StringType), 1, 1).cast(IntegerType).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = obs.agg(sum(col("n")).as("nt"))
    val grid = s.range(1).select(explode(expr(
      "array(" + benfordPpm.map { case (dg, p) =>
        s"named_struct('digit', $dg, 'exp_ppm', CAST($p AS BIGINT))"
      }.mkString(", ") + ")")).as("g"))
      .select(col("g.digit"), col("g.exp_ppm"))
    grid.join(broadcast(obs.withColumnRenamed("digit", "odigit")),
        col("odigit") === col("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n_orders"),
        floor(coalesce(col("n"), lit(0L)).cast(DoubleType) * 1000000
          / col("nt").cast(DoubleType) + 0.5).cast(LongType).as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("delta_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy(col("digit"))
  }

  /** Line-number sequence-contiguity audit (r12g) — the DQ check a
    * CDC or re-ingest pipeline runs on a positional child key: within
    * each order, l_linenumber must be exactly 1..n (no duplicates, no
    * gaps, 1-based start) or a partial write/replay happened. Graded
    * as a per-fanout breakdown (one row per lines-per-order count):
    * orders total, fully contiguous, with duplicate positions
    * (distinct < count), with gaps (range wider than distinct), and
    * with a shifted start (min ≠ 1) — four independent violation
    * axes, so the report localizes WHICH failure mode entered. This
    * fixture's line numbers are deliberately dirty (duplicates, gaps
    * and shifted starts all occur), so the audit grades non-trivial
    * counts on every axis. Scale posture: one per-order agg on the natural
    * join key (count-distinct over a ≤7-value positional domain —
    * bounded partials), then a ≤7-group rollup; shuffles carry
    * per-order stat rows only. */
  val dqSequenceContiguity: QDef = q(
    "dq_sequence_contiguity",
    """WITH o AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(MIN(l_linenumber) AS BIGINT) AS mn,
      |    CAST(MAX(l_linenumber) AS BIGINT) AS mx,
      |    CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS dn
      |  FROM lineitem GROUP BY 1)
      |SELECT n AS n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN mn = 1 AND mx = n AND dn = n THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_contiguous,
      |  CAST(SUM(CASE WHEN dn < n THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_with_duplicates,
      |  CAST(SUM(CASE WHEN mx - mn + 1 > dn THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_with_gaps,
      |  CAST(SUM(CASE WHEN mn <> 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bad_start
      |FROM o GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val o = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"),
        min(col("l_linenumber")).cast(LongType).as("mn"),
        max(col("l_linenumber")).cast(LongType).as("mx"),
        countDistinct(col("l_linenumber")).as("dn"))
    o.groupBy(col("n").as("n_lines"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("mn") === 1 && col("mx") === col("n")
          && col("dn") === col("n"), 1L).otherwise(0L)).as("n_contiguous"),
        sum(when(col("dn") < col("n"), 1L).otherwise(0L))
          .as("n_with_duplicates"),
        sum(when(col("mx") - col("mn") + 1 > col("dn"), 1L).otherwise(0L))
          .as("n_with_gaps"),
        sum(when(col("mn") =!= 1, 1L).otherwise(0L)).as("n_bad_start"))
      .orderBy(col("n_lines"))
  }

  /** Neyman optimal stratified allocation (r12i) — how many samples
    * each customer segment gets from a fixed budget of 1000 when the
    * allocation is proportional to N_h·S_h (stratum size × stratum
    * spread, Neyman 1934) instead of size alone: the high-variance
    * stratum earns more budget per row. Totals quantize to
    * KILODOLLARS (r13 range-safe rescale: in cents the variance
    * determinant n·sxx − sx² reached ~1.9e23 at sf0.1 — far beyond
    * 2^53, where DuckDB 1.0.0's int128→DOUBLE cast can misround;
    * in kilodollars it stays ~6.6e13, inside the exact-conversion
    * range the DecimalCastBoundsSpec gate enforces). Determinism
    * ladder: the population variance fold is exact (DECIMAL(38,0)
    * moments, the agg_corr_explicit pattern); S_h takes ONE
    * IEEE-exact sqrt and is immediately HALF-UP quantized to integer
    * milli-kilodollars (identical spelling both engines); every step after is pure BIGINT — the
    * final seats come from LARGEST-REMAINDER apportionment (floor
    * share + the (budget − Σfloor) biggest remainders, ties by
    * segment name), with remainder ranks from a strictly-greater
    * broadcast self-join over the 5-row stratum table — never an
    * unpartitioned window. Scale posture: one fact agg keyed by the
    * broadcast-joined segment; everything downstream is 5 rows. */
  val sampleNeymanAllocation: QDef = q(
    "sample_neyman_allocation",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000 AS x
      |  FROM orders JOIN customer ON c_custkey = o_custkey),
      |st AS (
      |  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_h,
      |    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
      |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
      |  FROM o GROUP BY 1),
      |w AS (
      |  SELECT seg, n_h,
      |    CAST(floor(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE))
      |      / CAST(n_h AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS s_milli
      |  FROM st),
      |ww AS (SELECT seg, n_h, s_milli, n_h * s_milli AS wt FROM w),
      |tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS wtot,
      |  CAST(SUM((1000 * wt) // (SELECT SUM(wt) FROM ww)) AS BIGINT)
      |    AS base_sum
      |  FROM ww),
      |b AS (
      |  SELECT seg, n_h, s_milli, wt,
      |    CAST((1000 * wt) // wtot AS BIGINT) AS base,
      |    CAST((1000 * wt) % wtot AS BIGINT) AS rem,
      |    CAST(1000 - base_sum AS BIGINT) AS extra
      |  FROM ww CROSS JOIN tot),
      |r AS (
      |  SELECT a.seg, CAST(COUNT(*) AS BIGINT) AS rnk
      |  FROM b a JOIN b c ON c.rem > a.rem
      |    OR (c.rem = a.rem AND c.seg <= a.seg)
      |  GROUP BY 1)
      |SELECT b.seg AS segment, b.n_h AS n_stratum, b.s_milli, b.wt AS weight,
      |  CAST(b.base + CASE WHEN r.rnk <= b.extra THEN 1 ELSE 0 END AS BIGINT)
      |    AS n_alloc
      |FROM b JOIN r ON r.seg = b.seg
      |ORDER BY segment""") { (s, d) =>
    val o = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment").as("seg"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint) div 100000")
          .as("x"))
    val decX = col("x").cast(DecimalType(38, 0))
    val st = o.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_h"), sum(decX).as("sx"),
        sum(decX * col("x")).as("sxx"))
    val w = st.select(col("seg"), col("n_h"),
      floor(sqrt(expr("CAST(n_h * sxx - sx * sx AS DOUBLE)"))
        / col("n_h").cast(DoubleType) * 1000 + 0.5).cast(LongType)
        .as("s_milli"))
    val ww = w.withColumn("wt", col("n_h") * col("s_milli"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wtot = ww.agg(sum(col("wt")).as("wtot"))
    val withTot = ww.crossJoin(broadcast(wtot))
      .select(col("seg"), col("n_h"), col("s_milli"), col("wt"),
        expr("CAST((1000 * wt) div wtot AS BIGINT)").as("base"),
        expr("CAST((1000 * wt) % wtot AS BIGINT)").as("rem"))
    val baseSum = withTot.agg(sum(col("base")).as("base_sum"))
    val b = withTot.crossJoin(broadcast(baseSum))
      .withColumn("extra", lit(1000L) - col("base_sum"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = b.select(col("seg"), col("rem")).as("a")
      .join(broadcast(b.select(col("seg").as("cseg"), col("rem").as("crem"))),
        col("crem") > col("rem")
          || (col("crem") === col("rem") && col("cseg") <= col("a.seg")))
      .groupBy(col("a.seg").as("rseg"))
      .agg(count(lit(1)).as("rnk"))
    b.join(broadcast(r), col("rseg") === col("seg"))
      .select(col("seg").as("segment"), col("n_h").as("n_stratum"),
        col("s_milli"), col("wt").as("weight"),
        (col("base") + when(col("rnk") <= col("extra"), 1L).otherwise(0L))
          .as("n_alloc"))
      .orderBy(col("segment"))
  }

  /** Deterministic k-fold assignment (r12o) — the cross-validation
    * primitive `split_train_holdout` (one fixed 80/10/10 cut) does
    * not give: every document lands in exactly one of 5 folds by the
    * same md5-prefix hash the split family uses (membership is a
    * pure function of doc_id — partitioning- and engine-independent),
    * and the graded output is the per-(fold, lang) census with each
    * fold's total and the language's floor-ppm share WITHIN its fold
    * — the balance table a stratification audit reads before trusting
    * CV variance. Scale posture: one (fold, lang) agg with map-side
    * partials, the 5-row fold-total table broadcast back. */
  val sampleKfoldAssign: QDef = q(
    "sample_kfold_assign",
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 5
      |      AS fold
      |  FROM documents),
      |g AS (
      |  SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM b GROUP BY 1, 2),
      |t AS (SELECT fold, CAST(SUM(n_docs) AS BIGINT) AS fold_total
      |  FROM g GROUP BY 1)
      |SELECT g.fold, g.lang, g.n_docs, t.fold_total,
      |  CAST(g.n_docs * 1000000 // t.fold_total AS BIGINT) AS share_ppm
      |FROM g JOIN t ON t.fold = g.fold
      |ORDER BY g.fold, g.lang""") { (s, d) =>
    val g = Tables.documents(s, d)
      .select(col("lang"),
        (conv(substring(md5(col("doc_id").cast(StringType)), 1, 4), 16, 10)
          .cast(IntegerType) % 5).as("fold"))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = g.groupBy(col("fold").as("tf"))
      .agg(sum(col("n_docs")).as("fold_total"))
    g.join(broadcast(t), col("tf") === col("fold"))
      .select(col("fold"), col("lang"), col("n_docs"), col("fold_total"),
        expr("CAST(n_docs * 1000000 div fold_total AS BIGINT)")
          .as("share_ppm"))
      .orderBy(col("fold"), col("lang"))
  }

  /** Primary-key uniqueness audit across the whole catalog (r12t) —
    * the first constraint a warehouse checks per load: one row per
    * table with its declared key, row count, distinct-key count and
    * duplicate-key row surplus. Keys are the natural ones; lineitem's
    * is the COMPOSITE (orderkey, linenumber) — and this fixture's
    * line numbers are deliberately dirty (see dq_sequence_contiguity),
    * so the audit reports a real violation there while the seven
    * other tables come back clean: the check measures, it doesn't
    * assume. Scale posture: one count-distinct agg per table (each a
    * single exchange of key partials), 8-row union output. */
  val dqPkUniqueness: QDef = q(
    "dq_pk_uniqueness",
    """SELECT 'customer' AS table_name, 'c_custkey' AS pk,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
      |  CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS n_dupe_rows
      |FROM customer
      |UNION ALL SELECT 'documents', 'doc_id', COUNT(*),
      |  COUNT(DISTINCT doc_id), COUNT(*) - COUNT(DISTINCT doc_id)
      |FROM documents
      |UNION ALL SELECT 'embeddings', 'vec_id', COUNT(*),
      |  COUNT(DISTINCT vec_id), COUNT(*) - COUNT(DISTINCT vec_id)
      |FROM embeddings
      |UNION ALL SELECT 'events', 'event_id', COUNT(*),
      |  COUNT(DISTINCT event_id), COUNT(*) - COUNT(DISTINCT event_id)
      |FROM events
      |UNION ALL SELECT 'lineitem', 'l_orderkey+l_linenumber', COUNT(*),
      |  COUNT(DISTINCT (l_orderkey, l_linenumber)),
      |  COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
      |FROM lineitem
      |UNION ALL SELECT 'orders', 'o_orderkey', COUNT(*),
      |  COUNT(DISTINCT o_orderkey), COUNT(*) - COUNT(DISTINCT o_orderkey)
      |FROM orders
      |UNION ALL SELECT 'part', 'p_partkey', COUNT(*),
      |  COUNT(DISTINCT p_partkey), COUNT(*) - COUNT(DISTINCT p_partkey)
      |FROM part
      |UNION ALL SELECT 'supplier', 's_suppkey', COUNT(*),
      |  COUNT(DISTINCT s_suppkey), COUNT(*) - COUNT(DISTINCT s_suppkey)
      |FROM supplier
      |ORDER BY table_name""") { (s, d) =>
    def audit(name: String, pk: String, df: org.apache.spark.sql.DataFrame,
        keys: Seq[String]) =
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(keys.head), keys.tail.map(col): _*)
            .as("n_distinct"))
        .select(lit(name).as("table_name"), lit(pk).as("pk"),
          col("n_rows"), col("n_distinct"),
          (col("n_rows") - col("n_distinct")).as("n_dupe_rows"))
    Seq(
      audit("customer", "c_custkey", Tables.customer(s, d), Seq("c_custkey")),
      audit("documents", "doc_id", Tables.documents(s, d), Seq("doc_id")),
      audit("embeddings", "vec_id", Tables.embeddings(s, d), Seq("vec_id")),
      audit("events", "event_id", Tables.events(s, d), Seq("event_id")),
      audit("lineitem", "l_orderkey+l_linenumber", Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber")),
      audit("orders", "o_orderkey", Tables.orders(s, d), Seq("o_orderkey")),
      audit("part", "p_partkey", Tables.part(s, d), Seq("p_partkey")),
      audit("supplier", "s_suppkey", Tables.supplier(s, d), Seq("s_suppkey")))
      .reduce(_ unionAll _)
      .orderBy(col("table_name"))
  }

  val all: Seq[QDef] = Seq(sampleHashDocs, sampleStratifiedDocs, profileOrders,
    sampleTokenBudget, reconcileOrdersItems, profileDocuments,
    sampleClassBalance, dqRuleCheck, sampleSystematic,
    sampleWeightedPps, shardTokenBalanced, profileKeySkew,
    dqFreshnessSla, samplePoissonBootstrap, splitByUserLeakfree,
    dqOrderLineitemDates, dqBenfordDigits, dqSequenceContiguity,
    sampleNeymanAllocation, sampleKfoldAssign, dqPkUniqueness)
}
