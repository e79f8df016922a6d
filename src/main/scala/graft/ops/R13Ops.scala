package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 additions: catalog-integrity, corpus-vocabulary,
  * multimodal-budgeting and event-session operators, all under the
  * house determinism protocol (exact integers end to end; floor
  * division spelled identically in both engines; presentation-only
  * ORDER BY). */
object R13Ops {

  /** Referential-integrity orphan census (r13) — the FK audit a lake
    * runs before trusting any join: for each declared child→parent
    * relationship, how many child rows reference a missing parent.
    * One LEFT join + conditional count per relationship (parent keys
    * are unique, so the join never multiplies; NULL FKs are counted
    * in n_child but are not orphans — the SQL NOT EXISTS semantics).
    * The deliberately-included events.user_id→customer row documents
    * the fixture's real cross-domain gap instead of hiding it. Scale:
    * the three lineitem relationships share ONE scan of the biggest
    * fact (three broadcast key-set probes in a single pass — at
    * 100 TB that is a 3× I/O cut over naive per-check scans, and each
    * probe degrades independently to SMJ if its key set outgrows
    * broadcast range); the remaining checks are one fact-side scan
    * each. */
  val dqReferentialOrphans: QDef = q(
    "dq_referential_orphans",
    """WITH rel AS (
      |  SELECT 'customer.c_nationkey->nation' AS relationship,
      |    (SELECT CAST(COUNT(c_nationkey) AS BIGINT) FROM customer) AS n_child,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
      |      WHERE c_nationkey IS NOT NULL
      |        AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
      |      AS n_orphans
      |  UNION ALL
      |  SELECT 'events.user_id->customer',
      |    (SELECT CAST(COUNT(user_id) AS BIGINT) FROM events),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM events e
      |      WHERE user_id IS NOT NULL
      |        AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey->orders',
      |    (SELECT CAST(COUNT(l_orderkey) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
      |      WHERE l_orderkey IS NOT NULL
      |        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey->part',
      |    (SELECT CAST(COUNT(l_partkey) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
      |      WHERE l_partkey IS NOT NULL
      |        AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      |  UNION ALL
      |  SELECT 'lineitem.l_suppkey->supplier',
      |    (SELECT CAST(COUNT(l_suppkey) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
      |      WHERE l_suppkey IS NOT NULL
      |        AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
      |  UNION ALL
      |  SELECT 'nation.n_regionkey->region',
      |    (SELECT CAST(COUNT(n_regionkey) AS BIGINT) FROM nation),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n
      |      WHERE n_regionkey IS NOT NULL
      |        AND NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
      |  UNION ALL
      |  SELECT 'orders.o_custkey->customer',
      |    (SELECT CAST(COUNT(o_custkey) AS BIGINT) FROM orders),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
      |      WHERE o_custkey IS NOT NULL
      |        AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL
      |  SELECT 'supplier.s_nationkey->nation',
      |    (SELECT CAST(COUNT(s_nationkey) AS BIGINT) FROM supplier),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier s
      |      WHERE s_nationkey IS NOT NULL
      |        AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)))
      |SELECT relationship, n_child, n_orphans,
      |  (n_orphans * 1000000) // n_child AS orphan_ppm
      |FROM rel ORDER BY relationship""") { (s, d) =>
    def check(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame =
      child.select(col(ck))
        .join(parent.select(col(pk).as("__pk")).distinct(),
          col(ck) === col("__pk"), "left")
        .agg(count(col(ck)).as("n_child"),
          count_if(col(ck).isNotNull && col("__pk").isNull).as("n_orphans"))
        .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"))
    // The three lineitem FKs probe in ONE scan: each parent key set
    // joins as an independently-broadcast single-column distinct
    // (orders keys ≈ 8 bytes × |orders| — MBs at fixture scale), and
    // the three orphan counts come out of one agg, unpivoted to the
    // same three rows the per-check spelling would produce.
    val liProbe = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey").as("__ok")).distinct(),
        col("l_orderkey") === col("__ok"), "left")
      .join(broadcast(Tables.part(s, d).select(col("p_partkey").as("__pk")).distinct()),
        col("l_partkey") === col("__pk"), "left")
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey").as("__sk")).distinct()),
        col("l_suppkey") === col("__sk"), "left")
      .agg(
        count(col("l_orderkey")).as("n_ok"),
        count_if(col("l_orderkey").isNotNull && col("__ok").isNull).as("o_ok"),
        count(col("l_partkey")).as("n_pk"),
        count_if(col("l_partkey").isNotNull && col("__pk").isNull).as("o_pk"),
        count(col("l_suppkey")).as("n_sk"),
        count_if(col("l_suppkey").isNotNull && col("__sk").isNull).as("o_sk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def liRow(name: String, n: String, o: String): DataFrame =
      liProbe.select(lit(name).as("relationship"),
        col(n).as("n_child"), col(o).as("n_orphans"))
    val checks = Seq(
      check("customer.c_nationkey->nation",
        Tables.customer(s, d), "c_nationkey", Tables.nation(s, d), "n_nationkey"),
      check("events.user_id->customer",
        Tables.events(s, d), "user_id", Tables.customer(s, d), "c_custkey"),
      liRow("lineitem.l_orderkey->orders", "n_ok", "o_ok"),
      liRow("lineitem.l_partkey->part", "n_pk", "o_pk"),
      liRow("lineitem.l_suppkey->supplier", "n_sk", "o_sk"),
      check("nation.n_regionkey->region",
        Tables.nation(s, d), "n_regionkey", Tables.region(s, d), "r_regionkey"),
      check("orders.o_custkey->customer",
        Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"),
      check("supplier.s_nationkey->nation",
        Tables.supplier(s, d), "s_nationkey", Tables.nation(s, d), "n_nationkey"))
    checks.reduce(_.unionAll(_))
      .select(col("relationship"), col("n_child"), col("n_orphans"),
        expr("(n_orphans * 1000000) div n_child").as("orphan_ppm"))
      .orderBy(col("relationship"))
  }

  /** Hapax-legomena profile per source (r13) — the vocabulary-tail
    * statistic corpus linguists read next to Zipf: how much of each
    * source's vocabulary occurs exactly once (hapax) or twice (dis).
    * A high hapax share flags OCR noise / boilerplate IDs; a low one
    * flags template text. One (source, term) wordcount — the shuffle
    * is vocabulary-sized with map-side combine, never the occurrence
    * stream — then a source-level fold. */
  val textHapaxRatio: QDef = q(
    "text_hapax_ratio",
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (
      |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM toks WHERE tok <> '' GROUP BY source, tok)
      |SELECT source,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
      |  (CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
      |    // CAST(COUNT(*) AS BIGINT) AS hapax_permille
      |FROM tf GROUP BY source ORDER BY source""") { (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        count_if(col("c") === 1).as("n_hapax"),
        count_if(col("c") === 2).as("n_dis"))
      .select(col("source"), col("n_tokens"), col("n_terms"),
        col("n_hapax"), col("n_dis"),
        expr("(n_hapax * 1000) div n_terms").as("hapax_permille"))
      .orderBy(col("source"))
  }

  /** Token-length histogram per language (r13) — the tokenizer-prep
    * profile: occurrence-weighted distribution of whitespace-token
    * lengths, capped at 15+ (the tail bucket). Informs max-token-len
    * truncation and BPE pre-tokenization rules. The explode is
    * row-local; the shuffle carries langs×15 combined partials. */
  val vocabTokenLenHistogram: QDef = q(
    "vocab_token_len_histogram",
    """WITH toks AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |b AS (
      |  SELECT lang, least(length(tok), 15) AS len_bucket
      |  FROM toks WHERE tok <> ''),
      |c AS (
      |  SELECT lang, len_bucket, CAST(COUNT(*) AS BIGINT) AS n_occ
      |  FROM b GROUP BY lang, len_bucket),
      |t AS (SELECT lang, CAST(SUM(n_occ) AS BIGINT) AS tot FROM c GROUP BY lang)
      |SELECT c.lang, c.len_bucket, c.n_occ,
      |  (c.n_occ * 1000) // t.tot AS permille
      |FROM c JOIN t ON c.lang = t.lang
      |ORDER BY c.lang, c.len_bucket""") { (s, d) =>
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("lang"), least(length(col("tok")), lit(15)).as("len_bucket"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("n_occ"))
    val totals = counts.groupBy(col("lang").as("t_lang"))
      .agg(sum(col("n_occ")).as("tot"))
    counts.join(broadcast(totals), col("lang") === col("t_lang"))
      .select(col("lang"), col("len_bucket"), col("n_occ"),
        expr("(n_occ * 1000) div tot").as("permille"))
      .orderBy(col("lang"), col("len_bucket"))
  }

  /** Per-source keyframe budget allocation (r13) — the multimodal
    * twin of `sample_neyman_allocation`: each SOURCE gets a 1000-
    * keyframe extraction budget, split across its documents by
    * largest-remainder apportionment proportional to synthesized
    * duration (n_chars·25 ms — the `multimodal_chunk_audio` metadata
    * convention), so every downstream decode job knows its exact
    * frame count BEFORE touching bytes. Pure BIGINT: floor share +
    * the (budget − Σfloor) biggest remainders, ties by doc_id. The
    * remainder rank is a SOURCE-partitioned window (never global);
    * at extreme docs-per-source the same answer comes from the
    * shared bucketed prefix machinery the global-rank keys use. */
  val multimodalKeyframeBudget: QDef = q(
    "multimodal_keyframe_budget",
    """WITH m AS (
      |  SELECT doc_id, source, n_chars * 25 AS duration_ms FROM documents),
      |w AS (
      |  SELECT source, CAST(SUM(duration_ms) AS BIGINT) AS wtot
      |  FROM m GROUP BY source),
      |b0 AS (
      |  SELECT m.doc_id, m.source, m.duration_ms,
      |    CAST((1000 * m.duration_ms) // w.wtot AS BIGINT) AS base,
      |    CAST((1000 * m.duration_ms) % w.wtot AS BIGINT) AS rem
      |  FROM m JOIN w ON m.source = w.source),
      |t AS (
      |  SELECT source, CAST(SUM(base) AS BIGINT) AS base_sum
      |  FROM b0 GROUP BY source),
      |b AS (
      |  SELECT b0.doc_id, b0.source, b0.duration_ms, b0.base, b0.rem,
      |    CAST(1000 - t.base_sum AS BIGINT) AS extra
      |  FROM b0 JOIN t ON b0.source = t.source),
      |r AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY rem DESC, doc_id) AS BIGINT) AS rnk
      |  FROM b)
      |SELECT b.doc_id, b.source, b.duration_ms, b.base,
      |  CAST(b.base + CASE WHEN r.rnk <= b.extra THEN 1 ELSE 0 END AS BIGINT)
      |    AS n_frames
      |FROM b JOIN r ON b.doc_id = r.doc_id
      |ORDER BY b.doc_id""") { (s, d) =>
    val m = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), (col("n_chars") * 25).as("duration_ms"))
    val t = m.groupBy(col("source").as("t_source"))
      .agg(sum(col("duration_ms")).as("wtot"))
    val withBase = m.join(broadcast(t), col("source") === col("t_source"))
      .select(col("doc_id"), col("source"), col("duration_ms"), col("wtot"),
        expr("CAST((1000 * duration_ms) div wtot AS BIGINT)").as("base"),
        expr("CAST((1000 * duration_ms) % wtot AS BIGINT)").as("rem"))
    val baseSum = withBase.groupBy(col("source").as("b_source"))
      .agg(sum(col("base")).as("base_sum"))
    val b = withBase.join(broadcast(baseSum), col("source") === col("b_source"))
      .withColumn("extra", lit(1000L) - col("base_sum"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("rem").desc, col("doc_id"))
    b.withColumn("rnk", row_number().over(w).cast(LongType))
      .select(col("doc_id"), col("source"), col("duration_ms"), col("base"),
        (col("base") + when(col("rnk") <= col("extra"), 1L).otherwise(0L))
          .as("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** Daily bounce rate (r13) — sessions (30-minute gap islands, the
    * `stream_custom_sessions` definition) that contain exactly ONE
    * event, per session-start day: the engagement-quality monitor a
    * funnel dashboard pairs with DAU. User-partitioned windows only
    * (per-user event cardinality bounds the state); days join back
    * over a tiny per-day table. Ties inside a user's stream order by
    * (ts, event_id) in both engines. */
  val eventsBounceRate: QDef = q(
    "events_bounce_rate",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_sec
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_sec,
      |    CASE WHEN lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |              IS NULL THEN 1
      |         WHEN date_diff('second',
      |              lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id),
      |              ts_sec) >= 1800 THEN 1
      |         ELSE 0 END AS new_session
      |  FROM e),
      |ids AS (
      |  SELECT user_id, ts_sec,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged),
      |sess AS (
      |  SELECT user_id, sid, MIN(ts_sec) AS session_start,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM ids GROUP BY user_id, sid)
      |SELECT CAST(date_trunc('day', session_start) AS DATE) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
      |  (CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |    // CAST(COUNT(*) AS BIGINT) AS bounce_ppm
      |FROM sess GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val flagged = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_sec"))
      .withColumn("new_session",
        when(lag(col("ts_sec"), 1).over(wOrd).isNull, 1L)
          .when(unix_timestamp(col("ts_sec"))
            - unix_timestamp(lag(col("ts_sec"), 1).over(wOrd)) >= 1800, 1L)
          .otherwise(0L))
    val sess = flagged
      .withColumn("sid", sum(col("new_session"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_sec")).as("session_start"), count(lit(1)).as("n_events"))
    sess.groupBy(date_trunc("day", col("session_start")).cast(DateType).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        count_if(col("n_events") === 1).as("n_bounce"))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        expr("(n_bounce * 1000000) div n_sessions").as("bounce_ppm"))
      .orderBy(col("day"))
  }

  /** Weekly retention triangle (r13) — the cohort × age activity
    * matrix growth teams read: users grouped by first-active EPOCH
    * WEEK (floor(epoch_days/7) — a pure integer both engines compute
    * identically, dodging week-of-year calendar seams), with each
    * later week's active share of the cohort in floor-ppm. Two
    * user-keyed aggs and one user-keyed join — the standard retention
    * shape; nothing scales past user cardinality. */
  val cohortRetentionTriangle: QDef = q(
    "cohort_retention_triangle",
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7 AS wk
      |  FROM events),
      |first AS (
      |  SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id),
      |sizes AS (
      |  SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_users
      |  FROM first GROUP BY cohort_wk),
      |active AS (
      |  SELECT f.cohort_wk, e.wk - f.cohort_wk AS age_weeks,
      |    CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
      |  FROM e JOIN first f ON e.user_id = f.user_id
      |  GROUP BY f.cohort_wk, e.wk - f.cohort_wk)
      |SELECT a.cohort_wk, a.age_weeks, s.cohort_users, a.n_active,
      |  (a.n_active * 1000000) // s.cohort_users AS retention_ppm
      |FROM active a JOIN sizes s ON a.cohort_wk = s.cohort_wk
      |ORDER BY a.cohort_wk, a.age_weeks""") { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000L div 7").as("wk"))
    val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val sizes = first.groupBy(col("cohort_wk").as("s_wk"))
      .agg(count(lit(1)).as("cohort_users"))
    val active = e.join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("age_weeks"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    active.join(broadcast(sizes), col("cohort_wk") === col("s_wk"))
      .select(col("cohort_wk"), col("age_weeks"), col("cohort_users"),
        col("n_active"),
        expr("(n_active * 1000000) div cohort_users").as("retention_ppm"))
      .orderBy(col("cohort_wk"), col("age_weeks"))
  }

  /** Lorenz decile table of customer order revenue (r13b) — the
    * curve behind `agg_gini_value`, materialized: active customers
    * ranked ASCENDING by exact revenue, cut into 10 rank deciles,
    * each with its revenue mass and the cumulative (Lorenz) share in
    * floor-ppm. Ranks come from the shared distributed-rank primitive
    * (`DriftOps.exclusivePrefix` over distinct revenue values +
    * row_number INSIDE the tie group — never an unpartitioned
    * window); everything after the rank is 10-row algebra. */
  val reportLorenzDeciles: QDef = q(
    "report_lorenz_deciles",
    """WITH u AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS total FROM u),
      |rk AS (
      |  SELECT cents,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rank
      |  FROM u),
      |dec AS (
      |  SELECT CAST(((rank - 1) * 10) // n AS BIGINT) AS decile, cents
      |  FROM rk CROSS JOIN n),
      |g AS (
      |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |    CAST(SUM(cents) AS BIGINT) AS cents
      |  FROM dec GROUP BY 1),
      |c AS (
      |  SELECT a.decile, a.n_customers, a.cents,
      |    CAST(SUM(b.cents) AS BIGINT) AS cum_cents
      |  FROM g a JOIN g b ON b.decile <= a.decile
      |  GROUP BY 1, 2, 3)
      |SELECT c.decile, c.n_customers, c.cents, c.cum_cents,
      |  CAST(c.cum_cents * 1000000 // n.total AS BIGINT) AS lorenz_ppm
      |FROM c CROSS JOIN n ORDER BY c.decile""") { (s, d) =>
    val u = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"))
        .cast(LongType).as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = u.agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
    val xc = u.groupBy(col("cents").as("v")).agg(count(lit(1)).as("cnt"))
    val pre = DriftOps.exclusivePrefix(xc, expr("v div 10000000"))
      .select(col("v"), col("pre"))
    val wTie = Window.partitionBy(col("cents")).orderBy(col("o_custkey"))
    val rk = u.join(pre, col("v") === col("cents"))
      .select(col("cents"), (col("pre") + row_number().over(wTie)).as("rank"))
    val g = rk.crossJoin(broadcast(n))
      .select(expr("CAST(((rank - 1) * 10) div n AS BIGINT)").as("decile"),
        col("cents"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("cents"))
    val c = g.join(broadcast(g.select(col("decile").as("bd"),
        col("cents").as("bc"))), col("bd") <= col("decile"))
      .groupBy(col("decile"), col("n_customers"), col("cents"))
      .agg(sum(col("bc")).as("cum_cents"))
    c.crossJoin(broadcast(n))
      .select(col("decile"), col("n_customers"), col("cents"), col("cum_cents"),
        expr("CAST(cum_cents * 1000000 div total AS BIGINT)").as("lorenz_ppm"))
      .orderBy(col("decile"))
  }

  /** Modularity of the nation partition on the trade multigraph
    * (r13b) — is customer↔supplier trade nation-assortative? Each
    * lineitem is one undirected edge between its order's customer and
    * its supplier; communities are the endpoints' nations. Newman
    * modularity per community, Q_c = e_c/m − (d_c/2m)², reported as
    * the exact integer numerator (4·m·e_c − d_c²) over 4m² in
    * sign-decomposed trunc-toward-zero ppm (both engines spell the
    * CASE identically — floor vs trunc never diverges). The products
    * ride DECIMAL(38,0) (4m²·10⁶ outgrows int64 past ~sf0.3) and end
    * in an integral division — no decimal→double cast, so the 2^53
    * gate has nothing to flag. Scale: one fact join + two
    * nation-sized aggs. */
  val graphModularityNations: QDef = q(
    "graph_modularity_nations",
    """WITH edges AS (
      |  SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
      |deg AS (
      |  SELECT nation, CAST(SUM(dn) AS BIGINT) AS d FROM (
      |    SELECT cust_nation AS nation, CAST(COUNT(*) AS BIGINT) AS dn
      |    FROM edges GROUP BY 1
      |    UNION ALL
      |    SELECT supp_nation, CAST(COUNT(*) AS BIGINT) FROM edges GROUP BY 1)
      |  GROUP BY nation),
      |internal AS (
      |  SELECT cust_nation AS nation, CAST(COUNT(*) AS BIGINT) AS e_in
      |  FROM edges WHERE cust_nation = supp_nation GROUP BY 1),
      |q AS (
      |  SELECT deg.nation, COALESCE(i.e_in, 0) AS e_in, deg.d,
      |    4 * m.m * COALESCE(i.e_in, 0) - deg.d * deg.d AS num,
      |    4 * m.m * m.m AS den
      |  FROM deg LEFT JOIN internal i ON deg.nation = i.nation CROSS JOIN m)
      |SELECT nation, e_in AS n_internal_edges, d AS degree_sum,
      |  CAST(CASE WHEN num >= 0
      |    THEN (CAST(num AS HUGEINT) * 1000000) // den
      |    ELSE -((CAST(-num AS HUGEINT) * 1000000) // den) END AS BIGINT)
      |    AS contrib_ppm
      |FROM q ORDER BY nation""") { (s, d) =>
    // r19 batch 3 (guide §2.3): the persisted raw (cust_nation,
    // supp_nation) edge list (|lineitem| rows) was re-scanned three
    // times (m, the doubled deg union, internal). Persist the
    // ≤|nations|² COUNT table instead — m/deg/internal are exact
    // integer functions of it (the cut_conductance treatment), so
    // the fact pass runs ONCE and the cache shrinks from edge volume
    // to a constant. (Spreading the single-split probe side was
    // measured and rejected here like in tradeEb: the partial agg
    // reduces 600k→625 in the scan task, so the extra exchange only
    // added cost — steady 1.16 s without vs ~1.4 s with.)
    val ecnt = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey").as("c_nk"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey").as("s_nk"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nk") === col("cnk"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nk") === col("snk"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("en"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = ecnt.agg(sum(col("en")).cast(LongType).as("m"))
    val deg = ecnt.select(col("cust_nation").as("nation"), col("en"))
      .unionAll(ecnt.select(col("supp_nation"), col("en")))
      .groupBy(col("nation")).agg(sum(col("en")).cast(LongType).as("d"))
    val internal = ecnt.filter(col("cust_nation") === col("supp_nation"))
      .groupBy(col("cust_nation").as("i_nation"))
      .agg(sum(col("en")).cast(LongType).as("e_in"))
    deg.join(broadcast(internal), col("nation") === col("i_nation"), "left")
      .crossJoin(broadcast(m))
      .select(col("nation"),
        coalesce(col("e_in"), lit(0L)).as("n_internal_edges"),
        col("d").as("degree_sum"),
        (lit(4) * col("m") * coalesce(col("e_in"), lit(0L))
          - col("d") * col("d")).as("num"),
        (lit(4) * col("m") * col("m")).as("den"))
      .select(col("nation"), col("n_internal_edges"), col("degree_sum"),
        expr("""CAST(CASE WHEN num >= 0
          THEN (CAST(num AS DECIMAL(38,0)) * 1000000) div den
          ELSE -((CAST(-num AS DECIMAL(38,0)) * 1000000) div den) END AS BIGINT)""")
          .as("contrib_ppm"))
      .orderBy(col("nation"))
  }

  /** Nearest-centroid classifier audit (r13b) — the evaluation leg of
    * the kmeans/knn family: label centroids as FLOOR-MEAN
    * milli-quantized vectors (the `drift_embedding_centroid`
    * spelling: cohort-size-invariant, exact cross-engine floor via
    * (s − pmod(s, n)) div n), every vector assigned to the centroid
    * with the smallest exact squared integer distance (ties by
    * label), reported as a confusion matrix. The explode shuffles
    * vecs×labels×dims bounded partials at fixture scale; at 100 TB
    * the candidate set comes from IVF routing (`ann_ivf_label`) and
    * this remains the held-out-sample grade. */
  val simCentroidClassifier: QDef = q(
    "sim_centroid_classifier",
    """WITH comp AS (
      |  SELECT vec_id, label, t.pos AS pos,
      |    CAST(floor(CAST(embedding[t.pos] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      |      AS milli
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(pos)),
      |cent AS (
      |  SELECT label AS c_label, pos,
      |    (s - ((s % n) + n) % n) // n AS c
      |  FROM (SELECT label, pos, CAST(SUM(milli) AS BIGINT) AS s,
      |          CAST(COUNT(*) AS BIGINT) AS n
      |        FROM comp GROUP BY label, pos) sums),
      |dist AS (
      |  SELECT comp.vec_id, comp.label AS true_label, cent.c_label,
      |    CAST(SUM((comp.milli - cent.c) * (comp.milli - cent.c)) AS BIGINT) AS d2
      |  FROM comp JOIN cent ON comp.pos = cent.pos
      |  GROUP BY 1, 2, 3),
      |pick AS (
      |  SELECT vec_id, true_label, c_label AS pred_label,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
      |  FROM dist)
      |SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN true_label = pred_label THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct
      |FROM pick WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    val comp = Tables.embeddings(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("label"), col("pos"),
        floor(col("x").cast(DoubleType) * 1000 + 0.5).cast(LongType).as("milli"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = comp.groupBy(col("label").as("c_label"), col("pos").as("c_pos"))
      .agg(sum(col("milli")).as("s"), count(lit(1)).as("n"))
      .select(col("c_label"), col("c_pos"),
        expr("(s - pmod(s, n)) div n").as("c"))
    val dist = comp.join(broadcast(cent), col("pos") === col("c_pos"))
      .groupBy(col("vec_id"), col("label").as("true_label"), col("c_label"))
      .agg(sum((col("milli") - col("c")) * (col("milli") - col("c"))).as("d2"))
    val wPick = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c_label"))
    dist.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .groupBy(col("true_label"), col("c_label").as("pred_label"))
      .agg(count(lit(1)).as("n"),
        count_if(col("true_label") === col("c_label")).as("n_correct"))
      .orderBy(col("true_label"), col("pred_label"))
  }

  /** Vocabulary growth curve (r13b) — Heaps'-law style: distinct
    * terms and token mass accumulated by each 10%-of-corpus doc-id
    * threshold, the statistic that sizes a tokenizer vocabulary
    * against corpus growth. Spelled as per-term FIRST-doc (one
    * vocabulary-sized agg) joined against the 10-row threshold table
    * — never an ordered scan. */
  val corpusVocabGrowth: QDef = q(
    "corpus_vocab_growth",
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |bounds AS (SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n_docs FROM docs),
      |th AS (
      |  SELECT k, (n_docs * k) // 10 AS cutoff
      |  FROM (SELECT unnest(range(1, 11)) AS k) CROSS JOIN bounds),
      |tok AS (
      |  SELECT doc_id, unnest(ts) AS tok FROM docs),
      |firsts AS (
      |  SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |  FROM tok WHERE tok <> '' GROUP BY tok),
      |dtok AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
      |  FROM tok WHERE tok <> '' GROUP BY doc_id)
      |SELECT th.k,
      |  CAST(th.cutoff AS BIGINT) AS n_docs,
      |  (SELECT CAST(SUM(n_tok) AS BIGINT) FROM dtok WHERE doc_id < th.cutoff)
      |    AS n_tokens,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts WHERE first_doc < th.cutoff)
      |    AS n_distinct_terms
      |FROM th ORDER BY th.k""") { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounds from the DOCS level, matching the oracle's docs-CTE MAX
    // (ADVICE r13): the token-filtered exploded set loses a max-doc_id
    // document whose text is empty/whitespace-only, shifting every
    // cutoff.
    val bounds = Tables.documents(s, d).agg((max(col("doc_id")) + 1).as("n_docs"))
    val th = s.range(1, 11).select(col("id").as("k"))
      .crossJoin(broadcast(bounds))
      .select(col("k"), expr("(n_docs * k) div 10").as("cutoff"))
    val firsts = tok.groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
    val dtok = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    // conditional aggregation over the broadcast 10-row threshold
    // table (never a big-side broadcast): every k keeps its row even
    // with zero qualifying docs/terms
    val tokens = dtok.crossJoin(broadcast(th))
      .groupBy(col("k"), col("cutoff"))
      .agg(sum(when(col("doc_id") < col("cutoff"), col("n_tok")).otherwise(0L))
        .as("n_tokens"))
    val terms = firsts.crossJoin(broadcast(th.select(col("k").as("t_k"),
        col("cutoff").as("t_cutoff"))))
      .groupBy(col("t_k"))
      .agg(count_if(col("first_doc") < col("t_cutoff")).as("n_distinct_terms"))
    tokens.join(broadcast(terms), col("k") === col("t_k"))
      .select(col("k"), col("cutoff").as("n_docs"), col("n_tokens"),
        col("n_distinct_terms"))
      .orderBy(col("k"))
  }

  /** Order→ship lag histogram (r13b) — the fulfilment-latency
    * distribution behind `dq_order_lineitem_dates`' violation audit:
    * whole-day lag from order date to each line's ship date, bucketed
    * by week with a 15+ tail, counts and floor-permille. One
    * fact⋈fact equi-join on the order key (SMJ at scale — exactly the
    * join the bucketed-layout keys delete) and a 16-cell agg. */
  val reportShipLagHistogram: QDef = q(
    "report_ship_lag_histogram",
    """WITH lag AS (
      |  SELECT date_diff('day', CAST(o.o_orderdate AS DATE),
      |      CAST(l.l_shipdate AS DATE)) AS lag_days
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |b AS (
      |  SELECT least(greatest(lag_days, 0) // 7, 15) AS week_bucket
      |  FROM lag),
      |c AS (
      |  SELECT week_bucket, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
      |SELECT CAST(week_bucket AS BIGINT) AS week_bucket, n,
      |  (n * 1000) // t.tot AS permille
      |FROM c CROSS JOIN t ORDER BY week_bucket""") { (s, d) =>
    val lags = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate").cast(DateType).as("ship"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast(DateType).as("odate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("ship"), col("odate")).as("lag_days"))
    val c = lags
      .select(least(expr("greatest(lag_days, 0) div 7"), lit(15))
        .cast(LongType).as("week_bucket"))
      .groupBy(col("week_bucket")).agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).as("tot"))
    c.crossJoin(broadcast(t))
      .select(col("week_bucket"), col("n"),
        expr("(n * 1000) div tot").as("permille"))
      .orderBy(col("week_bucket"))
  }

  /** Population Stability Index of order value (r13b) — THE model-
    * monitoring drift number: Σ (p_i − q_i)·ln(p_i/q_i) over 11 fixed
    * $50k buckets between the early (≤1997) and late (≥1998) order
    * eras, per-bucket. Determinism: counts and share differences are
    * exact integer algebra cast once to double; the log follows the
    * `drift_unigram_jsd` protocol — ln over a RATIO OF EXACT INTEGERS,
    * rounded to 6 decimals into DECIMAL(28,6) (the two engines' libm
    * ln agree far inside 1e-6), one shared float finish. Buckets empty
    * on either side contribute 0 by the standard PSI convention
    * (documented deviation from +∞). A 22-cell agg over one scan. */
  val driftValuePsi: QDef = q(
    "drift_value_psi",
    """WITH o AS (
      |  SELECT CASE WHEN year(CAST(o_orderdate AS TIMESTAMP)) <= 1997
      |    THEN 0 ELSE 1 END AS era,
      |    least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 5000000, 10)
      |      AS bucket
      |  FROM orders),
      |c AS (
      |  SELECT era, bucket, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM o GROUP BY era, bucket),
      |bins AS (SELECT unnest(range(0, 11)) AS bucket),
      |r AS (SELECT bucket AS rb, n AS nr FROM c WHERE era = 0),
      |cu AS (SELECT bucket AS cb, n AS nc FROM c WHERE era = 1),
      |t AS (
      |  SELECT CAST(bins.bucket AS BIGINT) AS bucket,
      |    COALESCE(nr, 0) AS n_ref, COALESCE(nc, 0) AS n_cur
      |  FROM bins LEFT JOIN r ON bins.bucket = rb
      |    LEFT JOIN cu ON bins.bucket = cb),
      |tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
      |  CAST(SUM(n_cur) AS BIGINT) AS tc FROM t)
      |SELECT bucket, n_ref, n_cur,
      |  (n_ref * 1000000) // tr AS ref_ppm,
      |  (n_cur * 1000000) // tc AS cur_ppm,
      |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
      |    CAST(n_ref * tc - n_cur * tr AS DOUBLE) / (CAST(tr AS DOUBLE) * tc)
      |      * CAST(CAST(ROUND(ln(CAST(n_ref * tc AS DOUBLE) / (n_cur * tr)), 6)
      |          AS DECIMAL(28,6)) AS DOUBLE)
      |  ELSE 0.0 END AS psi_term
      |FROM t CROSS JOIN tot
      |ORDER BY bucket""") { (s, d) =>
    val o = Tables.orders(s, d)
      .select(when(year(col("o_orderdate").cast(TimestampType)) <= 1997, 0)
          .otherwise(1).as("era"),
        least(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint) div 5000000"),
          lit(10L)).as("bucket"))
    val c = o.groupBy(col("era"), col("bucket")).agg(count(lit(1)).as("n"))
    val bins = s.range(0, 11).select(col("id").as("bucket"))
    val r = c.filter(col("era") === 0).select(col("bucket").as("rb"), col("n").as("nr"))
    val cu = c.filter(col("era") === 1).select(col("bucket").as("cb"), col("n").as("nc"))
    val t = bins.join(broadcast(r), col("bucket") === col("rb"), "left")
      .join(broadcast(cu), col("bucket") === col("cb"), "left")
      .select(col("bucket"),
        coalesce(col("nr"), lit(0L)).as("n_ref"),
        coalesce(col("nc"), lit(0L)).as("n_cur"))
    val tot = t.agg(sum(col("n_ref")).as("tr"), sum(col("n_cur")).as("tc"))
    t.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        expr("(n_ref * 1000000) div tr").as("ref_ppm"),
        expr("(n_cur * 1000000) div tc").as("cur_ppm"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          (col("n_ref") * col("tc") - col("n_cur") * col("tr")).cast(DoubleType)
            / (col("tr").cast(DoubleType) * col("tc"))
            * round(log((col("n_ref") * col("tc")).cast(DoubleType)
                / (col("n_cur") * col("tr"))), 6)
              .cast(DecimalType(28, 6)).cast(DoubleType))
          .otherwise(lit(0.0)).as("psi_term"))
      .orderBy(col("bucket"))
  }

  /** Curation rule-overlap matrix (r13c) — which quality rules
    * actually fire TOGETHER: for the four standard filters (too-short,
    * low-diversity, exact-duplicate, oversize), the doc counts failing
    * every (rule, rule) pair — diagonals are per-rule totals, and a
    * near-diagonal off-cell means one rule subsumes another (drop it
    * and save its pass over the corpus). Rules: ntok < 30 (short),
    * 10·nuniq < 4·ntok (the integer form of diversity < 0.4),
    * non-min-doc exact-text duplicate (`dedup_exact_docs`
    * survivorship), n_chars > 450 (oversize) — thresholds sit inside
    * the fixture's operating range (ntok 10–100, diversity ≥ 0.27,
    * n_chars 44–577) so the matrix is non-trivial; a production
    * corpus dials its own. Per-doc flags fold row-locally into a
    * failed-rules array (conditional array concat — no lambda, so the
    * explode stays a plain Generate), the pair explode is ≤ 16
    * rows/doc, and the shuffle carries 16 combined cells. */
  val curationRuleOverlap: QDef = q(
    "curation_rule_overlap",
    """WITH t AS (
      |  SELECT doc_id, md5(text) AS h, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nuniq
      |  FROM documents),
      |m AS (SELECT h AS mh, MIN(doc_id) AS keeper FROM t GROUP BY h),
      |f AS (
      |  SELECT doc_id,
      |    (CASE WHEN ntok < 30 THEN ['short'] ELSE [] END)
      |      || (CASE WHEN 10 * nuniq < 4 * ntok THEN ['low_diversity'] ELSE [] END)
      |      || (CASE WHEN doc_id <> keeper THEN ['duplicate'] ELSE [] END)
      |      || (CASE WHEN n_chars > 450 THEN ['oversize'] ELSE [] END) AS failed
      |  FROM t JOIN m ON t.h = m.mh)
      |SELECT u1.ra AS rule_a, u2.rb AS rule_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM f, UNNEST(failed) u1(ra), UNNEST(failed) u2(rb)
      |GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"), col("n_chars"),
        size(split(col("text"), " ")).cast(LongType).as("ntok"),
        size(array_distinct(split(col("text"), " "))).cast(LongType).as("nuniq"))
    val m = t.groupBy(col("h").as("mh")).agg(min(col("doc_id")).as("keeper"))
    t.join(m, col("h") === col("mh"))
      .select(col("doc_id"), expr(
        """concat(
          |  CASE WHEN ntok < 30 THEN array('short') ELSE CAST(array() AS ARRAY<STRING>) END,
          |  CASE WHEN 10 * nuniq < 4 * ntok THEN array('low_diversity') ELSE CAST(array() AS ARRAY<STRING>) END,
          |  CASE WHEN doc_id <> keeper THEN array('duplicate') ELSE CAST(array() AS ARRAY<STRING>) END,
          |  CASE WHEN n_chars > 450 THEN array('oversize') ELSE CAST(array() AS ARRAY<STRING>) END)"""
          .stripMargin).as("failed"))
      .select(col("failed"), explode(col("failed")).as("rule_a"))
      .select(col("rule_a"), explode(col("failed")).as("rule_b"))
      .groupBy(col("rule_a"), col("rule_b"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("rule_a"), col("rule_b"))
  }

  /** Dedup-adjusted mixture weights (r13c) — the sampling-weight
    * table a mixer reads AFTER exact dedup instead of before: per
    * source, raw docs, surviving docs (global min-doc-per-text
    * survivorship — a cross-source duplicate credits only the
    * keeper's source, the `dedup_exact_docs` semantics), the
    * duplication rate, and the re-normalized sampling weight over
    * surviving docs in floor-ppm. Digest-keyed shuffle (16-byte md5,
    * never text bodies); source-level algebra after. */
  val mixDedupAdjusted: QDef = q(
    "mix_dedup_adjusted",
    """WITH t AS (SELECT doc_id, source, md5(text) AS h FROM documents),
      |m AS (SELECT h AS mh, MIN(doc_id) AS keeper FROM t GROUP BY h),
      |f AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw,
      |    CAST(SUM(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_kept
      |  FROM t JOIN m ON t.h = m.mh GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_kept) AS BIGINT) AS total_kept FROM f)
      |SELECT source, n_raw, n_kept,
      |  ((n_raw - n_kept) * 1000000) // n_raw AS dup_ppm,
      |  (n_kept * 1000000) // tot.total_kept AS weight_ppm
      |FROM f CROSS JOIN tot ORDER BY source""") { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val m = t.groupBy(col("h").as("mh")).agg(min(col("doc_id")).as("keeper"))
    val f = t.join(m, col("h") === col("mh"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        count_if(col("doc_id") === col("keeper")).as("n_kept"))
    val tot = f.agg(sum(col("n_kept")).as("total_kept"))
    f.crossJoin(broadcast(tot))
      .select(col("source"), col("n_raw"), col("n_kept"),
        expr("((n_raw - n_kept) * 1000000) div n_raw").as("dup_ppm"),
        expr("(n_kept * 1000000) div total_kept").as("weight_ppm"))
      .orderBy(col("source"))
  }

  val all: Seq[QDef] = Seq(dqReferentialOrphans, textHapaxRatio,
    vocabTokenLenHistogram, multimodalKeyframeBudget, eventsBounceRate,
    cohortRetentionTriangle, reportLorenzDeciles, graphModularityNations,
    simCentroidClassifier, corpusVocabGrowth, reportShipLagHistogram,
    driftValuePsi, curationRuleOverlap, mixDedupAdjusted)
}
