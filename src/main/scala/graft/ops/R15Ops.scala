package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import graft.Protocol.{money, qty, rate}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-15 additions: the mergeable-sketch audits VERDICT r14 asked
  * for (a sharded KMV quantile sketch and a sharded heavy-hitters
  * candidate merge — the two sketch legs a 100 TB rollup relies on
  * that nothing graded yet), two classic deep-join report shapes
  * (adapted TPC-H Q9/Q21 over the fixture's tables), and audit/eval
  * operators for privacy, experimentation, calibration and
  * sessionization — all under the house determinism protocol (exact
  * integers end to end, md5/modulo-deterministic shards, floor-ppm
  * ratios spelled identically in both engines). */
object R15Ops {

  /** Shared KMV-sample primitive (VERDICT r15 item 1) — the ONE
    * spelling of the sharded bottom-64 KMV uniform sample over
    * `orders` that `sketch_quantile_merge` (sketch-state mergeability
    * audit) and `shard_plan_from_sketch` (sketch-planned layout) both
    * build on; extracted so the two graded keys cannot drift. CTEs:
    * u = (key, cents, md5-prefix hash, mod-8 shard), n = row count,
    * ps = per-shard bottom-64 states (shard-partitioned window), mg =
    * the merged bottom-64-of-union (== the one-pass global bottom-64;
    * bottom-k is associative/commutative/idempotent under union), sr
    * = the merged sample ranked by VALUE via a 64×64 broadcast
    * self-join. The Spark builder below is the plan-identical twin of
    * this text. */
  private[ops] val kmvSampleCtes: String =
    """u AS (
      |  SELECT o_orderkey AS k,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT AS h,
      |    o_orderkey % 8 AS shard
      |  FROM orders),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
      |ps AS (
      |  SELECT k, cents, h FROM (
      |    SELECT k, cents, h,
      |      row_number() OVER (PARTITION BY shard ORDER BY h, k) AS rn
      |    FROM u) WHERE rn <= 64),
      |mg AS (
      |  SELECT k, cents FROM (
      |    SELECT k, cents, row_number() OVER (ORDER BY h, k) AS rn FROM ps)
      |  WHERE rn <= 64),
      |sr AS (
      |  SELECT a.cents, a.k, CAST(COUNT(*) AS BIGINT) AS r
      |  FROM mg a JOIN mg b
      |    ON b.cents < a.cents OR (b.cents = a.cents AND b.k <= a.k)
      |  GROUP BY a.cents, a.k)"""

  /** The sharded KMV sample's Spark side: u (the scan-shaped
    * projection), n (1-row count), sr (the merged ≤64-row sample with
    * value ranks). `persistU` is the only caller-visible choice — the
    * quantile audit's exact ground-truth side re-scans u, the layout
    * planner reads it once. */
  private[ops] final case class KmvSample(
      u: DataFrame, n: DataFrame, sr: DataFrame)

  private[ops] def kmvSample(s: SparkSession, d: String,
      persistU: Boolean): KmvSample = {
    import org.apache.spark.sql.expressions.Window
    var u = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast(LongType).as("cents"),
        conv(substring(md5(col("o_orderkey").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType).as("h"),
        expr("o_orderkey % 8").as("shard"))
    if (persistU)
      u = u.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = u.agg(count(lit(1)).as("n"))
    // per-shard bottom-64 states (shard-partitioned window), merged by
    // taking the bottom-64 of the ≤512-row union (TakeOrdered — the
    // merge a rollup runs over stored per-shard sketch tables)
    val wShard = Window.partitionBy(col("shard")).orderBy(col("h"), col("k"))
    val ps = u.select(col("k"), col("cents"), col("h"),
        row_number().over(wShard).as("rn"))
      .filter(col("rn") <= 64).select(col("k"), col("cents"), col("h"))
    val mg = ps.orderBy(col("h"), col("k")).limit(64)
      .select(col("k"), col("cents"))
    // sample ranks by VALUE: 64×64 broadcast rank self-join
    val sr = mg.as("a")
      .join(broadcast(mg.select(col("k").as("bk"), col("cents").as("bc"))),
        col("bc") < col("a.cents") ||
          (col("bc") === col("a.cents") && col("bk") <= col("a.k")))
      .groupBy(col("a.cents").as("cents"), col("a.k").as("k"))
      .agg(count(lit(1)).as("r"))
    KmvSample(u, n, sr)
  }

  /** Mergeable quantile sketch audit (r15, VERDICT r14 item 2) — the
    * sharded-percentile property a 100 TB rollup actually relies on:
    * percentile STATES built independently per shard must merge into
    * the same state one pass over the whole table would build.
    *
    * The sketch is a KMV (bottom-k by hash order) uniform sample —
    * the exact-dyadic formulation the verdict asked for: each of 8
    * shards (o_orderkey mod 8 — stand-in for 8 executors' partials)
    * keeps its 64 rows of smallest md5-prefix hash; the MERGE is
    * "bottom-64 of the union", which equals the one-pass global
    * bottom-64 because bottom-k is associative/commutative/idempotent
    * under union (the spec pins that equality row-for-row). Quantile
    * estimate at p = the sample's value at rank ⌊(k−1)·p/100⌋+1 (the
    * `agg_quantiles_exact` rank convention), graded against the EXACT
    * percentile from full-table ranks via the shared bucketed
    * two-pass exclusive-prefix (never an unpartitioned window on the
    * big side; the ≤512-row merged state ranks through broadcast
    * self-joins). err_ppm uses the sign-split floor spelling so
    * Spark `div` and DuckDB `//` agree on every sign. Scale: the
    * per-shard state is 64 rows regardless of input; only the exact
    * ground-truth side (the audit's honest cost) touches full-table
    * ranks. The sample itself (u/ps/mg/sr) is the shared
    * [[kmvSampleCtes]]/[[kmvSample]] primitive, also consumed by
    * `shard_plan_from_sketch`. */
  val sketchQuantileMerge: QDef = q(
    "sketch_quantile_merge",
    s"""WITH $kmvSampleCtes,
      |pct AS (SELECT * FROM (VALUES (25), (50), (75), (90), (99)) AS t(p)),
      |est AS (
      |  SELECT p, MAX(CASE WHEN r = (64 - 1) * p // 100 + 1 THEN cents END)
      |    AS est_cents
      |  FROM sr CROSS JOIN pct GROUP BY p),
      |rk AS (
      |  SELECT cents,
      |    CAST(row_number() OVER (ORDER BY cents, k) AS BIGINT) AS rank
      |  FROM u),
      |ex AS (
      |  SELECT p, MAX(CASE WHEN rank = (n - 1) * p // 100 + 1 THEN cents END)
      |    AS exact_cents
      |  FROM rk CROSS JOIN n CROSS JOIN pct GROUP BY p)
      |SELECT CAST(p AS BIGINT) AS pct, n.n AS n_rows,
      |  CAST(64 AS BIGINT) AS sample_k, est_cents, exact_cents,
      |  est_cents - exact_cents AS err_cents,
      |  CASE WHEN est_cents >= exact_cents
      |    THEN CAST((est_cents - exact_cents) * 1000000 // exact_cents
      |      AS BIGINT)
      |    ELSE -CAST((exact_cents - est_cents) * 1000000 // exact_cents
      |      AS BIGINT) END AS err_ppm
      |FROM est JOIN ex USING (p) CROSS JOIN n
      |ORDER BY pct""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ks = kmvSample(s, d, persistU = true)
    val u = ks.u; val n = ks.n; val sr = ks.sr
    import s.implicits._
    val pcts = Seq(25, 50, 75, 90, 99).toDF("p")
    val est = sr.crossJoin(broadcast(pcts))
      .groupBy(col("p"))
      .agg(max(when(col("r") === expr("(64 - 1) * p div 100 + 1"),
        col("cents"))).as("est_cents"))
    // exact side: full-table ranks via the shared bucketed two-pass
    // exclusive-prefix (shard_range_boundaries' machinery)
    val xc = u.groupBy(col("cents").as("v")).agg(count(lit(1)).as("cnt"))
    val pre = DriftOps.exclusivePrefix(xc, expr("v div 10000000"))
      .select(col("v"), col("pre"))
    val wTie = Window.partitionBy(col("cents")).orderBy(col("k"))
    val rk = u.join(pre, col("v") === col("cents"))
      .select(col("cents"), (col("pre") + row_number().over(wTie)).as("rank"))
    val ex = rk.crossJoin(broadcast(n)).crossJoin(broadcast(pcts))
      .groupBy(col("p").as("ep"))
      .agg(max(when(col("rank") === expr("(n - 1) * p div 100 + 1"),
        col("cents"))).as("exact_cents"))
    est.join(broadcast(ex), col("p") === col("ep"))
      .crossJoin(broadcast(n))
      .select(col("p").cast(LongType).as("pct"), col("n").as("n_rows"),
        lit(64L).as("sample_k"), col("est_cents"), col("exact_cents"),
        (col("est_cents") - col("exact_cents")).as("err_cents"),
        when(col("est_cents") >= col("exact_cents"),
          expr("CAST((est_cents - exact_cents) * 1000000 div exact_cents" +
            " AS BIGINT)"))
          .otherwise(-expr("CAST((exact_cents - est_cents) * 1000000" +
            " div exact_cents AS BIGINT)")).as("err_ppm"))
      .orderBy(col("pct"))
  }

  /** Mergeable heavy-hitters audit (r15) — the frequent-items leg of
    * the sketch-merge family: per-shard top-8 token candidate lists
    * (the Misra-Gries/SpaceSaving summary's exact-spellable core)
    * merged by candidate-set union, then audited against the exact
    * global top-8. The pigeonhole guarantee this grades: any token
    * with global count > N_shard_max·8 must enter at least one
    * shard's top-8, so a merged candidate set can only miss tail
    * items — `found_by_merge` is the per-rank witness and
    * `n_candidates` the merged state's size (≤64 rows regardless of
    * corpus size; the exact global count side is the audit's honest
    * cost, not the production path). Ties break by token text in both
    * engines. */
  val sketchHeavyHittersMerge: QDef = q(
    "sketch_heavy_hitters_merge",
    """WITH tok AS (
      |  SELECT doc_id % 8 AS shard, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)),
      |sc AS (
      |  SELECT shard, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM tok GROUP BY shard, tok),
      |cand AS (
      |  SELECT DISTINCT tok FROM (
      |    SELECT tok,
      |      row_number() OVER (PARTITION BY shard ORDER BY cnt DESC, tok)
      |        AS rn
      |    FROM sc) WHERE rn <= 8),
      |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
      |gc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM tok GROUP BY tok),
      |top8 AS (SELECT tok, cnt FROM gc ORDER BY cnt DESC, tok LIMIT 8),
      |rt AS (
      |  SELECT a.tok, a.cnt, CAST(COUNT(*) AS BIGINT) AS rank
      |  FROM top8 a JOIN top8 b
      |    ON b.cnt > a.cnt OR (b.cnt = a.cnt AND b.tok <= a.tok)
      |  GROUP BY a.tok, a.cnt)
      |SELECT rt.rank, rt.tok, rt.cnt,
      |  cand.tok IS NOT NULL AS found_by_merge, nc.n_candidates
      |FROM rt LEFT JOIN cand ON cand.tok = rt.tok CROSS JOIN nc
      |ORDER BY rt.rank""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(expr("doc_id % 8").as("shard"),
        explode(split(col("text"), " ")).as("tok"))
    val sc = tok.groupBy(col("shard"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val wShard = Window.partitionBy(col("shard"))
      .orderBy(col("cnt").desc, col("tok"))
    val cand = sc.select(col("tok"), row_number().over(wShard).as("rn"))
      .filter(col("rn") <= 8).select(col("tok")).distinct()
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    val gc = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val top8 = gc.orderBy(col("cnt").desc, col("tok")).limit(8)
    val rt = top8.as("a")
      .join(broadcast(top8.select(col("tok").as("bt"), col("cnt").as("bc"))),
        col("bc") > col("a.cnt") ||
          (col("bc") === col("a.cnt") && col("bt") <= col("a.tok")))
      .groupBy(col("a.tok").as("tok"), col("a.cnt").as("cnt"))
      .agg(count(lit(1)).as("rank"))
    rt.join(broadcast(cand.select(col("tok").as("ct"))),
        col("tok") === col("ct"), "left")
      .crossJoin(broadcast(nc))
      .select(col("rank"), col("tok"), col("cnt"),
        col("ct").isNotNull.as("found_by_merge"), col("n_candidates"))
      .orderBy(col("rank"))
  }

  /** Adapted TPC-H Q9 "product type profit" (r15) — the classic
    * 5-table deep-join report over the fixture's tables: profit per
    * (supplier nation, order year). The fixture has no partsupp, so
    * supply cost is proxied as half the part's retail price per unit
    * quantity (an exact DECIMAL(1,1) factor — no rounding anywhere):
    * amount = extprice·(1−disc) − retail·qty·0.5, every operand at
    * its natural scale, summed as exact decimals and emitted once as
    * DOUBLE. Plan shape: lineitem keeps the only fact-sized shuffle
    * (join to orders on orderkey); part, supplier+nation are
    * broadcast dims. */
  val q9ProductProfit: QDef = q(
    "q9_product_profit",
    """SELECT n_name AS nation,
      |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CAST(l_discount AS DECIMAL(6,2)))
      |    - CAST(p_retailprice AS DECIMAL(12,2))
      |      * CAST(l_quantity AS DECIMAL(12,4)) * 0.5) AS DOUBLE)
      |    AS profit,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |GROUP BY 1, 2
      |ORDER BY nation, o_year""") { (s, d) =>
    val supp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val parts = Tables.part(s, d)
      .select(col("p_partkey"), money(col("p_retailprice")).as("retail"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("int").as("o_year"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .as("gross"),
        qty(col("l_quantity")).as("q"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), col("o_year"),
        (col("gross") - col("retail") * col("q") * lit(BigDecimal("0.5"))
          .cast(DecimalType(1, 1))).as("amount"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("amount")).cast(DoubleType).as("profit"),
        count(lit(1)).as("n_items"))
      .select(col("n_name").as("nation"), col("o_year"), col("profit"),
        col("n_items"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** Adapted TPC-H Q21 "suppliers who kept orders waiting" (r15) —
    * the classic EXISTS/NOT-EXISTS double correlation, spelled as
    * semi + anti joins: for finished orders, count each supplier's
    * LATE lineitems (ship > 90 days after order date) on
    * multi-supplier orders where it was the ONLY late supplier. The
    * fixture has no commit/receipt dates, so lateness is
    * ship-vs-order lag — same join topology as the original. Spark
    * plan: one fact self-semi and one fact self-anti on orderkey
    * (both carry only (orderkey, suppkey) pairs), supplier+nation
    * broadcast at the end. */
  val q21WaitingSuppliers: QDef = q(
    "q21_waiting_suppliers",
    """WITH lo AS (
      |  SELECT l_orderkey, l_suppkey,
      |    date_diff('day', CAST(o_orderdate AS DATE),
      |      CAST(l_shipdate AS DATE)) > 90 AS late
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F'),
      |l1 AS (SELECT l_orderkey, l_suppkey FROM lo WHERE late)
      |SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE EXISTS (
      |    SELECT 1 FROM lo l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lo l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name, n_name
      |ORDER BY numwait DESC, s_name""") { (s, d) =>
    val lo = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate").cast(DateType),
          col("o_orderdate").cast(DateType)) > 90).as("late"))
    // ONE width-explicit orderkey exchange feeds every leg (§2.4):
    // ReuseExchange shares it between l1 and the counting aggs, both
    // aggs plan exchange-free over it (o ⊆ each grouping key), and
    // the 550k-entry dedup hash builds run session-wide instead of
    // inside the single-split scan task.
    val lo2 = lo.repartition(s.sparkContext.defaultParallelism,
      col("l_orderkey"))
    val l1 = lo2.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey"))
    // r19 batch 3 (guide §2.3/§3): the EXISTS/NOT-EXISTS pair planned
    // two SMJs whose probe AND build sides each re-derived the
    // unpersisted lo join — three lineitem⋈orders passes plus two
    // 600k-row sort-merge legs. The classic Q21 counting form replaces
    // both: per order, d = distinct suppliers and dl = distinct LATE
    // suppliers; an l1 row (o, s) waits alone iff d ≥ 2 (some other
    // supplier exists) and dl = 1 (s itself is late, so the single
    // late supplier IS s — no other late one). Exact set identities,
    // duplicate l1 rows keep their per-line contribution to numwait.
    // ord is bounded by |F-orders|; the broadcast holds to ~SF 1k at
    // ~16 B/row — beyond that drop the hint for the shuffle semi (the
    // q17/xyz broadcast-ceiling convention).
    val g = lo2.groupBy(col("l_orderkey").as("go"), col("l_suppkey"))
      .agg(max(col("late")).as("any_late"))
    val ord = g.groupBy(col("go"))
      .agg(count(lit(1)).as("d"),
        sum(col("any_late").cast(LongType)).as("dl"))
      .filter(col("d") >= 2 && col("dl") === 1)
      .select(col("go"))
    val waited = l1.join(broadcast(ord),
      col("l_orderkey") === col("go"), "left_semi")
    val supp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    waited.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** Inline k-row integer table (the R14 threshold-table idiom):
    * union of 1-row ranges — broadcast-sized, no implicits. */
  private def intTable(s: SparkSession, name: String, vs: Seq[Int]): DataFrame =
    vs.map(v => s.range(1).select(lit(v).as(name))).reduce(_ unionAll _)

  /** k-anonymity audit (r15) — the privacy gate a training-data
    * release runs before shipping user-derived tables: how many
    * quasi-identifier groups would re-identify members at k. QI =
    * (nation, market segment, $1000 account-balance bucket) over
    * customer; for k ∈ {2, 5, 10} (broadcast 3-row table) the audit
    * reports group counts, sub-k groups, and rows at re-identification
    * risk in floor-ppm. The balance bucket is TRUNC division on both
    * sides (balances go negative; measured: DuckDB 1.0.0 integer `//`
    * truncates toward zero exactly like Spark `div`, so the bare
    * spellings are identical on every sign — negative balances land
    * in trunc buckets, a documented bucketing decision). One
    * group-sized agg; the k-sweep rides a broadcast. */
  val privacyKAnonymity: QDef = q(
    "privacy_k_anonymity",
    """WITH qi AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000
      |      AS bal_bucket,
      |    CAST(COUNT(*) AS BIGINT) AS grp_n
      |  FROM customer GROUP BY 1, 2, 3),
      |ks AS (SELECT * FROM (VALUES (2), (5), (10)) AS t(k))
      |SELECT CAST(k AS BIGINT) AS k,
      |  CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(SUM(CASE WHEN grp_n < k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_small_groups,
      |  CAST(SUM(CASE WHEN grp_n < k THEN grp_n ELSE 0 END) AS BIGINT)
      |    AS n_rows_at_risk,
      |  CAST(SUM(grp_n) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN grp_n < k THEN grp_n ELSE 0 END) * 1000000
      |    // SUM(grp_n) AS BIGINT) AS risk_ppm
      |FROM qi CROSS JOIN ks
      |GROUP BY k ORDER BY k""") { (s, d) =>
    val qi = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " div 100000 AS BIGINT)").as("bal_bucket"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(count(lit(1)).as("grp_n"))
    qi.crossJoin(broadcast(intTable(s, "k", Seq(2, 5, 10))))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_groups"),
        count_if(col("grp_n") < col("k")).as("n_small_groups"),
        sum(when(col("grp_n") < col("k"), col("grp_n")).otherwise(0L))
          .as("n_rows_at_risk"),
        sum(col("grp_n")).as("n_rows"))
      .select(col("k").cast(LongType).as("k"), col("n_groups"),
        col("n_small_groups"), col("n_rows_at_risk"), col("n_rows"),
        expr("CAST(n_rows_at_risk * 1000000 div n_rows AS BIGINT)")
          .as("risk_ppm"))
      .orderBy(col("k"))
  }

  /** l-diversity audit (r15) — k-anonymity's companion: a group can
    * be large yet leak if every member shares the same SENSITIVE
    * value. QI = (nation, market segment); sensitive = the order
    * priorities the group's members place. The report is the
    * distribution of l (distinct sensitive values per QI group, over
    * groups with ≥1 order): groups and order volume at each l, so the
    * "l = 1 means the group is fully disclosed" line is readable
    * directly. One fact join on custkey + two group-sized aggs. */
  val privacyLDiversity: QDef = q(
    "privacy_l_diversity",
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders JOIN customer ON c_custkey = o_custkey
      |  GROUP BY 1, 2)
      |SELECT l, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(SUM(n_orders) AS BIGINT) AS n_orders
      |FROM g GROUP BY l ORDER BY l""") { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderpriority"))
      .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(countDistinct(col("o_orderpriority")).as("l"),
        count(lit(1)).as("n_orders"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n_orders")).as("n_orders"))
      .orderBy(col("l"))
  }

  /** Sample-ratio-mismatch check (r15) — the first audit any A/B
    * readout runs: did the 50/50 randomization actually deliver
    * 50/50 units? Units are distinct event users; the variant is the
    * house md5-parity split (first hex digit ≤ '7' → A — exactly
    * 8/16 of hash space). χ² for the two-cell 50/50 test reduces to
    * (2a−n)²/n — graded in exact floor-micro units with the standard
    * 3.841459 (df=1, α=.05) threshold flag. n²·10⁶ stays far inside
    * int64 at any realistic unit count (10⁶ units → 10¹⁸); beyond
    * that the spelling swaps to the DECIMAL(38) fold like the stats
    * family. One distinct + one two-row agg. */
  val abSrmCheck: QDef = q(
    "ab_srm_check",
    """WITH u AS (
      |  SELECT DISTINCT user_id,
      |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
      |      THEN 'A' ELSE 'B' END AS variant
      |  FROM events),
      |c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM u)
      |SELECT v.variant,
      |  CASE WHEN v.variant = 'A' THEN a ELSE n - a END AS n_units,
      |  n AS n_total,
      |  CAST((2 * a - n) * (2 * a - n) * 1000000 // n AS BIGINT)
      |    AS chi2_micro,
      |  (2 * a - n) * (2 * a - n) * 1000000 // n > 3841459 AS srm_flag
      |FROM c CROSS JOIN (SELECT 'A' AS variant UNION ALL SELECT 'B') v
      |ORDER BY v.variant""") { (s, d) =>
    val u = Tables.events(s, d)
      .select(col("user_id")).distinct()
      .select(when(substring(md5(col("user_id").cast(StringType)), 1, 1) <= "7",
        "A").otherwise("B").as("variant"))
    val c = u.agg(
      count_if(col("variant") === "A").as("a"),
      count(lit(1)).as("n"))
    val vs = s.range(1).select(lit("A").as("variant"))
      .unionAll(s.range(1).select(lit("B").as("variant")))
    c.crossJoin(broadcast(vs))
      .select(col("variant"),
        when(col("variant") === "A", col("a"))
          .otherwise(col("n") - col("a")).as("n_units"),
        col("n").as("n_total"),
        expr("CAST((2*a - n) * (2*a - n) * 1000000 div n AS BIGINT)")
          .as("chi2_micro"),
        (expr("(2*a - n) * (2*a - n) * 1000000 div n") > 3841459L)
          .as("srm_flag"))
      .orderBy(col("variant"))
  }

  /** One-way ANOVA (r15) — the omnibus "do the group means differ"
    * test the stats family lacked (chi²/KS/U cover categorical and
    * two-sample shapes; ANOVA covers k-group means): value cents by
    * event type. Everything up to the final two ratios is exact:
    * per-group (n, Σx, Σx²) in BIGINT, SSW = Σ_g (n_g·Q_g − S_g²)/n_g
    * and SSB = Σ_g S_g²/n_g − T²/n graded in per-term FLOOR-milli
    * (every term nonnegative — Cauchy-Schwarz — so `div` ≡ `//`; the
    * one subtraction is clamped at 0 with greatest() in BOTH engines
    * since flooring can push an SSB≈0 a few milli negative). The big
    * products — INCLUDING the per-row square x·x (ADVICE r15) — ride
    * DECIMAL(38)/HUGEINT (the stats-family fold) and F/η² come
    * out in floor-ppm. One group agg + one k-row fold. */
  val statsAnovaF: QDef = q(
    "stats_anova_f",
    """WITH g AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS BIGINT) AS ng,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS sg,
      |    SUM(CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
      |          AS HUGEINT)
      |        * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS qg
      |  FROM events GROUP BY event_type),
      |f AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |    CAST(SUM(ng) AS BIGINT) AS n,
      |    CAST(SUM(sg) AS BIGINT) AS t,
      |    CAST(SUM((CAST(ng AS HUGEINT) * qg - CAST(sg AS HUGEINT) * sg)
      |      * 1000 // ng) AS BIGINT) AS ssw_milli,
      |    CAST(SUM(CAST(sg AS HUGEINT) * sg * 1000 // ng) AS BIGINT)
      |      AS sb_milli
      |  FROM g)
      |SELECT k, n, ssw_milli,
      |  greatest(sb_milli - CAST(CAST(t AS HUGEINT) * t * 1000 // n
      |    AS BIGINT), 0) AS ssb_milli,
      |  CAST(CAST(greatest(sb_milli - CAST(CAST(t AS HUGEINT) * t * 1000
      |        // n AS BIGINT), 0) AS HUGEINT)
      |      * (n - k) * 1000000 // (CAST(ssw_milli AS HUGEINT) * (k - 1))
      |    AS BIGINT) AS f_ppm,
      |  CAST(CAST(greatest(sb_milli - CAST(CAST(t AS HUGEINT) * t * 1000
      |        // n AS BIGINT), 0) AS HUGEINT) * 1000000
      |      // (greatest(sb_milli - CAST(CAST(t AS HUGEINT) * t * 1000
      |          // n AS BIGINT), 0) + ssw_milli)
      |    AS BIGINT) AS eta2_ppm
      |FROM f""") { (s, d) =>
    val cents = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"
    val g = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ng"),
        sum(expr(cents)).as("sg"),
        // per-row square rides DECIMAL(38)/HUGEINT like the
        // group-level products (ADVICE r15): bare BIGINT·BIGINT
        // overflows above ~3.0e9 cents per value
        sum(expr(s"CAST($cents AS DECIMAL(38,0)) * $cents")).as("qg"))
    val f = g.agg(
      count(lit(1)).as("k"),
      sum(col("ng")).as("n"),
      sum(col("sg")).as("t"),
      sum(expr("(CAST(ng AS DECIMAL(38,0)) * qg - CAST(sg AS DECIMAL(38,0))" +
        " * sg) * 1000 div ng")).cast(LongType).as("ssw_milli"),
      sum(expr("CAST(sg AS DECIMAL(38,0)) * sg * 1000 div ng"))
        .cast(LongType).as("sb_milli"))
    f.select(col("k"), col("n"), col("ssw_milli"),
        expr("greatest(sb_milli - CAST(CAST(t AS DECIMAL(38,0)) * t * 1000" +
          " div n AS BIGINT), 0)").as("ssb_milli"))
      .select(col("k"), col("n"), col("ssw_milli"), col("ssb_milli"),
        expr("CAST(CAST(ssb_milli AS DECIMAL(38,0)) * (n - k) * 1000000" +
          " div (CAST(ssw_milli AS DECIMAL(38,0)) * (k - 1)) AS BIGINT)")
          .as("f_ppm"),
        expr("CAST(CAST(ssb_milli AS DECIMAL(38,0)) * 1000000" +
          " div (ssb_milli + ssw_milli) AS BIGINT)").as("eta2_ppm"))
  }

  /** Score-calibration bins (r15) — the model-monitoring reliability
    * table: a monotone "predicted probability" (order-date position
    * inside the observed date span, exact floor-ppm — a stand-in for
    * any model score already materialized as a column) binned into 10
    * fixed-width buckets against the binary outcome "order finished"
    * (status F). Per bin: volume, mean score, observed positive rate,
    * signed calibration gap (no division — exact), and the Brier
    * contribution in (ppm)² scale. Span bounds come from a 1-row
    * broadcast agg, so the pass is one scan + one 10-row agg;
    * `eval_gains_capture` grades ranking power, this grades
    * probability CALIBRATION — the two failure modes are
    * independent. */
  val evalCalibrationBins: QDef = q(
    "eval_calibration_bins",
    """WITH b AS (
      |  SELECT CAST(MIN(o_orderdate) AS DATE) AS mn,
      |    date_diff('day', CAST(MIN(o_orderdate) AS DATE),
      |      CAST(MAX(o_orderdate) AS DATE)) AS span
      |  FROM orders),
      |sc AS (
      |  SELECT
      |    date_diff('day', mn, CAST(o_orderdate AS DATE)) * 1000000 // span
      |      AS p_ppm,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders CROSS JOIN b)
      |SELECT least(p_ppm // 100000, 9) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS mean_p_ppm,
      |  CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm,
      |  CAST(SUM(p_ppm) // COUNT(*)
      |    - SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS gap_ppm,
      |  CAST(SUM((p_ppm - y * 1000000) * (p_ppm - y * 1000000))
      |    // COUNT(*) AS BIGINT) AS brier_ppm2
      |FROM sc GROUP BY bin ORDER BY bin""") { (s, d) =>
    val b = Tables.orders(s, d)
      .agg(min(col("o_orderdate").cast(DateType)).as("mn"),
        datediff(max(col("o_orderdate").cast(DateType)),
          min(col("o_orderdate").cast(DateType))).as("span"))
    val sc = Tables.orders(s, d)
      .crossJoin(broadcast(b))
      .select(
        expr("CAST(datediff(CAST(o_orderdate AS DATE), mn) AS BIGINT)" +
          " * 1000000 div span").as("p_ppm"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    sc.groupBy(expr("least(p_ppm div 100000, 9)").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("p_ppm")).as("sp"), sum(col("y")).as("sy"),
        sum(expr("(p_ppm - y * 1000000) * (p_ppm - y * 1000000)")).as("sb"))
      .select(col("bin"), col("n"),
        expr("CAST(sp div n AS BIGINT)").as("mean_p_ppm"),
        expr("CAST(sy * 1000000 div n AS BIGINT)").as("pos_rate_ppm"),
        expr("CAST(sp div n - sy * 1000000 div n AS BIGINT)").as("gap_ppm"),
        expr("CAST(sb div n AS BIGINT)").as("brier_ppm2"))
      .orderBy(col("bin"))
  }

  /** Conditional-reset running sum (r15) — the window shape ledgers
    * and battery/quota meters need that no graded win_ key had: a
    * per-user running cents total that RESETS after every purchase
    * event. Segment number = count of purchases strictly BEFORE the
    * row (unbounded-preceding-to-1-preceding frame, so the purchase
    * row itself closes its segment), then the running sum restarts
    * inside each (user, segment) partition. Both windows are
    * user-partitioned — per-user state at any scale, never a global
    * funnel. */
  val winCumulativeReset: QDef = q(
    "win_cumulative_reset",
    """WITH e AS (
      |  SELECT event_id, user_id, ts,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      |  FROM events),
      |seg AS (
      |  SELECT event_id, user_id, ts, cents,
      |    COALESCE(SUM(is_p) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg_no
      |  FROM e)
      |SELECT event_id, user_id, CAST(seg_no AS BIGINT) AS seg_no,
      |  CAST(SUM(cents) OVER (PARTITION BY user_id, seg_no
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS run_cents
      |FROM seg ORDER BY user_id, event_id""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seg = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        (money(col("value")) * 100).cast(LongType).as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("is_p"))
      .select(col("event_id"), col("user_id"), col("ts"), col("cents"),
        coalesce(sum(col("is_p")).over(wPrev), lit(0L)).as("seg_no"))
    val wRun = Window.partitionBy(col("user_id"), col("seg_no"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg.select(col("event_id"), col("user_id"),
        col("seg_no").cast(LongType).as("seg_no"),
        sum(col("cents")).over(wRun).cast(LongType).as("run_cents"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Session-gap sensitivity sweep (r15) — the tuning table behind
    * `sessionize_events`' fixed 30-minute gap: session counts at gap
    * = 10/30/60 minutes from ONE user-partitioned lag+lead pass (a
    * session STARTS where the backward gap exceeds g; it is
    * single-event where the forward gap does too), swept via a
    * broadcast 3-row threshold table — the `corpus_dedup_impact_
    * curve` shape applied to sessionization. Events-per-session in
    * floor-milli. One window exchange total; the sweep multiplies
    * rows only inside the final group-sized agg. */
  val eventsSessionGapSweep: QDef = q(
    "events_session_gap_sweep",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events),
      |g AS (
      |  SELECT user_id,
      |    t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
      |      AS dtp,
      |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t
      |      AS dtn
      |  FROM e),
      |gaps AS (SELECT * FROM (VALUES (600), (1800), (3600)) AS t(gap_s))
      |SELECT CAST(gap_s AS BIGINT) AS gap_s,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN dtp IS NULL OR dtp > CAST(gap_s AS BIGINT) * 1000000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CASE WHEN (dtp IS NULL OR dtp > CAST(gap_s AS BIGINT) * 1000000)
      |    AND (dtn IS NULL OR dtn > CAST(gap_s AS BIGINT) * 1000000)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_single_event,
      |  CAST(COUNT(*) * 1000 // SUM(CASE WHEN dtp IS NULL
      |    OR dtp > CAST(gap_s AS BIGINT) * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS events_per_session_milli
      |FROM g CROSS JOIN gaps
      |GROUP BY gap_s ORDER BY gap_s""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val g = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .select(col("user_id"),
        (col("t") - lag(col("t"), 1).over(w)).as("dtp"),
        (lead(col("t"), 1).over(w) - col("t")).as("dtn"))
    g.crossJoin(broadcast(intTable(s, "gap_s", Seq(600, 1800, 3600))))
      .groupBy(col("gap_s"))
      .agg(count(lit(1)).as("n_events"),
        count_if(col("dtp").isNull || col("dtp") > col("gap_s") * 1000000L)
          .as("n_sessions"),
        count_if((col("dtp").isNull || col("dtp") > col("gap_s") * 1000000L)
            && (col("dtn").isNull || col("dtn") > col("gap_s") * 1000000L))
          .as("n_single_event"))
      .select(col("gap_s").cast(LongType).as("gap_s"), col("n_events"),
        col("n_sessions"), col("n_single_event"),
        expr("CAST(n_events * 1000 div n_sessions AS BIGINT)")
          .as("events_per_session_milli"))
      .orderBy(col("gap_s"))
  }

  /** Generalization ladder to k-anonymity (r15c) — the REMEDIATION
    * plan `privacy_k_anonymity` stops short of: per customer, the
    * minimal QI generalization level at which their group reaches
    * k = 5. Levels drop the most-identifying attribute in turn:
    * 0 = (nation, segment, $1000 trunc balance bucket), 1 = (nation,
    * segment), 2 = (nation), 3 = fully suppressed. The report is the
    * row distribution over minimal safe levels with floor-ppm shares
    * — the table a release reviewer reads to decide how much
    * generalization the export actually needs. Three group-sized
    * aggs, each joined back as a broadcast. */
  val privacyGeneralizationLadder: QDef = q(
    "privacy_generalization_ladder",
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey AS nat, c_mktsegment AS seg,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000
      |      AS bkt
      |  FROM customer),
      |g0 AS (SELECT nat, seg, bkt, CAST(COUNT(*) AS BIGINT) AS n0
      |  FROM c GROUP BY 1, 2, 3),
      |g1 AS (SELECT nat, seg, CAST(COUNT(*) AS BIGINT) AS n1
      |  FROM c GROUP BY 1, 2),
      |g2 AS (SELECT nat, CAST(COUNT(*) AS BIGINT) AS n2
      |  FROM c GROUP BY 1),
      |lv AS (
      |  SELECT CASE WHEN n0 >= 5 THEN 0 WHEN n1 >= 5 THEN 1
      |    WHEN n2 >= 5 THEN 2 ELSE 3 END AS level
      |  FROM c
      |  JOIN g0 USING (nat, seg, bkt)
      |  JOIN g1 USING (nat, seg)
      |  JOIN g2 USING (nat)),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM customer)
      |SELECT CAST(level AS BIGINT) AS level,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(COUNT(*) * 1000000 // total AS BIGINT) AS share_ppm
      |FROM lv CROSS JOIN t
      |GROUP BY level, total ORDER BY level""") { (s, d) =>
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").as("nat"),
        col("c_mktsegment").as("seg"),
        expr("CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " div 100000 AS BIGINT)").as("bkt"))
    val g0 = c.groupBy(col("nat"), col("seg"), col("bkt"))
      .agg(count(lit(1)).as("n0"))
    val g1 = c.groupBy(col("nat").as("n1nat"), col("seg").as("n1seg"))
      .agg(count(lit(1)).as("n1"))
    val g2 = c.groupBy(col("nat").as("n2nat")).agg(count(lit(1)).as("n2"))
    val lv = c
      .join(broadcast(g0), Seq("nat", "seg", "bkt"))
      .join(broadcast(g1),
        col("nat") === col("n1nat") && col("seg") === col("n1seg"))
      .join(broadcast(g2), col("nat") === col("n2nat"))
      .select(when(col("n0") >= 5, 0).when(col("n1") >= 5, 1)
        .when(col("n2") >= 5, 2).otherwise(3).as("level"))
    // total from the BASE table, not from lv: the inner joins preserve
    // every customer row (group keys come from the same table), and a
    // count over lv would re-run the whole three-agg join tree a
    // second time just to produce one number
    val t = Tables.customer(s, d).agg(count(lit(1)).as("total"))
    lv.crossJoin(broadcast(t))
      .groupBy(col("level"), col("total"))
      .agg(count(lit(1)).as("n_customers"))
      .select(col("level").cast(LongType).as("level"), col("n_customers"),
        expr("CAST(n_customers * 1000000 div total AS BIGINT)")
          .as("share_ppm"))
      .orderBy(col("level"))
  }

  /** Multimodal pyramid plan (r15c) — the pre-decode resolution
    * ladder an image-ingest pipeline materializes BEFORE touching
    * pixels: for each image's (w, h) metadata (the
    * `multimodal_image_tiles` synthetic meta), how many ceil-halvings
    * until max(w, h) ≤ 64, and every level's exact dimensions and
    * pixel count. The level count is EXACT dyadic arithmetic, no
    * transcendentals: ceil-halving composes (ceil(ceil(a/2)/2) =
    * ceil(a/4)), so n_levels = len(bin((max-1) div 64)) and level-l
    * dims are ceil(w / 2^l) via shift-left — spellable identically in
    * both engines. Row-local throughout: one explode of ≤6 levels per
    * image, no shuffle until the presentation sort. */
  val multimodalPyramidPlan: QDef = q(
    "multimodal_pyramid_plan",
    """WITH meta AS (
      |  SELECT doc_id,
      |    CAST(640 + (doc_id % 5) * 160 AS BIGINT) AS w,
      |    CAST(480 + (doc_id % 7) * 120 AS BIGINT) AS h
      |  FROM documents),
      |m2 AS (
      |  SELECT doc_id, w, h,
      |    CASE WHEN greatest(w, h) <= 64 THEN 0
      |      ELSE length(bin((greatest(w, h) - 1) // 64)) END AS n_levels
      |  FROM meta),
      |lv AS (
      |  SELECT doc_id, w, h, n_levels, t.l AS level
      |  FROM m2, UNNEST(range(0, n_levels + 1)) AS t(l))
      |SELECT doc_id, CAST(level AS BIGINT) AS level,
      |  CAST(n_levels AS BIGINT) AS n_levels,
      |  (w + (1 << level) - 1) // (1 << level) AS lw,
      |  (h + (1 << level) - 1) // (1 << level) AS lh,
      |  ((w + (1 << level) - 1) // (1 << level))
      |    * ((h + (1 << level) - 1) // (1 << level)) AS px
      |FROM lv ORDER BY doc_id, level""") { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        (lit(640L) + (col("doc_id") % 5) * 160).as("w"),
        (lit(480L) + (col("doc_id") % 7) * 120).as("h"))
      .withColumn("n_levels",
        expr("CASE WHEN greatest(w, h) <= 64 THEN 0L" +
          " ELSE CAST(length(bin((greatest(w, h) - 1) div 64)) AS BIGINT)" +
          " END"))
      .select(col("doc_id"), col("w"), col("h"), col("n_levels"),
        explode(expr("sequence(0L, n_levels)")).as("level"))
      .select(col("doc_id"), col("level"), col("n_levels"),
        expr("(w + shiftleft(CAST(1 AS BIGINT), CAST(level AS INT)) - 1)" +
          " div shiftleft(CAST(1 AS BIGINT), CAST(level AS INT))").as("lw"),
        expr("(h + shiftleft(CAST(1 AS BIGINT), CAST(level AS INT)) - 1)" +
          " div shiftleft(CAST(1 AS BIGINT), CAST(level AS INT))").as("lh"))
      .withColumn("px", col("lw") * col("lh"))
      .select(col("doc_id"), col("level"), col("n_levels"), col("lw"),
        col("lh"), col("px"))
      .orderBy(col("doc_id"), col("level"))
  }

  /** Discount-cap what-if (r15c) — the pricing-policy simulation a
    * revenue team runs before changing discount ceilings: gross
    * revenue under caps of 0%/4%/8% (each line's discount clamped at
    * the cap) vs actual, from ONE lineitem pass swept by a broadcast
    * 3-row cap table. All-decimal exact tree (least() of two
    * DECIMAL(6,2)s, the q8 volume spelling) emitted once as DOUBLE;
    * recovered = capped − actual is computed on the exact decimals
    * BEFORE the float cast so the delta is itself exact. */
  val reportDiscountWhatif: QDef = q(
    "report_discount_whatif",
    """WITH caps AS (
      |  SELECT CAST(cap AS DECIMAL(6,2)) AS cap FROM (
      |    VALUES (0.00), (0.04), (0.08)) t(cap)),
      |x AS (
      |  -- CASE, not least(): DuckDB 1.0.0's least() over two DECIMALs
      |  -- returns DOUBLE (measured), which would break the exact tree
      |  SELECT CAST(cap * 100 AS BIGINT) AS cap_centi,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CASE WHEN CAST(l_discount AS DECIMAL(6,2)) < cap
      |          THEN CAST(l_discount AS DECIMAL(6,2)) ELSE cap END))
      |      AS rev_capped,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS rev_actual,
      |    CAST(SUM(CASE WHEN CAST(l_discount AS DECIMAL(6,2)) > cap
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
      |  FROM lineitem CROSS JOIN caps
      |  GROUP BY cap)
      |SELECT cap_centi, CAST(rev_capped AS DOUBLE) AS revenue_capped,
      |  CAST(rev_actual AS DOUBLE) AS revenue_actual,
      |  CAST(rev_capped - rev_actual AS DOUBLE) AS recovered,
      |  n_capped
      |FROM x ORDER BY cap_centi""") { (s, d) =>
    val caps = Seq("0.00", "0.04", "0.08")
      .map(v => s.range(1).select(
        lit(BigDecimal(v)).cast(DecimalType(6, 2)).as("cap")))
      .reduce(_ unionAll _)
    Tables.lineitem(s, d)
      .select(money(col("l_extendedprice")).as("price"),
        rate(col("l_discount")).as("disc"))
      .crossJoin(broadcast(caps))
      .groupBy((col("cap") * 100).cast(LongType).as("cap_centi"))
      .agg(sum(col("price") * (lit(1) - least(col("disc"), col("cap"))))
          .as("rev_capped"),
        sum(col("price") * (lit(1) - col("disc"))).as("rev_actual"),
        count_if(col("disc") > col("cap")).as("n_capped"))
      .select(col("cap_centi"),
        col("rev_capped").cast(DoubleType).as("revenue_capped"),
        col("rev_actual").cast(DoubleType).as("revenue_actual"),
        (col("rev_capped") - col("rev_actual")).cast(DoubleType)
          .as("recovered"),
        col("n_capped"))
      .orderBy(col("cap_centi"))
  }

  /** Dedup-threshold PR curve (r15d) — the eval that connects the
    * dedup and eval families: treat "LSH candidate with Jaccard ≥ t"
    * as a CLASSIFIER for the corpus's constructed duplication (same
    * 64-char text prefix — `dedup_prefix_cluster`'s notion, the
    * fixture's actual near-dup generator; exact md5 dups don't exist
    * below sf0.1) and grade its precision/recall/F1 at t = 50/70/90%
    * from ONE shared signature+candidate+verify pass (the
    * `corpus_dedup_impact_curve` machinery pointed at ground truth).
    * Truth-pair counts come from prefix group sizes (Σ C(n,2) —
    * never enumerated), true positives from the prefix-equality join
    * on the already-verified candidate pairs. Recall < 1 exposes
    * exactly the pairs banding+jaccard miss (prefix-dups whose tails
    * diverged); precision < 1 counts near-dups that do not share the
    * prefix — both are the honest numbers a dedup rollout reads.
    * F1 in floor-ppm via 2TP/(pred+truth) (no float division). The
    * threshold table left-joins the grouped counts, so a threshold no
    * candidate survives still emits its n_pred=0 row (ratios NULL
    * when their denominator is 0) — the curve never silently loses
    * thresholds on a sparser corpus. */
  val evalDedupPrCurve: QDef = q(
    "eval_dedup_pr_curve",
    s"""WITH ${LlmExtras.lshCtes},
      |dg AS (SELECT doc_id, substr(text, 1, 64) AS pfx FROM documents),
      |truth AS (
      |  SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_truth FROM (
      |    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dg GROUP BY pfx)),
      |scored AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |      / len(list_distinct(x.s || y.s)) AS jacc,
      |    da.pfx = db.pfx AS is_dup
      |  FROM cand c
      |  JOIN sets x ON x.doc_id = c.doc_a JOIN sets y ON y.doc_id = c.doc_b
      |  JOIN dg da ON da.doc_id = c.doc_a JOIN dg db ON db.doc_id = c.doc_b),
      |th AS (SELECT * FROM (VALUES (50), (70), (90)) t(t)),
      |pr AS (
      |  SELECT t AS pt, CAST(COUNT(*) AS BIGINT) AS p_pred,
      |    CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS p_tp
      |  FROM scored CROSS JOIN th
      |  WHERE jacc >= t / 100.0
      |  GROUP BY t),
      |fl AS (
      |  SELECT t, COALESCE(p_pred, 0) AS n_pred, COALESCE(p_tp, 0) AS n_tp
      |  FROM th LEFT JOIN pr ON pr.pt = th.t)
      |SELECT CAST(t AS BIGINT) AS threshold_pct, n_pred, n_tp, n_truth,
      |  CASE WHEN n_pred = 0 THEN CAST(NULL AS BIGINT)
      |    ELSE CAST(n_tp * 1000000 // n_pred AS BIGINT) END AS precision_ppm,
      |  CASE WHEN n_truth = 0 THEN CAST(NULL AS BIGINT)
      |    ELSE CAST(n_tp * 1000000 // n_truth AS BIGINT) END AS recall_ppm,
      |  CASE WHEN n_pred + n_truth = 0 THEN CAST(NULL AS BIGINT)
      |    ELSE CAST(2 * n_tp * 1000000 // (n_pred + n_truth) AS BIGINT) END
      |    AS f1_ppm
      |FROM fl CROSS JOIN truth
      |ORDER BY threshold_pct""") { (s, d) =>
    val base = LlmExtras.shingleBase(s, d)
    val pairs = LlmExtras.exactJaccard(LlmExtras.bandCandidates(base), base)
    val dg = Tables.documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 64).as("pfx"))
    val truth = dg.groupBy(col("pfx")).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("n_truth"))
    val scored = pairs
      .join(dg.select(col("doc_id").as("doc_a"), col("pfx").as("pfx_a")),
        "doc_a")
      .join(dg.select(col("doc_id").as("doc_b"), col("pfx").as("pfx_b")),
        "doc_b")
      .select(col("jacc"), (col("pfx_a") === col("pfx_b")).as("is_dup"))
    // threshold table stays the LEFT side (ADVICE r15): a threshold
    // with zero surviving pairs must still emit its n_pred=0 row
    // (guarded NULL ratios) instead of silently vanishing from the
    // curve on a sparser corpus.
    val pr = scored.crossJoin(broadcast(intTable(s, "t", Seq(50, 70, 90))))
      .filter(col("jacc") >= col("t") / 100.0)
      .groupBy(col("t").as("pt"))
      .agg(count(lit(1)).as("p_pred"), count_if(col("is_dup")).as("p_tp"))
    intTable(s, "t", Seq(50, 70, 90))
      .join(broadcast(pr), col("pt") === col("t"), "left")
      .select(col("t"), coalesce(col("p_pred"), lit(0L)).as("n_pred"),
        coalesce(col("p_tp"), lit(0L)).as("n_tp"))
      .crossJoin(broadcast(truth))
      .select(col("t").cast(LongType).as("threshold_pct"), col("n_pred"),
        col("n_tp"), col("n_truth"),
        expr("CASE WHEN n_pred = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE CAST(n_tp * 1000000 div n_pred AS BIGINT) END")
          .as("precision_ppm"),
        expr("CASE WHEN n_truth = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE CAST(n_tp * 1000000 div n_truth AS BIGINT) END")
          .as("recall_ppm"),
        expr("CASE WHEN n_pred + n_truth = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE CAST(2 * n_tp * 1000000 div (n_pred + n_truth) AS BIGINT)" +
          " END").as("f1_ppm"))
      .orderBy(col("threshold_pct"))
  }

  /** Capacity-backlog ledger (r15d) — the queueing simulation an ops
    * team runs against order arrivals: daily arrivals vs a per-year
    * ceil-mean daily capacity K, backlog via the LINDLEY recursion
    * b_d = max(0, b_{d−1} + a_d − K) — which is NOT windowable as
    * written, but its closed form b_d = S_d − K·d − min(0, min_{j≤d}
    * (S_j − K·j)) is: S jumps only on arrival days and S_j − K·j
    * falls by K on every empty day, so the inner min over ALL days is
    * the running min over arrival rows of (S_i − K·(next_day_i − 1)),
    * merged with the current row's own S_i − K·d_i AND the zero-sum
    * prefix run before the year's first arrival (slack −K·(first_d −
    * 1), which also subsumes the j=0 base case). Four
    * year-partitioned windows (running sum, lead, partition min,
    * running min) in one exchange — the
    * year boundary is the ledger reset, so no global funnel at any
    * scale. Pure BIGINT; the spec replays the recursion day by
    * day. */
  val opsCapacityBacklog: QDef = q(
    "ops_capacity_backlog",
    """WITH a AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(date_diff('day',
      |      CAST(CAST(year(o_orderdate) AS VARCHAR) || '-01-01' AS DATE),
      |      CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS arrivals
      |  FROM orders GROUP BY 1, 2),
      |yk AS (
      |  SELECT yr,
      |    CAST((SUM(arrivals) + CAST(date_diff('day',
      |        CAST(CAST(yr AS VARCHAR) || '-01-01' AS DATE),
      |        CAST(CAST(yr + 1 AS VARCHAR) || '-01-01' AS DATE)) AS BIGINT)
      |      - 1) // CAST(date_diff('day',
      |        CAST(CAST(yr AS VARCHAR) || '-01-01' AS DATE),
      |        CAST(CAST(yr + 1 AS VARCHAR) || '-01-01' AS DATE)) AS BIGINT)
      |      AS BIGINT) AS k
      |  FROM a GROUP BY yr),
      |w AS (
      |  SELECT a.yr, d, arrivals, k,
      |    SUM(arrivals) OVER (PARTITION BY a.yr ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
      |    lead(d) OVER (PARTITION BY a.yr ORDER BY d) AS next_d,
      |    min(d) OVER (PARTITION BY a.yr) AS first_d
      |  FROM a JOIN yk ON yk.yr = a.yr),
      |m AS (
      |  SELECT yr, d, arrivals, k, s, first_d,
      |    min(s - k * (COALESCE(next_d, d + 1) - 1)) OVER (
      |      PARTITION BY yr ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
      |  FROM w)
      |SELECT yr, d AS day_of_year, arrivals, k AS capacity,
      |  CAST(s - k * d - least(-k * (first_d - 1),
      |    CASE WHEN prev_min IS NULL OR s - k * d < prev_min
      |      THEN s - k * d ELSE prev_min END) AS BIGINT) AS backlog
      |FROM m ORDER BY yr, d""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val a = Tables.orders(s, d)
      .select(year(col("o_orderdate")).cast("int").as("yr"),
        (datediff(col("o_orderdate").cast(DateType),
          expr("CAST(CAST(year(o_orderdate) AS STRING) || '-01-01' AS DATE)"))
          + 1).cast(LongType).as("d"))
      .groupBy(col("yr"), col("d")).agg(count(lit(1)).as("arrivals"))
    val yk = a.groupBy(col("yr").as("kyr"))
      .agg(sum(col("arrivals")).as("tot"))
      .select(col("kyr"),
        expr("CAST((tot + CAST(datediff(" +
          "CAST(CAST(kyr + 1 AS STRING) || '-01-01' AS DATE)," +
          "CAST(CAST(kyr AS STRING) || '-01-01' AS DATE)) AS BIGINT) - 1)" +
          " div CAST(datediff(" +
          "CAST(CAST(kyr + 1 AS STRING) || '-01-01' AS DATE)," +
          "CAST(CAST(kyr AS STRING) || '-01-01' AS DATE)) AS BIGINT)" +
          " AS BIGINT)").as("k"))
    val wOrd = Window.partitionBy(col("yr")).orderBy(col("d"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    a.join(broadcast(yk), col("yr") === col("kyr"))
      .select(col("yr"), col("d"), col("arrivals"), col("k"),
        sum(col("arrivals")).over(wRun).as("s"),
        lead(col("d"), 1).over(wOrd).as("next_d"),
        // the empty prefix before the year's FIRST arrival is itself
        // a zero-sum run whose end slack -k*(first_d - 1) must join
        // the min, or a late first arrival under-reports its backlog
        min(col("d")).over(Window.partitionBy(col("yr"))).as("first_d"))
      .select(col("yr"), col("d"), col("arrivals"), col("k"), col("s"),
        col("first_d"),
        min(col("s") - col("k") * (coalesce(col("next_d"), col("d") + 1) - 1))
          .over(wPrev).as("prev_min"))
      .select(col("yr"), col("d").as("day_of_year"), col("arrivals"),
        col("k").as("capacity"),
        expr("s - k * d - least(-k * (first_d - 1)," +
          " CASE WHEN prev_min IS NULL OR s - k * d < prev_min" +
          " THEN s - k * d ELSE prev_min END)").as("backlog"))
      .orderBy(col("yr"), col("day_of_year"))
  }

  /** Brown–Forsythe / Levene test (r15d) — `stats_anova_f` asks "do
    * the means differ", this asks "do the SPREADS differ" (the
    * variance-homogeneity check that decides whether ANOVA's
    * assumption even holds): the same F statistic computed over
    * z = |x − median_g|, with the group median rank-selected exactly
    * (lower median, the `agg_quantiles_exact` convention) so z stays
    * pure BIGINT. Identical DECIMAL(38)/HUGEINT fold as the ANOVA
    * key; one extra group-partitioned rank window to select
    * medians. */
  val statsLeveneBf: QDef = q(
    "stats_levene_bf",
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
      |  FROM events),
      |r AS (
      |  SELECT event_type, x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY x, event_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |med AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = (n - 1) * 5 // 10 + 1 THEN x END) AS med
      |  FROM r GROUP BY event_type),
      |z AS (
      |  SELECT e.event_type, abs(e.x - med) AS z
      |  FROM e JOIN med ON med.event_type = e.event_type),
      |g AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
      |    CAST(SUM(z) AS BIGINT) AS sg,
      |    SUM(CAST(z AS HUGEINT) * z) AS qg
      |  FROM z GROUP BY event_type),
      |f AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |    CAST(SUM(ng) AS BIGINT) AS n,
      |    CAST(SUM(sg) AS BIGINT) AS t,
      |    CAST(SUM((CAST(ng AS HUGEINT) * qg - CAST(sg AS HUGEINT) * sg)
      |      * 1000 // ng) AS BIGINT) AS ssw_milli,
      |    CAST(SUM(CAST(sg AS HUGEINT) * sg * 1000 // ng) AS BIGINT)
      |      AS sb_milli
      |  FROM g)
      |SELECT k, n, ssw_milli,
      |  greatest(sb_milli - CAST(CAST(t AS HUGEINT) * t * 1000 // n
      |    AS BIGINT), 0) AS ssb_milli,
      |  CAST(CAST(greatest(sb_milli - CAST(CAST(t AS HUGEINT) * t * 1000
      |        // n AS BIGINT), 0) AS HUGEINT)
      |      * (n - k) * 1000000 // (CAST(ssw_milli AS HUGEINT) * (k - 1))
      |    AS BIGINT) AS f_ppm
      |FROM f""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        (money(col("value")) * 100).cast(LongType).as("x"))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("x"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val med = e
      .select(col("event_type"), col("x"),
        row_number().over(wOrd).as("rn"), count(lit(1)).over(wAll).as("n"))
      .groupBy(col("event_type").as("met"))
      .agg(max(when(col("rn") === expr("(n - 1) * 5 div 10 + 1"),
        col("x"))).as("med"))
    val g = e.join(broadcast(med), col("event_type") === col("met"))
      .select(col("event_type"), abs(col("x") - col("med")).as("z"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ng"), sum(col("z")).as("sg"),
        // per-row square in DECIMAL(38) — same any-scale posture as
        // the ANOVA key's qg (ADVICE r15)
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("qg"))
    val f = g.agg(
      count(lit(1)).as("k"),
      sum(col("ng")).as("n"),
      sum(col("sg")).as("t"),
      sum(expr("(CAST(ng AS DECIMAL(38,0)) * qg - CAST(sg AS DECIMAL(38,0))" +
        " * sg) * 1000 div ng")).cast(LongType).as("ssw_milli"),
      sum(expr("CAST(sg AS DECIMAL(38,0)) * sg * 1000 div ng"))
        .cast(LongType).as("sb_milli"))
    f.select(col("k"), col("n"), col("ssw_milli"),
        expr("greatest(sb_milli - CAST(CAST(t AS DECIMAL(38,0)) * t * 1000" +
          " div n AS BIGINT), 0)").as("ssb_milli"))
      .select(col("k"), col("n"), col("ssw_milli"), col("ssb_milli"),
        expr("CAST(CAST(ssb_milli AS DECIMAL(38,0)) * (n - k) * 1000000" +
          " div (CAST(ssw_milli AS DECIMAL(38,0)) * (k - 1)) AS BIGINT)")
          .as("f_ppm"))
  }

  /** Shard planning FROM the sketch (r15e) — the production half of
    * the pair: `shard_range_boundaries` computes exact boundaries
    * from full-table ranks (the audit-tier pass); at 100 TB a layout
    * writer plans from the merged KMV sample instead and never ranks
    * the table. This key does exactly that — boundaries = the merged
    * bottom-64 sample's every-4th-rank (cents, key) pairs → 16
    * intervals broadcast onto one scan (map-side-combining 16-group
    * agg; no full-cardinality shuffle anywhere) — and then audits the
    * resulting shard balance EXACTLY: rows per planned shard,
    * floor-ppm share, signed deviation from the ideal 1/16. The
    * deviation column IS the sketch-quality number a writer reads
    * before trusting approximate planning. Interval bounds are
    * lexicographic (cents, key) pairs so ties split exactly as the
    * sample ranks did. */
  val shardPlanFromSketch: QDef = q(
    "shard_plan_from_sketch",
    s"""WITH $kmvSampleCtes,
      |bd AS (SELECT r // 4 AS i, cents AS bc, k AS bk FROM sr
      |  WHERE r % 4 = 0 AND r < 64),
      |sh AS (SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7),
      |  (8), (9), (10), (11), (12), (13), (14), (15)) t(s)),
      |iv AS (
      |  SELECT CAST(s AS BIGINT) AS shard_no,
      |    lo.bc AS lo_c, lo.bk AS lo_k, hi.bc AS hi_c, hi.bk AS hi_k
      |  FROM sh
      |  LEFT JOIN bd lo ON lo.i = s
      |  LEFT JOIN bd hi ON hi.i = s + 1),
      |asg AS (
      |  SELECT shard_no, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    MIN(cents) AS min_cents, MAX(cents) AS max_cents
      |  FROM u JOIN iv
      |    ON (lo_c IS NULL OR lo_c < cents OR (lo_c = cents AND lo_k <= k))
      |    AND (hi_c IS NULL OR cents < hi_c OR (cents = hi_c AND k < hi_k))
      |  GROUP BY shard_no)
      |SELECT shard_no, n_rows, min_cents, max_cents,
      |  CAST(n_rows * 1000000 // n AS BIGINT) AS share_ppm,
      |  CAST(n_rows * 1000000 // n AS BIGINT) - 62500 AS dev_ppm
      |FROM asg CROSS JOIN n
      |ORDER BY shard_no""") { (s, d) =>
    val ks = kmvSample(s, d, persistU = false)
    val u = ks.u; val nDf = ks.n; val sr = ks.sr
    val bd = sr.filter(expr("r % 4 = 0 AND r < 64"))
      .select(expr("r div 4").as("i"), col("cents").as("bc"), col("k").as("bk"))
    val iv = intTable(s, "s", 0 to 15)
      .join(broadcast(bd.select(col("i").as("lo_i"), col("bc").as("lo_c"),
        col("bk").as("lo_k"))), col("lo_i") === col("s"), "left")
      .join(broadcast(bd.select(col("i").as("hi_i"), col("bc").as("hi_c"),
        col("bk").as("hi_k"))), col("hi_i") === col("s") + 1, "left")
      .select(col("s").cast(LongType).as("shard_no"), col("lo_c"),
        col("lo_k"), col("hi_c"), col("hi_k"))
    u.join(broadcast(iv),
        (col("lo_c").isNull || col("lo_c") < col("cents") ||
          (col("lo_c") === col("cents") && col("lo_k") <= col("k"))) &&
        (col("hi_c").isNull || col("cents") < col("hi_c") ||
          (col("cents") === col("hi_c") && col("k") < col("hi_k"))))
      .groupBy(col("shard_no"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .crossJoin(broadcast(nDf))
      .select(col("shard_no"), col("n_rows"), col("min_cents"),
        col("max_cents"),
        expr("CAST(n_rows * 1000000 div n AS BIGINT)").as("share_ppm"),
        (expr("CAST(n_rows * 1000000 div n AS BIGINT)") - 62500)
          .as("dev_ppm"))
      .orderBy(col("shard_no"))
  }

  /** Order-independent table checksums (r15f) — the replication /
    * migration reconciliation primitive: per table, a checksum that
    * any replica can recompute without ordering guarantees. Row hash
    * = first 15 md5 hex digits of the '|'-joined canonical column
    * rendering (ints, strings, cents, ISO dates — every piece
    * engine-identical), table checksum = Σ row-hash mod the largest
    * prime < 2^63 (the sum rides DECIMAL(38)/HUGEINT so the spelling
    * holds at ANY row count, and modular addition is the MERGE: shard
    * partials sum to the same value in any grouping — the property a
    * cross-cluster reconciliation actually uses). One scan + one
    * 1-row fold per table. */
  val dqTableChecksum: QDef = q(
    "dq_table_checksum",
    """WITH o AS (
      |  SELECT ('0x' || substr(md5(
      |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
      |      || '|' || o_orderstatus || '|' || o_orderpriority || '|'
      |      || CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           AS VARCHAR)
      |      || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
      |    ), 1, 15))::BIGINT AS h
      |  FROM orders),
      |c AS (
      |  SELECT ('0x' || substr(md5(
      |      CAST(c_custkey AS VARCHAR) || '|' || c_name || '|'
      |      || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
      |    ), 1, 15))::BIGINT AS h
      |  FROM customer),
      |s AS (
      |  SELECT ('0x' || substr(md5(
      |      CAST(s_suppkey AS VARCHAR) || '|' || s_name || '|'
      |      || CAST(s_nationkey AS VARCHAR)
      |    ), 1, 15))::BIGINT AS h
      |  FROM supplier),
      |u AS (
      |  SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(h AS HUGEINT)) % 9223372036854775783 AS BIGINT)
      |      AS checksum FROM o
      |  UNION ALL SELECT 'customer', CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(CAST(h AS HUGEINT)) % 9223372036854775783 AS BIGINT)
      |    FROM c
      |  UNION ALL SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(CAST(h AS HUGEINT)) % 9223372036854775783 AS BIGINT)
      |    FROM s)
      |SELECT table_name, n_rows, checksum FROM u ORDER BY table_name""") {
    (s, d) =>
    val P = "9223372036854775783"
    def ck(df: DataFrame, name: String, rendering: String): DataFrame =
      df.select(conv(substring(md5(expr(rendering)), 1, 15), 16, 10)
          .cast(LongType).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr(s"CAST(CAST(sum(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))" +
            s" % $P AS BIGINT)").as("checksum"))
        .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
    ck(Tables.orders(s, d), "orders",
        "CAST(o_orderkey AS STRING) || '|' || CAST(o_custkey AS STRING)" +
        " || '|' || o_orderstatus || '|' || o_orderpriority || '|'" +
        " || CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)" +
        " AS STRING)" +
        " || '|' || CAST(CAST(o_orderdate AS DATE) AS STRING)")
      .unionAll(ck(Tables.customer(s, d), "customer",
        "CAST(c_custkey AS STRING) || '|' || c_name || '|'" +
        " || CAST(c_nationkey AS STRING) || '|' || c_mktsegment"))
      .unionAll(ck(Tables.supplier(s, d), "supplier",
        "CAST(s_suppkey AS STRING) || '|' || s_name || '|'" +
        " || CAST(s_nationkey AS STRING)"))
      .orderBy(col("table_name"))
  }

  /** XML ingestion surface (r15f) — the `fn_map_json` twin for XML:
    * per-order XML fragments (built from base columns — the fixture
    * has no XML source, so the op grades the PARSE path round-trip)
    * parsed back with Spark's native from_xml, fields extracted and
    * re-aggregated. The oracle computes the identical aggregate from
    * the base columns directly (DuckDB 1.0.0 has no XML reader) —
    * any from_xml extraction drift (type coercion, whitespace,
    * escaping) breaks the hash. The string field is XML-escaped when
    * the fragment is built (&amp; &lt; &gt;, in that order) and
    * from_xml unescapes it on the way back, so the round trip holds
    * for ARBITRARY fixture strings — not just the current
    * '1-URGENT'..'5-LOW' values (ADVICE r15: a plain concat would
    * have made any '&'/'<' silently parse to NULL and diverge from
    * the base-column oracle). */
  val fnXmlParse: QDef = q(
    "fn_xml_parse",
    """SELECT o_orderpriority AS priority,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS sum_cents
      |FROM orders GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val xml = Tables.orders(s, d)
      .select(concat(lit("<o><k>"), col("o_orderkey"),
        lit("</k><p>"),
        expr("replace(replace(replace(o_orderpriority," +
          " '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"),
        lit("</p><c>"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType),
        lit("</c></o>")).as("x"))
    val parsed = xml.select(from_xml(col("x"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", LongType),
        org.apache.spark.sql.types.StructField("p", StringType),
        org.apache.spark.sql.types.StructField("c", LongType)))).as("v"))
    parsed.groupBy(col("v.p").as("priority"))
      .agg(count(lit(1)).as("n"), sum(col("v.k")).as("sum_keys"),
        sum(col("v.c")).as("sum_cents"))
      .orderBy(col("priority"))
  }

  /** VARIANT ingestion surface (r15f) — Spark 4's semi-structured
    * type, graded end-to-end: events.props JSON parsed to VARIANT
    * with parse_json, the 'k' field extracted back with variant_get
    * (typed path), aggregated per event type. `fn_map_json` grades
    * the from_json/schema path; this grades the schemaless VARIANT
    * path a lakehouse ingest actually uses for evolving payloads. The
    * oracle reads the same field with DuckDB's json_extract. Output
    * is flat scalars only (VARIANT itself never reaches the
    * output). */
  val fnVariantJson: QDef = q(
    "fn_variant_json",
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS sum_k,
      |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS min_k,
      |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** All round-15 graded queries, in registry order. */
  val all: Seq[QDef] = Seq(
    sketchQuantileMerge, sketchHeavyHittersMerge,
    q9ProductProfit, q21WaitingSuppliers,
    privacyKAnonymity, privacyLDiversity, abSrmCheck, statsAnovaF,
    evalCalibrationBins, winCumulativeReset, eventsSessionGapSweep,
    privacyGeneralizationLadder, multimodalPyramidPlan,
    reportDiscountWhatif,
    evalDedupPrCurve, opsCapacityBacklog, statsLeveneBf,
    shardPlanFromSketch,
    dqTableChecksum, fnXmlParse, fnVariantJson)
}
