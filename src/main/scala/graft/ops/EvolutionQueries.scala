package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import graft.pipeline.Evolution
import graft.Protocol._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-graded execution of the dataset-evolution pipeline
  * (graft.pipeline.Evolution) — merge/upsert, snapshot diff, and SCD2
  * history verified cross-engine, not just spec'd. The fixture tables
  * are immutable, so each query derives its "mutation" input
  * deterministically from the data itself (modified rows by key
  * modulus, snapshots by date cutoff, change events from the event
  * stream). */
object EvolutionQueries {

  /** MERGE/upsert: every 10th customer gets a balance bump (update),
    * every 97th spawns a synthetic new account (insert); the graded
    * output is the merged book aggregated per segment. One full outer
    * join on the key — bucket both sides on it at 100 TB and the
    * shuffle disappears (graft.sources.Bucketing). */
  val mergeUpsertCustomers: QDef = q(
    "merge_upsert_customers",
    """WITH target AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
      |upd AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEWSEG', 0.0
      |  FROM customer WHERE c_custkey % 97 = 0),
      |merged AS (
      |  SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
      |    COALESCE(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment,
      |    COALESCE(u.c_acctbal, t.c_acctbal) AS c_acctbal
      |  FROM target t FULL JOIN upd u ON t.c_custkey = u.c_custkey)
      |SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      |FROM merged GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""") { (s, d) =>
    val target = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val updates = Tables.customer(s, d)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_acctbal") + 100.0).as("c_acctbal"))
      .union(Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          lit("NEWSEG").as("c_mktsegment"), lit(0.0).as("c_acctbal")))
    Evolution.merge(target, updates, "c_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c_acctbal").cast(DecimalType(18, 4)))
          .cast(DoubleType).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Snapshot diff between two as-of views of per-customer order
    * state (count + exact decimal total): customers whose first order
    * lands between the cutoffs show as `added`, customers with more
    * orders as `changed`; unchanged keys are omitted. The struct
    * equality inside Evolution.diff and the column-wise CASE in the
    * oracle are the same predicate. */
  val snapshotDiffOrders: QDef = q(
    "snapshot_diff_orders",
    """WITH b AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      |  GROUP BY o_custkey),
      |a AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  GROUP BY o_custkey)
      |SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
      |  CASE WHEN b.o_custkey IS NULL THEN 'added'
      |       WHEN a.o_custkey IS NULL THEN 'removed'
      |       WHEN a.n_orders <> b.n_orders OR a.total <> b.total THEN 'changed'
      |  END AS change
      |FROM b FULL JOIN a ON a.o_custkey = b.o_custkey
      |WHERE (CASE WHEN b.o_custkey IS NULL THEN 'added'
      |       WHEN a.o_custkey IS NULL THEN 'removed'
      |       WHEN a.n_orders <> b.n_orders OR a.total <> b.total THEN 'changed'
      |  END) IS NOT NULL
      |ORDER BY o_custkey""") { (s, d) =>
    def snapshot(cutoff: String) = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(cutoff).cast(TimestampType))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).as("total"))
    Evolution.diff(
      snapshot("1995-07-01 00:00:00"), snapshot("1996-07-01 00:00:00"),
      "o_custkey")
      .orderBy(col("o_custkey"))
  }

  /** SCD2 history of each user's event-type "state": consecutive
    * repeats collapse, every transition opens a validity interval
    * closed by the next one. event_id is the unique, time-ordered
    * version key (FIXTURES.md: events are ordered by event_id
    * ascending in ts), so the lag/lead windows are tie-free by
    * construction. */
  val scd2EventState: QDef = q(
    "scd2_event_state",
    """WITH ch AS (
      |  SELECT user_id, event_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
      |  FROM events),
      |keep AS (
      |  SELECT user_id, event_id, event_type FROM ch
      |  WHERE prev IS NULL OR event_type <> prev)
      |SELECT user_id, event_type, event_id AS valid_from,
      |  LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
      |  CAST(LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
      |    AS INT) AS is_current
      |FROM keep
      |ORDER BY user_id, valid_from""") { (s, d) =>
    val events = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
    Evolution.scd2(events, "user_id", "event_id")
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("is_current").cast(IntegerType).as("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** CDC apply — fold an ordered insert/update/delete change log into
    * a base table with last-writer-wins semantics (the lakehouse
    * MERGE-from-changefeed staple, distinct from the plain upsert in
    * `merge_upsert_customers` because DELETEs and multi-version
    * updates are in play). The change log is derived deterministically
    * from the base via md5 buckets: buckets <30 get an UPDATE (+100),
    * <10 a second UPDATE (+200, must win), [30,40) a DELETE, [95,100)
    * an INSERT under a shifted key. One window per key (seq desc)
    * picks the surviving version; graded as the final per-priority
    * state plus applied-op counts. */
  val cdcApplyOrders: QDef = q(
    "cdc_apply_orders",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS prio,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS price,
      |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::INT % 100 AS b
      |  FROM orders),
      |log AS (
      |  SELECT k, prio, CAST(price + 100 AS DECIMAL(12,2)) AS price,
      |         1 AS seq, 'U' AS op FROM base WHERE b < 30
      |  UNION ALL
      |  SELECT k, prio, CAST(price + 200 AS DECIMAL(12,2)), 2, 'U'
      |  FROM base WHERE b < 10
      |  UNION ALL
      |  SELECT k, prio, price, 1, 'D' FROM base WHERE b >= 30 AND b < 40
      |  UNION ALL
      |  SELECT k + 10000000, prio, price, 1, 'I' FROM base WHERE b >= 95),
      |all_v AS (
      |  SELECT k, prio, price, 0 AS seq, 'I' AS op FROM base
      |  UNION ALL
      |  SELECT k, prio, price, seq, op FROM log),
      |latest AS (
      |  SELECT k, prio, price, op,
      |    row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      |  FROM all_v),
      |final AS (SELECT k, prio, price FROM latest WHERE rn = 1 AND op <> 'D')
      |SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(price) AS DOUBLE) AS sum_price
      |FROM final GROUP BY prio
      |ORDER BY prio""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("price"),
        (conv(substring(md5(col("o_orderkey").cast(StringType)), 1, 4), 16, 10)
          .cast(IntegerType) % 100).as("b"))
    // r7: the five changefeed branches synthesize in ONE scan pass —
    // the union-of-filters form re-read the parquet and recomputed
    // the md5 routing hash once PER BRANCH (5x the scan and 5x the
    // hashing for the same rows). Each base row now emits its five
    // candidate log records through one row-local explode (array of
    // like-typed structs, all codegen — no higher-order lambda).
    // r11 (bench-noise damping, VERDICT r10 item 1): conditional
    // records are built under `when(cond, struct)` — null, not a fully
    // materialized struct-plus-keep-flag, when the condition is false.
    // Only ~1.55 of the 5 candidates survive per row on average, so
    // the old form allocated ~3.45 dead structs per base row just to
    // filter them out; this run the explode over the same 5-slot array
    // skips null slots via `r IS NOT NULL`. Row set and values are
    // identical, so the oracle (which keeps the UNION ALL spelling)
    // still hash-matches.
    def rec(k: org.apache.spark.sql.Column,
        seq: Int, op: String, price: org.apache.spark.sql.Column) =
      struct(k.as("k"), lit(seq).as("seq"), lit(op).as("op"),
        col("prio").as("prio"), price.cast(DecimalType(12, 2)).as("price"))
    val allV = base
      .select(explode(array(
        rec(col("k"), 0, "I", col("price")),
        when(col("b") < 30, rec(col("k"), 1, "U", col("price") + 100)),
        when(col("b") < 10, rec(col("k"), 2, "U", col("price") + 200)),
        when(col("b") >= 30 && col("b") < 40,
          rec(col("k"), 1, "D", col("price"))),
        when(col("b") >= 95,
          rec(col("k") + 10000000L, 1, "I", col("price"))))).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.k").as("k"), col("r.prio").as("prio"),
        col("r.price").as("price"), col("r.seq").as("seq"), col("r.op").as("op"))
    // last-writer-wins as a HASH AGGREGATE, not a window: seq is
    // unique per key, so max(struct(seq, …)) picks the surviving
    // version with map-side partial aggregation and no per-key sort —
    // the shape that scales to a billion-key changefeed. (The oracle
    // keeps the window spelling; same rows either way.)
    allV.groupBy(col("k"))
      .agg(max(struct(col("seq"), col("op"), col("prio"), col("price"))).as("v"))
      .filter(col("v.op") =!= "D")
      .groupBy(col("v.prio").as("prio"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v.price")).cast(DoubleType).as("sum_price"))
      .orderBy(col("prio"))
  }

  /** Point-in-time dimension join (r11c) — the query an SCD2 table
    * exists FOR: each purchase joined to the state interval in force
    * just before it (`valid_from < e ≤ valid_to`, open interval at
    * the current state). The oracle spells it as the range join a
    * warehouse user would write; the Spark side uses the as-of UNION
    * trick instead — state starts and probes merge into ONE per-user
    * window ordered by (position, probe-first), and three
    * IGNORE-NULLS lasts over the preceding frame carry the matched
    * run's (type, from, to). No range-join materialization, no
    * per-probe interval scan: one user exchange at any scale, the
    * same plan family as `join_asof_event`. A user's first event has
    * no prior state → NULLs (left-join semantics by construction). */
  val joinScd2Pointintime: QDef = q(
    "join_scd2_pointintime",
    """WITH ch AS (
      |  SELECT user_id, event_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
      |  FROM events),
      |keep AS (
      |  SELECT user_id, event_id, event_type FROM ch
      |  WHERE prev IS NULL OR event_type <> prev),
      |scd AS (
      |  SELECT user_id, event_type, event_id AS valid_from,
      |    LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to
      |  FROM keep),
      |p AS (SELECT user_id, event_id FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id,
      |  s.event_type AS prior_state, s.valid_from AS state_since,
      |  s.valid_to AS state_until
      |FROM p LEFT JOIN scd s
      |  ON p.user_id = s.user_id AND s.valid_from < p.event_id
      |  AND (p.event_id <= s.valid_to OR s.valid_to IS NULL)
      |ORDER BY p.event_id""") { (s, d) =>
    val events = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val scd = Evolution.scd2(events, "user_id", "event_id")
      .select(col("user_id"), col("valid_from").as("pos"), lit(1).as("kind"),
        col("event_type").as("st_type"), col("valid_from").as("st_from"),
        col("valid_to").as("st_to"))
    val probes = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pos"), lit(0).as("kind"),
        lit(null).cast(StringType).as("st_type"),
        lit(null).cast(LongType).as("st_from"),
        lit(null).cast(LongType).as("st_to"))
    // probes sort BEFORE the state start at the same position (kind
    // 0 < 1), so the preceding frame sees exactly the runs with
    // valid_from strictly below the probe — the `<` of the oracle's
    // range predicate, for free
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("pos"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, -1)
    scd.union(probes)
      .select(col("user_id"), col("pos"), col("kind"),
        last(col("st_type"), ignoreNulls = true).over(w).as("prior_state"),
        last(col("st_from"), ignoreNulls = true).over(w).as("state_since"),
        when(last(col("st_from"), ignoreNulls = true).over(w).isNotNull,
          last(when(col("kind") === 1, coalesce(col("st_to"), lit(Long.MaxValue))),
            ignoreNulls = true).over(w)).as("state_until_raw"))
      .filter(col("kind") === 0)
      .select(col("pos").as("event_id"), col("user_id"), col("prior_state"),
        col("state_since"),
        when(col("state_until_raw") === Long.MaxValue, lit(null).cast(LongType))
          .otherwise(col("state_until_raw")).as("state_until"))
      .orderBy(col("event_id"))
  }

  /** Deletion-cascade audit (r12) — the GDPR/right-to-be-forgotten
    * pass every production store needs: a deletion list (users with
    * user_id % 97 = 0 — in production, the request table) anti-joins
    * the fact, and the AUDIT — per event type: surviving rows/users,
    * deleted rows/users, surviving exact cents — is the graded
    * artifact, because a deletion you can't prove is a compliance
    * failure. The deletion list is distinct-key and broadcast; the
    * cascade is one anti-join pass over the fact at any scale. */
  val evolutionDeleteCascade: QDef = q(
    "evolution_delete_cascade",
    """WITH del AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
      |tagged AS (
      |  SELECT e.event_type,
      |    CAST(CAST(e.value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents,
      |    e.user_id, (del.user_id IS NOT NULL) AS doomed
      |  FROM events e LEFT JOIN del ON e.user_id = del.user_id)
      |SELECT event_type,
      |  CAST(SUM(CASE WHEN doomed THEN 0 ELSE 1 END) AS BIGINT) AS n_surviving,
      |  CAST(SUM(CASE WHEN doomed THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
      |  CAST(count(DISTINCT CASE WHEN NOT doomed THEN user_id END) AS BIGINT)
      |    AS users_surviving,
      |  CAST(count(DISTINCT CASE WHEN doomed THEN user_id END) AS BIGINT)
      |    AS users_deleted,
      |  CAST(SUM(CASE WHEN doomed THEN 0 ELSE cents END) AS BIGINT)
      |    AS surviving_cents
      |FROM tagged
      |GROUP BY event_type
      |ORDER BY event_type""") { (s, d) =>
    val e = Tables.events(s, d)
    val del = e.filter(col("user_id") % 97 === 0)
      .select(col("user_id").as("del_id")).distinct()
    e.join(broadcast(del), col("user_id") === col("del_id"), "left")
      .select(col("event_type"), col("user_id"),
        (qty(col("value")) * 100).cast(LongType).as("cents"),
        col("del_id").isNotNull.as("doomed"))
      .groupBy(col("event_type"))
      .agg(
        count_if(!col("doomed")).as("n_surviving"),
        count_if(col("doomed")).as("n_deleted"),
        countDistinct(when(!col("doomed"), col("user_id"))).as("users_surviving"),
        countDistinct(when(col("doomed"), col("user_id"))).as("users_deleted"),
        sum(when(col("doomed"), 0L).otherwise(col("cents"))).as("surviving_cents"))
      .orderBy(col("event_type"))
  }

  val all: Seq[QDef] = Seq(
    mergeUpsertCustomers, snapshotDiffOrders, scd2EventState, cdcApplyOrders,
    joinScd2Pointintime, evolutionDeleteCascade)
}
