package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Round-16 additions. Headline: incremental dedup-cluster
  * maintenance (VERDICT r15 item 2) — folding an increment's verified
  * near-dup pairs into a stored cluster map without recomputing
  * connected components over the corpus — plus further stats /
  * experimentation / eval / layout operators, all under the house
  * determinism protocol (exact integers end to end,
  * md5/modulo-deterministic membership, floor-ppm ratios spelled
  * identically in both engines). */
object R16Ops {


  /** md5-parity prior-snapshot membership — the
    * `dedup_incremental_snapshot` convention: ~half the corpus is the
    * "already ingested" prior, the rest is today's increment. */
  private def isPrior(id: Column): Column =
    substring(md5(id.cast(StringType)), 1, 1) <= "7"

  /** Incremental dedup-cluster maintenance (r16, VERDICT r15 item 2)
    * — the union-find upkeep a daily 100 TB dedup actually runs:
    * `dedup_cluster_cc` computes the corpus's duplicate clusters from
    * scratch; this key FOLDS an increment's verified near-dup pairs
    * into a STORED cluster map instead. Steps, all increment-sized
    * after the stored side is read:
    *
    *   1. stored prior map = CC over pairs among prior docs (stand-in
    *      for the persisted table a production run reads — built here
    *      because the fixture stores nothing);
    *   2. new edges = verified pairs with >= 1 increment endpoint
    *      (prior-prior pairs were all known at prior time);
    *   3. CONTRACT each new edge's endpoints through the stored map
    *      (prior doc -> its stored root, increment doc -> itself) —
    *      the quotient-graph trick that makes the merge loop run over
    *      roots + increment docs, never corpus nodes;
    *   4. CC over the contracted graph = which stored clusters merge
    *      and where the increment docs land;
    *   5. expand: every doc's new root = contracted-CC label of its
    *      contracted id (untouched clusters keep their root).
    *
    * Output = the full updated map with maintenance provenance:
    * cluster id (min doc_id — stored roots are min prior members, so
    * the contracted min IS the global min), cluster size, prior
    * membership, the stored map's root, and the `relabeled` flag
    * marking exactly the rows an incremental writer rewrites. The
    * oracle recomputes BOTH maps from scratch (two recursive CTEs),
    * so the grade IS the merge == full-recompute equality; the spec
    * additionally pins this key's map against the graded
    * `dedup_cluster_cc` output row-for-row. Scale: loop shuffles
    * follow pair counts (contracted graph <= increment edge count);
    * the corpus appears only in the stored-map read and the final
    * assembly join — per-increment cost follows increment-edge
    * incidence, not corpus size. */
  val dedupClusterIncremental: QDef = q(
    "dedup_cluster_incremental",
    s"""WITH RECURSIVE pairs AS (
       |${LlmExtras.dedupMinhashLsh.oracle.get}
       |),
       |par AS (
       |  SELECT doc_id,
       |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7' AS is_prior
       |  FROM documents),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs),
       |pedges AS (
       |  SELECT e.src, e.dst FROM edges e
       |  JOIN par a ON a.doc_id = e.src
       |  JOIN par b ON b.doc_id = e.dst
       |  WHERE a.is_prior AND b.is_prior),
       |reach(id, root) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
       |cc AS (
       |  SELECT id AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY id),
       |preach(id, root) AS (
       |  SELECT doc_id, doc_id FROM par WHERE is_prior
       |  UNION
       |  SELECT e.dst, r.root FROM preach r JOIN pedges e ON e.src = r.id),
       |pcc AS (
       |  SELECT id AS doc_id, MIN(root) AS prior_root FROM preach GROUP BY id)
       |SELECT c.doc_id, c.cluster_id,
       |  COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
       |  CAST(p.is_prior AS INT) AS was_prior,
       |  CASE WHEN p.is_prior THEN pc.prior_root END AS prior_cluster_id,
       |  CAST(p.is_prior AND pc.prior_root <> c.cluster_id AS INT) AS relabeled
       |FROM cc c
       |JOIN par p ON p.doc_id = c.doc_id
       |LEFT JOIN pcc pc ON pc.doc_id = c.doc_id
       |ORDER BY c.doc_id""") { (s, d) =>
    val pairsDeep = LlmExtras.minhashPairs(s, d)
      .select(col("doc_a"), col("doc_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairsDeep.count()
    val pairs = s.createDataFrame(pairsDeep.rdd, pairsDeep.schema)
    // loop shuffles sized from the measured pair count, like
    // dedup_cluster_cc (SINGLE-THREADED ASSUMPTION noted there:
    // session conf scoped around the loops, restored in finally)
    val sessionParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts =
      math.max(1, math.min(sessionParts, (nPairs / 50000L).toInt + 1))
    s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    val (pmap, endsRoot) = try {
      // 1. the "stored" prior map: CC over prior-prior edges
      val pe = pairs
        .filter(isPrior(col("doc_a")) && isPrior(col("doc_b")))
        .select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      pe.count()
      val pmap = graft.pipeline.ConnectedComponents
        .minLabel(s, pe, "dedup_cluster_incremental/prior")
      // 2.+3. increment edges contracted through the stored map
      // (increment ids never appear in pmap, so a bare coalesce maps
      // prior endpoints to their root and leaves increment ids alone)
      val ce = pairs
        .filter(!(isPrior(col("doc_a")) && isPrior(col("doc_b"))))
        .join(pmap.select(col("id").as("pa_id"), col("lbl").as("pa_lbl")),
          col("doc_a") === col("pa_id"), "left")
        .join(pmap.select(col("id").as("pb_id"), col("lbl").as("pb_lbl")),
          col("doc_b") === col("pb_id"), "left")
        .select(coalesce(col("pa_lbl"), col("doc_a")).as("ca"),
          coalesce(col("pb_lbl"), col("doc_b")).as("cb"))
        .select(explode(array(
          struct(col("ca").as("src"), col("cb").as("dst")),
          struct(col("cb").as("src"), col("ca").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      ce.count()
      // 4. the merge loop over the contracted graph
      val upd = graft.pipeline.ConnectedComponents
        .minLabel(s, ce, "dedup_cluster_incremental/merge")
      // 5. expand to every edge-touched doc: contracted id -> new root
      val ends = pairs
        .select(explode(array(col("doc_a"), col("doc_b"))).as("id"))
        .distinct()
      val endsRoot = ends
        .join(pmap.select(col("id").as("p_id"), col("lbl").as("p_lbl")),
          col("id") === col("p_id"), "left")
        .select(col("id"), coalesce(col("p_lbl"), col("id")).as("cr"))
        .join(upd.select(col("id").as("u_id"), col("lbl").as("u_lbl")),
          col("cr") === col("u_id"), "left")
        .select(col("id"), coalesce(col("u_lbl"), col("cr")).as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      endsRoot.count()
      (pmap, endsRoot)
    } finally s.conf.set("spark.sql.shuffle.partitions",
      sessionParts.toString)
    // sizes from the TINY label table (every member of a >=2-doc final
    // cluster is an edge endpoint by construction); docs outside it
    // are singletons of size 1 — same argument as dedup_cluster_cc
    val sized = endsRoot
      .join(endsRoot.groupBy(col("lbl").as("l2")).agg(count(lit(1)).as("sz")),
        col("lbl") === col("l2"))
      .select(col("id"), col("lbl"), col("sz"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(sized, col("doc_id") === col("id"), "left")
      .join(pmap.select(col("id").as("pm_id"), col("lbl").as("pm_lbl")),
        col("doc_id") === col("pm_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"),
        coalesce(col("sz"), lit(1L)).as("cluster_size"),
        isPrior(col("doc_id")).cast("int").as("was_prior"),
        when(isPrior(col("doc_id")),
          coalesce(col("pm_lbl"), col("doc_id"))).as("prior_cluster_id"),
        (isPrior(col("doc_id")) &&
          coalesce(col("pm_lbl"), col("doc_id")) =!=
            coalesce(col("lbl"), col("doc_id"))).cast("int").as("relabeled"))
      .orderBy(col("doc_id"))
  }

  /** Welch's two-sample t test (r16) — the unequal-variance mean
    * comparison the stats family lacked (`stats_anova_f` is k-group
    * pooled-variance; `stats_mannwhitney_u` is rank-based): purchase
    * vs click value cents. Per-arm (n, Σx, Σx²) exact with the
    * per-row square in DECIMAL(38)/HUGEINT, means and variances in
    * floor-micro, t² = Δmean²/se² in floor-micro via the DECIMAL(38)
    * fold (Δ can be negative; its square is not), Welch–Satterthwaite
    * df in floor-milli with its per-arm quotients floored to milli
    * BEFORE squaring (Spark's IntegralDivide returns BIGINT, so an
    * intermediate quotient must stay sub-int64 — DuckDB's HUGEINT //
    * is matched by flooring the same nonneg operands). `significant` uses the
    * df→∞ 95% bound z² = 3.841459 (the `ab_srm_check` constant) —
    * exact at event-table arm sizes. Operand bound: the 1e6 scaling
    * caps |value| at ~$3·10²³ before the DECIMAL(38) products clip —
    * any-scale for money. One 2-group agg + one 1-row fold. */
  val statsWelchT: QDef = q(
    "stats_welch_t",
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |g AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS s,
      |    SUM(CAST(x AS HUGEINT) * x) AS q
      |  FROM e GROUP BY event_type),
      |w AS (
      |  SELECT
      |    MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
      |    MAX(CASE WHEN event_type = 'purchase' THEN s END) AS s1,
      |    MAX(CASE WHEN event_type = 'purchase' THEN q END) AS q1,
      |    MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
      |    MAX(CASE WHEN event_type = 'click' THEN s END) AS s2,
      |    MAX(CASE WHEN event_type = 'click' THEN q END) AS q2
      |  FROM g),
      |m AS (
      |  SELECT n1, n2,
      |    CAST(s1 * 1000000 // n1 AS BIGINT) AS mean1_micro,
      |    CAST(s2 * 1000000 // n2 AS BIGINT) AS mean2_micro,
      |    CASE WHEN n1 <= 1 THEN NULL ELSE
      |      CAST((CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
      |      * 1000000 // (CAST(n1 AS HUGEINT) * (n1 - 1)) AS BIGINT)
      |      END AS var1_micro,
      |    CASE WHEN n2 <= 1 THEN NULL ELSE
      |      CAST((CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2)
      |      * 1000000 // (CAST(n2 AS HUGEINT) * (n2 - 1)) AS BIGINT)
      |      END AS var2_micro
      |  FROM w),
      |t AS (
      |  SELECT *,
      |    var1_micro // n1 + var2_micro // n2 AS se2_micro,
      |    mean1_micro - mean2_micro AS dm_micro,
      |    var1_micro // n1 // 1000 AS a1_milli,
      |    var2_micro // n2 // 1000 AS a2_milli
      |  FROM m),
      |f AS (
      |  SELECT n1, n2, mean1_micro, mean2_micro, var1_micro, var2_micro,
      |    se2_micro,
      |    CASE WHEN se2_micro = 0 THEN NULL ELSE
      |      CAST(CAST(dm_micro AS HUGEINT) * dm_micro // se2_micro AS BIGINT)
      |      END AS t2_micro,
      |    CASE WHEN CAST(a1_milli AS HUGEINT) * a1_milli // (n1 - 1)
      |        + CAST(a2_milli AS HUGEINT) * a2_milli // (n2 - 1) = 0 THEN NULL
      |      ELSE CAST(CAST(se2_micro // 1000 AS HUGEINT) * (se2_micro // 1000)
      |      * 1000
      |      // (CAST(a1_milli AS HUGEINT) * a1_milli // (n1 - 1)
      |        + CAST(a2_milli AS HUGEINT) * a2_milli // (n2 - 1))
      |      AS BIGINT) END AS df_milli
      |  FROM t)
      |SELECT *, t2_micro > 3841459 AS significant FROM f""") { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("x"))
    val g = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("q"))
    val w = g.agg(
      max(when(col("event_type") === "purchase", col("n"))).as("n1"),
      max(when(col("event_type") === "purchase", col("s"))).as("s1"),
      max(when(col("event_type") === "purchase", col("q"))).as("q1"),
      max(when(col("event_type") === "click", col("n"))).as("n2"),
      max(when(col("event_type") === "click", col("s"))).as("s2"),
      max(when(col("event_type") === "click", col("q"))).as("q2"))
    val m = w.select(col("n1"), col("n2"),
      expr("CAST(s1 * 1000000 div n1 AS BIGINT)").as("mean1_micro"),
      expr("CAST(s2 * 1000000 div n2 AS BIGINT)").as("mean2_micro"),
      expr("CASE WHEN n1 <= 1 THEN NULL ELSE"
        + " CAST((CAST(n1 AS DECIMAL(38,0)) * q1 - CAST(s1 AS DECIMAL(38,0))"
        + " * s1) * 1000000 div (CAST(n1 AS DECIMAL(38,0)) * (n1 - 1))"
        + " AS BIGINT) END").as("var1_micro"),
      expr("CASE WHEN n2 <= 1 THEN NULL ELSE"
        + " CAST((CAST(n2 AS DECIMAL(38,0)) * q2 - CAST(s2 AS DECIMAL(38,0))"
        + " * s2) * 1000000 div (CAST(n2 AS DECIMAL(38,0)) * (n2 - 1))"
        + " AS BIGINT) END").as("var2_micro"))
    // Welch df intermediates rescaled to milli BEFORE squaring: Spark's
    // IntegralDivide always returns BIGINT, so a quotient like
    // (var/n)²/(n−1) (~7e19 here) would overflow where DuckDB's
    // HUGEINT `//` sails through — flooring the SAME nonneg operands
    // to milli first keeps every quotient sub-int64 in BOTH engines.
    val t = m
      .withColumn("se2_micro",
        expr("var1_micro div n1 + var2_micro div n2"))
      .withColumn("dm_micro", col("mean1_micro") - col("mean2_micro"))
      .withColumn("a1_milli", expr("var1_micro div n1 div 1000"))
      .withColumn("a2_milli", expr("var2_micro div n2 div 1000"))
    val f = t.select(col("n1"), col("n2"), col("mean1_micro"),
      col("mean2_micro"), col("var1_micro"), col("var2_micro"),
      col("se2_micro"),
      expr("CASE WHEN se2_micro = 0 THEN NULL ELSE"
        + " CAST(CAST(dm_micro AS DECIMAL(38,0)) * dm_micro div se2_micro"
        + " AS BIGINT) END").as("t2_micro"),
      expr("CASE WHEN CAST(a1_milli AS DECIMAL(38,0)) * a1_milli div (n1 - 1)"
        + " + CAST(a2_milli AS DECIMAL(38,0)) * a2_milli div (n2 - 1) = 0"
        + " THEN NULL ELSE"
        + " CAST(CAST(se2_micro div 1000 AS DECIMAL(38,0))"
        + " * (se2_micro div 1000) * 1000"
        + " div (CAST(a1_milli AS DECIMAL(38,0)) * a1_milli div (n1 - 1)"
        + " + CAST(a2_milli AS DECIMAL(38,0)) * a2_milli div (n2 - 1))"
        + " AS BIGINT) END").as("df_milli"))
    f.withColumn("significant", col("t2_micro") > 3841459L)
  }

  /** Experiment power analysis (r16) — the design-time companion to
    * `stats_welch_t`/`ab_test_metrics`: per event type, the per-arm
    * sample size a 50/50 A/B test needs to detect a 5% lift of the
    * observed mean at alpha = 0.05 (two-sided) and power = 0.80. The
    * classic n = 2·(z_a + z_b)²·sigma²/delta² with (z_a + z_b)² as the
    * integer micro constant 7848879 ((1.959964 + 0.841621)²·1e6 — a
    * DOCUMENTED literal, the same convention as ab_srm_check's
    * 3.841459), variance from exact sums (per-row square in
    * DECIMAL(38)/HUGEINT), delta in floor-micro cents, and the
    * ceiling spelled (a + b − 1) // b on nonnegative operands. One
    * group agg, row-local math. */
  val abPowerSampleSize: QDef = q(
    "ab_power_sample_size",
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
      |  FROM events),
      |g AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS s,
      |    SUM(CAST(x AS HUGEINT) * x) AS q
      |  FROM e GROUP BY event_type),
      |m AS (
      |  SELECT event_type, n,
      |    CAST(s * 1000000 // n AS BIGINT) AS mean_micro,
      |    CASE WHEN n <= 1 THEN NULL ELSE
      |      CAST((CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s) * 1000000
      |      // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) END AS var_micro
      |  FROM g),
      |d AS (SELECT *, CAST(mean_micro // 20 AS BIGINT) AS delta_micro FROM m)
      |SELECT event_type, n, mean_micro, var_micro, delta_micro,
      |  CASE WHEN delta_micro = 0 THEN NULL ELSE
      |    CAST((2 * 7848879 * CAST(var_micro AS HUGEINT)
      |      + CAST(delta_micro AS HUGEINT) * delta_micro - 1)
      |    // (CAST(delta_micro AS HUGEINT) * delta_micro) AS BIGINT) END
      |    AS n_required
      |FROM d ORDER BY event_type""") { (s, d) =>
    val g = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("q"))
    g.select(col("event_type"), col("n"),
        expr("CAST(s * 1000000 div n AS BIGINT)").as("mean_micro"),
        expr("CASE WHEN n <= 1 THEN NULL ELSE"
          + " CAST((CAST(n AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0))"
          + " * s) * 1000000 div (CAST(n AS DECIMAL(38,0)) * (n - 1))"
          + " AS BIGINT) END").as("var_micro"))
      .withColumn("delta_micro", expr("CAST(mean_micro div 20 AS BIGINT)"))
      .select(col("event_type"), col("n"), col("mean_micro"),
        col("var_micro"), col("delta_micro"),
        expr("CASE WHEN delta_micro = 0 THEN NULL ELSE"
          + " CAST((2 * 7848879 * CAST(var_micro AS DECIMAL(38,0))"
          + " + CAST(delta_micro AS DECIMAL(38,0)) * delta_micro - 1)"
          + " div (CAST(delta_micro AS DECIMAL(38,0)) * delta_micro)"
          + " AS BIGINT) END").as("n_required"))
      .orderBy(col("event_type"))
  }

  /** Rolling correlation window (r16) — "is this customer's spend
    * trending with time": per customer, the Pearson correlation
    * between order date (day number) and order value over the last
    * <= 8 orders, from six integer window sums over ONE
    * user-partitioned ROWS frame (n, Σx, Σy, Σx², Σy², Σxy — the same
    * frame, so one exchange). Reported as the SIGNED squared
    * correlation in floor-ppm: corr²·sign(cov), with Sxy² and Sxx·Syy
    * ridden through DECIMAL(38)/HUGEINT and the division split on the
    * sign so both engines floor nonnegative operands only; NULL when
    * either marginal variance is 0 (constant window). The 8-row frame
    * bounds every operand at any corpus scale. */
  val winRollingCorr: QDef = q(
    "win_rolling_corr",
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS x,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
      |  FROM orders),
      |w AS (
      |  SELECT o_custkey, o_orderkey, x, y,
      |    CAST(COUNT(*) OVER win AS BIGINT) AS n,
      |    CAST(SUM(x) OVER win AS BIGINT) AS sx,
      |    CAST(SUM(y) OVER win AS BIGINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) OVER win AS sxx,
      |    SUM(CAST(y AS HUGEINT) * y) OVER win AS syy,
      |    SUM(CAST(x AS HUGEINT) * y) OVER win AS sxy
      |  FROM o
      |  WINDOW win AS (PARTITION BY o_custkey ORDER BY x, o_orderkey
      |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
      |c AS (
      |  SELECT o_custkey, o_orderkey, n,
      |    n * sxy - CAST(sx AS HUGEINT) * sy AS cxy,
      |    n * sxx - CAST(sx AS HUGEINT) * sx AS vx,
      |    n * syy - CAST(sy AS HUGEINT) * sy AS vy
      |  FROM w)
      |SELECT o_custkey, o_orderkey, n, CAST(cxy AS BIGINT) AS cov_num,
      |  CASE WHEN vx = 0 OR vy = 0 THEN CAST(NULL AS BIGINT)
      |    WHEN cxy >= 0 THEN CAST(cxy * cxy * 1000000 // (vx * vy) AS BIGINT)
      |    ELSE -CAST(cxy * cxy * 1000000 // (vx * vy) AS BIGINT) END
      |    AS corr2_signed_ppm
      |FROM c ORDER BY o_custkey, o_orderkey""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')"
          + " AS BIGINT)").as("x"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("y"))
    val win = Window.partitionBy(col("o_custkey"))
      .orderBy(col("x"), col("o_orderkey")).rowsBetween(-7, 0)
    val w = o.select(col("o_custkey"), col("o_orderkey"), col("x"), col("y"),
      count(lit(1)).over(win).as("n"),
      sum(col("x")).over(win).as("sx"),
      sum(col("y")).over(win).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).over(win).as("sxx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).over(win).as("syy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).over(win).as("sxy"))
    val c = w.select(col("o_custkey"), col("o_orderkey"), col("n"),
      expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy").as("cxy"),
      expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx").as("vx"),
      expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy").as("vy"))
    c.select(col("o_custkey"), col("o_orderkey"), col("n"),
        col("cxy").cast(LongType).as("cov_num"),
        expr("CASE WHEN vx = 0 OR vy = 0 THEN CAST(NULL AS BIGINT)"
          + " WHEN cxy >= 0 THEN CAST(cxy * cxy * 1000000 div (vx * vy)"
          + " AS BIGINT)"
          + " ELSE -CAST(cxy * cxy * 1000000 div (vx * vy) AS BIGINT) END")
          .as("corr2_signed_ppm"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Mergeable Bloom-filter states (r16) — the third sketch-merge leg
    * after quantiles and heavy hitters: `sketch_bloom_fpr` grades the
    * filter's FPR as a sparse bit-position set; THIS key grades the
    * PACKED-WORD register representation a 100 TB rollup ships — 1024
    * BIGINT words × 63 bits (the sign bit never set), 3 md5-derived
    * hashes per key, per-shard filter = BIT_OR of element words,
    * merged filter = BIT_OR over the 8 shard states. The graded
    * witness: every word's shard-merged value EQUALS the one-pass
    * value (BIT_OR associativity/commutativity/idempotence — the
    * exact-spellable merge property), plus per-word popcounts and the
    * number of shard states contributing. Fixed-width state (≤1024
    * rows per shard) regardless of corpus size. */
  val sketchBloomMerge: QDef = q(
    "sketch_bloom_merge",
    """WITH el AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |js AS (SELECT unnest([0, 1, 2]) AS j),
      |hs AS (
      |  SELECT k, k % 8 AS shard,
      |    CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '#'
      |      || CAST(j AS VARCHAR)), 1, 8))::BIGINT % 64512 AS BIGINT) AS h
      |  FROM el CROSS JOIN js),
      |sf AS (
      |  SELECT shard, h // 63 AS w,
      |    bit_or(CAST(1 AS BIGINT) << CAST(h % 63 AS INT)) AS bits
      |  FROM hs GROUP BY shard, h // 63),
      |mg AS (
      |  SELECT w, bit_or(bits) AS merged,
      |    CAST(COUNT(*) AS BIGINT) AS n_shard_states
      |  FROM sf GROUP BY w),
      |op AS (
      |  SELECT h // 63 AS w,
      |    bit_or(CAST(1 AS BIGINT) << CAST(h % 63 AS INT)) AS onepass
      |  FROM hs GROUP BY h // 63)
      |SELECT mg.w AS word_idx, merged,
      |  CAST(bit_count(merged) AS BIGINT) AS bits_set,
      |  n_shard_states, merged = onepass AS merge_equals_onepass
      |FROM mg JOIN op ON op.w = mg.w
      |ORDER BY word_idx""") { (s, d) =>
    val el = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
    val js = s.range(3).select(col("id").cast(IntegerType).as("j"))
    val hs = el.crossJoin(broadcast(js))
      .select(col("k"), expr("k % 8").as("shard"),
        expr("CAST(conv(substring(md5(CAST(k AS STRING) || '#'"
          + " || CAST(j AS STRING)), 1, 8), 16, 10) % 64512 AS BIGINT)")
          .as("h"))
    val sf = hs.groupBy(col("shard"), expr("h div 63").as("w"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 63 AS INT))"))
        .as("bits"))
    val mg = sf.groupBy(col("w"))
      .agg(bit_or(col("bits")).as("merged"),
        count(lit(1)).as("n_shard_states"))
    val op = hs.groupBy(expr("h div 63").as("ow"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 63 AS INT))"))
        .as("onepass"))
    mg.join(op, col("ow") === col("w"))
      .select(col("w").as("word_idx"), col("merged"),
        bit_count(col("merged")).cast(LongType).as("bits_set"),
        col("n_shard_states"),
        (col("merged") === col("onepass")).as("merge_equals_onepass"))
      .orderBy(col("word_idx"))
  }

  /** Per-user contribution capping audit (r16) — the
    * differential-privacy PREP step every DP release pipeline runs
    * before adding noise: bound each user's contribution so the
    * query's sensitivity is finite. Per event type: raw rows vs rows
    * surviving a keep-first-8-per-(user, type) cap (deterministic
    * survivors — the user's earliest events by (ts, event_id), never
    * an arbitrary sample), raw vs capped value mass, the observed
    * worst-case user contribution (the UNCAPPED L1 sensitivity) and
    * its capped bound, and the dropped mass in floor-ppm. One
    * user-partitioned window + one group agg; the cap is row-local
    * after the window. */
  val privacyContributionCapping: QDef = q(
    "privacy_contribution_capping",
    """WITH e AS (
      |  SELECT event_type, user_id,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |u AS (
      |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_user
      |  FROM e GROUP BY event_type, user_id),
      |caps AS (
      |  SELECT event_type, MAX(n_user) AS max_user_rows
      |  FROM u GROUP BY event_type)
      |SELECT e.event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  MAX(caps.max_user_rows) AS max_user_rows,
      |  LEAST(MAX(caps.max_user_rows), 8) AS capped_max_rows,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(CASE WHEN rn <= 8 THEN cents ELSE 0 END) AS BIGINT)
      |    AS kept_sum_cents,
      |  CASE WHEN SUM(cents) = 0 THEN NULL ELSE
      |    CAST((SUM(cents) - SUM(CASE WHEN rn <= 8 THEN cents ELSE 0 END))
      |    * 1000000 // SUM(cents) AS BIGINT) END AS dropped_ppm
      |FROM e JOIN caps ON caps.event_type = e.event_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        row_number().over(Window.partitionBy(col("user_id"),
          col("event_type")).orderBy(col("ts"), col("event_id"))).as("rn"))
    // group keys in the WINDOW's partition order (user_id, event_type)
    // so the per-user count rides the window exchange instead of
    // re-shuffling
    val caps = e.groupBy(col("user_id"), col("event_type").as("ct"))
      .agg(count(lit(1)).as("n_user"))
      .groupBy(col("ct")).agg(max(col("n_user")).as("max_user_rows"))
    e.join(broadcast(caps), col("ct") === col("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("rn") <= 8, 1L).otherwise(0L)).as("n_kept"),
        max(col("max_user_rows")).as("max_user_rows"),
        least(max(col("max_user_rows")), lit(8L)).as("capped_max_rows"),
        sum(col("cents")).as("sum_cents"),
        sum(when(col("rn") <= 8, col("cents")).otherwise(0L))
          .as("kept_sum_cents"))
      .select(col("event_type"), col("n_rows"), col("n_kept"),
        col("max_user_rows"), col("capped_max_rows"), col("sum_cents"),
        col("kept_sum_cents"),
        expr("CASE WHEN sum_cents = 0 THEN NULL ELSE"
          + " CAST((sum_cents - kept_sum_cents) * 1000000 div sum_cents"
          + " AS BIGINT) END").as("dropped_ppm"))
      .orderBy(col("event_type"))
  }

  /** Time-based train/test split audit (r16) — the temporal twin of
    * `split_by_user_leakfree`: train = events before 2024-01-22, test
    * = the rest (the forecasting/backtest split). Per split: volume,
    * users, value mass — plus the LEAKAGE the time cut permits and a
    * user-keyed split would not: users present on both sides, and the
    * share of each split's rows belonging to them in floor-ppm (the
    * number an evaluator reads before claiming the test set is
    * unseen-user generalization). One (split, user) agg + a 2-group
    * fold; the overlap set is user-cardinality. */
  val splitTimeBased: QDef = q(
    "split_time_based",
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00' THEN 'train'
      |      ELSE 'test' END AS split
      |  FROM events),
      |su AS (
      |  SELECT split, user_id, CAST(COUNT(*) AS BIGINT) AS nu,
      |    CAST(SUM(cents) AS BIGINT) AS cu
      |  FROM e GROUP BY split, user_id),
      |ov AS (
      |  SELECT user_id FROM su GROUP BY user_id HAVING COUNT(*) = 2)
      |SELECT split,
      |  CAST(SUM(nu) AS BIGINT) AS n_rows,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(cu) AS BIGINT) AS sum_cents,
      |  CAST(COUNT(ov.user_id) AS BIGINT) AS n_leaky_users,
      |  CAST(SUM(CASE WHEN ov.user_id IS NOT NULL THEN nu ELSE 0 END)
      |    AS BIGINT) AS n_leaky_rows,
      |  CAST(SUM(CASE WHEN ov.user_id IS NOT NULL THEN nu ELSE 0 END)
      |    * 1000000 // SUM(nu) AS BIGINT) AS leaky_rows_ppm
      |FROM su LEFT JOIN ov ON ov.user_id = su.user_id
      |GROUP BY split ORDER BY split""") { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        when(col("ts") < lit("2024-01-22 00:00:00").cast(TimestampType),
          "train").otherwise("test").as("split"))
    val su = e.groupBy(col("split"), col("user_id"))
      .agg(count(lit(1)).as("nu"), sum(col("cents")).as("cu"))
    val ov = su.groupBy(col("user_id").as("ouid"))
      .agg(count(lit(1)).as("nsplits"))
      .filter(col("nsplits") === 2).select(col("ouid"))
    su.join(broadcast(ov), col("ouid") === col("user_id"), "left")
      .groupBy(col("split"))
      .agg(sum(col("nu")).as("n_rows"),
        count(lit(1)).as("n_users"),
        sum(col("cu")).as("sum_cents"),
        count(col("ouid")).as("n_leaky_users"),
        sum(when(col("ouid").isNotNull, col("nu")).otherwise(0L))
          .as("n_leaky_rows"))
      .select(col("split"), col("n_rows"), col("n_users"), col("sum_cents"),
        col("n_leaky_users"), col("n_leaky_rows"),
        expr("CAST(n_leaky_rows * 1000000 div n_rows AS BIGINT)")
          .as("leaky_rows_ppm"))
      .orderBy(col("split"))
  }

  /** NDCG@10 retrieval eval (r16) — position-weighted retrieval
    * quality next to `eval_retrieval_mrr` (first-hit only) and
    * `eval_ann_recall` (set overlap, position-blind): same md5-sampled
    * query set, same brute-force cosine ranks (the shared quantized
    * float tree, spec-pinned bit-identical across engines), relevance
    * = same label. The log2 discounts are a 10-row LITERAL table
    * (floor(1e6/log2(i+1)), documented constants — the transcendental
    * never runs at query time, the D6 discipline), ideal DCG from the
    * same table capped at min(n_rel, 10), per-query NDCG in
    * floor-micro, label-level floor mean. Queries with no same-label
    * candidate contribute 0. Eval-tier brute force by design —
    * production retrieval routes through `ann_ivf_label`. */
  val evalNdcgAt10: QDef = q(
    "eval_ndcg_at10",
    s"""WITH q AS (
      |  SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
      |  FROM embeddings
      |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'),
      |cand AS (
      |  SELECT q.q_id, q.q_label, e.vec_id, e.label,
      |    ${VecMath.sqlCosine("e.embedding", "q.q_emb")} AS sim
      |  FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
      |r AS (
      |  SELECT q_id, q_label, label,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rnk
      |  FROM cand),
      |disc AS (SELECT * FROM (VALUES (1, 1000000), (2, 630929),
      |  (3, 500000), (4, 430676), (5, 386852), (6, 356207), (7, 333333),
      |  (8, 315464), (9, 301029), (10, 289064)) t(i, dmicro)),
      |qd AS (
      |  SELECT r.q_id, r.q_label,
      |    CAST(SUM(CASE WHEN r.label = r.q_label AND r.rnk <= 10
      |      THEN d.dmicro ELSE 0 END) AS BIGINT) AS dcg_micro,
      |    CAST(SUM(CASE WHEN r.label = r.q_label THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_rel
      |  FROM r LEFT JOIN disc d ON d.i = r.rnk
      |  GROUP BY r.q_id, r.q_label),
      |qn AS (
      |  SELECT qd.q_id, qd.q_label, qd.dcg_micro,
      |    CAST(SUM(CASE WHEN d.i <= LEAST(qd.n_rel, 10) THEN d.dmicro
      |      ELSE 0 END) AS BIGINT) AS idcg_micro
      |  FROM qd CROSS JOIN disc d
      |  GROUP BY qd.q_id, qd.q_label, qd.dcg_micro),
      |nq AS (
      |  SELECT q_label,
      |    CASE WHEN idcg_micro = 0 THEN 0
      |      ELSE CAST(dcg_micro * 1000000 // idcg_micro AS BIGINT) END
      |      AS ndcg_micro
      |  FROM qn)
      |SELECT q_label AS label,
      |  CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CAST(SUM(ndcg_micro) AS BIGINT) AS sum_ndcg_micro,
      |  CAST(SUM(ndcg_micro) AS BIGINT) // COUNT(*) AS mean_ndcg_micro
      |FROM nq GROUP BY q_label ORDER BY label""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val discRows = Seq((1, 1000000L), (2, 630929L), (3, 500000L),
      (4, 430676L), (5, 386852L), (6, 356207L), (7, 333333L),
      (8, 315464L), (9, 301029L), (10, 289064L))
    val disc = discRows.toDF("i", "dmicro")
    val e = Tables.embeddings(s, d)
    val qs = e.filter(
        substring(md5(col("vec_id").cast(StringType)), 1, 1) === "0")
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val cand = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        VecMath.fcosine(col("embedding"), col("q_emb")).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val qd = cand
      .select(col("q_id"), col("q_label"), col("label"),
        row_number().over(w).cast(LongType).as("rnk"))
      .join(broadcast(disc), col("i") === col("rnk"), "left")
      .groupBy(col("q_id"), col("q_label"))
      .agg(sum(when(col("label") === col("q_label") && col("rnk") <= 10,
          col("dmicro")).otherwise(0L)).as("dcg_micro"),
        sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
          .as("n_rel"))
    val qn = qd.crossJoin(broadcast(disc.select(col("i").as("ii"),
        col("dmicro").as("dd"))))
      .groupBy(col("q_id"), col("q_label"), col("dcg_micro"))
      .agg(sum(when(col("ii") <= least(col("n_rel"), lit(10L)), col("dd"))
        .otherwise(0L)).as("idcg_micro"))
    qn.select(col("q_label"),
        when(col("idcg_micro") === 0, 0L)
          .otherwise(expr("CAST(dcg_micro * 1000000 div idcg_micro"
            + " AS BIGINT)")).as("ndcg_micro"))
      .groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("ndcg_micro")).as("sum_ndcg_micro"))
      .select(col("label"), col("n_queries"), col("sum_ndcg_micro"),
        expr("sum_ndcg_micro div n_queries").as("mean_ndcg_micro"))
      .orderBy(col("label"))
  }

  /** Tukey IQR-fence outlier audit (r16) — the boxplot rule next to
    * `anomaly_mad` (median/MAD) and `agg_zscore_outliers` (mean/σ):
    * per event type, exact Q1/Q3 by rank select (the
    * `agg_quantiles_exact` lower-quantile convention), fences at
    * 1.5·IQR spelled 3·IQR // 2 (IQR nonnegative, so floor agrees),
    * and the out-of-fence row counts the boxplot would flag. One rank
    * window + the fence table broadcast back onto the same scan —
    * the `stats_levene_bf` median machinery pointed at quartiles. */
  val dqIqrOutliers: QDef = q(
    "dq_iqr_outliers",
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
      |qs AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = (n - 1) * 25 // 100 + 1 THEN x END) AS q1,
      |    MAX(CASE WHEN rn = (n - 1) * 75 // 100 + 1 THEN x END) AS q3
      |  FROM r GROUP BY event_type),
      |f AS (
      |  SELECT event_type, q1, q3, q3 - q1 AS iqr,
      |    q1 - 3 * (q3 - q1) // 2 AS lo_fence,
      |    q3 + 3 * (q3 - q1) // 2 AS hi_fence
      |  FROM qs)
      |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  MAX(q1) AS q1_cents, MAX(q3) AS q3_cents, MAX(iqr) AS iqr_cents,
      |  MAX(lo_fence) AS lo_fence, MAX(hi_fence) AS hi_fence,
      |  CAST(SUM(CASE WHEN x < lo_fence THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_below,
      |  CAST(SUM(CASE WHEN x > hi_fence THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_above,
      |  CAST(SUM(CASE WHEN x < lo_fence OR x > hi_fence THEN 1 ELSE 0 END)
      |    * 1000000 // COUNT(*) AS BIGINT) AS outlier_ppm
      |FROM e JOIN f ON f.event_type = e.event_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("x"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("x"), col("event_id"))
    val r = e.select(col("event_type"), col("x"),
      row_number().over(w).as("rn"),
      count(lit(1)).over(Window.partitionBy(col("event_type"))).as("n"))
    val f = r.groupBy(col("event_type").as("ft"))
      .agg(max(when(col("rn") === expr("(n - 1) * 25 div 100 + 1"),
          col("x"))).as("q1"),
        max(when(col("rn") === expr("(n - 1) * 75 div 100 + 1"),
          col("x"))).as("q3"))
      .select(col("ft"), col("q1"), col("q3"),
        (col("q3") - col("q1")).as("iqr"),
        expr("q1 - 3 * (q3 - q1) div 2").as("lo_fence"),
        expr("q3 + 3 * (q3 - q1) div 2").as("hi_fence"))
    e.join(broadcast(f), col("ft") === col("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("q1")).as("q1_cents"), max(col("q3")).as("q3_cents"),
        max(col("iqr")).as("iqr_cents"),
        max(col("lo_fence")).as("lo_fence"),
        max(col("hi_fence")).as("hi_fence"),
        sum(when(col("x") < col("lo_fence"), 1L).otherwise(0L))
          .as("n_below"),
        sum(when(col("x") > col("hi_fence"), 1L).otherwise(0L))
          .as("n_above"),
        sum(when(col("x") < col("lo_fence") || col("x") > col("hi_fence"),
          1L).otherwise(0L)).as("n_out"))
      .select(col("event_type"), col("n"), col("q1_cents"), col("q3_cents"),
        col("iqr_cents"), col("lo_fence"), col("hi_fence"), col("n_below"),
        col("n_above"),
        expr("CAST(n_out * 1000000 div n AS BIGINT)").as("outlier_ppm"))
      .orderBy(col("event_type"))
  }

  /** Per-node local clustering coefficient (r16) — the node-level
    * companion to `graph_triangle_count`'s single global number, over
    * the SAME 1996 part co-purchase graph: per part, its degree,
    * incident-triangle count (each oriented a<b<c triangle exploded
    * row-locally to its three corners), and 2·tri/(deg·(deg−1)) in
    * floor-ppm (NULL for degree-1 nodes — no possible wedge). The
    * per-node view is what a graph-health monitor actually plots: a
    * bimodal LCC histogram is the classic clique-flood symptom the
    * global coefficient averages away. Same oriented 3-way edge join
    * as the global kernel, one extra corner explode + node agg. */
  val graphLocalClustering: QDef = q(
    "graph_local_clustering",
    """WITH li AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
      |e AS (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM li x JOIN li y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS degree
      |  FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
      |  GROUP BY node),
      |tc AS (
      |  SELECT e1.a AS ta, e1.b AS tb, e2.b AS tcn
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |nt AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
      |  FROM (SELECT ta AS node FROM tc UNION ALL SELECT tb FROM tc
      |        UNION ALL SELECT tcn FROM tc)
      |  GROUP BY node)
      |SELECT deg.node AS part_key, degree,
      |  COALESCE(n_tri, 0) AS n_triangles,
      |  CASE WHEN degree < 2 THEN CAST(NULL AS BIGINT)
      |    ELSE CAST(COALESCE(n_tri, 0) * 2000000
      |      // (degree * (degree - 1)) AS BIGINT) END AS lcc_ppm
      |FROM deg LEFT JOIN nt ON nt.node = deg.node
      |ORDER BY part_key""") { (s, d) =>
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >=
          lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      .select(col("l_orderkey"), col("l_partkey"))
    val e = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tc = e.select(col("a").as("a1"), col("b").as("b1"))
      .join(e.select(col("a").as("a2"), col("b").as("b2")),
        col("b1") === col("a2"))
      .join(e.select(col("a").as("a3"), col("b").as("b3")),
        col("a3") === col("a1") && col("b3") === col("b2"))
      .select(col("a1").as("ta"), col("b1").as("tb"), col("b2").as("tcn"))
    val nt = tc.select(explode(array(col("ta"), col("tb"), col("tcn")))
        .as("tnode"))
      .groupBy(col("tnode")).agg(count(lit(1)).as("n_tri"))
    deg.join(nt, col("tnode") === col("node"), "left")
      .select(col("node").as("part_key"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        expr("CASE WHEN degree < 2 THEN CAST(NULL AS BIGINT)"
          + " ELSE CAST(COALESCE(n_tri, 0) * 2000000"
          + " div (degree * (degree - 1)) AS BIGINT) END").as("lcc_ppm"))
      .orderBy(col("part_key"))
  }

  /** Monthly seasonality index (r16) — the classic seasonal-index
    * report: per calendar month (pooled across years), order volume,
    * revenue mass, and the index revenue_share·12 in floor-ppm
    * (1000000 = a perfectly uniform month; the DECIMAL(38)/HUGEINT
    * fold keeps the ×12e6 product safe at any revenue scale). One
    * 12-group agg + a broadcast 1-row total. */
  val reportSeasonalityIndex: QDef = q(
    "report_seasonality_index",
    """WITH m AS (
      |  SELECT CAST(month(o_orderdate) AS BIGINT) AS mth,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(sum_cents) AS BIGINT) AS tot FROM m)
      |SELECT mth AS month, n_orders, sum_cents,
      |  CAST(CAST(sum_cents AS HUGEINT) * 12000000 // tot AS BIGINT)
      |    AS seasonal_index_ppm
      |FROM m CROSS JOIN t ORDER BY month""") { (s, d) =>
    val m = Tables.orders(s, d)
      .groupBy(month(col("o_orderdate")).cast(LongType).as("mth"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100"
          + " AS BIGINT)")).as("sum_cents"))
    val t = m.agg(sum(col("sum_cents")).as("tot"))
    m.crossJoin(broadcast(t))
      .select(col("mth").as("month"), col("n_orders"),
        col("sum_cents").cast(LongType).as("sum_cents"),
        expr("CAST(CAST(sum_cents AS DECIMAL(38,0)) * 12000000 div tot"
          + " AS BIGINT)").as("seasonal_index_ppm"))
      .orderBy(col("month"))
  }

  /** Markov stationary distribution (r16) — the chain-level readout
    * over `event_transition_matrix`'s row-stochastic floor-ppm matrix:
    * three unrolled integer power-iteration rounds from the uniform
    * start (1e6 // k ppm), each round one broadcast join of the
    * ≤k²-row matrix against the k-row vector (the `graph_pagerank`
    * fixed-iteration discipline — no driver-side convergence probe,
    * no float accumulation). Output shows the convergence path
    * (pi0..pi3) per event type; flooring leaks ≤1 ppm per cell per
    * round, deterministically in both engines. The matrix build is
    * the one user-partitioned lead window; everything after is
    * k-sized. */
  val eventsMarkovStationary: QDef = q(
    "events_markov_stationary",
    """WITH s AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM s WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      |m AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
      |  FROM c GROUP BY from_type),
      |p AS MATERIALIZED (
      |  SELECT c.from_type, c.to_type, (c.n * 1000000) // m.tot AS p_ppm
      |  FROM c JOIN m ON c.from_type = m.from_type),
      |t0 AS (SELECT DISTINCT event_type AS ty FROM events),
      |k AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk FROM t0),
      |pi0 AS (SELECT ty, CAST(1000000 // nk AS BIGINT) AS pi
      |  FROM t0 CROSS JOIN k),
      |pi1 AS MATERIALIZED (
      |  SELECT p.to_type AS ty, CAST(SUM(pi * p_ppm) // 1000000 AS BIGINT)
      |    AS pi
      |  FROM p JOIN pi0 ON pi0.ty = p.from_type GROUP BY p.to_type),
      |pi2 AS MATERIALIZED (
      |  SELECT p.to_type AS ty, CAST(SUM(pi * p_ppm) // 1000000 AS BIGINT)
      |    AS pi
      |  FROM p JOIN pi1 ON pi1.ty = p.from_type GROUP BY p.to_type),
      |pi3 AS (
      |  SELECT p.to_type AS ty, CAST(SUM(pi * p_ppm) // 1000000 AS BIGINT)
      |    AS pi
      |  FROM p JOIN pi2 ON pi2.ty = p.from_type GROUP BY p.to_type)
      |SELECT t0.ty AS event_type, pi0.pi AS pi0_ppm,
      |  COALESCE(pi1.pi, 0) AS pi1_ppm, COALESCE(pi2.pi, 0) AS pi2_ppm,
      |  COALESCE(pi3.pi, 0) AS pi3_ppm
      |FROM t0 JOIN pi0 ON pi0.ty = t0.ty
      |LEFT JOIN pi1 ON pi1.ty = t0.ty
      |LEFT JOIN pi2 ON pi2.ty = t0.ty
      |LEFT JOIN pi3 ON pi3.ty = t0.ty
      |ORDER BY event_type""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val c = Tables.events(s, d)
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val m = c.groupBy(col("from_type").as("m_from"))
      .agg(sum(col("n")).as("tot"))
    val p = c.join(broadcast(m), col("from_type") === col("m_from"))
      .select(col("from_type"), col("to_type"),
        expr("(n * 1000000) div tot").as("p_ppm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val t0 = Tables.events(s, d).select(col("event_type").as("ty"))
      .distinct()
    val k = t0.agg(count(lit(1)).as("nk"))
    val pi0 = t0.crossJoin(broadcast(k))
      .select(col("ty"), expr("CAST(1000000 div nk AS BIGINT)").as("pi"))
    def step(pi: DataFrame): DataFrame =
      p.join(broadcast(pi.select(col("ty").as("fty"), col("pi"))),
          col("fty") === col("from_type"))
        .groupBy(col("to_type").as("ty"))
        .agg(expr("CAST(SUM(pi * p_ppm) div 1000000 AS BIGINT)").as("pi"))
    val pi1 = step(pi0); val pi2 = step(pi1); val pi3 = step(pi2)
    t0.join(broadcast(pi0.select(col("ty").as("t0k"), col("pi").as("p0"))),
        col("t0k") === col("ty"))
      .join(broadcast(pi1.select(col("ty").as("t1k"), col("pi").as("p1"))),
        col("t1k") === col("ty"), "left")
      .join(broadcast(pi2.select(col("ty").as("t2k"), col("pi").as("p2"))),
        col("t2k") === col("ty"), "left")
      .join(broadcast(pi3.select(col("ty").as("t3k"), col("pi").as("p3"))),
        col("t3k") === col("ty"), "left")
      .select(col("ty").as("event_type"), col("p0").as("pi0_ppm"),
        coalesce(col("p1"), lit(0L)).as("pi1_ppm"),
        coalesce(col("p2"), lit(0L)).as("pi2_ppm"),
        coalesce(col("p3"), lit(0L)).as("pi3_ppm"))
      .orderBy(col("event_type"))
  }

  /** Max-inner-product top-k (r16) — the recommender-scoring twin of
    * `sim_search_topk`: UNNORMALIZED dot products against the query
    * vector (MIPS — cosine's normalization is exactly what a trained
    * scoring model's magnitude encodes, so recommenders rank by raw
    * dot), top-10 under (dot DESC, vec_id) total order. The dot is
    * the shared sequential float→double fold rounded to 6 (D10);
    * TakeOrdered physical top-k, query side a 1-row broadcast. At
    * scale MIPS routes through the same IVF/LSH structures with the
    * norm folded into an extra dimension — this is the eval-tier
    * exact pass. */
  val simMipsTopk: QDef = q(
    "sim_mips_topk",
    s"""WITH q AS (
      |  SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
      |d AS (
      |  SELECT e.vec_id, e.label,
      |    ROUND(${VecMath.sqlDot("e.embedding", "q_emb")}, 6) AS dot
      |  FROM embeddings e CROSS JOIN q
      |  WHERE e.vec_id <> 0)
      |SELECT vec_id, label, dot FROM d
      |ORDER BY dot DESC, vec_id LIMIT 10""") { (s, d) =>
    val q0 = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    Tables.embeddings(s, d).crossJoin(broadcast(q0))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"),
        round(VecMath.fdot(col("embedding"), col("q_emb")), 6).as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(10)
  }

  /** Grid-blocked spatial radius join (r16) — the geospatial blocking
    * pattern the registry lacked: points on a 1000×1000 grid
    * (deterministic synthetic coordinates from customer key and
    * balance — the fixture has no lat/lon; the OPERATOR is the
    * graded thing), radius-25 neighbor search via cell size = radius:
    * each point joins only its 3×3 neighboring cells (a 9-row
    * broadcast offset table — never a cartesian), then the exact
    * integer distance² filter. Graded output is the per-point
    * neighbor-count histogram plus the total pair count — the density
    * profile a spatial index designer reads. At scale this is exactly
    * the geohash/S2 bucketed join: candidate cost follows cell
    * occupancy, not n². */
  val joinSpatialGrid: QDef = q(
    "join_spatial_grid",
    """WITH pt AS (
      |  SELECT c_custkey AS k,
      |    (c_custkey * 37) % 1000 AS x,
      |    ((CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) % 1000)
      |      + 1000) % 1000 AS y
      |  FROM customer),
      |pc AS (SELECT k, x, y, x // 25 AS cx, y // 25 AS cy FROM pt),
      |os AS (SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx)
      |  CROSS JOIN (VALUES (-1), (0), (1)) b(dy)),
      |cand AS (
      |  SELECT a.k AS ka, b.k AS kb,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM pc a CROSS JOIN os
      |  JOIN pc b ON b.cx = a.cx + os.dx AND b.cy = a.cy + os.dy
      |    AND a.k < b.k),
      |pairs AS (SELECT ka, kb FROM cand WHERE d2 <= 625),
      |ends AS (SELECT ka AS k FROM pairs UNION ALL SELECT kb FROM pairs),
      |nb AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_neighbors
      |  FROM ends GROUP BY k),
      |pn AS (
      |  SELECT pt.k, COALESCE(nb.n_neighbors, 0) AS n_neighbors
      |  FROM pt LEFT JOIN nb ON nb.k = pt.k),
      |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs)
      |SELECT n_neighbors, CAST(COUNT(*) AS BIGINT) AS n_points, np.n_pairs
      |FROM pn CROSS JOIN np
      |GROUP BY n_neighbors, np.n_pairs
      |ORDER BY n_neighbors""") { (s, d) =>
    import s.implicits._
    val pt = Tables.customer(s, d)
      .select(col("c_custkey").as("k"),
        expr("(c_custkey * 37) % 1000").as("x"),
        expr("((CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
          + " % 1000) + 1000) % 1000").as("y"))
    val pc = pt.select(col("k"), col("x"), col("y"),
      expr("x div 25").as("cx"), expr("y div 25").as("cy"))
    val os = (for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy))
      .toDF("dx", "dy")
    val pairs = pc.as("a").crossJoin(broadcast(os))
      .join(pc.select(col("k").as("kb"), col("x").as("xb"),
          col("y").as("yb"), col("cx").as("cxb"), col("cy").as("cyb")),
        col("cxb") === col("a.cx") + col("dx") &&
          col("cyb") === col("a.cy") + col("dy") &&
          col("a.k") < col("kb"))
      .filter(expr("(a.x - xb) * (a.x - xb) + (a.y - yb) * (a.y - yb)"
        + " <= 625"))
      .select(col("a.k").as("ka"), col("kb"))
    val nb = pairs.select(explode(array(col("ka"), col("kb"))).as("ek"))
      .groupBy(col("ek")).agg(count(lit(1)).as("n_neighbors"))
    val np = pairs.agg(count(lit(1)).as("n_pairs"))
    pt.join(nb, col("ek") === col("k"), "left")
      .select(coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
      .crossJoin(broadcast(np))
      .groupBy(col("n_neighbors"), col("n_pairs"))
      .agg(count(lit(1)).as("n_points"))
      .select(col("n_neighbors"), col("n_points"), col("n_pairs"))
      .orderBy(col("n_neighbors"))
  }

  /** Two-proportion z-test (r16) — the conversion-rate comparison
    * completing the experimentation triplet: `ab_srm_check` gates the
    * SPLIT, `stats_welch_t` compares continuous MEANS, this compares
    * RATES between the md5-parity arms. Conversion = the user made a
    * HIGH-VALUE purchase (≥ $180) — deliberately rare enough that
    * neither p̂ = 0 nor p̂ = 1 degenerates the pooled variance at any
    * fixture tier (plain "any purchase" converts EVERY user at
    * sf0.001); the all-converted/none-converted edges still guard to
    * NULL identically in both engines. The pooled z² collapses to
    * pure integers:
    * z² = (c1·n2 − c2·n1)²·(n1+n2) / (n1·n2·(c1+c2)·(n1+n2−c1−c2)),
    * ridden through DECIMAL(38)/HUGEINT, reported in floor-micro with
    * the df=1 95% bound 3.841459. One distinct-user agg + a 1-row
    * fold. */
  val statsPropZtest: QDef = q(
    "stats_prop_ztest",
    """WITH u AS (
      |  SELECT user_id,
      |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
      |      THEN 0 ELSE 1 END AS arm,
      |    MAX(CASE WHEN event_type = 'purchase'
      |      AND CAST(value AS DECIMAL(12,2)) >= 180 THEN 1 ELSE 0 END)
      |      AS conv
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c2
      |  FROM u),
      |f AS (
      |  SELECT n1, c1, n2, c2,
      |    CAST(c1 * 1000000 // n1 AS BIGINT) AS p1_ppm,
      |    CAST(c2 * 1000000 // n2 AS BIGINT) AS p2_ppm,
      |    CASE WHEN c1 + c2 = 0 OR n1 + n2 - c1 - c2 = 0
      |      THEN CAST(NULL AS BIGINT)
      |      ELSE CAST(CAST(c1 * n2 - c2 * n1 AS HUGEINT)
      |          * (c1 * n2 - c2 * n1) * (n1 + n2) * 1000000
      |        // (CAST(n1 AS HUGEINT) * n2 * (c1 + c2)
      |          * (n1 + n2 - c1 - c2)) AS BIGINT) END AS z2_micro
      |  FROM c)
      |SELECT *, z2_micro > 3841459 AS significant FROM f""") { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
          expr("CAST(value AS DECIMAL(12,2)) >= 180"), 1).otherwise(0))
        .as("conv"))
      .select(
        when(substring(md5(col("user_id").cast(StringType)), 1, 1) <= "7",
          0).otherwise(1).as("arm"), col("conv"))
    val c = u.agg(
      count_if(col("arm") === 0).as("n1"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0)).cast(LongType)
        .as("c1"),
      count_if(col("arm") === 1).as("n2"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0)).cast(LongType)
        .as("c2"))
    c.select(col("n1"), col("c1"), col("n2"), col("c2"),
        expr("CAST(c1 * 1000000 div n1 AS BIGINT)").as("p1_ppm"),
        expr("CAST(c2 * 1000000 div n2 AS BIGINT)").as("p2_ppm"),
        expr("CASE WHEN c1 + c2 = 0 OR n1 + n2 - c1 - c2 = 0"
          + " THEN CAST(NULL AS BIGINT)"
          + " ELSE CAST(CAST(c1 * n2 - c2 * n1 AS DECIMAL(38,0))"
          + " * (c1 * n2 - c2 * n1) * (n1 + n2) * 1000000"
          + " div (CAST(n1 AS DECIMAL(38,0)) * n2 * (c1 + c2)"
          + " * (n1 + n2 - c1 - c2)) AS BIGINT) END").as("z2_micro"))
      .withColumn("significant", col("z2_micro") > 3841459L)
  }

  /** Multi-lag autocorrelation table (r16) — `ts_autocorr_daily`
    * generalized from lag 1 to the full weekly ACF (lags 1..7), the
    * table a seasonality analyst actually reads (a lag-7 spike = the
    * weekly cycle `ts_seasonal_naive_error` exploits). Daily totals
    * are aggregated ONCE (day-cardinality table), then one broadcast
    * self-join per the 7-row lag table pairs (x_d, x_{d+lag});
    * integer sums per (type, lag), the final Pearson ratio spelled as
    * the one-float-op-per-operand chain the lag-1 key already grades
    * (exact integer inputs → identical doubles in both engines). */
  val tsAcfLags: QDef = q(
    "ts_acf_lags",
    """WITH dtot AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY event_type, day),
      |lg AS (SELECT * FROM (VALUES (1), (2), (3), (4), (5), (6), (7))
      |  t(lag)),
      |p AS (
      |  SELECT a.event_type, lg.lag, a.cents AS x, b.cents AS y
      |  FROM dtot a CROSS JOIN lg
      |  JOIN dtot b ON b.event_type = a.event_type
      |    AND b.day = a.day + CAST(lg.lag AS INTEGER)),
      |s AS (
      |  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
      |    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
      |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |    SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
      |    SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      |  FROM p GROUP BY event_type, lag),
      |t AS (
      |  SELECT event_type, lag, n, CAST(sx AS DOUBLE) AS dx,
      |    CAST(sy AS DOUBLE) AS dy, CAST(sxx AS DOUBLE) AS dxx,
      |    CAST(syy AS DOUBLE) AS dyy, CAST(sxy AS DOUBLE) AS dxy
      |  FROM s)
      |SELECT event_type, CAST(lag AS BIGINT) AS lag, n,
      |  (n * dxy - dx * dy)
      |    / (sqrt(n * dxx - dx * dx) * sqrt(n * dyy - dy * dy)) AS acf
      |FROM t ORDER BY event_type, lag""") { (s, d) =>
    import s.implicits._
    val dtot = Tables.events(s, d)
      .select(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).cast(LongType).as("cents"))
    val lg = (1 to 7).toDF("lag")
    val p = dtot.as("a").crossJoin(broadcast(lg))
      .join(dtot.select(col("event_type").as("bt"), col("day").as("bd"),
          col("cents").as("y")),
        col("bt") === col("a.event_type") &&
          col("bd") === expr("date_add(a.day, lag)"))
      .select(col("a.event_type").as("event_type"), col("lag"),
        col("a.cents").as("x"), col("y"))
    val st = p.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
    st.select(col("event_type"), col("lag").cast(LongType).as("lag"),
        col("n"),
        expr("(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)"
          + " * CAST(sy AS DOUBLE))"
          + " / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
          + " * CAST(sx AS DOUBLE)) * sqrt(n * CAST(syy AS DOUBLE)"
          + " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))").as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Cryptographic digest surface (r16) — the hash functions a
    * pipeline keys provenance, sharding and dedup on, graded
    * end-to-end across engines: md5 and SHA-256 hex digests of a
    * canonical '|'-joined rendering (the `dq_table_checksum` row
    * spelling), plus first-hex-digit bucket counts per digest — the
    * uniformity a hash-partitioner relies on. Row-local; one 16-group
    * agg per digest. Spark `sha2(x, 256)` ≡ DuckDB `sha256(x)`
    * (lowercase hex both). xxhash64 has no DuckDB twin — it stays
    * covered by ShingleExpressionsSpec, not an oracle. */
  val fnHashDigests: QDef = q(
    "fn_hash_digests",
    """WITH h AS (
      |  SELECT c_custkey,
      |    md5(c_name || '|' || CAST(c_custkey AS VARCHAR)) AS d_md5,
      |    sha256(c_name || '|' || CAST(c_custkey AS VARCHAR)) AS d_sha
      |  FROM customer)
      |SELECT substr(d_md5, 1, 1) AS md5_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_md5,
      |  CAST(SUM(CASE WHEN substr(d_sha, 1, 1) = substr(d_md5, 1, 1)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sha_same_bucket,
      |  MIN(d_md5) AS min_md5, MIN(d_sha) AS min_sha
      |FROM h GROUP BY md5_bucket
      |ORDER BY md5_bucket""") { (s, d) =>
    val h = Tables.customer(s, d)
      .select(col("c_custkey"),
        md5(concat_ws("|", col("c_name"),
          col("c_custkey").cast(StringType))).as("d_md5"),
        sha2(concat_ws("|", col("c_name"),
          col("c_custkey").cast(StringType)), 256).as("d_sha"))
    h.groupBy(substring(col("d_md5"), 1, 1).as("md5_bucket"))
      .agg(count(lit(1)).as("n_md5"),
        sum(when(substring(col("d_sha"), 1, 1) ===
          substring(col("d_md5"), 1, 1), 1L).otherwise(0L))
          .as("n_sha_same_bucket"),
        min(col("d_md5")).as("min_md5"), min(col("d_sha")).as("min_sha"))
      .orderBy(col("md5_bucket"))
  }

  /** Clustering-depth layout audit (r16) — the metric a table-layout
    * optimizer (Delta OPTIMIZE / ZORDER) reports: how many zone-stat
    * intervals OVERLAP under a given row order. 64-row zones of
    * `orders` under (a) natural key order and (b) value-sorted order;
    * per zone the [min,max] of order cents, then the overlapping
    * zone-PAIR count — value-sorted zones only overlap where a tie
    * straddles a boundary, natural order overlaps almost everywhere,
    * and the ppm gap is exactly the row-group-skipping benefit a sort
    * would buy (`layout_zorder_skipping` grades the scan BILL; this
    * grades the STAT-OVERLAP structure that causes it). Zones are
    * metadata-scale (n/64 rows), so the pair check is a broadcast
    * zone×zone join — at 100 TB zone stats ARE the parquet footer
    * stats, still metadata. */
  val layoutClusteringDepth: QDef = q(
    "layout_clustering_depth",
    """WITH v AS (
      |  SELECT o_orderkey AS k,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |zr AS (
      |  SELECT 'natural' AS layout,
      |    (row_number() OVER (ORDER BY k) - 1) // 64 AS zone, cents
      |  FROM v
      |  UNION ALL
      |  SELECT 'sorted' AS layout,
      |    (row_number() OVER (ORDER BY cents, k) - 1) // 64 AS zone, cents
      |  FROM v),
      |zs AS (
      |  SELECT layout, zone, MIN(cents) AS mn, MAX(cents) AS mx
      |  FROM zr GROUP BY layout, zone),
      |ov AS (
      |  SELECT a.layout, CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs
      |  FROM zs a JOIN zs b
      |    ON a.layout = b.layout AND a.zone < b.zone
      |    AND a.mx >= b.mn AND b.mx >= a.mn
      |  GROUP BY a.layout),
      |nz AS (
      |  SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_zones
      |  FROM zs GROUP BY layout)
      |SELECT nz.layout, nz.n_zones,
      |  COALESCE(ov.n_overlap_pairs, 0) AS n_overlap_pairs,
      |  CAST(COALESCE(ov.n_overlap_pairs, 0) * 1000000
      |    // (nz.n_zones * (nz.n_zones - 1) // 2) AS BIGINT)
      |    AS overlap_ppm
      |FROM nz LEFT JOIN ov ON ov.layout = nz.layout
      |ORDER BY nz.layout""") { (s, d) =>
    // Spark side never runs an unpartitioned window: both global
    // ranks ride the shared bucketed two-pass exclusive-prefix
    // (DriftOps.exclusivePrefix — the shard_range_boundaries
    // machinery). The oracle's plain row_number() produces the
    // IDENTICAL ranks on DuckDB's side.
    val v = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val kc = v.select(col("k").as("v")).groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
    val kpre = DriftOps.exclusivePrefix(kc, expr("v div 10000"))
      .select(col("v").as("nk"), col("pre").as("npre"))
    val nat = v.join(kpre, col("nk") === col("k"))
      .select(lit("natural").as("layout"),
        expr("npre div 64").as("zone"), col("cents"))
    val cc = v.groupBy(col("cents").as("v")).agg(count(lit(1)).as("cnt"))
    val cpre = DriftOps.exclusivePrefix(cc, expr("v div 10000000"))
      .select(col("v").as("sv"), col("pre").as("spre"))
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cents")).orderBy(col("k"))
    val srt = v.join(cpre, col("sv") === col("cents"))
      .select(lit("sorted").as("layout"),
        ((col("spre") + row_number().over(wTie) - 1)).as("r"), col("cents"))
      .select(col("layout"), expr("r div 64").as("zone"), col("cents"))
    val zs = nat.unionAll(srt)
      .groupBy(col("layout"), col("zone"))
      .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ov = zs.as("a")
      .join(broadcast(zs.select(col("layout").as("bl"), col("zone").as("bz"),
          col("mn").as("bmn"), col("mx").as("bmx"))),
        col("bl") === col("a.layout") && col("a.zone") < col("bz") &&
          col("a.mx") >= col("bmn") && col("bmx") >= col("a.mn"))
      .groupBy(col("a.layout").as("ol")).agg(count(lit(1))
        .as("n_overlap_pairs"))
    val nz = zs.groupBy(col("layout")).agg(count(lit(1)).as("n_zones"))
    nz.join(broadcast(ov), col("ol") === col("layout"), "left")
      .select(col("layout"), col("n_zones"),
        coalesce(col("n_overlap_pairs"), lit(0L)).as("n_overlap_pairs"),
        expr("CAST(COALESCE(n_overlap_pairs, 0) * 1000000"
          + " div (n_zones * (n_zones - 1) div 2) AS BIGINT)")
          .as("overlap_ppm"))
      .orderBy(col("layout"))
  }

  /** Parquet bloom-filter source (r16) — the point-lookup layout
    * option the source matrix lacked: events re-written with a
    * parquet BLOOM FILTER on user_id (and stat-sorted rows so
    * min/max can't do the work instead), then a point predicate read
    * back and aggregated. The graded values prove the
    * bloom-decorated file round-trips losslessly (the oracle
    * aggregates the ORIGINAL fixture); SourcesSpec asserts the
    * footer actually carries the bloom offset — at scale the bloom
    * is what skips row groups for high-cardinality point predicates
    * where min/max zones are useless. */
  val sourceParquetBloom: QDef = q(
    "source_parquet_bloom",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS sum_cents,
      |  CAST(MIN(event_id) AS BIGINT) AS min_event_id
      |FROM events
      |WHERE user_id = 7
      |GROUP BY event_type ORDER BY event_type""") { (s, d) =>
    val out = graft.TempDirs.create("graft_bloomsrc")
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .sort(col("event_type"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#user_id", "true")
      .option("parquet.bloom.filter.expected.ndv#user_id", "1000")
      // dictionary OFF for the bloom column: parquet-mr skips the
      // bloom when every page is dictionary-encoded (the dictionary
      // already is an exact membership filter), so a low-cardinality
      // fixture would silently ship no bloom at all — disabling the
      // dictionary is the production pairing for a bloom column
      .option("parquet.enable.dictionary#user_id", "false")
      .parquet(out)
    s.read.parquet(out)
      .filter(col("user_id") === 7)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
          .cast(LongType).as("sum_cents"),
        min(col("event_id")).as("min_event_id"))
      .orderBy(col("event_type"))
  }

  /** Matryoshka truncation audit (r16) — the modern embedding-compression
    * question (MRL): if the index stores only the first k dimensions,
    * how often does the TRUNCATED inner product still pick the same
    * top-1 as the full vector, and how big is the score gap? Per dim
    * budget 16/32/64 over the md5-sampled query set: truncated and
    * full dots are the shared sequential float fold over the SLICED
    * arrays (round-6, D10), top-1 under (dot DESC, vec_id), the gap
    * floored to exact integer micro per pair so sums stay
    * order-independent (negative sums divide by bare truncating
    * div — identical in both engines per the r15 measurement). The
    * eval-tier answer to "can we ship the 16-dim index". */
  val embedMatryoshkaTruncation: QDef = q(
    "embed_matryoshka_truncation",
    s"""WITH q AS (
      |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'),
      |bud AS (SELECT * FROM (VALUES (16), (32), (64)) t(kd)),
      |pair AS (
      |  SELECT bud.kd, q.q_id, e.vec_id,
      |    ROUND(list_reduce(list_transform(range(1, bud.kd + 1),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)),
      |      (x, y) -> x + y), 6) AS dk,
      |    ROUND(list_reduce(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)),
      |      (x, y) -> x + y), 6) AS d64
      |  FROM embeddings e JOIN q ON e.vec_id <> q.q_id CROSS JOIN bud),
      |r AS (
      |  SELECT kd, q_id, vec_id,
      |    row_number() OVER (PARTITION BY kd, q_id
      |      ORDER BY dk DESC, vec_id) AS rk,
      |    row_number() OVER (PARTITION BY kd, q_id
      |      ORDER BY d64 DESC, vec_id) AS rf,
      |    CAST(floor((d64 - dk) * 1000000) AS BIGINT) AS gap_micro
      |  FROM pair),
      |t1 AS (
      |  SELECT kd, q_id,
      |    MAX(CASE WHEN rk = 1 THEN vec_id END) AS top_k,
      |    MAX(CASE WHEN rf = 1 THEN vec_id END) AS top_full,
      |    CAST(SUM(gap_micro) AS BIGINT) AS sum_gap,
      |    CAST(COUNT(*) AS BIGINT) AS np
      |  FROM r GROUP BY kd, q_id)
      |SELECT CAST(kd AS BIGINT) AS dim_budget,
      |  CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CAST(SUM(CASE WHEN top_k = top_full THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_top1_agree,
      |  CAST(SUM(CASE WHEN top_k = top_full THEN 1 ELSE 0 END) * 1000000
      |    // COUNT(*) AS BIGINT) AS agree_ppm,
      |  CAST(SUM(sum_gap) AS BIGINT) AS sum_gap_micro,
      |  CAST(SUM(sum_gap) // SUM(np) AS BIGINT) AS mean_gap_micro
      |FROM t1 GROUP BY kd ORDER BY dim_budget""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val qs = e.filter(
        substring(md5(col("vec_id").cast(StringType)), 1, 1) === "0")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val bud = Seq(16, 32, 64).toDF("kd")
    val pair = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .crossJoin(broadcast(bud))
      .select(col("kd"), col("q_id"), col("vec_id"),
        round(VecMath.fdot(expr("slice(embedding, 1, kd)"),
          expr("slice(q_emb, 1, kd)")), 6).as("dk"),
        round(VecMath.fdot(col("embedding"), col("q_emb")), 6).as("d64"))
    val wk = Window.partitionBy(col("kd"), col("q_id"))
      .orderBy(col("dk").desc, col("vec_id"))
    val wf = Window.partitionBy(col("kd"), col("q_id"))
      .orderBy(col("d64").desc, col("vec_id"))
    val r = pair.select(col("kd"), col("q_id"), col("vec_id"),
      row_number().over(wk).as("rk"), row_number().over(wf).as("rf"),
      expr("CAST(floor((d64 - dk) * 1000000) AS BIGINT)").as("gap_micro"))
    val t1 = r.groupBy(col("kd"), col("q_id"))
      .agg(max(when(col("rk") === 1, col("vec_id"))).as("top_k"),
        max(when(col("rf") === 1, col("vec_id"))).as("top_full"),
        sum(col("gap_micro")).as("sum_gap"), count(lit(1)).as("np"))
    t1.groupBy(col("kd"))
      .agg(count(lit(1)).as("n_queries"),
        count_if(col("top_k") === col("top_full")).as("n_top1_agree"),
        sum(col("sum_gap")).cast(LongType).as("sum_gap_micro"),
        sum(col("np")).as("tot_np"))
      .select(col("kd").cast(LongType).as("dim_budget"), col("n_queries"),
        col("n_top1_agree"),
        expr("CAST(n_top1_agree * 1000000 div n_queries AS BIGINT)")
          .as("agree_ppm"),
        col("sum_gap_micro"),
        expr("CAST(sum_gap_micro div tot_np AS BIGINT)")
          .as("mean_gap_micro"))
      .orderBy(col("dim_budget"))
  }

  /** Cohen's kappa inter-rater agreement (r16) — the eval-ops metric
    * behind every "do our two quality classifiers agree beyond
    * chance" readout: two deterministic binary raters over documents
    * (length rule n_chars ≥ 450; lexical-diversity rule distinct
    * tokens ≥ 70% of tokens — both verified non-degenerate at every
    * fixture tier), their 2×2 confusion, observed/expected agreement
    * in floor-ppm, and kappa in ppm via the all-integer
    * (n·(a+d) − E) / (n² − E) spelling (negative kappa divides by
    * bare truncating div — identical both engines; NULL-guarded if a
    * rater is constant). One scan + a 1-row fold. */
  val evalCohensKappa: QDef = q(
    "eval_cohens_kappa",
    """WITH r AS (
      |  SELECT CASE WHEN n_chars >= 450 THEN 1 ELSE 0 END AS ra,
      |    CASE WHEN len(list_distinct(string_split(text, ' '))) * 10
      |      >= len(string_split(text, ' ')) * 7 THEN 1 ELSE 0 END AS rb
      |  FROM documents),
      |c AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(ra * rb) AS BIGINT) AS a,
      |    CAST(SUM(ra * (1 - rb)) AS BIGINT) AS b,
      |    CAST(SUM((1 - ra) * rb) AS BIGINT) AS c2,
      |    CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS d2
      |  FROM r)
      |SELECT n, a, b, c2 AS c, d2 AS d,
      |  CAST((a + d2) * 1000000 // n AS BIGINT) AS po_ppm,
      |  CAST(((a + b) * (a + c2) + (c2 + d2) * (b + d2)) * 1000000
      |    // (n * n) AS BIGINT) AS pe_ppm,
      |  CASE WHEN n * n = (a + b) * (a + c2) + (c2 + d2) * (b + d2)
      |    THEN CAST(NULL AS BIGINT)
      |    ELSE CAST((n * (a + d2)
      |        - ((a + b) * (a + c2) + (c2 + d2) * (b + d2))) * 1000000
      |      // (n * n - ((a + b) * (a + c2) + (c2 + d2) * (b + d2)))
      |      AS BIGINT) END AS kappa_ppm
      |FROM c""") { (s, d) =>
    val r = Tables.documents(s, d)
      .select(
        when(col("n_chars") >= 450, 1L).otherwise(0L).as("ra"),
        when(size(array_distinct(split(col("text"), " "))) * 10 >=
          size(split(col("text"), " ")) * 7, 1L).otherwise(0L).as("rb"))
    val c = r.agg(count(lit(1)).as("n"),
      sum(col("ra") * col("rb")).as("a"),
      sum(col("ra") * (lit(1L) - col("rb"))).as("b"),
      sum((lit(1L) - col("ra")) * col("rb")).as("c2"),
      sum((lit(1L) - col("ra")) * (lit(1L) - col("rb"))).as("d2"))
    c.select(col("n"), col("a"), col("b"), col("c2").as("c"),
        col("d2").as("d"),
        expr("CAST((a + d2) * 1000000 div n AS BIGINT)").as("po_ppm"),
        expr("CAST(((a + b) * (a + c2) + (c2 + d2) * (b + d2)) * 1000000"
          + " div (n * n) AS BIGINT)").as("pe_ppm"),
        expr("CASE WHEN n * n = (a + b) * (a + c2) + (c2 + d2) * (b + d2)"
          + " THEN CAST(NULL AS BIGINT)"
          + " ELSE CAST((n * (a + d2)"
          + " - ((a + b) * (a + c2) + (c2 + d2) * (b + d2))) * 1000000"
          + " div (n * n - ((a + b) * (a + c2) + (c2 + d2) * (b + d2)))"
          + " AS BIGINT) END").as("kappa_ppm"))
  }

  /** Embedding-coverage data-quality audit (r16) — the multimodal
    * JOIN contract made visible: per language, how many documents
    * actually HAVE an embedding row (the fixture's defined behavior
    * is an inner join that silently drops the rest — this key is the
    * audit that says how much), coverage in floor-ppm and the first
    * uncovered doc id as the debugging pointer. One broadcast-able
    * left join + language agg. */
  val dqEmbeddingCoverage: QDef = q(
    "dq_embedding_coverage",
    """SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(e.vec_id) AS BIGINT) AS n_with_vec,
      |  CAST(COUNT(e.vec_id) * 1000000 // COUNT(*) AS BIGINT)
      |    AS coverage_ppm,
      |  CAST(MIN(CASE WHEN e.vec_id IS NULL THEN d.doc_id END) AS BIGINT)
      |    AS first_uncovered_doc
      |FROM documents d
      |LEFT JOIN embeddings e ON e.vec_id = d.doc_id
      |GROUP BY d.lang ORDER BY d.lang""") { (s, d) =>
    Tables.documents(s, d)
      .join(Tables.embeddings(s, d).select(col("vec_id")),
        col("vec_id") === col("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("vec_id")).as("n_with_vec"),
        expr("CAST(COUNT(vec_id) * 1000000 div COUNT(*) AS BIGINT)")
          .as("coverage_ppm"),
        min(when(col("vec_id").isNull, col("doc_id"))).as("first_uncovered_doc"))
      .orderBy(col("lang"))
  }

  /** Seasonality / trend strength (r16) — Hyndman's STL strength
    * measures over the SHARED decomposition core
    * (`EventAnalytics.decomposeCtes`/`decomposeMonthly` — the
    * kmvSample extraction pattern, so this key and
    * `ts_decompose_additive` cannot drift): F_trend = 1 −
    * Var(resid)/Var(deseasonalized), F_seasonal = 1 −
    * Var(resid)/Var(detrended), both clamped at 0 and reported in
    * floor-ppm from exact DECIMAL(38)/HUGEINT sum-of-squares over the
    * interior (trend-complete) months. THE one-number answer to "is
    * this series worth a seasonal model" that the decomposition table
    * itself doesn't state. ≤84-row algebra after the one fact agg. */
  val tsSeasonalStrength: QDef = q(
    "ts_seasonal_strength",
    s"""WITH ${EventAnalytics.decomposeCtes},
      |x AS (
      |  SELECT tr.rev - tr.trend - se.seasonal AS r,
      |    tr.rev - tr.trend AS dt, tr.rev - se.seasonal AS ds
      |  FROM tr JOIN se ON se.mo = tr.mo
      |  WHERE tr.trend IS NOT NULL),
      |f AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(r AS HUGEINT)) AS sr, SUM(CAST(r AS HUGEINT) * r) AS qr,
      |    SUM(CAST(dt AS HUGEINT)) AS sdt,
      |    SUM(CAST(dt AS HUGEINT) * dt) AS qdt,
      |    SUM(CAST(ds AS HUGEINT)) AS sds,
      |    SUM(CAST(ds AS HUGEINT) * ds) AS qds
      |  FROM x)
      |SELECT n,
      |  CASE WHEN n * qds - sds * sds = 0 THEN CAST(NULL AS BIGINT)
      |    ELSE GREATEST(CAST(1000000 - (n * qr - sr * sr) * 1000000
      |      // (n * qds - sds * sds) AS BIGINT), 0) END
      |    AS strength_trend_ppm,
      |  CASE WHEN n * qdt - sdt * sdt = 0 THEN CAST(NULL AS BIGINT)
      |    ELSE GREATEST(CAST(1000000 - (n * qr - sr * sr) * 1000000
      |      // (n * qdt - sdt * sdt) AS BIGINT), 0) END
      |    AS strength_seasonal_ppm
      |FROM f""") { (s, d) =>
    val x = EventAnalytics.decomposeMonthly(s, d)
      .filter(col("trend").isNotNull)
      .select((col("rev") - col("trend") - col("seasonal")).as("r"),
        (col("rev") - col("trend")).as("dt"),
        (col("rev") - col("seasonal")).as("ds"))
    val f = x.agg(count(lit(1)).as("n"),
      sum(expr("CAST(r AS DECIMAL(38,0))")).as("sr"),
      sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("qr"),
      sum(expr("CAST(dt AS DECIMAL(38,0))")).as("sdt"),
      sum(expr("CAST(dt AS DECIMAL(38,0)) * dt")).as("qdt"),
      sum(expr("CAST(ds AS DECIMAL(38,0))")).as("sds"),
      sum(expr("CAST(ds AS DECIMAL(38,0)) * ds")).as("qds"))
    f.select(col("n"),
      expr("CASE WHEN n * qds - sds * sds = 0 THEN CAST(NULL AS BIGINT)"
        + " ELSE GREATEST(CAST(1000000 - (n * qr - sr * sr) * 1000000"
        + " div (n * qds - sds * sds) AS BIGINT), 0) END")
        .as("strength_trend_ppm"),
      expr("CASE WHEN n * qdt - sdt * sdt = 0 THEN CAST(NULL AS BIGINT)"
        + " ELSE GREATEST(CAST(1000000 - (n * qr - sr * sr) * 1000000"
        + " div (n * qdt - sdt * sdt) AS BIGINT), 0) END")
        .as("strength_seasonal_ppm"))
  }

  /** Column-profile matrix (r16) — the DESCRIBE-style profiler output
    * `profile_orders` (one wide row) never surfaced as a per-column
    * TABLE: for each of the six orders columns, row count, distinct
    * count and canonical min/max renderings (decimals via
    * DECIMAL(12,2), dates via DATE — spellings both engines render
    * identically). ONE pass: a single aggregate computes every
    * distinct count (Catalyst Expand fan-out = #columns — the
    * standard profiler plan) and the matrix rows are row-local
    * projections unioned after it. */
  val profileColumnMatrix: QDef = q(
    "profile_column_matrix",
    """WITH a AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_ok,
      |    CAST(MIN(o_orderkey) AS VARCHAR) AS mn_ok,
      |    CAST(MAX(o_orderkey) AS VARCHAR) AS mx_ok,
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_ck,
      |    CAST(MIN(o_custkey) AS VARCHAR) AS mn_ck,
      |    CAST(MAX(o_custkey) AS VARCHAR) AS mx_ck,
      |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_st,
      |    MIN(o_orderstatus) AS mn_st, MAX(o_orderstatus) AS mx_st,
      |    CAST(COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(12,2)))
      |      AS BIGINT) AS nd_tp,
      |    CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
      |      AS mn_tp,
      |    CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
      |      AS mx_tp,
      |    CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
      |      AS nd_od,
      |    CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS mn_od,
      |    CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS mx_od,
      |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd_op,
      |    MIN(o_orderpriority) AS mn_op, MAX(o_orderpriority) AS mx_op
      |  FROM orders)
      |SELECT col_name, n, n_distinct, min_repr, max_repr FROM (
      |  SELECT 'o_orderkey' AS col_name, n, nd_ok AS n_distinct,
      |    mn_ok AS min_repr, mx_ok AS max_repr FROM a
      |  UNION ALL SELECT 'o_custkey', n, nd_ck, mn_ck, mx_ck FROM a
      |  UNION ALL SELECT 'o_orderstatus', n, nd_st, mn_st, mx_st FROM a
      |  UNION ALL SELECT 'o_totalprice', n, nd_tp, mn_tp, mx_tp FROM a
      |  UNION ALL SELECT 'o_orderdate', n, nd_od, mn_od, mx_od FROM a
      |  UNION ALL SELECT 'o_orderpriority', n, nd_op, mn_op, mx_op FROM a)
      |ORDER BY col_name""") { (s, d) =>
    val a = Tables.orders(s, d).agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("nd_ok"),
      min(col("o_orderkey")).cast(StringType).as("mn_ok"),
      max(col("o_orderkey")).cast(StringType).as("mx_ok"),
      countDistinct(col("o_custkey")).as("nd_ck"),
      min(col("o_custkey")).cast(StringType).as("mn_ck"),
      max(col("o_custkey")).cast(StringType).as("mx_ck"),
      countDistinct(col("o_orderstatus")).as("nd_st"),
      min(col("o_orderstatus")).as("mn_st"),
      max(col("o_orderstatus")).as("mx_st"),
      countDistinct(col("o_totalprice").cast(DecimalType(12, 2)))
        .as("nd_tp"),
      min(col("o_totalprice").cast(DecimalType(12, 2))).cast(StringType)
        .as("mn_tp"),
      max(col("o_totalprice").cast(DecimalType(12, 2))).cast(StringType)
        .as("mx_tp"),
      countDistinct(col("o_orderdate").cast(DateType)).as("nd_od"),
      min(col("o_orderdate").cast(DateType)).cast(StringType).as("mn_od"),
      max(col("o_orderdate").cast(DateType)).cast(StringType).as("mx_od"),
      countDistinct(col("o_orderpriority")).as("nd_op"),
      min(col("o_orderpriority")).as("mn_op"),
      max(col("o_orderpriority")).as("mx_op"))
    def row(name: String, nd: String, mn: String, mx: String) =
      a.select(lit(name).as("col_name"), col("n"),
        col(nd).as("n_distinct"), col(mn).as("min_repr"),
        col(mx).as("max_repr"))
    row("o_orderkey", "nd_ok", "mn_ok", "mx_ok")
      .unionAll(row("o_custkey", "nd_ck", "mn_ck", "mx_ck"))
      .unionAll(row("o_orderstatus", "nd_st", "mn_st", "mx_st"))
      .unionAll(row("o_totalprice", "nd_tp", "mn_tp", "mx_tp"))
      .unionAll(row("o_orderdate", "nd_od", "mn_od", "mx_od"))
      .unionAll(row("o_orderpriority", "nd_op", "mn_op", "mx_op"))
      .orderBy(col("col_name"))
  }

  /** All round-16 graded queries, in registry order. */
  val all: Seq[QDef] = Seq(
    dedupClusterIncremental, statsWelchT, abPowerSampleSize,
    winRollingCorr, sketchBloomMerge, privacyContributionCapping,
    splitTimeBased, evalNdcgAt10, dqIqrOutliers, graphLocalClustering,
    reportSeasonalityIndex, eventsMarkovStationary, simMipsTopk,
    joinSpatialGrid, statsPropZtest, tsAcfLags,
    fnHashDigests, layoutClusteringDepth, sourceParquetBloom,
    embedMatryoshkaTruncation, evalCohensKappa, dqEmbeddingCoverage,
    tsSeasonalStrength, profileColumnMatrix)
}
