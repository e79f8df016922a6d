package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import graft.Protocol._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution-drift monitors (r11c) — the checks a production
  * training-data pipeline runs between ingest batches: has the value
  * distribution moved, have the embeddings moved? Both are graded
  * with exact integer statistics (counts, floor-ppm shares, milli-
  * quantized component sums), so the monitors hash-match the oracle
  * bit-for-bit; no KL/PSI logarithms appear because libm `ln` is not
  * correctly-rounded across engines — the per-bin deltas carry the
  * same signal.
  */
object DriftOps {

  /** Value-histogram drift: events bucketed into 10 fixed-width
    * cents bins, first half-month (ref) vs second (cur), per-bin
    * counts + floor-ppm shares + delta. Two aggregate passes over
    * the fact (cohort is a row-local projection, never a join); the
    * bin scaffold is a literal 10-row range so empty bins surface as
    * zeros instead of vanishing. At 100 TB: shuffles carry
    * 2×10 partial rows per map task — nothing scales with data. */
  val driftValueHistogram: QDef = q(
    "drift_value_histogram",
    """WITH e AS (
      |  SELECT CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents,
      |    CASE WHEN CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INT) <= 15
      |      THEN 'ref' ELSE 'cur' END AS cohort
      |  FROM events),
      |b AS (
      |  SELECT cohort, LEAST(9, GREATEST(0, cents // 5000)) AS bin,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM e GROUP BY cohort, LEAST(9, GREATEST(0, cents // 5000))),
      |t AS (SELECT cohort, CAST(sum(n) AS BIGINT) AS tot FROM b GROUP BY cohort),
      |bins AS (SELECT unnest(range(0, 10)) AS bin)
      |SELECT bins.bin,
      |  COALESCE(r.n, 0) AS n_ref, COALESCE(c.n, 0) AS n_cur,
      |  COALESCE((r.n * 1000000) // rt.tot, 0) AS ref_ppm,
      |  COALESCE((c.n * 1000000) // ct.tot, 0) AS cur_ppm,
      |  COALESCE((c.n * 1000000) // ct.tot, 0)
      |    - COALESCE((r.n * 1000000) // rt.tot, 0) AS delta_ppm
      |FROM bins
      |LEFT JOIN b r ON r.cohort = 'ref' AND r.bin = bins.bin
      |LEFT JOIN b c ON c.cohort = 'cur' AND c.bin = bins.bin
      |LEFT JOIN t rt ON rt.cohort = 'ref'
      |LEFT JOIN t ct ON ct.cohort = 'cur'
      |ORDER BY bins.bin""") { (s, d) =>
    val e = Tables.events(s, d).select(
      (qty(col("value")) * 100).cast(LongType).as("cents"),
      when(dayofmonth(col("ts")) <= 15, "ref").otherwise("cur").as("cohort"))
    // GREATEST(0, ·) clamp (ADVICE r11; premise corrected r15: DuckDB
    // 1.0.0's integer `//` truncates exactly like `div`, so the
    // engines agree even on negatives) — kept because trunc division
    // would fold negative cents into bin 0 silently; the clamp makes
    // the sub-zero bin an explicit, documented decision on both sides.
    val b = e.groupBy(col("cohort"),
        least(lit(9L), greatest(lit(0L), expr("cents div 5000"))).as("bin"))
      .agg(count(lit(1)).as("n"))
    val t = b.groupBy(col("cohort")).agg(sum(col("n")).as("tot"))
    val bins = s.range(0, 10).select(col("id").as("bin"))
    val r = b.filter(col("cohort") === "ref").select(col("bin").as("rb"), col("n").as("rn"))
    val c = b.filter(col("cohort") === "cur").select(col("bin").as("cb"), col("n").as("cn"))
    val rt = t.filter(col("cohort") === "ref").select(col("tot").as("rtot"))
    val ct = t.filter(col("cohort") === "cur").select(col("tot").as("ctot"))
    // LEFT joins on lit(true), not crossJoin (ADVICE r11): if a cohort
    // is empty (all timestamps in one half-month), a crossJoin with
    // its empty one-row total table would annihilate all 10 scaffold
    // bins, while the oracle's LEFT JOIN keeps them with COALESCE'd
    // zeros. The left join preserves the scaffold; the NULL total
    // makes each ppm NULL → coalesced 0, matching the oracle.
    bins.join(broadcast(r), col("bin") === col("rb"), "left")
      .join(broadcast(c), col("bin") === col("cb"), "left")
      .join(broadcast(rt), lit(true), "left")
      .join(broadcast(ct), lit(true), "left")
      .select(col("bin"),
        coalesce(col("rn"), lit(0L)).as("n_ref"),
        coalesce(col("cn"), lit(0L)).as("n_cur"),
        coalesce(expr("(rn * 1000000) div rtot"), lit(0L)).as("ref_ppm"),
        coalesce(expr("(cn * 1000000) div ctot"), lit(0L)).as("cur_ppm"),
        (coalesce(expr("(cn * 1000000) div ctot"), lit(0L))
          - coalesce(expr("(rn * 1000000) div rtot"), lit(0L))).as("delta_ppm"))
      .orderBy(col("bin"))
  }

  /** Embedding-centroid drift: per label, the cosine between the
    * even-id and odd-id cohorts' centroid directions. Components are
    * milli-quantized (floor(x·1000 + 0.5) — the same portable
    * half-up `embed_quantize_int8` uses), summed per (label, cohort,
    * position) as exact longs, reduced to FLOOR-MEAN centroid
    * components (r13 — cohort-size-invariant |ce| ≤ 1000, keeping
    * every downstream sum exact far below 2^53 at any scale), and
    * the cosine is ONE identical float expression tree over those
    * exact integers — bit-equal across engines. Scale-aware: the dimension explode shuffles
    * labels×cohorts×dims partial rows (map-side combined), never
    * vectors; the cohort pairing joins tables of that same bounded
    * size. Positions are engine-local (0- vs 1-based) — they only
    * pair sums within an engine and never reach the output. */
  val driftEmbeddingCentroid: QDef = q(
    "drift_embedding_centroid",
    """WITH q AS (
      |  SELECT vec_id, label, vec_id % 2 AS cohort, t.pos AS pos,
      |    CAST(floor(CAST(embedding[t.pos] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS milli
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(pos)),
      |c AS (
      |  SELECT label, cohort, pos, CAST(sum(milli) AS BIGINT) AS s,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM q GROUP BY label, cohort, pos),
      |pairs AS (
      |  SELECT a.label, a.pos, a.s AS se, b.s AS so, a.n AS ne, b.n AS no_
      |  FROM c a JOIN c b ON a.label = b.label AND a.pos = b.pos
      |  WHERE a.cohort = 0 AND b.cohort = 1),
      |cent AS (
      |  SELECT label, pos, ne, no_,
      |    (se - ((se % ne) + ne) % ne) // ne AS ce,
      |    (so - ((so % no_) + no_) % no_) // no_ AS co
      |  FROM pairs),
      |dots AS (
      |  SELECT label, CAST(min(ne) AS BIGINT) AS n_even, CAST(min(no_) AS BIGINT) AS n_odd,
      |    CAST(sum(ce * co) AS DOUBLE) AS dot,
      |    CAST(sum(ce * ce) AS DOUBLE) AS ee, CAST(sum(co * co) AS DOUBLE) AS oo
      |  FROM cent GROUP BY label)
      |SELECT label, n_even, n_odd, dot / (sqrt(ee) * sqrt(oo)) AS centroid_cosine
      |FROM dots ORDER BY label""") { (s, d) =>
    // defaultParallelism, not a hardcoded 32 (ADVICE r11): the
    // pre-explode spread should track the session's actual
    // parallelism, not bake a magic width into the plan.
    val qv = Tables.embeddings(s, d).repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("label"), (col("vec_id") % 2).as("cohort"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("cohort"), col("pos"),
        floor(col("x").cast(DoubleType) * 1000 + 0.5).cast(LongType).as("milli"))
    val c = qv.groupBy(col("label"), col("cohort"), col("pos"))
      .agg(sum(col("milli")).as("s"), count(lit(1)).as("n"))
    val even = c.filter(col("cohort") === 0)
      .select(col("label"), col("pos"), col("s").as("se"), col("n").as("ne"))
    val odd = c.filter(col("cohort") === 1)
      .select(col("label").as("l2"), col("pos").as("p2"),
        col("s").as("so"), col("n").as("no_"))
    // r13 range-safe rescale: the r12 form summed se·so products of
    // raw component SUMS through DECIMAL(38,0) and cast the result to
    // DOUBLE — a sum that grows with cohort-size² and lands in DuckDB
    // 1.0.0's int128→DOUBLE 1-ulp misround zone above ~2^63 (PLANS.md,
    // measured). The cosine is now taken between the FLOOR-MEAN
    // centroid vectors (milli-mean per position, exact floor division
    // spelled (s − pmod(s, n)) div n because Spark's `div` truncates
    // toward zero while DuckDB's `//` floors — they disagree on
    // negative sums): |ce| ≤ 1000 regardless of cohort size, so every
    // sum below is ≤ dims·1e6 ≈ 6.4e7 — exact in both engines at ANY
    // scale, no wide decimal ever reaching a float cast.
    even.join(odd, col("label") === col("l2") && col("pos") === col("p2"))
      .select(col("label"), col("ne"), col("no_"),
        expr("(se - pmod(se, ne)) div ne").as("ce"),
        expr("(so - pmod(so, no_)) div no_").as("co"))
      .groupBy(col("label"))
      .agg(min(col("ne")).as("n_even"), min(col("no_")).as("n_odd"),
        sum(col("ce") * col("co")).as("dotl"),
        sum(col("ce") * col("ce")).as("eel"),
        sum(col("co") * col("co")).as("ool"))
      .select(col("label"), col("n_even"), col("n_odd"),
        (col("dotl").cast(DoubleType)
          / (sqrt(col("eel").cast(DoubleType)) * sqrt(col("ool").cast(DoubleType))))
          .as("centroid_cosine"))
      .orderBy(col("label"))
  }

  /** Chi-square independence audit (r12) — is document source
    * independent of language? The composition monitor a corpus
    * pipeline alarms on (a source suddenly feeding one language =
    * scraper drift), and the classic feature-relevance statistic.
    * Determinism: no logarithms — each cell's contribution is the
    * rational ((O·N − rt·ct)²) / (N·rt·ct), whose square/division are
    * single correctly-rounded IEEE ops on exactly-representable
    * integer operands (products stay far below 2^53 at graded SFs),
    * then the established per-term DECIMAL(28,18) quantization +
    * exact sum + milli-unit floor makes the per-lang total order-
    * independent across engines. EMPTY cells are scaffolded in (a
    * zero-observation cell still contributes E = rt·ct/N) via the
    * cross of the two tiny marginal tables — at 100 TB the scaffold
    * is |langs|×|sources|, nothing scales with the corpus: one
    * wordcount-shaped shuffle to the contingency table, broadcast
    * marginals after. */
  val statsChiSquare: QDef = q(
    "stats_chi_square",
    """WITH o AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
      |  FROM documents GROUP BY lang, source),
      |rt AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS rtot FROM o GROUP BY lang),
      |ct AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS ctot FROM o GROUP BY source),
      |n AS (SELECT CAST(SUM(obs) AS BIGINT) AS ntot FROM o),
      |cells AS (
      |  SELECT rt.lang, rt.rtot, ct.source, ct.ctot,
      |    COALESCE(o.obs, 0) AS obs, n.ntot
      |  FROM rt CROSS JOIN ct CROSS JOIN n
      |  LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source),
      |terms AS (
      |  SELECT lang, rtot,
      |    CAST(CAST(obs * ntot - rtot * ctot AS DOUBLE)
      |      * CAST(obs * ntot - rtot * ctot AS DOUBLE)
      |      / (CAST(ntot AS DOUBLE) * rtot * ctot)
      |      AS DECIMAL(28,18)) AS term
      |  FROM cells)
      |SELECT lang, rtot AS n_docs,
      |  CAST(floor(CAST(SUM(term) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      |    AS chi2_part_milli
      |FROM terms GROUP BY lang, rtot
      |ORDER BY lang""") { (s, d) =>
    val o = Tables.documents(s, d)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("obs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rt = o.groupBy(col("lang")).agg(sum(col("obs")).cast(LongType).as("rtot"))
    val ct = o.groupBy(col("source")).agg(sum(col("obs")).cast(LongType).as("ctot"))
    val n = o.agg(sum(col("obs")).cast(LongType).as("ntot"))
    val cells = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(n))
      .join(o.select(col("lang").as("ol"), col("source").as("os"), col("obs")),
        col("ol") === col("lang") && col("os") === col("source"), "left")
      .select(col("lang"), col("rtot"),
        coalesce(col("obs"), lit(0L)).as("obs"), col("ntot"), col("ctot"))
    cells
      .withColumn("term", expr(
        """CAST(CAST(obs * ntot - rtot * ctot AS DOUBLE)
          |  * CAST(obs * ntot - rtot * ctot AS DOUBLE)
          |  / (CAST(ntot AS DOUBLE) * rtot * ctot)
          |  AS DECIMAL(28,18))""".stripMargin))
      .groupBy(col("lang"), col("rtot"))
      .agg(sum(col("term")).as("t"))
      .select(col("lang"), col("rtot").as("n_docs"),
        floor(col("t").cast(DoubleType) * 1000 + 0.5).cast(LongType)
          .as("chi2_part_milli"))
      .orderBy(col("lang"))
  }

  /** Dominant principal component of the embedding cloud (r12b) —
    * two fixed rounds of power iteration on the (uncentered) Gram
    * matrix, the monitoring twin of drift_embedding_centroid: a
    * shifting top component is the first symptom of an embedding
    * regime change. The Spark plan is MATRIX-FREE — the Gram matrix
    * is never materialized: each round computes the per-row scalar
    * s_r = ⟨m_r, v⟩ with the codegen'd `graft_dot_long` against the
    * broadcast dim-sized v (row-local, zero shuffle), then one
    * dim-keyed hash agg for u_i = Σ_r m_ri·s_r — shuffle carries
    * |dims| partials per map task regardless of corpus size. That is
    * the standard distributed power-iteration/PCA shape at 100 TB.
    * Determinism: embeddings quantize to milli ints, every product
    * and sum stays in BIGINT (magnitude audit: |m|≤578 quantized,
    * s ≤ 64·578·1000 ≈ 3.7e7, u ≤ rows·578·s ≈ 4.3e13 at sf0.1 —
    * far inside 2^63), and the per-round renormalization is the
    * sign-safe floor division used by win_pct_change (Spark `div`
    * truncates, DuckDB `//` floors — they agree only after the
    * CASE-decomposition on sign). The oracle spells the same
    * iteration as explicit join-aggregates over the exploded
    * (vec_id, pos, m) table — two independent formulations, one
    * exact-integer answer. */
  val embedTopComponent: QDef = q(
    "embed_top_component",
    """WITH e AS (
      |  SELECT vec_id, t.pos AS pos,
      |    CAST(floor(CAST(embedding[t.pos] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS m
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(pos)),
      |s1 AS (
      |  SELECT vec_id, CAST(SUM(m * 1000) AS BIGINT) AS s FROM e GROUP BY vec_id),
      |u1 AS (
      |  SELECT e.pos, CAST(SUM(e.m * s1.s) AS BIGINT) AS u
      |  FROM e JOIN s1 USING (vec_id) GROUP BY e.pos),
      |m1 AS (SELECT GREATEST(CAST(MAX(abs(u)) AS BIGINT), 1) AS mx FROM u1),
      |v1 AS (
      |  SELECT pos,
      |    CASE WHEN u < 0 THEN -((-u * 1000) // mx) ELSE (u * 1000) // mx END AS v
      |  FROM u1, m1),
      |s2 AS (
      |  SELECT e.vec_id, CAST(SUM(e.m * v1.v) AS BIGINT) AS s
      |  FROM e JOIN v1 USING (pos) GROUP BY e.vec_id),
      |u2 AS (
      |  SELECT e.pos, CAST(SUM(e.m * s2.s) AS BIGINT) AS u
      |  FROM e JOIN s2 USING (vec_id) GROUP BY e.pos),
      |m2 AS (SELECT GREATEST(CAST(MAX(abs(u)) AS BIGINT), 1) AS mx FROM u2)
      |SELECT CAST(pos AS BIGINT) AS pos,
      |  CAST(CASE WHEN u < 0 THEN -((-u * 1000) // mx) ELSE (u * 1000) // mx END
      |    AS BIGINT) AS v_milli
      |FROM u2, m2
      |ORDER BY pos""") { (s, d) =>
    import graft.functions.VectorFunctions.longDot
    val base = Tables.embeddings(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))")
        .as("marr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // v0 = all-ones (milli): constant array, length taken from any row
    val v0 = base.limit(1)
      .select(expr("transform(marr, x -> 1000L)").as("varr"))
    // one round: u_i = Σ_r m_ri · ⟨m_r, v⟩, then sign-safe renorm to milli
    def round(vTbl: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val u = base.crossJoin(broadcast(vTbl))
        .select(col("marr"), longDot(col("marr"), col("varr")).as("s"))
        .select(posexplode(col("marr")).as(Seq("pos0", "m")), col("s"))
        .groupBy(col("pos0")).agg(sum(col("m") * col("s")).as("u"))
      val mx = u.agg(greatest(max(abs(col("u"))), lit(1L)).as("mx"))
      u.crossJoin(broadcast(mx))
        .select(col("pos0"), expr(
          "CASE WHEN u < 0 THEN -((-u * 1000L) div mx) ELSE (u * 1000L) div mx END")
          .as("v"))
    }
    def pack(vRows: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      vRows.agg(expr("sort_array(collect_list(struct(pos0, v)))").as("sv"))
        .select(expr("transform(sv, e -> e.v)").as("varr"))
    val v2 = round(pack(round(v0)))
    v2.select((col("pos0") + 1).cast(LongType).as("pos"),
        col("v").cast(LongType).as("v_milli"))
      .orderBy(col("pos"))
  }

  /** Pairwise-cosine histogram per label (r12b) — the similarity-
    * distribution monitor a dedup/clustering pipeline watches: a mass
    * shift toward bucket 9–10 means near-duplicate contamination, a
    * flattening means the embedding space is collapsing. Pairs are
    * label-blocked (the dedup_near_embedding discipline — never
    * all-pairs: per-label C(n,2), which at 100 TB becomes the
    * LSH-bucketed estimate with the same histogram shape). Cosines
    * ride the fused codegen expression, protocol-rounded to 6
    * decimals, then decile-bucketed by floor — both engines bucket
    * identical doubles identically. */
  val embedCosineHistogram: QDef = q(
    "embed_cosine_histogram",
    s"""WITH p AS (
      |  SELECT a.label,
      |    CAST(floor(${graft.ops.VecMath.sqlCosine("a.embedding", "b.embedding")}
      |      * 10) AS BIGINT) AS bucket
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id)
      |SELECT label, bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM p GROUP BY label, bucket
      |ORDER BY label, bucket""") { (s, d) =>
    import graft.ops.VecMath.fcosine
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = e.select(col("vec_id").as("va"), col("label"),
      col("embedding").as("ea"))
    // spread the probe side (one-file scan = one partition) — the
    // pair join itself is label-blocked
    val b = e.repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id").as("vb"), col("label").as("lb"),
        col("embedding").as("eb"))
    b.join(broadcast(a), col("label") === col("lb") && col("va") < col("vb"))
      .select(col("label"),
        floor(fcosine(col("ea"), col("eb")) * 10).cast(LongType).as("bucket"))
      .groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("label"), col("bucket"))
  }

  /** One-sided CUSUM drift alarm (r12c) — the sequential change
    * detector the histogram monitors can't replace (it accumulates
    * small persistent shifts that never trip a per-day threshold).
    * Per event type over daily cents totals: C_t = max(0, C_{t-1} +
    * (x_t − μ)) via its windowed closed form C_t = S_t − min(0,
    * min_{k≤t} S_k) — two frames over the same per-type day order, no
    * recursion, all integer. μ is the per-type floor mean (totals
    * positive ⇒ truncate = floor on both engines); the alarm
    * threshold is one mean day's volume. Windows partition by type
    * over the DAY-level aggregate — width follows days, never raw
    * events. */
  val tsCusumAlarm: QDef = q(
    "ts_cusum_alarm",
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mu,
      |    CAST(COUNT(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY event_type),
      |s AS (
      |  SELECT daily.event_type, day, mu, n_days,
      |    SUM(cents - mu) OVER (PARTITION BY daily.event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM daily JOIN m ON daily.event_type = m.event_type),
      |c AS (
      |  SELECT event_type, mu, n_days,
      |    run - LEAST(0, MIN(run) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum
      |  FROM s)
      |SELECT event_type,
      |  CAST(MAX(n_days) AS BIGINT) AS n_days,
      |  CAST(MAX(mu) AS BIGINT) AS mu_cents,
      |  CAST(MAX(cusum) AS BIGINT) AS max_cusum,
      |  CAST(SUM(CASE WHEN cusum > mu THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_alarm_days
      |FROM c GROUP BY event_type ORDER BY event_type""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (qty(col("value")) * 100).cast(LongType).as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("cents"))
    val m = daily.groupBy(col("event_type"))
      .agg(expr("CAST(sum(cents) div count(*) AS BIGINT)").as("mu"),
        count(lit(1)).as("n_days"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cus = daily.join(broadcast(m), "event_type")
      .select(col("event_type"), col("day"), col("mu"), col("n_days"),
        sum(col("cents") - col("mu")).over(w).as("run"))
      .select(col("event_type"), col("mu"), col("n_days"),
        (col("run") - least(lit(0L), min(col("run")).over(w))).as("cusum"))
    cus.groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"), max(col("mu")).as("mu_cents"),
        max(col("cusum")).as("max_cusum"),
        sum(when(col("cusum") > col("mu"), 1L).otherwise(0L))
          .as("n_alarm_days"))
      .orderBy(col("event_type"))
  }

  /** Jensen–Shannon divergence between cohort unigram distributions
    * (r12c) — the symmetric, bounded corpus-drift number PSI/KL
    * dashboards quote; cohorts are even/odd doc_id halves. Float
    * discipline is text_term_entropy's: each term's ln is rounded to
    * 6 digits then quantized to DECIMAL(28,6) and multiplied by the
    * INTEGER term count, so both cohort sums are exact decimal (no
    * float accumulation order), and the output edge is one
    * identically-spelled float tree. The ln argument 2p/(p+q) is
    * cleared of its inner divisions: with a = cp·Nq and b = cq·Np
    * (exact BIGINTs < 2⁵³) it is 2a/(a+b) — one exact-input double
    * division per term per side. Terms absent from one cohort
    * contribute only to the other (0·ln 0 = 0), scaffolded by a full
    * outer term join. Shuffles carry (cohort, term) partials —
    * vocabulary-sized, never the token stream. */
  val driftUnigramJsd: QDef = q(
    "drift_unigram_jsd",
    """WITH tok AS (
      |  SELECT doc_id % 2 AS coh, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT coh, term, CAST(COUNT(*) AS BIGINT) AS c
      |       FROM tok GROUP BY coh, term),
      |n AS (SELECT coh, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY coh),
      |p AS (SELECT term, c AS cp FROM tf WHERE coh = 0),
      |qq AS (SELECT term AS tq, c AS cq FROM tf WHERE coh = 1),
      |j AS (
      |  SELECT COALESCE(cp, 0) AS cp, COALESCE(cq, 0) AS cq
      |  FROM p FULL OUTER JOIN qq ON p.term = qq.tq),
      |np AS (SELECT n AS np FROM n WHERE coh = 0),
      |nq AS (SELECT n AS nq FROM n WHERE coh = 1),
      |t AS (
      |  SELECT cp, cq, cp * nq AS a, cq * np AS b FROM j, np, nq),
      |s AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN cp > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_terms_ref,
      |    CAST(SUM(CASE WHEN cq > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_terms_cur,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms_union,
      |    SUM(CASE WHEN cp > 0 THEN CAST(cp AS DECIMAL(12,0))
      |      * CAST(ROUND(ln(2.0 * a / (a + b)), 6) AS DECIMAL(28,6)) END)
      |      AS sp,
      |    SUM(CASE WHEN cq > 0 THEN CAST(cq AS DECIMAL(12,0))
      |      * CAST(ROUND(ln(2.0 * b / (a + b)), 6) AS DECIMAL(28,6)) END)
      |      AS sq
      |  FROM t)
      |SELECT n_terms_ref, n_terms_cur, n_terms_union,
      |  (SELECT np FROM np) AS n_tokens_ref,
      |  (SELECT nq FROM nq) AS n_tokens_cur,
      |  0.5 * (CAST(sp AS DOUBLE) / (SELECT np FROM np)
      |       + CAST(sq AS DOUBLE) / (SELECT nq FROM nq)) AS jsd_nats
      |FROM s""") { (s, d) =>
    val tok = Tables.documents(s, d)
      .select((col("doc_id") % 2).as("coh"),
        explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy(col("coh"), col("term"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = tf.groupBy(col("coh")).agg(sum(col("c")).cast(LongType).as("n"))
    val p = tf.filter(col("coh") === 0).select(col("term"), col("c").as("cp"))
    val qd = tf.filter(col("coh") === 1)
      .select(col("term").as("tq"), col("c").as("cq"))
    val j = p.join(qd, col("term") === col("tq"), "full")
      .select(coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"))
    val np = n.filter(col("coh") === 0).select(col("n").as("np"))
    val nq = n.filter(col("coh") === 1).select(col("n").as("nq"))
    val t = j.crossJoin(broadcast(np)).crossJoin(broadcast(nq))
      .select(col("cp"), col("cq"), col("np"), col("nq"),
        (col("cp") * col("nq")).as("a"), (col("cq") * col("np")).as("b"))
    def lnTerm(num: org.apache.spark.sql.Column) =
      round(log(lit(2.0) * num / (col("a") + col("b"))), 6)
        .cast(DecimalType(28, 6))
    t.agg(
        sum(when(col("cp") > 0, 1L).otherwise(0L)).as("n_terms_ref"),
        sum(when(col("cq") > 0, 1L).otherwise(0L)).as("n_terms_cur"),
        count(lit(1)).as("n_terms_union"),
        max(col("np")).as("n_tokens_ref"),
        max(col("nq")).as("n_tokens_cur"),
        sum(when(col("cp") > 0,
          col("cp").cast(DecimalType(12, 0)) * lnTerm(col("a")))).as("sp"),
        sum(when(col("cq") > 0,
          col("cq").cast(DecimalType(12, 0)) * lnTerm(col("b")))).as("sq"))
      .select(col("n_terms_ref"), col("n_terms_cur"), col("n_terms_union"),
        col("n_tokens_ref"), col("n_tokens_cur"),
        (lit(0.5) * (col("sp").cast(DoubleType) / col("n_tokens_ref")
          + col("sq").cast(DoubleType) / col("n_tokens_cur")))
          .as("jsd_nats"))
  }

  /** Two-sample Kolmogorov–Smirnov drift test (r12e) — has the order-
    * value distribution moved between the 1995 and 1996 cohorts? The
    * distribution-free test a pipeline runs when histogram bins are
    * too coarse. EXACT-INTEGER throughout: with cohort sizes na/nb and
    * right-continuous ECDFs evaluated at every distinct cents value v,
    * the KS statistic is D = max |cumA·nb − cumB·na| / (na·nb) — the
    * numerator and the final floor-ppm are pure BIGINT algebra
    * (na·nb ≈ 5·10¹⁴ even at 1000× the graded SF, far inside 2⁶³), so
    * both engines hash-match bit-for-bit with no libm anywhere. The
    * argmax value reports WHERE the distributions diverge (ties → min
    * v, a total order). Scale posture: the global cumulative sum is
    * the distributed TWO-PASS prefix — value-level counts bucket into
    * $10k blocks, the running sum windows PARTITION BY bucket (never
    * an unpartitioned window), and each bucket's offset comes from a
    * broadcast self-join over the ≤50-row per-bucket total table; the
    * final argmax is one global max-of-struct aggregate. Shuffles
    * carry distinct-value partial counts only. */
  import org.apache.spark.sql.expressions.Window

  val statsKsTest: QDef = q(
    "stats_ks_test",
    """WITH c AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
      |    CAST(SUM(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM orders
      |  WHERE year(o_orderdate) IN (1995, 1996)
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |  CAST(SUM(cb) AS BIGINT) AS nb FROM c),
      |cum AS (
      |  SELECT v,
      |    CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
      |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b
      |  FROM c),
      |g AS (
      |  SELECT v, abs(cum_a * nb - cum_b * na) AS gap
      |  FROM cum CROSS JOIN tot),
      |mx AS (SELECT CAST(MAX(gap) AS BIGINT) AS d_num FROM g)
      |SELECT na, nb, d_num,
      |  CAST((SELECT MIN(v) FROM g WHERE gap = d_num) AS BIGINT) AS at_cents,
      |  CAST(d_num * 1000000 // (na * nb) AS BIGINT) AS ks_d_ppm
      |FROM tot CROSS JOIN mx""") { (s, d) =>
    val c = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(1995, 1996))
      .select((money(col("o_totalprice")) * 100).cast(LongType).as("v"),
        when(year(col("o_orderdate")) === 1995, 1L).otherwise(0L).as("a"),
        when(year(col("o_orderdate")) === 1996, 1L).otherwise(0L).as("b"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
      .withColumn("bkt", expr("v div 1000000"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = c.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    // pass 1: running sums INSIDE each $10k bucket (partitioned window)
    val w = Window.partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = c.select(col("v"), col("bkt"),
      sum(col("ca")).over(w).as("ra"), sum(col("cb")).over(w).as("rb"))
    // pass 2: each bucket's offset = total of all STRICTLY EARLIER
    // buckets, from the tiny per-bucket table (broadcast self-join)
    val btot = c.groupBy(col("bkt"))
      .agg(sum(col("ca")).as("ba"), sum(col("cb")).as("bb"))
    val bpre = btot.select(col("bkt"), col("ba"), col("bb")).as("x")
      .join(broadcast(btot.select(col("bkt").as("ybkt"),
        col("ba").as("yba"), col("bb").as("ybb"))),
        col("ybkt") < col("x.bkt"), "left")
      .groupBy(col("x.bkt").as("bkt"))
      .agg(coalesce(sum(col("yba")), lit(0L)).as("pa"),
        coalesce(sum(col("ybb")), lit(0L)).as("pb"))
    val g = within.join(broadcast(bpre), "bkt")
      .crossJoin(broadcast(tot))
      .select(col("v"),
        abs((col("ra") + col("pa")) * col("nb")
          - (col("rb") + col("pb")) * col("na")).as("gap"))
    val best = g.agg(max(struct(col("gap"), (-col("v")).as("nv"))).as("m"))
    best.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"), col("m.gap").as("d_num"),
        (-col("m.nv")).as("at_cents"),
        expr("CAST(m.gap * 1000000 div (na * nb) AS BIGINT)").as("ks_d_ppm"))
  }

  /** Exclusive prefix counts over distinct values — the distributed
    * rank primitive the rank statistics below share (`stats_ks_test`
    * spells the same two-pass shape inline): within-bucket running
    * sums via a PARTITIONED window, cross-bucket offsets from the
    * tiny per-bucket total table (broadcast strictly-earlier
    * self-join) — never an unpartitioned window. Input: one row per
    * distinct value `v` with a BIGINT weight `cnt` (extra columns
    * ride along); output adds `pre` = Σ cnt over all values strictly
    * below v. Shuffles carry distinct-value partial counts only. */
  private[ops] def exclusivePrefix(counts: org.apache.spark.sql.DataFrame,
      bucketOf: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val c = counts.withColumn("bkt", bucketOf)
    val w = Window.partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = c.withColumn("run", sum(col("cnt")).over(w))
    val btot = c.groupBy(col("bkt")).agg(sum(col("cnt")).as("bt"))
    val bpre = btot.as("x")
      .join(broadcast(btot.select(col("bkt").as("ybkt"), col("bt").as("ybt"))),
        col("ybkt") < col("x.bkt"), "left")
      .groupBy(col("x.bkt").as("bkt"))
      .agg(coalesce(sum(col("ybt")), lit(0L)).as("off"))
    within.join(broadcast(bpre), "bkt")
      .withColumn("pre", col("run") - col("cnt") + col("off"))
      .drop("bkt", "bt", "run", "off")
  }

  /** Mann–Whitney U rank-sum test (r12f) — the nonparametric "did the
    * order-value distribution SHIFT between the 1995 and 1996
    * cohorts" companion to `stats_ks_test` (KS is sensitive to any
    * ECDF gap, U to stochastic dominance). EXACT-INTEGER via DOUBLED
    * midranks: a tie group occupying rank positions pre+1..pre+cnt
    * has doubled midrank 2·pre + cnt + 1 (always an integer), so
    * 2·R_A = Σ_v ca_v·(2·pre_v + cnt_v + 1) and 2·U_A = 2·R_A −
    * na(na+1) are pure BIGINT algebra — both engines hash-match
    * bit-for-bit, no libm. `auc_ppm` = U_A/(na·nb) in floor-ppm is
    * the common-language effect size P(A>B) + ½P(A=B) (Mann &
    * Whitney 1947). All operands nonnegative (2R_A ≥ na(na+1)), so
    * Spark `div` and DuckDB `//` agree. Scale posture: one distinct-
    * value count agg, the shared bucketed-prefix rank pass, one
    * DECIMAL(38)-partial fold — shuffles carry distinct-value rows
    * only. The ppm numerator u2·10⁶ needs |u2| ≤ 2·na·nb ≲ 9·10¹²
    * (na,nb ≤ ~2·10⁶ cohorts); beyond that, divide na·nb first. */
  val statsMannWhitneyU: QDef = q(
    "stats_mannwhitney_u",
    """WITH c AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
      |    CAST(SUM(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM orders
      |  WHERE year(o_orderdate) IN (1995, 1996)
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |  CAST(SUM(cb) AS BIGINT) AS nb FROM c),
      |cum AS (
      |  SELECT v, ca, ca + cb AS cnt,
      |    CAST(COALESCE(SUM(ca + cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS pre
      |  FROM c),
      |r AS (SELECT CAST(SUM(ca * (2 * pre + cnt + 1)) AS BIGINT) AS r2a
      |  FROM cum)
      |SELECT na, nb, r2a,
      |  CAST(r2a - na * (na + 1) AS BIGINT) AS u2a,
      |  CAST((r2a - na * (na + 1)) * 1000000 // (2 * na * nb) AS BIGINT)
      |    AS auc_ppm
      |FROM tot CROSS JOIN r""") { (s, d) =>
    val c = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(1995, 1996))
      .select((money(col("o_totalprice")) * 100).cast(LongType).as("v"),
        when(year(col("o_orderdate")) === 1995, 1L).otherwise(0L).as("a"),
        when(year(col("o_orderdate")) === 1996, 1L).otherwise(0L).as("b"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
      .withColumn("cnt", col("ca") + col("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = c.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val ranked = exclusivePrefix(c, expr("v div 1000000"))
    val r = ranked
      .agg(sum((col("ca") * (lit(2L) * col("pre") + col("cnt") + lit(1L)))
        .cast(DecimalType(38, 0))).as("r2d"))
      .select(col("r2d").cast(LongType).as("r2a"))
    r.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"), col("r2a"),
        (col("r2a") - col("na") * (col("na") + 1)).as("u2a"),
        expr("CAST((r2a - na * (na + 1)) * 1000000 div (2 * na * nb) AS BIGINT)")
          .as("auc_ppm"))
  }

  /** Spearman rank correlation (r12f) — is a customer's ORDER COUNT
    * monotonically associated with their TOTAL SPEND? Pearson
    * (`agg_corr_explicit`) grades the linear association; Spearman is
    * the rank version a skewed-spend distribution needs (Spearman
    * 1904). Ties use midranks, kept exact via DOUBLED midranks
    * (2·pre + cnt + 1 — integers; the ×2 cancels in ρ). Both rank
    * maps come from the shared bucketed-prefix primitive — the
    * small order-count map broadcasts back, the per-cents map joins
    * on the value key (an equi-shuffle sized by customer
    * cardinality). Moment fold + final formula are spelled exactly
    * as `agg_corr_explicit` (DECIMAL(38,0) partials, one DOUBLE
    * conversion, IEEE-exact sqrt — the one libm call both engines
    * correctly round). */
  val statsSpearmanCorr: QDef = q(
    "stats_spearman_corr",
    """WITH cust AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |r AS (SELECT
      |    2 * (RANK() OVER (ORDER BY x)) + COUNT(*) OVER (PARTITION BY x) - 1
      |      AS rx,
      |    2 * (RANK() OVER (ORDER BY y)) + COUNT(*) OVER (PARTITION BY y) - 1
      |      AS ry
      |  FROM cust),
      |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(rx AS DECIMAL(38,0))) AS sx,
      |    SUM(CAST(ry AS DECIMAL(38,0))) AS sy,
      |    SUM(CAST(rx AS DECIMAL(38,0)) * rx) AS sxx,
      |    SUM(CAST(ry AS DECIMAL(38,0)) * ry) AS syy,
      |    SUM(CAST(rx AS DECIMAL(38,0)) * ry) AS sxy
      |  FROM r),
      |t AS (SELECT n, CAST(sx AS DOUBLE) AS dx, CAST(sy AS DOUBLE) AS dy,
      |    CAST(sxx AS DOUBLE) AS dxx, CAST(syy AS DOUBLE) AS dyy,
      |    CAST(sxy AS DOUBLE) AS dxy
      |  FROM s)
      |SELECT n,
      |  (n * dxy - dx * dy) / (sqrt(n * dxx - dx * dx) * sqrt(n * dyy - dy * dy))
      |    AS rho_spearman
      |FROM t""") { (s, d) =>
    val cust = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        sum((money(col("o_totalprice")) * 100).cast(LongType)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def doubledMidrank(vals: org.apache.spark.sql.DataFrame,
        bucketOf: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
      exclusivePrefix(vals.groupBy(col("v")).agg(count(lit(1)).as("cnt")),
          bucketOf)
        .select(col("v"),
          (lit(2L) * col("pre") + col("cnt") + lit(1L)).as("r2"))
    val xr = doubledMidrank(cust.select(col("x").as("v")), expr("v div 8"))
      .select(col("v").as("x"), col("r2").as("rx"))
    val yr = doubledMidrank(cust.select(col("y").as("v")),
        expr("v div 100000000"))
      .select(col("v").as("y"), col("r2").as("ry"))
    val ranked = cust.join(broadcast(xr), "x").join(yr, "y")
    val decRx = col("rx").cast(DecimalType(38, 0))
    val decRy = col("ry").cast(DecimalType(38, 0))
    val sums = ranked.agg(count(lit(1)).as("n"),
      sum(decRx).as("sx"), sum(decRy).as("sy"),
      sum(decRx * col("rx")).as("sxx"), sum(decRy * col("ry")).as("syy"),
      sum(decRx * col("ry")).as("sxy"))
    val t = sums.select(col("n"),
      col("sx").cast(DoubleType).as("dx"), col("sy").cast(DoubleType).as("dy"),
      col("sxx").cast(DoubleType).as("dxx"),
      col("syy").cast(DoubleType).as("dyy"),
      col("sxy").cast(DoubleType).as("dxy"))
    t.select(col("n"),
      ((col("n") * col("dxy") - col("dx") * col("dy"))
        / (sqrt(col("n") * col("dxx") - col("dx") * col("dx"))
          * sqrt(col("n") * col("dyy") - col("dy") * col("dy"))))
        .as("rho_spearman"))
  }

  /** Cramér's V (r12j) — the EFFECT SIZE the χ² test
    * (`stats_chi_square`) needs alongside it: V = √(χ² / (n·(min(r,c)
    * − 1))) ∈ [0,1] answers "how strongly are order priority and
    * order status associated", where raw χ² only answers "more than
    * chance". Numeric ladder is stats_chi_square's exactly: each
    * cell's (obs·n − rtot·ctot)²/(n·rtot·ctot) term is computed as a
    * DOUBLE on exact BIGINT operands and immediately quantized to
    * DECIMAL(28,18), so the ≤15-cell sum is order-independent; the
    * final double tree (one division, one IEEE sqrt) is spelled
    * identically in both engines and reported half-up in milli.
    * Scale posture: one fact agg to the r×c contingency table;
    * everything after is ≤15 rows of broadcast algebra. */
  val statsCramersV: QDef = q(
    "stats_cramers_v",
    """WITH o AS (
      |  SELECT o_orderpriority AS pr, o_orderstatus AS st,
      |    CAST(count(*) AS BIGINT) AS obs
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT pr, CAST(SUM(obs) AS BIGINT) AS rtot FROM o GROUP BY pr),
      |ct AS (SELECT st, CAST(SUM(obs) AS BIGINT) AS ctot FROM o GROUP BY st),
      |n AS (SELECT CAST(SUM(obs) AS BIGINT) AS ntot FROM o),
      |dims AS (SELECT CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS r,
      |  CAST((SELECT COUNT(*) FROM ct) AS BIGINT) AS c),
      |cells AS (
      |  SELECT rt.rtot, ct.ctot, COALESCE(o.obs, 0) AS obs, n.ntot
      |  FROM rt CROSS JOIN ct CROSS JOIN n
      |  LEFT JOIN o ON o.pr = rt.pr AND o.st = ct.st),
      |terms AS (
      |  SELECT ntot,
      |    CAST(CAST(obs * ntot - rtot * ctot AS DOUBLE)
      |      * CAST(obs * ntot - rtot * ctot AS DOUBLE)
      |      / (CAST(ntot AS DOUBLE) * rtot * ctot)
      |      AS DECIMAL(28,18)) AS term
      |  FROM cells),
      |chi AS (SELECT ntot, CAST(SUM(term) AS DOUBLE) AS chi2
      |  FROM terms GROUP BY ntot)
      |SELECT ntot AS n, r AS n_rows, c AS n_cols,
      |  CAST(floor(chi2 * 1000 + 0.5) AS BIGINT) AS chi2_milli,
      |  CAST(floor(sqrt(chi2 / (CAST(ntot AS DOUBLE)
      |    * (least(r, c) - 1))) * 1000 + 0.5) AS BIGINT) AS cramers_v_milli
      |FROM chi CROSS JOIN dims""") { (s, d) =>
    val o = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pr"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("obs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rt = o.groupBy(col("pr")).agg(sum(col("obs")).cast(LongType).as("rtot"))
    val ct = o.groupBy(col("st")).agg(sum(col("obs")).cast(LongType).as("ctot"))
    val n = o.agg(sum(col("obs")).cast(LongType).as("ntot"))
    val dims = rt.agg(count(lit(1)).as("r"))
      .crossJoin(broadcast(ct.agg(count(lit(1)).as("c"))))
    val cells = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(n))
      .join(o.select(col("pr").as("op"), col("st").as("os"), col("obs")),
        col("op") === col("pr") && col("os") === col("st"), "left")
      .select(col("rtot"), col("ctot"),
        coalesce(col("obs"), lit(0L)).as("obs"), col("ntot"))
    val chi = cells
      .withColumn("term", expr(
        """CAST(CAST(obs * ntot - rtot * ctot AS DOUBLE)
          |  * CAST(obs * ntot - rtot * ctot AS DOUBLE)
          |  / (CAST(ntot AS DOUBLE) * rtot * ctot)
          |  AS DECIMAL(28,18))""".stripMargin))
      .groupBy(col("ntot"))
      .agg(sum(col("term")).cast(DoubleType).as("chi2"))
    chi.crossJoin(broadcast(dims))
      .select(col("ntot").as("n"), col("r").as("n_rows"),
        col("c").as("n_cols"),
        floor(col("chi2") * 1000 + 0.5).cast(LongType).as("chi2_milli"),
        floor(sqrt(col("chi2") / (col("ntot").cast(DoubleType)
          * (least(col("r"), col("c")) - 1))) * 1000 + 0.5)
          .cast(LongType).as("cramers_v_milli"))
  }

  /** Wald–Wolfowitz runs test (r12l) — is the daily-revenue series
    * RANDOM around its median, or does it trend/cycle? Per year:
    * days strictly above vs below the year's LOWER-median daily
    * revenue (median-equal days excluded, the standard convention),
    * the observed count of runs (maximal same-side streaks in day
    * order), the expected count 1 + 2ab/(a+b) in exact floor-milli,
    * and the z-score (R − μ)/σ with σ² = 2ab(2ab−a−b)/((a+b)²(a+b−1))
    * as ONE identically-spelled double tree, half-up milli (double
    * `floor(x·1000+0.5)` rounds negatives identically in both
    * engines — no integer-div sign seam). Every window partitions by
    * YEAR: the per-partition row count is calendar-bounded (≤366),
    * so the rank and lag passes scale out with years regardless of
    * fact volume. Degenerate years (one side empty) yield NULL z by
    * the same CASE in both engines. */
  val statsRunsTest: QDef = q(
    "stats_runs_test",
    """WITH daily AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
      |      AS day,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT yr, day, cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY yr ORDER BY cents, day)
      |      AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY yr) AS BIGINT) AS n
      |  FROM daily),
      |med AS (SELECT yr, cents AS med FROM rk WHERE rn = (n + 1) // 2),
      |sides AS (
      |  SELECT rk.yr, rk.day,
      |    CASE WHEN rk.cents > med.med THEN 1 ELSE 0 END AS side
      |  FROM rk JOIN med ON med.yr = rk.yr
      |  WHERE rk.cents <> med.med),
      |runs AS (
      |  SELECT yr, day, side,
      |    CASE WHEN lag(side) OVER (PARTITION BY yr ORDER BY day) IS NULL
      |      OR side <> lag(side) OVER (PARTITION BY yr ORDER BY day)
      |      THEN 1 ELSE 0 END AS chg
      |  FROM sides),
      |agg AS (
      |  SELECT yr, CAST(SUM(side) AS BIGINT) AS na,
      |    CAST(SUM(1 - side) AS BIGINT) AS nb,
      |    CAST(SUM(chg) AS BIGINT) AS n_runs
      |  FROM runs GROUP BY 1)
      |SELECT yr, na AS n_above, nb AS n_below, n_runs,
      |  CAST(1000 + (2000 * na * nb) // (na + nb) AS BIGINT)
      |    AS exp_runs_milli,
      |  CASE WHEN na = 0 OR nb = 0 THEN NULL
      |    ELSE CAST(floor((CAST(n_runs AS DOUBLE)
      |      - (1 + 2.0 * na * nb / (na + nb)))
      |      / sqrt(2.0 * na * nb * (2.0 * na * nb - na - nb)
      |        / (CAST(na + nb AS DOUBLE) * (na + nb) * (na + nb - 1)))
      |      * 1000 + 0.5) AS BIGINT) END AS z_milli
      |FROM agg ORDER BY yr""") { (s, d) =>
    val daily = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(1995, 1996))
      .groupBy(year(col("o_orderdate")).cast(IntegerType).as("yr"),
        datediff(col("o_orderdate").cast(DateType),
          lit("1995-01-01").cast(DateType)).as("day"))
      .agg(sum((money(col("o_totalprice")) * 100).cast(LongType)).as("cents"))
    val wRank = Window.partitionBy(col("yr")).orderBy(col("cents"), col("day"))
    val wCnt = Window.partitionBy(col("yr"))
    val rk = daily.select(col("yr"), col("day"), col("cents"),
        row_number().over(wRank).cast(LongType).as("rn"),
        count(lit(1)).over(wCnt).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = rk.filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("yr").as("myr"), col("cents").as("med"))
    val sides = rk.join(broadcast(med), col("myr") === col("yr"))
      .filter(col("cents") =!= col("med"))
      .select(col("yr"), col("day"),
        when(col("cents") > col("med"), 1L).otherwise(0L).as("side"))
    val wDay = Window.partitionBy(col("yr")).orderBy(col("day"))
    val runs = sides.select(col("yr"), col("side"),
      when(lag(col("side"), 1).over(wDay).isNull
        || col("side") =!= lag(col("side"), 1).over(wDay), 1L)
        .otherwise(0L).as("chg"))
    val agg = runs.groupBy(col("yr"))
      .agg(sum(col("side")).as("na"), sum(lit(1L) - col("side")).as("nb"),
        sum(col("chg")).as("n_runs"))
    agg.select(col("yr"), col("na").as("n_above"), col("nb").as("n_below"),
        col("n_runs"),
        expr("CAST(1000 + (2000 * na * nb) div (na + nb) AS BIGINT)")
          .as("exp_runs_milli"),
        when(col("na") === 0 || col("nb") === 0, lit(null).cast(LongType))
          .otherwise(expr(
            """CAST(floor((CAST(n_runs AS DOUBLE)
              |  - (1 + 2.0 * na * nb / (na + nb)))
              |  / sqrt(2.0 * na * nb * (2.0 * na * nb - na - nb)
              |    / (CAST(na + nb AS DOUBLE) * (na + nb) * (na + nb - 1)))
              |  * 1000 + 0.5) AS BIGINT)""".stripMargin))
          .as("z_milli"))
      .orderBy(col("yr"))
  }

  /** Kendall's τ-b (r12q) — the concordance companion to Spearman:
    * do 1995 and 1996 share a SEASONAL revenue shape? The two years'
    * daily totals pair by calendar (month, day) — Feb 29 drops out
    * of the matched inner join — and every day pair (i < j) is
    * classified concordant / discordant / x-tied / y-tied in exact
    * integers; τ-b = (C − D)/√((n₀−Tx)(n₀−Ty)) is ONE
    * identically-spelled double tree, half-up milli (Kendall 1938).
    * The O(n²) pair join is CALENDAR-BOUNDED (≤365² pairs regardless
    * of data volume — the ts_theil_sen scale argument); the fact
    * table is touched once by the daily agg. */
  val statsKendallTau: QDef = q(
    "stats_kendall_tau",
    """WITH daily AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(month(o_orderdate) AS INTEGER) AS mo,
      |    CAST(day(o_orderdate) AS INTEGER) AS dy,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
      |  GROUP BY 1, 2, 3),
      |p AS (
      |  SELECT a.mo, a.dy, a.cents AS x, b.cents AS y
      |  FROM daily a JOIN daily b
      |    ON b.mo = a.mo AND b.dy = a.dy AND a.yr = 1995 AND b.yr = 1996),
      |pairs AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN (i.x - j.x) * (i.y - j.y) > 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(SUM(CASE WHEN (i.x - j.x) * (i.y - j.y) < 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(SUM(CASE WHEN i.x = j.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
      |    CAST(SUM(CASE WHEN i.y = j.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
      |    CAST(COUNT(*) AS BIGINT) AS n0
      |  FROM p i JOIN p j
      |    ON j.mo > i.mo OR (j.mo = i.mo AND j.dy > i.dy)),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM p)
      |SELECT n_days, n0 AS n_pairs, c AS concordant, d AS discordant,
      |  CAST(floor(CAST(c - d AS DOUBLE)
      |    / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))
      |    * 1000 + 0.5) AS BIGINT) AS tau_b_milli
      |FROM pairs CROSS JOIN n""") { (s, d) =>
    val daily = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(1995, 1996))
      .groupBy(year(col("o_orderdate")).cast(IntegerType).as("yr"),
        month(col("o_orderdate")).cast(IntegerType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(IntegerType).as("dy"))
      .agg(sum((money(col("o_totalprice")) * 100).cast(LongType)).as("cents"))
    val p = daily.filter(col("yr") === 1995)
      .select(col("mo"), col("dy"), col("cents").as("x"))
      .join(daily.filter(col("yr") === 1996)
          .select(col("mo").as("mo2"), col("dy").as("dy2"),
            col("cents").as("y")),
        col("mo2") === col("mo") && col("dy2") === col("dy"))
      .select(col("mo"), col("dy"), col("x"), col("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val j = p.select(col("mo").as("jmo"), col("dy").as("jdy"),
      col("x").as("jx"), col("y").as("jy"))
    // the probe side is ≤366 rows by the calendar bound — broadcast it
    // so the theta join plans as BroadcastNestedLoopJoin, never a
    // CartesianProduct (PlanInvariantsSpec bans the latter registry-wide)
    val pairs = p.join(broadcast(j), col("jmo") > col("mo")
        || (col("jmo") === col("mo") && col("jdy") > col("dy")))
      .agg(
        sum(when((col("x") - col("jx")) * (col("y") - col("jy")) > 0, 1L)
          .otherwise(0L)).as("c"),
        sum(when((col("x") - col("jx")) * (col("y") - col("jy")) < 0, 1L)
          .otherwise(0L)).as("d"),
        sum(when(col("x") === col("jx"), 1L).otherwise(0L)).as("tx"),
        sum(when(col("y") === col("jy"), 1L).otherwise(0L)).as("ty"),
        count(lit(1)).as("n0"))
    val n = p.agg(count(lit(1)).as("n_days"))
    pairs.crossJoin(broadcast(n))
      .select(col("n_days"), col("n0").as("n_pairs"),
        col("c").as("concordant"), col("d").as("discordant"),
        floor((col("c") - col("d")).cast(DoubleType)
          / sqrt((col("n0") - col("tx")).cast(DoubleType)
            * (col("n0") - col("ty")).cast(DoubleType))
          * 1000 + 0.5).cast(LongType).as("tau_b_milli"))
  }

  val all: Seq[QDef] = Seq(driftValueHistogram, driftEmbeddingCentroid,
    statsChiSquare, embedTopComponent, embedCosineHistogram, tsCusumAlarm,
    driftUnigramJsd, statsKsTest, statsMannWhitneyU, statsSpearmanCorr,
    statsCramersV, statsRunsTest, statsKendallTau)
}
