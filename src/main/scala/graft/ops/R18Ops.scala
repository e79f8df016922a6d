package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Round-18 additions. Headline trio (VERDICT r17 items 1, 2, 5):
  * the SemDeDup-style cluster-level semantic prune — the dedup rung
  * production corpora run at 100 TB, cost follows cluster sizes,
  * never corpus² — the stored-edge-table contract for the graph
  * family (the r17 signature-store pattern applied to `tradeEb`),
  * and the greedy-routing audit over the HNSW layer plan. Plus the
  * IVF probe-count sweep, the reduced-precision two-stage rerank
  * audit, and further stats/mix/sampling operators — all under the
  * house determinism protocol (exact integers end to end, one
  * identical float tree where a cosine is unavoidable, every divide
  * guarded where a denominator can be zero). */
object R18Ops {

  /** The kmeans-family milli-centroid CTEs (ONE spelling with
    * `kmeans_assign`): per-(label, i) floor-mean centroid over the
    * milli-quantized component explode. */
  private val centCtes: String =
    """dims AS (SELECT unnest(range(1, 65)) AS i),
      |qv AS (
      |  SELECT vec_id, label, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qc
      |  FROM embeddings CROSS JOIN dims),
      |cent AS (
      |  SELECT label AS cl, i,
      |    CAST(floor(CAST(SUM(qc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
      |  FROM qv GROUP BY label, i)""".stripMargin

  /** Spark twin of `centCtes`'s cent: (cl, i, c). Built over
    * `LlmExtras.kmeansEx` so the quantization cannot drift. */
  private def centroids(s: SparkSession, d: String): DataFrame =
    LlmExtras.kmeansEx(s, d)
      .groupBy(col("label").as("cl"), col("i"))
      .agg(floor(sum(col("qc")).cast(DoubleType) / count(lit(1)))
        .cast(LongType).as("c"))

  /** Per-(probe, vector) exact integer squared L2 distance over the
    * milli components, probe panel = vec_id < 8 (the
    * `eval_ann_recall` panel convention), self-pairs excluded.
    * Returns (q_id, vec_id, label, d2). The panel side is an 8×64-row
    * broadcast, so the pair aggregation is one (q_id, vec_id)-keyed
    * shuffle bounded by 8·N rows — the eval-tier brute-force cost,
    * never corpus². */
  private def panelD2(s: SparkSession, d: String): DataFrame = {
    val ex = LlmExtras.kmeansEx(s, d)
    val qp = ex.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("i").as("qi"),
        col("qc").as("qqc"))
    ex.join(broadcast(qp),
        col("i") === col("qi") && col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"), col("label"))
      .agg(sum((col("qc") - col("qqc")) * (col("qc") - col("qqc")))
        .as("d2"))
  }

  /** SQL twin of `panelD2` as a CTE block (expects `qv` from
    * `centCtes` in scope). */
  private val panelD2Ctes: String =
    """qp AS (SELECT vec_id AS q_id, i, qc AS qqc FROM qv WHERE vec_id < 8),
      |vd AS (
      |  SELECT qp.q_id, qv.vec_id, qv.label,
      |    SUM((qv.qc - qp.qqc) * (qv.qc - qp.qqc)) AS d2
      |  FROM qv JOIN qp ON qv.i = qp.i AND qv.vec_id <> qp.q_id
      |  GROUP BY qp.q_id, qv.vec_id, qv.label)""".stripMargin

  /** SemDeDup-style cluster-level semantic prune (r18, VERDICT r17
    * item 1) — the dedup rung between near-embedding PAIRS
    * (`dedup_near_embedding`, still pair-shaped) and what 100 TB
    * corpora actually run: cluster the embedding space (the graded
    * `kmeans_assign` milli centroids — label-seeded, ONE spelling),
    * then WITHIN each cluster keep the member closest to the
    * centroid as the representative and prune every other member
    * whose cosine-to-centroid clears the redundancy threshold 0.25
    * (members that near-collapse onto the centroid direction are
    * semantic copies of the representative's region; the fixture's
    * cos-to-centroid spread is ≈[−0.15, 0.44], so 0.25 prunes a real
    * tail). Cost follows CLUSTER SIZES, never corpus²: one
    * (vec, own-label) dot against a broadcast 640-row centroid
    * table, one label-partitioned rank window, one label fold — no
    * pair join anywhere in the plan. The cosine is the house one
    * identical float tree (exact BIGINT dot and norms into one
    * ROUND(·, 6) division); everything after is exact integers.
    * Graded per cluster: member census, representative, pruned /
    * kept counts, pruned fraction in ppm. */
  val dedupSemanticPrune: QDef = q(
    "dedup_semantic_prune",
    s"""WITH $centCtes,
      |nc AS (SELECT cl, SUM(c * c) AS ncl FROM cent GROUP BY cl),
      |dots AS (
      |  SELECT qv.vec_id, qv.label,
      |    SUM(qv.qc * cent.c) AS dot, SUM(qv.qc * qv.qc) AS nv
      |  FROM qv JOIN cent ON cent.cl = qv.label AND cent.i = qv.i
      |  GROUP BY qv.vec_id, qv.label),
      |cosd AS (
      |  SELECT d.vec_id, d.label,
      |    CASE WHEN d.nv = 0 OR nc.ncl = 0 THEN 0.0
      |      ELSE ROUND(d.dot / (sqrt(d.nv) * sqrt(nc.ncl)), 6) END AS cosc
      |  FROM dots d JOIN nc ON nc.cl = d.label),
      |rk AS (
      |  SELECT vec_id, label, cosc,
      |    row_number() OVER (PARTITION BY label ORDER BY cosc DESC, vec_id)
      |      AS rn
      |  FROM cosd)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
      |  MIN(CASE WHEN rn = 1 THEN vec_id END) AS rep_vec,
      |  CAST(SUM(CASE WHEN rn > 1 AND cosc >= 0.25 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_pruned,
      |  CAST(COUNT(*) - SUM(CASE WHEN rn > 1 AND cosc >= 0.25 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rn > 1 AND cosc >= 0.25 THEN 1 ELSE 0 END)
      |    * 1000000 // COUNT(*) AS BIGINT) AS pruned_ppm
      |FROM rk GROUP BY label ORDER BY label""") { (s, d) =>
    val ex = LlmExtras.kmeansEx(s, d)
    val cent = centroids(s, d)
    val nc = cent.groupBy(col("cl")).agg(sum(col("c") * col("c")).as("ncl"))
    val dots = ex
      .join(broadcast(cent), col("label") === col("cl") && ex("i") === cent("i"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("qc") * col("c")).as("dot"),
        sum(col("qc") * col("qc")).as("nv"))
    val cosd = dots.join(broadcast(nc), col("label") === col("cl"))
      .select(col("vec_id"), col("label"),
        when(col("nv") === 0L || col("ncl") === 0L, 0.0)
          .otherwise(round(col("dot") / (sqrt(col("nv")) * sqrt(col("ncl"))), 6))
          .as("cosc"))
    val pruned = when(col("rn") > 1 && col("cosc") >= 0.25, 1L).otherwise(0L)
    cosd.withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("cosc").desc, col("vec_id"))))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        min(when(col("rn") === 1, col("vec_id"))).as("rep_vec"),
        sum(pruned).as("n_pruned"))
      .select(col("label"), col("n_members"), col("rep_vec"), col("n_pruned"),
        (col("n_members") - col("n_pruned")).as("n_kept"),
        expr("n_pruned * 1000000 div n_members").as("pruned_ppm"))
      .orderBy(col("label"))
  }

  /** IVF probe-count sweep (r18) — the nprobe decision table next to
    * `ann_ivf_label` (which grades the single-list route): for each
    * panel probe and nprobe ∈ {1, 2, 4}, restrict the search to the
    * nprobe nearest inverted lists (lists = the graded label-seeded
    * milli centroids; list distance = exact integer L2 to centroid,
    * ties to the smaller label) and grade recall@10 against the
    * exact integer-L2 top-10 plus the scan cost n_scanned = Σ probed
    * list sizes — THE recall-vs-IO curve an IVF deployment picks its
    * nprobe from. Everything is exact integers (no float tree at
    * all: L2 needs no normalization). Panel-bounded brute force is
    * the truth tier, the probed-list route is what runs at scale. */
  val annIvfProbeSweep: QDef = q(
    "ann_ivf_probe_sweep",
    s"""WITH $centCtes,
      |$panelD2Ctes,
      |cd AS (
      |  SELECT qp.q_id, cent.cl,
      |    SUM((qp.qqc - cent.c) * (qp.qqc - cent.c)) AS d2
      |  FROM qp JOIN cent USING (i) GROUP BY qp.q_id, cent.cl),
      |crk AS (
      |  SELECT q_id, cl,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d2, cl) AS crn
      |  FROM cd),
      |t10 AS (
      |  SELECT q_id, vec_id, label FROM (
      |    SELECT q_id, vec_id, label,
      |      row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn
      |    FROM vd) WHERE rn <= 10),
      |np AS (SELECT unnest([1, 2, 4]) AS nprobe),
      |probed AS (
      |  SELECT np.nprobe, crk.q_id, crk.cl
      |  FROM np JOIN crk ON crk.crn <= np.nprobe),
      |sizes AS (SELECT label, COUNT(*) AS n_l FROM embeddings GROUP BY label),
      |ncand AS (
      |  SELECT p.q_id, p.nprobe, CAST(SUM(s.n_l) AS BIGINT) AS n_scanned
      |  FROM probed p JOIN sizes s ON s.label = p.cl
      |  GROUP BY p.q_id, p.nprobe),
      |hits AS (
      |  SELECT t.q_id, p.nprobe, CAST(COUNT(*) AS BIGINT) AS n_hits
      |  FROM t10 t JOIN probed p ON p.q_id = t.q_id AND p.cl = t.label
      |  GROUP BY t.q_id, p.nprobe)
      |SELECT n.q_id, CAST(n.nprobe AS BIGINT) AS nprobe, n.n_scanned,
      |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  CAST(COALESCE(h.n_hits, 0) * 10 AS BIGINT) AS recall_pct
      |FROM ncand n LEFT JOIN hits h
      |  ON h.q_id = n.q_id AND h.nprobe = n.nprobe
      |ORDER BY n.q_id, n.nprobe""") { (s, d) =>
    val ex = LlmExtras.kmeansEx(s, d)
    val cent = centroids(s, d)
    val qp = ex.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("i").as("qi"), col("qc").as("qqc"))
    val cd = broadcast(qp).join(cent, col("qi") === cent("i"))
      .groupBy(col("q_id"), col("cl"))
      .agg(sum((col("qqc") - col("c")) * (col("qqc") - col("c"))).as("d2"))
    val crk = cd.withColumn("crn", row_number().over(
      Window.partitionBy(col("q_id")).orderBy(col("d2"), col("cl"))))
    val t10 = panelD2(s, d).withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 10).select(col("q_id"), col("vec_id"), col("label"))
    val np = s.range(3).select(expr("shiftleft(1L, cast(id as int))")
      .cast(LongType).as("nprobe")).filter(col("nprobe") <= 4)
    val probed = broadcast(np).join(crk, col("crn") <= col("nprobe"))
      .select(col("nprobe"), col("q_id"), col("cl"))
    val sizes = Tables.embeddings(s, d).groupBy(col("label").as("sl"))
      .agg(count(lit(1)).as("n_l"))
    val ncand = probed.join(broadcast(sizes), col("cl") === col("sl"))
      .groupBy(col("q_id"), col("nprobe"))
      .agg(sum(col("n_l")).cast(LongType).as("n_scanned"))
    val hits = t10.join(
        broadcast(probed.select(col("nprobe").as("p_np"),
          col("q_id").as("p_q"), col("cl").as("p_cl"))),
        col("p_q") === col("q_id") && col("p_cl") === col("label"))
      .groupBy(col("q_id"), col("p_np"))
      .agg(count(lit(1)).as("n_hits"))
    ncand.join(hits,
        ncand("q_id") === hits("q_id") && col("nprobe") === col("p_np"), "left")
      .select(ncand("q_id"), col("nprobe"), col("n_scanned"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) * 10L).as("recall_pct"))
      .orderBy(col("q_id"), col("nprobe"))
  }

  /** HNSW greedy-routing audit (r18, VERDICT r17 item 5) — the
    * search-cost companion to `ann_hnsw_layer_assign` (which grades
    * the build-side layer census): for each panel probe and each
    * populated layer l, the DESCENT TARGET — the exact-integer-L2
    * nearest pool member among nodes assigned layer ≥ l (the
    * upper-graph greedy search converges to at that layer before
    * dropping a level) — with the pool census and the binary-search
    * hop bound ⌈log₂ pool⌉ (exact via bin()-string length, zero
    * floats anywhere). The audit certifies the two facts HNSW rests
    * on: pools nest (pool_n non-decreasing as l falls) so best_d2 is
    * non-increasing layer by layer, and upper layers are tiny so the
    * descent entry cost is O(log n). Distance computations here are
    * the eval tier (panel × pool, bounded); at scale greedy visits
    * ~M·hops of them per layer, which is what the hop bound sizes.
    * Layer assignment is ONE spelling with `ann_hnsw_layer_assign`
    * (`R17Ops.hnswLayerSqlExpr`/`hnswLayerCol`). Layers whose pool
    * is empty at this corpus are absent in both engines. */
  val annHnswGreedyRoute: QDef = q(
    "ann_hnsw_greedy_route",
    s"""WITH $centCtes,
      |$panelD2Ctes,
      |lay AS (
      |  SELECT vec_id, ${R17Ops.hnswLayerSqlExpr} AS layer
      |  FROM embeddings),
      |lv AS (SELECT unnest(range(0, 5)) AS lvl),
      |pool AS (
      |  SELECT lv.lvl, lay.vec_id
      |  FROM lv JOIN lay ON lay.layer >= lv.lvl),
      |cnt AS (SELECT lvl, CAST(COUNT(*) AS BIGINT) AS pool_n
      |  FROM pool GROUP BY lvl),
      |best AS (
      |  SELECT v.q_id, p.lvl, v.vec_id, v.d2,
      |    row_number() OVER (PARTITION BY v.q_id, p.lvl
      |      ORDER BY v.d2, v.vec_id) AS rn
      |  FROM vd v JOIN pool p ON p.vec_id = v.vec_id)
      |SELECT b.q_id, CAST(b.lvl AS BIGINT) AS layer, c.pool_n,
      |  b.vec_id AS best_vec, CAST(b.d2 AS BIGINT) AS best_d2,
      |  CASE WHEN c.pool_n <= 1 THEN CAST(0 AS BIGINT)
      |    ELSE CAST(length(bin(c.pool_n - 1)) AS BIGINT) END AS hops_bound
      |FROM best b JOIN cnt c ON c.lvl = b.lvl
      |WHERE b.rn = 1
      |ORDER BY q_id, layer""") { (s, d) =>
    val lay = Tables.embeddings(s, d)
      .select(col("vec_id").as("l_vec"), R17Ops.hnswLayerCol.as("layer"))
    val lv = s.range(5).select(col("id").cast(LongType).as("lvl"))
    val pool = broadcast(lv).join(lay, col("layer") >= col("lvl"))
      .select(col("lvl"), col("l_vec"))
    val cnt = pool.groupBy(col("lvl").as("c_lvl"))
      .agg(count(lit(1)).as("pool_n"))
    val best = panelD2(s, d)
      .join(broadcast(pool), col("l_vec") === col("vec_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"), col("lvl"))
          .orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") === 1)
    best.join(broadcast(cnt), col("c_lvl") === col("lvl"))
      .select(col("q_id"), col("lvl").as("layer"), col("pool_n"),
        col("vec_id").as("best_vec"), col("d2").cast(LongType).as("best_d2"),
        when(col("pool_n") <= 1L, 0L)
          .otherwise(length(bin(col("pool_n") - 1)).cast(LongType))
          .as("hops_bound"))
      .orderBy(col("q_id"), col("layer"))
  }

  /** Two-stage retrieval rerank audit (r18) — the
    * cheap-scan-then-exact-rerank scheme every production vector
    * store runs (scan at reduced precision, rerank survivors at full
    * precision), graded end to end in exact integers: stage 1 ranks
    * by the centi-quantized dot product (floor(x·10) components —
    * 100× coarser than the house milli standard, the 4-bits-fewer
    * scalar quantization a scan tier ships) and keeps the top-20 per
    * panel probe; stage 2 re-ranks those 20 by the milli dot and
    * keeps 10; truth is the milli-dot top-10 over ALL vectors. Per
    * probe: candidate budget, hits, recall@10, and whether the
    * top-1 survived the coarse stage — the table that decides
    * whether the scan tier's precision is safe. Both dots are exact
    * BIGINT sums (no float tree anywhere); ties break by vec_id in
    * both engines. At scale stage 2 touches only the 20 survivors
    * per query; the one-pass spelling here computes both dots in the
    * same panel-bounded aggregation (the eval-tier cost). */
  val simRerankTwoStage: QDef = q(
    "sim_rerank_two_stage",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |cv AS (
      |  SELECT vec_id, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qc,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10) AS BIGINT) AS qd
      |  FROM embeddings CROSS JOIN dims),
      |qp AS (SELECT vec_id AS q_id, i, qc AS qqc, qd AS qqd
      |  FROM cv WHERE vec_id < 8),
      |dots AS (
      |  SELECT qp.q_id, cv.vec_id,
      |    SUM(cv.qd * qp.qqd) AS s1, SUM(cv.qc * qp.qqc) AS s2
      |  FROM cv JOIN qp ON cv.i = qp.i AND cv.vec_id <> qp.q_id
      |  GROUP BY qp.q_id, cv.vec_id),
      |ex10 AS (
      |  SELECT q_id, vec_id, rne FROM (
      |    SELECT q_id, vec_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY s2 DESC, vec_id)
      |        AS rne
      |    FROM dots) WHERE rne <= 10),
      |r1 AS (
      |  SELECT q_id, vec_id, s2 FROM (
      |    SELECT q_id, vec_id, s2,
      |      row_number() OVER (PARTITION BY q_id ORDER BY s1 DESC, vec_id)
      |        AS rn1
      |    FROM dots) WHERE rn1 <= 20),
      |rr AS (
      |  SELECT q_id, vec_id, rn2 FROM (
      |    SELECT q_id, vec_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY s2 DESC, vec_id)
      |        AS rn2
      |    FROM r1) WHERE rn2 <= 10)
      |SELECT e.q_id, CAST(20 AS BIGINT) AS n_stage1,
      |  CAST(COUNT(r.vec_id) AS BIGINT) AS n_hits,
      |  CAST(COUNT(r.vec_id) * 10 AS BIGINT) AS recall_pct,
      |  CAST(MAX(CASE WHEN e.rne = 1 AND r.rn2 = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS top1_match
      |FROM ex10 e LEFT JOIN rr r ON r.q_id = e.q_id AND r.vec_id = e.vec_id
      |GROUP BY e.q_id
      |ORDER BY e.q_id""") { (s, d) =>
    val cv = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"),
        floor(col("v").cast(DoubleType) * 1000).cast(LongType).as("qc"),
        floor(col("v").cast(DoubleType) * 10).cast(LongType).as("qd"))
    val qp = cv.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("i").as("qi"),
        col("qc").as("qqc"), col("qd").as("qqd"))
    val dots = cv.join(broadcast(qp),
        col("i") === col("qi") && col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("qd") * col("qqd")).as("s1"),
        sum(col("qc") * col("qqc")).as("s2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wq = Window.partitionBy(col("q_id"))
    val ex10 = dots.withColumn("rne",
        row_number().over(wq.orderBy(col("s2").desc, col("vec_id"))))
      .filter(col("rne") <= 10).select(col("q_id"), col("vec_id"), col("rne"))
    val rr = dots.withColumn("rn1",
        row_number().over(wq.orderBy(col("s1").desc, col("vec_id"))))
      .filter(col("rn1") <= 20)
      .withColumn("rn2",
        row_number().over(wq.orderBy(col("s2").desc, col("vec_id"))))
      .filter(col("rn2") <= 10)
      .select(col("q_id").as("r_q"), col("vec_id").as("r_vec"), col("rn2"))
    ex10.join(rr, col("r_q") === col("q_id") && col("r_vec") === col("vec_id"),
        "left")
      .groupBy(col("q_id"))
      .agg(count(col("r_vec")).as("n_hits"),
        max(when(col("rne") === 1 && col("rn2") === 1, 1L).otherwise(0L))
          .as("top1_match"))
      .select(col("q_id"), lit(20L).as("n_stage1"), col("n_hits"),
        (col("n_hits") * 10L).as("recall_pct"), col("top1_match"))
      .orderBy(col("q_id"))
  }

  /** Stored-edge-table contract for the graph family (r18, VERDICT
    * r17 item 2 — the `dedup_signature_store_roundtrip` pattern
    * applied): eight graph keys rebuild `tradeEb` (the DISTINCT
    * orders⋈lineitem partnership edge set) from the facts per query,
    * which is correct under the bench contract but not the 100 TB
    * posture — there the edge table is PERSISTED and incrementally
    * maintained, and nothing graded that a stored edge table equals
    * recomputation. This key (1) builds `tradeEb` (ONE spelling with
    * every graph consumer), WRITES it through the parquet sink and
    * re-reads it; (2) pins the roundtrip edge-for-edge — the full
    * outer join of stored vs recomputed counts presence drift on
    * either side, and the oracle states the contract as literal 0,
    * so ANY parquet-boundary perturbation is a loud hash failure;
    * (3) runs a real consumer off the STORED side ONLY (the degree
    * census: node counts and max degrees per partition class — the
    * stats a capacity planner reads). The oracle recomputes
    * everything from the facts, so the grade certifies
    * stored == recomputed end to end. Scale: the stored side is
    * read, never rebuilt; the audit join shuffles edge-sized rows
    * (full outer cannot broadcast); every count is a 1-row broadcast
    * fold. Edge keys are BIGINTs — parquet roundtrips them
    * losslessly by construction, which is exactly the property the
    * full-outer pin certifies rather than assumes. */
  val graphEdgeStoreRoundtrip: QDef = q(
    "graph_edge_store_roundtrip",
    s"""WITH ${ClusterOps.tradeEbCte},
      |deg_c AS (SELECT ck, COUNT(*) AS dc FROM eb GROUP BY ck),
      |deg_s AS (SELECT sk, COUNT(*) AS ds FROM eb GROUP BY sk)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM eb) AS n_edges,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM eb) AS n_stored,
      |  CAST(0 AS BIGINT) AS n_roundtrip_mismatch,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg_c) AS n_cust,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg_s) AS n_supp,
      |  (SELECT CAST(MAX(dc) AS BIGINT) FROM deg_c) AS max_cust_deg,
      |  (SELECT CAST(MAX(ds) AS BIGINT) FROM deg_s) AS max_supp_deg""") {
    (s, d) =>
    // persist: edges is consumed TWICE — the write action below AND
    // the recomputed side of the full-outer audit — so an unpersisted
    // lineage rebuilt the orders⋈lineitem DISTINCT once per consumer
    // (r18-opt; the audit's "recomputed" side semantics are
    // unchanged: the cache holds exactly the recomputation the write
    // consumed, which is the equality under test).
    val edges = ClusterOps.tradeEb(s, d)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE the coalesce(1) write: the sink's single
    // task would otherwise narrow-collapse the orders⋈lineitem
    // DISTINCT into itself and compute it single-threaded (r19-opt —
    // measured as the dominant term of this key)
    edges.count()
    // The parquet sink + re-read IS the operator under test; the
    // write is the query's first action after the cache materializes
    // (the r17 signature-store convention). coalesce(1) +
    // in-partition sort replaces the old global sort + coalesce:
    // identical single sorted file, minus the range-sampling job and
    // range exchange the global sort planned (r18-opt).
    val out = graft.TempDirs.create("graft_edgestore")
    edges.coalesce(1).sortWithinPartitions(col("ck"), col("sk"))
      .write.mode("overwrite").parquet(out)
    val stored = s.read.parquet(out).persist(StorageLevel.MEMORY_AND_DISK)
    // r19-opt (guide §2.3/§3): the full-outer SMJ audit shuffled AND
    // sorted both edge-sized sides just to count presence drift.
    // Both sides are duplicate-free sets, so the same count is the
    // symmetric difference of a TAGGED UNION under one hash agg —
    // one exchange, no sorts, recomputed-vs-stored semantics
    // unchanged (both sides still real: the cache on one, the
    // re-read parquet on the other). coalesce: SUM over zero rows is
    // NULL but the oracle's contract is literal 0 (the r17 ADVICE
    // rule, applied from the start).
    val aMis = edges.select(col("ck"), col("sk"), lit(1L).as("a"), lit(0L).as("b"))
      .unionAll(stored.select(col("ck"), col("sk"), lit(0L).as("a"), lit(1L).as("b")))
      .groupBy(col("ck"), col("sk"))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
      .agg(coalesce(sum(when(col("na") === 0L || col("nb") === 0L, 1L)
        .otherwise(0L)), lit(0L)).as("n_roundtrip_mismatch"))
    val aEdges = edges.agg(count(lit(1)).as("n_edges"))
    // the consumer leg reads the STORED table only; n_stored folds
    // over the customer-degree table (Σ dc = |stored| exactly)
    // instead of a third stored scan (r19-opt)
    val degC = stored.groupBy(col("ck")).agg(count(lit(1)).as("dc"))
    val degS = stored.groupBy(col("sk")).agg(count(lit(1)).as("ds"))
    val aC = degC.agg(count(lit(1)).as("n_cust"),
      max(col("dc")).as("max_cust_deg"),
      coalesce(sum(col("dc")), lit(0L)).as("n_stored"))
    val aS = degS.agg(count(lit(1)).as("n_supp"),
      max(col("ds")).as("max_supp_deg"))
    aEdges.crossJoin(broadcast(aMis))
      .crossJoin(broadcast(aC)).crossJoin(broadcast(aS))
      .select(col("n_edges"), col("n_stored"), col("n_roundtrip_mismatch"),
        col("n_cust"), col("n_supp"), col("max_cust_deg"),
        col("max_supp_deg"))
  }

  /** Adamic–Adar link prediction (r18) — the hub-discounted
    * common-neighbor score next to `graph_jaccard_neighbors` (raw
    * overlap): AA(a,b) = Σ_{p ∈ N(a)∩N(b)} 1/ln(deg p) over the
    * supplier→part supply graph, the standard "which link forms
    * next" ranking where a part supplied by everyone contributes
    * almost nothing and a rare co-supplied part a lot. Per-part
    * weight is floor-micro-quantized BEFORE summing
    * (floor(10⁶/ln(deg)) — ONE float op per part on identical
    * integer input, then exact BIGINT sums, so the cross-engine sum
    * order cannot drift a bit). Same wedge machinery as the Jaccard
    * twin: one shuffle to per-part sorted adjacency, codegen'd
    * `graft_ordered_pairs` enumerates each part's C(d,2) pairs
    * row-locally — cost follows wedge count, never supplier². Same
    * 100 TB hub guard applies (cap/salt parts above a degree
    * ceiling). Top-50 by score is TakeOrdered. */
  val graphAdamicAdar: QDef = q(
    "graph_adamic_adar",
    """WITH sp AS (
      |  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
      |pdeg AS (SELECT pk, COUNT(*) AS pd FROM sp GROUP BY pk),
      |w AS (
      |  SELECT pk,
      |    CAST(floor(1000000.0 / ln(CAST(pd AS DOUBLE))) AS BIGINT) AS w
      |  FROM pdeg WHERE pd >= 2)
      |SELECT a.sk AS supp_a, b.sk AS supp_b,
      |  CAST(COUNT(*) AS BIGINT) AS common,
      |  CAST(SUM(w.w) AS BIGINT) AS aa_micro
      |FROM sp a JOIN sp b ON a.pk = b.pk AND a.sk < b.sk
      |JOIN w ON w.pk = a.pk
      |GROUP BY a.sk, b.sk
      |ORDER BY aa_micro DESC, supp_a, supp_b
      |LIMIT 50""") { (s, d) =>
    import graft.functions.VectorFunctions.orderedPairs
    // repartition(pk) BEFORE the set agg (r19-opt, guide §2.5 input
    // parallelism): the fixture fact is one parquet split, so the
    // partial collect_set built every adjacency set inside the
    // single scan task; pk-hash first spreads set-building across
    // the session width and the agg plans exchange-free on top
    val adj = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .repartition(col("pk"))
      .groupBy(col("pk"))
      .agg(sort_array(collect_set(col("sk"))).as("sks"))
      .filter(size(col("sks")) >= 2)
      .select(col("sks"),
        floor(lit(1000000.0) / log(size(col("sks")).cast(DoubleType)))
          .cast(LongType).as("w"))
    adj.select(explode(orderedPairs(col("sks"))).as("p"), col("w"))
      .groupBy(col("p.a").as("supp_a"), col("p.b").as("supp_b"))
      .agg(count(lit(1)).as("common"), sum(col("w")).as("aa_micro"))
      .orderBy(col("aa_micro").desc, col("supp_a"), col("supp_b"))
      .limit(50)
  }

  /** Snapshot stat-drift audit (r18) — the daily ingestion alarm a
    * 100 TB pipeline runs before anything downstream: per-column
    * profile of "yesterday" vs "today" (md5-parity halves of orders,
    * the house snapshot convention) compared metric by metric. One
    * scan, ONE grouped multi-distinct agg (2 rows out), and a
    * row-local stack/unpivot — at scale the prior half's profile is
    * read from the metrics store instead of recomputed, and the
    * comparison shape is unchanged. All metrics are exact BIGINTs
    * (prices in half-up cents, means floor-div), so drift_abs is
    * exact integer distance. */
  val dqSchemaDrift: QDef = q(
    "dq_schema_drift",
    """WITH prof AS (
      |  SELECT
      |    CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) <= '7'
      |      THEN 1 ELSE 0 END AS prior,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
      |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
      |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd_prio,
      |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS sum_cents,
      |    CAST(MIN(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS min_cents,
      |    CAST(MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS max_cents
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT p.n_rows AS p_n, p.nd_cust AS p_ndc, p.nd_status AS p_nds,
      |    p.nd_prio AS p_ndp, p.sum_cents AS p_sum, p.min_cents AS p_min,
      |    p.max_cents AS p_max,
      |    i.n_rows AS i_n, i.nd_cust AS i_ndc, i.nd_status AS i_nds,
      |    i.nd_prio AS i_ndp, i.sum_cents AS i_sum, i.min_cents AS i_min,
      |    i.max_cents AS i_max
      |  FROM (SELECT * FROM prof WHERE prior = 1) p,
      |       (SELECT * FROM prof WHERE prior = 0) i),
      |m AS (
      |  SELECT 'n_rows' AS metric, p_n AS v_prior, i_n AS v_incr FROM w
      |  UNION ALL SELECT 'nd_custkey', p_ndc, i_ndc FROM w
      |  UNION ALL SELECT 'nd_status', p_nds, i_nds FROM w
      |  UNION ALL SELECT 'nd_priority', p_ndp, i_ndp FROM w
      |  UNION ALL SELECT 'sum_price_cents', p_sum, i_sum FROM w
      |  UNION ALL SELECT 'mean_price_cents', p_sum // p_n, i_sum // i_n FROM w
      |  UNION ALL SELECT 'min_price_cents', p_min, i_min FROM w
      |  UNION ALL SELECT 'max_price_cents', p_max, i_max FROM w)
      |SELECT metric, v_prior, v_incr, abs(v_prior - v_incr) AS drift_abs
      |FROM m ORDER BY metric""") { (s, d) =>
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
    val prof = Tables.orders(s, d)
      .select(
        when(substring(md5(col("o_orderkey").cast(StringType)), 1, 1) <= "7",
          1).otherwise(0).as("prior"),
        col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"),
        cents.as("cents"))
      .groupBy(col("prior"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("nd_cust"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        countDistinct(col("o_orderpriority")).as("nd_prio"),
        sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
    val p = prof.filter(col("prior") === 1).select(
      col("n_rows").as("p_n"), col("nd_cust").as("p_ndc"),
      col("nd_status").as("p_nds"), col("nd_prio").as("p_ndp"),
      col("sum_cents").as("p_sum"), col("min_cents").as("p_min"),
      col("max_cents").as("p_max"))
    val i = prof.filter(col("prior") === 0).select(
      col("n_rows").as("i_n"), col("nd_cust").as("i_ndc"),
      col("nd_status").as("i_nds"), col("nd_prio").as("i_ndp"),
      col("sum_cents").as("i_sum"), col("min_cents").as("i_min"),
      col("max_cents").as("i_max"))
    p.crossJoin(broadcast(i))
      .select(expr(
        """stack(8,
          |  'n_rows', p_n, i_n,
          |  'nd_custkey', p_ndc, i_ndc,
          |  'nd_status', p_nds, i_nds,
          |  'nd_priority', p_ndp, i_ndp,
          |  'sum_price_cents', p_sum, i_sum,
          |  'mean_price_cents', p_sum div p_n, i_sum div i_n,
          |  'min_price_cents', p_min, i_min,
          |  'max_price_cents', p_max, i_max) AS (metric, v_prior, v_incr)
          |""".stripMargin))
      .select(col("metric"), col("v_prior"), col("v_incr"),
        abs(col("v_prior") - col("v_incr")).as("drift_abs"))
      .orderBy(col("metric"))
  }

  /** Filter-cascade cost audit (r18) — the stage-ordering decision a
    * curation pipeline makes once and pays forever: the SAME four
    * stages (length gate cost 1/doc, lang allowlist cost 2/doc,
    * TTR+length quality gate cost 10/doc — the `curation_funnel`
    * spellings — and exact-dedup cost 5/doc) run cheap-first vs
    * quality-first. Pure per-doc filters commute, so both plans end
    * at the same survivor set — what differs is COMPUTE: each
    * stage's cost is (docs entering) × (unit cost), and running the
    * expensive classifier first pays it on the whole corpus. Graded
    * as the full 2×4 funnel with cumulative cost — the table that
    * justifies cascade ordering at 100 TB. One scan, one flag-sum
    * fold, one dedup count; the funnel arithmetic is row-local over
    * 1-row broadcasts. */
  val curationCascadeCost: QDef = q(
    "curation_cascade_cost",
    """WITH t AS (
      |  SELECT doc_id, text, lang, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |      AS nuniq
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, text,
      |    CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS p_len,
      |    CASE WHEN lang IN ('en', 'es', 'de', 'fr') THEN 1 ELSE 0 END
      |      AS p_lang,
      |    CASE WHEN ntok >= 10 AND CAST(nuniq AS DOUBLE) / ntok >= 0.3
      |      THEN 1 ELSE 0 END AS p_qual
      |  FROM t),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
      |    CAST(SUM(p_len) AS BIGINT) AS nl,
      |    CAST(SUM(p_len * p_lang) AS BIGINT) AS nll,
      |    CAST(SUM(p_qual) AS BIGINT) AS nq,
      |    CAST(SUM(p_qual * p_lang) AS BIGINT) AS nql,
      |    CAST(SUM(p_len * p_lang * p_qual) AS BIGINT) AS nall
      |  FROM f),
      |sv AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS nsurv FROM (
      |    SELECT MIN(doc_id) FROM f
      |    WHERE p_len = 1 AND p_lang = 1 AND p_qual = 1 GROUP BY text)),
      |m AS (
      |  SELECT 'cheap_first' AS plan, 1 AS stage_idx, 'len' AS stage,
      |    n0 AS n_in, nl AS n_out, n0 * 1 AS stage_cost, n0 * 1 AS cum_cost
      |  FROM agg, sv
      |  UNION ALL SELECT 'cheap_first', 2, 'lang', nl, nll, nl * 2,
      |    n0 * 1 + nl * 2 FROM agg, sv
      |  UNION ALL SELECT 'cheap_first', 3, 'quality', nll, nall, nll * 10,
      |    n0 * 1 + nl * 2 + nll * 10 FROM agg, sv
      |  UNION ALL SELECT 'cheap_first', 4, 'dedup', nall, nsurv, nall * 5,
      |    n0 * 1 + nl * 2 + nll * 10 + nall * 5 FROM agg, sv
      |  UNION ALL SELECT 'quality_first', 1, 'quality', n0, nq, n0 * 10,
      |    n0 * 10 FROM agg, sv
      |  UNION ALL SELECT 'quality_first', 2, 'lang', nq, nql, nq * 2,
      |    n0 * 10 + nq * 2 FROM agg, sv
      |  UNION ALL SELECT 'quality_first', 3, 'len', nql, nall, nql * 1,
      |    n0 * 10 + nq * 2 + nql * 1 FROM agg, sv
      |  UNION ALL SELECT 'quality_first', 4, 'dedup', nall, nsurv, nall * 5,
      |    n0 * 10 + nq * 2 + nql * 1 + nall * 5 FROM agg, sv)
      |SELECT plan, CAST(stage_idx AS BIGINT) AS stage_idx, stage, n_in,
      |  n_out, CAST(stage_cost AS BIGINT) AS stage_cost,
      |  CAST(cum_cost AS BIGINT) AS cum_cost
      |FROM m ORDER BY plan, stage_idx""") { (s, d) =>
    val toks = split(col("text"), " ")
    val f = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        when(col("n_chars") >= 100, 1L).otherwise(0L).as("p_len"),
        when(col("lang").isin("en", "es", "de", "fr"), 1L).otherwise(0L)
          .as("p_lang"),
        when(size(toks) >= 10 &&
            size(array_distinct(toks)).cast(DoubleType) /
              size(toks).cast(DoubleType) >= 0.3, 1L)
          .otherwise(0L).as("p_qual"))
    val agg0 = f.agg(count(lit(1)).as("n0"),
      sum(col("p_len")).as("nl"),
      sum(col("p_len") * col("p_lang")).as("nll"),
      sum(col("p_qual")).as("nq"),
      sum(col("p_qual") * col("p_lang")).as("nql"),
      sum(col("p_len") * col("p_lang") * col("p_qual")).as("nall"))
    val sv = f.filter(col("p_len") === 1L && col("p_lang") === 1L &&
        col("p_qual") === 1L)
      .groupBy(col("text")).agg(min(col("doc_id")))
      .agg(count(lit(1)).as("nsurv"))
    agg0.crossJoin(broadcast(sv))
      .select(expr(
        """stack(8,
          |  'cheap_first', 1L, 'len', n0, nl, n0 * 1L, n0 * 1L,
          |  'cheap_first', 2L, 'lang', nl, nll, nl * 2L, n0 * 1L + nl * 2L,
          |  'cheap_first', 3L, 'quality', nll, nall, nll * 10L,
          |    n0 * 1L + nl * 2L + nll * 10L,
          |  'cheap_first', 4L, 'dedup', nall, nsurv, nall * 5L,
          |    n0 * 1L + nl * 2L + nll * 10L + nall * 5L,
          |  'quality_first', 1L, 'quality', n0, nq, n0 * 10L, n0 * 10L,
          |  'quality_first', 2L, 'lang', nq, nql, nq * 2L,
          |    n0 * 10L + nq * 2L,
          |  'quality_first', 3L, 'len', nql, nall, nql * 1L,
          |    n0 * 10L + nq * 2L + nql * 1L,
          |  'quality_first', 4L, 'dedup', nall, nsurv, nall * 5L,
          |    n0 * 10L + nq * 2L + nql * 1L + nall * 5L)
          |  AS (plan, stage_idx, stage, n_in, n_out, stage_cost, cum_cost)
          |""".stripMargin))
      .orderBy(col("plan"), col("stage_idx"))
  }

  /** McNemar's paired-proportion test (r18) — the within-subject
    * binary complement to `stats_paired_t` (continuous) and
    * `stats_prop_ztest` (independent arms): per event type, each
    * user's pre- vs post-cut ACTIVITY (any event of that type before
    * / after the shared 2024-01-16 cut) is a paired binary outcome,
    * and the test statistic uses only the DISCORDANT pairs:
    * χ² = (b−c)²/(b+c) with b = active-pre-only, c =
    * active-post-only. Exact integers end to end — χ² ships in
    * floor-micro ((b−c)²·10⁶ div (b+c), zero-discordance guarded
    * NULL), significance at the house z² bound 3.841459. One
    * (type, user)-keyed agg + a type fold. */
  val statsMcnemarPaired: QDef = q(
    "stats_mcnemar_paired",
    """WITH u AS (
      |  SELECT event_type, user_id,
      |    MAX(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
      |      THEN 1 ELSE 0 END) AS pre,
      |    MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
      |      THEN 1 ELSE 0 END) AS post
      |  FROM events GROUP BY event_type, user_id)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(pre * (1 - post)) AS BIGINT) AS n_pre_only,
      |  CAST(SUM((1 - pre) * post) AS BIGINT) AS n_post_only,
      |  CASE WHEN SUM(pre * (1 - post)) + SUM((1 - pre) * post) = 0
      |    THEN NULL
      |    ELSE CAST((SUM(pre * (1 - post)) - SUM((1 - pre) * post))
      |      * (SUM(pre * (1 - post)) - SUM((1 - pre) * post)) * 1000000
      |      // (SUM(pre * (1 - post)) + SUM((1 - pre) * post)) AS BIGINT)
      |    END AS chi2_micro,
      |  CASE WHEN SUM(pre * (1 - post)) + SUM((1 - pre) * post) = 0
      |    THEN NULL
      |    ELSE CAST((SUM(pre * (1 - post)) - SUM((1 - pre) * post))
      |      * (SUM(pre * (1 - post)) - SUM((1 - pre) * post)) * 1000000
      |      // (SUM(pre * (1 - post)) + SUM((1 - pre) * post)) AS BIGINT)
      |      > 3841459 END AS significant
      |FROM u GROUP BY event_type
      |ORDER BY event_type""") { (s, d) =>
    val u = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        when(col("ts") < lit("2024-01-16 00:00:00").cast(TimestampType), 1L)
          .otherwise(0L).as("pre_f"),
        when(col("ts") >= lit("2024-01-16 00:00:00").cast(TimestampType), 1L)
          .otherwise(0L).as("post_f"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(max(col("pre_f")).as("pre"), max(col("post_f")).as("post"))
    u.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("pre") * (lit(1L) - col("post"))).as("b"),
        sum((lit(1L) - col("pre")) * col("post")).as("c"))
      .select(col("event_type"), col("n_users"),
        col("b").as("n_pre_only"), col("c").as("n_post_only"),
        when(col("b") + col("c") === 0L, lit(null).cast(LongType))
          .otherwise(expr("(b - c) * (b - c) * 1000000 div (b + c)"))
          .as("chi2_micro"),
        when(col("b") + col("c") === 0L, lit(null).cast(BooleanType))
          .otherwise(expr("(b - c) * (b - c) * 1000000 div (b + c)")
            > 3841459L).as("significant"))
      .orderBy(col("event_type"))
  }

  /** Fleiss' kappa (r18) — multi-rater chance-corrected agreement,
    * the n-rater generalization of the graded `eval_cohens_kappa`
    * (2 raters): three deterministic rule-raters categorize every
    * document by token count with rater-specific boundaries (the
    * disagreement band between 40 and 60 / 140 and 160 tokens is
    * real), and κ = (P̄−P̄e)/(1−P̄e) is ONE exact rational after
    * clearing denominators: with n=3 raters, N docs, S = Σᵢⱼ nᵢⱼ²
    * and T = Σⱼ Cⱼ², κ·ppm = (3N(S−3N) − 2T)·10⁶ div (18N² − 2T)
    * (complete-agreement den=0 guarded NULL). Per-doc category
    * counts are row-local; the grade is one corpus fold — the
    * agreement audit a labeling pipeline publishes per batch. */
  val statsFleissKappa: QDef = q(
    "stats_fleiss_kappa",
    """WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |r AS (
      |  SELECT
      |    CASE WHEN ntok < 50 THEN 0 WHEN ntok < 150 THEN 1 ELSE 2 END AS r0,
      |    CASE WHEN ntok < 60 THEN 0 WHEN ntok < 140 THEN 1 ELSE 2 END AS r1,
      |    CASE WHEN ntok < 40 THEN 0 WHEN ntok < 160 THEN 1 ELSE 2 END AS r2
      |  FROM t),
      |n AS (
      |  SELECT
      |    (CASE WHEN r0 = 0 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r1 = 0 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r2 = 0 THEN 1 ELSE 0 END) AS n0,
      |    (CASE WHEN r0 = 1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r1 = 1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r2 = 1 THEN 1 ELSE 0 END) AS n1,
      |    (CASE WHEN r0 = 2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r1 = 2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r2 = 2 THEN 1 ELSE 0 END) AS n2
      |  FROM r),
      |f AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |    CAST(SUM(n0 * n0 + n1 * n1 + n2 * n2) AS BIGINT) AS s_sq,
      |    CAST(SUM(n0) AS BIGINT) AS c0, CAST(SUM(n1) AS BIGINT) AS c1,
      |    CAST(SUM(n2) AS BIGINT) AS c2
      |  FROM n)
      |SELECT nd AS n_docs, s_sq, c0, c1, c2,
      |  CAST((s_sq - 3 * nd) * 1000000 // (6 * nd) AS BIGINT) AS pbar_ppm,
      |  CAST((c0 * c0 + c1 * c1 + c2 * c2) * 1000000 // (9 * nd * nd)
      |    AS BIGINT) AS pe_ppm,
      |  CASE WHEN 18 * nd * nd - 2 * (c0 * c0 + c1 * c1 + c2 * c2) = 0
      |    THEN NULL
      |    ELSE CAST((3 * nd * (s_sq - 3 * nd)
      |        - 2 * (c0 * c0 + c1 * c1 + c2 * c2)) * 1000000
      |      // (18 * nd * nd - 2 * (c0 * c0 + c1 * c1 + c2 * c2))
      |      AS BIGINT) END AS kappa_ppm
      |FROM f""") { (s, d) =>
    val ntok = size(split(col("text"), " ")).cast(LongType)
    def cat(lo: Long, hi: Long): Column =
      when(col("ntok") < lo, 0L).when(col("ntok") < hi, 1L).otherwise(2L)
    val r = Tables.documents(s, d).select(ntok.as("ntok"))
      .select(cat(50, 150).as("r0"), cat(60, 140).as("r1"),
        cat(40, 160).as("r2"))
    def nj(j: Long): Column =
      Seq("r0", "r1", "r2")
        .map(c => when(col(c) === j, 1L).otherwise(0L)).reduce(_ + _)
    val f = r.select(nj(0).as("n0"), nj(1).as("n1"), nj(2).as("n2"))
      .agg(count(lit(1)).as("nd"),
        sum(col("n0") * col("n0") + col("n1") * col("n1")
          + col("n2") * col("n2")).as("s_sq"),
        sum(col("n0")).as("c0"), sum(col("n1")).as("c1"),
        sum(col("n2")).as("c2"))
    f.select(col("nd").as("n_docs"), col("s_sq"), col("c0"), col("c1"),
        col("c2"),
        expr("(s_sq - 3 * nd) * 1000000 div (6 * nd)").as("pbar_ppm"),
        expr("(c0 * c0 + c1 * c1 + c2 * c2) * 1000000 div (9 * nd * nd)")
          .as("pe_ppm"),
        when(expr("18 * nd * nd - 2 * (c0 * c0 + c1 * c1 + c2 * c2)") === 0L,
          lit(null).cast(LongType))
          .otherwise(expr(
            """(3 * nd * (s_sq - 3 * nd)
              | - 2 * (c0 * c0 + c1 * c1 + c2 * c2)) * 1000000
              | div (18 * nd * nd
              | - 2 * (c0 * c0 + c1 * c1 + c2 * c2))""".stripMargin))
          .as("kappa_ppm"))
  }

  /** Curriculum schedule plan (r18) — the length-ordered training
    * curriculum (short/simple documents first) computed WITHOUT a
    * global sort: the corpus's token-count HISTOGRAM (bounded by
    * distinct lengths, not corpus size) is cumulated by a broadcast
    * value self-join — the `ann_hnsw_layer_assign` cumulative
    * pattern, no unpartitioned window anywhere — and each length
    * block is assigned phase ⌊cum_before·4/N⌋ (capped at 3): every
    * doc of one length lands in one phase, the convention a
    * histogram-driven scheduler ships. Graded per phase: doc census,
    * length bounds, token mass and its corpus share in ppm — the
    * table a curriculum sampler consumes. At 100 TB the histogram is
    * a few thousand rows regardless of corpus size. */
  val mixCurriculumSchedule: QDef = q(
    "mix_curriculum_schedule",
    """WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |h AS (
      |  SELECT ntok, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(ntok) AS BIGINT) AS toks
      |  FROM t GROUP BY ntok),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
      |  CAST(SUM(toks) AS BIGINT) AS tok_all FROM h),
      |cum AS (
      |  SELECT a.ntok, a.n_docs, a.toks,
      |    CAST(COALESCE(SUM(b.n_docs), 0) AS BIGINT) AS cum_before
      |  FROM h a LEFT JOIN h b ON b.ntok < a.ntok
      |  GROUP BY a.ntok, a.n_docs, a.toks),
      |ph AS (
      |  SELECT LEAST(3, cum_before * 4 // n) AS phase, c.*
      |  FROM cum c, tot)
      |SELECT CAST(phase AS BIGINT) AS phase,
      |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  MIN(ntok) AS min_ntok, MAX(ntok) AS max_ntok,
      |  CAST(SUM(toks) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(toks) * 1000000 // MAX(t2.tok_all) AS BIGINT)
      |    AS token_share_ppm
      |FROM ph, tot t2 GROUP BY phase ORDER BY phase""") { (s, d) =>
    val h = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast(LongType).as("ntok"))
      .groupBy(col("ntok"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("toks"))
    val tot = h.agg(sum(col("n_docs")).as("n"), sum(col("toks")).as("tok_all"))
    val cum = h.as("a")
      .join(broadcast(h.select(col("ntok").as("b_ntok"),
          col("n_docs").as("b_n"))),
        col("b_ntok") < col("a.ntok"), "left")
      .groupBy(col("a.ntok").as("ntok"), col("a.n_docs").as("n_docs"),
        col("a.toks").as("toks"))
      .agg(coalesce(sum(col("b_n")), lit(0L)).as("cum_before"))
    cum.crossJoin(broadcast(tot))
      .select(least(lit(3L), expr("cum_before * 4 div n")).as("phase"),
        col("n_docs"), col("ntok"), col("toks"), col("tok_all"))
      .groupBy(col("phase"))
      .agg(sum(col("n_docs")).as("n_docs"), min(col("ntok")).as("min_ntok"),
        max(col("ntok")).as("max_ntok"), sum(col("toks")).as("sum_tokens"),
        expr("sum(toks) * 1000000 div max(tok_all)").as("token_share_ppm"))
      .orderBy(col("phase"))
  }

  /** Importance-sampling effective sample size (r18) — the mixture
    * health check next to the mix_* planners: re-weighting the
    * corpus from its ACTUAL source shares to a TARGET mix (here ∝
    * per-source character mass — the "weight sources by content, not
    * doc count" shift) costs statistical efficiency, and
    * ESS/N = (Σw)²/(N·Σw²) is the number that says how much. Weights
    * are exact micro rationals (target_ppm·10⁶ div actual_ppm), the
    * ESS fold clears to one DECIMAL(38)/HUGEINT rational in ppm —
    * deterministic to the last digit at any scale. Per source:
    * census, actual vs target shares, the weight; the global ESS
    * rides every row (1-row broadcast). Source-sized shuffles
    * only. */
  val sampleEssImportance: QDef = q(
    "sample_ess_importance",
    """WITH s AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
      |  CAST(SUM(chars) AS BIGINT) AS chars_all FROM s),
      |w AS (
      |  SELECT source, n_docs,
      |    CAST(n_docs * 1000000 // n AS BIGINT) AS actual_ppm,
      |    CAST(chars * 1000000 // chars_all AS BIGINT) AS target_ppm,
      |    CAST((chars * 1000000 // chars_all) * 1000000
      |      // (n_docs * 1000000 // n) AS BIGINT) AS w_micro
      |  FROM s, tot),
      |ess AS (
      |  SELECT CAST(SUM(n_docs * w_micro) AS HUGEINT) AS sw,
      |    CAST(SUM(n_docs * w_micro * w_micro) AS HUGEINT) AS sww,
      |    CAST(SUM(n_docs) AS HUGEINT) AS n
      |  FROM w)
      |SELECT w.source, w.n_docs, w.actual_ppm, w.target_ppm, w.w_micro,
      |  CAST(ess.sw * ess.sw * 1000000 // (ess.n * ess.sww) AS BIGINT)
      |    AS ess_ppm
      |FROM w, ess ORDER BY w.source""") { (s, d) =>
    val src = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val tot = src.agg(sum(col("n_docs")).as("n"),
      sum(col("chars")).as("chars_all"))
    val w = src.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("n_docs * 1000000 div n").as("actual_ppm"),
        expr("chars * 1000000 div chars_all").as("target_ppm"))
      .select(col("source"), col("n_docs"), col("actual_ppm"),
        col("target_ppm"),
        expr("target_ppm * 1000000 div actual_ppm").as("w_micro"))
    val ess = w.agg(
      sum(col("n_docs") * col("w_micro")).cast(DecimalType(38, 0)).as("sw"),
      sum(col("n_docs") * col("w_micro") * col("w_micro"))
        .cast(DecimalType(38, 0)).as("sww"),
      sum(col("n_docs")).cast(DecimalType(38, 0)).as("nn"))
    w.crossJoin(broadcast(ess))
      .select(col("source"), col("n_docs"), col("actual_ppm"),
        col("target_ppm"), col("w_micro"),
        expr("CAST(sw * sw * 1000000 div (nn * sww) AS BIGINT)")
          .as("ess_ppm"))
      .orderBy(col("source"))
  }

  /** Partial autocorrelation at lag 2 (r18) — the AR-order probe
    * that complements `ts_acf_lags` (raw ACF): via Durbin–Levinson,
    * φ₂₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²) — the lag-2 correlation AFTER
    * removing what lag 1 already explains, THE number that separates
    * an AR(1) daily series (φ₂₂ ≈ 0) from one needing a second-order
    * model. ρ₁/ρ₂ are the ts_acf_lags lag-Pearson spellings verbatim
    * (exact DECIMAL(38) sums into one identical float tree);
    * φ₂₂ is one more float op on those identical doubles, degenerate
    * 1−ρ₁² = 0 guarded NULL. Day-pair joins on the calendar-day
    * grid, everything after day-sized. */
  val tsPacfLag2: QDef = q(
    "ts_pacf_lag2",
    """WITH dtot AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY event_type, day),
      |lg AS (SELECT * FROM (VALUES (1), (2)) t(lag)),
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
      |r AS (
      |  SELECT event_type, lag, n,
      |    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (sqrt(n * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * sqrt(n * CAST(syy AS DOUBLE)
      |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf
      |  FROM s)
      |SELECT a1.event_type, a1.n AS n1, a2.n AS n2,
      |  a1.acf AS acf1, a2.acf AS acf2,
      |  CASE WHEN 1 - a1.acf * a1.acf = 0 THEN NULL
      |    ELSE (a2.acf - a1.acf * a1.acf) / (1 - a1.acf * a1.acf)
      |    END AS pacf2
      |FROM r a1 JOIN r a2
      |  ON a2.event_type = a1.event_type AND a1.lag = 1 AND a2.lag = 2
      |ORDER BY a1.event_type""") { (s, d) =>
    import s.implicits._
    val dtot = Tables.events(s, d)
      .select(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).cast(LongType).as("cents"))
    val lg = Seq(1, 2).toDF("lag")
    val p = dtot.as("a").crossJoin(broadcast(lg))
      .join(dtot.select(col("event_type").as("bt"), col("day").as("bd"),
          col("cents").as("y")),
        col("bt") === col("a.event_type") &&
          col("bd") === date_add(col("a.day"), col("lag")))
      .select(col("a.event_type").as("event_type"), col("lag"),
        col("a.cents").as("x"), col("y"))
    val dec = DecimalType(38, 0)
    val st = p.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"))
    val r = st.select(col("event_type"), col("lag"), col("n"),
      ((col("n") * col("sxy").cast(DoubleType)
        - col("sx").cast(DoubleType) * col("sy").cast(DoubleType))
        / (sqrt(col("n") * col("sxx").cast(DoubleType)
            - col("sx").cast(DoubleType) * col("sx").cast(DoubleType))
          * sqrt(col("n") * col("syy").cast(DoubleType)
            - col("sy").cast(DoubleType) * col("sy").cast(DoubleType))))
        .as("acf"))
    val a1 = r.filter(col("lag") === 1)
      .select(col("event_type"), col("n").as("n1"), col("acf").as("acf1"))
    val a2 = r.filter(col("lag") === 2)
      .select(col("event_type").as("t2"), col("n").as("n2"),
        col("acf").as("acf2"))
    a1.join(broadcast(a2), col("t2") === col("event_type"))
      .select(col("event_type"), col("n1"), col("n2"), col("acf1"),
        col("acf2"),
        when(lit(1.0) - col("acf1") * col("acf1") === 0.0,
          lit(null).cast(DoubleType))
          .otherwise((col("acf2") - col("acf1") * col("acf1"))
            / (lit(1.0) - col("acf1") * col("acf1"))).as("pacf2"))
      .orderBy(col("event_type"))
  }

  /** Theil T inequality index (r18) — the decomposable concentration
    * measure next to `agg_gini_value` (rank-based): per nation, over
    * its customers' order-revenue totals, T = (1/n)Σ(xᵢ/μ)ln(xᵢ/μ).
    * Revenue is exact integer cents; each customer's term is
    * quantized to floor-micro THROUGH one identical float tree on
    * exact integer inputs (r = x·n/S with both products inside
    * double-exact range, then r·ln(r)·10⁶ floored) and the nation
    * fold is an exact BIGINT sum — summation order cannot drift a
    * bit. Two keyed aggs (customer totals, nation fold) + a
    * broadcast dim join; the nation mean ships as floor-cents. */
  /** (n_name, x): per-customer order-revenue cents tagged with the
    * customer's nation — the shared base of the inequality pair
    * (`agg_theil_index`, `agg_atkinson_index`). */
  private[ops] val custRevCtes: String =
    """cx AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM orders GROUP BY o_custkey),
      |cn AS (
      |  SELECT n.n_name, cx.x
      |  FROM cx JOIN customer c ON c.c_custkey = cx.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey)""".stripMargin

  /** Spark twin of `custRevCtes`. */
  private[ops] def custRevByNation(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast(LongType))
        .cast(LongType).as("x"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"), col("x"))

  val aggTheilIndex: QDef = q(
    "agg_theil_index",
    s"""WITH $custRevCtes,
      |f AS (
      |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx
      |  FROM cn GROUP BY n_name),
      |t AS (
      |  SELECT cn.n_name,
      |    CAST(floor((CAST(cn.x * f.n AS DOUBLE) / f.sx)
      |      * ln(CAST(cn.x * f.n AS DOUBLE) / f.sx) * 1000000) AS BIGINT)
      |      AS term
      |  FROM cn JOIN f ON f.n_name = cn.n_name)
      |SELECT f.n_name, f.n AS n_customers,
      |  CAST(f.sx // f.n AS BIGINT) AS mean_cents,
      |  CAST(SUM(t.term) // f.n AS BIGINT) AS theil_micro
      |FROM t JOIN f ON f.n_name = t.n_name
      |GROUP BY f.n_name, f.n, f.sx
      |ORDER BY f.n_name""") { (s, d) =>
    val cn = custRevByNation(s, d)
    val f = cn.groupBy(col("n_name").as("f_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).cast(LongType).as("sx"))
    val ratio = (col("x") * col("n")).cast(DoubleType) / col("sx")
    cn.join(broadcast(f), col("f_name") === col("n_name"))
      .select(col("n_name"), col("n"), col("sx"),
        floor(ratio * log(ratio) * 1000000).cast(LongType).as("term"))
      .groupBy(col("n_name"), col("n"), col("sx"))
      .agg(sum(col("term")).as("st"))
      .select(col("n_name"), col("n").as("n_customers"),
        expr("sx div n").as("mean_cents"),
        expr("st div n").as("theil_micro"))
      .orderBy(col("n_name"))
  }

  /** Maximal Marginal Relevance diversified top-k (r18) — the
    * diversity-aware selection every production RAG retriever runs
    * after similarity search (Carbonell & Goldstein 1998): from each
    * panel probe's top-20 relevance candidates (milli-dot, the
    * two-stage convention), greedily pick 5 where pick r maximizes
    * λ·rel(q,i) − (1−λ)·max_{j∈picked} sim(i,j) with λ = 7/10 — so
    * score×10 = 7·rel − 3·max_sim is EXACT INTEGER algebra on the
    * two milli-dot families (relevance to the probe, redundancy
    * among candidates), ties to the smaller vec_id. The five rounds
    * are unrolled (bounded k, the `graph_bfs_levels` convention);
    * every post-candidate frame is panel×20-sized, the candidate
    * pair dots are 20×20 per probe — never corpus². Graded as the
    * ranked pick list with the redundancy penalty that drove each
    * pick. */
  val simMmrDiversify: QDef = q(
    "sim_mmr_diversify",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |cv AS (
      |  SELECT vec_id, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qc
      |  FROM embeddings CROSS JOIN dims),
      |qp AS (SELECT vec_id AS q_id, i, qc AS qqc FROM cv WHERE vec_id < 8),
      |dots AS (
      |  SELECT qp.q_id, cv.vec_id, SUM(cv.qc * qp.qqc) AS rel
      |  FROM cv JOIN qp ON cv.i = qp.i AND cv.vec_id <> qp.q_id
      |  GROUP BY qp.q_id, cv.vec_id),
      |cand AS (
      |  SELECT q_id, vec_id, rel FROM (
      |    SELECT q_id, vec_id, rel,
      |      row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id)
      |        AS rn
      |    FROM dots) WHERE rn <= 20),
      |cc AS (
      |  SELECT c.q_id, c.vec_id, cv.i, cv.qc
      |  FROM cand c JOIN cv ON cv.vec_id = c.vec_id),
      |cp AS (
      |  SELECT a.q_id, a.vec_id AS va, b.vec_id AS vb,
      |    SUM(a.qc * b.qc) AS sim
      |  FROM cc a JOIN cc b
      |    ON b.q_id = a.q_id AND b.i = a.i AND b.vec_id <> a.vec_id
      |  GROUP BY a.q_id, a.vec_id, b.vec_id),
      |p1 AS (
      |  SELECT q_id, vec_id, rel, CAST(0 AS BIGINT) AS max_sim FROM (
      |    SELECT q_id, vec_id, rel,
      |      row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id)
      |        AS rn
      |    FROM cand) WHERE rn = 1),
      |m2 AS (
      |  SELECT c.q_id, c.vec_id, c.rel, MAX(cp.sim) AS ms
      |  FROM cand c
      |  JOIN p1 ON p1.q_id = c.q_id AND p1.vec_id <> c.vec_id
      |  JOIN cp ON cp.q_id = c.q_id AND cp.va = c.vec_id
      |    AND cp.vb = p1.vec_id
      |  GROUP BY c.q_id, c.vec_id, c.rel),
      |p2 AS (
      |  SELECT q_id, vec_id, rel, ms AS max_sim FROM (
      |    SELECT q_id, vec_id, rel, ms,
      |      row_number() OVER (PARTITION BY q_id
      |        ORDER BY 7 * rel - 3 * ms DESC, vec_id) AS rn
      |    FROM m2) WHERE rn = 1),
      |s2 AS (SELECT q_id, vec_id FROM p1
      |  UNION ALL SELECT q_id, vec_id FROM p2),
      |m3 AS (
      |  SELECT c.q_id, c.vec_id, c.rel, MAX(cp.sim) AS ms
      |  FROM cand c
      |  JOIN cp ON cp.q_id = c.q_id AND cp.va = c.vec_id
      |  JOIN s2 ON s2.q_id = c.q_id AND s2.vec_id = cp.vb
      |  WHERE NOT EXISTS (SELECT 1 FROM s2 x
      |    WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
      |  GROUP BY c.q_id, c.vec_id, c.rel),
      |p3 AS (
      |  SELECT q_id, vec_id, rel, ms AS max_sim FROM (
      |    SELECT q_id, vec_id, rel, ms,
      |      row_number() OVER (PARTITION BY q_id
      |        ORDER BY 7 * rel - 3 * ms DESC, vec_id) AS rn
      |    FROM m3) WHERE rn = 1),
      |s3 AS (SELECT * FROM s2 UNION ALL SELECT q_id, vec_id FROM p3),
      |m4 AS (
      |  SELECT c.q_id, c.vec_id, c.rel, MAX(cp.sim) AS ms
      |  FROM cand c
      |  JOIN cp ON cp.q_id = c.q_id AND cp.va = c.vec_id
      |  JOIN s3 ON s3.q_id = c.q_id AND s3.vec_id = cp.vb
      |  WHERE NOT EXISTS (SELECT 1 FROM s3 x
      |    WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
      |  GROUP BY c.q_id, c.vec_id, c.rel),
      |p4 AS (
      |  SELECT q_id, vec_id, rel, ms AS max_sim FROM (
      |    SELECT q_id, vec_id, rel, ms,
      |      row_number() OVER (PARTITION BY q_id
      |        ORDER BY 7 * rel - 3 * ms DESC, vec_id) AS rn
      |    FROM m4) WHERE rn = 1),
      |s4 AS (SELECT * FROM s3 UNION ALL SELECT q_id, vec_id FROM p4),
      |m5 AS (
      |  SELECT c.q_id, c.vec_id, c.rel, MAX(cp.sim) AS ms
      |  FROM cand c
      |  JOIN cp ON cp.q_id = c.q_id AND cp.va = c.vec_id
      |  JOIN s4 ON s4.q_id = c.q_id AND s4.vec_id = cp.vb
      |  WHERE NOT EXISTS (SELECT 1 FROM s4 x
      |    WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
      |  GROUP BY c.q_id, c.vec_id, c.rel),
      |p5 AS (
      |  SELECT q_id, vec_id, rel, ms AS max_sim FROM (
      |    SELECT q_id, vec_id, rel, ms,
      |      row_number() OVER (PARTITION BY q_id
      |        ORDER BY 7 * rel - 3 * ms DESC, vec_id) AS rn
      |    FROM m5) WHERE rn = 1),
      |picks AS (
      |  SELECT q_id, 1 AS rank, vec_id, rel, max_sim FROM p1
      |  UNION ALL SELECT q_id, 2, vec_id, rel, max_sim FROM p2
      |  UNION ALL SELECT q_id, 3, vec_id, rel, max_sim FROM p3
      |  UNION ALL SELECT q_id, 4, vec_id, rel, max_sim FROM p4
      |  UNION ALL SELECT q_id, 5, vec_id, rel, max_sim FROM p5)
      |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id,
      |  CAST(rel AS BIGINT) AS rel_milli,
      |  CAST(max_sim AS BIGINT) AS max_sim_milli,
      |  CAST(7 * rel - 3 * max_sim AS BIGINT) AS mmr_score_x10
      |FROM picks ORDER BY q_id, rank""") { (s, d) =>
    val cv = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"),
        floor(col("v").cast(DoubleType) * 1000).cast(LongType).as("qc"))
    val qp = cv.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("i").as("qi"),
        col("qc").as("qqc"))
    val dots = cv.join(broadcast(qp),
        col("i") === col("qi") && col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("qc") * col("qqc")).as("rel"))
    val wq = Window.partitionBy(col("q_id"))
    // The 5-round greedy runs ROW-LOCALLY per probe via the
    // graft_mmr_picks expression over the collected candidate list +
    // its 20×20 pair-dot table — collapsing what a DataFrame loop
    // spelled as ~18 sequential AQE stages over panel×20 frames into
    // one 8-row map stage (measured 4.9 s → 0.7 s at sf0.1; identical
    // picks, replayed independently by R18OpsSpec). The candidate cut
    // and both aggregations before it keep full parallelism.
    val cand = dots.withColumn("rn",
        row_number().over(wq.orderBy(col("rel").desc, col("vec_id"))))
      .filter(col("rn") <= 20).select(col("q_id"), col("vec_id"), col("rel"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cc = cand.select(col("q_id"), col("vec_id"))
      .join(cv.select(col("vec_id").as("c_vec"), col("i"), col("qc")),
        col("c_vec") === col("vec_id"))
    val cp = cc.select(col("q_id"), col("vec_id").as("va"), col("i"),
        col("qc"))
      .join(cc.select(col("q_id").as("b_q"), col("vec_id").as("vb"),
          col("i").as("b_i"), col("qc").as("b_qc")),
        col("b_q") === col("q_id") && col("b_i") === col("i") &&
          col("vb") =!= col("va"))
      .groupBy(col("q_id"), col("va"), col("vb"))
      .agg(sum(col("qc") * col("b_qc")).as("sim"))
    val perQ = cand.groupBy(col("q_id"))
      .agg(collect_list(struct(col("vec_id"), col("rel"))).as("cands"))
    val simQ = cp.groupBy(col("q_id").as("s_q"))
      .agg(collect_list(struct(col("va"), col("vb"), col("sim")))
        .as("sims"))
    perQ.join(simQ, col("s_q") === col("q_id"))
      .select(col("q_id"),
        explode(graft.functions.VectorFunctions
          .mmrPicks(col("cands"), col("sims"))).as("p"))
      .select(col("q_id"), col("p.rank").as("rank"),
        col("p.v").as("vec_id"), col("p.rel").as("rel_milli"),
        col("p.max_sim").as("max_sim_milli"),
        (lit(7L) * col("p.rel") - lit(3L) * col("p.max_sim"))
          .as("mmr_score_x10"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ECE + Murphy Brier decomposition (r18) — the single-number
    * calibration verdicts over the graded `eval_calibration_bins`
    * construction (date-position pseudo-score vs order-status
    * outcome, ONE spelling): expected calibration error
    * ECE = Σ_b (n_b/N)·|p̄_b − ȳ_b| and the Brier decomposition
    * reliability − resolution + uncertainty, all computed over the
    * SAME floored bin means the bins key ships (stated convention:
    * the decomposition is of the binned forecaster). Exact integer
    * ppm/ppm² end to end — the squares ride DECIMAL(38)/HUGEINT.
    * One scan, one 10-bin agg, one fold. */
  val evalEceBrierDecomp: QDef = q(
    "eval_ece_brier_decomp",
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
      |  FROM orders CROSS JOIN b),
      |bins AS (
      |  SELECT least(p_ppm // 100000, 9) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS pbar,
      |    CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS ybar,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM((p_ppm - y * 1000000) * (p_ppm - y * 1000000))
      |      AS HUGEINT) AS sb
      |  FROM sc GROUP BY bin),
      |f AS (
      |  SELECT CAST(SUM(n) AS HUGEINT) AS nn, CAST(SUM(sy) AS HUGEINT) AS syy,
      |    CAST(SUM(n * abs(pbar - ybar)) AS HUGEINT) AS e,
      |    CAST(SUM(CAST(n AS HUGEINT) * (pbar - ybar) * (pbar - ybar))
      |      AS HUGEINT) AS rel,
      |    CAST(SUM(sb) AS HUGEINT) AS sbb
      |  FROM bins),
      |g AS (
      |  SELECT f.*, CAST(syy * 1000000 // nn AS HUGEINT) AS ybar_all FROM f)
      |SELECT CAST(nn AS BIGINT) AS n,
      |  CAST(e // nn AS BIGINT) AS ece_ppm,
      |  CAST(sbb // nn AS BIGINT) AS brier_ppm2,
      |  CAST(rel // nn AS BIGINT) AS reliability_ppm2,
      |  CAST((SELECT CAST(SUM(CAST(n AS HUGEINT)
      |      * (ybar - g.ybar_all) * (ybar - g.ybar_all)) AS HUGEINT)
      |    FROM bins) // nn AS BIGINT) AS resolution_ppm2,
      |  CAST(ybar_all * (1000000 - ybar_all) AS BIGINT) AS uncertainty_ppm2
      |FROM g""") { (s, d) =>
    val dec = DecimalType(38, 0)
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
    val bins = sc.groupBy(expr("least(p_ppm div 100000, 9)").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p_ppm")).as("sp"),
        sum(col("y")).as("sy"),
        sum(expr("(p_ppm - y * 1000000) * (p_ppm - y * 1000000)"))
          .cast(dec).as("sb"))
      .select(col("bin"), col("n"), col("sy"), col("sb"),
        expr("CAST(sp div n AS BIGINT)").as("pbar"),
        expr("CAST(sy * 1000000 div n AS BIGINT)").as("ybar"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val f = bins.agg(
      sum(col("n")).cast(dec).as("nn"), sum(col("sy")).cast(dec).as("syy"),
      sum(col("n") * abs(col("pbar") - col("ybar"))).cast(dec).as("e"),
      sum(col("n").cast(dec) * (col("pbar") - col("ybar"))
        * (col("pbar") - col("ybar"))).cast(dec).as("rel"),
      sum(col("sb")).cast(dec).as("sbb"))
      .select(col("nn"), col("syy"), col("e"), col("rel"), col("sbb"),
        expr("CAST(syy * 1000000 div nn AS DECIMAL(38,0))").as("ybar_all"))
    val res = bins.crossJoin(broadcast(f.select(col("ybar_all")
        .as("yb_all"))))
      .agg(sum(col("n").cast(dec) * (col("ybar") - col("yb_all"))
        * (col("ybar") - col("yb_all"))).cast(dec).as("resn"))
    f.crossJoin(broadcast(res))
      .select(expr("CAST(nn AS BIGINT)").as("n"),
        expr("CAST(e div nn AS BIGINT)").as("ece_ppm"),
        expr("CAST(sbb div nn AS BIGINT)").as("brier_ppm2"),
        expr("CAST(rel div nn AS BIGINT)").as("reliability_ppm2"),
        expr("CAST(resn div nn AS BIGINT)").as("resolution_ppm2"),
        expr("CAST(ybar_all * (1000000 - ybar_all) AS BIGINT)")
          .as("uncertainty_ppm2"))
  }

  /** Differential-privacy budget composition (r18) — the accounting
    * ladder's missing rung above k-anonymity/l-diversity/
    * t-closeness: each event type is an "analyst" issuing one
    * ε₀ = 0.1 query per active day, and the key grades basic
    * composition (k·ε₀ — linear, what a naive accountant charges)
    * against the advanced bound ε₀√(2k·ln(1/δ')) + k·ε₀(exp(ε₀)−1) at
    * δ' = 10⁻⁶ (Dwork–Rothblum–Vadhan) — THE table that says when
    * the√k accounting wins and a budget stretches to more queries.
    * k is an exact distinct-day count; both bounds are one identical
    * float tree on that integer, floored to micro. Day-sized aggs
    * only. */
  val privacyEpsilonComposition: QDef = q(
    "privacy_epsilon_composition",
    """WITH k AS (
      |  SELECT event_type,
      |    CAST(COUNT(DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
      |      AS DATE)) AS BIGINT) AS n_queries
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n_queries,
      |  CAST(n_queries * 100000 AS BIGINT) AS eps_basic_micro,
      |  CAST(floor((0.1 * sqrt(2.0 * n_queries * ln(1000000.0))
      |    + n_queries * 0.1 * (exp(0.1) - 1.0)) * 1000000) AS BIGINT)
      |    AS eps_advanced_micro,
      |  CAST(floor((0.1 * sqrt(2.0 * n_queries * ln(1000000.0))
      |    + n_queries * 0.1 * (exp(0.1) - 1.0)) * 1000000) AS BIGINT)
      |    < CAST(n_queries * 100000 AS BIGINT) AS advanced_wins
      |FROM k ORDER BY event_type""") { (s, d) =>
    val k = Tables.events(s, d)
      .select(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("day")).as("n_queries"))
    val adv = floor((lit(0.1) * sqrt(lit(2.0) * col("n_queries")
        * log(lit(1000000.0)))
      + col("n_queries") * lit(0.1) * (exp(lit(0.1)) - lit(1.0)))
      * 1000000).cast(LongType)
    k.select(col("event_type"), col("n_queries"),
        (col("n_queries") * 100000L).as("eps_basic_micro"),
        adv.as("eps_advanced_micro"),
        (adv < col("n_queries") * 100000L).as("advanced_wins"))
      .orderBy(col("event_type"))
  }

  /** Incremental edge-store maintenance (r18) — the daily-run
    * companion to `graph_edge_store_roundtrip` (which certifies the
    * store equals recomputation): the PRIOR half of orders
    * (md5-parity on o_orderkey, the house snapshot convention)
    * builds the stored edge table through the parquet sink; the
    * increment half's edges classify against the STORED side only
    * (anti-join = genuinely new partnerships, semi-join = already
    * known), and the merged store is pinned against a full rebuild
    * from ALL orders — the oracle states merged_minus_full as
    * literal 0, so the incremental-maintenance identity
    * stored ∪ increment ≡ rebuild is a hash-graded contract, not an
    * assumption. At 100 TB the daily cost follows the increment and
    * the store is read, never rebuilt; the rebuild leg here is the
    * eval tier that certifies the identity. */
  val graphEdgeStoreIncremental: QDef = q(
    "graph_edge_store_incremental",
    """WITH po AS (
      |  SELECT o_orderkey, o_custkey FROM orders
      |  WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) <= '7'),
      |io AS (
      |  SELECT o_orderkey, o_custkey FROM orders
      |  WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) > '7'),
      |ebp AS (
      |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      |  FROM po JOIN lineitem ON o_orderkey = l_orderkey),
      |ebi AS (
      |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      |  FROM io JOIN lineitem ON o_orderkey = l_orderkey),
      |ebf AS (
      |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |nw AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_new FROM ebi
      |  WHERE NOT EXISTS (SELECT 1 FROM ebp
      |    WHERE ebp.ck = ebi.ck AND ebp.sk = ebi.sk))
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ebp) AS n_stored,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ebi) AS n_increment,
      |  (SELECT n_new FROM nw) AS n_new,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ebi) - (SELECT n_new FROM nw)
      |    AS n_dup,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ebp) + (SELECT n_new FROM nw)
      |    AS n_merged,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ebf) AS n_full_rebuild,
      |  CAST(0 AS BIGINT) AS merged_minus_full""") { (s, d) =>
    val isPriorO =
      substring(md5(col("o_orderkey").cast(StringType)), 1, 1) <= "7"
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"))
    val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    // r19-opt (guide §1.2/§2.3): the r18 spelling ran the
    // orders⋈lineitem join + a DISTINCT agg THREE times (prior,
    // increment, full-rebuild legs — measured 2.7-3.3 s steady-state
    // at sf0.1). The md5-parity halves PARTITION orders, so ONE
    // tagged pass computes all three sets exactly: group the single
    // join by (ck, sk) with per-pair hasPrior/hasIncr flags —
    // ebp = σ(hasPrior), ebi = σ(hasIncr), and the full rebuild is
    // the whole pair table (distinct over a union of a partition =
    // the same set). The STORE semantics are unchanged: prior edges
    // still go THROUGH the parquet sink and the increment still
    // classifies by anti-join against the RE-READ stored side only.
    val g = orders
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"),
        when(isPriorO, 1L).otherwise(0L).as("p"))
      .groupBy(col("ck"), col("sk"))
      .agg(max(col("p")).as("has_p"), max(lit(1L) - col("p")).as("has_i"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the pair table BEFORE the coalesce(1) write: the
    // sink's single task would otherwise narrow-collapse the whole
    // join+agg lineage into itself and compute it single-threaded
    // (r19-opt — measured as the dominant term of this key)
    g.count()
    val out = graft.TempDirs.create("graft_edgestore_inc")
    // coalesce(1) + in-partition sort: identical single sorted file,
    // minus the global sort's range-sampling job + exchange (r18-opt,
    // the roundtrip twin's spelling).
    g.filter(col("has_p") === 1L).select(col("ck"), col("sk"))
      .coalesce(1).sortWithinPartitions(col("ck"), col("sk"))
      .write.mode("overwrite").parquet(out)
    val stored = s.read.parquet(out).persist(StorageLevel.MEMORY_AND_DISK)
    val ebi = g.filter(col("has_i") === 1L).select(col("ck"), col("sk"))
    val st = stored.select(col("ck").as("s_ck"), col("sk").as("s_sk"))
    val aNew = ebi.join(st,
        col("ck") === col("s_ck") && col("sk") === col("s_sk"), "left_anti")
      .agg(count(lit(1)).as("n_new"))
    val aStored = stored.agg(count(lit(1)).as("n_stored"))
    // increment and full-rebuild counts fold over the ONE pair table
    val aRest = g.agg(coalesce(sum(col("has_i")), lit(0L)).as("n_increment"),
      count(lit(1)).as("n_full_rebuild"))
    aStored.crossJoin(broadcast(aRest)).crossJoin(broadcast(aNew))
      .select(col("n_stored"), col("n_increment"), col("n_new"),
        (col("n_increment") - col("n_new")).as("n_dup"),
        (col("n_stored") + col("n_new")).as("n_merged"),
        col("n_full_rebuild"),
        (col("n_stored") + col("n_new") - col("n_full_rebuild"))
          .as("merged_minus_full"))
  }

  /** Population Stability Index (r18) — the tabular drift score risk
    * and ML-ops teams alarm on (the numeric complement to
    * `drift_unigram_jsd`'s text JSD): order revenue binned on FIXED
    * $50k-cents boundaries (scale-stable — quantile bins would move
    * with the data), prior vs increment md5-halves, PSI =
    * Σ_b (p_b − q_b)·ln(p_b/q_b) with add-one (Laplace) smoothing so
    * empty bins stay finite. Shares are exact add-one rationals;
    * each bin's term is ONE identical float tree on those integers
    * floored to micro, and the PSI fold is an exact BIGINT sum. One
    * scan, one 10-bin × 2-half agg; the industry read: PSI < 0.1
    * stable, > 0.25 alarm. */
  val dqPsiPriceDrift: QDef = q(
    "dq_psi_price_drift",
    """WITH sc AS (
      |  SELECT
      |    CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) <= '7'
      |      THEN 1 ELSE 0 END AS prior,
      |    LEAST(9, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |      // 5000000) AS bin
      |  FROM orders),
      |h AS (
      |  SELECT bin,
      |    CAST(SUM(prior) AS BIGINT) AS n_prior,
      |    CAST(SUM(1 - prior) AS BIGINT) AS n_incr
      |  FROM sc GROUP BY bin),
      |tot AS (
      |  SELECT CAST(SUM(n_prior) AS BIGINT) AS np,
      |    CAST(SUM(n_incr) AS BIGINT) AS ni,
      |    CAST(COUNT(*) AS BIGINT) AS nb
      |  FROM h),
      |t AS (
      |  SELECT h.bin, h.n_prior, h.n_incr,
      |    CAST((h.n_prior + 1) * 1000000 // (np + nb) AS BIGINT) AS p_ppm,
      |    CAST((h.n_incr + 1) * 1000000 // (ni + nb) AS BIGINT) AS q_ppm,
      |    CAST(floor(
      |      (CAST(h.n_prior + 1 AS DOUBLE) / (np + nb)
      |        - CAST(h.n_incr + 1 AS DOUBLE) / (ni + nb))
      |      * ln((CAST(h.n_prior + 1 AS DOUBLE) / (np + nb))
      |        / (CAST(h.n_incr + 1 AS DOUBLE) / (ni + nb)))
      |      * 1000000) AS BIGINT) AS term_micro
      |  FROM h, tot),
      |psi AS (SELECT CAST(SUM(term_micro) AS BIGINT) AS psi_micro FROM t)
      |SELECT t.bin, t.n_prior, t.n_incr, t.p_ppm, t.q_ppm, t.term_micro,
      |  psi.psi_micro
      |FROM t, psi ORDER BY t.bin""") { (s, d) =>
    val h = Tables.orders(s, d)
      .select(
        when(substring(md5(col("o_orderkey").cast(StringType)), 1, 1) <= "7",
          1L).otherwise(0L).as("prior"),
        least(lit(9L), expr(
          "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 5000000"))
          .as("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("prior")).as("n_prior"),
        sum(lit(1L) - col("prior")).as("n_incr"))
    val tot = h.agg(sum(col("n_prior")).as("np"), sum(col("n_incr")).as("ni"),
      count(lit(1)).as("nb"))
    val pD = (col("n_prior") + 1).cast(DoubleType) / (col("np") + col("nb"))
    val qD = (col("n_incr") + 1).cast(DoubleType) / (col("ni") + col("nb"))
    val t = h.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_prior"), col("n_incr"),
        expr("(n_prior + 1) * 1000000 div (np + nb)").as("p_ppm"),
        expr("(n_incr + 1) * 1000000 div (ni + nb)").as("q_ppm"),
        floor((pD - qD) * log(pD / qD) * 1000000).cast(LongType)
          .as("term_micro"))
    val psi = t.agg(sum(col("term_micro")).cast(LongType).as("psi_micro"))
    t.crossJoin(broadcast(psi))
      .select(col("bin"), col("n_prior"), col("n_incr"), col("p_ppm"),
        col("q_ppm"), col("term_micro"), col("psi_micro"))
      .orderBy(col("bin"))
  }

  /** Western Electric SPC rules (r18) — the classic
    * statistical-process-control alarm ladder over the daily revenue
    * series per event type (the ops complement to `anomaly_mad` /
    * `events_burst_detection`): z-scores against the type's own
    * mean/σ (ONE float tree on exact DECIMAL sums, z = (n·x − S)/
    * √(n·Sxx − S²), floored to milli), then the four rules as exact
    * integer window counts — R1 |z|>3σ, R2 two of three consecutive
    * beyond 2σ same side, R3 four of five beyond 1σ same side, R4
    * eight consecutive same side of center. All windows partitioned
    * by type over the day grid (day-sized frames); the rule flags
    * are comparisons on identical quantized integers, so
    * cross-engine agreement is exact. */
  val eventsSpcWesternElectric: QDef = q(
    "events_spc_western_electric",
    """WITH dtot AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY event_type, day),
      |st AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(cents AS DECIMAL(38,0))) AS sx,
      |    SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS sxx
      |  FROM dtot GROUP BY event_type),
      |z AS (
      |  SELECT d.event_type, d.day, d.cents,
      |    CAST(floor((d.n_x_s / sqrt(st.n * CAST(st.sxx AS DOUBLE)
      |      - CAST(st.sx AS DOUBLE) * CAST(st.sx AS DOUBLE))) * 1000)
      |      AS BIGINT) AS z_milli
      |  FROM (SELECT dt.event_type, dt.day, dt.cents,
      |      st2.n * CAST(dt.cents AS DOUBLE) - CAST(st2.sx AS DOUBLE)
      |        AS n_x_s
      |    FROM dtot dt JOIN st st2 ON st2.event_type = dt.event_type) d
      |  JOIN st ON st.event_type = d.event_type),
      |r AS (
      |  SELECT event_type, day, cents, z_milli,
      |    CASE WHEN abs(z_milli) > 3000 THEN true ELSE false END AS rule1,
      |    SUM(CASE WHEN z_milli > 2000 THEN 1 ELSE 0 END)
      |      OVER w3 >= 2 OR
      |    SUM(CASE WHEN z_milli < -2000 THEN 1 ELSE 0 END)
      |      OVER w3 >= 2 AS rule2,
      |    SUM(CASE WHEN z_milli > 1000 THEN 1 ELSE 0 END)
      |      OVER w5 >= 4 OR
      |    SUM(CASE WHEN z_milli < -1000 THEN 1 ELSE 0 END)
      |      OVER w5 >= 4 AS rule3,
      |    SUM(CASE WHEN z_milli > 0 THEN 1 ELSE 0 END)
      |      OVER w8 = 8 OR
      |    SUM(CASE WHEN z_milli < 0 THEN 1 ELSE 0 END)
      |      OVER w8 = 8 AS rule4,
      |    COUNT(*) OVER w8 AS n_in_w8
      |  FROM z
      |  WINDOW
      |    w3 AS (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      |    w5 AS (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      |    w8 AS (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
      |SELECT event_type, day, cents, z_milli, rule1, rule2, rule3,
      |  CASE WHEN n_in_w8 = 8 THEN rule4 ELSE false END AS rule4
      |FROM r ORDER BY event_type, day""") { (s, d) =>
    val dec = DecimalType(38, 0)
    val dtot = Tables.events(s, d)
      .select(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).cast(LongType).as("cents"))
    val st = dtot.groupBy(col("event_type").as("s_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents").cast(dec)).as("sx"),
        sum(col("cents").cast(dec) * col("cents")).as("sxx"))
    val z = dtot.join(broadcast(st), col("s_type") === col("event_type"))
      .select(col("event_type"), col("day"), col("cents"),
        floor(((col("n") * col("cents").cast(DoubleType)
            - col("sx").cast(DoubleType))
          / sqrt(col("n") * col("sxx").cast(DoubleType)
            - col("sx").cast(DoubleType) * col("sx").cast(DoubleType)))
          * 1000).cast(LongType).as("z_milli"))
    val w3 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-2, 0)
    val w5 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-4, 0)
    val w8 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, 0)
    def cnt(c: Column, w: org.apache.spark.sql.expressions.WindowSpec) =
      sum(when(c, 1L).otherwise(0L)).over(w)
    z.select(col("event_type"), col("day"), col("cents"), col("z_milli"),
        (abs(col("z_milli")) > 3000L).as("rule1"),
        (cnt(col("z_milli") > 2000L, w3) >= 2L ||
          cnt(col("z_milli") < -2000L, w3) >= 2L).as("rule2"),
        (cnt(col("z_milli") > 1000L, w5) >= 4L ||
          cnt(col("z_milli") < -1000L, w5) >= 4L).as("rule3"),
        when(count(lit(1)).over(w8) === 8L,
          cnt(col("z_milli") > 0L, w8) === 8L ||
            cnt(col("z_milli") < 0L, w8) === 8L)
          .otherwise(lit(false)).as("rule4"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Atkinson inequality index at ε = 1 (r18) — the
    * welfare-grounded companion to `agg_theil_index` over the SAME
    * per-nation customer-revenue base (`custRevCtes`, one spelling):
    * A₁ = 1 − geomean(x)/μ. The geometric mean rides the house
    * quantize-then-fold discipline: per-customer floor(ln x·10⁶) —
    * one float op on an exact integer — then an exact BIGINT mean,
    * and A₁ = 1 − exp(mean)·n/S is one final float tree on three
    * exact integers, floored to ppm (stated convention: the geomean
    * of the micro-floored logs; the quantization error is bounded by
    * e^(1e-6)). Two keyed aggs + a broadcast dim join, same plan
    * family as the Theil twin. */
  val aggAtkinsonIndex: QDef = q(
    "agg_atkinson_index",
    s"""WITH $custRevCtes,
      |f AS (
      |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000) AS BIGINT))
      |      AS BIGINT) AS sl
      |  FROM cn GROUP BY n_name)
      |SELECT n_name, n AS n_customers,
      |  CAST(sx // n AS BIGINT) AS mean_cents,
      |  CAST(1000000 - CAST(floor(
      |    exp(CAST(sl // n AS DOUBLE) / 1000000.0) * n
      |      / sx * 1000000) AS BIGINT) AS BIGINT) AS atkinson_ppm
      |FROM f ORDER BY n_name""") { (s, d) =>
    val f = custRevByNation(s, d)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).cast(LongType).as("sx"),
        sum(floor(log(col("x").cast(DoubleType)) * 1000000).cast(LongType))
          .cast(LongType).as("sl"))
    f.select(col("n_name"), col("n").as("n_customers"),
        expr("sx div n").as("mean_cents"),
        (lit(1000000L) - floor(
          exp(expr("CAST(sl div n AS DOUBLE)") / 1000000.0) * col("n")
            / col("sx") * 1000000).cast(LongType)).as("atkinson_ppm"))
      .orderBy(col("n_name"))
  }

  /** Hoover (Robin Hood) index (r18) — the third member of the
    * inequality trio on the SAME per-nation revenue base as Theil and
    * Atkinson (`custRevCtes`, one spelling): H = ½ Σ|xᵢ/S − 1/n| =
    * Σ|xᵢ·n − S| / (2·n·S) — the share of total revenue that would
    * have to move to equalize. Unlike its two siblings this one
    * needs NO transcendental at all: the whole index is ONE exact
    * rational through DECIMAL(38)/HUGEINT in ppm. Same two-agg +
    * broadcast-dim plan family. */
  val aggHooverIndex: QDef = q(
    "agg_hoover_index",
    s"""WITH $custRevCtes,
      |f AS (
      |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx
      |  FROM cn GROUP BY n_name),
      |t AS (
      |  SELECT cn.n_name,
      |    CAST(SUM(abs(CAST(cn.x AS HUGEINT) * f.n - f.sx)) AS HUGEINT)
      |      AS sd
      |  FROM cn JOIN f ON f.n_name = cn.n_name
      |  GROUP BY cn.n_name)
      |SELECT f.n_name, f.n AS n_customers,
      |  CAST(f.sx // f.n AS BIGINT) AS mean_cents,
      |  CAST(t.sd * 1000000 // (2 * CAST(f.n AS HUGEINT) * f.sx)
      |    AS BIGINT) AS hoover_ppm
      |FROM f JOIN t ON t.n_name = f.n_name
      |ORDER BY f.n_name""") { (s, d) =>
    val dec = DecimalType(38, 0)
    val cn = custRevByNation(s, d)
    val f = cn.groupBy(col("n_name").as("f_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).cast(LongType).as("sx"))
    cn.join(broadcast(f), col("f_name") === col("n_name"))
      .groupBy(col("n_name"), col("n"), col("sx"))
      .agg(sum(abs(col("x").cast(dec) * col("n") - col("sx"))).cast(dec)
        .as("sd"))
      .select(col("n_name"), col("n").as("n_customers"),
        expr("sx div n").as("mean_cents"),
        expr("CAST(sd * 1000000 div (2 * CAST(n AS DECIMAL(38,0)) * sx)"
          + " AS BIGINT)").as("hoover_ppm"))
      .orderBy(col("n_name"))
  }

  /** k-ary randomized response (r18) — local differential privacy's
    * workhorse mechanism, graded deterministically: each document
    * reports its true lang with probability 3/4 (md5 first hex char
    * < 'c') and otherwise a deterministic md5-drawn replacement from
    * the 5-lang codebook, and the analyst's unbiased estimator
    * n̂ⱼ = (20·noisyⱼ − N)/15 (the k = 5, p = 3/4 debias) is graded
    * in exact milli next to the true counts — the end-to-end check
    * that the mechanism's utility math survives a distributed
    * implementation. The codebook index is a histogram-cumulative
    * rank (broadcast 5×5 self-join — no window, same trick as
    * `mix_curriculum_schedule`); everything else is lang-sized aggs.
    * The replacement draw md5('rr:'||doc_id) is independent of the
    * keep draw md5(doc_id||':rr') by construction. */
  val privacyRandomizedResponse: QDef = q(
    "privacy_randomized_response",
    """WITH langs AS (
      |  SELECT a.lang, CAST(COUNT(b.lang) AS BIGINT) AS idx
      |  FROM (SELECT DISTINCT lang FROM documents) a
      |  LEFT JOIN (SELECT DISTINCT lang FROM documents) b
      |    ON b.lang < a.lang
      |  GROUP BY a.lang),
      |k AS (SELECT CAST(COUNT(*) AS BIGINT) AS nl FROM langs),
      |rep AS (
      |  SELECT d.doc_id, d.lang AS true_lang,
      |    CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':rr'), 1, 1)
      |        < 'c' THEN d.lang
      |      ELSE (SELECT l2.lang FROM langs l2, k
      |        WHERE l2.idx = ('0x' ||
      |          substr(md5('rr:' || CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
      |          % k.nl)
      |    END AS report_lang
      |  FROM documents d),
      |tc AS (SELECT true_lang AS lang, CAST(COUNT(*) AS BIGINT) AS true_n
      |  FROM rep GROUP BY true_lang),
      |nc AS (SELECT report_lang AS lang, CAST(COUNT(*) AS BIGINT) AS noisy_n
      |  FROM rep GROUP BY report_lang),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM rep)
      |SELECT tc.lang, tc.true_n,
      |  CAST(COALESCE(nc.noisy_n, 0) AS BIGINT) AS noisy_n,
      |  CAST((20 * COALESCE(nc.noisy_n, 0) - nd) * 1000 // 15 AS BIGINT)
      |    AS est_milli,
      |  CAST(abs((20 * COALESCE(nc.noisy_n, 0) - nd) * 1000 // 15
      |    - tc.true_n * 1000) AS BIGINT) AS abs_err_milli
      |FROM tc LEFT JOIN nc ON nc.lang = tc.lang CROSS JOIN tot
      |ORDER BY tc.lang""") { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val distinctLangs = docs.select(col("lang")).distinct()
    val langs = distinctLangs.as("a")
      .join(broadcast(distinctLangs.select(col("lang").as("b_lang"))),
        col("b_lang") < col("a.lang"), "left")
      .groupBy(col("a.lang").as("l_lang"))
      .agg(count(col("b_lang")).as("idx"))
    val k = langs.agg(count(lit(1)).as("nl"))
    val drawn = docs.crossJoin(broadcast(k))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(concat(lit("rr:"),
            col("doc_id").cast(StringType))), 1, 4), 16, 10)
          .cast(LongType) % col("nl")).as("draw_idx"),
        (substring(md5(concat(col("doc_id").cast(StringType), lit(":rr"))),
          1, 1) < "c").as("keep"))
    val rep = drawn
      .join(broadcast(langs), col("draw_idx") === col("idx"))
      .select(col("doc_id"), col("lang").as("true_lang"),
        when(col("keep"), col("lang")).otherwise(col("l_lang"))
          .as("report_lang"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tc = rep.groupBy(col("true_lang").as("lang"))
      .agg(count(lit(1)).as("true_n"))
    val nc = rep.groupBy(col("report_lang").as("n_lang"))
      .agg(count(lit(1)).as("noisy_n"))
    val tot = rep.agg(count(lit(1)).as("nd"))
    tc.join(nc, col("n_lang") === col("lang"), "left")
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("true_n"),
        coalesce(col("noisy_n"), lit(0L)).as("noisy_n"),
        expr("(20 * coalesce(noisy_n, 0L) - nd) * 1000 div 15")
          .as("est_milli"),
        abs(expr("(20 * coalesce(noisy_n, 0L) - nd) * 1000 div 15")
          - col("true_n") * 1000L).as("abs_err_milli"))
      .orderBy(col("lang"))
  }

  /** Ljung–Box portmanteau test (r18) — "is there ANY autocorrelation
    * left?", the whiteness check run after a model fit and the
    * summary statistic over the `ts_acf_lags` family: Q = n(n+2)
    * Σ_{k≤3} ρ̂ₖ²/(n−k) over the per-type daily cents series, with
    * ρ̂ₖ the lag-k Pearson (the acf-lags spelling verbatim — exact
    * DECIMAL(38) sums into one identical float tree), Q floored to
    * micro and tested at the χ²₃ 95% bound 7.814728. Day-sized
    * frames only. */
  val tsLjungBox: QDef = q(
    "ts_ljung_box",
    """WITH dtot AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY event_type, day),
      |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM dtot
      |  GROUP BY event_type),
      |lg AS (SELECT * FROM (VALUES (1), (2), (3)) t(lag)),
      |p AS (
      |  SELECT a.event_type, lg.lag, a.cents AS x, b.cents AS y
      |  FROM dtot a CROSS JOIN lg
      |  JOIN dtot b ON b.event_type = a.event_type
      |    AND b.day = a.day + CAST(lg.lag AS INTEGER)),
      |s AS (
      |  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS np,
      |    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
      |    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
      |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |    SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
      |    SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      |  FROM p GROUP BY event_type, lag),
      |r AS (
      |  SELECT event_type, lag,
      |    (np * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (sqrt(np * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * sqrt(np * CAST(syy AS DOUBLE)
      |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf
      |  FROM s),
      |w AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN lag = 1 THEN acf END) AS a1,
      |    MAX(CASE WHEN lag = 2 THEN acf END) AS a2,
      |    MAX(CASE WHEN lag = 3 THEN acf END) AS a3
      |  FROM r GROUP BY event_type),
      |qf AS (
      |  SELECT w.event_type, nd.n,
      |    CAST(floor(nd.n * (nd.n + 2)
      |      * (a1 * a1 / (nd.n - 1) + a2 * a2 / (nd.n - 2)
      |        + a3 * a3 / (nd.n - 3)) * 1000000) AS BIGINT) AS q_micro
      |  FROM w JOIN nd ON nd.event_type = w.event_type)
      |SELECT event_type, n AS n_days, q_micro,
      |  q_micro > 7814728 AS significant
      |FROM qf ORDER BY event_type""") { (s, d) =>
    import s.implicits._
    val dec = DecimalType(38, 0)
    val dtot = Tables.events(s, d)
      .select(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).cast(LongType).as("cents"))
    val nd = dtot.groupBy(col("event_type").as("n_type"))
      .agg(count(lit(1)).as("n"))
    val lg = Seq(1, 2, 3).toDF("lag")
    val p = dtot.as("a").crossJoin(broadcast(lg))
      .join(dtot.select(col("event_type").as("bt"), col("day").as("bd"),
          col("cents").as("y")),
        col("bt") === col("a.event_type") &&
          col("bd") === date_add(col("a.day"), col("lag")))
      .select(col("a.event_type").as("event_type"), col("lag"),
        col("a.cents").as("x"), col("y"))
    val st = p.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("np"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"))
    val r = st.select(col("event_type"), col("lag"),
      ((col("np") * col("sxy").cast(DoubleType)
        - col("sx").cast(DoubleType) * col("sy").cast(DoubleType))
        / (sqrt(col("np") * col("sxx").cast(DoubleType)
            - col("sx").cast(DoubleType) * col("sx").cast(DoubleType))
          * sqrt(col("np") * col("syy").cast(DoubleType)
            - col("sy").cast(DoubleType) * col("sy").cast(DoubleType))))
        .as("acf"))
    // the three lag terms fold in a FIXED order (a SUM over the 3
    // doubles would be summation-order-dependent across engines)
    val w = r.groupBy(col("event_type"))
      .agg(max(when(col("lag") === 1, col("acf"))).as("a1"),
        max(when(col("lag") === 2, col("acf"))).as("a2"),
        max(when(col("lag") === 3, col("acf"))).as("a3"))
    w.join(broadcast(nd), col("n_type") === col("event_type"))
      .select(col("event_type"), col("n").as("n_days"),
        floor(col("n") * (col("n") + 2)
          * (col("a1") * col("a1") / (col("n") - 1)
            + col("a2") * col("a2") / (col("n") - 2)
            + col("a3") * col("a3") / (col("n") - 3))
          * 1000000).cast(LongType).as("q_micro"))
      .select(col("event_type"), col("n_days"), col("q_micro"),
        (col("q_micro") > 7814728L).as("significant"))
      .orderBy(col("event_type"))
  }

  val all: Seq[QDef] = Seq(
    dedupSemanticPrune, annIvfProbeSweep, annHnswGreedyRoute,
    simRerankTwoStage, graphEdgeStoreRoundtrip, graphAdamicAdar,
    dqSchemaDrift, curationCascadeCost, statsMcnemarPaired,
    statsFleissKappa, mixCurriculumSchedule, sampleEssImportance,
    tsPacfLag2, aggTheilIndex, simMmrDiversify, evalEceBrierDecomp,
    privacyEpsilonComposition, graphEdgeStoreIncremental,
    dqPsiPriceDrift, eventsSpcWesternElectric, aggAtkinsonIndex,
    aggHooverIndex, privacyRandomizedResponse, tsLjungBox)
}
