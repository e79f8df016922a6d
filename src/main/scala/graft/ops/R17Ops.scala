package graft.ops

import graft.{PartitionPolicy, QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Round-17 additions. Headline pair (VERDICT r16 items 3 + 4): the
  * stored-signature contract under incremental dedup — a signature
  * table written at time T and re-read equals recomputation from
  * prior text, with the increment classification running off the
  * STORED table only — and reciprocal-rank fusion, the hybrid
  * lexical+dense retrieval leg the similarity family lacked. Plus
  * retrieval-eval completion (exact rank-based AUC, MAP@10/P@10/R@10)
  * and further stats/ts/graph operators, all under the house
  * determinism protocol (exact integers end to end, floor-micro/ppm
  * ratios spelled identically in both engines, every divide guarded
  * where a denominator can be zero). */
object R17Ops {

  /** md5-parity prior-snapshot membership — the shared
    * `dedup_incremental_snapshot` / `dedup_cluster_incremental`
    * convention: ~half the corpus is the "already ingested" prior. */
  private def isPrior(id: Column): Column =
    substring(md5(id.cast(StringType)), 1, 1) <= "7"

  /** Deterministic geometric HNSW layer of vec_id (md5 leading-zero
    * hex chars, capped at 4) — ONE rendering shared by
    * `ann_hnsw_layer_assign` and r18's `ann_hnsw_greedy_route`. */
  private[ops] val hnswLayerSqlExpr: String =
    """CASE WHEN 32 - length(trim(LEADING '0' FROM
      |        md5(CAST(vec_id AS VARCHAR)))) > 4 THEN 4
      |      ELSE 32 - length(trim(LEADING '0' FROM
      |        md5(CAST(vec_id AS VARCHAR)))) END""".stripMargin

  /** Spark twin of `hnswLayerSqlExpr` (column name `vec_id` fixed). */
  private[ops] def hnswLayerCol: Column = {
    val lz = lit(32) - length(expr(
      "trim(LEADING '0' FROM md5(CAST(vec_id AS STRING)))"))
    when(lz > 4, 4).otherwise(lz)
  }

  /** 4-band LSH view of a (doc_id, h0..h7) signature table — the
    * `LlmExtras.bandCandidates` banding, exposed over an arbitrary
    * signature source so it can run over the STORED table. */
  private def sigBands(t: DataFrame): DataFrame =
    t.select(col("doc_id"),
      posexplode(array(
        concat_ws("|", col("h0"), col("h1")),
        concat_ws("|", col("h2"), col("h3")),
        concat_ws("|", col("h4"), col("h5")),
        concat_ws("|", col("h6"), col("h7"))))
        .as(Seq("band", "sig")))

  /** Stored-signature contract audit (r17, VERDICT r16 item 3) — the
    * remaining assumption under incremental dedup, now graded:
    * `dedup_incremental_snapshot` and `dedup_cluster_incremental`
    * both argue "at 100 TB the prior side is the STORED
    * digest+signature table", but nothing graded that a signature
    * table written at time T and re-read equals recomputation from
    * prior text — the contract that lets the daily run skip prior
    * text entirely. This key:
    *
    *   1. builds the md5-parity prior docs' minhash signatures from
    *      text (the shared `shingleBase` pass — one spelling with
    *      every other minhash consumer), WRITES them through the
    *      parquet sink, and re-reads;
    *   2. pins the roundtrip signature-for-signature: the full outer
    *      join of stored vs recomputed counts presence AND value
    *      mismatches (`n_roundtrip_mismatch` — the oracle states the
    *      contract as literal 0, so ANY parquet-boundary perturbation
    *      is a loud hash failure);
    *   3. runs the increment classification off the STORED table
    *      ONLY: increment docs' band signatures (from today's text)
    *      equality-join the stored side's bands — the signature-only
    *      match a stored table supports (exact-Jaccard verify needs
    *      shingle sets, which a production store doesn't keep).
    *
    * The oracle recomputes everything from text (both "stored" and
    * increment sides), so the grade certifies stored == recomputed
    * end to end. Scale: the stored side is read, never rebuilt; the
    * band join shuffles signature-sized rows; every count is a 1-row
    * broadcast fold. Signatures are hex STRINGS (8 chars) — parquet
    * roundtrips them losslessly by construction, which is exactly
    * what the grade certifies. */
  val dedupSignatureStoreRoundtrip: QDef = q(
    "dedup_signature_store_roundtrip",
    s"""WITH ${LlmExtras.mhCtes},
      |sigp AS (SELECT doc_id, h0, h1, h2, h3, h4, h5, h6, h7 FROM mh
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'),
      |sigi AS (SELECT doc_id, h0, h1, h2, h3, h4, h5, h6, h7 FROM mh
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) > '7'),
      |bp AS (
      |  SELECT doc_id, unnest(range(0, 4)) AS band,
      |    unnest([h0 || '|' || h1, h2 || '|' || h3,
      |            h4 || '|' || h5, h6 || '|' || h7]) AS sig
      |  FROM sigp),
      |bi AS (
      |  SELECT doc_id, unnest(range(0, 4)) AS band,
      |    unnest([h0 || '|' || h1, h2 || '|' || h3,
      |            h4 || '|' || h5, h6 || '|' || h7]) AS sig
      |  FROM sigi),
      |dup AS (SELECT DISTINCT bi.doc_id FROM bi JOIN bp
      |  ON bi.band = bp.band AND bi.sig = bp.sig)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sigp) AS n_prior,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sigp) AS n_stored,
      |  CAST(0 AS BIGINT) AS n_roundtrip_mismatch,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sigi) AS n_increment,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM dup) AS n_inc_band_dup,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sigi)
      |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM dup) AS n_inc_new""") { (s, d) =>
    val base = LlmExtras.shingleBase(s, d)
    val sigCols = Seq(col("doc_id")) ++ (0 until 8).map(i => col(s"h$i"))
    val prior = base.filter(isPrior(col("doc_id"))).select(sigCols: _*)
    val inc = base.filter(!isPrior(col("doc_id"))).select(sigCols: _*)
    // The parquet sink + re-read IS the operator under test. The
    // write is the query's first action, so it also materializes the
    // shared shingleBase cache before any branch forks it.
    val out = graft.TempDirs.create("graft_sigstore")
    prior.sort(col("doc_id")).coalesce(1)
      .write.mode("overwrite").parquet(out)
    val stored = s.read.parquet(out)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // roundtrip audit: presence or value drift on ANY of the 8 slots
    val st = stored.select(Seq(col("doc_id").as("s_id")) ++
      (0 until 8).map(i => col(s"h$i").as(s"s_h$i")): _*)
    val anyDrift = col("doc_id").isNull || col("s_id").isNull ||
      (0 until 8).map(i => col(s"h$i") =!= col(s"s_h$i"))
        .reduce(_ || _)
    // coalesce: SUM over zero rows is NULL, but the oracle states the
    // contract as literal 0 — an empty prior partition must still
    // match (ADVICE r17).
    val aMis = prior.join(st, col("doc_id") === col("s_id"), "full")
      .agg(coalesce(sum(when(anyDrift, 1L).otherwise(0L)), lit(0L))
        .as("n_roundtrip_mismatch"))
    val aPrior = prior.agg(count(lit(1)).as("n_prior"))
    val aStored = stored.agg(count(lit(1)).as("n_stored"))
    val aInc = inc.agg(count(lit(1)).as("n_increment"))
    // classification leg: increment text vs STORED signatures only
    val dup = sigBands(inc.select(sigCols: _*))
      .join(sigBands(stored)
          .select(col("band").as("p_band"), col("sig").as("p_sig")),
        col("band") === col("p_band") && col("sig") === col("p_sig"))
      .select(col("doc_id")).distinct()
    val aDup = dup.agg(count(lit(1)).as("n_inc_band_dup"))
    aPrior.crossJoin(broadcast(aStored)).crossJoin(broadcast(aMis))
      .crossJoin(broadcast(aInc)).crossJoin(broadcast(aDup))
      .select(col("n_prior"), col("n_stored"), col("n_roundtrip_mismatch"),
        col("n_increment"), col("n_inc_band_dup"),
        (col("n_increment") - col("n_inc_band_dup")).as("n_inc_new"))
  }

  /** Reciprocal-rank fusion (r17, VERDICT r16 item 4) — the hybrid
    * lexical+dense retrieval leg production RAG runs and the
    * similarity family graded only separately: the 3-term BM25
    * ranking (`CorpusOps.bm25Scores` — ONE spelling with
    * `bm25_topdocs`) fused with the cosine ranking against the
    * vec_id-0 probe (the `sim_mips_topk` probe convention, house
    * quantized cosine). Each leg's top-50 is ranked by a broadcast
    * rank self-join (the `sketch_heavy_hitters_merge` pattern — NO
    * unpartitioned window), fused as RRF score = Σ 1e6 div (60+rank)
    * in exact integers via a union + group (no full-outer join —
    * same rows, broadcastable shape), top-20 under (rrf DESC,
    * doc_id). Docs in one list only keep a NULL rank on the missing
    * leg and contribute one term. Scale: each leg's candidate scan is
    * the leg's own graded posture (BM25 = matching docs only; dense =
    * brute-force eval tier, IVF at scale); everything after the two
    * TakeOrdered(50)s is constant-size. */
  val evalRrfFusion: QDef = q(
    "eval_rrf_fusion",
    s"""WITH ${CorpusOps.bm25Ctes},
      |lex50 AS (
      |  SELECT doc_id, score_micro FROM bm25
      |  ORDER BY score_micro DESC, doc_id LIMIT 50),
      |lexr AS (
      |  SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS r
      |  FROM lex50 a JOIN lex50 b
      |    ON b.score_micro > a.score_micro
      |    OR (b.score_micro = a.score_micro AND b.doc_id <= a.doc_id)
      |  GROUP BY a.doc_id),
      |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
      |den AS (
      |  SELECT e.vec_id AS doc_id,
      |    ${VecMath.sqlCosine("e.embedding", "q_emb")} AS sim
      |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
      |den50 AS (
      |  SELECT doc_id, sim FROM den ORDER BY sim DESC, doc_id LIMIT 50),
      |denr AS (
      |  SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS r
      |  FROM den50 a JOIN den50 b
      |    ON b.sim > a.sim OR (b.sim = a.sim AND b.doc_id <= a.doc_id)
      |  GROUP BY a.doc_id),
      |contrib AS (
      |  SELECT doc_id, 'lex' AS leg, r FROM lexr
      |  UNION ALL
      |  SELECT doc_id, 'dense' AS leg, r FROM denr),
      |fused AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN leg = 'lex' THEN r END) AS rank_lex,
      |    MAX(CASE WHEN leg = 'dense' THEN r END) AS rank_dense,
      |    CAST(SUM(1000000 // (60 + r)) AS BIGINT) AS rrf_micro
      |  FROM contrib GROUP BY doc_id)
      |SELECT doc_id, rank_lex, rank_dense, rrf_micro
      |FROM fused
      |ORDER BY rrf_micro DESC, doc_id
      |LIMIT 20""") { (s, d) =>
    // top-50 + broadcast rank self-join, once per leg (ties broken by
    // doc_id; inclusive <= makes the count the 1-based rank itself)
    def rank50(top: DataFrame, score: String): DataFrame =
      top.as("a")
        .join(broadcast(top.select(col("doc_id").as("bd"),
            col(score).as("bs"))),
          col("bs") > col(s"a.$score") ||
            (col("bs") === col(s"a.$score") && col("bd") <= col("a.doc_id")))
        .groupBy(col("a.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("r"))
    // r19 batch 3 (guide §5 persist-when-reused): rank50 references
    // its input on BOTH join sides, so each unpersisted 50-row leg
    // re-ran its whole upstream pipeline twice — the full BM25 score
    // pass and the full cosine scan were each paid double.
    val lex50 = CorpusOps.bm25Scores(s, d)
      .select(col("doc_id"), col("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id")).limit(50)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lexr = rank50(lex50, "score_micro")
    val q0 = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val den50 = Tables.embeddings(s, d).crossJoin(broadcast(q0))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("doc_id"),
        VecMath.fcosine(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("doc_id")).limit(50)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val denr = rank50(den50, "sim")
    lexr.select(col("doc_id"), lit("lex").as("leg"), col("r"))
      .union(denr.select(col("doc_id"), lit("dense").as("leg"), col("r")))
      .groupBy(col("doc_id"))
      .agg(max(when(col("leg") === "lex", col("r"))).as("rank_lex"),
        max(when(col("leg") === "dense", col("r"))).as("rank_dense"),
        sum(expr("1000000 div (60 + r)")).cast(LongType).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(20)
  }

  /** Exact rank-based ROC AUC (r17) — the threshold-free twin of
    * `eval_calibration_bins`/`eval_ndcg_at10` for the retrieval-eval
    * family: per md5-sampled query (the `eval_retrieval_mrr` query
    * set), AUC of the cosine score as a same-label classifier, via
    * the Mann–Whitney identity AUC = (ΣR₊ − n₊(n₊+1)/2)/(n₊n₋) with
    * tied scores at their MID-rank. Everything is exact integers:
    * scores collapse to (q_id, sim) groups first (sims are the house
    * round-6 quantized cosine — bit-identical across engines, and
    * DISTINCT within a query after the group), min-rank = 1 +
    * running count of strictly-smaller groups (a q_id-partitioned
    * prefix window — never unpartitioned), and 2·midrank = 2·min_rank
    * + tie_count − 1 stays integral. Per-query AUC in floor-ppm with
    * the n₊=0/n₋=0 degenerate guarded NULL in both engines; the ppm
    * product rides DECIMAL(38)/HUGEINT. Label-level floor mean over
    * the non-degenerate queries (count guarded), plus min/max.
    * Eval-tier brute force by design — the production path routes
    * candidates through `ann_ivf_label`. */
  val evalAucRoc: QDef = q(
    "eval_auc_roc",
    s"""WITH qs AS (
      |  SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
      |  FROM embeddings
      |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'),
      |cand AS (
      |  SELECT qs.q_id, qs.q_label,
      |    ${VecMath.sqlCosine("e.embedding", "qs.q_emb")} AS sim,
      |    CASE WHEN e.label = qs.q_label THEN 1 ELSE 0 END AS rel
      |  FROM embeddings e JOIN qs ON e.vec_id <> qs.q_id),
      |g AS (
      |  SELECT q_id, q_label, sim, CAST(COUNT(*) AS BIGINT) AS cnt,
      |    CAST(SUM(rel) AS BIGINT) AS pos_cnt
      |  FROM cand GROUP BY q_id, q_label, sim),
      |r AS (
      |  SELECT q_id, q_label, cnt, pos_cnt,
      |    1 + COALESCE(SUM(cnt) OVER (PARTITION BY q_id ORDER BY sim
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS min_rank
      |  FROM g),
      |pq AS (
      |  SELECT q_id, q_label,
      |    CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(SUM(pos_cnt) AS BIGINT) AS n_pos,
      |    CAST(SUM(pos_cnt * (2 * min_rank + cnt - 1)) AS BIGINT) AS s2
      |  FROM r GROUP BY q_id, q_label),
      |a AS (
      |  SELECT q_id, q_label,
      |    CASE WHEN n_pos = 0 OR n - n_pos = 0 THEN NULL
      |      ELSE CAST(CAST(s2 - n_pos * (n_pos + 1) AS HUGEINT) * 1000000
      |        // (2 * n_pos * (n - n_pos)) AS BIGINT) END AS auc_ppm
      |  FROM pq)
      |SELECT q_label AS label,
      |  CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CASE WHEN COUNT(auc_ppm) = 0 THEN NULL
      |    ELSE CAST(SUM(auc_ppm) AS BIGINT) // COUNT(auc_ppm) END
      |    AS mean_auc_ppm,
      |  MIN(auc_ppm) AS min_auc_ppm, MAX(auc_ppm) AS max_auc_ppm
      |FROM a GROUP BY q_label ORDER BY label""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
    val qs = e.filter(
        substring(md5(col("vec_id").cast(StringType)), 1, 1) === "0")
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val cand = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"),
        VecMath.fcosine(col("embedding"), col("q_emb")).as("sim"),
        when(col("label") === col("q_label"), 1L).otherwise(0L).as("rel"))
    val g = cand.groupBy(col("q_id"), col("q_label"), col("sim"))
      .agg(count(lit(1)).as("cnt"), sum(col("rel")).as("pos_cnt"))
    val wPre = Window.partitionBy(col("q_id")).orderBy(col("sim"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.select(col("q_id"), col("q_label"), col("cnt"), col("pos_cnt"),
      (lit(1L) + coalesce(sum(col("cnt")).over(wPre), lit(0L)))
        .as("min_rank"))
    val pq = r.groupBy(col("q_id"), col("q_label"))
      .agg(sum(col("cnt")).as("n"), sum(col("pos_cnt")).as("n_pos"),
        sum(col("pos_cnt") * (lit(2L) * col("min_rank") + col("cnt") - 1))
          .as("s2"))
    val a = pq.select(col("q_id"), col("q_label"),
      expr("CASE WHEN n_pos = 0 OR n - n_pos = 0 THEN NULL"
        + " ELSE CAST(CAST(s2 - n_pos * (n_pos + 1) AS DECIMAL(38,0))"
        + " * 1000000 div (2 * n_pos * (n - n_pos)) AS BIGINT) END")
        .as("auc_ppm"))
    a.groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        expr("CASE WHEN COUNT(auc_ppm) = 0 THEN NULL"
          + " ELSE CAST(SUM(auc_ppm) AS BIGINT) div COUNT(auc_ppm) END")
          .as("mean_auc_ppm"),
        min(col("auc_ppm")).as("min_auc_ppm"),
        max(col("auc_ppm")).as("max_auc_ppm"))
      .orderBy(col("label"))
  }

  /** MAP@10 + P@10 + R@10 (r17) — the set-based retrieval metrics
    * completing the eval family (MRR = first hit, NDCG = graded
    * positions, AUC = threshold-free; this key = the binary-relevance
    * cut metrics). Same md5-sampled query set and brute-force cosine
    * ranks; relevance = same label. Average precision in exact
    * integers with the FLOOR-PER-TERM convention (each hit
    * contributes cum_rel·1e6 div rank; the sum divides by
    * min(n_rel, 10) — spelled as CASE, not LEAST, per the r15
    * decimal-least hazard note, though these are BIGINTs), P@10 =
    * hits·1e5 exactly, R@10 guarded on n_rel = 0 (contributes 0, the
    * `eval_ndcg_at10` convention). Label-level floor means. All
    * windows q_id-partitioned. */
  val evalMapAtK: QDef = q(
    "eval_map_at_k",
    s"""WITH qs AS (
      |  SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
      |  FROM embeddings
      |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'),
      |cand AS (
      |  SELECT qs.q_id, qs.q_label, e.vec_id,
      |    ${VecMath.sqlCosine("e.embedding", "qs.q_emb")} AS sim,
      |    CASE WHEN e.label = qs.q_label THEN 1 ELSE 0 END AS rel
      |  FROM embeddings e JOIN qs ON e.vec_id <> qs.q_id),
      |rk AS (
      |  SELECT q_id, q_label, rel,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rnk
      |  FROM cand),
      |cu AS (
      |  SELECT q_id, q_label, rel, rnk,
      |    CAST(SUM(rel) OVER (PARTITION BY q_id) AS BIGINT) AS n_rel,
      |    CAST(SUM(rel) OVER (PARTITION BY q_id ORDER BY rnk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_rel
      |  FROM rk),
      |pq AS (
      |  SELECT q_id, q_label,
      |    MAX(n_rel) AS n_rel,
      |    CAST(SUM(CASE WHEN rnk <= 10 THEN rel ELSE 0 END) AS BIGINT)
      |      AS hits10,
      |    CAST(SUM(CASE WHEN rnk <= 10 AND rel = 1
      |      THEN cum_rel * 1000000 // rnk ELSE 0 END) AS BIGINT) AS ap_sum
      |  FROM cu GROUP BY q_id, q_label),
      |m AS (
      |  SELECT q_id, q_label,
      |    CASE WHEN n_rel = 0 THEN 0 ELSE ap_sum
      |      // (CASE WHEN n_rel < 10 THEN n_rel ELSE 10 END) END AS ap_micro,
      |    hits10 * 100000 AS p10_ppm,
      |    CASE WHEN n_rel = 0 THEN 0
      |      ELSE hits10 * 1000000 // n_rel END AS r10_ppm
      |  FROM pq)
      |SELECT q_label AS label,
      |  CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CAST(SUM(ap_micro) AS BIGINT) // COUNT(*) AS map_micro,
      |  CAST(SUM(p10_ppm) AS BIGINT) // COUNT(*) AS mean_p10_ppm,
      |  CAST(SUM(r10_ppm) AS BIGINT) // COUNT(*) AS mean_r10_ppm
      |FROM m GROUP BY q_label ORDER BY label""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
    val qs = e.filter(
        substring(md5(col("vec_id").cast(StringType)), 1, 1) === "0")
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val cand = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"),
        VecMath.fcosine(col("embedding"), col("q_emb")).as("sim"),
        when(col("label") === col("q_label"), 1L).otherwise(0L).as("rel"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val rk = cand.select(col("q_id"), col("q_label"), col("rel"),
      row_number().over(wRank).cast(LongType).as("rnk"))
    val wQ = Window.partitionBy(col("q_id"))
    val wCum = Window.partitionBy(col("q_id")).orderBy(col("rnk"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cu = rk.select(col("q_id"), col("q_label"), col("rel"), col("rnk"),
      sum(col("rel")).over(wQ).as("n_rel"),
      sum(col("rel")).over(wCum).as("cum_rel"))
    val pq = cu.groupBy(col("q_id"), col("q_label"))
      .agg(max(col("n_rel")).as("n_rel"),
        sum(when(col("rnk") <= 10, col("rel")).otherwise(0L)).as("hits10"),
        sum(when(col("rnk") <= 10 && col("rel") === 1,
          expr("cum_rel * 1000000 div rnk")).otherwise(0L)).as("ap_sum"))
    val m = pq.select(col("q_id"), col("q_label"),
      expr("CASE WHEN n_rel = 0 THEN 0 ELSE ap_sum"
        + " div (CASE WHEN n_rel < 10 THEN n_rel ELSE 10 END) END")
        .as("ap_micro"),
      (col("hits10") * 100000L).as("p10_ppm"),
      expr("CASE WHEN n_rel = 0 THEN 0"
        + " ELSE hits10 * 1000000 div n_rel END").as("r10_ppm"))
    m.groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        expr("CAST(SUM(ap_micro) AS BIGINT) div COUNT(*)").as("map_micro"),
        expr("CAST(SUM(p10_ppm) AS BIGINT) div COUNT(*)").as("mean_p10_ppm"),
        expr("CAST(SUM(r10_ppm) AS BIGINT) div COUNT(*)").as("mean_r10_ppm"))
      .orderBy(col("label"))
  }

  /** Wilson score interval (r17) — the proportion CI the stats
    * family lacked (`stats_prop_ztest` tests a difference;
    * `eval_calibration_bins` bins continuous scores): per event type,
    * the share of high-value events (> $100) with its 95% Wilson
    * bounds. (x, n) are exact integers; the interval itself is ONE
    * fixed float expression chain over them — /, *, +, −, sqrt are
    * all IEEE-correctly-rounded, so identical operand order gives
    * bit-identical doubles in both engines (the
    * `graph_degree_assortativity` precedent), with ROUND(…,6) as
    * defense-in-depth. z² = 3.841459 is the house constant
    * (ab_srm_check); z = sqrt(z²) never runs on data. One group agg +
    * row-local math + presentation sort. */
  val statsWilsonCi: QDef = q(
    "stats_wilson_ci",
    """WITH g AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100
      |      AS BIGINT) > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS x
      |  FROM events GROUP BY event_type),
      |t AS (
      |  SELECT event_type, n, x,
      |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
      |    CAST(n AS DOUBLE) AS nd
      |  FROM g)
      |SELECT event_type, n, x,
      |  CAST(x * 1000000 // n AS BIGINT) AS p_ppm,
      |  ROUND((ph + 3.841459 / (2.0 * nd)
      |    - sqrt(3.841459) * sqrt(ph * (1.0 - ph) / nd
      |      + 3.841459 / (4.0 * nd * nd)))
      |    / (1.0 + 3.841459 / nd), 6) AS wilson_lo,
      |  ROUND((ph + 3.841459 / (2.0 * nd)
      |    + sqrt(3.841459) * sqrt(ph * (1.0 - ph) / nd
      |      + 3.841459 / (4.0 * nd * nd)))
      |    / (1.0 + 3.841459 / nd), 6) AS wilson_hi
      |FROM t ORDER BY event_type""") { (s, d) =>
    val g = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          > 10000L, 1L).otherwise(0L)).as("x"))
    val t = g.select(col("event_type"), col("n"), col("x"),
      (col("x").cast(DoubleType) / col("n").cast(DoubleType)).as("ph"),
      col("n").cast(DoubleType).as("nd"))
    t.select(col("event_type"), col("n"), col("x"),
        expr("CAST(x * 1000000 div n AS BIGINT)").as("p_ppm"),
        round((col("ph") + lit(3.841459) / (lit(2.0) * col("nd"))
          - sqrt(lit(3.841459)) * sqrt(col("ph") * (lit(1.0) - col("ph"))
            / col("nd")
            + lit(3.841459) / (lit(4.0) * col("nd") * col("nd"))))
          / (lit(1.0) + lit(3.841459) / col("nd")), 6).as("wilson_lo"),
        round((col("ph") + lit(3.841459) / (lit(2.0) * col("nd"))
          + sqrt(lit(3.841459)) * sqrt(col("ph") * (lit(1.0) - col("ph"))
            / col("nd")
            + lit(3.841459) / (lit(4.0) * col("nd") * col("nd"))))
          / (lit(1.0) + lit(3.841459) / col("nd")), 6).as("wilson_hi"))
      .orderBy(col("event_type"))
  }

  /** Difference-in-differences (r17) — the quasi-experimental
    * estimator next to `ab_test_metrics` (randomized) and
    * `ab_cuped_adjustment` (variance reduction): treatment = the
    * md5-parity user split, pre/post = the month's midpoint
    * (2024-01-16, the `split_time_based` cut convention). Per event
    * type and cell (treated × post): n and exact cents mass; cell
    * means in floor-micro with each n = 0 guarded NULL; DiD = (T_post
    * − T_pre) − (C_post − C_pre), NULL-propagating through any empty
    * cell in BOTH engines. One (type, cell) agg + a type-level fold +
    * sort. */
  val abDiffInDiff: QDef = q(
    "ab_diff_in_diff",
    """WITH e AS (
      |  SELECT event_type,
      |    substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7' AS treated,
      |    ts >= TIMESTAMP '2024-01-16 00:00:00' AS post,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |c AS (
      |  SELECT event_type, treated, post,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
      |  FROM e GROUP BY event_type, treated, post),
      |w AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN NOT treated AND NOT post THEN n END) AS n_cc,
      |    MAX(CASE WHEN NOT treated AND post THEN n END) AS n_cp,
      |    MAX(CASE WHEN treated AND NOT post THEN n END) AS n_tc,
      |    MAX(CASE WHEN treated AND post THEN n END) AS n_tp,
      |    MAX(CASE WHEN NOT treated AND NOT post THEN s END) AS s_cc,
      |    MAX(CASE WHEN NOT treated AND post THEN s END) AS s_cp,
      |    MAX(CASE WHEN treated AND NOT post THEN s END) AS s_tc,
      |    MAX(CASE WHEN treated AND post THEN s END) AS s_tp
      |  FROM c GROUP BY event_type),
      |m AS (
      |  SELECT event_type, n_cc, n_cp, n_tc, n_tp,
      |    CASE WHEN n_cc = 0 THEN NULL
      |      ELSE CAST(s_cc * 1000000 // n_cc AS BIGINT) END AS mean_cc_micro,
      |    CASE WHEN n_cp = 0 THEN NULL
      |      ELSE CAST(s_cp * 1000000 // n_cp AS BIGINT) END AS mean_cp_micro,
      |    CASE WHEN n_tc = 0 THEN NULL
      |      ELSE CAST(s_tc * 1000000 // n_tc AS BIGINT) END AS mean_tc_micro,
      |    CASE WHEN n_tp = 0 THEN NULL
      |      ELSE CAST(s_tp * 1000000 // n_tp AS BIGINT) END AS mean_tp_micro
      |  FROM w)
      |SELECT *,
      |  (mean_tp_micro - mean_tc_micro) - (mean_cp_micro - mean_cc_micro)
      |    AS did_micro
      |FROM m ORDER BY event_type""") { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_type"),
        (substring(md5(col("user_id").cast(StringType)), 1, 1) <= "7")
          .as("treated"),
        (col("ts") >= lit("2024-01-16 00:00:00").cast(TimestampType))
          .as("post"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
    val c = e.groupBy(col("event_type"), col("treated"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    def cell(t: Boolean, p: Boolean, v: String) =
      max(when(col("treated") === t && col("post") === p, col(v)))
    val w = c.groupBy(col("event_type"))
      .agg(cell(false, false, "n").as("n_cc"), cell(false, true, "n").as("n_cp"),
        cell(true, false, "n").as("n_tc"), cell(true, true, "n").as("n_tp"),
        cell(false, false, "s").as("s_cc"), cell(false, true, "s").as("s_cp"),
        cell(true, false, "s").as("s_tc"), cell(true, true, "s").as("s_tp"))
    def mean(nc: String, sc: String) =
      expr(s"CASE WHEN $nc = 0 THEN NULL"
        + s" ELSE CAST($sc * 1000000 div $nc AS BIGINT) END")
    val m = w.select(col("event_type"),
      col("n_cc"), col("n_cp"), col("n_tc"), col("n_tp"),
      mean("n_cc", "s_cc").as("mean_cc_micro"),
      mean("n_cp", "s_cp").as("mean_cp_micro"),
      mean("n_tc", "s_tc").as("mean_tc_micro"),
      mean("n_tp", "s_tp").as("mean_tp_micro"))
    m.withColumn("did_micro",
        (col("mean_tp_micro") - col("mean_tc_micro"))
          - (col("mean_cp_micro") - col("mean_cc_micro")))
      .orderBy(col("event_type"))
  }

  /** Bollinger bands (r17) — the rolling mean ± 2σ envelope next to
    * `win_rolling_corr` (same ONE-exchange multi-sum frame
    * discipline): per event type, daily cents mass with its trailing
    * 7-day band and the outside-band flag (the volatility monitor an
    * ops dashboard draws). The window sums (n, Σx, Σx²) are exact
    * integers; the band is a fixed float chain over them. OPERAND
    * BOUND (documented, the welch rule's float analogue): the
    * variance numerator n·Σx² − (Σx)² stays below 2^53 up to daily
    * masses of ~$4·10^5 over the 7-row frame, so its BIGINT → DOUBLE
    * conversion is EXACT in both engines — at bigger money, pre-floor
    * the daily mass to coarser units first. /, ·, sqrt are then
    * correctly rounded, ROUND(…,6) defense. */
  val winBollingerBands: QDef = q(
    "win_bollinger_bands",
    """WITH dly AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, cents,
      |    CAST(COUNT(*) OVER win AS BIGINT) AS n,
      |    CAST(SUM(cents) OVER win AS BIGINT) AS sx,
      |    CAST(SUM(cents * cents) OVER win AS BIGINT) AS sxx
      |  FROM dly
      |  WINDOW win AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |b AS (
      |  SELECT event_type, day, cents, n,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
      |    CASE WHEN n <= 1 THEN NULL
      |      ELSE sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |        / CAST(n * (n - 1) AS DOUBLE) / CAST(n AS DOUBLE)) END AS sd_c
      |  FROM w)
      |SELECT event_type, day, cents, n,
      |  ROUND(mean_c, 6) AS mean_cents,
      |  ROUND(mean_c - 2.0 * sd_c, 6) AS band_lo,
      |  ROUND(mean_c + 2.0 * sd_c, 6) AS band_hi,
      |  CASE WHEN sd_c IS NULL THEN NULL
      |    ELSE CAST(CAST(cents AS DOUBLE) < mean_c - 2.0 * sd_c
      |      OR CAST(cents AS DOUBLE) > mean_c + 2.0 * sd_c AS INT) END
      |    AS outside_band
      |FROM b ORDER BY event_type, day""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dly = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .cast(LongType).as("cents"))
    val win = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    val w = dly.select(col("event_type"), col("day"), col("cents"),
      count(lit(1)).over(win).as("n"),
      sum(col("cents")).over(win).as("sx"),
      sum(col("cents") * col("cents")).over(win).as("sxx"))
    val b = w.select(col("event_type"), col("day"), col("cents"), col("n"),
      (col("sx").cast(DoubleType) / col("n").cast(DoubleType)).as("mean_c"),
      when(col("n") <= 1, lit(null).cast(DoubleType))
        .otherwise(sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
          .cast(DoubleType)
          / (col("n") * (col("n") - 1)).cast(DoubleType)
          / col("n").cast(DoubleType))).as("sd_c"))
    b.select(col("event_type"), col("day"), col("cents"), col("n"),
        round(col("mean_c"), 6).as("mean_cents"),
        round(col("mean_c") - lit(2.0) * col("sd_c"), 6).as("band_lo"),
        round(col("mean_c") + lit(2.0) * col("sd_c"), 6).as("band_hi"),
        when(col("sd_c").isNull, lit(null).cast(IntegerType))
          .otherwise((col("cents").cast(DoubleType)
            < col("mean_c") - lit(2.0) * col("sd_c")
            || col("cents").cast(DoubleType)
            > col("mean_c") + lit(2.0) * col("sd_c")).cast(IntegerType))
          .as("outside_band"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Binary-segmentation changepoint (r17) — the one-split complement
    * to `ts_cusum_alarm` (sequential drift) and
    * `ts_decompose_additive` (seasonal): per event type, the day
    * boundary maximizing the between-segment sum of squares BSS(k) =
    * (S_k·n − S·k)² / (k·(n−k)) over the daily DOLLAR series — the
    * classic offline level-shift detector. Everything is exact
    * integers: prefix sums over a type-partitioned window, the
    * squared numerator ridden through DECIMAL(38)/HUGEINT (daily
    * dollars keep it well inside — documented bound ~10^15 at fixture
    * scale), floor-divided once to a BIGINT score, argmax = the
    * type-partitioned (score DESC, k ASC) rank-1 row. Output carries
    * the split day and both segment means in floor-micro dollars.
    * Scale: one (type, day) agg, then day-cardinality windows. */
  val tsChangepointSplit: QDef = q(
    "ts_changepoint_split",
    """WITH dly AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      // 100 AS BIGINT) AS dollars
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT event_type, day, dollars,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
      |      AS BIGINT) AS k,
      |    CAST(SUM(dollars) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS sk,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(SUM(dollars) OVER (PARTITION BY event_type) AS BIGINT) AS s
      |  FROM dly),
      |sc AS (
      |  SELECT event_type, day, k, sk, n, s,
      |    CAST(CAST(sk * n - s * k AS HUGEINT) * (sk * n - s * k)
      |      // (k * (n - k)) AS BIGINT) AS score
      |  FROM p WHERE k < n),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY score DESC, k) AS rn
      |  FROM sc)
      |SELECT event_type, day AS split_day, k AS split_k, n AS n_days,
      |  score AS bss_score,
      |  CAST(sk * 1000000 // k AS BIGINT) AS mean_left_micro,
      |  CAST((s - sk) * 1000000 // (n - k) AS BIGINT) AS mean_right_micro
      |FROM r WHERE rn = 1
      |ORDER BY event_type""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dly = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(expr("CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100"
        + " AS BIGINT)) div 100 AS BIGINT)").as("dollars"))
    val wDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val p = dly.select(col("event_type"), col("day"), col("dollars"),
      row_number().over(wDay).cast(LongType).as("k"),
      sum(col("dollars"))
        .over(wDay.rowsBetween(Window.unboundedPreceding, 0)).as("sk"),
      count(lit(1)).over(wAll).as("n"),
      sum(col("dollars")).over(wAll).as("s"))
    val sc = p.filter(col("k") < col("n"))
      .withColumn("score",
        expr("CAST(CAST(sk * n - s * k AS DECIMAL(38,0)) * (sk * n - s * k)"
          + " div (k * (n - k)) AS BIGINT)"))
    val r = sc.withColumn("rn", row_number().over(
      Window.partitionBy(col("event_type"))
        .orderBy(col("score").desc, col("k"))))
    r.filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("k").as("split_k"), col("n").as("n_days"),
        col("score").as("bss_score"),
        expr("CAST(sk * 1000000 div k AS BIGINT)").as("mean_left_micro"),
        expr("CAST((s - sk) * 1000000 div (n - k) AS BIGINT)")
          .as("mean_right_micro"))
      .orderBy(col("event_type"))
  }

  /** Bipartite two-hop path census (r17) — the seventh consumer of
    * the shared trade-graph primitive (`ClusterOps.tradeEb`): how
    * many customer–customer co-purchase pairs each supplier induces.
    * The supplier-side projection of a bipartite graph materializes
    * deg² rows per hub — the classic graph blow-up — but its SIZE is
    * pure degree combinatorics: paths2(s) = deg·(deg−1)/2. One
    * degree agg + a 1-row broadcast total; the pairs themselves are
    * NEVER enumerated (the projection-planning number an engineer
    * reads before attempting the projection at 100 TB). Top-15 hubs
    * under (paths2 DESC, suppkey). */
  val graphBipartiteTwohop: QDef = q(
    "graph_bipartite_twohop",
    s"""WITH ${ClusterOps.tradeEbCte},
      |deg AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS deg
      |  FROM eb GROUP BY sk),
      |tot AS (SELECT
      |  CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS total_paths2,
      |  CAST(COUNT(*) AS BIGINT) AS n_suppliers FROM deg)
      |SELECT sk AS suppkey, deg,
      |  CAST(deg * (deg - 1) // 2 AS BIGINT) AS paths2,
      |  total_paths2, n_suppliers
      |FROM deg CROSS JOIN tot
      |ORDER BY paths2 DESC, suppkey
      |LIMIT 15""") { (s, d) =>
    val deg = ClusterOps.tradeEb(s, d)
      .groupBy(col("sk")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).cast(LongType).as("total_paths2"),
      count(lit(1)).as("n_suppliers"))
    deg.crossJoin(broadcast(tot))
      .select(col("sk").as("suppkey"), col("deg"),
        expr("CAST(deg * (deg - 1) div 2 AS BIGINT)").as("paths2"),
        col("total_paths2"), col("n_suppliers"))
      .orderBy(col("paths2").desc, col("suppkey"))
      .limit(15)
  }

  /** Region-cut conductance (r17) — the community-quality metric over
    * the shared trade graph (eighth `tradeEb` consumer): for each
    * region's node set S (customers and suppliers whose nation is in
    * the region), conductance = cross-cut edges / min(vol(S),
    * vol(V∖S)) — the number that says whether region-sharded graph
    * processing would cut few edges. Endpoint-region tagging rides
    * two broadcast dim joins; everything after is 5-row algebra in
    * exact integers (conductance in floor-ppm, empty side guarded
    * NULL, min spelled as CASE per the decimal-least note — these
    * are BIGINTs but one spelling is one spelling). */
  val graphCutConductance: QDef = q(
    "graph_cut_conductance",
    s"""WITH ${ClusterOps.tradeEbCte},
      |cr AS (
      |  SELECT c_custkey AS ck, r_name AS rc FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |sr AS (
      |  SELECT s_suppkey AS sk, r_name AS rs FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |e AS (
      |  SELECT cr.rc, sr.rs FROM eb
      |  JOIN cr ON eb.ck = cr.ck JOIN sr ON eb.sk = sr.sk),
      |tot AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS vol_all FROM e),
      |nc AS (SELECT rc AS region, CAST(COUNT(*) AS BIGINT) AS n_c
      |  FROM e GROUP BY rc),
      |ns AS (SELECT rs AS region, CAST(COUNT(*) AS BIGINT) AS n_s
      |  FROM e GROUP BY rs),
      |nw AS (SELECT rc AS region, CAST(COUNT(*) AS BIGINT) AS n_within
      |  FROM e WHERE rc = rs GROUP BY rc),
      |m AS (
      |  SELECT r_name AS region,
      |    COALESCE(n_within, 0) AS n_within,
      |    COALESCE(n_c, 0) + COALESCE(n_s, 0)
      |      - 2 * COALESCE(n_within, 0) AS n_cross,
      |    COALESCE(n_c, 0) + COALESCE(n_s, 0) AS vol
      |  FROM region
      |  LEFT JOIN nc ON nc.region = r_name
      |  LEFT JOIN ns ON ns.region = r_name
      |  LEFT JOIN nw ON nw.region = r_name)
      |SELECT region, n_within, n_cross, vol,
      |  CASE WHEN (CASE WHEN vol < vol_all - vol THEN vol
      |      ELSE vol_all - vol END) = 0 THEN NULL
      |    ELSE CAST(n_cross * 1000000
      |      // (CASE WHEN vol < vol_all - vol THEN vol
      |          ELSE vol_all - vol END) AS BIGINT) END AS conductance_ppm
      |FROM m CROSS JOIN tot
      |ORDER BY region""") { (s, d) =>
    val cr = Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey").as("e_ck"), col("r_name").as("rc"))
    val sr = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey").as("e_sk"), col("r_name").as("rs"))
    // r19-opt (guide §2.3, aggregate before you persist): the four
    // downstream legs (vol_all, per-region endpoint counts, within-
    // region counts) are all exact functions of the (rc, rs) COUNT
    // table — ≤|regions|² = 25 rows — so persist THAT, not the raw
    // |edges|-sized (rc, rs) projection the r18 shape cached and then
    // re-scanned four times. At 100 TB the cache shrinks from
    // edge-volume to a constant 25 rows and each leg is row-trivial.
    val e = ClusterOps.tradeEb(s, d)
      .join(broadcast(cr), col("ck") === col("e_ck"))
      .join(broadcast(sr), col("sk") === col("e_sk"))
      .groupBy(col("rc"), col("rs")).agg(count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = e.agg((sum(col("n")) * 2).as("vol_all"))
    val nc = e.groupBy(col("rc").as("nc_region"))
      .agg(sum(col("n")).cast(LongType).as("n_c"))
    val ns = e.groupBy(col("rs").as("ns_region"))
      .agg(sum(col("n")).cast(LongType).as("n_s"))
    val nw = e.filter(col("rc") === col("rs"))
      .groupBy(col("rc").as("nw_region"))
      .agg(sum(col("n")).cast(LongType).as("n_within"))
    val m = Tables.region(s, d).select(col("r_name").as("region"))
      .join(broadcast(nc), col("nc_region") === col("region"), "left")
      .join(broadcast(ns), col("ns_region") === col("region"), "left")
      .join(broadcast(nw), col("nw_region") === col("region"), "left")
      .select(col("region"),
        coalesce(col("n_within"), lit(0L)).as("n_within"),
        (coalesce(col("n_c"), lit(0L)) + coalesce(col("n_s"), lit(0L))
          - lit(2L) * coalesce(col("n_within"), lit(0L))).as("n_cross"),
        (coalesce(col("n_c"), lit(0L)) + coalesce(col("n_s"), lit(0L)))
          .as("vol"))
    m.crossJoin(broadcast(tot))
      .select(col("region"), col("n_within"), col("n_cross"), col("vol"),
        expr("CASE WHEN (CASE WHEN vol < vol_all - vol THEN vol"
          + " ELSE vol_all - vol END) = 0 THEN NULL"
          + " ELSE CAST(n_cross * 1000000"
          + " div (CASE WHEN vol < vol_all - vol THEN vol"
          + " ELSE vol_all - vol END) AS BIGINT) END").as("conductance_ppm"))
      .orderBy(col("region"))
  }

  /** b-bit minhash audit (r17) — the signature-compression question
    * next to `minhash_est_audit` (full 32-bit slots) and
    * `sim_pq_codes`/`embed_quantize_int8` (vector compression): if
    * the stored signature keeps only the LAST HEX CHAR (b=4 bits) of
    * each of the 8 slots — an 8× smaller table than
    * `dedup_signature_store_roundtrip` ships — how good is the
    * Jaccard estimate? Per LSH candidate pair: full-slot matches m32
    * (est = m/8), 4-bit matches mb with the Li–König collision
    * correction Ĵ = (p̂ − 2⁻ᵇ)/(1 − 2⁻ᵇ) = (2·mb − 1)/15 clamped at 0,
    * both in exact floor-micro, next to the exact shingle-set
    * Jaccard. All three columns derive from integer counts (the
    * exact Jaccard is the one graded division, same as
    * `dedup_minhash_lsh`). */
  val dedupMinhashBbit: QDef = q(
    "dedup_minhash_bbit",
    s"""WITH ${LlmExtras.lshCtes}
      |SELECT c.doc_a, c.doc_b,
      |  CAST((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END) AS BIGINT) AS m32,
      |  CAST((CASE WHEN substr(a.h0, 8, 1) = substr(b.h0, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h1, 8, 1) = substr(b.h1, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h2, 8, 1) = substr(b.h2, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h3, 8, 1) = substr(b.h3, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h4, 8, 1) = substr(b.h4, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h5, 8, 1) = substr(b.h5, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h6, 8, 1) = substr(b.h6, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h7, 8, 1) = substr(b.h7, 8, 1) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS mb,
      |  CAST((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END) AS BIGINT) * 125000
      |    AS est_full_micro,
      |  CASE WHEN 2 * ((CASE WHEN substr(a.h0, 8, 1) = substr(b.h0, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h1, 8, 1) = substr(b.h1, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h2, 8, 1) = substr(b.h2, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h3, 8, 1) = substr(b.h3, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h4, 8, 1) = substr(b.h4, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h5, 8, 1) = substr(b.h5, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h6, 8, 1) = substr(b.h6, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h7, 8, 1) = substr(b.h7, 8, 1) THEN 1 ELSE 0 END)) - 1
      |      <= 0 THEN CAST(0 AS BIGINT)
      |    ELSE CAST((2 * ((CASE WHEN substr(a.h0, 8, 1) = substr(b.h0, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h1, 8, 1) = substr(b.h1, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h2, 8, 1) = substr(b.h2, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h3, 8, 1) = substr(b.h3, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h4, 8, 1) = substr(b.h4, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h5, 8, 1) = substr(b.h5, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h6, 8, 1) = substr(b.h6, 8, 1) THEN 1 ELSE 0 END) +
      |       (CASE WHEN substr(a.h7, 8, 1) = substr(b.h7, 8, 1) THEN 1 ELSE 0 END)) - 1)
      |      * 1000000 // 15 AS BIGINT) END AS est_bbit_micro,
      |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |    / len(list_distinct(x.s || y.s)) AS jacc
      |FROM cand c
      |JOIN mh a ON a.doc_id = c.doc_a JOIN mh b ON b.doc_id = c.doc_b
      |JOIN sets x ON x.doc_id = c.doc_a JOIN sets y ON y.doc_id = c.doc_b
      |ORDER BY doc_a, doc_b""") { (s, d) =>
    val base = LlmExtras.shingleBase(s, d)
    val cand = LlmExtras.bandCandidates(base)
    val sa = base.select(Seq(col("doc_id").as("a_id")) ++
      (0 until 8).map(i => col(s"h$i").as(s"a_h$i")): _*)
    val sb = base.select(Seq(col("doc_id").as("b_id")) ++
      (0 until 8).map(i => col(s"h$i").as(s"b_h$i")): _*)
    val m32 = (0 until 8).map(i =>
      when(col(s"a_h$i") === col(s"b_h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val mb = (0 until 8).map(i =>
      when(substring(col(s"a_h$i"), 8, 1) === substring(col(s"b_h$i"), 8, 1),
        1L).otherwise(0L)).reduce(_ + _)
    val withSigs = cand
      .join(sa, col("doc_a") === col("a_id"))
      .join(sb, col("doc_b") === col("b_id"))
      .select(col("doc_a"), col("doc_b"), m32.as("m32"), mb.as("mb"))
    val jacc = LlmExtras.exactJaccard(cand, base)
      .select(col("doc_a").as("j_a"), col("doc_b").as("j_b"), col("jacc"))
    withSigs
      .join(jacc, col("doc_a") === col("j_a") && col("doc_b") === col("j_b"))
      .select(col("doc_a"), col("doc_b"), col("m32"), col("mb"),
        (col("m32") * 125000L).as("est_full_micro"),
        when(lit(2L) * col("mb") - 1L <= 0L, 0L)
          .otherwise(expr("CAST((2 * mb - 1) * 1000000 div 15 AS BIGINT)"))
          .as("est_bbit_micro"),
        col("jacc"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (r17) — the LM
    * smoothing step after `tokenizer_bpe_pairs`/`text_ngram_logprob`
    * (raw counts / unsmoothed logprobs): for the corpus's top-20
    * bigrams, P_KN(w2|w1) = (max(c−d,0) + d·N1₊(w1·)·P_cont(w2)) /
    * c(w1·) with the standard d = 0.75 and P_cont(w2) = N1₊(·w2)/T
    * (continuation counts over T distinct bigram types). d = 3/4
    * makes the whole formula one exact rational: P·ppm =
    * ((4c−3)·T + 3·N1₊(w1·)·N1₊(·w2))·10⁶ // (4·T·c(w1·)), ridden
    * through DECIMAL(38)/HUGEINT. Bigrams are generated row-locally
    * (indexed transform over the token array — no shuffle of raw
    * occurrences); the context/continuation marginals are
    * vocabulary-sized windows on the grouped bigram table; T is a
    * 1-row broadcast. */
  val textKneserNeyBigram: QDef = q(
    "text_kneser_ney_bigram",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (
      |  SELECT unnest(list_transform(range(2, len(t) + 1),
      |    i -> t[i-1] || ' ' || t[i])) AS b
      |  FROM toks),
      |bc AS (
      |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM bg GROUP BY 1, 2),
      |marg AS (
      |  SELECT w1, w2, c,
      |    CAST(SUM(c) OVER (PARTITION BY w1) AS BIGINT) AS cw1,
      |    CAST(COUNT(*) OVER (PARTITION BY w1) AS BIGINT) AS n1p,
      |    CAST(COUNT(*) OVER (PARTITION BY w2) AS BIGINT) AS n1c
      |  FROM bc),
      |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM bc)
      |SELECT w1, w2, c, cw1, n1p, n1c, t_types,
      |  CAST((CAST(4 * c - 3 AS HUGEINT) * t_types + 3 * n1p * n1c)
      |    * 1000000 // (CAST(4 AS HUGEINT) * t_types * cw1) AS BIGINT)
      |    AS pkn_ppm
      |FROM marg CROSS JOIN tt
      |ORDER BY c DESC, w1, w2
      |LIMIT 20""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // explode a plain index sequence and index per row — NOT a
    // transform-lambda under the Generate (the PlanInvariantsSpec
    // interpreted-higher-order ban; the langid/udtf_bigrams build)
    val bg = Tables.documents(s, d)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("t"), explode(expr("sequence(2, size(t))")).as("i"))
      .select(expr("t[i-2]").as("w1"), expr("t[i-1]").as("w2"))
    val bc = bg
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val marg = bc.select(col("w1"), col("w2"), col("c"),
      sum(col("c")).over(Window.partitionBy(col("w1"))).as("cw1"),
      count(lit(1)).over(Window.partitionBy(col("w1"))).as("n1p"),
      count(lit(1)).over(Window.partitionBy(col("w2"))).as("n1c"))
    val tt = bc.agg(count(lit(1)).as("t_types"))
    marg.crossJoin(broadcast(tt))
      .select(col("w1"), col("w2"), col("c"), col("cw1"), col("n1p"),
        col("n1c"), col("t_types"),
        expr("CAST((CAST(4 * c - 3 AS DECIMAL(38,0)) * t_types"
          + " + 3 * n1p * n1c) * 1000000"
          + " div (CAST(4 AS DECIMAL(38,0)) * t_types * cw1) AS BIGINT)")
          .as("pkn_ppm"))
      .orderBy(col("c").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Binary codec functions (r17) — the base64/hex encode-decode leg
    * of the functions family (`fn_hash_digests` covers digests): doc
    * text prefixes through encode → base64 → from_base64 → decode
    * roundtrip with the ok-flag graded, plus lowercase hex and byte
    * length. CROSS-ENGINE CASE NOTE: Spark's hex() emits UPPERCASE,
    * DuckDB's lowercase — both sides spell lower(hex(…)) so the one
    * spelling is the graded one. Row-local, one scan + sort. */
  val fnBinaryCodecs: QDef = q(
    "fn_binary_codecs",
    """SELECT doc_id,
      |  base64(encode(substr(text, 1, 16))) AS b64,
      |  lower(hex(encode(substr(text, 1, 8)))) AS hx,
      |  CAST(octet_length(encode(substr(text, 1, 16))) AS BIGINT) AS blen,
      |  CAST(decode(from_base64(base64(encode(substr(text, 1, 16)))))
      |    = substr(text, 1, 16) AS INT) AS rt_ok
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        base64(encode(substring(col("text"), 1, 16), "UTF-8")).as("b64"),
        lower(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("hx"),
        octet_length(encode(substring(col("text"), 1, 16), "UTF-8"))
          .cast(LongType).as("blen"),
        (decode(unbase64(base64(encode(substring(col("text"), 1, 16),
          "UTF-8"))), "UTF-8") === substring(col("text"), 1, 16))
          .cast(IntegerType).as("rt_ok"))
      .orderBy(col("doc_id"))
  }

  /** Skew-salt planning (r17) — the actionable continuation of
    * `profile_key_skew` and the pre-pass a production salted join
    * (`join_skew_salted`) runs: per user, rows div 200 (ceil) = the
    * salt fan-out that caps any salted partition at the target; the
    * plan is the salt-count histogram (how many keys need 1, 2, …
    * splits, what row mass each stratum carries, and the total task
    * count the salted side will spawn). One key-sized agg + a 1-row
    * broadcast total; the histogram is salt-cardinality. */
  val shardSaltPlan: QDef = q(
    "shard_salt_plan",
    """WITH u AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY user_id),
      |sp AS (SELECT user_id, cnt,
      |  CAST((cnt + 199) // 200 AS BIGINT) AS salt_n FROM u),
      |tot AS (SELECT CAST(SUM(salt_n) AS BIGINT) AS total_splits,
      |  CAST(SUM(cnt) AS BIGINT) AS total_rows FROM sp)
      |SELECT salt_n, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |  CAST(SUM(cnt) * 1000000 // total_rows AS BIGINT) AS rows_ppm,
      |  total_splits
      |FROM sp CROSS JOIN tot
      |GROUP BY salt_n, total_splits, total_rows
      |ORDER BY salt_n""") { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val sp = u.select(col("user_id"), col("cnt"),
      expr("CAST((cnt + 199) div 200 AS BIGINT)").as("salt_n"))
    val tot = sp.agg(sum(col("salt_n")).cast(LongType).as("total_splits"),
      sum(col("cnt")).cast(LongType).as("total_rows"))
    sp.crossJoin(broadcast(tot))
      .groupBy(col("salt_n"), col("total_splits"), col("total_rows"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("cnt")).cast(LongType).as("n_rows"))
      .select(col("salt_n"), col("n_users"), col("n_rows"),
        expr("CAST(n_rows * 1000000 div total_rows AS BIGINT)")
          .as("rows_ppm"),
        col("total_splits"))
      .orderBy(col("salt_n"))
  }

  /** t-closeness (r17) — completing the k-anonymity / l-diversity
    * ladder: per QI group (nation × segment, the `privacy_k_anonymity`
    * QI minus the sensitive column), the total-variation distance
    * between the group's sensitive-value distribution (balance
    * bucket) and the global one. TV = ½Σ|p_g − p| is one exact
    * rational: Σ|n_gv·N − n_v·n_g| over the group's present values
    * PLUS the absent-value mass n_g·N − Σ_present n_v·n_g (absent v
    * contribute |0 − p| — the term a naive join-only spelling
    * silently drops), all over 2·n_g·N, in floor-ppm through
    * DECIMAL(38)/HUGEINT. Output flags groups violating t = 0.2. One
    * (QI, v) agg; the v-marginal and N broadcast. */
  val privacyTCloseness: QDef = q(
    "privacy_t_closeness",
    """WITH c AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000
      |      AS v
      |  FROM customer),
      |gv AS (
      |  SELECT c_nationkey, c_mktsegment, v, CAST(COUNT(*) AS BIGINT) AS n_gv
      |  FROM c GROUP BY 1, 2, 3),
      |vm AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_v FROM c GROUP BY v),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM c),
      |g AS (
      |  SELECT gv.c_nationkey, gv.c_mktsegment,
      |    CAST(SUM(n_gv) AS BIGINT) AS n_g,
      |    CAST(SUM(abs(CAST(n_gv AS HUGEINT) * n_all - CAST(n_v AS HUGEINT)
      |        * (SELECT SUM(n_gv2.n_gv) FROM gv n_gv2
      |           WHERE n_gv2.c_nationkey = gv.c_nationkey
      |             AND n_gv2.c_mktsegment = gv.c_mktsegment))
      |      - CAST(n_v AS HUGEINT)
      |        * (SELECT SUM(n_gv3.n_gv) FROM gv n_gv3
      |           WHERE n_gv3.c_nationkey = gv.c_nationkey
      |             AND n_gv3.c_mktsegment = gv.c_mktsegment)) AS HUGEINT)
      |      AS part_sum
      |  FROM gv JOIN vm ON vm.v = gv.v CROSS JOIN nn
      |  GROUP BY 1, 2)
      |SELECT c_nationkey, c_mktsegment, n_g,
      |  CAST((part_sum + CAST(n_g AS HUGEINT) * n_all) * 1000000
      |    // (CAST(2 AS HUGEINT) * n_g * n_all) AS BIGINT) AS tv_ppm,
      |  CAST(CAST((part_sum + CAST(n_g AS HUGEINT) * n_all) * 1000000
      |    // (CAST(2 AS HUGEINT) * n_g * n_all) AS BIGINT) <= 200000 AS INT)
      |    AS t02_ok
      |FROM g CROSS JOIN nn
      |ORDER BY c_nationkey, c_mktsegment""") { (s, d) =>
    val c = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
          + " div 100000").as("v"))
    val gv = c.groupBy(col("c_nationkey"), col("c_mktsegment"), col("v"))
      .agg(count(lit(1)).as("n_gv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vm = gv.groupBy(col("v").as("vm_v"))
      .agg(sum(col("n_gv")).as("n_v"))
    val nn = gv.agg(sum(col("n_gv")).as("n_all"))
    val ng = gv.groupBy(col("c_nationkey").as("g_nk"),
        col("c_mktsegment").as("g_seg"))
      .agg(sum(col("n_gv")).as("n_g"))
    // per-(QI, v) signed term needs n_g on the row: broadcast the
    // QI-sized n_g table back on (the oracle spells the same quantity
    // as a correlated sum — one semantics, two spellings)
    val g = gv
      .join(broadcast(vm), col("vm_v") === col("v"))
      .join(broadcast(ng),
        col("g_nk") === col("c_nationkey") && col("g_seg") === col("c_mktsegment"))
      .crossJoin(broadcast(nn))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(max(col("n_g")).as("n_g"),
        sum(expr("abs(CAST(n_gv AS DECIMAL(38,0)) * n_all"
          + " - CAST(n_v AS DECIMAL(38,0)) * n_g)"
          + " - CAST(n_v AS DECIMAL(38,0)) * n_g")).as("part_sum"))
    g.crossJoin(broadcast(nn))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_g"),
        expr("CAST((part_sum + CAST(n_g AS DECIMAL(38,0)) * n_all) * 1000000"
          + " div (CAST(2 AS DECIMAL(38,0)) * n_g * n_all) AS BIGINT)")
          .as("tv_ppm"))
      .withColumn("t02_ok", (col("tv_ppm") <= 200000L).cast(IntegerType))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** Poisson-bootstrap confidence interval (r17) — the inference
    * layer over `sample_poisson_bootstrap`'s replicate machinery
    * (same 16-bit thresholds = the Poisson(1) CDF at 65536): per
    * event type, 32 deterministic replicate means of the cents value
    * in floor-micro, with the 2nd/31st order statistics as the ~94%
    * central interval next to the full-data mean. HASH ECONOMY
    * (measured: one md5 per (event, replicate) benched 8.8 s at
    * sf0.1): each md5 is 128 bits = EIGHT independent 16-bit windows,
    * so replicate (g, i) draws its weight from window i of
    * md5(event_id:g) — 4 md5s per event for 32 replicates, the
    * substr/threshold work row-local and codegen'd. Replicates are
    * row-local weight draws → one (type, rep) agg with map-side
    * combine (160 output rows regardless of corpus size); ranking is
    * a type-partitioned window over 32 rows. A replicate with zero
    * total weight (probability ~0.37^n) is filtered identically in
    * both engines so NULL ordering never arises. */
  val statsBootstrapCi: QDef = q(
    "stats_bootstrap_ci",
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |x AS (
      |  SELECT event_type, cents, g,
      |    md5(CAST(event_id AS VARCHAR) || ':' || CAST(g AS VARCHAR)) AS h
      |  FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS g)),
      |k AS (
      |  SELECT event_type, g * 8 + i AS rep, cents,
      |    CASE WHEN h16 < 24109 THEN 0 WHEN h16 < 48218 THEN 1
      |         WHEN h16 < 60275 THEN 2 WHEN h16 < 64291 THEN 3
      |         ELSE 4 END AS m
      |  FROM (SELECT event_type, cents, g, i,
      |    ('0x' || substr(h, i * 4 + 1, 4))::INT AS h16
      |    FROM x CROSS JOIN (SELECT unnest(range(0, 8)) AS i))),
      |rm AS (
      |  SELECT event_type, rep,
      |    CAST(SUM(m * cents) * 1000000 // SUM(m) AS BIGINT) AS rep_mean_micro
      |  FROM k GROUP BY event_type, rep
      |  HAVING SUM(m) > 0),
      |rk AS (
      |  SELECT event_type, rep_mean_micro,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY rep_mean_micro, rep) AS rn
      |  FROM rm),
      |f AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cents) * 1000000 // COUNT(*) AS BIGINT) AS mean_micro
      |  FROM e GROUP BY event_type)
      |SELECT f.event_type, f.n, f.mean_micro,
      |  MAX(CASE WHEN rn = 2 THEN rep_mean_micro END) AS boot_lo_micro,
      |  MAX(CASE WHEN rn = 31 THEN rep_mean_micro END) AS boot_hi_micro,
      |  CAST(32 AS BIGINT) AS n_replicates
      |FROM f JOIN rk ON rk.event_type = f.event_type
      |GROUP BY f.event_type, f.n, f.mean_micro
      |ORDER BY f.event_type""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // r19-opt (guide §2.5 input-parallelism class): the events file
    // is ONE small parquet split, so the whole ×32 replicate
    // explosion (md5s, conv windows, agg partials — ~32·|events|
    // rows of row-local work) ran in a single scan task while 31
    // cores idled (measured 3.2 s at sf0.1, scaling ratio 1.23 —
    // the suite's flattest "real compute" key). One round-robin
    // repartition spreads the draw work across the session width;
    // BOTH consumers (the replicate fold and the full-data mean)
    // hang off the same exchange, so the second events scan the r17
    // spelling paid is gone too (ReuseExchange). At cluster scale
    // the same spelling holds — the exchange carries |events| rows
    // of three narrow columns, 32× less than what the explode emits.
    val e0 = Tables.events(s, d)
      .select(col("event_id"), col("event_id").cast(StringType)
          .as("event_id_str"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
    val e = PartitionPolicy.spreadIfNarrow(s, e0)
    val x = e.select(col("event_type"), col("cents"), col("event_id_str"),
        explode(sequence(lit(0), lit(3))).as("g"))
      .withColumn("h", md5(concat(col("event_id_str"), lit(":"),
        col("g").cast(StringType))))
    val h16 = conv(expr("substring(h, i * 4 + 1, 4)"), 16, 10)
      .cast(IntegerType)
    val k = x.select(col("event_type"), col("cents"), col("g"), col("h"),
        explode(sequence(lit(0), lit(7))).as("i"))
      .select(col("event_type"), (col("g") * 8 + col("i")).as("rep"),
        col("cents"),
        when(h16 < 24109, 0L).when(h16 < 48218, 1L).when(h16 < 60275, 2L)
          .when(h16 < 64291, 3L).otherwise(4L).as("m"))
    val rm = k.groupBy(col("event_type"), col("rep"))
      .agg(sum(col("m") * col("cents")).as("wsum"), sum(col("m")).as("wn"))
      .filter(col("wn") > 0)
      .select(col("event_type"), col("rep"),
        expr("CAST(wsum * 1000000 div wn AS BIGINT)").as("rep_mean_micro"))
    val rk = rm.select(col("event_type").as("rk_type"), col("rep_mean_micro"),
      row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("rep_mean_micro"), col("rep"))).as("rn"))
    val f = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(cents) * 1000000 div COUNT(*) AS BIGINT)")
          .as("mean_micro"))
    f.join(rk, col("rk_type") === col("event_type"))
      .groupBy(col("event_type"), col("n"), col("mean_micro"))
      .agg(max(when(col("rn") === 2, col("rep_mean_micro")))
          .as("boot_lo_micro"),
        max(when(col("rn") === 31, col("rep_mean_micro")))
          .as("boot_hi_micro"))
      .withColumn("n_replicates", lit(32L))
      .orderBy(col("event_type"))
  }

  /** Filtered vector search audit (r17) — the vector-DB question the
    * similarity family lacked: top-k under an attribute predicate
    * (candidate label = query label). Strategy A (pre-filter) ranks
    * only predicate-passing candidates; strategy B (post-filter with
    * 10×k over-fetch) takes the global top-50 and keeps passing rows.
    * Graded per label: how much of the true filtered top-5 the
    * post-filter recovered (recall floor-ppm) and how often the
    * over-fetch came back short — the number that decides whether a
    * filtered index (IVF per label / partitioned ANN) is needed at
    * scale or over-fetch suffices. Same md5-sampled queries, house
    * quantized cosine, q_id-partitioned windows only. */
  val simFilteredTopk: QDef = q(
    "sim_filtered_topk",
    s"""WITH qs AS (
      |  SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
      |  FROM embeddings
      |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'),
      |cand AS (
      |  SELECT qs.q_id, qs.q_label, e.vec_id,
      |    ${VecMath.sqlCosine("e.embedding", "qs.q_emb")} AS sim,
      |    CASE WHEN e.label = qs.q_label THEN 1 ELSE 0 END AS pass
      |  FROM embeddings e JOIN qs ON e.vec_id <> qs.q_id),
      |pre AS (
      |  SELECT q_id, q_label, vec_id FROM (
      |    SELECT q_id, q_label, vec_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id
      |        ORDER BY sim DESC, vec_id) AS rn
      |    FROM cand WHERE pass = 1) WHERE rn <= 5),
      |post AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT q_id, vec_id, pass,
      |      ROW_NUMBER() OVER (PARTITION BY q_id
      |        ORDER BY sim DESC, vec_id) AS rn_all
      |    FROM cand) t
      |  WHERE rn_all <= 50 AND pass = 1
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rn_all) <= 5),
      |pq AS (
      |  SELECT pre.q_id, pre.q_label,
      |    CAST(COUNT(*) AS BIGINT) AS n_pre,
      |    CAST(COUNT(post.vec_id) AS BIGINT) AS n_hit
      |  FROM pre LEFT JOIN post
      |    ON post.q_id = pre.q_id AND post.vec_id = pre.vec_id
      |  GROUP BY pre.q_id, pre.q_label)
      |SELECT q_label AS label,
      |  CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CAST(SUM(n_pre) AS BIGINT) AS n_true_topk,
      |  CAST(SUM(n_hit) AS BIGINT) AS n_recovered,
      |  CAST(SUM(n_hit) * 1000000 // SUM(n_pre) AS BIGINT) AS recall_ppm,
      |  CAST(SUM(CASE WHEN n_hit < n_pre THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_queries_short
      |FROM pq GROUP BY q_label ORDER BY label""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
    val qs = e.filter(
        substring(md5(col("vec_id").cast(StringType)), 1, 1) === "0")
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val cand = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"),
        VecMath.fcosine(col("embedding"), col("q_emb")).as("sim"),
        when(col("label") === col("q_label"), 1).otherwise(0).as("pass"))
    val wSim = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val pre = cand.filter(col("pass") === 1)
      .withColumn("rn", row_number().over(wSim))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("q_label"), col("vec_id"))
    val post = cand.withColumn("rn_all", row_number().over(wSim))
      .filter(col("rn_all") <= 50 && col("pass") === 1)
      .withColumn("rn_f", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rn_all"))))
      .filter(col("rn_f") <= 5)
      .select(col("q_id").as("p_qid"), col("vec_id").as("p_vid"))
    val pq = pre
      .join(post, col("p_qid") === col("q_id") && col("p_vid") === col("vec_id"),
        "left")
      .groupBy(col("q_id"), col("q_label"))
      .agg(count(lit(1)).as("n_pre"), count(col("p_vid")).as("n_hit"))
    pq.groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("n_pre")).cast(LongType).as("n_true_topk"),
        sum(col("n_hit")).cast(LongType).as("n_recovered"),
        sum(when(col("n_hit") < col("n_pre"), 1L).otherwise(0L))
          .as("n_queries_short"))
      .select(col("label"), col("n_queries"), col("n_true_topk"),
        col("n_recovered"),
        expr("CAST(n_recovered * 1000000 div n_true_topk AS BIGINT)")
          .as("recall_ppm"),
        col("n_queries_short"))
      .orderBy(col("label"))
  }

  /** Position-based (U-shaped) attribution (r17) — the third
    * estimator of the attribution family (`attribution_linear` =
    * equal split, `attribution_time_decay` = recency-weighted): 40%
    * first touch, 40% last touch, 20% split across middles, the
    * standard U-shape. Same journey convention as the siblings
    * (clicks ≤ 7 days before the purchase); touch order is the total
    * (ct, click_id) order; credits in exact ppm with the remainder
    * carried explicitly (n = 1 → 10⁶, n = 2 → 5·10⁵ each, n ≥ 3 →
    * 4·10⁵/4·10⁵/2·10⁵ div (n−2) per middle). First/last ids via two
    * row_numbers over ONE purchase-partitioned exchange (the
    * `ts_ohlc_daily` trick). */
  val attributionPositionBased: QDef = q(
    "attribution_position_based",
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, ts AS pt
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT event_id AS click_id, user_id, ts AS ct
      |  FROM events WHERE event_type = 'click'),
      |m AS (
      |  SELECT p.purchase_id, c.click_id, c.ct
      |  FROM p JOIN c ON p.user_id = c.user_id
      |  WHERE c.ct <= p.pt
      |    AND epoch_us(p.pt) - epoch_us(c.ct) <= 604800000000),
      |r AS (
      |  SELECT purchase_id, click_id,
      |    ROW_NUMBER() OVER (PARTITION BY purchase_id
      |      ORDER BY ct, click_id) AS rn_a,
      |    ROW_NUMBER() OVER (PARTITION BY purchase_id
      |      ORDER BY ct DESC, click_id DESC) AS rn_d,
      |    CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touch
      |  FROM m),
      |f AS (
      |  SELECT purchase_id, n_touch,
      |    MAX(CASE WHEN rn_a = 1 THEN click_id END) AS first_click_id,
      |    MAX(CASE WHEN rn_d = 1 THEN click_id END) AS last_click_id
      |  FROM r GROUP BY purchase_id, n_touch)
      |SELECT purchase_id, n_touch, first_click_id, last_click_id,
      |  CASE WHEN n_touch = 1 THEN 1000000
      |    WHEN n_touch = 2 THEN 500000 ELSE 400000 END AS first_ppm,
      |  CASE WHEN n_touch = 1 THEN 0
      |    WHEN n_touch = 2 THEN 500000 ELSE 400000 END AS last_ppm,
      |  CASE WHEN n_touch <= 2 THEN 0
      |    ELSE CAST(200000 // (n_touch - 2) AS BIGINT) END AS mid_each_ppm,
      |  CASE WHEN n_touch <= 2 THEN 0
      |    ELSE 200000 - CAST(200000 // (n_touch - 2) AS BIGINT)
      |      * (n_touch - 2) END AS remainder_ppm
      |FROM f ORDER BY purchase_id""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pt"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("ct"))
    val m = p.join(c, Seq("user_id"))
      .filter(col("ct") <= col("pt") &&
        unix_micros(col("pt")) - unix_micros(col("ct")) <= 604800000000L)
      .select(col("purchase_id"), col("click_id"), col("ct"))
    val wP = Window.partitionBy(col("purchase_id"))
    val r = m.select(col("purchase_id"), col("click_id"),
      row_number().over(wP.orderBy(col("ct"), col("click_id"))).as("rn_a"),
      row_number().over(wP.orderBy(col("ct").desc, col("click_id").desc))
        .as("rn_d"),
      count(lit(1)).over(wP).as("n_touch"))
    val f = r.groupBy(col("purchase_id"), col("n_touch"))
      .agg(max(when(col("rn_a") === 1, col("click_id"))).as("first_click_id"),
        max(when(col("rn_d") === 1, col("click_id"))).as("last_click_id"))
    f.select(col("purchase_id"), col("n_touch"), col("first_click_id"),
        col("last_click_id"),
        when(col("n_touch") === 1, 1000000).when(col("n_touch") === 2, 500000)
          .otherwise(400000).as("first_ppm"),
        when(col("n_touch") === 1, 0).when(col("n_touch") === 2, 500000)
          .otherwise(400000).as("last_ppm"),
        when(col("n_touch") <= 2, lit(0L))
          .otherwise(expr("CAST(200000 div (n_touch - 2) AS BIGINT)"))
          .as("mid_each_ppm"),
        when(col("n_touch") <= 2, lit(0L))
          .otherwise(expr("200000 - CAST(200000 div (n_touch - 2) AS BIGINT)"
            + " * (n_touch - 2)")).as("remainder_ppm"))
      .orderBy(col("purchase_id"))
  }

  /** HNSW layer-assignment plan (r17) — the graph-ANN build-planning
    * leg next to `ann_ivf_label` (flat routing) and
    * `shard_plan_from_sketch` (range layout): the md5-geometric level
    * draw (P(level ≥ L) = 16⁻ᴸ — leading zero hex chars, capped at
    * 4) assigned deterministically per vector, graded as the layer
    * census with per-layer label diversity and the cumulative
    * upper-graph size (the entry-set each search descends through).
    * One scan + a 5×5 broadcast cumulative self-join — the census IS
    * the build plan: layer ≥ 1 nodes are the long-range links whose
    * memory must be provisioned up front. */
  val annHnswLayerAssign: QDef = q(
    "ann_hnsw_layer_assign",
    s"""WITH l AS (
      |  SELECT vec_id, label, $hnswLayerSqlExpr AS layer
      |  FROM embeddings),
      |c AS (
      |  SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |    CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
      |    MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
      |  FROM l GROUP BY layer)
      |SELECT a.layer, a.n_vecs, a.n_labels, a.min_vec, a.max_vec,
      |  CAST(SUM(b.n_vecs) AS BIGINT) AS n_at_or_above
      |FROM c a JOIN c b ON b.layer >= a.layer
      |GROUP BY a.layer, a.n_vecs, a.n_labels, a.min_vec, a.max_vec
      |ORDER BY a.layer""") { (s, d) =>
    val l = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), hnswLayerCol.as("layer"))
    val c = l.groupBy(col("layer"))
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("label")).as("n_labels"),
        min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"))
    c.as("a")
      .join(broadcast(c.select(col("layer").as("b_layer"),
          col("n_vecs").as("b_n"))),
        col("b_layer") >= col("a.layer"))
      .groupBy(col("a.layer").as("layer"), col("a.n_vecs").as("n_vecs"),
        col("a.n_labels").as("n_labels"), col("a.min_vec").as("min_vec"),
        col("a.max_vec").as("max_vec"))
      .agg(sum(col("b_n")).cast(LongType).as("n_at_or_above"))
      .orderBy(col("layer"))
  }

  /** Paired t test (r17) — the within-subject complement to
    * `stats_welch_t` (independent arms): per event type, each user's
    * pre- vs post-cut (2024-01-16) mean value in floor-micro, the
    * test running on the per-user differences of users active on
    * BOTH sides. t² = (Σd)²·(n−1)/(n·Σd² − (Σd)²) — one exact
    * rational over the (possibly negative) integer d's, squares
    * ridden through DECIMAL(38)/HUGEINT, ·10⁶ floor, both degenerate
    * denominators guarded NULL. significant at the house z² bound
    * 3.841459 (df→∞). Two (type, user)-keyed aggs + a type fold. */
  val statsPairedT: QDef = q(
    "stats_paired_t",
    """WITH e AS (
      |  SELECT event_type, user_id,
      |    ts >= TIMESTAMP '2024-01-16 00:00:00' AS post,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |u AS (
      |  SELECT event_type, user_id,
      |    CAST(SUM(CASE WHEN post THEN cents ELSE 0 END) AS BIGINT) AS s_post,
      |    CAST(SUM(CASE WHEN post THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
      |    CAST(SUM(CASE WHEN post THEN 0 ELSE cents END) AS BIGINT) AS s_pre,
      |    CAST(SUM(CASE WHEN post THEN 0 ELSE 1 END) AS BIGINT) AS n_pre
      |  FROM e GROUP BY event_type, user_id),
      |dd AS (
      |  SELECT event_type,
      |    CAST(s_post * 1000000 // n_post AS BIGINT)
      |      - CAST(s_pre * 1000000 // n_pre AS BIGINT) AS dv
      |  FROM u WHERE n_post > 0 AND n_pre > 0),
      |g AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(dv) AS BIGINT) AS sd,
      |    SUM(CAST(dv AS HUGEINT) * dv) AS sdd
      |  FROM dd GROUP BY event_type)
      |SELECT event_type, n, sd AS sum_d_micro,
      |  CASE WHEN n = 0 THEN NULL ELSE sd // n END AS mean_d_micro,
      |  CASE WHEN n <= 1 OR n * sdd - CAST(sd AS HUGEINT) * sd = 0 THEN NULL
      |    ELSE CAST(CAST(sd AS HUGEINT) * sd * (n - 1) * 1000000
      |      // (n * sdd - CAST(sd AS HUGEINT) * sd) AS BIGINT) END
      |    AS t2_micro,
      |  CASE WHEN n <= 1 OR n * sdd - CAST(sd AS HUGEINT) * sd = 0 THEN NULL
      |    ELSE CAST(CAST(sd AS HUGEINT) * sd * (n - 1) * 1000000
      |      // (n * sdd - CAST(sd AS HUGEINT) * sd) AS BIGINT) > 3841459 END
      |    AS significant
      |FROM g ORDER BY event_type""") { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        (col("ts") >= lit("2024-01-16 00:00:00").cast(TimestampType))
          .as("post"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
    val u = e.groupBy(col("event_type"), col("user_id"))
      .agg(sum(when(col("post"), col("cents")).otherwise(0L)).as("s_post"),
        sum(when(col("post"), 1L).otherwise(0L)).as("n_post"),
        sum(when(col("post"), 0L).otherwise(col("cents"))).as("s_pre"),
        sum(when(col("post"), 0L).otherwise(1L)).as("n_pre"))
    val dd = u.filter(col("n_post") > 0 && col("n_pre") > 0)
      .select(col("event_type"),
        (expr("CAST(s_post * 1000000 div n_post AS BIGINT)")
          - expr("CAST(s_pre * 1000000 div n_pre AS BIGINT)")).as("dv"))
    val g = dd.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("dv")).as("sd"),
        sum(expr("CAST(dv AS DECIMAL(38,0)) * dv")).as("sdd"))
    g.select(col("event_type"), col("n"), col("sd").as("sum_d_micro"),
        expr("CASE WHEN n = 0 THEN NULL ELSE sd div n END")
          .as("mean_d_micro"),
        expr("CASE WHEN n <= 1 OR n * sdd - CAST(sd AS DECIMAL(38,0)) * sd"
          + " = 0 THEN NULL"
          + " ELSE CAST(CAST(sd AS DECIMAL(38,0)) * sd * (n - 1) * 1000000"
          + " div (n * sdd - CAST(sd AS DECIMAL(38,0)) * sd) AS BIGINT) END")
          .as("t2_micro"))
      .withColumn("significant", col("t2_micro") > 3841459L)
      .orderBy(col("event_type"))
  }

  /** 20-bit van der Corput radical inverse (bit reversal) — ONE
    * rendering of the math, two spellings (Spark has shiftright(),
    * DuckDB the >> operator), generated from the same loop so they
    * cannot drift. */
  private def vdcSql(shift: (String, Int) => String): String =
    (0 until 20).map(i =>
      s"(${shift("doc_id", i)} & 1) * ${1L << (19 - i)}").mkString(" + ")

  /** Quasi-random (low-discrepancy) sampling audit (r17) — the QMC
    * alternative to the house md5 draws: the 20-bit van der Corput
    * radical inverse of doc_id (bit reversal — exact integer
    * arithmetic, zero hashing) selects a 25% sample with provably
    * balanced coverage over any id range WITHIN each 2^20-id block
    * (the inverse reverses the low 20 bits only, so the balance
    * guarantee is per-block for corpora past 2^20 docs — widen the
    * reversal before relying on it beyond that; ADVICE r17), next
    * to the md5 25% sample
    * (first hex char <= '3') on the same corpus. Graded per source:
    * both sample sizes, their overlap, and the absolute deviation of
    * each from the exact 25% target in ppm — the discrepancy
    * comparison that decides which selector a curriculum sampler
    * uses. Row-local selectors, one source-sized agg. */
  val sampleHaltonVdc: QDef = q(
    "sample_halton_vdc",
    s"""WITH s AS (
      |  SELECT source,
      |    CASE WHEN ${vdcSql((c, i) => s"($c >> $i)")} < 262144
      |      THEN 1 ELSE 0 END AS vdc_pick,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '3'
      |      THEN 1 ELSE 0 END AS md5_pick
      |  FROM documents)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(vdc_pick) AS BIGINT) AS n_vdc,
      |  CAST(SUM(md5_pick) AS BIGINT) AS n_md5,
      |  CAST(SUM(vdc_pick * md5_pick) AS BIGINT) AS n_both,
      |  abs(CAST(SUM(vdc_pick) * 1000000 // COUNT(*) AS BIGINT) - 250000)
      |    AS vdc_dev_ppm,
      |  abs(CAST(SUM(md5_pick) * 1000000 // COUNT(*) AS BIGINT) - 250000)
      |    AS md5_dev_ppm
      |FROM s GROUP BY source ORDER BY source""") { (s, d) =>
    val sel = Tables.documents(s, d)
      .select(col("source"),
        when(expr(vdcSql((c, i) => s"shiftright($c, $i)")) < 262144, 1L)
          .otherwise(0L).as("vdc_pick"),
        when(substring(md5(col("doc_id").cast(StringType)), 1, 1) <= "3",
          1L).otherwise(0L).as("md5_pick"))
    sel.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("vdc_pick")).as("n_vdc"),
        sum(col("md5_pick")).as("n_md5"),
        sum(col("vdc_pick") * col("md5_pick")).as("n_both"))
      .select(col("source"), col("n_docs"), col("n_vdc"), col("n_md5"),
        col("n_both"),
        abs(expr("CAST(n_vdc * 1000000 div n_docs AS BIGINT)") - 250000L)
          .as("vdc_dev_ppm"),
        abs(expr("CAST(n_md5 * 1000000 div n_docs AS BIGINT)") - 250000L)
          .as("md5_dev_ppm"))
      .orderBy(col("source"))
  }

  /** Cohen's d effect size (r17) — the magnitude companion to
    * `stats_welch_t`'s significance (a 100 TB A/B readout needs both:
    * at scale everything is significant, only effect size decides):
    * purchase vs click cents, pooled SD from the same exact
    * (n, Σx, Σx²) sums, d = Δmean/s_pooled as the one float chain
    * (divisions + one sqrt, correctly rounded ⇒ cross-engine
    * bit-identical), ROUND(…,6), n ≤ 1 legs guarded NULL. One
    * 2-group agg + a 1-row fold. */
  val statsCohensD: QDef = q(
    "stats_cohens_d",
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
      |  FROM g)
      |SELECT n1, n2,
      |  CAST(s1 * 1000000 // n1 - s2 * 1000000 // n2 AS BIGINT)
      |    AS mean_diff_micro,
      |  CASE WHEN n1 <= 1 OR n2 <= 1 THEN NULL ELSE
      |    ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |        - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
      |      / sqrt(((CAST(q1 AS DOUBLE)
      |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
      |        + (CAST(q2 AS DOUBLE)
      |          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
      |        / CAST(n1 + n2 - 2 AS DOUBLE)), 6) END AS cohens_d
      |FROM w""") { (s, d) =>
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
    w.select(col("n1"), col("n2"),
      expr("CAST(s1 * 1000000 div n1 - s2 * 1000000 div n2 AS BIGINT)")
        .as("mean_diff_micro"),
      when(col("n1") <= 1 || col("n2") <= 1, lit(null).cast(DoubleType))
        .otherwise(round(
          (col("s1").cast(DoubleType) / col("n1").cast(DoubleType)
            - col("s2").cast(DoubleType) / col("n2").cast(DoubleType))
          / sqrt(((col("q1").cast(DoubleType)
              - col("s1").cast(DoubleType) * col("s1").cast(DoubleType)
                / col("n1").cast(DoubleType))
            + (col("q2").cast(DoubleType)
              - col("s2").cast(DoubleType) * col("s2").cast(DoubleType)
                / col("n2").cast(DoubleType)))
            / (col("n1") + col("n2") - 2).cast(DoubleType)), 6))
        .as("cohens_d"))
  }

  /** Chinchilla compute-allocation plan (r17) — the training-run
    * sizing question a data pipeline answers before curation targets
    * are set: for each compute budget C (petaFLOP units in a literal
    * table), the compute-optimal parameter count N = sqrt(C/120)
    * (from C ≈ 6·N·D with the D = 20·N optimum) and token demand
    * D = 20·N, against the corpus's ACTUAL token supply — coverage
    * in floor-ppm and the epoch count (ceil) the corpus would need.
    * One corpus token-count agg + a 3-row broadcast budget table;
    * the sqrt chain runs on identical doubles in both engines, then
    * everything is exact integers. */
  val mixChinchillaPlan: QDef = q(
    "mix_chinchilla_plan",
    """WITH t AS (
      |  SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |    AS corpus_tokens
      |  FROM documents),
      |b AS (SELECT CAST(pf AS BIGINT) AS budget_pflops
      |  FROM (VALUES (1000), (1000000), (1000000000)) v(pf)),
      |p AS (
      |  SELECT budget_pflops, corpus_tokens,
      |    CAST(floor(sqrt(CAST(budget_pflops AS DOUBLE) * 1e15 / 120.0))
      |      AS BIGINT) AS n_opt_params
      |  FROM b CROSS JOIN t)
      |SELECT budget_pflops, n_opt_params,
      |  20 * n_opt_params AS d_opt_tokens, corpus_tokens,
      |  CAST((20 * n_opt_params + corpus_tokens - 1) // corpus_tokens
      |    AS BIGINT) AS epochs_needed,
      |  CASE WHEN corpus_tokens >= 20 * n_opt_params THEN 1000000
      |    ELSE CAST(corpus_tokens * 1000000 // (20 * n_opt_params)
      |      AS BIGINT) END AS coverage_ppm
      |FROM p ORDER BY budget_pflops""") { (s, d) =>
    val t = Tables.documents(s, d)
      .agg(sum(size(split(col("text"), " "))).cast(LongType)
        .as("corpus_tokens"))
    val b = {
      import s.implicits._
      Seq(1000L, 1000000L, 1000000000L).toDF("budget_pflops")
    }
    val p = b.crossJoin(broadcast(t))
      .withColumn("n_opt_params",
        floor(sqrt(col("budget_pflops").cast(DoubleType) * lit(1e15)
          / lit(120.0))).cast(LongType))
    p.select(col("budget_pflops"), col("n_opt_params"),
        (lit(20L) * col("n_opt_params")).as("d_opt_tokens"),
        col("corpus_tokens"),
        expr("CAST((20 * n_opt_params + corpus_tokens - 1)"
          + " div corpus_tokens AS BIGINT)").as("epochs_needed"),
        expr("CASE WHEN corpus_tokens >= 20 * n_opt_params THEN 1000000"
          + " ELSE CAST(corpus_tokens * 1000000 div (20 * n_opt_params)"
          + " AS BIGINT) END").as("coverage_ppm"))
      .orderBy(col("budget_pflops"))
  }

  /** Label-centroid distance matrix (r17) — the embedding-space
    * geometry report over the `sim_centroid_classifier` centroids
    * (same milli quantization, same sign-safe floor means): exact
    * integer L2² between every label-centroid pair (a < b) plus its
    * floor-sqrt in milli units — the confusability map an embedding
    * owner reads next to `eval_langid_confusion` (which labels are
    * too close for the classifier to separate). The matrix is
    * labels², computed from the labels×dims centroid table —
    * constant-size at any corpus scale. */
  val simCentroidDistanceMatrix: QDef = q(
    "sim_centroid_distance_matrix",
    """WITH comp AS (
      |  SELECT vec_id, label, t.pos AS pos,
      |    CAST(floor(CAST(embedding[t.pos] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      |      AS milli
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(pos)),
      |cent AS (
      |  SELECT label, pos, (s - ((s % n) + n) % n) // n AS c
      |  FROM (SELECT label, pos, CAST(SUM(milli) AS BIGINT) AS s,
      |          CAST(COUNT(*) AS BIGINT) AS n
      |        FROM comp GROUP BY label, pos) sums)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2_milli,
      |  CAST(floor(sqrt(CAST(SUM((a.c - b.c) * (a.c - b.c)) AS DOUBLE)))
      |    AS BIGINT) AS dist_milli
      |FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
      |GROUP BY a.label, b.label
      |ORDER BY label_a, label_b""") { (s, d) =>
    val comp = Tables.embeddings(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        floor(col("x").cast(DoubleType) * 1000 + 0.5).cast(LongType)
          .as("milli"))
    val cent = comp.groupBy(col("label"), col("pos"))
      .agg(sum(col("milli")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), expr("(s - pmod(s, n)) div n").as("c"))
    cent.as("a")
      .join(broadcast(cent.select(col("label").as("b_label"),
          col("pos").as("b_pos"), col("c").as("b_c"))),
        col("a.pos") === col("b_pos") && col("a.label") < col("b_label"))
      .groupBy(col("a.label").as("label_a"), col("b_label").as("label_b"))
      .agg(sum((col("c") - col("b_c")) * (col("c") - col("b_c")))
        .as("d2_milli"))
      .select(col("label_a"), col("label_b"), col("d2_milli"),
        floor(sqrt(col("d2_milli").cast(DoubleType))).cast(LongType)
          .as("dist_milli"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val all: Seq[QDef] = Seq(
    dedupSignatureStoreRoundtrip, evalRrfFusion, evalAucRoc, evalMapAtK,
    statsWilsonCi, abDiffInDiff, winBollingerBands, tsChangepointSplit,
    graphBipartiteTwohop, graphCutConductance, dedupMinhashBbit,
    textKneserNeyBigram, fnBinaryCodecs, shardSaltPlan, privacyTCloseness,
    statsBootstrapCi, simFilteredTopk, attributionPositionBased,
    annHnswLayerAssign, statsPairedT, sampleHaltonVdc, statsCohensD,
    mixChinchillaPlan, simCentroidDistanceMatrix)
}
