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

  /** Distributed min-label connected components over a SYMMETRIC
    * (src, dst) edge list — the `dedup_cluster_cc` loop (neighbor-min
    * half-round + pointer jump, O(log diameter) rounds, convergence
    * probed per round and failed loudly at 50) extracted generic so
    * `dedup_cluster_incremental` can run it twice: once over the
    * prior-prior edges (the "stored map" stand-in) and once over the
    * CONTRACTED increment graph. Caller must pass a persisted,
    * materialized edge DataFrame; the helper re-roots it as an
    * RDD-backed scan (plan truncation — each round would otherwise
    * re-analyze the whole upstream pipeline) and returns the
    * persisted (id, lbl) fixpoint over edge-touched nodes. The
    * run_tag nonce keeps concurrent executions' cache entries
    * private (the dedup_cluster_cc precedent, r13). */
  private def minLabelCC(s: SparkSession, edgesIn: DataFrame): DataFrame = {
    val edges = s.createDataFrame(edgesIn.rdd, edgesIn.schema)
    val runTag = scala.util.Random.nextInt()
    val nm0 = edges.groupBy(col("dst")).agg(min(col("src")).as("nm"))
    // seed with the first neighbor-min folded in: for shallow
    // components (pairs, small stars) the seed IS the fixpoint
    var labels = edges.select(col("src").as("id")).distinct()
      .join(nm0, col("id") === col("dst"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("nm"), col("id"))).as("lbl"),
        lit(runTag).as("run_tag"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cached = labels
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val neighborMin = edges.join(labels, edges("src") === labels("id"))
        .groupBy("dst").agg(min("lbl").as("nmin"))
      val m = labels.alias("l")
        .join(neighborMin, col("l.id") === col("dst"), "left")
        .select(col("l.id").as("id"),
          least(col("l.lbl"), coalesce(col("nmin"), col("l.lbl"))).as("m"),
          col("l.lbl").as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = m.filter(col("m") < col("prev")).count()
      if (changed == 0) {
        // fixpoint proven by neighbor-min alone (symmetric edges)
        m.unpersist()
      } else {
        // pointer jump: lbl(v) <- lbl(lbl(v)) — turns O(diameter)
        // rounds into O(log diameter)
        val joined = m.alias("x")
          .join(m.select(col("id").as("jid"), col("m").as("jm")).alias("y"),
            col("x.m") === col("jid"), "left")
          .select(col("x.id").as("id"),
            least(col("x.m"), coalesce(col("jm"), col("x.m"))).as("lbl"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        joined.count()
        m.unpersist()
        cached.unpersist()
        cached = joined
        labels = joined
      }
      rounds += 1
    }
    if (changed > 0)
      sys.error(s"minLabelCC: not converged after $rounds rounds " +
        s"($changed labels still changing)")
    labels.select(col("id"), col("lbl"))
  }

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
      val pmap = minLabelCC(s, pe)
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
      val upd = minLabelCC(s, ce)
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

  /** All round-16 graded queries, in registry order. */
  val all: Seq[QDef] = Seq(
    dedupClusterIncremental)
}
