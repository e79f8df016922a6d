package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster assignment: the step a real dedup pipeline runs
  * AFTER pairwise near-dup detection. Pairs only say "a looks like b";
  * to actually drop duplicates you need connected components — the
  * transitive closure of the pair relation — and one survivor per
  * component.
  *
  * Implementation is Pregel-style minimum-label propagation: every doc
  * starts labeled with its own id, and each round every node takes the
  * min of its own label and its neighbors' labels, until a fixpoint.
  * Rounds needed = the component diameter (near-dup clusters are
  * shallow: a handful of rounds), and each round is one shuffle of the
  * (tiny, pairs-sized) edge list against the label table — no
  * quadratic work, no driver-side graph. At 100 TB the same loop holds
  * (labels and edges both hash-partition on id); if components ever get
  * deep, the known upgrade is the alternating large-star/small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"), which converges in O(log n) rounds with the same
  * join-shape per round.
  */
object ClusterOps {

  /** Connected components over the `dedup_minhash_lsh` verified pairs
    * (jaccard ≥ 0.5), extended to every document (non-duplicated docs
    * are their own singleton cluster). Output is the full dedup map:
    * doc -> cluster id (min doc_id in the component), cluster size, and
    * whether the doc is the canonical survivor. The oracle re-derives
    * the same components with a recursive CTE over the identical pair
    * query, so transitivity itself is cross-checked, not just the
    * pair list. */
  val dedupClusterCc: QDef = q(
    "dedup_cluster_cc",
    s"""WITH RECURSIVE pairs AS (
       |${LlmExtras.dedupMinhashLsh.oracle.get}
       |),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs),
       |reach(id, root) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
       |cc AS (SELECT id AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY id)
       |SELECT doc_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  CAST(doc_id = cluster_id AS INT) AS is_survivor
       |FROM cc
       |ORDER BY doc_id""") { (s, d) =>
    // Edge list = the graded near-dup query's own output, symmetrized.
    // Persisted: every propagation round joins against it.
    val pairs = LlmExtras.dedupMinhashLsh.run(s, d)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("doc_id").as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Min-label propagation to fixpoint. The driver-side loop holds
    // only the iteration COUNTER — all data stays distributed; the
    // convergence probe is one count() per round. Labels only ever
    // decrease, so `lbl < prev` is the exact changed-set.
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val viaNeighbors = edges
        .join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.select(col("id"), col("lbl"))
        .union(viaNeighbors)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next
        .join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") < col("prev"))
        .count()
      labels.unpersist()
      labels = next
      rounds += 1
    }
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_size"),
        (col("id") === col("lbl")).cast("int").as("is_survivor"))
      .orderBy("doc_id")
  }

  val all: Seq[QDef] = Seq(dedupClusterCc)
}
