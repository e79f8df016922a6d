package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-16 batch, checked by FULL
  * driver-side recomputation at sf0.001 — independent of the DuckDB
  * oracle: the incremental cluster maintenance is replayed with a
  * plain scala union-find (both the prior map and the folded final
  * map), and the key's output is additionally pinned row-for-row
  * against the graded from-scratch `dedup_cluster_cc` operator — the
  * merge == full-recompute equality the key exists to certify. */
class R16OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def isPrior(id: Long): Boolean = md5hex(id.toString).charAt(0) <= '7'

  /** Plain sequential union-find with min-id roots — the ground-truth
    * CC implementation nothing in the product shares code with. */
  private def unionFind(nodes: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    nodes.map(n => n -> find(n)).toMap
  }

  private lazy val pairs: Seq[(Long, Long)] =
    LlmExtras.minhashPairs(spark, sf).select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private lazy val docIds: Seq[Long] =
    Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq

  test("r16 keys are partition-count invariant (the 100 TB correctness property)") {
    def results(parts: Int): Map[String, Seq[String]] = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
      R16Ops.all.map(_.key).map { k =>
        k -> graft.SparkEntry.queries(k)(s2, sf).collect()
          .map(_.toString).toSeq.sorted
      }.toMap
    }
    val a = results(3); val b = results(17)
    a.keys.foreach { k =>
      assert(a(k) == b(k), s"$k: result depends on the shuffle partition count")
      assert(a(k).nonEmpty, s"$k: empty result cannot certify anything")
    }
  }

  test("dedup_cluster_incremental: union-find replay of BOTH maps " +
      "(prior + folded) matches every output column") {
    val rows = graft.SparkEntry.queries("dedup_cluster_incremental")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5)))
    assert(rows.length == docIds.length, "one row per corpus doc")
    // ground truth: full-graph CC and prior-graph CC, both union-find
    val full = unionFind(docIds, pairs)
    val priorDocs = docIds.filter(isPrior)
    val prior = unionFind(priorDocs,
      pairs.filter { case (a, b) => isPrior(a) && isPrior(b) })
    val sizes = full.values.groupBy(identity).map { case (k, v) => k -> v.size }
    // the increment must actually exercise the maintenance path: at
    // least one cluster merging prior and increment docs
    assert(rows.exists { case (id, cl, sz, wp, _, _) => wp == 1 && sz > 1 &&
      rows.exists { case (id2, cl2, _, wp2, _, _) =>
        cl2 == cl && wp2 == 0 && id2 != id } },
      "fixture carries no prior+increment mixed cluster — nothing certified")
    rows.foreach { case (id, cl, sz, wp, pcl, rel) =>
      assert(cl == full(id), s"doc $id: cluster_id $cl != union-find ${full(id)}")
      assert(sz == sizes(full(id)).toLong, s"doc $id: cluster_size")
      assert((wp == 1) == isPrior(id), s"doc $id: was_prior")
      if (isPrior(id))
        assert(pcl.contains(prior(id)), s"doc $id: prior_cluster_id")
      else assert(pcl.isEmpty, s"doc $id: increment doc must have NULL prior root")
      assert((rel == 1) == (isPrior(id) && prior(id) != full(id)),
        s"doc $id: relabeled flag")
    }
  }

  test("dedup_cluster_incremental == dedup_cluster_cc on the shared columns " +
      "(merge equals from-scratch recompute)") {
    val inc = graft.SparkEntry.queries("dedup_cluster_incremental")(spark, sf)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .collect().map(_.toString).sorted
    val scratch = graft.SparkEntry.queries("dedup_cluster_cc")(spark, sf)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .collect().map(_.toString).sorted
    assert(inc.sameElements(scratch),
      "incremental maintenance diverged from the from-scratch CC operator")
  }
}
