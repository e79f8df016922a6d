package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The auto-switching similarity-search composition layer (VERDICT r5
  * item 8). The graded registry freezes the two strategies as
  * separate oracle-checked queries; this spec covers the switch and
  * the strategy equivalences on the embeddings fixture. */
class SimSearchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def corpus = emb.filter(col("vec_id") =!= 0)
  private def query = emb.filter(col("vec_id") === 0)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("mode choice is the documented threshold rule") {
    assert(SimSearch.chooseMode(999, 1000) == "exact")
    assert(SimSearch.chooseMode(1000, 1000) == "ivf")
  }

  test("probing every bucket makes IVF exactly the brute-force result") {
    val nBuckets = corpus.select(col("label")).distinct().count().toInt
    val exact = ids(SimSearch.topkExact(corpus, query, 10))
    val ivfAll = ids(SimSearch.topkIvf(corpus, query, 10, nProbe = nBuckets))
    assert(exact.size == 10)
    assert(ivfAll == exact)
  }

  test("nProbe=1 scans only the routed bucket, ordered by similarity") {
    val (df, mode) = SimSearch.topk(corpus, query, 5, mode = "ivf", nProbe = 1)
    assert(mode == "ivf")
    val rows = df.collect()
    assert(rows.length == 5)
    // every hit comes from one bucket — the routed one
    val hitIds = rows.map(_.getLong(0)).toSet
    val buckets = corpus.filter(col("vec_id").isin(hitIds.toSeq: _*))
      .select(col("label")).distinct().collect()
      .map(_.getAs[Number](0).longValue).toSeq
    assert(buckets.size == 1, s"expected one probed bucket, got $buckets")
    val sims = rows.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("auto mode switches on corpus cardinality") {
    val (exactDf, m1) = SimSearch.topk(corpus, query, 10, ivfThreshold = Long.MaxValue)
    assert(m1 == "exact")
    val (ivfDf, m2) = SimSearch.topk(corpus, query, 10, ivfThreshold = 1)
    assert(m2 == "ivf")
    // both paths return k rows; the exact path matches topkExact
    assert(ids(exactDf) == ids(SimSearch.topkExact(corpus, query, 10)))
    assert(ivfDf.count() == 10)
  }
}
