package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior of the r6 composition libraries — empty
  * edge lists, empty build sides, k larger than the corpus. Iterative
  * loops and broadcast builders are exactly where empties break. */
class PipelineEdgeCasesSpec extends SparkSpec with graft.SerialSuite {

  private val sf = "/root/testdata/sf0.001"

  test("ConnectedComponents on an empty pair set returns no rows (and terminates)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    try assert(ConnectedComponents.largeStarSmallStar(spark, empty).count() == 0)
    finally spark.catalog.clearCache()
  }

  test("BloomJoin with an empty build side yields an empty join") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"))
    val emptyDim = spark.read.parquet(s"$sf/customer.parquet")
      .filter(lit(false))
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val (joined, release) = BloomJoin.prefilteredJoinManaged(
      orders, emptyDim, "o_custkey", expectedKeys = 10)
    try assert(joined.count() == 0)
    finally release()
  }

  test("SimSearch k larger than the corpus returns the whole corpus ranked") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") =!= 0).limit(5)
    val query = emb.filter(col("vec_id") === 0)
    val got = SimSearch.topkExact(corpus, query, k = 100).collect()
    assert(got.length == 5)
    val sims = got.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("SimSearch IVF with nProbe above the bucket count degrades to exact") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") =!= 0)
    val query = emb.filter(col("vec_id") === 0)
    val exact = SimSearch.topkExact(corpus, query, 10)
      .collect().map(_.getLong(0)).toSeq
    val over = SimSearch.topkIvf(corpus, query, 10, nProbe = 1000)
      .collect().map(_.getLong(0)).toSeq
    assert(over == exact)
  }
}
