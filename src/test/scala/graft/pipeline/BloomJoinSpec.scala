package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom pre-filtered join: result-identical to the plain join, and
  * the pre-filter actually discards the non-matching probe mass. */
class BloomJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pre-filtered join returns exactly the plain join's rows") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    // a selective build side: ~4% of customers
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") % 25 === 0)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(dim, Seq("o_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"))
      .collect().map(_.toString).sorted.toSeq
    val bloomed = BloomJoin.prefilteredJoin(orders, dim, "o_custkey",
        expectedKeys = 1000, fpp = 0.01)
      .select(col("o_orderkey"), col("c_mktsegment"))
      .collect().map(_.toString).sorted.toSeq
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("the bloom filter discards most non-matching probe rows pre-join") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"))
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") % 25 === 0)
      .select(col("c_custkey"))
    val bloom = dim.stat.bloomFilter("c_custkey", 1000, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    val kept = orders.filter(mightContain(col("o_custkey"))).count()
    val total = orders.count()
    val trueMatch = orders.join(dim,
      orders("o_custkey") === dim("c_custkey"), "leftsemi").count()
    // kept ∈ [trueMatch, trueMatch + fpp-slack of the rest]
    assert(kept >= trueMatch)
    assert(kept <= trueMatch + math.ceil((total - trueMatch) * 0.05).toLong,
      s"bloom kept $kept of $total (true matches $trueMatch) — fpp way above spec")
  }
}
