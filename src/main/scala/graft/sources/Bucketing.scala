package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: the co-located-join strategy for fact⋈fact joins
  * that are too big to broadcast (SURVEY §4 "partitioning & shuffle").
  *
  * Writing both sides bucketed (and sorted) on the join key means a
  * later join needs NO shuffle exchange at any scale — each bucket
  * pair joins locally. On a 100 TB lake this converts the dominant
  * repeated shuffle (fact⋈fact on orderkey) into a one-time layout
  * cost amortized over every downstream query. BucketingSpec asserts
  * the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog.
    *
    * The pre-repartition on the bucket key matters twice over: it
    * parallelizes the write (a single-partition upstream — e.g. a
    * one-file scan — would otherwise sort and write EVERY bucket in
    * one task), and it makes each task own exactly one bucket, so the
    * table lands as one file per bucket instead of
    * upstream-partitions × buckets fragments. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two tables previously bucketed on `leftKey`/`rightKey` —
    * planner sees compatible hash distributions and skips both
    * exchanges. */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
