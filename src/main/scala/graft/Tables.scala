package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-stable readers for the driver-generated fixture tables
  * (FIXTURES.md). One parquet file per table under `$sfDir/`.
  *
  * Schemas are always taken from the parquet footer — never inferred —
  * so plans are deterministic across runs and scale factors
  * (SURVEY.md §1.3). At 100 TB each of these becomes a multi-file
  * (or partitioned) directory scan; `spark.read.parquet` handles both
  * shapes identically, and all pruning/pushdown flows from Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively (PARQUET_TYPE_ILLEGAL). Read it as a raw nanosecond
    * LONG and truncate to a µs timestamp (integer floor-div — exact,
    * deterministic). Raw `ts` still must never be output (SURVEY D4):
    * DuckDB keeps ns, so only second-or-coarser truncations match. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Register every fixture table as a temp view so any operator is
    * also reachable through plain Spark SQL (SURVEY.md §3 entry B). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
