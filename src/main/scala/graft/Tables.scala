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
  /** `events.ts` has shipped in two fixture generations: parquet
    * TIMESTAMP(NANOS) (which Spark 4 refuses to read natively —
    * PARQUET_TYPE_ILLEGAL — so it arrives as a nanosecond LONG under
    * `nanosAsLong=true`) and, since the round-9 regeneration, plain
    * timestamp[us]. Branch on the footer type instead of assuming one
    * generation: a LONG gets the exact ns→µs rebuild (integer
    * floor-div), a timestamp passes through (NTZ normalized to the
    * session-UTC TimestampType every downstream query and
    * `expectedSchemas` were written against). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported fixture type $other (expected ns-long, " +
          "timestamp, or timestamp_ntz)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Register every fixture table as a temp view so any operator is
    * also reachable through plain Spark SQL (SURVEY.md §3 entry B).
    * Uses the normalizing readers (events needs the ns-timestamp
    * rebuild), not raw parquet reads. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => readers(n)(spark, sfDir).createOrReplaceTempView(n))

  /** Expected reader-output schemas (name -> catalog type string),
    * i.e. what this module GUARANTEES to callers after normalization
    * (events.ts is already the µs timestamp). SURVEY §7's
    * "schema-checked readers": drift in the fixture layout fails
    * loudly here instead of deep inside a query. */
  val expectedSchemas: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  private val readers: Map[String, (SparkSession, String) => DataFrame] =
    names.map(n => n -> (if (n == "events") events _ else
      (s: SparkSession, d: String) => t(s, d, n))).toMap

  /** All (table, field) deviations from the guaranteed schemas. */
  def schemaMismatches(spark: SparkSession, sfDir: String): Seq[String] =
    names.flatMap { n =>
      val actual = readers(n)(spark, sfDir).schema
        .map(f => f.name -> f.dataType.simpleString)
      if (actual == expectedSchemas(n)) Nil
      else Seq(s"$n: expected ${expectedSchemas(n)} got $actual")
    }
}
