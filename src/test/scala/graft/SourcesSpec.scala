package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** File source/sink surface (SURVEY §2.1 "engine surface, not
  * graded"): CSV/JSON reads with EXPLICIT schemas (inference is
  * banned in graded paths), parquet round trips, partitioned writes
  * with partition-pruned read-back. */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv round trip with explicit schema (no inference)") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    df.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val back = spark.read.schema(schema).option("header", "true").csv(s"$tmp/csv")
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("json lines round trip with explicit schema") {
    import spark.implicits._
    val df = Seq((1L, "x", 0.5)).toDF("id", "name", "score")
    df.write.mode("overwrite").json(s"$tmp/json")
    val back = spark.read.schema(schema).json(s"$tmp/json")
    assert(back.schema == schema && back.count() == 1)
  }

  test("partitioned parquet write prunes partitions on read") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"k${i % 4}", i * 1.0))
      .toDF("id", "part_key", "score")
    df.write.mode("overwrite").partitionBy("part_key").parquet(s"$tmp/part")
    val pruned = spark.read.parquet(s"$tmp/part").filter(col("part_key") === "k1")
    assert(pruned.count() == 25)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not survive as a post-filter
    assert(plan.contains("PartitionFilters") || !plan.contains("Filter ("),
      s"partition pruning missing in plan:\n$plan")
  }

  test("predicate and projection push down to the parquet scan") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampType))
      .select("l_orderkey", "l_quantity")
    val scan = li.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double"),
      s"projection not pruned:\n$scan")
  }

  test("orc round trip preserves schema and values") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    df.write.mode("overwrite").orc(s"$tmp/orc")
    val back = spark.read.orc(s"$tmp/orc")
    // ORC round trips relax nullability — names and types must hold
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("parquet file-stream source replays a directory as a stream") {
    import spark.implicits._
    val dir = s"$tmp/filestream"
    val df = (0 until 20).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    df.write.mode("overwrite").parquet(dir)
    val stream = graft.streaming.StreamOps.readParquetStream(spark, dir, df)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("fs_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("fs_sink").count() == 20)
  }

  test("parquet sink preserves decimal aggregation results exactly") {
    val out = ops.Aggregates.q1PricingSummary.run(spark, "/root/testdata/sf0.001")
    out.write.mode("overwrite").parquet(s"$tmp/q1")
    val back = spark.read.parquet(s"$tmp/q1")
    assert(back.orderBy("l_returnflag", "l_linestatus").collect().toSeq ==
      out.orderBy("l_returnflag", "l_linestatus").collect().toSeq)
  }
}
