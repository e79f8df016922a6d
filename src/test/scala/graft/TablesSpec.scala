package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The fixture-reader contract (Tables.expectedSchemas) — the seam
  * that broke in round 9, when the driver regenerated the fixtures
  * with `events.ts` as timestamp[us] while the reader still assumed
  * the ns-long generation and 23 graded queries failed analysis.
  * Pins (a) every reader's guaranteed output schema against the live
  * fixtures, and (b) the events normalization producing identical
  * session-UTC µs timestamps from every ts encoding the fixtures
  * have ever shipped. */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every fixture reader delivers its guaranteed schema") {
    val mismatches = Tables.schemaMismatches(spark, sf)
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }

  test("events reader normalizes every fixture ts generation identically") {
    import spark.implicits._
    // Two rows with sub-second µs precision (the second one exercises
    // the exact ns→µs floor-div against a non-zero fractional part).
    val base = Seq(
      (1L, 1704067200000000L, 7L, "click", 1.5, "{}"),
      (2L, 1704070800123456L, 8L, "view", 2.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    def writeGen(ts: org.apache.spark.sql.Column): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-events").toString
      base.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
      d
    }
    val generations = Seq(
      // pre-r9: parquet TIMESTAMP(NANOS), which arrives as a ns LONG
      // under nanosAsLong=true — a plain long column hits the same
      // reader branch.
      "ns-long" -> writeGen(col("us") * 1000),
      // r9+: timestamp[us] without timezone → read as TIMESTAMP_NTZ.
      "ntz-us" -> writeGen(timestamp_micros(col("us")).cast("timestamp_ntz")),
      // defensive: a UTC-adjusted µs timestamp passes through as-is.
      "ltz-us" -> writeGen(timestamp_micros(col("us"))))
    val out = generations.map { case (gen, d) =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType,
        s"$gen: reader output ts as ${df.schema("ts").dataType}, not timestamp")
      gen -> df.select("event_id", "ts").orderBy("event_id").collect().toSeq
    }
    assert(out.map(_._2).distinct.size == 1,
      "generations disagree:\n" +
        out.map { case (g, rows) => s"$g: ${rows.mkString(", ")}" }.mkString("\n"))
    // And the values are the literal µs instants, not shifted by tz.
    assert(out.head._2.map(_.getTimestamp(1).getTime) == Seq(1704067200000L, 1704070800123L))
  }
}
