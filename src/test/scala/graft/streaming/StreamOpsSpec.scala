package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming correctness per SURVEY.md §5.3: MemoryStream injection of
  * in-order, out-of-order and late rows — the only correctness cover
  * for the streaming execution path (batch twins are oracle-graded).
  */
case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamOpsSpec extends SparkSpec {
  import StreamOps._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:$sec%02d")

  private def runToCompletion[T](
      stream: MemoryStream[T],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      batches: Seq[Seq[T]],
      sink: String): org.apache.spark.sql.DataFrame = {
    val q = build(stream.toDF())
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(sink)
  }

  test("tumbling window counts include out-of-order rows within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = runToCompletion[Ev](
      mem,
      df => tumblingCounts(df, "10 minutes"),
      Seq(
        Seq(Ev(ts(5), 1, "click", 1.0), Ev(ts(61), 1, "click", 1.0)), // advances watermark to 00:51
        Seq(Ev(ts(55), 1, "click", 1.0)),  // out-of-order but >= watermark: counted
        Seq(Ev(ts(200), 1, "click", 1.0)), // push watermark far ahead → close all
        Seq(Ev(ts(300), 1, "click", 1.0))),
      "tumbling_sink")
    val hour0 = out.filter(col("w_start") === ts(0)).select("n").collect()
    assert(hour0.map(_.getLong(0)).toSeq == Seq(2), "00:05 and 00:55 both belong to hour 0")
  }

  test("late rows beyond the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = runToCompletion[Ev](
      mem,
      df => tumblingCounts(df, "10 minutes"),
      Seq(
        Seq(Ev(ts(5), 1, "click", 1.0)),
        Seq(Ev(ts(200), 1, "click", 1.0)), // watermark → 03:10, hour-0 window closed
        Seq(Ev(ts(7), 1, "click", 1.0)),   // LATE: beyond watermark, must be dropped
        Seq(Ev(ts(400), 1, "click", 1.0))),
      "late_sink")
    val hour0 = out.filter(col("w_start") === ts(0)).select("n").collect()
    assert(hour0.map(_.getLong(0)).toSeq == Seq(1), "late 00:07 row must not re-open hour 0")
  }

  test("streaming dedup keeps one row per (user, type, minute) across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = runToCompletion[Ev](
      mem,
      df => dedupKeyed(df, "10 minutes"),
      Seq(
        Seq(Ev(ts(1, 10), 7, "view", 1.0), Ev(ts(1, 40), 7, "view", 2.0)), // same minute: dedup
        Seq(Ev(ts(1, 50), 7, "view", 3.0)),  // same minute, later batch: still dup
        Seq(Ev(ts(2, 0), 7, "view", 4.0))),  // new minute: kept
      "dedup_sink")
    assert(out.count() == 2)
  }

  test("custom flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val q = customSessions(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_sink")
      .outputMode("append").start()
    // session 1: events at 00:00 and 00:10; gap > 30min; session 2 at 01:00
    mem.addData(Seq(SessionEvent(1, ts(0)), SessionEvent(1, ts(10))))
    q.processAllAvailable()
    mem.addData(Seq(SessionEvent(1, ts(60))))
    q.processAllAvailable()
    // advance watermark well past session 2's timeout so it closes too
    mem.addData(Seq(SessionEvent(2, ts(600))))
    q.processAllAvailable()
    mem.addData(Seq(SessionEvent(2, ts(1200))))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions_sink")
      .filter(col("user_id") === 1).orderBy(col("session_start")).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Timestamp]("session_start") == ts(0))
    assert(out(0).getAs[Int]("n_events") == 2)
    assert(out(1).getAs[Timestamp]("session_start") == ts(60))
    assert(out(1).getAs[Int]("n_events") == 1)
  }

  test("batch and streaming tumbling windows agree on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = (0 until 120).map(i => Ev(ts(i), i % 3, if (i % 2 == 0) "click" else "view", 1.0))
    val batch = tumblingCounts(rows.toDF(), "10 minutes")
      .orderBy("w_start", "event_type").collect().toSeq
    val mem = MemoryStream[Ev]
    val out = runToCompletion[Ev](
      mem,
      df => tumblingCounts(df, "10 minutes"),
      Seq(rows.take(50), rows.slice(50, 120),
        Seq(Ev(ts(10000), 99, "flush", 0.0))), // advance watermark to close everything
      "parity_sink")
    val streamed = out.filter(col("event_type") =!= "flush")
      .orderBy("w_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }
}
