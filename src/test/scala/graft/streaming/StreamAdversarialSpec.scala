package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Adversarial sequences for the streaming twins (r13, VERDICT r12
  * item 3): the happy paths live in StreamOpsSpec; these pin the
  * boundary semantics a production stream actually hits —
  *
  *  - `stream_custom_sessions`' streaming side: one session extended
  *    across 3+ micro-batches (the timeout must keep re-arming, never
  *    fire mid-session), the EventTimeTimeout path racing the
  *    watermark (close must come from state timeout, not inline
  *    data), out-of-order events inside one batch slice, and an
  *    intra-batch gap split — each asserted EPOCH BY EPOCH against
  *    the sink, not just end-state.
  *  - `stream_rate_alert`'s alert predicate at the exact-2× boundary:
  *    n == 2·prev must NOT alert (strict >), driven through the real
  *    append-mode windowed stream with a foreachBatch accumulator so
  *    the assertion sequence follows windows CLOSING, one epoch at a
  *    time.
  *
  * Structured Streaming runs an extra no-data micro-batch after a
  * data batch advances the watermark (that is where window
  * finalization and state timeouts happen); `processAllAvailable`
  * drains those too, so every checkpoint below observes a settled
  * sink for the watermark implied by the data fed SO FAR — the
  * expected values are stated against exactly that contract.
  */
class StreamAdversarialSpec extends SparkSpec {
  import StreamOps._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:$sec%02d")

  // ---- custom sessions -------------------------------------------------

  private def sessionsOf(sink: String, user: Long): Seq[(Timestamp, Int)] =
    spark.table(sink).filter(col("user_id") === user)
      .orderBy(col("session_start")).collect()
      .map(r => (r.getAs[Timestamp]("session_start"), r.getAs[Int]("n_events"))).toSeq

  test("sessions: one session extended across three micro-batches never splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val q = customSessions(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("adv_merge_sink")
      .outputMode("append").start()
    // each batch extends the same session (gaps of 20 min < 30 min);
    // the re-armed timeout (lastTs + gap) must stay ahead of the
    // watermark (max − 10 min) the whole way: 30 < 50, 50 < 70, …
    mem.addData(Seq(SessionEvent(1, ts(0)))); q.processAllAvailable()
    assert(sessionsOf("adv_merge_sink", 1).isEmpty, "epoch 1: nothing closed")
    mem.addData(Seq(SessionEvent(1, ts(20)))); q.processAllAvailable()
    assert(sessionsOf("adv_merge_sink", 1).isEmpty, "epoch 2: still one open session")
    mem.addData(Seq(SessionEvent(1, ts(40)))); q.processAllAvailable()
    assert(sessionsOf("adv_merge_sink", 1).isEmpty, "epoch 3: still open after 3 batches")
    mem.addData(Seq(SessionEvent(9, ts(600)))); q.processAllAvailable()
    q.stop()
    assert(sessionsOf("adv_merge_sink", 1) == Seq((ts(0), 3)),
      "the 3-batch session must close as ONE session of 3 events")
  }

  test("sessions: the EventTimeTimeout path fires when the watermark passes, epoch by epoch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val q = customSessions(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("adv_timeout_sink")
      .outputMode("append").start()
    def all(): Map[Long, Seq[(Timestamp, Int)]] =
      spark.table("adv_timeout_sink").collect()
        .map(r => (r.getAs[Long]("user_id"),
          (r.getAs[Timestamp]("session_start"), r.getAs[Int]("n_events"))))
        .groupBy(_._1).map { case (u, xs) =>
          u -> xs.map(_._2).sortBy(_._1.getTime).toSeq }

    mem.addData(Seq(SessionEvent(1, ts(0)))); q.processAllAvailable()
    assert(all().isEmpty, "epoch 1: watermark at −∞, nothing times out")
    // u2's event drags the watermark to 100−10 = 90 > u1's timeout at
    // 0+30: u1's close must come from hasTimedOut (u1 has NO data in
    // this batch), not from the inline gap branch.
    mem.addData(Seq(SessionEvent(2, ts(100)))); q.processAllAvailable()
    assert(all() == Map(1L -> Seq((ts(0), 1))),
      "epoch 2: u1 closed by state timeout exactly once")
    // u1 returns — a FRESH session; meanwhile the watermark (now
    // 200−10 = 190) fires u2's timeout (100+30 = 130 < 190).
    mem.addData(Seq(SessionEvent(1, ts(200)))); q.processAllAvailable()
    assert(all() == Map(1L -> Seq((ts(0), 1)), 2L -> Seq((ts(100), 1))),
      "epoch 3: u2 times out; u1's new session stays open")
    mem.addData(Seq(SessionEvent(9, ts(600)))); q.processAllAvailable()
    q.stop()
    assert(all() == Map(
      1L -> Seq((ts(0), 1), (ts(200), 1)),
      2L -> Seq((ts(100), 1))),
      "final: two u1 sessions (timeout + flush), one u2 session")
  }

  test("sessions: out-of-order events inside one batch slice sort before merging") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val q = customSessions(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("adv_ooo_sink")
      .outputMode("append").start()
    // arrival order 40, 0, 20 — processed in TIME order they form one
    // session; processed in arrival order they would split (0 is 40
    // minutes "before" the running last-ts)
    mem.addData(Seq(SessionEvent(5, ts(40)), SessionEvent(5, ts(0)),
      SessionEvent(5, ts(20))))
    q.processAllAvailable()
    mem.addData(Seq(SessionEvent(9, ts(600)))); q.processAllAvailable()
    q.stop()
    assert(sessionsOf("adv_ooo_sink", 5) == Seq((ts(0), 3)))
  }

  test("sessions: an intra-batch gap closes the first session IN that epoch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val q = customSessions(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("adv_gap_sink")
      .outputMode("append").start()
    // 0 and 1 merge; 60 is 59 min after 1 → inline close of (0, 2)
    // must be emitted by THIS epoch (append mode emits closed
    // sessions immediately, not on the next watermark advance)
    mem.addData(Seq(SessionEvent(7, ts(0)), SessionEvent(7, ts(1)),
      SessionEvent(7, ts(60))))
    q.processAllAvailable()
    assert(sessionsOf("adv_gap_sink", 7) == Seq((ts(0), 2)),
      "epoch 1: the pre-gap session is closed inline")
    mem.addData(Seq(SessionEvent(9, ts(600)))); q.processAllAvailable()
    q.stop()
    assert(sessionsOf("adv_gap_sink", 7) == Seq((ts(0), 2), (ts(60), 1)))
  }

  // ---- rate alerts at the 2x boundary ---------------------------------

  test("rate alerts flap only strictly beyond 2x, driven epoch by epoch through the stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // counts per 10-minute window: 2, 4, 9, 18, 5
    //   w1: 4 == 2·2   → NO alert (exact boundary), chg +1000000 ppm
    //   w2: 9  > 2·4   → ALERT,                    chg +1250000 ppm
    //   w3: 18 == 2·9  → NO alert (boundary again), chg +1000000 ppm
    //   w4: 5  < 18    → no alert,                  chg  −722222 ppm
    val winCounts = Seq(2, 4, 9, 18, 5)
    def winEvents(w: Int, n: Int): Seq[Ev] =
      (0 until n).map(i => Ev(ts(w * 10 + (i % 10), i / 10), 1L, "click", 1.0))
    val closed = scala.collection.mutable.ArrayBuffer[(Timestamp, String, Long)]()
    val mem = MemoryStream[Ev]
    val q = windowedTypeCounts(mem.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        val rows = b.collect().map(r =>
          (r.getAs[Timestamp]("win_start"), r.getString(1), r.getLong(2)))
        closed.synchronized { closed ++= rows }
        ()
      }
      .start()
    def alerts(): Map[Timestamp, (Long, Boolean, Option[Long])] = {
      val snap = closed.synchronized { closed.toSeq }
      if (snap.isEmpty) Map.empty
      else rateAlerts(snap.toDF("win_start", "event_type", "n")).collect()
        .map(r => r.getAs[Timestamp]("win_start") ->
          ((r.getLong(2), r.getBoolean(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    }
    val checkpoints = scala.collection.mutable.ArrayBuffer[Set[Timestamp]]()
    winCounts.zipWithIndex.foreach { case (n, w) =>
      mem.addData(winEvents(w, n)); q.processAllAvailable()
      checkpoints += alerts().filter(_._2._2).keySet
    }
    mem.addData(Seq(Ev(ts(600), 9L, "flush", 0.0))); q.processAllAvailable()
    q.stop()
    // windows close one behind the feed (watermark = max − 5 min), so
    // the ALERT for w2 must first appear at the checkpoint after w3's
    // data closed w2 — and w1/w3's exact-boundary rows must NEVER
    // alert at any checkpoint before or after.
    assert(checkpoints.take(3).forall(_.isEmpty),
      s"no alert may fire before w2 closes: $checkpoints")
    assert(checkpoints(3) == Set(ts(20)),
      s"w2's alert appears exactly when w2 closes: $checkpoints")
    assert(checkpoints(4) == Set(ts(20)),
      s"w3 at the exact 2x boundary must not add an alert: $checkpoints")
    val fin = alerts()
    assert(fin.keySet == Set(ts(0), ts(10), ts(20), ts(30), ts(40)),
      s"all five windows closed: ${fin.keySet}")
    assert(fin(ts(0)) == ((2L, false, None)))
    assert(fin(ts(10)) == ((4L, false, Some(1000000L))))
    assert(fin(ts(20)) == ((9L, true, Some(1250000L))))
    assert(fin(ts(30)) == ((18L, false, Some(1000000L))))
    assert(fin(ts(40)) == ((5L, false, Some(-722222L))))
  }
}
