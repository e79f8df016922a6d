package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import java.sql.Timestamp

/** Structured Streaming execution of the engine's event-stream
  * operators (SURVEY.md §2.9).
  *
  * Each transform takes a streaming DataFrame with the `events`
  * schema (`ts TIMESTAMP, user_id LONG, event_type STRING,
  * value DOUBLE, ...`) and returns a streaming result. The logic is
  * identical to the graded batch twins in graft.ops.Streaming — the
  * watermark is the only streaming-specific addition: it bounds state
  * (old windows are evicted once the watermark passes) and drops
  * late rows beyond the delay, which is what makes these pipelines
  * runnable indefinitely on an unbounded 100 TB/day stream.
  *
  * Correctness (including late/out-of-order data) is asserted with
  * MemoryStream in StreamOpsSpec — batch outputs cover the rest via
  * the DuckDB oracle.
  */
object StreamOps {

  /** 1-hour tumbling counts per event type; late rows beyond
    * `delay` are dropped, and a window's state is freed once the
    * watermark passes its end. */
  def tumblingCounts(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Windowed top-k feeding a per-epoch rank: the windowed COUNTS
    * stream in append mode (state bounded by the watermark exactly
    * like tumblingCounts); ranking is applied per micro-batch by the
    * caller via [[rankTopK]] in `foreachBatch` — a window-rank
    * cannot run inside an append-mode streaming plan, and per-epoch
    * re-ranking over closed windows is the streaming-native
    * formulation (the graded batch twin is `stream_topk_windowed`). */
  def windowedTypeCounts(events: DataFrame, width: String = "6 hours",
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** The per-epoch rank for [[windowedTypeCounts]] — a plain batch
    * transform, applied to each foreachBatch epoch (or any batch
    * DataFrame with (win_start, event_type, n)). */
  def rankTopK(counts: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("win_start")).orderBy(col("n").desc, col("event_type"))
    counts.select(col("win_start"), col("event_type"), col("n"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** Rate-spike alerts over windowed per-type counts — a plain batch
    * transform for foreachBatch epochs (or the graded batch twin
    * `stream_rate_alert`): each window's count vs the type's PREVIOUS
    * observed window, alert when it more than doubles. The ppm change
    * is sign-decomposed around the floor division (the win_pct_change
    * discipline) so no negative numerator is ever divided. */
  def rateAlerts(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("win_start"))
    counts.withColumn("prev", lag(col("n"), 1).over(w))
      .select(col("win_start"), col("event_type"), col("n"), col("prev"),
        coalesce(col("n") > col("prev") * 2, lit(false)).as("alert"),
        when(col("prev").isNull, lit(null).cast("long"))
          .when(col("n") >= col("prev"), expr("((n - prev) * 1000000) div prev"))
          .otherwise(-expr("((prev - n) * 1000000) div prev")).as("chg_ppm"))
  }

  /** 1-hour windows sliding every 15 minutes. */
  def slidingCounts(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** Built-in session windows (30-minute gap) per user. */
  def sessionCounts(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Streaming keyed dedup: first event per (user, type, minute);
    * the watermark bounds the dedup state. */
  def dedupKeyed(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .withColumn("minute", date_trunc("minute", col("ts")))
      .dropDuplicates("user_id", "event_type", "minute")

  /** Stream-static enrichment: a streaming fact joined to a batch
    * dimension (the dim is re-read per micro-batch and broadcast —
    * the streaming twin of the codebook-lookup pattern). */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: each click joined to the same
    * user's purchases within the next `horizon`. Both sides carry
    * watermarks and the join condition carries the time bound, so
    * Spark can size and evict the join state — without the bound the
    * state would grow forever on an unbounded stream. */
  def clickToPurchase(
      events: DataFrame,
      delay: String = "10 minutes",
      horizon: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", delay)
      .select(col("ts").as("click_ts"), col("user_id"),
        col("value").as("click_value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", delay)
      .select(col("ts").as("purchase_ts"), col("user_id").as("p_user_id"),
        col("value").as("purchase_value"))
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("purchase_value"))
  }

  // ---- custom state: hand-rolled sessionization ----

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, lastTs: Long, n: Int)
  case class SessionOut(user_id: Long, session_start: Timestamp, n_events: Int)

  /** flatMapGroupsWithState sessionization with an explicit
    * event-time timeout — the escape hatch for session semantics the
    * built-in session_window can't express (e.g. emitting only on
    * session close). Emits a session once no event has arrived for
    * the gap AND the watermark has passed. */
  def customSessions(
      events: Dataset[SessionEvent],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start), s.n))
          } else {
            // Sort the micro-batch slice; merge into (or emit) sessions.
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs < gapMs =>
                  cur = Some(s.copy(lastTs = t, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user, new Timestamp(s.start), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** foreachBatch parquet sink, idempotent per epoch: the epoch id
    * keys the directory and the write OVERWRITES it, so a replayed
    * epoch (restart from checkpoint after a crash mid-commit — the
    * case foreachBatch's at-least-once contract guarantees WILL
    * happen) lands the same rows once instead of appending
    * duplicates. This overwrite-by-epoch is what makes the
    * at-least-once callback an exactly-once lake. */
  def toParquetSink(df: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
      }
      .start()

  /** Read a parquet directory as a stream (file-source) — the batch
    * tables and this share one code path for transforms. */
  def readParquetStream(spark: SparkSession, path: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(path)
}
