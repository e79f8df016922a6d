package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized as-of join (the operator behind `join_asof_event`).
  *
  * For every left row, attach the latest prior right row sharing
  * `key`: union-tag both sides, one window pass per key ordered by
  * (ts, tag, tie), O(n log n) with a single shuffle on the key —
  * never the O(n²/key) self-theta-join. At any scale this is one
  * exchange + one sort, and the key partitioning is reusable by
  * downstream stages.
  *
  * `strict = true`  → right.ts <  left.ts (ties excluded)
  * `strict = false` → right.ts <= left.ts (ties included; among
  *                    equal-ts right rows the last under `tie` wins)
  */
object AsOf {

  def asofJoinPrior(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      valueCol: String,
      tie: String,
      rightTie: String = null,
      strict: Boolean = true): DataFrame = {
    val rTieCol = Option(rightTie).getOrElse(tie)
    // tag order at equal ts decides strictness: with the LEFT side
    // sorting first (tag 0), the [unbounded, -1] frame cannot see an
    // equal-ts right row; with the RIGHT side first it can.
    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val l = left.select(col(key).as("_k"), col(ts).as("_ts"),
        col(tie).cast("long").as("_tie"))
      .withColumn("_tag", lit(lTag))
      .withColumn("_v", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("_left", lit(true))
    val r = right.select(col(key).as("_k"), col(ts).as("_ts"),
        col(rTieCol).cast("long").as("_tie"), col(valueCol).as("_v"))
      .withColumn("_tag", lit(rTag))
      .withColumn("_left", lit(false))
    // sanity: both frames now share the same 6-column layout
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("_asof", last(when(!col("_left"), col("_v")), ignoreNulls = true).over(w))
      .filter(col("_left"))
      .select(col("_k").as(key), col("_ts").as(ts), col("_tie").as(tie),
        col("_asof").as(s"asof_$valueCol"))
  }
}
