package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-evolution operators: the mutation patterns an integration
  * pipeline needs on an append-only lake — merge/upsert, snapshot
  * diff, and slowly-changing-dimension history. All pure DataFrame
  * transforms (copy-on-write over immutable snapshots — the model
  * that scales on object storage), all deterministic.
  */
object Evolution {

  /** MERGE/upsert: updates win over target rows on `key`; inserts
    * flow through. One shuffle on the key (or zero if both sides are
    * bucketed on it — see graft.sources.Bucketing). */
  def merge(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = target.columns
    require(updates.columns.sameElements(cols),
      s"schema mismatch: ${cols.mkString(",")} vs ${updates.columns.mkString(",")}")
    val t = cols.foldLeft(target)((d, c) => d.withColumnRenamed(c, s"_t_$c"))
    val u = cols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"_u_$c"))
    t.join(u, col(s"_t_$key") === col(s"_u_$key"), "full")
      .select(cols.map(c => coalesce(col(s"_u_$c"), col(s"_t_$c")).as(c)): _*)
  }

  /** Snapshot diff: per key, whether it was added, removed, or had
    * any non-key column change between two snapshots. Unchanged keys
    * are omitted. Hash-compare uses a canonical struct of the non-key
    * columns, so column ORDER in the struct (fixed here) defines
    * equality. */
  def diff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    val attrs = before.columns.filterNot(_ == key).sorted
    def pack(df: DataFrame, side: String) = df.select(
      col(key), struct(attrs.map(col): _*).as(s"_${side}_attrs"))
    pack(before, "b").join(pack(after, "a"), Seq(key), "full")
      .withColumn("change", when(col("_b_attrs").isNull, "added")
        .when(col("_a_attrs").isNull, "removed")
        .when(col("_b_attrs") =!= col("_a_attrs"), "changed"))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }

  /** SCD2 history: from (key, attrs, effective_from) change events,
    * build validity intervals — valid_from/valid_to (NULL = current)
    * + is_current — via one lead() window per key. Consecutive
    * DUPLICATE attribute values are collapsed first (a re-statement
    * of the same value does not open a new version). */
  def scd2(events: DataFrame, key: String, ts: String): DataFrame = {
    val attrs = events.columns.filterNot(c => c == key || c == ts).sorted
    val wOrd = Window.partitionBy(col(key)).orderBy(col(ts))
    val packed = events.withColumn("_attrs", struct(attrs.map(col): _*))
    val changesOnly = packed
      .withColumn("_prev", lag(col("_attrs"), 1).over(wOrd))
      .filter(col("_prev").isNull || col("_attrs") =!= col("_prev"))
    changesOnly
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(wOrd))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_attrs", "_prev", ts)
  }
}
