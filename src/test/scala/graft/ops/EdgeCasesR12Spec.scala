package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hostile micro-fixtures for the round-12 operators — inputs the
  * driver fixtures never produce (n < quartile count, sub-window
  * documents, equal-size containment candidates, single-window rate
  * series), written as tiny parquet table dirs so the GRADED QDef
  * runs end-to-end on them (the EdgeCasesSpec discipline applied to
  * whole operators). */
class EdgeCasesR12Spec extends SparkSpec {

  /** Write a one-table micro-fixture dir and return its path. */
  private def fixtureDir(table: String, df: org.apache.spark.sql.DataFrame): String = {
    val dir = graft.TempDirs.create(s"graft_edge_$table")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir
  }

  test("order_rfm_segments: fewer customers than quartiles still yields exact ntile buckets") {
    import spark.implicits._
    // two customers -> ntile(4) over 2 rows assigns buckets 1 and 2
    val orders = Seq(
      (1L, 10L, "O", 100.0, java.time.LocalDateTime.of(2001, 1, 1, 0, 0), "1-URGENT"),
      (2L, 20L, "O", 900.0, java.time.LocalDateTime.of(2001, 6, 1, 0, 0), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val d = fixtureDir("orders", orders)
    val rows = Windows.orderRfmSegments.run(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // cust 20: most recent + equal freq tie to cust 10 by key + higher money
    // recency asc: (cust20 rec < cust10 rec) -> rq(20)=1, rq(10)=2
    // freq desc ties -> custkey asc: fq(10)=1, fq(20)=2
    // money desc: mq(20)=1, mq(10)=2
    assert(rows == Map("R2F1M2" -> 1L, "R1F2M1" -> 1L),
      s"quartile assignment under n < 4: $rows")
  }

  test("dedup_segment_level: documents shorter than one segment form single-segment docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tiny", "en", "src0", 4L),
      (2L, "tiny", "en", "src0", 4L),
      (3L, "a b c d e f g h i j", "en", "src0", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = fixtureDir("documents", docs)
    val rows = CorpusOps.dedupSegmentLevel.run(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // docs 1 and 2: one segment each, duplicated across both -> 1000 permille
    assert(rows(1L) == ((1L, 1L, 1000L)) && rows(2L) == ((1L, 1L, 1000L)))
    // doc 3: two segments (8 + 2 tokens), unique -> 0 permille
    assert(rows(3L) == ((2L, 0L, 0L)))
  }

  test("dedup_containment: equal-size identical token sets are excluded by design") {
    import spark.implicits._
    // docs 1/2: identical sets (exact-dup territory, excluded);
    // doc 3 strictly contains doc 4's set -> the only reported pair
    val docs = Seq(
      (1L, "x y z", "en", "src0", 5L),
      (2L, "z y x", "en", "src0", 5L),
      (3L, "a b c d", "en", "src0", 7L),
      (4L, "b c", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = fixtureDir("documents", docs)
    val rows = LlmPipeline.dedupContainment.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((3L, 1L, 4L, 4L)),
      s"only the strict-subset pair must be reported: ${rows.toSeq}")
  }

  test("rateAlerts: a single window per type has no predecessor and never alerts") {
    import spark.implicits._
    val counts = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "click", 100L))
      .toDF("win_start", "event_type", "n")
    val out = graft.streaming.StreamOps.rateAlerts(counts).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(3) && !out.head.getBoolean(4) && out.head.isNullAt(5))
  }

  test("win_ewma_dyadic: customers with fewer than 8 orders emit nothing") {
    import spark.implicits._
    val orders = (1 to 7).map(i =>
      (i.toLong, 1L, "O", 100.0 * i,
        java.time.LocalDateTime.of(2001, 1, i, 0, 0), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val d = fixtureDir("orders", orders)
    assert(Windows.winEwmaDyadic.run(spark, d).count() == 0,
      "a truncated-history EWMA is a different estimator and must not emit")
  }
}
