package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame semantics on hand-computed 5-row fixtures — the frame
  * rules (default frames, ROWS bounds, rank gaps, boundary NULLs) the
  * graded window queries depend on. */
class WindowFrameSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0), ("a", 4, 5.0), ("b", 1, 7.0))
      .toDF("g", "seq", "v")
  }

  test("running sum accumulates in order within each partition") {
    val w = Window.partitionBy("g").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.withColumn("rs", sum("v").over(w))
      .orderBy("g", "seq").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(10.0, 30.0, 50.0, 55.0, 7.0))
  }

  test("3-row sliding average uses exactly the declared frame") {
    val w = Window.partitionBy("g").orderBy("seq").rowsBetween(-1, 1)
    val out = df.withColumn("m", avg("v").over(w))
      .orderBy("g", "seq").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(15.0, 50.0 / 3, 45.0 / 3, 12.5, 7.0))
  }

  test("rank leaves gaps after ties; dense_rank does not; row_number is total") {
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val out = df.filter(col("g") === "a")
      .select(col("seq"), rank().over(w).as("r"), dense_rank().over(w).as("d"),
        row_number().over(w.orderBy(col("v").desc, col("seq"))).as("rn"))
      .orderBy("seq").collect()
    // v desc: 20,20,10,5 → rank 1,1,3,4; dense 1,1,2,3
    assert(out.map(_.getInt(1)).toSeq == Seq(3, 1, 1, 4))
    assert(out.map(_.getInt(2)).toSeq == Seq(2, 1, 1, 3))
    assert(out.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("lag/lead return NULL beyond partition bounds") {
    val w = Window.partitionBy("g").orderBy("seq")
    val rows = df.select(col("g"), col("seq"),
        lag("v", 1).over(w).as("p"), lead("v", 1).over(w).as("n"))
      .orderBy("g", "seq").collect()
    assert(rows.head.isNullAt(2), "first row has no lag")
    assert(rows(3).isNullAt(3), "last row of partition a has no lead")
    assert(rows(4).isNullAt(2) && rows(4).isNullAt(3), "singleton partition b")
  }

  test("default frame with ORDER BY is RANGE to current row — ties share values") {
    val w = Window.partitionBy("g").orderBy("v") // default frame: RANGE
    val out = df.filter(col("g") === "a")
      .select(col("seq"), sum("v").over(w).as("s"))
      .orderBy("seq").collect().map(_.getDouble(1))
    // v asc: 5,10,20,20 — the two v=20 rows are RANGE-peers: both see 55
    assert(out.toSeq == Seq(15.0, 55.0, 55.0, 5.0))
  }

  test("distributed win_distribution equals Spark's own global window functions") {
    // The graded query derives ntile/percent_rank/cume_dist from
    // range-partitioned rank arithmetic (no single-partition window);
    // this pins it row-for-row to the built-ins it replaces.
    val sf = "/root/testdata/sf0.001"
    val ours = SparkEntry.queries("win_distribution")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(3), r.getDouble(4)))
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val ref = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(3), r.getDouble(4)))
    assert(ours.length == ref.length && ours.nonEmpty)
    assert(ours.sameElements(ref))
  }
}
