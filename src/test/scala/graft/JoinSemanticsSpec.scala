package graft

import org.apache.spark.sql.functions._

/** Every join type on one tiny hand-computed fixture: left {1,2,3},
  * right {2,3,3,4} — match counts, NULL padding, duplicate-row
  * multiplication, and semi/anti row preservation are all checked
  * against values computed by hand. */
class JoinSemanticsSpec extends SparkSpec {

  private def frames = {
    import spark.implicits._
    (Seq((1, "l1"), (2, "l2"), (3, "l3")).toDF("k", "lv"),
      Seq((2, "r2"), (3, "r3a"), (3, "r3b"), (4, "r4")).toDF("k", "rv"))
  }

  test("inner join multiplies duplicate matches") {
    val (l, r) = frames
    val out = l.join(r, Seq("k"), "inner").orderBy("k", "rv").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2)))
    assert(out.toSeq == Seq((2, "l2", "r2"), (3, "l3", "r3a"), (3, "l3", "r3b")))
  }

  test("left join keeps unmatched left rows NULL-padded") {
    val (l, r) = frames
    val out = l.join(r, Seq("k"), "left")
    assert(out.count() == 4)
    val k1 = out.filter(col("k") === 1).head()
    assert(k1.isNullAt(2))
  }

  test("right and full joins pad the opposite sides") {
    val (l, r) = frames
    assert(l.join(r, Seq("k"), "right").count() == 4)   // r4 padded, 3 doubles
    val full = l.join(r, Seq("k"), "full")
    assert(full.count() == 5)                            // + unmatched l1
    assert(full.filter(col("lv").isNull).count() == 1)   // r4
    assert(full.filter(col("rv").isNull).count() == 1)   // l1
  }

  test("semi join returns each left row at most once; anti is its complement") {
    val (l, r) = frames
    val semi = l.join(r, Seq("k"), "left_semi")
    assert(semi.columns.toSeq == Seq("k", "lv"), "semi keeps only left columns")
    assert(semi.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3),
      "k=3 appears ONCE despite two right matches")
    val anti = l.join(r, Seq("k"), "left_anti")
    assert(anti.collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(semi.count() + anti.count() == l.count())
  }

  test("cross join is the full cartesian product") {
    val (l, r) = frames
    assert(l.crossJoin(r).count() == 12)
  }

  test("non-equi join applies the residual predicate to every pair") {
    val (l, r) = frames
    val out = l.join(r, l("k") < r("k"))
    // pairs with lk < rk: 1x{2,3,3,4}=4, 2x{3,3,4}=3, 3x{4}=1
    assert(out.count() == 8)
  }
}
