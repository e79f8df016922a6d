package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed as-of join cases: strict vs inclusive tie handling,
  * no-prior-row NULLs, and key isolation. */
class AsOfSpec extends SparkSpec {

  private def frames = {
    import spark.implicits._
    // key "a": rights at t=1,3,3'; lefts at t=2,3,5. key "b": no rights.
    val left = Seq(
      ("a", 2L, 100L), ("a", 3L, 101L), ("a", 5L, 102L), ("b", 4L, 103L))
      .toDF("k", "t", "id")
    val right = Seq(
      ("a", 1L, 10L, "r1"), ("a", 3L, 20L, "r2"), ("a", 3L, 30L, "r3"))
      .toDF("k", "t", "rid", "v")
    (left, right)
  }

  test("strict as-of excludes equal-ts rights; inclusive takes the last of them") {
    val (left, right) = frames
    def vals(strict: Boolean): Map[Long, Any] =
      AsOf.asofJoinPrior(left, right, "k", "t", "v",
          tie = "id", rightTie = "rid", strict = strict)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Any]("asof_v")).toMap
    val s = vals(strict = true)
    assert(s(100L) == "r1", "left t=2 sees right t=1")
    assert(s(101L) == "r1", "strict: left t=3 must NOT see rights at t=3")
    assert(s(102L) == "r3", "left t=5 sees the last t=3 right")
    assert(s(103L) == null, "key b has no rights")
    val i = vals(strict = false)
    assert(i(101L) == "r3", "inclusive: left t=3 sees rights at t=3, last tie wins")
  }

  test("as-of output keeps exactly the left rows") {
    val (left, right) = frames
    val out = AsOf.asofJoinPrior(left, right, "k", "t", "v",
      tie = "id", rightTie = "rid")
    assert(out.count() == left.count())
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(100L, 101L, 102L, 103L))
  }
}
