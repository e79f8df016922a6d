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

  test("windowed as-of equals the naive per-row definition on random data (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val lefts = (0 until 120).map(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(50).toLong, 1000L + i))
    val rights = (0 until 120).map(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(50).toLong, 2000L + i, s"v$i"))
    val out = AsOf.asofJoinPrior(
        lefts.toDF("k", "t", "id"), rights.toDF("k", "t", "rid", "v"),
        "k", "t", "v", tie = "id", rightTie = "rid", strict = true)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("asof_v")).toMap
    // naive reference: latest strictly-prior right, ties by largest rid
    lefts.foreach { case (k, t, id) =>
      val expected = rights.filter(r => r._1 == k && r._2 < t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._4).orNull
      assert(out(id) == expected, s"left id=$id k=$k t=$t")
    }
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
