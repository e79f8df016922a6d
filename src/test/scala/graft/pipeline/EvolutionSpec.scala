package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EvolutionSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("merge: updates overwrite on key, inserts append, untouched rows survive") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val updates = Seq((2L, "b2", 21.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    val merged = Evolution.merge(target, updates, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(merged.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0)))
  }

  test("merge is idempotent for identical updates") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val updates = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val once = Evolution.merge(target, updates, "k")
    val twice = Evolution.merge(once, updates, "k")
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("diff classifies added / removed / changed and omits unchanged") {
    import spark.implicits._
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val after = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("k", "name")
    val d = Evolution.diff(before, after, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("scd2 builds validity intervals and collapses re-statements") {
    import spark.implicits._
    val events = Seq(
      (1L, "gold", ts("2024-01-01 00:00:00")),
      (1L, "gold", ts("2024-02-01 00:00:00")),   // re-statement: no new version
      (1L, "platinum", ts("2024-03-01 00:00:00")),
      (2L, "silver", ts("2024-01-15 00:00:00")))
      .toDF("k", "tier", "eff")
    val hist = Evolution.scd2(events, "k", "eff")
      .orderBy("k", "valid_from").collect()
    assert(hist.length == 3, "4 events -> 3 versions (one collapsed)")
    val v1 = hist(0)
    assert(v1.getAs[String]("tier") == "gold"
      && v1.getAs[Timestamp]("valid_from") == ts("2024-01-01 00:00:00")
      && v1.getAs[Timestamp]("valid_to") == ts("2024-03-01 00:00:00")
      && !v1.getAs[Boolean]("is_current"))
    val v2 = hist(1)
    assert(v2.getAs[String]("tier") == "platinum" && v2.getAs[Boolean]("is_current")
      && v2.isNullAt(v2.fieldIndex("valid_to")))
    assert(hist(2).getAs[String]("tier") == "silver" && hist(2).getAs[Boolean]("is_current"))
  }
}
