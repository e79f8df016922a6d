package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hostile micro-fixtures per SURVEY §5.2: empty inputs, all-NULL
  * join sides, ties everywhere, empty arrays, unicode strings —
  * asserting the engine's operators keep their contracts at the
  * edges the fixtures never hit. */
class EdgeCasesSpec extends SparkSpec {

  test("aggregation over an empty input yields no groups, not a NULL row") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    val agg = empty.groupBy("k").agg(sum(col("v").cast(DecimalType(12, 2))).as("s"))
    assert(agg.count() == 0)
    // global aggregate over empty input: one row, NULL sum, 0 count
    val g = empty.agg(sum(col("v")).as("s"), count(lit(1)).as("n")).head()
    assert(g.isNullAt(0) && g.getLong(1) == 0)
  }

  test("outer join against an all-NULL key side matches nothing but keeps rows") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
    val right = Seq((Option.empty[Long], "x"), (Option.empty[Long], "y"))
      .toDF("k", "rv")
    val out = left.join(right, Seq("k"), "full")
    // NULL keys never equal anything: 2 left rows + 2 unmatched right rows
    assert(out.count() == 4)
    assert(out.filter(col("lv").isNotNull && col("rv").isNotNull).count() == 0)
  }

  test("window rank functions break full ties deterministically only with a tie-break key") {
    import spark.implicits._
    val df = Seq((1, 5.0), (2, 5.0), (3, 5.0)).toDF("id", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))
    val ranks = df.select(col("id"), rank().over(w).as("r"), row_number().over(w).as("rn"))
      .orderBy("id").collect()
    // with the tie-break in the ORDER BY, rank is 1,2,3 (not 1,1,1)
    assert(ranks.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    assert(ranks.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
  }

  test("tokenization of empty and single-token strings never throws") {
    import spark.implicits._
    val df = Seq("", "one", "a b").toDF("text")
    val t = split(col("text"), " ")
    val out = df.select(
      size(t).as("n"),
      slice(t, lit(1), greatest(size(t) - 1, lit(0))).as("prefix"),
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat_ws(" ", a, b)).as("bigrams")).collect()
    assert(out.length == 3)
    assert(out(0).getInt(0) == 1) // split("", " ") -> [""]
    assert(out(1).getSeq[String](2).isEmpty, "single token -> no bigrams")
  }

  test("unicode strings survive slugify, length, and set ops") {
    import spark.implicits._
    import ops.Udx.slugify
    assert(slugify("Zürich Straße") == "z-rich-stra-e") // non-ascii -> dashes
    val df = Seq("héllo wörld", "héllo wörld", "日本語 テスト").toDF("text")
    assert(df.distinct().count() == 2)
    val lens = df.distinct().select(length(col("text"))).collect().map(_.getInt(0)).sorted
    assert(lens.toSeq == Seq(7, 11), "length counts codepoints, not bytes")
  }

  test("decimal casts of extreme and negative doubles stay exact") {
    import spark.implicits._
    val vals = Seq(-0.0, 0.0, -99999999.99, 99999999.99, 0.005, -0.005)
    val df = vals.toDF("v")
    val back = df.select(col("v").cast(DecimalType(12, 2)).cast(DoubleType))
      .collect().map(_.getDouble(0))
    assert(back.toSeq == Seq(0.0, 0.0, -99999999.99, 99999999.99, 0.01, -0.01),
      "HALF_UP at scale 2, exact elsewhere")
  }

  test("empty embeddings and length mismatch degrade gracefully in graft_dot") {
    import spark.implicits._
    val df = Seq(
      (Array.empty[Float], Array.empty[Float]),
      (Array(1f, 2f), Array(3f))).toDF("a", "b")
    val out = df.select(functions.VectorFunctions.floatDot(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(out(0) == 0.0)
    assert(out(1) == 3.0, "mismatched lengths fold over the common prefix")
  }

  test("Evolution merge/diff on empty sides keep their contracts") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val some = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // empty updates -> target unchanged; empty target -> all inserts
    assert(pipeline.Evolution.merge(some, empty, "k").count() == 2)
    assert(pipeline.Evolution.merge(empty, some, "k").count() == 2)
    assert(pipeline.Evolution.merge(empty, empty, "k").count() == 0)
    // diff of identical sides is empty; diff against empty is all adds/removes
    assert(pipeline.Evolution.diff(some, some, "k").count() == 0)
    assert(pipeline.Evolution.diff(empty, some, "k")
      .filter(col("change") === "added").count() == 2)
  }

  test("GroupedTopK with k exceeding every group size returns whole groups") {
    import spark.implicits._
    val df = Seq(("g1", 1), ("g1", 2), ("g2", 3)).toDF("g", "x")
    val out = plans.GroupedTopK.topkPerGroup(df,
      groupCols = Seq("g"), orderBy = Seq(("x", true)), k = 10)
    assert(out.count() == 3, "k > |group| must not drop or duplicate rows")
  }

  test("weighted-median bisect survives hostile bucket boundaries (micro fixtures)") {
    // The histogram bisect (agg_weighted_median) picks a threshold
    // bucket, then locates the exact row inside it. The dangerous
    // edges: (a) the half-weight line crossed EXACTLY at a bucket's
    // end (tb must be that bucket, median its last row), (b) a group
    // living in one bucket, (c) the crossing row being a bucket's
    // first row. Each case is written as a real lineitem parquet
    // micro-fixture and run through the GRADED query, refereed by a
    // naive JVM scan.
    import spark.implicits._
    // (flag, price_dollars, quantity) — quantities are the weights
    val cases: Seq[(String, Seq[(Double, Double)])] = Seq(
      // (a) exact boundary: w=2 @ $1, w=2 @ $700 (bucket 1), w=2 @ $1400
      "A" -> Seq((1.0, 2.0), (700.0, 2.0), (1400.0, 2.0)),
      // (b) single bucket, uneven weights
      "B" -> Seq((10.0, 1.0), (20.0, 5.0), (30.0, 1.0)),
      // (c) heavy first row dominates: median is the very first row
      "C" -> Seq((5.0, 10.0), (800.0, 1.0), (1500.0, 1.0)),
      // (d) all weight on the last row of a later bucket
      "D" -> Seq((5.0, 1.0), (2000.0, 9.0)))
    val rows = cases.flatMap { case (flag, ps) =>
      ps.zipWithIndex.map { case ((price, qty), i) =>
        (i.toLong + 1, flag, price, qty, i + 1)
      }
    }
    val dir = TempDirs.create("graft-wm-edge")
    rows.toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_quantity",
        "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ops.Aggregates.aggWeightedMedian.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.foreach { case (flag, ps) =>
      val withKeys = ps.zipWithIndex.map { case ((p, q), i) =>
        (math.round(p * 100), math.round(q * 10000), i.toLong + 1) }
      val tw = withKeys.map(_._2).sum
      val sorted = withKeys.sortBy(t => (t._1, t._3))
      val med = sorted.scanLeft(0L)(_ + _._2).tail.zip(sorted)
        .find { case (cw, _) => 2 * cw >= tw }.get._2._1
      assert(out(flag) == ((med, tw)), s"flag $flag: bisect vs naive scan")
    }
  }
}
