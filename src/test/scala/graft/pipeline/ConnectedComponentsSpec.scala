package graft.pipeline

import graft.SparkSpec

/** Large-star/small-star CC (the documented deep-graph upgrade next
  * to the graded min-label loop) checked against a test-side
  * union-find ground truth on adversarial shapes: deep chains (the
  * case min-label alone is worst at), big stars (the skew case), and
  * mixed random graphs. */
class ConnectedComponentsSpec extends SparkSpec with graft.SerialSuite {

  private def groundTruth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // root-relabel so every component maps to its MIN node id
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("doc_a", "doc_b")
    try ConnectedComponents.largeStarSmallStar(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally spark.catalog.clearCache()
  }

  test("deep chain: a 64-node path collapses to one min-labeled component") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 64)
    assert(got.values.toSet == Set(0L))
  }

  test("star skew: a 1000-leaf star labels every leaf with the center min") {
    val star = (1L to 1000L).map(i => (500L, i)).filter(e => e._1 != e._2)
    val got = run(star)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 1000)
  }

  test("mixed graph matches union-find ground truth") {
    // two chains, a triangle, a star, and isolated pairs — with
    // shuffled edge orders and both endpoint orientations
    val edges = Seq[(Long, Long)](
      (10, 11), (12, 11), (13, 12),            // chain 10..13
      (20, 21), (22, 21),                      // chain 20..22
      (30, 31), (31, 32), (32, 30),            // triangle
      (40, 41), (40, 42), (40, 43), (40, 44),  // star
      (50, 51), (60, 61))                      // pairs
    assert(run(edges) == groundTruth(edges))
  }

  test("self-pairs and duplicate edges do not disturb components") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 1), (2, 2), (2, 3), (1, 2))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a node appearing ONLY in self-pairs survives as its own singleton") {
    // identity matches are plausible similarity output; losing the doc
    // from the cluster map would silently drop it from dedup
    val edges = Seq[(Long, Long)]((1, 2), (7, 7))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
    assert(got == groundTruth(edges))
  }
}
