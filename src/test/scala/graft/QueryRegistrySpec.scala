package graft

/** Registry-level smoke (SURVEY §5.5): every declared query must run
  * at sf0.001 without throwing, the flagship must return rows, and
  * the registry must be structurally sound (unique keys, oracle
  * coverage). Catches wiring regressions long before the driver's
  * sf0.01 oracle pass. */
class QueryRegistrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registry keys are unique and oracle coverage is total minus sanctioned") {
    val keys = SparkEntry.defs.map(_.key)
    assert(keys.distinct.size == keys.size, s"duplicate keys: ${keys.diff(keys.distinct)}")
    val noOracle = SparkEntry.defs.filter(_.oracle.isEmpty).map(_.key)
    assert(noOracle == Seq("agg_approx_distinct"),
      s"unexpected no-oracle queries: $noOracle")
  }

  test("fixture schemas match the reader guarantees at every sf") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val bad = Tables.schemaMismatches(spark, dir)
      assert(bad.isEmpty, s"$dir:\n${bad.mkString("\n")}")
    }
  }

  test("flagship entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001") {
    // noop sink, NOT count(): count() lets Catalyst prune projections,
    // hiding per-column expression errors that Verify's parquet write
    // would hit (this exact gap shipped a broken regexp once).
    val failures = SparkEntry.defs.flatMap { d =>
      try { d.run(spark, sf).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(s"${d.key}: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
