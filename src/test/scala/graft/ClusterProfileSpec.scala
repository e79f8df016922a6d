package graft

/** Regime-independence gate for the at-scale profile (r13, VERDICT
  * r12 item 5): every registered graded query must return IDENTICAL
  * results under the bench-tier session and under the full
  * [[ClusterProfile]] (AQE + skew-join split + 200-wide shuffles +
  * cluster broadcast threshold). The graded plans claim their
  * broadcasts and partitioning explicitly, so no adaptive re-plan may
  * change an answer — this spec is that claim, mechanically, over the
  * whole registry.
  *
  * Isolation trick: every profile entry is a session-level
  * `spark.sql.*` conf, so a `newSession()` off the shared context
  * carries the profile without a second JVM; the determinism protocol
  * (exact integers, shared float trees) makes result equality
  * BIT-equality, compared as row multisets (presentation ORDER BY
  * ties may legally permute across partition widths).
  */
class ClusterProfileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def profiled = {
    val s2 = spark.newSession()
    ClusterProfile.entries.foreach { case (k, v) => s2.conf.set(k, v) }
    s2
  }

  test("profile integrity: session-settable entries, alias expansion, policy handoff") {
    val s2 = profiled
    ClusterProfile.entries.foreach { case (k, v) =>
      assert(s2.conf.get(k) == v, s"$k did not take as a session conf")
    }
    // NOTE: no assert on the PARENT session's conf here — the
    // dedup_cluster_cc loop legitimately scopes the shared session's
    // shuffle width around its rounds (restored in finally), so a
    // concurrent suite could observe the transient value.
    assert(HarnessConf.expand("cluster") == ClusterProfile.conf)
    assert(HarnessConf.expand("a=b") == "a=b")
    // the profile pins shuffle.partitions, so the per-key presizing
    // policy must stand down exactly as it does for a manual sweep
    assert(!HarnessConf.policyActiveFor(Some("cluster")))
    assert(HarnessConf.policyActiveFor(Some("spark.sql.adaptive.enabled=true")))
  }

  test("every graded query returns identical results under the cluster profile") {
    val s2 = profiled
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // base side from the shared StaticResults execution pass (r15):
      // QueryRegistrySpec's smoke needs the same 360 executions
      val base = StaticResults.rows(spark, name)
      val prof = fn(s2, sf).collect().map(_.toString).sorted
      if (base.sameElements(prof)) None
      else Some(s"$name (${base.length} vs ${prof.length} rows, first diff: " +
        base.zip(prof).find { case (a, b) => a != b }
          .map { case (a, b) => s"$a != $b" }
          .getOrElse("row count") + ")")
    }
    assert(diffs.isEmpty,
      s"results changed under the cluster profile:\n${diffs.mkString("\n")}")
  }
}
