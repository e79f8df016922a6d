package graft

/** The correctness-dump failure contract (ADVICE r9): a query that
  * fails must leave a loud `graft_error` sentinel in the dump, never
  * a silently-missing directory — that's how 23 analysis failures
  * vanished from the round-9 correctness artifact. */
class VerifySpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-verify").toString

  test("a failing query writes a graft_error sentinel in the dump slot") {
    val out = tmp()
    val ok = Verify.dumpQuery(spark, "/root/testdata/sf0.001", out, "boom",
      (_, _) => throw new IllegalStateException("synthetic failure"))
    assert(!ok)
    val sentinel = spark.read.parquet(s"$out/boom")
    assert(sentinel.columns.toSeq == Seq("graft_error"))
    val msg = sentinel.head().getString(0)
    assert(msg.contains("IllegalStateException") && msg.contains("synthetic failure"))
  }

  test("an analysis-time failure (the round-9 shape) is also captured") {
    val out = tmp()
    // Reproduces the r9 failure mode: a plan that fails analysis when
    // the fixture schema isn't what the query assumes.
    val ok = Verify.dumpQuery(spark, "/root/testdata/sf0.001", out, "bad_col",
      (s, d) => Tables.events(s, d).select("no_such_column"))
    assert(!ok)
    assert(spark.read.parquet(s"$out/bad_col").head()
      .getString(0).contains("AnalysisException"))
  }

  test("a succeeding query writes its real result, not a sentinel") {
    val out = tmp()
    val ok = Verify.dumpQuery(spark, "/root/testdata/sf0.001", out, "good",
      (s, d) => Tables.region(s, d))
    assert(ok)
    val df = spark.read.parquet(s"$out/good")
    assert(df.columns.toSeq == Seq("r_regionkey", "r_name") && df.count() == 5)
  }
}
