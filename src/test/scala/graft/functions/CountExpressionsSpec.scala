package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_term_counts / graft_word_bigrams must reproduce exactly the
  * tables the explode→groupBy formulations they replaced produced —
  * the DuckDB oracles for tfidf/langid/ngram_logprob were validated
  * against those — and stay reachable from SQL via GraftExtensions. */
class CountExpressionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("termCounts equals the explode→groupBy (doc, term) count table") {
    val rowLocal = docs
      .select(col("doc_id"),
        explode(VectorFunctions.termCounts(split(col("text"), " "))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
    val shuffled = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    assert(rowLocal.count() > 0)
    assert(rowLocal.exceptAll(shuffled).isEmpty && shuffled.exceptAll(rowLocal).isEmpty)
  }

  test("termCounts handles empty arrays, null elements, and duplicates") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a", "a")),
      (2L, Seq.empty[String]),
      (3L, Seq("x"))
    ).toDF("id", "arr")
      .select(col("id"), VectorFunctions.termCounts(col("arr")).as("tc"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getLong(1))))
      .toMap
    assert(df(1L).toSet == Set(("a", 3L), ("b", 1L)))
    assert(df(1L).head == ("a", 3L), "first-occurrence order")
    assert(df(2L).isEmpty)
    assert(df(3L) == Seq(("x", 1L)))
    // null elements are skipped, not counted or NPE'd
    val withNull = Seq(Tuple1(Seq[String]("a", null, "a"))).toDF("arr")
      .select(VectorFunctions.termCounts(col("arr")).as("tc"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(withNull == Seq(("a", 2L)))
  }

  test("wordBigrams equals the index-explode adjacent-pair formulation") {
    val t = split(col("text"), " ")
    val rowLocal = docs
      .select(col("doc_id"), explode(VectorFunctions.wordBigrams(t)).as("big"))
    val indexed = docs
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr("sequence(2, size(t))")).as("i"),
        col("t"))
      .select(col("doc_id"),
        concat_ws(" ", expr("t[i-2]"), expr("t[i-1]")).as("big"))
    assert(rowLocal.count() > 0)
    assert(rowLocal.exceptAll(indexed).isEmpty && indexed.exceptAll(rowLocal).isEmpty)
  }

  test("wordBigrams: fewer than two tokens yields an empty array") {
    import spark.implicits._
    val out = Seq(Seq("only"), Seq.empty[String], Seq("a", "b"))
      .toDF("arr")
      .select(VectorFunctions.wordBigrams(col("arr")).as("bg"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty && out(1).isEmpty && out(2) == Seq("a b"))
  }

  test("graft_term_counts and graft_word_bigrams are callable from SQL") {
    val row = spark.sql(
      """SELECT graft_term_counts(array('a','b','a')) AS tc,
        |       graft_word_bigrams(array('a','b','c')) AS bg""".stripMargin).head()
    val tc = row.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(tc == Seq(("a", 2L), ("b", 1L)))
    assert(row.getSeq[String](1) == Seq("a b", "b c"))
  }
}
