package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused shingle-prep expressions must be BIT-identical to the
  * declarative lambda stacks they replaced — the DuckDB oracles for
  * the whole near-dup family hash against those formulations. */
class ShingleExpressionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def toks = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), split(col("text"), " ").as("t"))
    .filter(size(col("t")) >= 3)

  test("shingleHashes(t, 3) equals sort_array(array_distinct(transform(xxhash64)))") {
    val fused = toks.select(col("doc_id"),
      VectorFunctions.shingleHashes(col("t"), 3).as("sh"))
    val declarative = toks.select(col("doc_id"), sort_array(array_distinct(expr(
      "transform(sequence(3, size(t)), i -> xxhash64(concat_ws(' ', t[i-3], t[i-2], t[i-1])))")))
      .as("sh"))
    assert(fused.count() > 0)
    assert(fused.exceptAll(declarative).isEmpty && declarative.exceptAll(fused).isEmpty)
  }

  test("shingleHashes(t, 1) equals the token-hash form") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fused = docs.select(col("doc_id"),
      VectorFunctions.shingleHashes(split(col("text"), " "), 1).as("ts"))
    val declarative = docs.select(col("doc_id"),
      sort_array(expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))")).as("ts"))
    assert(fused.exceptAll(declarative).isEmpty && declarative.exceptAll(fused).isEmpty)
  }

  test("minhashPrep reproduces sl and all 8 md5-window minima exactly") {
    val fused = toks.select(col("doc_id"),
      VectorFunctions.minhashPrep(col("t"), 3).as("mp"))
      .select(Seq(col("doc_id"), col("mp.sl").as("sl")) ++ (0 until 8).map(i =>
        col("mp.mins").getItem(i).as(s"h$i")): _*)
    val declarative = toks
      .select(col("doc_id"), expr(
        "transform(sequence(3, size(t)), i -> concat_ws(' ', t[i-3], t[i-2], t[i-1]))").as("sh"))
      .select(col("doc_id"),
        sort_array(array_distinct(expr("transform(sh, x -> xxhash64(x))"))).as("sl"),
        expr("transform(sh, x -> md5(x))").as("hs"))
      .select(Seq(col("doc_id"), col("sl")) ++ (0 until 8).map(i =>
        expr(s"array_min(transform(hs, h -> substring(h, ${3 * i + 1}, 8)))").as(s"h$i")): _*)
    assert(fused.count() > 0)
    assert(fused.exceptAll(declarative).isEmpty && declarative.exceptAll(fused).isEmpty)
  }

  test("fewer than n tokens yields an empty hash set and null minima") {
    import spark.implicits._
    val row = Seq(Tuple1(Seq("a", "b")))
      .toDF("t")
      .select(VectorFunctions.shingleHashes(col("t"), 3).as("sh"),
        VectorFunctions.minhashPrep(col("t"), 3).as("mp"))
      .head()
    assert(row.getSeq[Long](0).isEmpty)
    val mp = row.getStruct(1)
    assert(mp.getSeq[Long](0).isEmpty)
    assert(mp.getSeq[String](1).forall(_ == null))
  }

  test("graft_shingle_hashes / graft_minhash_prep are callable from SQL") {
    val row = spark.sql(
      """SELECT graft_shingle_hashes(array('a','b','c','a','b','c'), 3) AS sh,
        |       graft_minhash_prep(array('a','b','c'), 3).mins[0] AS m0""".stripMargin)
      .head()
    // 4 windows, 2 distinct 3-grams ("a b c", "b c a", "c a b", "a b c")
    assert(row.getSeq[Long](0).size == 3)
    assert(row.getString(1) != null && row.getString(1).length == 8)
  }

  test("SQL n argument accepts any foldable integral, rejects non-foldable cleanly") {
    // ADVICE r7: a 2L long literal / CAST / folded arithmetic must all
    // work, and a column reference must fail analysis with a real
    // AnalysisException (NON_FOLDABLE_ARGUMENT), not a raw
    // IllegalArgumentException from inside the function builder.
    val ok = spark.sql(
      """SELECT size(graft_shingle_hashes(array('a','b','c','d'), 3L)) AS a,
        |       size(graft_shingle_hashes(array('a','b','c','d'), CAST(3 AS INT))) AS b,
        |       size(graft_shingle_hashes(array('a','b','c','d'), 1 + 2)) AS c""".stripMargin)
      .head()
    assert(ok.getInt(0) == 2 && ok.getInt(1) == 2 && ok.getInt(2) == 2)
    import spark.implicits._
    Seq((Seq("a", "b"), 2)).toDF("t", "n").createOrReplaceTempView("litint_probe")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_shingle_hashes(t, n) FROM litint_probe").collect()
    }
    assert(e.getCondition == "NON_FOLDABLE_ARGUMENT", e.toString)
  }

  test("foldable-but-invalid n values get the value error class, not NON_FOLDABLE") {
    // ADVICE r8: a null literal or an out-of-Int-range long IS
    // foldable — reporting it as NON_FOLDABLE_ARGUMENT misleads;
    // these must surface as INVALID_PARAMETER_VALUE.INTEGER.
    for (bad <- Seq("CAST(NULL AS INT)", "5000000000", "2.5")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT graft_shingle_hashes(array('a','b'), $bad)").collect()
      }
      assert(e.getCondition == "INVALID_PARAMETER_VALUE.INTEGER",
        s"for n=$bad: $e")
    }
  }
}
