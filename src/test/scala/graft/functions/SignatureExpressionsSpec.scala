package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Paired equivalence for the fused signature folds (r8): every
  * rewrite that swaps a declarative higher-order tree for a compiled
  * expression ships with a spec proving bit-equality against the
  * exact tree it replaced, on real fixture data AND on adversarial
  * shapes the fixtures can't produce (ShingleExpressionsSpec
  * discipline). */
class SignatureExpressionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The r7 interpreted fold dedup_simhash used, verbatim. */
  private val simhashSql =
    """aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) ->
      |  acc + IF(
      |    aggregate(hts, CAST(0 AS BIGINT),
      |      (a, t) -> a + IF((t.h >> j) & 1 = 1, t.tf, -t.tf)) > 0,
      |    shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin

  /** The r7 interpreted fold sim_lsh_bucketed used, verbatim. */
  private val lshSql =
    """aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, p) ->
      |  acc + IF(
      |    aggregate(zip_with(embedding, slice(signs, p * 64 + 1, 64), (x, sg) ->
      |        coalesce(sg * CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT), CAST(0 AS BIGINT))),
      |      CAST(0 AS BIGINT), (a, b) -> a + b) > 0,
      |    shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT)))""".stripMargin

  test("graft_simhash equals the declarative nested fold on the corpus") {
    val hts = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast(LongType))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("h"), col("tf"))).as("hts"))
    val diff = hts
      .select(VectorFunctions.simhashSig(col("hts"), 32).as("fused"),
        expr(simhashSql).as("declarative"))
      .filter(col("fused") =!= col("declarative"))
      .count()
    assert(diff == 0L)
  }

  test("graft_simhash matches on adversarial (h, tf) shapes") {
    // negative hashes (arithmetic >> parity), zero tf, exact vote
    // ties (vote = 0 must NOT set the bit), empty array
    val rows = Seq(
      Seq((-1L, 3L), (Long.MinValue, 2L)),
      Seq((0L, 5L)),
      Seq((7L, 1L), (7L, 1L), (~7L, 2L)), // per-bit tie on bits 0-2
      Seq.empty[(Long, Long)])
    import spark.implicits._
    val df = rows.toDF("pairs")
      .select(expr("transform(pairs, p -> struct(p._1 AS h, p._2 AS tf))").as("hts"))
    val bad = df.select(VectorFunctions.simhashSig(col("hts"), 32).as("fused"),
        expr(simhashSql).as("declarative"))
      .filter(col("fused") =!= col("declarative")).count()
    assert(bad == 0L)
  }

  test("graft_lsh_bucket equals the declarative nested fold on the embeddings") {
    val signsRow = spark.range(1).select(expr(
      """transform(sequence(0, 511), k ->
        |  IF(CAST(conv(substring(md5(concat_ws(':', k div 64, k % 64 + 1)), 1, 2), 16, 10) AS INT) % 2 = 0,
        |     CAST(1 AS BIGINT), CAST(-1 AS BIGINT)))""".stripMargin).as("signs"))
    val diff = Tables.embeddings(spark, sf)
      .crossJoin(broadcast(signsRow))
      .select(VectorFunctions.lshBucket(col("embedding"), col("signs"), 8, 64).as("fused"),
        expr(lshSql).as("declarative"))
      .filter(col("fused") =!= col("declarative"))
      .count()
    assert(diff == 0L)
  }

  test("graft_lsh_bucket matches zip_with padding on short/null-element inputs") {
    // a 3-dim vector against 8×64 signs (zip_with null-pads the
    // vector tail to 0 terms), a null component, negative components
    // (floor rounds DOWN), and an empty vector
    import spark.implicits._
    val vecs: Seq[Seq[java.lang.Float]] = Seq(
      Seq(0.5f, -0.25f, 1.75f).map(java.lang.Float.valueOf),
      Seq(java.lang.Float.valueOf(0.9f), null, java.lang.Float.valueOf(-2.1f)),
      Seq.empty[java.lang.Float])
    val signsRow = spark.range(1).select(expr(
      """transform(sequence(0, 511), k ->
        |  IF(CAST(conv(substring(md5(concat_ws(':', k div 64, k % 64 + 1)), 1, 2), 16, 10) AS INT) % 2 = 0,
        |     CAST(1 AS BIGINT), CAST(-1 AS BIGINT)))""".stripMargin).as("signs"))
    val bad = vecs.toDF("embedding")
      .select(col("embedding").cast(ArrayType(FloatType)).as("embedding"))
      .crossJoin(broadcast(signsRow))
      .select(VectorFunctions.lshBucket(col("embedding"), col("signs"), 8, 64).as("fused"),
        expr(lshSql).as("declarative"))
      .filter(col("fused") =!= col("declarative")).count()
    assert(bad == 0L)
  }

  test("a NULL top-level array folds to signature/bucket 0, like the replaced trees") {
    // ADVICE r8: the SQL folds yield 0 on a null input array (the
    // nulled inner aggregate makes IF(null > 0, …) pick 0 for every
    // bit) — unreachable from the graded consumers, but the compiled
    // expressions must agree, not return NULL. Asserted against the
    // verbatim declarative trees on the same null rows.
    import spark.implicits._
    val nullHts = Seq(Tuple1(null: Seq[(Long, Long)]), Tuple1(Seq((5L, 2L))))
      .toDF("pairs")
      .select(expr("transform(pairs, p -> struct(p._1 AS h, p._2 AS tf))").as("hts"))
    val simRows = nullHts
      .select(VectorFunctions.simhashSig(col("hts"), 32).as("fused"),
        expr(simhashSql).as("declarative"))
      .collect()
    assert(simRows.forall(r => !r.isNullAt(0) && r.getLong(0) == r.getLong(1)),
      simRows.mkString("; "))

    val signsExpr =
      """transform(sequence(0, 511), k ->
        |  IF(CAST(conv(substring(md5(concat_ws(':', k div 64, k % 64 + 1)), 1, 2), 16, 10) AS INT) % 2 = 0,
        |     CAST(1 AS BIGINT), CAST(-1 AS BIGINT)))""".stripMargin
    val lshRows = Seq(
        (null: Seq[Float], false), (Seq(0.5f, -1.5f), true), (Seq(0.5f, -1.5f), false))
      .toDF("vec", "nullSigns")
      .select(col("vec").cast(ArrayType(FloatType)).as("embedding"),
        when(!col("nullSigns"), expr(signsExpr)).as("signs"))
      .select(VectorFunctions.lshBucket(col("embedding"), col("signs"), 8, 64).as("fused"),
        expr(lshSql).as("declarative"))
      .collect()
    assert(lshRows.forall(r => !r.isNullAt(0) && r.getLong(0) == r.getLong(1)),
      lshRows.mkString("; "))
  }

  test("the interpreted eval path folds top-level null to 0 too") {
    // The dataframe-level null test above typically runs through
    // codegen; the eval override is the path Spark's silent
    // codegen-failure fallback takes. Call it directly.
    import org.apache.spark.sql.catalyst.expressions.Literal
    val htsType = ArrayType(StructType(Seq(
      StructField("h", LongType), StructField("tf", LongType))))
    assert(SimhashSig(Literal.create(null, htsType), 32).eval(null) == 0L)
    assert(LshBucket(
      Literal.create(null, ArrayType(FloatType)),
      Literal.create(null, ArrayType(LongType)), 8, 64).eval(null) == 0L)
  }

  test("graft_simhash / graft_lsh_bucket are callable from SQL") {
    val row = spark.sql(
      """SELECT graft_simhash(array(struct(CAST(5 AS BIGINT) AS h, CAST(2 AS BIGINT) AS tf)), 32) AS s,
        |       graft_lsh_bucket(CAST(array(1.5, -0.5) AS ARRAY<FLOAT>),
        |                        CAST(array(1, -1, 1, -1) AS ARRAY<BIGINT>), 2, 2) AS b""".stripMargin)
      .head()
    // h=5 → bits 0 and 2 get +2 votes, every other bit -2 → sig = 5
    assert(row.getLong(0) == 5L)
    // both planes see sign row (1, -1): 1*1500 + (-1)*(-500) = 2000
    // > 0 → bits 0 and 1 → bucket = 3
    assert(row.getLong(1) == 3L)
  }
}
