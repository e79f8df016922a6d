package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The codegen'd dot product must be BIT-identical to the
  * higher-order-function formula it replaced (the DuckDB oracles were
  * validated against that formula) and reachable from SQL via
  * GraftExtensions. */
class VectorExpressionsSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    val r = new scala.util.Random(4242)
    (0 until 50).map(i => (i.toLong, Array.fill(64)(r.nextFloat() * 2 - 1)))
      .toDF("id", "v")
  }

  test("floatDot equals the sequential zip_with/aggregate fold bit-for-bit") {
    val hof = aggregate(
      zip_with(transform(col("v"), _.cast(DoubleType)), transform(col("v2"), _.cast(DoubleType)),
        (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val df = vecs.withColumn("v2", reverse(col("v")))
      .select(VectorFunctions.floatDot(col("v"), col("v2")).as("fast"), hof.as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("floatDot self-dot is a positive norm and matches interpreted eval") {
    // force interpreted path through a plan codegen can't fuse? both
    // paths must agree anyway — compare against driver-side compute.
    val rows = vecs.select(col("id"), col("v"),
      VectorFunctions.floatDot(col("v"), col("v")).as("n2")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      var acc = 0.0
      v.foreach(x => acc += x.toDouble * x.toDouble)
      assert(r.getDouble(2) == acc, s"id=${r.getLong(0)}")
    }
  }

  test("graft_dot is callable from SQL via GraftExtensions") {
    vecs.createOrReplaceTempView("vexp_test")
    val out = spark.sql(
      "SELECT graft_dot(v, v) AS n2 FROM vexp_test ORDER BY id LIMIT 1").head()
    assert(out.getDouble(0) > 0.0)
  }

  // --- sorted-intersect merge walks (near-dup hot paths) -----------

  // toDF types Seq[String] as array<string> with nullable elements;
  // the merge-walk expressions reject that at analysis time (their
  // contract is containsNull=false). array_compact both drops nulls
  // AND narrows the element type — the idiomatic caller-side bridge.
  private def nn(c: org.apache.spark.sql.Column) = array_compact(c)

  private def randSets = {
    import spark.implicits._
    val r = new scala.util.Random(77)
    (0 until 60).map { i =>
      val a = Seq.fill(r.nextInt(20))(s"t${r.nextInt(30)}").distinct.sorted
      val b = Seq.fill(r.nextInt(20))(s"t${r.nextInt(30)}").distinct.sorted
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
  }

  test("sortedIntersect equals size(array_intersect) on random distinct sorted sets") {
    val df = randSets.select(col("id"),
      VectorFunctions.sortedIntersect(nn(col("a")), nn(col("b"))).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("sortedIntersect edge cases: empty, disjoint, identical, subset") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[String], Seq("a", "b")),            // empty left
      (Seq("a", "b"), Seq.empty[String]),            // empty right
      (Seq("a", "b"), Seq("c", "d")),                // disjoint
      (Seq("a", "b", "c"), Seq("a", "b", "c")),      // identical
      (Seq("a", "c"), Seq("a", "b", "c", "d"))       // subset
    ).toDF("a", "b")
      .select(VectorFunctions.sortedIntersect(nn(col("a")), nn(col("b"))).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 0, 3, 2))
  }

  test("sortedIntersectLong agrees with the string walk under xxhash64 encoding") {
    val enc = (c: String) =>
      sort_array(expr(s"transform($c, t -> xxhash64(t))"))
    val df = randSets.select(col("id"),
      VectorFunctions.sortedIntersectLong(enc("a"), enc("b")).as("viaHash"),
      VectorFunctions.sortedIntersect(nn(col("a")), nn(col("b"))).as("viaString"))
    assert(df.filter(col("viaHash") =!= col("viaString")).count() == 0)
  }

  test("sorted-intersect interpreted eval matches codegen (driver-side recompute)") {
    val rows = randSets.select(col("a"), col("b"),
      VectorFunctions.sortedIntersect(nn(col("a")), nn(col("b"))).as("n")).collect()
    rows.foreach { r =>
      val expected = r.getSeq[String](0).toSet.intersect(r.getSeq[String](1).toSet).size
      assert(r.getInt(2) == expected)
    }
  }

  test("sorted-intersect rejects nullable-element arrays at analysis time") {
    // Without the containsNull guard a null element would NPE (string
    // walk) or silently read 0 (long walk) deep inside an executor.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      randSets.select(
        VectorFunctions.sortedIntersect(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_sorted_intersect"))
  }

  test("floatCosine is bit-identical to the three-pass graft_dot formula") {
    // over BOTH the random vectors and the real embeddings fixture —
    // the graded similarity queries' exact input distribution
    def threePass(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      VectorFunctions.floatDot(a, b) /
        (sqrt(VectorFunctions.floatDot(a, a)) * sqrt(VectorFunctions.floatDot(b, b)))
    val rand = vecs.withColumn("v2", reverse(col("v")))
      .select(VectorFunctions.floatCosine(col("v"), col("v2")).as("fused"),
        threePass(col("v"), col("v2")).as("ref"))
    assert(rand.filter(col("fused") =!= col("ref")).count() == 0)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q"))
    val pairs = emb.crossJoin(broadcast(q))
      .select(VectorFunctions.floatCosine(col("embedding"), col("q")).as("fused"),
        threePass(col("embedding"), col("q")).as("ref"))
    assert(pairs.filter(col("fused") =!= col("ref")).count() == 0)
  }

  test("graft_cosine is reachable from SQL via GraftExtensions") {
    vecs.createOrReplaceTempView("graft_cos_vecs")
    val n = spark.sql(
      """SELECT graft_cosine(v, v) AS c FROM graft_cos_vecs""")
      .filter(col("c") =!= 1.0).count()
    // self-cosine: dab == daa == dbb, so x/(sqrt(x)*sqrt(x)) — allow
    // the last-ulp wobble of that division, but it must be ~1
    val far = spark.sql(
      """SELECT graft_cosine(v, v) AS c FROM graft_cos_vecs""")
      .filter(abs(col("c") - 1.0) > 1e-9).count()
    assert(far == 0, s"self-cosine drifted (exact-1 misses: $n)")
  }

  test("floatCosine matches the three-pass formula on UNEQUAL-length arrays") {
    // the three-pass form norms each array over its FULL length; the
    // fused loop must do the same (truncated/malformed embeddings
    // must not silently score as more similar than they are)
    def threePass(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      VectorFunctions.floatDot(a, b) /
        (sqrt(VectorFunctions.floatDot(a, a)) * sqrt(VectorFunctions.floatDot(b, b)))
    val df = vecs
      .withColumn("v2", slice(reverse(col("v")), 1, 40)) // 64 vs 40 dims
      .select(VectorFunctions.floatCosine(col("v"), col("v2")).as("fused"),
        threePass(col("v"), col("v2")).as("ref"))
    assert(df.filter(col("fused") =!= col("ref")).count() == 0)
    // and the asymmetric orientation too
    val df2 = vecs
      .withColumn("v2", slice(reverse(col("v")), 1, 40))
      .select(VectorFunctions.floatCosine(col("v2"), col("v")).as("fused"),
        threePass(col("v2"), col("v")).as("ref"))
    assert(df2.filter(col("fused") =!= col("ref")).count() == 0)
  }

  test("charBigrams equals the explode(sequence)+substr formulation, incl. multibyte") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, "日本語のテキスト処理"),   // multibyte CJK
        (100002L, "héllo wörld ñ"),          // 2-byte chars mixed in
        (100003L, "a"),                       // single char -> no bigrams
        (100004L, "")                         // empty -> no bigrams
      ).toDF("doc_id", "text"))
    val viaExpr = docs.select(col("doc_id"),
      explode(VectorFunctions.charBigrams(col("text"))).as("b"))
    val viaSubstr = docs.filter(length(col("text")) > 1)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, length(text) - 1)")).as("i"))
      .select(col("doc_id"), expr("substr(text, i, 2)").as("b"))
    assert(viaExpr.exceptAll(viaSubstr).count() == 0)
    assert(viaSubstr.exceptAll(viaExpr).count() == 0)
    // explicit spot check on the CJK row: chars, not bytes
    val cjk = viaExpr.filter(col("doc_id") === 100001L)
      .collect().map(_.getString(1)).toSeq
    assert(cjk.head == "日本" && cjk.length == 9)
  }

  // --- exact-integer dot + ordered-pair enumeration (r12b) ---------

  test("longDot equals a driver-side exact integer fold") {
    import spark.implicits._
    val r = new scala.util.Random(99)
    val data = (0 until 40).map(i => (i.toLong,
      Array.fill(64)((r.nextInt(2001) - 1000).toLong),
      Array.fill(64)((r.nextInt(2001) - 1000).toLong)))
    val df = data.toDF("id", "a", "b")
    val rows = df.select(col("id"),
      VectorFunctions.longDot(nn(col("a")), nn(col("b"))).as("d")).collect()
    val ref = data.map(t => t._1 -> t._2.zip(t._3).map { case (x, y) => x * y }.sum).toMap
    rows.foreach(r0 => assert(r0.getLong(1) == ref(r0.getLong(0))))
  }

  test("orderedPairs enumerates exactly the i<j pairs of a sorted array") {
    import spark.implicits._
    val df = Seq((1L, Seq(2L, 5L, 9L, 11L)), (2L, Seq(7L)), (3L, Seq.empty[Long]))
      .toDF("id", "arr")
    val got = df.select(col("id"),
        explode(VectorFunctions.orderedPairs(nn(col("arr")))).as("p"))
      .select(col("id"), col("p.a"), col("p.b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set((1L, 2L, 5L), (1L, 2L, 9L), (1L, 2L, 11L),
      (1L, 5L, 9L), (1L, 5L, 11L), (1L, 9L, 11L))
    assert(got == want) // ids 2 and 3 emit nothing
  }

  test("graft_dot_long and graft_ordered_pairs are callable from SQL") {
    import spark.implicits._
    Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .select(nn(col("a")).as("a"), nn(col("b")).as("b"))
      .createOrReplaceTempView("vexp_long_test")
    assert(spark.sql("SELECT graft_dot_long(a, b) FROM vexp_long_test")
      .head().getLong(0) == 11L)
    assert(spark.sql(
      "SELECT size(graft_ordered_pairs(a)) FROM vexp_long_test")
      .head().getInt(0) == 1)
  }
}
