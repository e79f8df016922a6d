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
}
