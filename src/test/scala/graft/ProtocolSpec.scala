package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Protocol.scala is the load-bearing determinism layer — its casts
  * must behave exactly as documented (HALF_UP, exact pass-through,
  * exact double emission). */
class ProtocolSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, v: Double): Any = {
    import spark.implicits._
    Seq(v).toDF("v").select(c).head().get(0)
  }

  test("money cast is HALF_UP at scale 2") {
    assert(one(Protocol.money(col("v")), 1.005).toString == "1.01")
    assert(one(Protocol.money(col("v")), -1.005).toString == "-1.01")
    assert(one(Protocol.money(col("v")), 1.004).toString == "1.00")
  }

  test("qty cast keeps 4 fractional digits exactly") {
    assert(one(Protocol.qty(col("v")), 12.3456).toString == "12.3456")
  }

  test("sums of money are exact and partition-order-free") {
    import spark.implicits._
    val xs = Seq(0.1, 0.2, 0.3, -0.6) // classic float-sum trap: != 0.0 in double
    val viaProtocol = spark.createDataset(xs).toDF("v")
      .agg(Protocol.sumMoney(col("v"))).head().getDouble(0)
    assert(viaProtocol == 0.0, "decimal path must cancel exactly")
  }

  test("avgOf is one float division on exact operands") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 4.0).toDF("v")
    val got = df.agg(Protocol.avgOf(sum(Protocol.money(col("v"))), count(lit(1))))
      .head().getDouble(0)
    assert(got == 7.0 / 3.0)
  }

  test("tsSec truncates to whole seconds") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-02 03:04:05.678901")
    val got = Seq(t).toDF("v").select(Protocol.tsSec(col("v"))).head().getTimestamp(0)
    assert(got == java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
  }
}
