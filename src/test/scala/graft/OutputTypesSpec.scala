package graft

import org.apache.spark.sql.types._

/** Registry-wide OUTPUT-SCHEMA lint — the build-time gate for the r11
  * "Seam B" escape (win_fill_locf / agg_argminmax shipped raw
  * DECIMAL(p,s) columns; the driver reads Spark parquet via
  * pyarrow→pandas where decimals become `object` cells while the
  * DuckDB oracle's decimals come through `.df()` as float64 — a
  * guaranteed hash fail even when every value matches).
  *
  * House rule D2/D12, enforced mechanically: a graded query's FINAL
  * schema may contain only hash-safe types — exact integers, doubles,
  * strings, dates/timestamps, booleans, and arrays thereof. Money and
  * other fixed-point values leave as exact cents/micros BIGINT or as
  * `outDouble` on BOTH sides; DecimalType is an internal computation
  * type only and must never reach the output.
  *
  * Schema inspection triggers analysis, not execution, so this spec
  * sweeps all ~170 keys in seconds.
  */
class OutputTypesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def hashSafe(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         StringType | DateType | TimestampType | BooleanType => true
    case ArrayType(et, _) => hashSafe(et)
    case _ => false // DecimalType, FloatType, BinaryType, StructType, MapType, ...
  }

  test("no graded query's output schema contains a non-hash-safe type") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, _) =>
      // shared analysis pass (r15): schema is a property of the
      // analyzed plan StaticPlans already caches for the gates
      val offending = StaticPlans.analyzed(spark, name).schema.fields
        .filterNot(f => hashSafe(f.dataType))
        .map(f => s"${f.name}:${f.dataType.simpleString}")
      if (offending.nonEmpty) Some(s"$name(${offending.mkString(", ")})") else None
    }
    assert(bad.isEmpty,
      s"non-hash-safe output columns in graded queries: ${bad.mkString("; ")}")
  }
}
