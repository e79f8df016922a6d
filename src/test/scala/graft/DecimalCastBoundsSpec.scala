package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Registry-wide DECIMAL→DOUBLE magnitude gate (r13) — turns
  * PLANS.md's "Oracle-contract numeric-conversion hazard" rule into
  * a mechanical check, the OutputTypesSpec pattern applied to
  * operand RANGES instead of output types.
  *
  * The hazard (measured, r12): DuckDB 1.0.0's int128→DOUBLE cast is
  * not always correctly rounded above ~2^63 (1 ulp low on e.g.
  * 25220379160838261152), while Spark's BigDecimal path rounds
  * correctly — so any graded key that casts a wide exact-decimal sum
  * to DOUBLE is only value-luckily correct once the sum passes 2^53
  * (the last magnitude where every integer is exactly representable
  * and both engines' conversions are trivially identical).
  *
  * Enforcement: every registered query's analyzed plan is swept for
  * Cast(decimal→double) nodes whose operand TYPE could hold ≥ 2^53
  * (precision − scale > 15); each such cast is rewritten in place to
  * raise at RUNTIME if |operand| > 2^53, and the flagged queries are
  * then executed against sf0.1 (the grading tier where
  * agg_zscore_outliers originally tripped). A key whose sums outgrow
  * 2^53 at sf0.1 now fails `sbt test` loudly instead of shipping
  * fixture-lucky — and the deliberately-overflowing probe test pins
  * that the guard actually trips.
  */
class DecimalCastBoundsSpec extends SparkSpec {

  private val sfRun = "/root/testdata/sf0.1"
  private val two53 = BigDecimal(2).pow(53)

  /** Operand decimal types that can represent ≥ 2^53 (16+ integer
    * digits); narrower decimals are range-safe by construction. */
  private def wide(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.precision - d.scale > 15
    case _ => false
  }

  /** Rewrite each wide decimal→double cast to assert |x| ≤ 2^53
    * before converting. Returns the guarded plan + cast count. */
  private def guarded(plan: LogicalPlan): (LogicalPlan, Int) = {
    var n = 0
    // Bottom-up on purpose: the guarded form still CONTAINS the
    // original cast, and a top-down transform would descend into its
    // own replacement forever.
    val p = plan.transformUp { case op => op.transformExpressionsUp {
      case c: Cast if c.dataType == DoubleType && wide(c.child.dataType) =>
        n += 1
        val dt = c.child.dataType.asInstanceOf[DecimalType]
        val lim = Literal(Decimal(two53, dt.precision, dt.scale), dt)
        val err = Cast(
          RaiseError(Literal(
            s"decimal->double operand exceeds 2^53 (${dt.simpleString}): " +
              "rescale units (PLANS.md numeric-conversion hazard)")),
          DoubleType)
        If(LessThanOrEqual(Abs(c.child), lim), c, err)
    } }
    (p, n)
  }

  private def flaggedQueries: Seq[(String, Int)] =
    SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val (_, n) = guarded(StaticPlans.analyzed(spark, name))
      if (n > 0) Some(name -> n) else None
    }

  test("every wide decimal->double cast stays below 2^53 at sf0.1") {
    val flagged = flaggedQueries
    info(s"${flagged.size} graded queries carry wide decimal->double casts: " +
      flagged.map { case (k, n) => s"$k($n)" }.mkString(", "))
    val failures = flagged.flatMap { case (name, _) =>
      val (gp, _) = guarded(
        SparkEntry.queries(name)(spark, sfRun).queryExecution.analyzed)
      try {
        // noop sink: consumes every output column, so no guard is
        // pruned away (count() would drop the projections).
        ColumnBridge.ofRows(spark, gp)
          .write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"decimal sums exceeding 2^53 before a DOUBLE cast at sf0.1:\n${failures.mkString("\n")}")
  }

  test("the guard trips on a deliberately overflowing cast (probe)") {
    // 2^53 + 4097: representable as decimal, not exactly as double —
    // exactly the class the gate exists to catch.
    val df = spark.range(1).select(
      (lit("9007199254745089").cast(DecimalType(38, 0)) + col("id"))
        .cast(DecimalType(38, 0)).cast(DoubleType).as("d"))
    val (gp, n) = guarded(df.queryExecution.analyzed)
    assert(n >= 1, "probe plan lost its wide decimal->double cast")
    val thrown = intercept[Throwable] {
      ColumnBridge.ofRows(spark, gp).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(thrown).exists(_.contains("exceeds 2^53")),
      s"guard raised the wrong error: $thrown")
  }

  test("an in-range wide cast passes the guard unchanged (probe)") {
    val df = spark.range(10).select(
      col("id").cast(DecimalType(38, 0)).cast(DoubleType).as("d"))
    val (gp, n) = guarded(df.queryExecution.analyzed)
    assert(n >= 1)
    val rows = ColumnBridge.ofRows(spark, gp).collect()
    assert(rows.length == 10 && rows.map(_.getDouble(0)).sum == 45.0)
  }
}
