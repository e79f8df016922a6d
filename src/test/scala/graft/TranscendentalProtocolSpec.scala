package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{col, floor, lit, log, pow, round}
import org.apache.spark.sql.types._

/** Registry-wide transcendental-protocol gate (r14, VERDICT r13
  * item 4) — the DecimalCastBoundsSpec pattern applied to the OTHER
  * cross-engine numeric seam: libm. Spark's and DuckDB's ln/log/exp/
  * pow agree only to within ~1 ulp, so a graded key may emit a raw
  * transcendental result ONLY after quantizing it coarsely enough
  * that a last-ulp disagreement can never flip the rounded value.
  * The sanctioned spellings (PLANS.md numeric protocol):
  *
  *   - `ROUND(ln(...), 6)` (→ the shared 6-dp DECIMAL finish) — the
  *     `drift_unigram_jsd` protocol;
  *   - `floor(ln(...) * 1000 + 0.5)` — the integer-quantize
  *     (millinat / estimator-cell) spelling;
  *   - `CAST(ln(...) AS DECIMAL(p,s))` — the fixed-tree protocol
  *     (exact integer operands, ONE correctly-rounded libm step,
  *     quantized into a decimal before any further float algebra);
  *   - `pow(2, k)` — base-2 powers of integral exponents are exact
  *     dyadic doubles, not libm approximations.
  *
  * Both sides of every oracle pair are swept: the DuckDB SQL string
  * (a parenthesis-matching scanner — enclosure by ROUND/FLOOR/
  * CAST-to-DECIMAL at any depth protects) and the Spark analyzed plan
  * (an expression-tree walk — a Round/BRound/Floor/Cast-to-decimal
  * ancestor protects). A new transcendental key that ships
  * unprotected now fails `sbt test` loudly, and the deliberately-
  * unprotected probes pin that both scanners actually trip. */
class TranscendentalProtocolSpec extends SparkSpec {

  // ---- oracle-SQL scanner -------------------------------------------------

  private val transcendentals =
    Set("ln", "log", "log2", "log10", "exp", "pow", "power")
  private val protectors = Set("round", "floor")

  /** Occurrences of transcendental function calls in `sql` that are
    * not enclosed (at any paren depth) by ROUND/FLOOR or by a CAST
    * whose target is DECIMAL, and are not whitelisted exact-dyadic
    * `pow(2, …)`. Returns human-readable context snippets. */
  private[graft] def oracleViolations(sql: String): Seq[String] = {
    val s = sql
    // matching-paren map
    val m = new Array[Int](s.length)
    val st = scala.collection.mutable.Stack[Int]()
    for (i <- s.indices) s(i) match {
      case '(' => st.push(i)
      case ')' => if (st.nonEmpty) m(st.pop()) = i
      case _ => ()
    }
    def fnameBefore(open: Int): String = {
      var j = open - 1
      while (j >= 0 && s(j).isWhitespace) j -= 1
      val e = j
      while (j >= 0 && (s(j).isLetterOrDigit || s(j) == '_')) j -= 1
      s.substring(j + 1, e + 1).toLowerCase
    }
    val bad = scala.collection.mutable.Buffer[String]()
    val frames = scala.collection.mutable.Stack[(String, Int)]() // (fname, open)
    for (i <- s.indices) s(i) match {
      case '(' =>
        val fn = fnameBefore(i)
        if (transcendentals(fn)) {
          val dyadic = (fn == "pow" || fn == "power") &&
            s.substring(i + 1, math.min(s.length, i + 8))
              .matches("""\s*2(\.0)?\s*,[\s\S]*""")
          val prot = frames.exists { case (name, open) =>
            protectors(name) ||
              (name == "cast" && m(open) > open &&
                s.substring(open, m(open)).toUpperCase.contains("AS DECIMAL"))
          }
          if (!prot && !dyadic)
            bad += s.substring(math.max(0, i - 12),
              math.min(s.length, i + 28)).replaceAll("\\s+", " ")
        }
        frames.push((fn, i))
      case ')' => if (frames.nonEmpty) frames.pop()
      case _ => ()
    }
    bad.toSeq
  }

  // ---- Spark-plan scanner -------------------------------------------------

  private val transcendentalNodes =
    Set("Log", "Logarithm", "Log2", "Log10", "Log1p", "Exp", "Expm1", "Pow")

  private[graft] def planViolations(plan: LogicalPlan): Seq[String] = {
    val bad = scala.collection.mutable.Buffer[String]()
    def walkE(e: Expression, prot: Boolean): Unit = {
      val name = e.getClass.getSimpleName
      // base accepted as dyadic when it FOLDS to 2.0 (ADVICE r14): an
      // analyzed expr("pow(2, x)") carries Cast(Literal(2, Int)) as
      // the first child, not a bare double literal — evaluating the
      // foldable child covers both spellings without widening the
      // whitelist past constants.
      val dyadic = name == "Pow" && (e.children.headOption.exists { c =>
        c.foldable && (c.eval(null) match {
          case d: Double => d == 2.0
          case f: Float => f == 2.0f
          case i: Int => i == 2
          case l: Long => l == 2L
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble == 2.0
          case _ => false
        })
      })
      if (transcendentalNodes(name) && !prot && !dyadic)
        bad += s"$name(${e.sql.take(80)})"
      val protChild = prot ||
        name == "Round" || name == "BRound" || name == "Floor" ||
        (e match {
          case c: Cast => c.dataType.isInstanceOf[DecimalType]
          case _ => false
        })
      e.children.foreach(walkE(_, protChild))
      e match {
        case sub: SubqueryExpression => walkP(sub.plan)
        case _ => ()
      }
    }
    def walkP(p: LogicalPlan): Unit =
      p.foreach(node => node.expressions.foreach(walkE(_, prot = false)))
    walkP(plan)
    bad.toSeq
  }

  // ---- registry sweeps ----------------------------------------------------

  test("every oracle's transcendentals are quantize-protected") {
    val viol = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (key, sql) => oracleViolations(sql).map(v => s"$key: …$v…")
    }
    assert(viol.isEmpty,
      s"unprotected ln/log/exp/pow in oracle SQL (spell per the " +
        s"ROUND(…,6)/floor-quantize/CAST-AS-DECIMAL protocol):\n${viol.mkString("\n")}")
  }

  test("every Spark plan's transcendentals are quantize-protected") {
    val viol = SparkEntry.queries.keys.toSeq.sorted.flatMap { key =>
      planViolations(StaticPlans.analyzed(spark, key)).map(v => s"$key: $v")
    }
    assert(viol.isEmpty,
      s"unprotected transcendental expressions in Spark plans:\n${viol.mkString("\n")}")
  }

  // ---- probes: the scanners actually trip ---------------------------------

  test("oracle scanner flags a deliberately unprotected ln (probe)") {
    assert(oracleViolations("SELECT ln(x) / n AS h FROM t").nonEmpty)
    assert(oracleViolations("SELECT exp(x) FROM t").nonEmpty)
    assert(oracleViolations("SELECT pow(x, 2) FROM t").nonEmpty,
      "pow with non-dyadic BASE must flag (only base-2 is exact)")
    assert(oracleViolations("SELECT ROUND(ln(x), 6) FROM t").isEmpty)
    assert(oracleViolations("SELECT floor(ln(x) * 1000 + 0.5) FROM t").isEmpty)
    assert(oracleViolations(
      "SELECT CAST(w * (ln(c / n) / ln(2.0)) AS DECIMAL(28,18)) FROM t").isEmpty)
    assert(oracleViolations("SELECT pow(2.0, -m) FROM t").isEmpty)
    assert(oracleViolations("SELECT CAST(ln(x) AS DOUBLE) FROM t").nonEmpty,
      "a cast to DOUBLE is not a quantize — must still flag")
  }

  test("plan scanner flags a deliberately unprotected log (probe)") {
    val base = spark.range(3).select((col("id") + 1).cast(DoubleType).as("x"))
    assert(planViolations(base.select(log(col("x")).as("l"))
      .queryExecution.analyzed).nonEmpty)
    assert(planViolations(base.select(round(log(col("x")), 6).as("l"))
      .queryExecution.analyzed).isEmpty)
    assert(planViolations(base.select(floor(log(col("x")) * 1000 + 0.5).as("l"))
      .queryExecution.analyzed).isEmpty)
    assert(planViolations(base.select(log(col("x"))
        .cast(DecimalType(28, 18)).as("l"))
      .queryExecution.analyzed).isEmpty)
    assert(planViolations(base.select(pow(lit(2.0), -col("x")).as("p"))
      .queryExecution.analyzed).isEmpty)
    assert(planViolations(base.select(pow(col("x"), lit(2.0)).as("p"))
      .queryExecution.analyzed).nonEmpty,
      "pow with non-dyadic BASE must flag")
    // ADVICE r14: a SQL-spelled base-2 power analyzes to
    // Pow(Cast(Literal(2, Int), Double), …) — the foldable-eval
    // whitelist must accept it, not just a bare double literal.
    assert(planViolations(base.selectExpr("pow(2, x) AS p")
      .queryExecution.analyzed).isEmpty,
      "SQL-spelled pow(2, x) is exact dyadic and must NOT flag")
  }
}
