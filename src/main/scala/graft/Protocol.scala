package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine determinism protocol (SURVEY.md §0.3, rules D1–D11).
  *
  * The driver's correctness gate is a HASH match between our parquet
  * output and DuckDB running `oracleSql` on the same inputs, so every
  * graded query must be bit-deterministic across two independent
  * engines. The rules, mechanized here:
  *
  *  - D2: never aggregate raw doubles. Cast to small-precision decimals
  *    first; decimal add/multiply is exact, hence order-independent under
  *    Spark's partial/final shuffle aggregation AND equal to DuckDB's
  *    sequential scan result.
  *  - Operand precisions are kept low (12,2 / 12,4 / 6,2) and at the
  *    NATURAL scale of the source data (fixtures carry ≤2 fractional
  *    digits; quantities ≤1), so products and sums keep modest scales,
  *    never approach DECIMAL(38) overflow, and — critically — are
  *    never rescaled down. No rescale ⇒ no rounding ⇒ no exposure to
  *    the engines' divergent rounding modes (Spark casts HALF_UP;
  *    DuckDB's decimal cast TRUNCATES — verified on 1.0.0).
  *  - Final outputs cast exact decimals to DOUBLE. While the unscaled
  *    value stays below 2^53 (true for every fixture aggregate through
  *    sf0.1 at our scales ≤6), both engines' conversions are correctly
  *    rounded to nearest ⇒ bit-identical.
  *  - D3: AVG is never called natively: avg = CAST(sum_dec AS DOUBLE)
  *    / count — one float division on identical operands.
  *  - If a query ever DOES need a down-rescale, pair Spark
  *    `cast(DecimalType(p,s))` with DuckDB `ROUND(x, s)` (NOT a cast):
  *    both are HALF_UP. Mechanized as `rescale` below.
  */
object Protocol {
  /** Money column (l_extendedprice, o_totalprice, …): DECIMAL(12,2). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Quantity/value column: DECIMAL(12,4). */
  def qty(c: Column): Column = c.cast(DecimalType(12, 4))

  /** Small rate in [0,1] (discount, tax — 2 fractional digits in the
    * fixtures): DECIMAL(6,2). Keeping scale 2 keeps product scales ≤6. */
  def rate(c: Column): Column = c.cast(DecimalType(6, 2))

  /** Exact decimal sum of a money column, emitted as DOUBLE. */
  def sumMoney(c: Column): Column = outDouble(sum(money(c)))

  /** Exact decimal sum of a quantity column, emitted as DOUBLE. */
  def sumQty(c: Column): Column = outDouble(sum(qty(c)))

  /** Cast an exact decimal to DOUBLE (correctly rounded both engines
    * while unscaled value < 2^53 — see scaladoc above). */
  def outDouble(c: Column): Column = c.cast(DoubleType)

  /** Explicit HALF_UP down-rescale; oracle twin is ROUND(x, s). */
  def rescale(c: Column, s: Int): Column = c.cast(DecimalType(28, s))

  /** D3 average: exact decimal sum / exact count, one float division. */
  def avgOf(sumDec: Column, cnt: Column): Column =
    outDouble(sumDec) / cnt.cast(DoubleType)

  /** D4: events.ts is ns in parquet (µs in Spark) — only second-or-
    * coarser truncations can hash-match DuckDB. */
  def tsSec(c: Column): Column = date_trunc("second", c)
}
