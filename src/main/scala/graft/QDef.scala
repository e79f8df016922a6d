package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator: a Spark implementation plus (usually) the
  * equivalent DuckDB SQL the driver hash-compares against.
  *
  * Keeping the pair adjacent in one value is the main defense against
  * Spark/oracle drift (SURVEY.md §7 "Oracle.scala adjacent to twins").
  */
final case class QDef(
    key: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object QDef {
  /** Query with a DuckDB oracle (the normal case). */
  def q(key: String, oracle: String)(run: (SparkSession, String) => DataFrame): QDef =
    QDef(key, Some(oracle.stripMargin.trim))(run)

  /** Sanctioned no-oracle query (sketches etc.) — driver records a
    * weaker rows-only check; correctness covered by scalatest. */
  def qNoOracle(key: String)(run: (SparkSession, String) => DataFrame): QDef =
    QDef(key, None)(run)
}
