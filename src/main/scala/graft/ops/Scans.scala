package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.1 — scans, sources, sinks.
  *
  * Both queries are single-stage scan pipelines: the filter and the
  * 4-column projection reach the parquet reader (PushedFilters +
  * ReadSchema in `.explain`), so at 100 TB only the matching row
  * groups and referenced columns are ever read.
  */
object Scans {

  /** Projection + row-group-prunable predicate on the fact table. */
  val scanParquetProject: QDef = q(
    "scan_parquet_project",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |       CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber, l_quantity, ship_date""") { (s, d) =>
    // (l_orderkey, l_linenumber) is NOT unique in the fixtures — order
    // by every output column so tied rows are identical tuples (D1).
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast(TimestampType))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_shipdate").cast(DateType).as("ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("ship_date"))
  }

  /** JSON-in-string extraction (events.props = {"k": <int>}). */
  val sourceJsonProps: QDef = q(
    "source_json_props",
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events
      |ORDER BY event_id""") { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .orderBy(col("event_id"))
  }

  val all: Seq[QDef] = Seq(scanParquetProject, sourceJsonProps)
}
