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

  /** CSV sink + source round trip, oracle-graded: write the supplier
    * table to CSV (quoted header files), read it back with an EXPLICIT
    * schema (schema inference is banned — SURVEY §7), and prove the
    * round trip lossless against the parquet original. Doubles survive
    * because the writer emits shortest-round-trip representations;
    * strings survive via standard CSV quoting. Each call writes to a
    * fresh temp directory, so concurrent harness runs cannot collide. */
  val sourceCsvRoundtrip: QDef = q(
    "source_csv_roundtrip",
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      |FROM supplier
      |ORDER BY s_suppkey""") { (s, d) =>
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    s.read.option("header", "true").schema(schema).csv(out)
      .orderBy(col("s_suppkey"))
  }

  val all: Seq[QDef] = Seq(scanParquetProject, sourceJsonProps, sourceCsvRoundtrip)
}
