package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session —
  * Spark tears down badly when cycled per-suite). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Pin the thread-local ACTIVE session to the shared one before
    * every test (r13): suites run concurrently on a reused thread
    * pool, and lazily-evaluated plan properties (e.g.
    * `optimizedPlan.stats`) read `SQLConf.get` from whatever session
    * a PREVIOUS test left active on this thread — a throwaway
    * newSession with default confs, in the measured failure
    * (CboStatsSpec's rowCount vanished full-suite-only). */
  override def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    org.apache.spark.sql.classic.SparkSession.setActiveSession(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    super.withFixture(test)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    // local[8] (r13, was [4]): suites now run concurrently inside the
    // forked JVM, so the executor-thread pool is shared across them —
    // 8 task slots keep the parallel group fed without oversubscribing
    // the host alongside the plan-serial JVM.
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
