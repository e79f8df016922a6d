package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only profiling main (test sourceset — never ships): times the
  * given registry keys against the LIVE SparkEntry definitions (no
  * duplicated plan to drift), repeating each to expose run-to-run
  * variance on this noisy host.
  *
  * Usage: Test / runMain graft.tools.Prof [reps] key [key ...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (reps, keys) = args.headOption.flatMap(_.toIntOption) match {
      case Some(n) => (n, args.tail.toSeq)
      case None    => (3, args.toSeq)
    }
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up: JVM/codegen/reader costs land here, not on rep 1
    SparkEntry.queries("q1_pricing_summary")(spark, d).count()
    keys.foreach { k =>
      SparkEntry.queries.get(k) match {
        case None => println(s"[prof] unknown key: $k")
        case Some(fn) =>
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, d).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[prof] $k%-28s ${times.map(t => f"$t%.3f").mkString(" ")} s (min ${times.min}%.3f)")
      }
    }
    spark.stop()
  }
}
