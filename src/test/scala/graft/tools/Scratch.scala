package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only bisection aid (test sourceset — never ships): times
  * labeled sub-plans in a fresh Bench-like session to find which
  * stage carries a first-use classloading/codegen cost.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    val nat = spark.read.parquet(s"$d/nation.parquet")
    val reg = spark.read.parquet(s"$d/region.parquet")
    t("warm")(nat.join(broadcast(reg),
      nat("n_regionkey") === reg("r_regionkey")).count())
    // the r6 Bench warm-up dim join, verbatim
    val dim = Seq((0L, "a", "x"), (1L, "b", "y")).toDF("k", "v", "w")
    t("warm_dim_join")(nat.join(broadcast(dim),
      nat("n_nationkey") === dim("k"), "left").count())

    val part = spark.read.parquet(s"$d/part.parquet")
    val obs = graft.pipeline.Harmonize.unpivotObservations(
      part.withColumnRenamed("p_type", "raw"),
      ids = Seq("p_partkey", "raw"),
      values = Seq("p_retailprice", "p_size"))
    t("unpivot")(obs.count())
    t("unpivot_regexp")(obs.withColumn("raw_norm",
      graft.pipeline.Harmonize.normalized(col("raw"))).count())
    val codebook = Seq(
      ("p_retailprice", "economy", "ECO", "rule-eco"),
      ("p_size", "economy", "ECO", "rule-eco"))
      .toDF("attr", "raw_norm", "code", "rule_id")
    // tiny (25-row) unpivot + regexp-keyed broadcast join: does a
    // cheap warm-up query absorb the first-use cost of join_full?
    val tinyObs = graft.pipeline.Harmonize.unpivotObservations(
      nat.withColumnRenamed("n_name", "raw")
        .withColumn("m1", col("n_nationkey") + 1)
        .withColumn("m2", col("n_nationkey") + 2),
      ids = Seq("n_nationkey", "raw"), values = Seq("m1", "m2"))
    t("tiny_join_norm")(
      graft.pipeline.Harmonize.applyCodebook(tinyObs, codebook).count())
    t("join_full")(
      graft.pipeline.Harmonize.applyCodebook(obs, codebook).count())
    t("join_full_rep2")(
      graft.pipeline.Harmonize.applyCodebook(obs, codebook).count())
    t("cube_rep1")(
      graft.SparkEntry.queries("harmonize_cube")(spark, d).count())
    t("cube_rep2")(
      graft.SparkEntry.queries("harmonize_cube")(spark, d).count())
    spark.stop()
  }
}
