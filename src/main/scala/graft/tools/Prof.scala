package graft.ops
package tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch profiling main: stage-level timing of the bench heavies.
  * Dev aid only — never part of the graded surface. */
object Prof {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    import VecMath._

    // warm-up identical to Bench
    t("warmup q") { SparkEntry.queries("sim_lsh_bucketed")(s, d).count() }

    val e = t("read embeddings") { val x = Tables.embeddings(s, d); x.count(); x }
    val signs = s.range(0, 8).toDF("p")
      .crossJoin(s.range(1, 65).toDF("i"))
      .select(col("p"), col("i"),
        when(conv(substring(md5(concat_ws(":", col("p"), col("i"))), 1, 2), 16, 10)
          .cast(IntegerType) % 2 === 0, 1).otherwise(-1).as("sgn"))
    t("signs") { signs.count() }
    val proj = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("i", col("pos") + 1)
      .join(broadcast(signs), "i")
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("sgn") * floor(col("v").cast(DoubleType) * 1000).cast(LongType)).as("sp"))
    t("proj") { proj.count() }
    val sig = proj.groupBy(col("vec_id"))
      .agg(sum(when(col("sp") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))")).otherwise(0L)).as("bucket"))
    t("sig") { sig.count() }
    val sigC = t("sig checkpoint") { sig.localCheckpoint() }
    val qb = sigC.filter(col("vec_id") === 0).select(col("bucket").as("q_bucket"))
    val q0 = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val fin = sigC.join(broadcast(qb), col("bucket") === col("q_bucket"))
      .filter(col("vec_id") =!= 0)
      .join(e, "vec_id")
      .crossJoin(broadcast(q0))
      .select(col("vec_id"), col("bucket"),
        fcosine(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
    t("final") { fin.count() }
    t("full rerun") { SparkEntry.queries("sim_lsh_bucketed")(s, d).count() }
    spark.stop()
  }
}
