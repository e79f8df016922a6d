package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off diagnostic: stage timing of dedup_near_jaccard's pieces. */
object JaccProf {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[jacc] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    // same warmup as Bench
    locally {
      import org.apache.spark.sql.expressions.Window
      val n = spark.read.parquet(s"$d/nation.parquet")
      val r = spark.read.parquet(s"$d/region.parquet")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(col("n_nationkey").cast("decimal(12,2)")).as("s"),
          collect_list(col("n_name")).as("l"))
        .withColumn("rn", row_number().over(Window.partitionBy("r_name").orderBy("s")))
        .orderBy("r_name").count()
    }
    val nSalts = 16
    val docs = t("docs read") { val x = Tables.documents(s, d); x.count(); x }
    val dd = docs
      .select(col("doc_id"), col("lang"),
        sort_array(expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))"))
          .as("ts"))
      .withColumn("sz", size(col("ts")))
    t("dd pass") { dd.write.format("noop").mode("overwrite").save() }
    val a = dd.select(col("doc_id").as("doc_a"), col("lang"),
      col("ts").as("ts_a"), col("sz").as("sz_a"),
      pmod(col("doc_id"), lit(nSalts)).as("salt"))
    val b = dd.crossJoin(s.range(nSalts).toDF("salt_b"))
      .select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("ts").as("ts_b"), col("sz").as("sz_b"), col("salt_b"))
    t("b side pass") { b.write.format("noop").mode("overwrite").save() }
    val inter = graft.functions.VectorFunctions.sortedIntersectLong(col("ts_a"), col("ts_b"))
    val uni = col("sz_a") + col("sz_b") - col("inter")
    val joined = a.join(b, col("salt") === col("salt_b") && col("lang") === col("lang_b")
        && col("doc_a") < col("doc_b")
        && col("sz_a") * 2 >= col("sz_b") && col("sz_b") * 2 >= col("sz_a"))
    t("pair join (no inter)") { joined.count() }
    val fin = joined
      .withColumn("inter", inter)
      .filter(col("inter") * 2 >= uni)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) / uni).as("jacc"))
    t("pair join + inter + filter") { fin.count() }
    t("full again") { fin.count() }
    fin.explain("formatted")
    spark.stop()
  }
}
