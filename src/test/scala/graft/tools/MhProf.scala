package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off diagnostic: stage timing of dedup_minhash_lsh's pieces. */
object MhProf {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[mh] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    graft.SparkEntry.queries("q1_pricing_summary")(s, d).count()
    val toks = Tables.documents(s, d)
      .repartition(32)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val sh = toks.select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(3, size(t)), i -> concat_ws(' ', t[i-3], t[i-2], t[i-1]))")))
          .as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sh populate") { sh.count() }
    val h = col("h")
    val mh = sh.withColumn("h", md5(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(min(substring(h, 1, 8)).as("h0"), min(substring(h, 4, 8)).as("h1"),
        min(substring(h, 7, 8)).as("h2"), min(substring(h, 10, 8)).as("h3"),
        min(substring(h, 13, 8)).as("h4"), min(substring(h, 16, 8)).as("h5"),
        min(substring(h, 19, 8)).as("h6"), min(substring(h, 22, 8)).as("h7"))
    t("mh") { mh.write.format("noop").mode("overwrite").save() }
    val bands = mh.select(col("doc_id"),
        posexplode(array(
          concat_ws("|", col("h0"), col("h1")), concat_ws("|", col("h2"), col("h3")),
          concat_ws("|", col("h4"), col("h5")), concat_ws("|", col("h6"), col("h7"))))
          .as(Seq("band", "sig")))
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band").as("band_b"), col("sig").as("sig_b"))
    val cand = a.join(b, col("band") === col("band_b") && col("sig") === col("sig_b")
        && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    t("cand") { println("  n_cand=" + cand.count()) }
    val sets = sh.groupBy(col("doc_id")).agg(sort_array(collect_set(col("shingle"))).as("s"))
    t("sets") { sets.write.format("noop").mode("overwrite").save() }
    val inter = graft.functions.VectorFunctions.sortedIntersect(col("s_a"), col("s_b"))
    val fin = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("s_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("s_b")), "doc_b")
      .withColumn("inter", inter)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) /
          (size(col("s_a")) + size(col("s_b")) - col("inter"))).as("jacc"))
      .filter(col("jacc") >= 0.5)
    t("verify join") { fin.count() }
    t("full again") { fin.count() }
    spark.stop()
  }
}
