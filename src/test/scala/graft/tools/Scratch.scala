package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness for stage-isolating a query under
  * development — dev-only, not part of the graded surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  (rows=$n)")
    }

    def shingled(srcEq: Boolean) = {
      val base = spark.read.parquet(s"$d/documents.parquet")
        .filter(if (srcEq) col("source") === "src0" else col("source") =!= "src0")
        .repartition(32)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
      base.select(col("doc_id"), sort_array(array_distinct(expr(
        "transform(sequence(3, size(t)), i -> xxhash64(concat_ws(' ', t[i-3], t[i-2], t[i-1])))")))
        .as("sh"))
    }

    val raw = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("source") === "src0")
      .repartition(32)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    // materialize the array column, THEN explode the materialized col
    time("explode of plain split")(raw.select(explode(col("t"))).count())
    time("explode of plain split x2")(raw.select(explode(col("t"))).count())
    time("explode of transform-hash")(raw.select(col("doc_id"), expr(
      "transform(sequence(3, size(t)), i -> xxhash64(concat_ws(' ', t[i-3], t[i-2], t[i-1])))").as("sh"))
      .select(explode(col("sh"))).count())
    time("explode of transform-nohash")(raw.select(col("doc_id"), expr(
      "transform(sequence(3, size(t)), i -> concat_ws(' ', t[i-3], t[i-2], t[i-1]))").as("sh"))
      .select(explode(col("sh"))).count())
    time("explode idx + row-level hash")(raw
      .select(col("doc_id"), col("t"), explode(expr("sequence(3, size(t))")).as("i"))
      .select(xxhash64(concat_ws(" ",
        expr("t[i-3]"), expr("t[i-2]"), expr("t[i-1]"))).as("h")).count())
    time("explode idx + row-level hash x2")(raw
      .select(col("doc_id"), col("t"), explode(expr("sequence(3, size(t))")).as("i"))
      .select(xxhash64(concat_ws(" ",
        expr("t[i-3]"), expr("t[i-2]"), expr("t[i-1]"))).as("h")).count())
    time("explode of transform-hash again")(raw.select(col("doc_id"), expr(
      "transform(sequence(3, size(t)), i -> xxhash64(concat_ws(' ', t[i-3], t[i-2], t[i-1])))").as("sh"))
      .select(explode(col("sh"))).count())
    time("agg-HOF count no explode")(raw.select(col("doc_id"), expr(
      "size(transform(sequence(3, size(t)), i -> xxhash64(concat_ws(' ', t[i-3], t[i-2], t[i-1]))))").as("n")).agg(sum(col("n"))).count())

    // --- langid bigram build variants (all 5000 docs) ---
    val docs = spark.read.parquet(s"$d/documents.parquet").repartition(32)
    val bgZip = docs.select(col("doc_id"),
      explode(expr("""zip_with(slice(split(text, ''), 1, length(text) - 1),
                               slice(split(text, ''), 2, length(text) - 1),
                               (x, y) -> concat(x, y))""")).as("b"))
    time("bg zip_with explode")(bgZip.count())
    time("bg zip_with explode x2")(bgZip.count())
    val bgIdx = docs.select(col("doc_id"), col("text"),
      explode(expr("sequence(1, length(text) - 1)")).as("i"))
      .select(col("doc_id"), expr("substr(text, i, 2)").as("b"))
    time("bg idx explode + substr")(bgIdx.count())
    time("bg idx explode + substr x2")(bgIdx.count())
    spark.stop()
  }
}
