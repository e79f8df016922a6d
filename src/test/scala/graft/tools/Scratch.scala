package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.HarnessConf.applyEnv(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", graft.TempDirs.create("graft-warehouse"))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label ${(System.nanoTime()-t0)/1e9}%.3f"); r
    }
    import graft.Tables
    def tradeEbRep = Tables.orders(s, sfDir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, sfDir).select(col("l_orderkey"), col("l_suppkey"))
          .repartition(s.sparkContext.defaultParallelism),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    for (iter <- 1 to 3) {
      println(s"--- iter $iter")
      val e1 = graft.ops.ClusterOps.tradeEb(s, sfDir).persist(StorageLevel.MEMORY_AND_DISK)
      t("mat-edges-plain")(e1.count())
      val e2 = tradeEbRep.persist(StorageLevel.MEMORY_AND_DISK)
      t("mat-edges-repart")(e2.count())
      val sorted = e1.coalesce(1).sortWithinPartitions(col("ck"), col("sk"))
      t("sort-only-count")(sorted.count())
      val out = graft.TempDirs.create("graft_edgestore")
      t("write-sorted")(sorted.write.mode("overwrite").parquet(out))
      t("write-noop")(sorted.write.format("noop").mode("overwrite").save())
      val out2 = graft.TempDirs.create("graft_edgestore2")
      t("write-unsorted")(e1.coalesce(1).write.mode("overwrite").parquet(out2))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
