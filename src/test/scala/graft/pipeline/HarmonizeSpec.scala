package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end harmonization pipeline over the part fixture: unpivot →
  * normalize → codebook → split → provenance → cube → partitioned
  * sink, with hand-checked invariants at each stage. */
class HarmonizeSpec extends SparkSpec {

  private def codebook = {
    import spark.implicits._
    Seq(
      ("p_retailprice", "economy", "ECO", "rule-eco"),
      ("p_size", "economy", "ECO", "rule-eco"),
      ("p_retailprice", "promo", "PRM", "rule-promo"),
      ("p_size", "promo", "PRM", "rule-promo"),
      ("p_retailprice", "large", "LRG", "rule-large"),
      ("p_size", "large", "LRG", "rule-large"))
      .toDF("attr", "raw_norm", "code", "rule_id")
  }

  test("pipeline harmonizes mapped types and reports unmappable ones") {
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    val (cube, unmapped) = Harmonize.demoPipeline(part, codebook)

    val cubeRows = cube.collect()
    assert(cubeRows.nonEmpty)
    // codes only from the codebook; both measures present per code
    val codes = cubeRows.map(_.getAs[String]("code")).toSet
    assert(codes.subsetOf(Set("ECO", "PRM", "LRG")))
    assert(cube.select("attr").distinct().collect().map(_.getString(0)).toSet ==
      Set("p_retailprice", "p_size"))

    // unmappable = types not in the codebook (e.g. 'standard'), normalized
    val um = unmapped.collect()
    assert(um.forall(r => !Set("economy", "promo", "large")
      .contains(r.getAs[String]("raw_norm"))))

    // conservation: every part row yields 2 observations, split exactly
    val total = part.count() * 2
    val mappedCount = cube.agg(sum("n_obs")).head().getLong(0)
    val unmappedCount = unmapped.agg(sum("n_occurrences")).head().getLong(0)
    assert(mappedCount + unmappedCount == total)
  }

  test("measures survive harmonization exactly (decimal sums)") {
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    val (cube, _) = Harmonize.demoPipeline(part, codebook)
    // sum over the cube equals a direct decimal sum over mapped source rows
    val direct = part
      .filter(lower(col("p_type")).isin("economy", "promo", "large"))
      .agg((sum(col("p_retailprice").cast("decimal(18,4)")) +
        sum(col("p_size").cast("decimal(18,4)"))).cast("double"))
      .head().getDouble(0)
    val viaCube = cube.agg(sum("sum_measure")).head().getDouble(0)
    assert(viaCube == direct)
  }

  test("partitioned sink writes one directory per code and prunes on read") {
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    val (cube, _) = Harmonize.demoPipeline(part, codebook)
    val out = Files.createTempDirectory("graft-cube").toString
    Harmonize.writeCube(cube, out, "code")
    val back = spark.read.parquet(out).filter(col("code") === "ECO")
    assert(back.count() == cube.filter(col("code") === "ECO").count())
    assert(new java.io.File(s"$out/code=ECO").exists())
  }
}
