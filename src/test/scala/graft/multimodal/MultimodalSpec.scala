package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests: schema, partition behavior, batch shape,
  * and deterministic stub-codec round trips (SURVEY: multimodal
  * columns are engine surface; no binary fixture table exists, so
  * payloads are constructed in-memory). */
class MultimodalSpec extends SparkSpec {
  import Multimodal._

  private def mkMedia(n: Int, parts: Int = 4) = {
    val rows = (0 until n).map { i =>
      val body = Array.tabulate[Byte](64 + i)(j => ((i * 7 + j) % 256).toByte)
      Row(i.toLong, if (i % 3 == 0) "video" else "image",
        encodePayload(8 + i, 6, 3, body), s"src${i % 2}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts), mediaSchema)
  }

  test("decodeMeta parses headers and keeps partitioning (no shuffle)") {
    val media = mkMedia(12)
    val meta = decodeMeta(media)
    assert(meta.rdd.getNumPartitions == media.rdd.getNumPartitions)
    val m0 = meta.filter(_.media_id == 0).head()
    assert(m0.width == 8 && m0.height == 6 && m0.channels == 3)
    assert(m0.n_bytes == 12 + 64)
    assert(meta.count() == 12)
  }

  test("extractFeatures emits fixed-width histograms with exact counts") {
    val media = mkMedia(5)
    val f = extractFeatures(media).collect().sortBy(_.media_id)
    assert(f.length == 5)
    f.foreach { feat =>
      assert(feat.histogram16.length == 16)
      assert(feat.min_byte >= 0 && feat.max_byte <= 255)
    }
    // histogram mass equals body length
    val body0 = 64
    assert(f(0).histogram16.sum == body0)
  }

  test("resample bounds payload size and stays decodable") {
    val media = mkMedia(6)
    val small = resample(media, maxBytes = 16)
    val metas = decodeMeta(small).collect()
    assert(metas.forall(_.n_bytes <= 12 + 17)) // stride rounding slack
    assert(small.count() == 6)
  }

  test("sampleFrames explodes video rows into every-kth frame chunks") {
    val media = mkMedia(9)
    val frames = sampleFrames(media, frameBytes = 16, every = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_bytes"))
    // only video rows (ids 0,3,6) produce frames; frame_no all even
    val ids = frames.select("media_id").distinct().collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(0L, 3L, 6L))
    assert(frames.select("frame_no").collect().forall(_.getInt(0) % 2 == 0))
  }

  test("enrich joins metadata, features, and a broadcast dimension") {
    val media = mkMedia(8)
    import spark.implicits._
    val dims = Seq(("src0", "lake"), ("src1", "crawl")).toDF("source", "origin")
    val out = enrich(media, dims, "source")
    assert(out.count() == 8)
    assert(out.columns.contains("origin") && out.columns.contains("mean_byte"))
    assert(out.filter(col("origin").isNull).count() == 0)
  }
}
