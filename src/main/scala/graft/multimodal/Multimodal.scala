package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: images/audio/video travel as opaque
  * `BINARY` payloads with typed metadata, processed per-partition so
  * no executor ever materializes more than one batch of media.
  *
  * The Spark-side plumbing here — schema, partition-preserving
  * mapPartitions pipelines, batch shape, sampling pushdown — is real
  * and tested. The codec itself is a clearly marked STUB: this
  * container has no image/audio libraries, so `decodeHeader` parses a
  * deterministic fake header format (12 bytes: width, height,
  * channels as big-endian ints) and the "pixel" operations work on
  * the raw payload bytes. Swapping in a real codec changes only the
  * bodies marked STUB, not the distributed structure.
  */
object Multimodal {

  /** media table schema: the engine-standard layout for binary media. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("source", StringType, nullable = true)))   // lineage

  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
      channels: Int, n_bytes: Int, source: String)

  case class MediaFeatures(media_id: Long, mean_byte: Double, min_byte: Int,
      max_byte: Int, histogram16: Array[Long])

  /** STUB codec: header = 3 big-endian ints (w, h, c); body = bytes.
    * A real implementation would call an image library here. */
  private[multimodal] def decodeHeader(payload: Array[Byte]): (Int, Int, Int) = {
    require(payload.length >= 12, s"payload too short: ${payload.length}")
    def be(o: Int): Int =
      ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
    (be(0), be(4), be(8))
  }

  /** Encode the STUB format (test/data-generation helper). */
  def encodePayload(w: Int, h: Int, c: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + body.length)
    def put(o: Int, v: Int): Unit = {
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
    }
    put(0, w); put(4, h); put(8, c)
    System.arraycopy(body, 0, out, 12, body.length)
    out
  }

  /** Decode payload headers into typed metadata — one pass per
    * partition, no shuffle, schema known statically. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.select("media_id", "kind", "payload", "source")
      .as[(Long, String, Array[Byte], String)]
      .mapPartitions(_.map { case (id, kind, payload, src) =>
        val (w, h, c) = decodeHeader(payload)
        MediaMeta(id, kind, w, h, c, payload.length, src)
      })
  }

  /** Feature extraction over payload bodies: per-item byte stats +
    * 16-bucket histogram. Narrow (partition-local); the histogram is
    * the fixed-width vector a real featurizer would emit. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val body = payload.drop(12)                          // STUB: body = raw bytes
        val hist = new Array[Long](16)
        var sum = 0L; var mn = 255; var mx = 0
        body.foreach { b =>
          val v = b & 0xff
          hist(v >> 4) += 1
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        }
        val mean = if (body.isEmpty) 0.0 else sum.toDouble / body.length
        MediaFeatures(id, mean, if (body.isEmpty) 0 else mn, if (body.isEmpty) 0 else mx, hist)
      })
  }

  /** "Resize": deterministic stride resample of the body to at most
    * `maxBytes` (STUB for a real scaler — the partition-local batch
    * shape is what a real one would use). Header is rewritten so the
    * output is a valid payload again. */
  def resample(media: DataFrame, maxBytes: Int): DataFrame = {
    import media.sparkSession.implicits._
    val out = media.select("media_id", "kind", "payload", "source")
      .as[(Long, String, Array[Byte], String)]
      .mapPartitions(_.map { case (id, kind, payload, src) =>
        val body = payload.drop(12)
        val stride = math.max(1, math.ceil(body.length.toDouble / maxBytes).toInt)
        val sampled = body.indices.collect { case i if i % stride == 0 => body(i) }.toArray
        // the stride resample is 1-D over bytes and does NOT preserve
        // 2-D geometry, so the rewritten header declares the honest
        // shape (sampled.length × 1 × 1) — `w / stride` kept the old
        // h×c and could claim width 0 (stride > w) or a w·h·c product
        // that no longer matched the body length
        (id, kind, encodePayload(sampled.length, 1, 1, sampled), src)
      })
    out.toDF("media_id", "kind", "payload", "source")
  }

  /** Frame sampling for video-kind rows: every k-th fixed-size frame
    * chunk becomes its own row (media_id, frame_no, frame_bytes) —
    * the explode-shaped generator a video pipeline needs. */
  def sampleFrames(media: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val body = payload.drop(12)
        body.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % every == 0 => (id, i, frame)
        }
      }
      .toDF("media_id", "frame_no", "frame_bytes")
  }

  /** End-to-end enrichment: metadata + features joined back to a
    * dimension table — the multimodal analog of multimodal_enrich. */
  def enrich(media: DataFrame, dims: DataFrame, joinKey: String): DataFrame =
    decodeMeta(media).toDF()
      .join(extractFeatures(media).toDF(), "media_id")
      .join(broadcast(dims), Seq(joinKey), "left")
}
