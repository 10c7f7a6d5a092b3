package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque payload bytes plus typed metadata. At 100 TB
  * the payload column stays opaque `binary` end-to-end; only metadata and
  * derived features are relational. */
final case class MediaAsset(
    asset_id: Long,
    media_type: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    width: Int,
    height: Int,
    duration_ms: Long)

final case class MediaFeature(
    asset_id: Long,
    media_type: String,
    n_bytes: Long,
    sha: String,
    feature: Array[Float])

/** Multimodal column handling: opaque binary payloads with typed metadata,
  * and decode / feature-extract / resize / frame-sample plumbing.
  *
  * The actual byte decoding (JPEG/PCM/H.264) is STUBBED — this container has
  * no media libraries — behind [[MultimodalCodec]], which substitutes a
  * deterministic fake decode. Everything Spark-side is real and tested:
  * schemas, binary-column flow, partition-batched iteration (`mapPartitions`,
  * the JVM analogue of arrow-batched pandas UDFs), and feature schema.
  * Swapping the stub for a real codec touches only [[MultimodalCodec]].
  */
object Multimodal {

  /** Relational metadata/stats over the binary payload — no decode needed,
    * stays entirely in codegen (octet length, header bytes, content hash). */
  def binaryMeta(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      hex(expr("substring(payload, 1, 4)")).as("header_hex"),
      sha2(col("payload"), 256).as("sha"))

  /** Decode + feature extraction, batched per partition. One codec instance
    * per partition (amortized init, like the reference's batched ECALLs —
    * MicroBatchDataService.java:14-26). */
  def extractFeatures(spark: SparkSession, assets: Dataset[MediaAsset], featureDim: Int = 8): Dataset[MediaFeature] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      val codec = new MultimodalCodec(featureDim)
      it.map { a =>
        val decoded = codec.decode(a.media_type, a.payload)
        MediaFeature(a.asset_id, a.media_type, a.payload.length.toLong,
          codec.contentHash(a.payload), codec.features(decoded))
      }
    }
  }

  /** Frame sampling for video/audio: every `stride`-th fixed-size frame slice
    * of the payload. Pure byte-range arithmetic — real at any scale; the
    * per-frame decode is the stubbed part. */
  def sampleFrames(spark: SparkSession, assets: Dataset[MediaAsset],
      frameBytes: Int, stride: Int): DataFrame = {
    import spark.implicits._
    assets.flatMap { a =>
      val nFrames = a.payload.length / frameBytes
      (0 until nFrames by stride).map { f =>
        val slice = java.util.Arrays.copyOfRange(a.payload, f * frameBytes, (f + 1) * frameBytes)
        (a.asset_id, f, slice.length, new MultimodalCodec(4).contentHash(slice))
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes", "frame_sha")
  }

  /** Metadata-level resize: recompute target dims preserving aspect ratio.
    * (A real resize re-encodes payload bytes inside the codec.) */
  def resizeMeta(assets: DataFrame, maxSide: Int): DataFrame =
    assets.withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide).cast("double") / greatest(col("width"), col("height"))))
      .select(col("asset_id"),
        round(col("width") * col("scale")).cast("int").as("new_width"),
        round(col("height") * col("scale")).cast("int").as("new_height"))

  /** Synthesizes a deterministic asset table from the documents table (the
    * container ships no real media); payload = UTF-8 text bytes. */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val mt = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      MediaAsset(id, mt, payload, 64 + (id % 32).toInt * 8, 64 + (id % 24).toInt * 8, 1000L + id % 5000)
    }
  }
}

/** Stubbed media codec. `decode` is a deterministic fake (real decoders are
  * unavailable in this environment); `contentHash`/byte plumbing are real. */
final class MultimodalCodec(featureDim: Int) extends Serializable {

  /** STUB: a real implementation decodes JPEG/PCM/H.264 here. The fake is
    * deterministic in the payload bytes so pipelines are testable. */
  def decode(mediaType: String, payload: Array[Byte]): Array[Double] = {
    val out = new Array[Double](featureDim)
    var i = 0
    while (i < payload.length) {
      out(i % featureDim) += (payload(i) & 0xFF) / 255.0
      i += 1
    }
    out
  }

  def features(decoded: Array[Double]): Array[Float] = decoded.map(_.toFloat)

  def contentHash(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      .take(8).map(b => f"$b%02x").mkString
}
