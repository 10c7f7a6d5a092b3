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
  * IMAGE decode is REAL: [[MultimodalCodec]] uses the JDK's `javax.imageio`
  * (PNG/BMP/GIF/JPEG) and extracts width/height/channel-mean features from
  * actual pixels — exercised end-to-end by the `mm_image_decode` gate over
  * [[syntheticImageAssets]]' real PNG payloads. AUDIO decode is REAL:
  * `javax.sound.sampled` (WAV/AIFF/AU PCM) decodes to samples with
  * frames/rate/RMS features — the `mm_audio_decode` gate over
  * [[syntheticAudioAssets]]' real WAV payloads. VIDEO decode is REAL for
  * multi-frame containers the JDK reads (animated GIF): every frame is
  * decoded in sequence with frame-count/dims/per-frame stats — the
  * `mm_video_decode` gate over [[syntheticVideoAssets]]' real animated-GIF
  * payloads. Only inter-frame-compressed codecs (H.264/VP9) remain behind
  * the deterministic fallback — no such codec ships in the JDK or this
  * container. Everything Spark-side is real and tested: schemas,
  * binary-column flow, partition-batched iteration (`mapPartitions`, the
  * JVM analogue of arrow-batched pandas UDFs), and feature schema.
  * Swapping the fallback for an H.264 codec touches only
  * [[MultimodalCodec]].
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

  /** Deterministic REAL-audio asset table: each payload is a genuine WAV
    * (RIFF header + 16-bit signed mono PCM, encoded with the JDK's
    * `javax.sound.sampled.AudioSystem`, decoded back by
    * [[MultimodalCodec.decode]]'s real audio branch), an alternating ±c
    * square wave whose sample count, sample rate, and amplitude are
    * closed-form in the asset id — so a SQL oracle can recompute every
    * decoded value (frames, rate, RMS: the RMS of a ±c square wave is
    * EXACTLY c, and IEEE sqrt(c²) reproduces the integer c bit-exactly)
    * from metadata alone while the Spark side derives them from the actual
    * decoded samples. Generation is distributed; nothing audio-shaped
    * touches the driver. */
  def syntheticAudioAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val rate = 8000 * (1 + (id % 3).toInt)
      val n = 800 + (id % 40).toInt * 40
      val c = 256 * (1 + (id % 100).toInt)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = if (i % 2 == 0) c else -c
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaAsset(id, "audio", bos.toByteArray, 0, 0, n.toLong * 1000 / rate)
    }
  }

  /** Deterministic REAL-video asset table: each payload is a genuine
    * animated GIF — a multi-frame video container the JDK's `javax.imageio`
    * both writes (`writeToSequence`) and reads back frame-by-frame — whose
    * frame count, dimensions, and per-frame gray level are closed-form in
    * the asset id: n = 3 + id%5 frames of (8+id%8) × (8+id%6), frame f
    * uniformly gray g(f) = (id·7 + f·29) mod 256. Frames are
    * TYPE_BYTE_INDEXED over an explicit 256-gray palette so GIF's
    * palette-based encoding is lossless and a SQL oracle recomputes every
    * decoded value from metadata alone. Generation is distributed; nothing
    * video-shaped touches the driver. */
  def syntheticVideoAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 8).toInt
      val h = 8 + (id % 6).toInt
      val n = 3 + (id % 5).toInt
      val grays = Array.tabulate(256)(i => i.toByte)
      val palette = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < n) {
        val g = ((id * 7 + f * 29) % 256).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, g); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      MediaAsset(id, "video", bos.toByteArray, w, h, n.toLong * 40)
    }
  }

  /** Deterministic REAL-video asset table keyed for collisions: 4-frame
    * 8×8 animated GIFs whose frame grays g(f) = ((seed·31 + f·29) mod 256)
    * are keyed by seed = id mod 7 — ids that agree mod 7 are
    * frame-identical videos (the duplicate groups
    * [[videoSignature]]-based dedup must find), and a SQL oracle
    * recomputes every frame gray, and therefore the signature, from the id
    * alone. Palette-indexed GIF is lossless, so decoded frames equal the
    * formula exactly. */
  def syntheticPatternVideoAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map(id =>
      MediaAsset(id, "video", patternGifPayload(id), 8, 8, 4L * 40))
  }

  /** The 4-frame keyed-pattern animated-GIF payload (seed = id mod 7, frame
    * f uniformly gray (seed·31 + f·29) mod 256) — shared by
    * [[syntheticPatternVideoAssets]] and [[syntheticMixedAssets]]. */
  private def patternGifPayload(id: Long): Array[Byte] = {
    val seed = (id % 7).toInt
    val (w, h, n) = (8, 8, 4)
    val grays = Array.tabulate(256)(i => i.toByte)
    val palette = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < n) {
      val g = (seed * 31 + f * 29) % 256
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, g); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Deterministic MIXED-modality asset table: each document id carries
    * exactly one asset whose modality is dispatched by id mod 3 (0 → the
    * keyed-pattern PNG, 1 → the keyed-pattern WAV, 2 → the keyed-pattern
    * animated GIF), with the SAME payload formulas as the per-modality
    * pattern tables — so a SQL oracle replays every signature from the id
    * alone, and duplicate groups exist within each modality (seeds mod
    * 17/13/7). Generation is distributed; nothing asset-shaped touches the
    * driver. */
  def syntheticMixedAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 => MediaAsset(id, "image", patternPngPayload(id), 8, 8, 0L)
        case 1 => MediaAsset(id, "audio", patternWavPayload(id), 0, 0, 1024L * 1000 / 8000)
        case _ => MediaAsset(id, "video", patternGifPayload(id), 8, 8, 4L * 40)
      }
    }
  }

  /** Kind-dispatched content signature over a mixed-modality asset table in
    * ONE map: image → average-hash bits, audio → envelope-fingerprint
    * bits, video → frame-sequence rolling hash — each exactly the
    * corresponding single-modality operator's value, namespaced by
    * modality (`kind:hash`) so signatures can never collide across kinds.
    * This is the d17 unification move applied to assets: one signature
    * column drives ONE downstream dedup regardless of modality. Signature
    * equality is already an equivalence relation, so grouping IS the
    * component closure — no iterative step needed (unlike d17's edge
    * union, there are no cross-signal edges to chase).
    *
    * Scale shape: decode + hashing stay inside the map over asset
    * partitions; everything downstream shuffles (id, kind, signature
    * string) rows, NEVER payloads. */
  def assetSignature(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.map { a =>
      val h = a.media_type match {
        case "image" => phashOfPayload(a.payload)
        case "audio" => afpOfPayload(a.payload)
        case _       => vsigOfPayload(a.payload)
      }
      (a.asset_id, a.media_type, a.media_type + ":" + h)
    }.toDF("doc_id", "kind", "sig")
  }

  /** Frame-sequence signature over REAL decoded frames — the video
    * analogue of [[perceptualHash]]/[[audioFingerprint]]: every frame of
    * the container decodes in order and its exact integer mean gray feeds
    * a polynomial rolling hash mod 2³¹−1 (h ← (h·257 + mean+1) mod p over
    * ALL frames, then h ← (h·257 + frameCount) mod p) — so two videos
    * share a signature iff their full decoded frame-mean SEQUENCES,
    * including length, hash-agree (no truncation; a prior byte-packed
    * variant silently capped at 8 frames and ignored length). The
    * per-frame mean is exact integer arithmetic (Σgray·1 over w·h pixels;
    * `(sum / npix)` integer division), and every hash step stays below
    * 2⁴¹, so the signature is bit-deterministic and replayable by plain
    * BIGINT arithmetic in any engine.
    *
    * Scale shape: whole-sequence decode runs inside the map over asset
    * partitions — dedup shuffles (asset_id, 8-byte signature), never
    * frames or payloads. */
  def videoSignature(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.map(a => (a.asset_id, vsigOfPayload(a.payload))).toDF("doc_id", "vsig")
  }

  /** [[videoSignature]]'s per-payload hash: the mod-(2³¹−1) polynomial
    * rolling hash over all decoded frame means plus the frame count. */
  private[graft] def vsigOfPayload(payload: Array[Byte]): Long = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    val P = 2147483647L // 2^31 - 1
    var sig = 0L
    var f = 0
    while (f < n) {
      val img = reader.read(f)
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += (img.getRGB(x, y) & 0xFF).toLong; x += 1 }
        y += 1
      }
      val mean = sum / (w.toLong * h)
      sig = (sig * 257L + mean + 1L) % P
      f += 1
    }
    sig = (sig * 257L + n) % P
    reader.dispose()
    iis.close()
    sig
  }

  /** Deterministic REAL-image asset table: each payload is a genuine PNG
    * (encoded with the JDK's `javax.imageio`, decoded back by
    * [[MultimodalCodec.decode]]'s real image branch), constant-color RGB
    * with dimensions and color closed-form in the asset id — so a SQL
    * oracle can recompute every decoded value (width, height, channel
    * means) from metadata alone while the Spark side derives them from the
    * actual bytes. Generation is distributed (`map` over the docs table);
    * nothing image-shaped touches the driver. */
  def syntheticImageAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 16).toInt
      val h = 8 + (id % 12).toInt
      val rgb = ((id % 256).toInt << 16) | (((id * 31) % 256).toInt << 8) | ((id * 77) % 256).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaAsset(id, "image", bos.toByteArray, w, h, 0L)
    }
  }

  /** Deterministic REAL-image asset table with non-constant content: 8×8
    * grayscale gradient PNGs whose pixel grid p(x,y) = (seed·31 + x·7 +
    * y·13) mod 256 is keyed by seed = id mod 17 — so ids that agree mod 17
    * are pixel-identical images (the duplicate groups
    * [[perceptualHash]]-based dedup must find), and a SQL oracle can
    * recompute every pixel, and therefore the hash, from the id alone.
    * PNG is lossless, so the decoded grid equals the formula exactly. */
  def syntheticPatternImageAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map(id =>
      MediaAsset(id, "image", patternPngPayload(id), 8, 8, 0L))
  }

  /** The 8×8 keyed-pattern PNG payload (seed = id mod 17, pixel (x,y) =
    * (seed·31 + x·7 + y·13) mod 256) — shared by
    * [[syntheticPatternImageAssets]] and [[syntheticMixedAssets]]. */
  private def patternPngPayload(id: Long): Array[Byte] = {
    val seed = (id % 17).toInt
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val p = (seed * 31 + x * 7 + y * 13) % 256
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL-audio asset table with non-constant content, keyed
    * for collisions: 1024-sample 16-bit mono WAVs whose samples are
    * constant inside each of 64 equal windows, v(w) = (((seed·31 + w·7)
    * mod 256) − 128)·16 with seed = id mod 13 — ids that agree mod 13 are
    * sample-identical recordings (the duplicate groups
    * [[audioFingerprint]]-based dedup must find), and a SQL oracle can
    * recompute every window value, and therefore the fingerprint, from the
    * id alone. 16-bit PCM in a WAV container is lossless, so the decoded
    * samples equal the formula exactly. */
  def syntheticPatternAudioAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map(id =>
      MediaAsset(id, "audio", patternWavPayload(id), 0, 0, 1024L * 1000 / 8000))
  }

  /** The 1024-sample keyed-pattern WAV payload (seed = id mod 13, window w
    * carries v(w) = (((seed·31 + w·7) mod 256) − 128)·16) — shared by
    * [[syntheticPatternAudioAssets]] and [[syntheticMixedAssets]]. */
  private def patternWavPayload(id: Long): Array[Byte] = {
    val seed = (id % 13).toInt
    val n = 1024
    val rate = 8000
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((((seed * 31 + (i / 16) * 7) % 256) - 128) * 16)
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Energy-envelope fingerprint over REAL decoded samples — the audio
    * analogue of [[perceptualHash]]: the decoded PCM stream is cut into 64
    * equal windows and bit w is set iff window w's absolute-amplitude sum
    * is strictly above the per-window average, compared in EXACT integer
    * arithmetic (winAbs·64 > totalAbs) so the fingerprint is
    * bit-deterministic and replayable from the sample formula in any
    * engine. This is the shape (chromaprint-style envelope hashing) audio
    * dedup pipelines cluster on.
    *
    * Scale shape: decode and hashing run inside the map over asset
    * partitions — downstream dedup shuffles (asset_id, 8-byte hash) rows,
    * NEVER samples or payloads. */
  def audioFingerprint(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.map(a => (a.asset_id, afpOfPayload(a.payload))).toDF("doc_id", "ahash")
  }

  /** [[audioFingerprint]]'s per-payload hash: the 64-window exact-integer
    * envelope fingerprint over decoded PCM. */
  private[graft] def afpOfPayload(payload: Array[Byte]): Long = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val bytes = ais.readAllBytes()
    val frames = bytes.length / 2
    val winAbs = new Array[Long](64)
    var i = 0
    while (i < frames) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toLong
      // proportional window boundaries (w = ⌊i·64/frames⌋): windows
      // differ by at most one sample; a floor-length variant dumped the
      // up-to-63-sample remainder into window 63, biasing bit 63 high
      // for frame counts not divisible by 64.
      val w = (i.toLong * 64L / frames).toInt
      winAbs(w) += math.abs(s)
      i += 1
    }
    val total = winAbs.sum
    var hash = 0L
    var w = 0
    while (w < 64) {
      if (winAbs(w) * 64 > total) hash |= 1L << w
      w += 1
    }
    hash
  }

  /** Perceptual (average) hash over REAL decoded pixels — the pHash-family
    * content fingerprint image dedup pipelines cluster on: bit (y·w+x) is
    * set iff pixel (x,y) is strictly brighter than the image mean. The
    * threshold compares p·n > Σp in EXACT integer arithmetic (no float
    * mean), so the hash is bit-deterministic and replayable from the pixel
    * formula in any engine.
    *
    * Scale shape: decode and hashing run inside the map over asset
    * partitions — downstream dedup shuffles (asset_id, 8-byte hash) rows,
    * NEVER pixels or payloads. */
  def perceptualHash(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.map(a => (a.asset_id, phashOfPayload(a.payload))).toDF("doc_id", "phash")
  }

  /** [[perceptualHash]]'s per-payload hash: average-hash bits over decoded
    * pixels in exact integer arithmetic. */
  private[graft] def phashOfPayload(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val (w, h) = (img.getWidth, img.getHeight)
    val n = w * h
    val ps = new Array[Long](n)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (img.getRGB(x, y) & 0xFF).toLong
        ps(y * w + x) = p
        total += p
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < n && i < 64) {
      if (ps(i) * n > total) hash |= 1L << i
      i += 1
    }
    hash
  }
}

/** Media codec. The IMAGE branch is REAL: `javax.imageio` (PNG/BMP/GIF/JPEG
  * readers ship in the JDK) decodes the payload to pixels and extracts
  * [width, height, meanR, meanG, meanB] features. The AUDIO branch is REAL:
  * `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU PCM readers ship in the
  * JDK) decodes the payload to samples and extracts [frames, sampleRate,
  * RMS] features. The VIDEO branch is REAL for multi-frame containers the
  * JDK reads (animated GIF): every frame decodes in sequence to
  * [frameCount, width, height, firstFrameMean, lastFrameMean]. Only
  * inter-frame-compressed codecs (H.264/VP9) fall through to the
  * deterministic fake, which also backstops any payload that is not a
  * decodable container (e.g. the text-byte synthetic assets).
  * `contentHash`/byte plumbing are real everywhere. */
final class MultimodalCodec(featureDim: Int) extends Serializable {

  def decode(mediaType: String, payload: Array[Byte]): Array[Double] =
    if (mediaType == "image") {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) fakeDecode(payload) else imageFeatures(img)
    } else if (mediaType == "audio") {
      audioFeatures(payload).getOrElse(fakeDecode(payload))
    } else if (mediaType == "video") {
      videoFeatures(payload).getOrElse(fakeDecode(payload))
    } else fakeDecode(payload)

  /** Real frame-sequence statistics over a JDK-decodable multi-frame
    * container (animated GIF): decodes EVERY frame in order and returns
    * [frameCount, width, height, meanGray(first frame), meanGray(last
    * frame)] (means in [0,1]), padded/truncated to `featureDim` — the
    * last-frame stat requires iterating the full sequence, so a match
    * proves whole-video decode, not just header parsing. None when the
    * payload is not a supported multi-frame container. */
  private def videoFeatures(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else {
              var first: Array[Double] = null
              var last: Array[Double] = null
              var i = 0
              while (i < n) {
                val stats = imageFeatures(reader.read(i))
                if (i == 0) first = stats
                last = stats
                i += 1
              }
              // gray = identical channel means; report the red channel
              val full = Array(n.toDouble, first(0), first(1), first(2), last(2))
              Some(java.util.Arrays.copyOf(full, featureDim))
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch {
      case _: java.io.IOException => None
      case _: IndexOutOfBoundsException => None
    }

  /** Real sample statistics over a JDK-decodable PCM payload (WAV/AIFF/AU):
    * [frames, sampleRate, RMS], padded/truncated to `featureDim`; None when
    * the payload is not a supported audio container or not 16-bit PCM. */
  private def audioFeatures(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val data = ais.readAllBytes()
          val channels = fmt.getChannels
          val bytesPerSample = 2
          val frameSize = channels * bytesPerSample
          val frames = data.length / frameSize
          var sumSq = 0.0
          var i = 0
          val total = frames * channels
          while (i < total) {
            val off = i * bytesPerSample
            val s =
              if (fmt.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xFF)).toShort
              else ((data(off + 1) << 8) | (data(off) & 0xFF)).toShort
            sumSq += s.toDouble * s.toDouble
            i += 1
          }
          val rms = if (total == 0) 0.0 else math.sqrt(sumSq / total)
          val full = Array(frames.toDouble, fmt.getSampleRate.toDouble, rms)
          Some(java.util.Arrays.copyOf(full, featureDim))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Real pixel statistics: [width, height, meanR, meanG, meanB] (channel
    * means in [0,1]), padded/truncated to `featureDim`. */
  private def imageFeatures(img: java.awt.image.BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val full = Array(w.toDouble, h.toDouble, sr / n / 255.0, sg / n / 255.0, sb / n / 255.0)
    java.util.Arrays.copyOf(full, featureDim)
  }

  /** STUB (video only — image and audio have real branches above): a real
    * implementation decodes H.264 here. The fake is deterministic in the
    * payload bytes so pipelines are testable; it also backstops
    * image/audio-labeled payloads that are not decodable containers. */
  private def fakeDecode(payload: Array[Byte]): Array[Double] = {
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
