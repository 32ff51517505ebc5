package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side machinery — schema, partitioning, batched per-partition
  * processing shape, output contract — is real and tested. Decode itself is
  * split in two:
  *
  *  - REAL decode for every image/audio format in reach: PNG pixels
  *    (pure-JVM zlib + full unfiltering), GIF pixels (pure-JVM LZW),
  *    24-bit BMP pixels, WAV PCM samples — see [[MediaCodecs]] — plus
  *    JPEG pixels via the JDK's BUILT-IN ImageIO codec (`java.desktop`,
  *    part of the JDK, no external dependency). [[extractFeatures]]
  *    computes real pixel/sample statistics for all of these.
  *  - [[DecodeStub]] remains ONLY for video FRAME decode (no video codec
  *    exists in the JDK) and formats outside the set above: a
  *    deterministic pure function of the bytes, so tests are stable and
  *    the pipeline shape (columnar in → typed features out, executed with
  *    `mapPartitions` batching, the Scala analog of `mapInPandas`) is
  *    exactly what a real codec would drop into.
  */
object Multimodal {

  /** Asset row: opaque payload + typed metadata. */
  final case class MediaAsset(asset_id: Long, kind: String, // image|audio|video
                              bytes: Array[Byte], width: Int, height: Int,
                              sample_rate: Int, n_frames: Int)

  final case class MediaFeatures(asset_id: Long, kind: String,
                                 feat: Array[Float], ok: Boolean)

  /** Deterministic synthetic assets (payload bytes derived from the id). */
  def syntheticAssets(spark: SparkSession, n: Long, parts: Int = 8): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id % 192).toInt
      val bytes = Array.tabulate[Byte](len)(i => ((id * 31 + i * 7) % 251).toByte)
      MediaAsset(id, kind, bytes, 32 + (id % 64).toInt, 32 + (id % 48).toInt,
        16000, 16 + (id % 16).toInt)
    }
  }

  /** STUB decoder for VIDEO FRAMES and out-of-set formats only: a real
    * implementation would decode the payload with a video codec library
    * neither this container nor the JDK ships. Deterministic fake: 8 float
    * features folded from the byte stream. Marked clearly; swap the body,
    * keep the signature. PNG/BMP/GIF/JPEG/WAV payloads never reach this —
    * [[MediaCodecs]] decodes them for real. */
  object DecodeStub {
    val featDim = 8
    def decodeFeatures(bytes: Array[Byte]): Array[Float] = {
      // ??? ← real entropy codec goes here; deterministic fake below keeps
      // the pipeline testable in this container.
      val acc = new Array[Float](featDim)
      var i = 0
      while (i < bytes.length) { acc(i % featDim) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
      val n = math.max(1, bytes.length / featDim)
      acc.map(_ / n)
    }
  }

  /** Real per-payload features (dim 8, fixed layout):
    *  - decodable image (PNG/BMP/GIF via the pure-JVM codecs; JPEG via the
    *    JDK's built-in ImageIO): [width, height, channels, mean, std,
    *    min, max, 1f] over all 8-bit samples;
    *  - decodable audio (WAV PCM): [n_samples, channels, sample_rate,
    *    mean, rms, min, max, 1f] over sign-normalized samples;
    *  - anything else: [[DecodeStub]] folding with a trailing 0f flag slot
    *    overwritten — last slot 1f ⇔ a real codec produced the features. */
  def decodeFeatures(bytes: Array[Byte]): Array[Float] = {
    MediaCodecs.decodeImage(bytes) match {
      case Some(img) =>
        val n = img.pixels.length
        var sum = 0.0; var sumSq = 0.0; var mn = 255; var mx = 0
        var i = 0
        while (i < n) {
          val v = img.pixels(i) & 0xFF
          sum += v; sumSq += v.toDouble * v
          if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        val mean = sum / math.max(1, n)
        val std = math.sqrt(math.max(0.0, sumSq / math.max(1, n) - mean * mean))
        Array(img.width.toFloat, img.height.toFloat, img.channels.toFloat,
          mean.toFloat, std.toFloat, mn.toFloat, mx.toFloat, 1f)
      case None =>
        MediaCodecs.decodeWavPcm(bytes) match {
          case Some(a) =>
            val n = a.samples.length
            var sum = 0.0; var sumSq = 0.0
            var mn = Int.MaxValue; var mx = Int.MinValue
            var i = 0
            while (i < n) {
              val v = a.samples(i)
              sum += v; sumSq += v.toDouble * v
              if (v < mn) mn = v; if (v > mx) mx = v
              i += 1
            }
            val mean = sum / math.max(1, n)
            val rms = math.sqrt(sumSq / math.max(1, n))
            Array(n.toFloat, a.channels.toFloat, a.sampleRate.toFloat,
              mean.toFloat, rms.toFloat,
              (if (n == 0) 0 else mn).toFloat, (if (n == 0) 0 else mx).toFloat, 1f)
          case None =>
            val f = DecodeStub.decodeFeatures(bytes)
            f(DecodeStub.featDim - 1) = 0f // stub flag: no real codec ran
            f
        }
    }
  }

  /** Batched feature extraction: `mapPartitions` (one JVM-side batch per
    * partition — the Scala analog of `mapInPandas`'s arrow batches). The
    * partition is the unit of work; repartition upstream to size batches.
    * Decodable payloads (PNG/BMP/WAV PCM) get REAL pixel/sample features;
    * entropy-coded ones fall through to the declared [[DecodeStub]]. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val feat = decodeFeatures(a.bytes)
        MediaFeatures(a.asset_id, a.kind, feat, feat.nonEmpty)
      }
    }
  }

  /** Frame sampling plumbing for video payloads: byte-range slicing stands
    * in for codec frame extraction; emits (asset_id, frame_idx, frame_bytes)
    * via a lateral explode — the real decoder swaps the slice for a frame
    * grab, the distribution shape is identical. For MJPEG AVI payloads use
    * [[sampleMjpegFrames]], which extracts REAL frames. */
  def sampleFrames(assets: DataFrame, everyN: Int = 4): DataFrame = {
    assets.where(col("kind") === "video")
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"),
        col("bytes"))
      .withColumn("frame_bytes",
        // stub: slice a window per frame; real impl decodes frame_idx
        expr("substring(bytes, frame_idx * 4 + 1, 16)"))
      .drop("bytes")
  }

  /** REAL video frame sampling for MJPEG AVI payloads (`idCol`, `bytesCol`):
    * every `everyN`-th frame of the `movi` stream comes out as its own row
    * `(asset_id, frame_idx, frame_jpeg)` — each `frame_jpeg` is a complete
    * JPEG image, decodable with [[MediaCodecs.decodeJdkImage]]. Payloads
    * that are not MJPEG AVIs are dropped (fail-closed), making this safe to
    * point at a mixed binary column. Inter-frame video codecs (H.264 …)
    * have no JDK decoder and remain [[DecodeStub]] territory. */
  def sampleMjpegFrames(assets: DataFrame, idCol: String, bytesCol: String,
                        everyN: Int = 2): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        MediaCodecs.mjpegFrames(b) match {
          case Some(frames) =>
            frames.indices.by(everyN).map(i => (id, i, frames(i)))
          case None => Iterator.empty
        }
      })
      .toDF(idCol, "frame_idx", "frame_jpeg")
  }

  /** REAL header metadata (no codec needed): parse PNG/GIF/BMP/JPEG
    * container headers for format + dimensions via the codegen'd
    * [[graft.functions.ImageDimsExpr]] — the filter/partition columns of a
    * media pipeline come from headers, not pixel decode. NULL for
    * unrecognized/truncated payloads. */
  def imageMeta(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ImageDimsExpr.imageDims(bytes)

  /** REAL audio header metadata: WAV fmt-chunk scan (channels, sample
    * rate, bit depth) via the codegen'd
    * [[graft.functions.AudioMetaExpr]]. */
  def audioMeta(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.AudioMetaExpr.audioMeta(bytes)

  /** REAL video container header metadata: MP4/ISO-BMFF `moov/mvhd`
    * duration + first `trak/tkhd` display dims via the codegen'd
    * [[graft.functions.VideoMetaExpr]] — with this, the decode stub's
    * remit shrinks to pixels/samples only; every filter/partition column
    * (format, duration, dims, channels, rate) is real header parsing. */
  def videoMeta(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.VideoMetaExpr.videoMeta(bytes)

  /** REAL windowed audio features over decoded PCM (the audio analog of
    * [[resizeImages]]): WAV payloads decode via [[MediaCodecs.decodeWavPcm]]
    * and each COMPLETE window of `windowSize` samples emits
    * `(idCol, window_idx, rms, peak, zero_crossings)` — the quality/silence
    * filter columns of an audio training pipeline. RMS is
    * `sqrt(sumOfSquares / windowSize)`: the sum of squared 16-bit samples is
    * an exact Long, and with a power-of-two window the division and the
    * IEEE-correctly-rounded sqrt are bit-deterministic, so the values are
    * exactly recomputable by any engine (that is what makes the driver
    * oracle exact, not tolerance-based). Trailing partial windows are
    * dropped; non-WAV payloads are dropped (fail-closed). */
  def audioFeatures(assets: DataFrame, idCol: String, bytesCol: String,
                    windowSize: Int): DataFrame = {
    require(windowSize >= 2)
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        MediaCodecs.decodeWavPcm(b) match {
          case Some(a) =>
            val full = a.samples.length / windowSize
            (0 until full).iterator.map { w =>
              var i = w * windowSize
              val end = i + windowSize
              var sumSq = 0L; var peak = 0; var zc = 0
              var prev = 0L; var first = true
              while (i < end) {
                val s = a.samples(i)
                sumSq += s.toLong * s
                val as = math.abs(s)
                if (as > peak) peak = as
                if (!first && prev * s < 0) zc += 1
                prev = s; first = false
                i += 1
              }
              (id, w, math.sqrt(sumSq.toDouble / windowSize), peak, zc)
            }
          case None => Iterator.empty
        }
      })
      .toDF(idCol, "window_idx", "rms", "peak", "zero_crossings")
  }

  /** REAL pixel resize: decode (any in-reach format — PNG/BMP/GIF pure-JVM,
    * JPEG via the JDK), bilinear-resample so the longest side is `maxSide`
    * (aspect preserved, never upscaled), re-encode as PNG (lossless, so the
    * output raster IS the resampled raster). Emits
    * `(idCol, src_width, src_height, width, height, png)`; undecodable
    * payloads are dropped (fail-closed). CPU-bound per-row work — feed it a
    * scan that splits (row-group-sized files) or repartition upstream. */
  def resizeImages(assets: DataFrame, idCol: String, bytesCol: String,
                   maxSide: Int): DataFrame = {
    require(maxSide >= 1)
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        MediaCodecs.decodeImage(b).map { img =>
          val scale = math.min(1.0, maxSide.toDouble / math.max(img.width, img.height))
          val tw = math.max(1, math.ceil(img.width * scale).toInt)
          val th = math.max(1, math.ceil(img.height * scale).toInt)
          val resized = MediaCodecs.resizeBilinear(img, tw, th)
          // filter 0 + BEST_SPEED: the PNG is a lossless container here —
          // any filter/level decodes to the identical raster, and heavier
          // zlib effort on freshly-resampled pixels is pure CPU overhead
          (id, img.width, img.height, resized.width, resized.height,
            MediaCodecs.encodePng(resized, _ => 0,
              java.util.zip.Deflater.BEST_SPEED))
        }
      })
      .toDF(idCol, "src_width", "src_height", "width", "height", "png")
  }

  /** Resize PLAN (metadata-only transform): target dims recorded, payload
    * untouched — the cheap projection a pipeline runs to size work before
    * committing to the pixel pass ([[resizeImages]] is the real thing). */
  def resizePlan(assets: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide).cast("double") /
      greatest(col("width"), col("height")))
    assets.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
