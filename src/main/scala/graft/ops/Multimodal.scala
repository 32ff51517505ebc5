package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side machinery — schema, partitioning, batched per-partition
  * processing shape, output contract — is real and tested. The actual codec
  * work is STUBBED behind [[DecodeStub]] (this container has no image/audio
  * libraries): the stub is a deterministic pure function of the bytes, so
  * tests are stable and the pipeline shape (columnar in → typed features
  * out, executed with `mapPartitions` batching, the Scala analog of
  * `mapInPandas`) is exactly what a real decoder would drop into.
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

  /** STUB decoder: a real implementation would decode the payload with an
    * image/audio codec. Deterministic fake: 8 float features folded from the
    * byte stream. Marked clearly; swap the body, keep the signature. */
  object DecodeStub {
    val featDim = 8
    def decodeFeatures(bytes: Array[Byte]): Array[Float] = {
      // ??? ← real codec goes here; deterministic fake below keeps the
      // pipeline testable in this container.
      val acc = new Array[Float](featDim)
      var i = 0
      while (i < bytes.length) { acc(i % featDim) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
      val n = math.max(1, bytes.length / featDim)
      acc.map(_ / n)
    }
  }

  /** Batched feature extraction: `mapPartitions` (one JVM-side batch per
    * partition — the Scala analog of `mapInPandas`'s arrow batches). The
    * partition is the unit of work; repartition upstream to size batches. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val feat = DecodeStub.decodeFeatures(a.bytes)
        MediaFeatures(a.asset_id, a.kind, feat, feat.nonEmpty)
      }
    }
  }

  /** Frame sampling plumbing for video payloads: byte-range slicing stands
    * in for codec frame extraction; emits (asset_id, frame_idx, frame_bytes)
    * via a lateral explode — the real decoder swaps the slice for a frame
    * grab, the distribution shape is identical. */
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

  /** Resize plumbing: metadata transform (target dims recorded, payload
    * untouched by the stub). */
  def resizePlan(assets: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide).cast("double") /
      greatest(col("width"), col("height")))
    assets.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
