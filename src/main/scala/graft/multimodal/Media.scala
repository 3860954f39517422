package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support for training-data pipelines: image/audio/video
  * payloads travel as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction / frame-sampling run as partition-local
  * typed transforms.
  *
  * The Spark-side plumbing — schema, encoders, batch shape, partitioning —
  * is real and tested. The codec step itself is STUBBED (this environment
  * ships no image/audio libraries): [[decodeStub]] produces a deterministic
  * fake decode derived from the payload bytes, clearly marked, with the
  * exact signature a libjpeg/ffmpeg-backed implementation would have.
  *
  * Scale posture: all transforms are `mapPartitions`-shaped (one JVM-local
  * pass, no shuffle); heavy payloads should be read with a small
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory, and feature extraction parallelizes per-partition with
  * zero driver involvement.
  */
object Media {

  /** An opaque media payload: bytes + source-asserted metadata. */
  case class MediaBlob(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      declared_width: Int,
      declared_height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** Decoded features: fixed-width vector + actual (decoded) dims. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Build a media table from any DataFrame with (id, payload) columns —
    * payload text is encoded to bytes; metadata is synthesized
    * deterministically. This stands in for `spark.read.format("binaryFile")`
    * over an object store, which yields the same (bytes + metadata) shape. */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaBlob] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      (col(idCol) % 640 + 16).cast("int").as("declared_width"),
      (col(idCol) % 480 + 16).cast("int").as("declared_height"),
      lit(16000).as("sample_rate"),
      (length(col(textCol)) * 10).cast("long").as("duration_ms"))
      .as[MediaBlob]
  }

  /** STUB decode ???: a real implementation would hand `blob.bytes` to an
    * image/audio codec here and return true dimensions + an embedding from
    * a vision/audio model. This deterministic fake derives everything from
    * the payload so tests are stable and the pipeline shape (partition-
    * local batch decode, fixed-width float feature output) is the real
    * thing. */
  def decodeStub(blob: MediaBlob, featureDim: Int = 8): MediaFeatures = {
    val h = java.util.Arrays.hashCode(blob.bytes)
    def mix(i: Int): Int = {
      var x = h ^ (i * 0x9e3779b9)
      x ^= x >>> 16; x *= 0x85ebca6b; x ^= x >>> 13
      x
    }
    MediaFeatures(
      media_id = blob.media_id,
      kind = blob.kind,
      width = math.abs(mix(1)) % 2048 + 1,
      height = math.abs(mix(2)) % 2048 + 1,
      n_frames = if (blob.kind == "video") math.abs(mix(3)) % 300 + 1 else 1,
      feature = Array.tabulate(featureDim)(i => (mix(i + 4) % 1000) / 1000.0f))
  }

  /** Partition-local decode + featurize: the canonical shape for codec
    * work on a cluster (each partition decodes its blobs in one pass;
    * nothing is collected to the driver). */
  def featurize(blobs: Dataset[MediaBlob], featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(b => decodeStub(b, featureDim)))
  }

  /** Frame sampling for video-kind rows: emit every `every`-th frame index
    * up to the decoded frame count — 1→N explode done partition-locally. */
  def sampleFrames(feats: Dataset[MediaFeatures], every: Int): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    feats.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(every))))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("width"), col("height"))
  }
}
