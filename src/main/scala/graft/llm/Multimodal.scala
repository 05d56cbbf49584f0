package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column conventions: image/audio/video as opaque binary
  * columns with typed metadata (builder mandate; SURVEY.md §7 Phase 4).
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * decode, frame explosion — is real and tested. The codec step itself is a
  * STUB (deterministic fake features derived from the bytes): this
  * container has no image/audio libraries, and the builder prompt says to
  * stub decode while keeping the distributed plumbing honest. Swapping in a
  * real decoder changes only the body of [[FakeCodec.decode]].
  */
object Multimodal {

  /** A decoded media batch row: (id, features). */
  final case class MediaFeatures(id: Long, features: Array[Float])

  /** A sampled frame: (id, frameIdx, frameBytes). */
  final case class Frame(id: Long, frameIdx: Int, frame: Array[Byte])

  /** STUB codec — deterministic pseudo-features from the bytes. A real
    * implementation calls the image/audio decoder here; everything around
    * it (distribution, batching, schema) is unchanged. */
  object FakeCodec {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // deterministic rolling hash of the payload
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(d) = ((h >>> 16).toInt % 1000) / 1000.0f
        d += 1
      }
      out
    }
  }

  /** Attach a synthetic media struct to any table: opaque bytes derived
    * from a text column + typed metadata. Demonstrates the column
    * convention {bytes BINARY, mime STRING, width INT, height INT,
    * duration_ms BIGINT} on fixture data. */
  def attachSyntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("media", struct(
      unbase64(base64(col(textCol).cast("binary"))).as("bytes"),
      when(col(idCol) % 2 === 0, "image/png").otherwise("audio/wav").as("mime"),
      (pmod(xxhash64(col(textCol)), lit(1024)) + 32).cast("int").as("width"),
      (pmod(xxhash64(col(idCol)), lit(768)) + 32).cast("int").as("height"),
      (pmod(xxhash64(col(textCol), col(idCol)), lit(60000))).as("duration_ms")))

  /** Decode features partition-parallel: each partition is a decode batch
    * (bundle), mirroring how a vectorized UDF would batch. The decode is
    * the stub above; the mapPartitions shape is the real contract. */
  def decodeFeatures(media: Dataset[(Long, Array[Byte])], dim: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { case (id, bytes) => MediaFeatures(id, FakeCodec.decode(bytes, dim)) }
    }
  }

  /** A resized media item. */
  final case class ResizedMedia(id: Long, width: Int, height: Int, bytes: Array[Byte])

  /** Resize stub: deterministic stride-resample of the payload to a byte
    * budget derived from the target geometry (budget = W·H/64 fake
    * bytes-per-image). A real implementation decodes + rescales here; the
    * partition-parallel shape, output schema, and determinism contract are
    * the real thing. Output length = min(budget, input length). */
  def resizeMedia(media: Dataset[(Long, Array[Byte])], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target geometry must be positive")
    val budget = math.max(targetW * targetH / 64, 1)
    media.mapPartitions(_.map { case (id, bytes) =>
      val n = math.min(budget, bytes.length)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        out(i) = bytes((bytes.length.toLong * i / n).toInt)
        i += 1
      }
      ResizedMedia(id, targetW, targetH, out)
    })
  }

  /** Frame sampling for video-ish payloads: n deterministic byte-slices
    * per media item, exploded to one row per frame. */
  def sampleFrames(media: Dataset[(Long, Array[Byte])], n: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { case (id, bytes) =>
      if (bytes.isEmpty) Iterator.empty
      else (0 until n).iterator.map { i =>
        val start = (bytes.length.toLong * i / n).toInt
        val end = (bytes.length.toLong * (i + 1) / n).toInt
        Frame(id, i, java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1)))
      }
    }
  }
}
