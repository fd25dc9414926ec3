package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` content columns plus typed
  * metadata, processed per-partition in batches.
  *
  * The decode step itself is STUBBED (this container ships no image/audio
  * codecs — see `FakeDecoder`): it is a deterministic stand-in with the
  * exact signature a real decoder (e.g. JNI JPEG/FFmpeg, or a Python
  * `mapInPandas` worker in PySpark) would have. Everything around it —
  * schema, batching, partition sizing, output contract — is real Spark
  * and tested.
  */
object Multimodal {

  /** A media record: the multimodal table schema. `content` is the opaque
    * payload; `meta` carries source-asserted properties. */
  case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      uri: String,
      content: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Extracted features: fixed-width vector + decoded properties. */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      content_hash: Long,
      decoded_width: Int,
      decoded_height: Int,
      frames_sampled: Int,
      feature: Array[Float])

  /** Deterministic fake decoder — the `???` boundary a real codec plugs
    * into. Derives pseudo-features from a rolling hash of the payload so
    * outputs are stable for tests; DOES NOT decode real media. */
  object FakeDecoder {
    val FeatureDim = 8

    def hashBytes(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
      }
      h
    }

    /** Stub decode: real impl would parse the container + codec here. */
    def decode(rec: MediaRecord): MediaFeatures = {
      val h = hashBytes(rec.content)
      val feat = Array.tabulate(FeatureDim) { i =>
        // scramble hash per dimension into [-1, 1]
        var z = h + (i + 1) * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z.toDouble / Long.MaxValue.toDouble).toFloat
      }
      val frames = rec.modality match {
        case "video" => math.max(1, (rec.duration_ms / 1000L).toInt) // 1 fps sample
        case "image" => 1
        case _       => 0
      }
      MediaFeatures(rec.media_id, rec.modality, rec.content.length.toLong, h,
        rec.width, rec.height, frames, feat)
    }
  }

  /** Feature extraction over a media table: batched per partition (the
    * shape a vectorized/Arrow decode path needs), no shuffle — a pure
    * narrow transformation that scales with input splits. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // Batch iterator: a real decoder amortizes codec init per batch.
      it.grouped(batchSize).flatMap { batch => batch.map(FakeDecoder.decode) }
    }
  }

  /** Demo media table derived deterministically from the documents table
    * (text bytes as payload) — exercises the plumbing without real media. */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    implicit val enc = Encoders.product[MediaRecord]
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      concat(lit("mem://doc/"), col("doc_id")).as("uri"),
      encode(col("text"), "UTF-8").as("content"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"),
      (col("n_chars") * 10).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }
}
