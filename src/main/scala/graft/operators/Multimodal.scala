package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, feature extraction as batched partition-local
  * processing.
  *
  * The Spark side — schema, partition-local batching, typed Dataset
  * boundary — is real and tested. The DECODER is a deterministic stub
  * (this container has no image/audio codecs): it derives features
  * from the raw bytes (length, frame-sample count, head checksum)
  * exactly the way a real decoder would expose dimensions/duration/
  * codec stats. Swap [[decodeStub]] for a JNI/codec call to go real —
  * the batching shape is what matters at 100 TB: each task processes
  * its partition in fixed-size batches (amortizing per-batch decoder
  * init, the same reason PySpark pipelines use mapInPandas batches).
  */
object Multimodal {

  final case class MediaDoc(
      doc_id: Long,
      media: Array[Byte],
      media_type: String,
      byte_len: Long)

  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      n_frames: Long,
      head_checksum: Long)

  /** Attach an opaque media column (here: the utf-8 bytes of `text`,
    * standing in for image/audio payloads) plus typed metadata. */
  def attachMedia(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("media_type"),
      octet_length(col("text")).cast("long").as("byte_len"))

  /** STUB decoder — deterministic fake of decode/frame-sample/feature
    * extraction. A real implementation would decode `media` here; the
    * stub "decodes" the payload back to text and checksums the first 16
    * CODEPOINTS (not raw bytes), so the semantics are byte-encoding
    * independent and match the oracle on non-ASCII content too. */
  def decodeStub(doc: MediaDoc): MediaFeatures = {
    val decoded = new String(doc.media, java.nio.charset.StandardCharsets.UTF_8)
    val head = decoded.codePoints().limit(16).asLongStream().sum()
    MediaFeatures(
      doc_id = doc.doc_id,
      byte_len = doc.media.length.toLong,
      n_frames = doc.media.length.toLong / 1000L + 1L, // frame sampling
      head_checksum = head)
  }

  /** Batched partition-local feature extraction. */
  def extractFeatures(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaDoc].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder init would live here
        batch.iterator.map(decodeStub)
      }
    }
  }
}
