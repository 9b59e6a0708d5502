package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, feature extraction as batched partition-local
  * processing.
  *
  * The decode path is REAL: media payloads are P6 PPM images (the
  * netpbm format — a pure-ASCII header `P6 <w> <h> <maxval>` followed
  * by a w×h×3 RGB raster, decodable with zero codec dependencies), and
  * [[decodePpm]] is a spec-compliant parser (whitespace/comment
  * handling included) that extracts dimensions and a raster checksum —
  * the same shape a JPEG decoder would expose as dimensions/EXIF/
  * pixel stats. The batching shape is what matters at 100 TB: each
  * task processes its partition in fixed-size batches (amortizing
  * per-batch decoder init, the same reason PySpark pipelines use
  * mapInPandas batches).
  */
object Multimodal {

  final case class MediaDoc(
      doc_id: Long,
      media: Array[Byte],
      media_type: String,
      byte_len: Long)

  final case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      byte_len: Long,
      px_checksum: Long)

  /** Deterministic P6 PPM encoder: a w×h image whose raster is the
    * document's leading bytes (zero-padded). Dimensions derive from the
    * byte length so every doc gets a distinct-but-mirrorable shape —
    * the DuckDB oracle recomputes them from `strlen(text)`. */
  def encodePpm(docId: Long, text: String): MediaDoc = {
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val w = bytes.length % 13 + 2
    val h = bytes.length % 7 + 2
    val header = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
    val px = new Array[Byte](w * h * 3)
    System.arraycopy(bytes, 0, px, 0, math.min(bytes.length, px.length))
    val media = new Array[Byte](header.length + px.length)
    System.arraycopy(header, 0, media, 0, header.length)
    System.arraycopy(px, 0, media, header.length, px.length)
    MediaDoc(docId, media, "image/x-portable-pixmap", media.length.toLong)
  }

  /** Attach a real media column: each document's payload is a decodable
    * P6 PPM image standing in for crawled image bytes. */
  def attachMedia(spark: SparkSession, df: DataFrame): Dataset[MediaDoc] = {
    import spark.implicits._
    df.select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => encodePpm(id, text) }
  }

  /** REAL decoder — parses the P6 header per the netpbm spec (any
    * whitespace between tokens, `#` comments through end-of-line, one
    * whitespace byte before the raster), validates the raster length,
    * and folds the raster into an unsigned-byte checksum. Throws on
    * malformed input like any decoder would. */
  def decodePpm(doc: MediaDoc): MediaFeatures = {
    val b = doc.media
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
      s"doc ${doc.doc_id}: not a P6 PPM")
    var pos = 2
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\n' || c == '\t' || c == '\r'
    def skipWsAndComments(): Unit = {
      var moving = true
      while (moving) {
        while (pos < b.length && isWs(b(pos))) pos += 1
        if (pos < b.length && b(pos) == '#') {
          while (pos < b.length && b(pos) != '\n') pos += 1
        } else moving = false
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9',
        s"doc ${doc.doc_id}: malformed PPM header at byte $pos")
      var v = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(maxval == 255, s"doc ${doc.doc_id}: unsupported maxval $maxval")
    pos += 1 // exactly one whitespace byte separates header and raster
    require(b.length - pos == w * h * 3,
      s"doc ${doc.doc_id}: raster is ${b.length - pos} bytes, want ${w * h * 3}")
    var sum = 0L
    var i = pos
    while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
    MediaFeatures(doc.doc_id, w, h, b.length.toLong, sum)
  }

  /** Batched partition-local feature extraction over decodable media. */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[MediaDoc],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder init would live here
        batch.iterator.map(decodePpm)
      }
    }
  }
}
