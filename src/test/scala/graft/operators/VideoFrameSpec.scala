package graft.operators

import graft.SparkSpec

/** Video modality: stream walk, frame formulas, rotation checksums,
  * sampling stride, and decoder fail-fast on truncation. */
class VideoFrameSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked stream: frame count, dims, rotated checksums, sampling") {
    val text = "abcd" // len 4 -> w 6, h 6, frames 6
    val doc = Multimodal.encodeVideo(7L, text)
    doc.media_type shouldBe "video/x-ppm-stream"
    val frames = Multimodal.decodeVideoFrames(doc)
    frames should have length 6
    all(frames.map(_.width)) shouldBe 6
    all(frames.map(_.height)) shouldBe 6
    // raster = 108 bytes of text rotated by f: 27 full periods of
    // "abcd" regardless of rotation -> all checksums equal, and the
    // per-frame FIRST byte differs (rotation is real)
    val period = "abcd".map(_.toInt).sum
    all(frames.map(_.px_checksum)) shouldBe 27L * period
    // rotation check directly on the encoder: frame 1 of "abcd" starts at 'b'
    val b = doc.media
    val hdr = "P6\n6 6\n255\n".length
    val frameLen = hdr + 108
    b(hdr) shouldBe 'a'.toByte
    b(frameLen + hdr) shouldBe 'b'.toByte
    // every-2nd sampling keeps frames 0, 2, 4
    val sampled = Multimodal.sampleFrames(spark,
      Seq(doc).toDS(), everyN = 2).collect().map(_.frame_idx).sorted
    sampled shouldBe Array(0, 2, 4)
  }

  test("uneven rotation: checksums differ across frames when the period does not divide the raster") {
    val text = "abcde" // len 5 -> w 7, h 7, raster 147 = 29*5 + 2
    val frames = Multimodal.decodeVideoFrames(Multimodal.encodeVideo(1L, text))
    frames.map(_.px_checksum).distinct.size should be > 1
  }

  test("truncated stream fails fast") {
    val doc = Multimodal.encodeVideo(2L, "abcd")
    val cut = doc.copy(media = doc.media.dropRight(5),
      byte_len = doc.byte_len - 5)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeVideoFrames(cut)
    }
    e.getMessage should include("truncated")
  }
}
