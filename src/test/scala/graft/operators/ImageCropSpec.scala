package graft.operators

import graft.SparkSpec

/** centerCrop: a crop covering the whole image checksums like the
  * full decode, a hand-indexed interior crop matches the byte
  * arithmetic, and the centering offsets use integer division. */
class ImageCropSpec extends SparkSpec {
  import spark.implicits._

  test("a crop at least as large as the image equals the full-raster checksum") {
    val doc = Multimodal.encodePpm(1L, "hello world, crop me")
    val full = Multimodal.decodePpm(doc).px_checksum
    val out = Multimodal.centerCrop(spark, Seq(doc).toDS(), 100, 100)
      .collect().head
    out.px_checksum shouldBe full
    out.crop_w shouldBe out.width
    out.crop_h shouldBe out.height
  }

  test("hand-indexed interior crop: centered offsets, exact byte sum") {
    val text = "hello world, crop me" // len 20 -> w 9, h 8
    val doc = Multimodal.encodePpm(2L, text)
    val out = Multimodal.centerCrop(spark, Seq(doc).toDS(), 2, 2)
      .collect().head
    (out.width, out.height, out.crop_w, out.crop_h) shouldBe ((9L, 8L, 2L, 2L))
    // x0 = (9-2)/2 = 3, y0 = (8-2)/2 = 3; raster byte i = text byte i
    // for i < 20, else 0
    val bytes = text.getBytes("UTF-8")
    def px(i: Int): Long = if (i < bytes.length) (bytes(i) & 0xff).toLong else 0L
    val expected = (0 until 2).flatMap { dy =>
      val base = ((3 + dy) * 9 + 3) * 3
      (0 until 6).map(j => px(base + j))
    }.sum
    out.px_checksum shouldBe expected
  }
}
