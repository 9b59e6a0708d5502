package graft.operators

import graft.SparkSpec

/** Nearest-neighbor resize: hand-indexed cases — downscale to 1×1,
  * identity, and the pixel-repeating upscale. */
class ResizeSpec extends SparkSpec {
  import spark.implicits._

  // encodePpm("x") → len 1 ⇒ w = 1%13+2 = 3, h = 1%7+2 = 3; raster is
  // 27 bytes: byte 0 = 'x' (120), the rest zero-padding.
  private def one = spark.createDataset(Seq(Multimodal.encodePpm(7L, "x")))

  test("downscale to 1x1 reads exactly source pixel (0,0)") {
    val r = Multimodal.resizeNearest(spark, one, 1, 1).collect().head
    (r.width, r.height, r.out_w, r.out_h) shouldBe (3L, 3L, 1L, 1L)
    r.px_checksum shouldBe 120L // bytes (0,1,2) = 'x', 0, 0
  }

  test("identity resize sums the whole raster (matches the decoder checksum)") {
    val full = Multimodal.decodePpm(one.collect().head).px_checksum
    val r = Multimodal.resizeNearest(spark, one, 3, 3).collect().head
    r.px_checksum shouldBe full
    r.px_checksum shouldBe 120L
  }

  test("2x upscale repeats each source pixel four times") {
    // (x, y) in 6×6 reads (x*3/6, y*3/6) = (x/2, y/2): source (0,0)
    // is hit by the four output pixels (0..1, 0..1).
    val r = Multimodal.resizeNearest(spark, one, 6, 6).collect().head
    r.px_checksum shouldBe 480L
  }

  test("rectangular target uses independent axis mappings") {
    // 1×6: sy = y*3/6 = y/2 ⇒ rows 0,0,1,1,2,2 at sx = 0; pixel (0,0)
    // contributes twice ('x' twice), rows 1/2 are zero padding.
    val r = Multimodal.resizeNearest(spark, one, 1, 6).collect().head
    (r.out_w, r.out_h) shouldBe (1L, 6L)
    r.px_checksum shouldBe 240L
  }
}
