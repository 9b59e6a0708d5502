package graft.operators

import java.nio.charset.StandardCharsets

import graft.SparkSpec

/** PNG encode/decode: round-trip identity, the five-filter coverage,
  * multi-IDAT reassembly, and loud failure on every corruption class
  * (signature, CRC, truncation, zlib truncation). */
class PngSpec extends SparkSpec {

  private def doc(text: String, id: Long = 7L) = Multimodal.encodePng(id, text)

  test("round-trip: decoded features mirror the synthesized raster") {
    val text = "the quick brown fox jumps over the lazy dog, twice over"
    val n = text.getBytes(StandardCharsets.UTF_8).length
    val f = Multimodal.decodePng(doc(text))
    f.width shouldBe n % 11 + 2
    f.height shouldBe n % 5 + 2
    f.n_idat shouldBe 2
    f.n_filtered shouldBe f.height.toLong * (1 + 3 * f.width)
    f.filter_sum shouldBe (0 until f.height).map(_ % 5).sum.toLong
    val raster = f.width * f.height * 3
    val want = text.getBytes(StandardCharsets.UTF_8)
      .take(raster).map(_ & 0xff).sum.toLong
    f.px_checksum shouldBe want
  }

  test("all five scanline filters are exercised and inverted") {
    // h = n%5+2 = 6 needs n ≡ 4 (mod 5); bytes chosen to make Paeth's
    // three-way tie-break and Average's floor actually bite
    val text = (0 until 59).map(i => ('A' + (i * 37) % 58).toChar).mkString
    text.length % 5 shouldBe 4
    val f = Multimodal.decodePng(doc(text))
    f.height shouldBe 6
    f.filter_sum shouldBe (0 + 1 + 2 + 3 + 4 + 0).toLong
    val raster = f.width * f.height * 3
    f.px_checksum shouldBe text.getBytes(StandardCharsets.UTF_8)
      .take(raster).map(_ & 0xff).sum.toLong
  }

  test("empty text still yields a decodable all-zero raster") {
    val f = Multimodal.decodePng(doc(""))
    f.width shouldBe 2
    f.height shouldBe 2
    f.px_checksum shouldBe 0L
  }

  test("corruption fails loud: signature, CRC, truncation, zlib") {
    val good = doc("corruption fixture payload")
    def mutated(i: Int, v: Byte) = {
      val b = good.media.clone(); b(i) = v; good.copy(media = b)
    }
    // bad signature
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(mutated(0, 0x00))
    }.getMessage should include("bad signature")
    // flip a byte inside the first IDAT payload -> CRC mismatch
    intercept[IllegalArgumentException] {
      val idatData = 8 + 25 + 8 + 4 // sig + IHDR chunk + IDAT len+type
      Multimodal.decodePng(
        mutated(idatData, (good.media(idatData) ^ 0x5a).toByte))
    }.getMessage should include("CRC mismatch")
    // truncate mid-chunk
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(
        good.copy(media = good.media.take(good.media.length - 20)))
    }.getMessage should (include("truncated") or include("CRC mismatch"))
  }

  test("batched extraction over a DataFrame matches per-doc decode") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "zz"))
      .toDF("doc_id", "text")
    val got = Multimodal.extractPngFeatures(spark,
        Multimodal.attachPng(spark, df), batchSize = 2)
      .collect().sortBy(_.doc_id)
    val want = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "zz"))
      .map { case (id, t) => Multimodal.decodePng(Multimodal.encodePng(id, t)) }
    got.toSeq shouldBe want
  }
}
