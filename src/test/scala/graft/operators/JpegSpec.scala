package graft.operators

import java.nio.charset.StandardCharsets

import graft.SparkSpec

/** Baseline JPEG encode/decode: DC-only fixture exactness, the full
  * AC entropy path (runs, ZRL, EOB, every size category) against a
  * bit-identical reference IDCT, restart-marker cycling through
  * D0..D7 with predictor resets, byte-stuffing round trips, and loud
  * failure on every corruption class (signature, truncated entropy,
  * bad Huffman codes, out-of-sequence restarts, missing EOI). */
class JpegSpec extends SparkSpec {

  /** The decoder's IDCT replicated operation-for-operation (same
    * loop order, same cosine table, same rounding) so general-
    * coefficient comparisons are exact, not approximate. */
  private def refIdct(coef: Array[Int]): Array[Int] = {
    val cosT = Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16))
    val cU = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val f = coef(v * 8 + u)
            if (f != 0)
              acc += cU(u) * cU(v) * f * cosT(x)(u) * cosT(y)(v)
            v += 1
          }
          u += 1
        }
        val p = math.round(acc / 4.0).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  private def flatBlock(v: Int): Array[Int] = {
    val blk = new Array[Int](64)
    blk(0) = 8 * (v - 128)
    blk
  }

  private def decodeAll(doc: Multimodal.MediaDoc) =
    Multimodal.decodeJpegPixels(doc)

  test("text fixture: dims from strlen, DC-only blocks reconstruct " +
      "the document bytes exactly, restart count matches") {
    val text = "a jpeg is worth a thousand huffman codes and one idct"
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val f = Multimodal.decodeJpeg(Multimodal.encodeJpeg(5L, text))
    val wb = bytes.length % 5 + 1
    val hb = bytes.length % 3 + 1
    f.width shouldBe 8 * wb
    f.height shouldBe 8 * hb
    f.n_blocks shouldBe wb * hb
    f.n_restarts shouldBe (wb * hb - 1) / 4
    val expect = (0 until wb * hb).map(i =>
      64L * (if (i < bytes.length) bytes(i) & 0xff else 0)).sum
    f.px_checksum shouldBe expect
  }

  test("DC extremes and restart predictor resets: values 0/255 " +
      "straddling restart boundaries round-trip exactly") {
    // max-swing DC sequence: the diff alternates +-2040 (category 11)
    val vals = Array(0, 255, 0, 255, 0, 255, 0, 255, 1, 254, 128, 7)
    val doc = Multimodal.encodeJpegCoeffs(7L,
      vals.map(flatBlock), 4, 3, restartInterval = 4)
    val (wb, hb, restarts, px) = decodeAll(doc)
    (wb, hb, restarts) shouldBe ((4, 3, 2))
    vals.zipWithIndex.foreach { case (v, i) =>
      val bx = (i % 4) * 8; val by = (i / 4) * 8
      px(by * 32 + bx) shouldBe v
      px((by + 7) * 32 + bx + 7) shouldBe v
    }
  }

  test("general AC coefficients: runs, ZRL, every size category, " +
      "byte stuffing — decoded pixels equal the reference IDCT bit " +
      "for bit") {
    val rnd = new scala.util.Random(290)
    val blocks = Array.tabulate(12) { i =>
      val blk = new Array[Int](64)
      blk(0) = rnd.nextInt(2001) - 1000 // DC diffs stay in category 11
      i % 4 match {
        case 0 => // dense: most ACs nonzero, all size categories
          for (k <- 1 until 64)
            if (rnd.nextInt(4) > 0) blk(k) = rnd.nextInt(2047) - 1023
        case 1 => // sparse tail: long zero runs -> ZRL then a hit
          blk(Multimodal.ZigzagNat(40)) = 513
          blk(Multimodal.ZigzagNat(63)) = -1
        case 2 => // early EOB: a couple of low-frequency ACs only
          blk(Multimodal.ZigzagNat(1)) = -1023
          blk(Multimodal.ZigzagNat(2)) = 3
        case _ => () // DC-only
      }
      blk
    }
    val doc = Multimodal.encodeJpegCoeffs(11L, blocks, 6, 2,
      restartInterval = 3)
    val (wb, hb, restarts, px) = decodeAll(doc)
    (wb, hb, restarts) shouldBe ((6, 2, 3))
    blocks.zipWithIndex.foreach { case (blk, i) =>
      val want = refIdct(blk)
      val bx = (i % 6) * 8; val by = (i / 6) * 8
      for (y <- 0 until 8; x <- 0 until 8)
        px((by + y) * 48 + bx + x) shouldBe want(y * 8 + x)
    }
  }

  test("restart markers cycle D0..D7 and wrap across a large grid") {
    val vals = Array.tabulate(64)(i => (i * 37) % 256)
    val doc = Multimodal.encodeJpegCoeffs(13L,
      vals.map(flatBlock), 8, 8, restartInterval = 2)
    val (_, _, restarts, px) = decodeAll(doc)
    restarts shouldBe 31 // (64 - 1) / 2: the 0..7 cycle wraps 3 times
    vals.zipWithIndex.foreach { case (v, i) =>
      px(((i / 8) * 8) * 64 + (i % 8) * 8) shouldBe v
    }
  }

  test("corruption classes fail loudly") {
    // 34 bytes -> a 5x2 block grid: restarts at MCUs 4 and 8
    val good = Multimodal.encodeJpeg(4L, "deterministic corruption corpus ab")
    def entropyStart(media: Array[Byte]): Int = {
      val i = media.indices.dropRight(1)
        .find(i => (media(i) & 0xff) == 0xff && (media(i + 1) & 0xff) == 0xda)
        .get
      i + 2 + 8 // marker + SOS segment (len 8)
    }
    // signature
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(good.copy(media = good.media.updated(1, 0x00.toByte)))
    }.getMessage should include("not a JPEG")
    // truncation inside the entropy-coded segment
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(good.copy(media =
        good.media.take(entropyStart(good.media) + 2)))
    }.getMessage should include("truncated")
    // an invalid Huffman code (a 1-bits prefix no table assigns)
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(good.copy(media =
        good.media.updated(entropyStart(good.media), 0xfb.toByte)))
    }.getMessage should include("bad Huffman code")
    // out-of-sequence restart marker
    val rstAt = good.media.indices.dropRight(1).find(i =>
      (good.media(i) & 0xff) == 0xff &&
        (good.media(i + 1) & 0xff) == 0xd0 &&
        i >= entropyStart(good.media)).get
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(good.copy(media =
        good.media.updated(rstAt + 1, 0xd5.toByte)))
    }.getMessage should include("restart marker out of sequence")
    // chopped trailer: the stream just ends after the entropy data
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(good.copy(media = good.media.dropRight(2)))
    }.getMessage should include("missing EOI")
    // wrong trailer: something other than EOI where EOI must be
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(good.copy(media =
        good.media.updated(good.media.length - 1, 0x00.toByte)))
    }.getMessage should include("missing EOI")
  }
}
