package graft.operators

import java.nio.charset.StandardCharsets

import graft.SparkSpec

/** GIF encode/decode: LZW round trips across the adversarial pattern
  * classes (all-same = immediate KwKwK, alternating, all-distinct,
  * width growth to 12-bit codes, the 4096 dictionary reset),
  * multi-sub-block reassembly, and loud failure on every corruption
  * class (signature, truncated block, missing trailer). */
class GifSpec extends SparkSpec {

  private def sums(idx: Array[Byte]): (Long, Long) = {
    val i = idx.map(_ & 0xff)
    (i.map(_.toLong).sum,
      i.map(v => (v + ((2 * v) & 0xff) + ((7 * v) & 0xff)).toLong).sum)
  }

  private def roundTrip(idx: Array[Byte], w: Int, h: Int): Unit = {
    val f = Multimodal.decodeGif(Multimodal.encodeGifRaster(9L, idx, w, h))
    val (is, ps) = sums(idx)
    f.width shouldBe w
    f.height shouldBe h
    f.idx_checksum shouldBe is
    f.px_checksum shouldBe ps
  }

  test("text fixture round-trips: dims from strlen, checksums mirror " +
      "the leading bytes zero-padded") {
    val text = "a gif is worth at least a thousand lzw codes, usually"
    val n = text.getBytes(StandardCharsets.UTF_8).length
    val f = Multimodal.decodeGif(Multimodal.encodeGif(3L, text))
    f.width shouldBe n % 13 + 2
    f.height shouldBe n % 7 + 2
    val take = math.min(f.width * f.height, n)
    val (is, ps) = sums(text.getBytes(StandardCharsets.UTF_8).take(take))
    f.idx_checksum shouldBe is
    f.px_checksum shouldBe ps
  }

  test("adversarial LZW patterns round-trip exactly") {
    // all-same: the KwKwK (code == next unassigned) case fires at once
    roundTrip(Array.fill(64)(0x41.toByte), 8, 8)
    // strict alternation: maximal dictionary churn on two symbols
    roundTrip(Array.tabulate(60)(i => (if (i % 2 == 0) 7 else 200).toByte),
      10, 6)
    // all-distinct bytes: no dictionary hit ever, pure literal stream
    roundTrip(Array.tabulate(100)(i => (i * 37 % 256).toByte), 10, 10)
  }

  test("code width grows past 9 bits and the 4096 reset path fires, " +
      "both inverted exactly") {
    // ~6k novel pairs pushes nextCode well past 512 (10- and 11-bit
    // codes) without resetting
    val grow = Array.tabulate(6000)(i => ((i * 131 + i / 7) % 256).toByte)
    roundTrip(grow, 100, 60)
    // ~16k pixels of high-novelty pairs drives nextCode to 4096 ->
    // CLEAR reset mid-stream
    val reset = Array.tabulate(16000)(i => ((i * 197 + i * i % 251) % 256).toByte)
    roundTrip(reset, 160, 100)
  }

  /** Length-n index sequence where EVERY consecutive pair is novel —
    * each of the n−1 pairs is an encoder miss, so the decoder's
    * dictionary lands on exactly 258 + (n−1) after the final data
    * code. Greedy construction over the 64k pair space. */
  private def allMissRaster(n: Int): Array[Byte] = {
    // star walks: walk k = k, k+1, k, k+2, ..., k, 255 uses pairs
    // (k,j) and (j,k) for j in k+1..254 plus (k,255); the (255, k+1)
    // transition pair between walks is used by no walk — every
    // consecutive pair in the concatenation is distinct.
    val buf = new scala.collection.mutable.ArrayBuffer[Int](n)
    buf += 0
    var k = 0
    while (buf.length < n) {
      var j = k + 1
      while (j <= 255 && buf.length < n) {
        buf += j
        if (j < 255 && buf.length < n) buf += k
        j += 1
      }
      k += 1
      if (buf.length < n) buf += k
    }
    buf.map(_.toByte).toArray
  }

  test("epoch-final code-width boundaries: a raster whose LAST data " +
      "code lands the decoder dictionary exactly on 2^w - 1 still " +
      "reads EOI at the encoder's (old) width") {
    // decoder nextCode after the final insert = 258 + (n - 1); the
    // widen boundaries are 511 (n=254), 1023 (n=766), 2047 (n=1790).
    // Before the fix, 254 threw 'LZW stream truncated'; 253/255 passed.
    roundTrip(allMissRaster(253), 11, 23)
    roundTrip(allMissRaster(254), 127, 2)
    roundTrip(allMissRaster(255), 15, 17)
    roundTrip(allMissRaster(766), 383, 2)
    roundTrip(allMissRaster(767), 59, 13)
    roundTrip(allMissRaster(1790), 179, 10)
  }

  test("seeded random rasters round-trip across a dense length sweep " +
      "(no other data-dependent desync sizes)") {
    val rnd = new scala.util.Random(0x61f)
    var n = 1
    while (n <= 600) {
      val idx = Array.fill(n)(rnd.nextInt(256).toByte)
      roundTrip(idx, n, 1)
      n += 7
    }
  }

  test("corruption classes fail loudly") {
    val good = Multimodal.encodeGifRaster(4L,
      Array.tabulate(24)(i => (i * 11 % 256).toByte), 6, 4)
    val bad1 = good.copy(media = good.media.updated(0, 'J'.toByte))
    intercept[IllegalArgumentException] {
      Multimodal.decodeGif(bad1)
    }.getMessage should include("not a GIF89a")
    // chop inside the first LZW sub-block
    val bad2 = good.copy(media = good.media.take(13 + 768 + 10 + 1 + 3))
    intercept[IllegalArgumentException] {
      Multimodal.decodeGif(bad2)
    }.getMessage.toLowerCase should include("truncated")
    // strip the trailer byte
    val bad3 = good.copy(media = good.media.dropRight(1))
    intercept[IllegalArgumentException] {
      Multimodal.decodeGif(bad3)
    }.getMessage should include("trailer")
  }
}
