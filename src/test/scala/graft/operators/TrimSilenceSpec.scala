package graft.operators

import graft.SparkSpec

/** Silence trim: hand-computed lead/trail/kept on the cyclic WAV
  * synthesis, the all-quiet clip, and interior-quiet preservation. */
class TrimSilenceSpec extends SparkSpec {

  private def trim(text: String) =
    Multimodal.trimSilence(spark,
        spark.createDataset(Seq(Multimodal.encodeWav(1L, text)))(
          org.apache.spark.sql.Encoders.product[Multimodal.MediaDoc]),
        threshold = 2048)
      .collect().head

  test("alternating loud/quiet: trailing quiet sample trims, interior stays") {
    // "Az" -> 12 samples cycling A(|s|=8064 loud), z(|s|=768 quiet):
    // A z A z A z A z A z A z. lead=0; the final z trims (trail=1);
    // kept = 6 A's + 5 interior z's = 6*8064 + 5*768 = 52224.
    val r = trim("Az")
    (r.n_samples, r.n_leading, r.n_trailing, r.n_kept) shouldBe
      ((12L, 0L, 1L, 11L))
    r.kept_abs_sum shouldBe 52224L
  }

  test("leading quiet run trims") {
    // "zzzzA" -> len 5, n = 15: z z z z A z z z z A z z z z A.
    // lead = 4, trail = 0 (ends on A), kept = 11 samples:
    // 3 A's (8064) + 8 z's (768) = 24192 + 6144 = 30336.
    val r = trim("zzzzA")
    (r.n_samples, r.n_leading, r.n_trailing, r.n_kept) shouldBe
      ((15L, 4L, 0L, 11L))
    r.kept_abs_sum shouldBe 30336L
  }

  test("all-quiet clip: n_kept 0, full length reported as leading") {
    // "zz" -> 12 samples all |s| = 768 < 2048.
    val r = trim("zz")
    (r.n_leading, r.n_trailing, r.n_kept, r.kept_abs_sum) shouldBe
      ((12L, 0L, 0L, 0L))
  }

  test("all-loud clip trims nothing") {
    // "AA" -> 12 samples all |s| = 8064.
    val r = trim("AA")
    (r.n_leading, r.n_trailing, r.n_kept) shouldBe ((0L, 0L, 12L))
    r.kept_abs_sum shouldBe 12L * 8064L
  }
}
