package graft.operators

import graft.SparkSpec

/** Readability: hand-counted runs, the unterminated-fragment floor,
  * vowel-run collapse, and the exact IEEE chain. */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String) =
    TextAnalysis.readabilityScore(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("hand case: five words, two sentences, five vowel runs") {
    val r = run("the cat sat. it ran!")
    (r._2, r._3, r._4) shouldBe ((5L, 2L, 5L))
    r._5 shouldBe math.round(
      (206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0)) * 1e6)
  }

  test("adjacent vowels collapse to one run; '...' is one sentence end") {
    // "beautiful queue..." -> eau + i + u + ueue = 4 runs; one
    // punctuation run.
    val r = run("beautiful queue...")
    (r._2, r._3, r._4) shouldBe ((2L, 1L, 4L))
  }

  test("an unterminated fragment still counts as one sentence") {
    run("no punctuation here")._3 shouldBe 1L
  }

  test("uppercase vowels count (lowered before matching)") {
    run("AEIOU aeiou")._4 shouldBe 2L
  }
}
