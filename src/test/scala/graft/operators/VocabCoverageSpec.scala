package graft.operators

import graft.SparkSpec

/** vocabCoverage: hand-checked curve over a corpus with known token
  * frequencies — checkpoints inside a count-class, on a class
  * boundary, and past the vocabulary (clamp). */
class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  // frequencies: "a"×6, "b"×4, "c"×4, "d"×1, "e"×1  (total 16 tokens,
  // vocab 5; ranked a(6), b(4), c(4), d(1), e(1))
  private val docs = Seq(
    "a a a b b c",
    "a a b c  c", // double space -> empty token, must be filtered
    "a b c d",
    "e").toDF("text")

  private def runOn(d: org.apache.spark.sql.DataFrame, cps: Seq[Long]) =
    TextAnalysis.vocabCoverage(d, "text", cps)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)

  private def run(cps: Seq[Long]) = runOn(docs, cps)

  test("checkpoints across class boundaries are exact") {
    val out = run(Seq(1L, 2L, 3L, 4L, 5L))
    // v=1: top token a covers 6/16
    out(0) shouldBe ((1L, 6L, 6L * 1000000L / 16L, 6L, 5L, 16L))
    // v=2: a + first of the count-4 class = 10/16; floor is 4
    out(1) shouldBe ((2L, 10L, 10L * 1000000L / 16L, 4L, 5L, 16L))
    // v=3: a+b+c = 14/16, still in the count-4 class
    out(2) shouldBe ((3L, 14L, 875000L, 4L, 5L, 16L))
    // v=4: +d = 15/16, count-1 class
    out(3) shouldBe ((4L, 15L, 937500L, 1L, 5L, 16L))
    // v=5: everything
    out(4) shouldBe ((5L, 16L, 1000000L, 1L, 5L, 16L))
  }

  test("a checkpoint past the vocabulary clamps to full coverage") {
    val out = run(Seq(1000L))
    out(0) shouldBe ((1000L, 16L, 1000000L, 1L, 5L, 16L))
  }

  test("matches a naive ordered cumsum on smoke documents") {
    val d = graft.Tables.documents(spark, sfSmoke)
    val vocab = d.select(org.apache.spark.sql.functions.explode(
        TextDedup.words(org.apache.spark.sql.functions.col("text"))).as("t"))
      .filter($"t" =!= "").groupBy($"t").count()
      .as[(String, Long)].collect()
    val ranked = vocab.sortBy { case (t, c) => (-c, t) }.map(_._2)
    val total = ranked.sum
    val out = runOn(d, Seq(16L, 256L, 4096L)).map(r => r._1 -> r._2).toMap
    Seq(16L, 256L, 4096L).foreach { v =>
      val veff = math.min(v, ranked.length.toLong).toInt
      out(v) shouldBe ranked.take(veff).sum
    }
    runOn(d, Seq(16L)).head._6 shouldBe total
  }
}
