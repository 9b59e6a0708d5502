package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Df-weighted MinHash: a doc pair sharing only BOILERPLATE and a doc
  * pair sharing only RARE CONTENT are indistinguishable to unweighted
  * Jaccard but must separate under df weighting — the whole point of
  * the weighted sketch. */
class WeightedMinHashSpec extends SparkSpec {
  import spark.implicits._

  // 20 docs: 16 filler docs of pure boilerplate b1..b8 (so df(b*)=18
  // with A and B), pair (100, 101) sharing ONLY the boilerplate plus
  // 4 unique tokens each, pair (200, 201) sharing ONLY 8 rare tokens
  // (df=2) plus 4 unique tokens each. Unweighted Jaccard is 8/16 = 0.5
  // for BOTH pairs by construction.
  private val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
  private val rare = (1 to 8).map(i => s"r$i").mkString(" ")
  private def uniq(p: String) = (1 to 4).map(i => s"$p$i").mkString(" ")
  private val docs = (
    (0 until 16).map(i => (i.toLong, boiler)) ++ Seq(
      (100L, s"$boiler ${uniq("ua")}"),
      (101L, s"$boiler ${uniq("ub")}"),
      (200L, s"$rare ${uniq("uc")}"),
      (201L, s"$rare ${uniq("ud")}"))
  ).toDF("doc_id", "text")

  test("exact scores: equal unweighted, separated weighted (hand-checked)") {
    val ws = docs.select($"doc_id", TextDedup.normWordSet($"text").as("ws"))
    def jac(a: Long, b: Long): Double =
      ws.filter($"doc_id" === a).select($"ws".as("wa"))
        .crossJoin(ws.filter($"doc_id" === b).select($"ws".as("wb")))
        .select(TextDedup.jaccard($"wa", $"wb")).as[Double].head()
    jac(100L, 101L) shouldBe 0.5
    jac(200L, 201L) shouldBe 0.5 // indistinguishable unweighted

    // n=20: wt(b*) = 20 div 18 = 1; wt(r*) = min(8, 20 div 2) = 8;
    // wt(u*) = min(8, 20 div 1) = 8. Totals: A=B=8+32=40, C=D=64+32=96.
    // J_w(A,B) = 8/(40+40-8) = 1/9; J_w(C,D) = 64/(96+96-64) = 0.5.
    val pairs = Seq((100L, 101L), (200L, 201L)).toDF("a", "b")
    val wj = TextDedup.weightedJaccardPairs(docs, "doc_id", "text", pairs)
      .as[(Long, Long, Double)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    wj((100L, 101L)) shouldBe 0.111111
    wj((200L, 201L)) shouldBe 0.5
  }

  test("pipeline separation: weighted gate keeps the content pair, drops the boilerplate pair") {
    // gentler banding (32 bands of 2 rows) so J_w=0.5 collides with
    // near-certainty; the EXACT weighted gate then decides.
    val cands = TextDedup.weightedLshCandidatePairs(docs, "doc_id", "text",
      numHashes = 64, bands = 32)
    val gated = TextDedup
      .weightedJaccardPairs(docs, "doc_id", "text", cands)
      .filter($"wjac" >= 0.3)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    gated should contain((200L, 201L))
    gated should not contain ((100L, 101L))

    // the unweighted pipeline at the same gate keeps BOTH pairs —
    // it cannot tell shared template from shared content
    val uncands = TextDedup.lshCandidatePairs(docs, "doc_id", "text",
      numHashes = 64, bands = 32)
    val ws = docs.select($"doc_id",
      transform(TextDedup.normWordSet($"text"),
        w => TextDedup.md5Hash60(w)).as("ws"))
    val ungated = uncands
      .join(ws.select($"doc_id".as("a"), $"ws".as("wa")), Seq("a"))
      .join(ws.select($"doc_id".as("b"), $"ws".as("wb")), Seq("b"))
      .filter(round(TextDedup.jaccard($"wa", $"wb"), 6) >= 0.3)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    ungated should contain((100L, 101L))
    ungated should contain((200L, 201L))
  }

  test("weights are exact integers: clamped to [1, maxW]") {
    val w = TextDedup.dfTokenWeights(docs, "doc_id", "text", maxW = 8)
      .as[(String, Long)].collect().toMap
    w("b1") shouldBe 1L // df=18, 20 div 18 = 1
    w("r1") shouldBe 8L // df=2, 20 div 2 = 10 -> clamp 8
    w("ua1") shouldBe 8L // df=1 -> clamp 8
  }
}
