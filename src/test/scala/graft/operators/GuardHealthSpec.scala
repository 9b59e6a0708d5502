package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Guard-health reporting (round-12 ask #6): a binding cap is a
  * REPORTED row, a clean corpus is a ZERO-ROW certificate — planted
  * both ways. */
class GuardHealthSpec extends SparkSpec {
  import spark.implicits._

  /** Identical-wordset near-clique (30 permutations of 5 words): the
    * adversarial family every guard exists for. */
  private lazy val cliqueDocs: DataFrame = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    words.permutations.take(30).zipWithIndex
      .map { case (p, i) => (i.toLong, p.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("planted binding caps: every doc-side guard reports, magnitudes exact") {
    val rows = TextDedup.guardHealth(cliqueDocs, "doc_id", "text",
        degreeCap = 3, pairBudget = 100L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // 4 refined buckets of 30; capped pairs per bucket = 84 (rank sum)
    rows("lsh_degree_cap") shouldBe ((4L, 4L * (435 - 84)))
    rows("lsh_pair_budget") shouldBe ((4L, 4L * 435 - 100))
    // identical word sets -> identical SimHash -> 4 chunk buckets of 30
    rows("simhash_pair_budget") shouldBe ((4L, 4L * 435 - 100))
    rows.size shouldBe 3
  }

  test("loose settings: zero rows — the nothing-binds certificate") {
    TextDedup.guardHealth(cliqueDocs, "doc_id", "text",
      degreeCap = 1000, pairBudget = 1000000L).count() shouldBe 0
  }

  test("edit panel: df-cap rows + post-cap budget row, then the clear certificate") {
    // 30 two-char strings sharing ONE hot variant ("a"), plus their
    // cold exact-match variants (df = 1 each)
    val left = (0 until 30).map(i => (i.toLong, s"a${('A' + i).toChar}"))
      .toDF("id", "s")
    val right = (0 until 30).map(i => (100L + i, s"a${('A' + i).toChar}"))
      .toDF("id", "s")
    val bound = TextDedup.editGuardHealth(left, right, "id", "s",
        variantDfCap = 5, pairBudget = 10L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    bound("edit_df_cap_left") shouldBe ((1L, 30L)) // "a": 30 postings dropped
    bound("edit_df_cap_right") shouldBe ((1L, 30L))
    // post-cap: 60 cold keys x 1x1 = 60 candidates, over the 10 budget
    bound("edit_pair_budget") shouldBe ((60L, 50L))
    bound.size shouldBe 3
    TextDedup.editGuardHealth(left, right, "id", "s",
      variantDfCap = 64, pairBudget = 10000L).count() shouldBe 0
  }
}
