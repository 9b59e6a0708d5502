package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Round-11 adversarial-scale guards: the degree-capped LSH candidate
  * relation (q225's upstream fix), the pair-budget fail-fast for the
  * uncapped cascade family, and the edit-distance join's variant
  * df-cap with its under-join audit. */
class Round11GuardsSpec extends SparkSpec {
  import spark.implicits._

  /** 30 docs, every one a distinct permutation of the SAME 5 words —
    * identical word SETS, so all 30 share every band bucket: the
    * planted near-clique duplicate family (the adversarial g10 shape
    * in miniature). */
  private lazy val cliqueDocs: DataFrame = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    words.permutations.take(30).zipWithIndex
      .map { case (p, i) => (i.toLong, p.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("capped candidates: a cap past every bucket size changes nothing") {
    val full = TextDedup.lshCandidatePairs(cliqueDocs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val capped = TextDedup.lshCandidatePairsCapped(cliqueDocs, "doc_id",
        "text", degreeCap = 100)
      .as[(Long, Long)].collect().toSet
    capped shouldBe full
    full.size shouldBe 30 * 29 / 2 // the clique is genuine
  }

  test("capped candidates: the cap binds linearly and keeps the family connected") {
    val capped = TextDedup.lshCandidatePairsCapped(cliqueDocs, "doc_id",
      "text", degreeCap = 3)
    val got = capped.as[(Long, Long)].collect().toSet
    // per bucket: (30-3)*3 + 3*2/2 = 84 pairs; all 4 bands hold the
    // same members in the same rank order, so the DISTINCT union is 84
    got.size shouldBe 84
    // rank-successor edges always survive -> the clique stays ONE
    // component (labels unaffected where the clique is genuine)
    val labels = TextDedup.connectedComponents(capped.toDF("a", "b"))
      .as[(Long, Long)].collect()
    labels.map(_._2).distinct.length shouldBe 1
    labels.length shouldBe 30
  }

  test("lshCapAudit: full vs capped pair accounting on the planted family") {
    val audit = TextDedup.lshCapAudit(cliqueDocs, "doc_id", "text",
        degreeCap = 3)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (nBuckets, nCapped, maxBucket, pairsFull, pairsCapped) = audit
    nBuckets shouldBe 4 // one bucket per band, all 30 docs in each
    nCapped shouldBe 4
    maxBucket shouldBe 30
    pairsFull shouldBe 4L * (30 * 29 / 2)
    pairsCapped shouldBe 4L * 84
    // a non-binding cap reports full == capped
    val loose = TextDedup.lshCapAudit(cliqueDocs, "doc_id", "text",
        degreeCap = 100)
      .as[(Long, Long, Long, Long, Long)].collect().head
    loose._2 shouldBe 0
    loose._4 shouldBe loose._5
  }

  test("pair-budget fail-fast: the doomed join never launches, the estimate is in the message") {
    val ex = intercept[IllegalArgumentException] {
      TextDedup.lshCandidatePairs(cliqueDocs, "doc_id", "text",
        pairBudget = 100L)
    }
    ex.getMessage should include("1740") // 4 buckets x C(30,2)
    ex.getMessage should include("pair budget")
    // at the default budget the same corpus passes untouched
    TextDedup.lshCandidatePairs(cliqueDocs, "doc_id", "text")
      .count() shouldBe 435
  }

  test("pair-budget guard covers the cascade family entry (nearDupLabels)") {
    // nearDupLabels exact-dedups first, so hand it docs that survive
    // (all 30 permutations are distinct TEXTS, identical word sets);
    // the guard fires during construction — the cascade never launches
    val ex = intercept[IllegalArgumentException] {
      TextDedup.nearDupLabels(cliqueDocs, "doc_id", "text",
        pairBudget = 100L)
    }
    ex.getMessage should include("pair budget")
  }

  /** 30 two-char strings sharing the single deletion variant "a" —
    * the planted dense key space (every pair is a genuine
    * substitution at distance 1, all via ONE hot variant). */
  private lazy val hotLeft =
    (0 until 30).map(i => (i.toLong, s"a${('A' + i).toChar}")).toDF("id", "s")
  private lazy val hotRight =
    (0 until 30).map(i => (100L + i, s"a${('A' + i).toChar}")).toDF("id", "s")

  test("edit-join df-cap: binds on the hot variant, exact matches survive via their cold variants") {
    val un = TextDedup.editDistanceJoin(hotLeft, hotRight, "id", "s")
    un.count() shouldBe 30L * 30 // every cross pair is ED <= 1
    val capped = TextDedup.editDistanceJoin(hotLeft, hotRight, "id", "s",
      variantDfCap = 5)
    val got = capped.as[(Long, Long, String, String, Long)].collect()
    // only same-string pairs remain: they share the full-string and
    // the delete-first-char variants, both df = 1
    got.length shouldBe 30
    all(got.map(_._5)) shouldBe 0L
  }

  test("edit-join cap audit: the dropped mass is reported, never silent") {
    val audit = TextDedup.editDistanceCapAudit(hotLeft, hotRight, "id", "s",
        variantDfCap = 5)
      .orderBy("side")
      .as[(String, Long, Long, Long, Long)].collect()
    audit.length shouldBe 2
    audit.foreach { case (_, nKeys, nCapped, maxPost, dropped) =>
      // variants: "a" (30 postings, hot), per-string "aX" and "X"
      // (1 each) -> 61 keys, one capped carrying 30 postings
      nKeys shouldBe 61
      nCapped shouldBe 1
      maxPost shouldBe 30
      dropped shouldBe 30
    }
    // a cap that does not bind certifies itself: zero capped keys
    val loose = TextDedup.editDistanceCapAudit(hotLeft, hotRight, "id", "s",
        variantDfCap = 64)
      .as[(String, Long, Long, Long, Long)].collect()
    all(loose.map(_._3)) shouldBe 0L
    // and the capped join at that cap equals the uncapped one
    TextDedup.editDistanceJoin(hotLeft, hotRight, "id", "s",
      variantDfCap = 64).count() shouldBe 900
  }
}
