package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the round-8 wave after q111: duplicated-span scrub
  * (exact-substring dedup removal) and DSIR importance weights. */
class Round8eOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ dupSpanScrub

  test("dupSpanScrub: a shared 5-gram's full cover is removed from both docs") {
    val docs = Seq(
      (1L, "a1 a2 v w x y z a3 a4"), // shared gram starts at pos 2
      (2L, "b1 v w x y z"), //          shared gram starts at pos 1
      (3L, "u1 u2 u3 u4 u5 u6")) //     no duplication: identity
      .toDF("doc_id", "text")
    val out = TextDedup.dupSpanScrub(docs, "doc_id", "text", n = 5)
      .select("doc_id", "n_tokens", "n_removed", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, 9L, 5L, "a1 a2 a3 a4"),
      (2L, 6L, 5L, "b1"),
      (3L, 6L, 0L, "u1 u2 u3 u4 u5 u6"))
  }

  test("dupSpanScrub: fully-covered docs survive as empty text, fully accounted") {
    val docs = Seq(
      (1L, "v w x y z"),
      (2L, "v w x y z"),
      (3L, "p q")) // shorter than n: no grams, identity
      .toDF("doc_id", "text")
    val out = TextDedup.dupSpanScrub(docs, "doc_id", "text", n = 5)
      .select("doc_id", "n_tokens", "n_removed", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, 5L, 5L, ""),
      (2L, 5L, 5L, ""),
      (3L, 2L, 0L, "p q"))
  }

  test("dupSpanScrub: overlapping duplicated grams extend one contiguous cover") {
    // docs share a 6-token run => two overlapping duplicated 5-grams
    // (starts s and s+1) whose covers union to 6 contiguous positions
    val docs = Seq(
      (1L, "h1 v w x y z q h2"),
      (2L, "v w x y z q k1 k2 k3")).toDF("doc_id", "text")
    val out = TextDedup.dupSpanScrub(docs, "doc_id", "text", n = 5)
      .select("doc_id", "n_tokens", "n_removed", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, 8L, 6L, "h1 h2"),
      (2L, 9L, 6L, "k1 k2 k3"))
  }

  test("dupSpanScrub: within-doc repetition alone does not trigger removal") {
    // the same 5-gram twice in ONE doc: distinct-doc count is 1
    val docs = Seq(
      (1L, "v w x y z m v w x y z"),
      (2L, "r1 r2 r3 r4 r5")).toDF("doc_id", "text")
    val out = TextDedup.dupSpanScrub(docs, "doc_id", "text", n = 5)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().sortBy(_._1)
    out shouldBe Array((1L, 0L), (2L, 0L))
  }

  // ------------------------------------------------------------- dsirWeights

  test("dsirWeights: target == raw gives zero log ratio everywhere, keep all") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon"),
      (3L, "alpha alpha zeta")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(docs, docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "logratio_micro", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, 3L, 0L, true), (2L, 2L, 0L, true), (3L, 3L, 0L, true))
  }

  test("dsirWeights: docs matching the target score above docs that don't") {
    val raw = Seq(
      (1L, "code code code code"),
      (2L, "prose prose prose prose")).toDF("doc_id", "text")
    val target = Seq((10L, "code code")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(raw, target, "doc_id", "text")
      .select("doc_id", "logratio_micro").as[(Long, Long)].collect()
      .sortBy(_._1)
    // same token multiplicities, so the comparison is pure sign of the
    // per-bucket ratio: the target-supported bucket must win
    out(0)._2 should be > out(1)._2
  }

  test("dsirWeights: keep is exactly the sign of the integer sum") {
    val raw = Seq(
      (1L, "code code code code"),
      (2L, "prose prose prose prose"),
      (3L, "code prose")).toDF("doc_id", "text")
    val target = Seq((10L, "code code code")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(raw, target, "doc_id", "text")
      .select("doc_id", "logratio_micro", "keep")
      .as[(Long, Long, Boolean)].collect()
    out.foreach { case (_, lr, keep) => keep shouldBe (lr >= 0) }
  }

  // ------------------------------------------------------------ budgetSelect

  test("budgetSelect: keeps the (score desc, id asc) prefix within budget") {
    val docs = Seq(
      (1L, 10L, 5L), (2L, 10L, 5L), (3L, 5L, 5L))
      .toDF("doc_id", "score", "n_tokens")
    val out = Curation.budgetSelect(docs, "doc_id", "score", "n_tokens", 12L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1)
    out shouldBe Array((1L, 5L), (2L, 10L))
    // budget exactly at the last doc's inclusive total keeps it
    val all = Curation.budgetSelect(docs, "doc_id", "score", "n_tokens", 15L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1)
    all shouldBe Array((1L, 5L), (2L, 10L), (3L, 15L))
  }

  test("budgetSelect: greedy prefix, not knapsack — a later fit stays out") {
    val docs = Seq(
      (1L, 10L, 10L), (2L, 8L, 5L), (3L, 5L, 1L))
      .toDF("doc_id", "score", "n_tokens")
    // doc 2 overflows (15 > 11); doc 3 WOULD fit (10 + 1 = 11) but the
    // prefix contract already ended at doc 2
    val out = Curation.budgetSelect(docs, "doc_id", "score", "n_tokens", 11L)
      .select("doc_id").as[Long].collect()
    out shouldBe Array(1L)
  }

  test("budgetSelect: ties within a score resolve by ascending id") {
    val docs = Seq(
      (2L, 10L, 6L), (1L, 10L, 6L)).toDF("doc_id", "score", "n_tokens")
    val out = Curation.budgetSelect(docs, "doc_id", "score", "n_tokens", 6L)
      .select("doc_id").as[Long].collect()
    out shouldBe Array(1L)
  }

  test("dsirWeights: empty-token docs are dropped, counts conserved") {
    val raw = Seq((1L, "a b c d e"), (2L, "")).toDF("doc_id", "text")
    val target = Seq((10L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(raw, target, "doc_id", "text")
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().sortBy(_._1)
    out shouldBe Array((1L, 5L))
  }

  // -------------------------------------------------------- charClassSignals

  test("charClassSignals: ppm shares and the codey flag, hand-checked") {
    val docs = Seq(
      (1L, "ab 12 {x}"), //  3 letters, 2 digits, 2 spaces, 2 brackets
      (2L, "hello world"), // pure prose
      (3L, "")) //            dropped
      .toDF("doc_id", "text")
    val out = TextAnalysis.charClassSignals(docs, "doc_id", "text")
      .select("doc_id", "n_chars", "letter_ppm", "digit_ppm", "space_ppm",
        "symbol_ppm", "bracket_ppm", "codey")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    out shouldBe Array(
      (1L, 9L, 333333L, 222222L, 222222L, 222222L, 222222L, true),
      (2L, 11L, 909090L, 0L, 90909L, 0L, 0L, false))
  }

  // ---------------------------------------------------------- templateGrams

  test("templateGrams: top gram per source by count, ties lexicographic") {
    val docs = Seq(
      ("s1", "a b c a b c"), // grams: [a b c]x2, [b c a], [c a b]; tot 4
      ("s2", "x y z")) //       one gram
      .toDF("source", "text")
    val out = TextAnalysis.templateGrams(docs, "source", "text", n = 3, topK = 3)
      .select("source", "rank", "gram", "n_occ", "share_ppm")
      .as[(String, Long, String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    out shouldBe Array(
      ("s1", 1L, "a b c", 2L, 500000L),
      ("s1", 2L, "b c a", 1L, 250000L),
      ("s1", 3L, "c a b", 1L, 250000L),
      ("s2", 1L, "x y z", 1L, 1000000L))
  }

  test("templateGrams: topK caps the per-source output") {
    val docs = Seq(("s1", "a b c d e f")).toDF("source", "text")
    val out = TextAnalysis.templateGrams(docs, "source", "text", n = 3, topK = 2)
      .collect()
    out.length shouldBe 2
  }

  // -------------------------------------------------------- leakageSafeSplit

  test("leakageSafeSplit: exact copies and near-dups share the cluster's split") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta alpha beta"), // same word set: near-dup
      (3L, "alpha beta gamma delta"), //            byte-identical to 1
      (4L, "zeta eta theta iota kappa")) //         unrelated
      .toDF("doc_id", "text")
    val out = TextDedup.leakageSafeSplit(docs, "doc_id", "text")
      .select("doc_id", "root", "split").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    out.map(_._1) shouldBe Array(1L, 2L, 3L, 4L)
    out.take(3).map(_._2).toSet shouldBe Set(1L) // one root for the cluster
    out.take(3).map(_._3).toSet.size shouldBe 1 //  hence one split
    out(3)._2 shouldBe 4L
  }

  test("leakageSafeSplit: ppm thresholds degenerate correctly, runs repeat") {
    val docs = Seq(
      (1L, "one two three"), (2L, "four five six"), (3L, "seven eight nine"))
      .toDF("doc_id", "text")
    TextDedup.leakageSafeSplit(docs, "doc_id", "text",
        valPpm = 0L, testPpm = 1000000L)
      .select("split").as[String].collect().toSet shouldBe Set("test")
    TextDedup.leakageSafeSplit(docs, "doc_id", "text",
        valPpm = 1000000L, testPpm = 0L)
      .select("split").as[String].collect().toSet shouldBe Set("val")
    val a = TextDedup.leakageSafeSplit(docs, "doc_id", "text")
      .collect().map(_.toString).sorted
    val b = TextDedup.leakageSafeSplit(docs, "doc_id", "text")
      .collect().map(_.toString).sorted
    a shouldBe b
    an[IllegalArgumentException] should be thrownBy
      TextDedup.leakageSafeSplit(docs, "doc_id", "text",
        valPpm = 600000L, testPpm = 600000L)
  }

  // -------------------------------------------------------- centroidOutliers

  test("centroidOutliers: cosine to the group centroid flags the flipped vector") {
    val vecs = Seq(
      (1L, "g", Seq(1.0f, 0.0f)),
      (2L, "g", Seq(1.0f, 0.0f)),
      (3L, "g", Seq(-1.0f, 0.0f))) // centroid sum is (+1e6, 0): cos = -1
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidOutliers(vecs, "vec_id", "label", "embedding",
        minCos = 0.0)
      .select("id", "cos_centroid", "outlier")
      .as[(Long, Option[Double], Boolean)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, Some(1.0), false), (2L, Some(1.0), false), (3L, Some(-1.0), true))
  }

  test("centroidOutliers: zero vectors flag with a null cosine; singletons pass") {
    val vecs = Seq(
      (1L, "a", Seq(0.0f, 0.0f)),
      (2L, "b", Seq(0.5f, 0.5f))) // singleton: cos(v, v·1e6) = 1
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidOutliers(vecs, "vec_id", "label", "embedding",
        minCos = 0.0)
      .select("id", "cos_centroid", "outlier")
      .as[(Long, Option[Double], Boolean)].collect().sortBy(_._1)
    out shouldBe Array((1L, None, true), (2L, Some(1.0), false))
  }
}
