package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Final round-8 operator specs: keep-best near-dup dedup and the
  * other curation-audit operators added after q104. */
class Round8dOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ nearDupDedupKeepBest

  test("nearDupDedupKeepBest: cluster keeps the highest-quality doc, not min id") {
    // 1 and 2 share an identical word SET (signatures collide in every
    // band, Jaccard = 1.0) but 2 repeats tokens, so it is LONGER and
    // must win even though 1 has the lower id. 3 is unrelated.
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta alpha beta"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val kept = TextDedup.nearDupDedupKeepBest(docs, "doc_id", "text",
        quality = org.apache.spark.sql.functions.size(TextDedup.words(col("text"))))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(2L, 3L)
    // same corpus through the min-id keeper picks 1 instead
    val keptMinId = TextDedup.nearDupDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    keptMinId shouldBe Array(1L, 3L)
  }

  test("nearDupDedupKeepBest: quality ties break to the lowest id") {
    // identical word sets again (guaranteed collision); 8 and 9 tie
    // at 5 tokens so 8 wins the tie; 7 (4 tokens) loses outright.
    val docs = Seq(
      (7L, "one two three four"),
      (9L, "one two three four two"),
      (8L, "one two three four one")).toDF("doc_id", "text")
    val kept = TextDedup.nearDupDedupKeepBest(docs, "doc_id", "text",
        quality = org.apache.spark.sql.functions.size(TextDedup.words(col("text"))))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(8L)
  }

  test("nearDupDedupKeepBest: exact-dup pre-stage and unpaired docs unaffected") {
    val docs = Seq(
      (1L, "same exact bytes here"),
      (2L, "same exact bytes here"), // byte-identical: min-id keeper
      (5L, "totally unrelated content words")).toDF("doc_id", "text")
    val kept = TextDedup.nearDupDedupKeepBest(docs, "doc_id", "text",
        quality = org.apache.spark.sql.functions.size(TextDedup.words(col("text"))))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L, 5L)
  }

  // ------------------------------------------------------- contaminationSpans

  test("contaminationSpans: contiguous run vs scattered hits, span math") {
    val corpus = Seq(
      (10L, "a b c d e f g"), // grams at pos 0..4
      (11L, "x y z w v u")).toDF("doc_id", "text") // no overlap
    // eval quote "b c d e" shares grams (b c d), (c d e) -> run of 2
    val ev = Seq((1L, "b c d e")).toDF("doc_id", "text")
    val out = TextDedup.contaminationSpans(corpus, ev, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    out shouldBe Array(
      (10L, 5L, 2L, 2L, 4L), // 5 grams, 2 hits, max run 2, span 2+3-1=4
      (11L, 4L, 0L, 0L, 0L))
  }

  test("contaminationSpans: scattered matches never report a long span") {
    val corpus = Seq((10L, "a b c q q q e f g")).toDF("doc_id", "text")
    // eval shares (a b c) at pos 0 and (e f g) at pos 6 — no adjacency
    val ev = Seq((1L, "a b c"), (2L, "e f g")).toDF("doc_id", "text")
    val out = TextDedup.contaminationSpans(corpus, ev, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).head
    out shouldBe ((2L, 1L, 3L)) // 2 hits, max run 1, span 3
  }

  test("contaminationSpans: docs shorter than n words carry no grams") {
    val corpus = Seq((10L, "a b"), (11L, "a b c")).toDF("doc_id", "text")
    val ev = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextDedup.contaminationSpans(corpus, ev, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0))
    out shouldBe Array(11L)
  }

  // ----------------------------------------------------------------- upsample

  test("upsample: whole multiples repeat exactly, unlisted sources drop") {
    val docs = (1L to 10L).map(i => (i, if (i <= 6) "a" else "b"))
      .toDF("doc_id", "source")
    // a: 6 docs, target 12 -> exactly 2 copies each; b unlisted -> drop
    val targets = Seq(("a", 12L)).toDF("src", "target_n")
    val out = Curation.upsample(docs, "doc_id", "source", targets)
    out.count() shouldBe 12L
    out.filter(col("source") === "b").count() shouldBe 0L
    val perDoc = out.groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (1L to 6L).foreach(i => perDoc(i) shouldBe 2L)
    // copy indices are dense 0..n-1
    out.filter(col("doc_id") === 1L).select("copy").collect()
      .map(_.getLong(0)).sorted shouldBe Array(0L, 1L)
  }

  test("upsample: fractional rates give floor-or-ceil copies, deterministic") {
    val docs = (1L to 100L).map(i => (i, "a")).toDF("doc_id", "source")
    // target 150 of 100 -> rate 1.5: every doc 1 or 2 copies
    val targets = Seq(("a", 150L)).toDF("src", "target_n")
    val out = Curation.upsample(docs, "doc_id", "source", targets)
    val perDoc = out.groupBy("doc_id").count().collect().map(_.getLong(1))
    perDoc.length shouldBe 100 // every doc survives (rate >= 1)
    all(perDoc) should (be(1L) or be(2L))
    val total = perDoc.sum
    total should be >= 130L
    total should be <= 170L // hash-fractional, near 150 in expectation
    // deterministic: identical on re-run
    Curation.upsample(docs, "doc_id", "source", targets).count() shouldBe
      out.count()
  }

  test("upsample: sub-1 rates downsample without ever repeating") {
    val docs = (1L to 100L).map(i => (i, "a")).toDF("doc_id", "source")
    val targets = Seq(("a", 30L)).toDF("src", "target_n")
    val perDoc = Curation.upsample(docs, "doc_id", "source", targets)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    all(perDoc) shouldBe 1L
    perDoc.length should be < 60 // ~30 expected
  }

  // ---------------------------------------------------------------- zipfAudit

  test("zipfAudit: exact power law fits with slope -2 and r2 = 1") {
    // freq(a)=8 at rank 1, freq(b)=2 at rank 2: ln-ln slope is -2.
    val docs = Seq((1L, (Seq.fill(8)("a") ++ Seq.fill(2)("b")).mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.zipfAudit(docs, "text", topK = 10).head()
    r.getLong(0) shouldBe 2L
    r.getDouble(1) shouldBe -2.0 +- 0.0001
    r.getDouble(3) shouldBe 1.0 +- 1e-9
  }

  test("zipfAudit: flat frequencies give slope 0 and undefined r2") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.zipfAudit(docs, "text", topK = 10).head()
    r.getLong(0) shouldBe 4L
    r.getDouble(1) shouldBe 0.0
    r.isNullAt(3) shouldBe true // zero y-variance
  }

  // ----------------------------------------------------------- rankingMetrics

  test("rankingMetrics: recall, first-hit reciprocal rank, zero-hit queries") {
    val truth = Seq((1L, 100L), (1L, 101L), (2L, 200L), (3L, 300L))
      .toDF("qid", "id")
    val retrieved = Seq(
      (1L, 100L, 1L), (1L, 999L, 2L), (1L, 101L, 3L), // 2 hits, first at 1
      (2L, 998L, 1L), (2L, 200L, 4L), // 1 hit, first at 4
      (3L, 997L, 1L), (3L, 996L, 2L)) // 0 hits
      .toDF("qid", "id", "rank")
    val out = Similarity.rankingMetrics(truth, retrieved, k = 2)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out shouldBe Array(
      (1L, 2L, 1000000L, 1000000L),
      (2L, 1L, 500000L, 250000L),
      (3L, 0L, 0L, 0L))
  }

  test("rankingMetrics: perfect retriever scores 100% recall and rr 1.0") {
    val truth = Seq((1L, 10L), (1L, 11L)).toDF("qid", "id")
    val retrieved = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "id", "rank")
    val r = Similarity.rankingMetrics(truth, retrieved, k = 2).head()
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((2L, 1000000L, 1000000L))
  }

  // ----------------------------------------------------------- rareTokenScrub

  test("rareTokenScrub: tokens below the doc-frequency floor mask to <unk>") {
    val docs = Seq(
      (1L, "common words here secret123"),
      (2L, "common words here too"),
      (3L, "common words again")).toDF("doc_id", "text")
    val out = TextDedup.rareTokenScrub(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // df: common=3, words=3, here=2, secret123=1, too=1, again=1
    out shouldBe Array(
      (1L, 4L, 1L, "common words here <unk>"),
      (2L, 4L, 1L, "common words here <unk>"),
      (3L, 3L, 1L, "common words <unk>"))
  }

  test("rareTokenScrub: repeated rare token in ONE doc still scrubs (df, not tf)") {
    val docs = Seq(
      (1L, "zzz zzz shared"),
      (2L, "shared only")).toDF("doc_id", "text")
    val out = TextDedup.rareTokenScrub(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect().map(r => (r.getString(3), r.getLong(2)))
    // zzz appears twice but only in doc 1 -> df 1 -> both scrubbed
    out(0) shouldBe (("<unk> <unk> shared", 2L))
    out(1) shouldBe (("shared <unk>", 1L))
  }

  // ------------------------------------------------------------ centroidDrift

  test("centroidDrift: identical snapshots give cos 1, opposite give -1") {
    val a = Seq(
      (1L, "g1", Array(1.0f, 0.0f)), (2L, "g1", Array(0.0f, 1.0f)),
      (3L, "g2", Array(1.0f, 1.0f))).toDF("id", "grp0", "vec")
    val same = Similarity.centroidDrift(a, a, "grp0", "vec")
      .orderBy("grp").collect()
    same.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))) shouldBe Array(("g1", 2L, 2L, 1.0), ("g2", 1L, 1L, 1.0))
    // flipped snapshot: centroid negated -> cos -1
    val b = a.select(col("id"), col("grp0"),
      transform(col("vec"), v => -v).as("vec"))
    val flipped = Similarity.centroidDrift(a, b, "grp0", "vec")
      .orderBy("grp").collect().map(_.getDouble(3))
    flipped shouldBe Array(-1.0, -1.0)
  }

  test("centroidDrift: groups absent from either snapshot do not emit; zero vecs null") {
    val oldSnap = Seq(
      ("only_old", Array(1.0f, 0.0f)), ("both", Array(1.0f, 0.0f)),
      ("zed", Array(0.0f, 0.0f))).toDF("grp0", "vec")
    val newSnap = Seq(
      ("only_new", Array(1.0f, 0.0f)), ("both", Array(0.5f, 0.0f)),
      ("zed", Array(0.0f, 0.0f))).toDF("grp0", "vec")
    val out = Similarity.centroidDrift(oldSnap, newSnap, "grp0", "vec")
      .orderBy("grp").collect()
    out.map(_.getString(0)) shouldBe Array("both", "zed")
    out(0).getDouble(3) shouldBe 1.0 // same direction, scale cancels
    out(1).isNullAt(3) shouldBe true // zero-norm guard
  }
}
