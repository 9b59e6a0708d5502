package graft.operators

import org.apache.spark.sql.DataFrame

import graft.{SparkSpec, Tables}
import graft.jobs.TokenizerMaintenance

/** Round-12 guard closures: the SimHash chunk-key pair budget (the
  * last unguarded pair generator after K207), the edit-distance
  * join's DEFAULT-ON pair budget (the raw API previously shipped
  * unguarded while the gated entry passed a df-cap), and the
  * tokenizer-maintenance digest's null handling (concat_ws skipped
  * nulls, so a text/lang boundary shift could alias two different
  * documents to one digest and silently stale the fertility
  * counters). */
class Round12GuardsSpec extends SparkSpec {
  import spark.implicits._

  /** 30 permutations of the same 5 words: identical word SETS, so
    * every doc gets the IDENTICAL SimHash — all 30 share all 4
    * 15-bit chunks, the planted near-clique. */
  private lazy val cliqueDocs: DataFrame = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    words.permutations.take(30).zipWithIndex
      .map { case (p, i) => (i.toLong, p.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("simhash pair budget: the doomed chunk join never launches, estimate in the message") {
    val sim = TextDedup.simHash(cliqueDocs, "doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      TextDedup.simHashCandidatePairs(sim, pairBudget = 100L)
    }
    ex.getMessage should include("1740") // 4 chunk buckets x C(30,2)
    ex.getMessage should include("pair budget")
  }

  test("simhash pair budget: guarded output identical to the unguarded plan") {
    val docs = Tables.documents(spark, sfSmoke)
    val sim = TextDedup.simHash(docs, "doc_id", "text").localCheckpoint()
    val guarded = TextDedup.simHashCandidatePairs(sim)
      .as[(Long, Long)].collect().toSet
    val unguarded = TextDedup.simHashCandidatePairs(sim,
        pairBudget = Long.MaxValue)
      .as[(Long, Long)].collect().toSet
    guarded shouldBe unguarded
    guarded should not be empty
  }

  test("simhash degree cap: bounded emissions, connectivity, identity past the max bucket") {
    val sim = TextDedup.simHash(cliqueDocs, "doc_id", "text").localCheckpoint()
    val full = TextDedup.simHashCandidatePairs(sim)
      .as[(Long, Long)].collect().toSet
    // cap past the bucket size: output-identical to the uncapped form
    TextDedup.simHashCandidatePairsCapped(sim, degreeCap = 100)
      .as[(Long, Long)].collect().toSet shouldBe full
    // binding cap: (30-3)*3 + 3 = 84 rank-successor pairs per bucket,
    // all 4 chunk buckets hold the same members -> DISTINCT union 84
    val capped = TextDedup.simHashCandidatePairsCapped(sim, degreeCap = 3)
    capped.count() shouldBe 84
    // rank chains keep the clique ONE component
    val labels = TextDedup.connectedComponents(capped.toDF("a", "b"))
      .as[(Long, Long)].collect()
    labels.map(_._2).distinct.length shouldBe 1
    labels.length shouldBe 30
  }

  test("simHashPairAudit: bucket census matches the planted clique") {
    val sim = TextDedup.simHash(cliqueDocs, "doc_id", "text")
    val (nBuckets, maxBucket, pairsEst) = TextDedup.simHashPairAudit(sim)
      .as[(Long, Long, Long)].collect().head
    nBuckets shouldBe 4
    maxBucket shouldBe 30
    pairsEst shouldBe 4L * (30 * 29 / 2)
  }

  /** 10,100 copies of the SAME 3-char string per side: each string
    * yields 4 variant keys, every key carries all 10,100 postings on
    * both sides, so the candidate estimate is 4 x 10,100^2 = 408M —
    * over the 100M DEFAULT budget with every argument left at its
    * default (the round-11 verdict's exact complaint: a direct caller
    * used to get the unguarded pre-r11 plan here). */
  test("edit-join DEFAULT path: planted-dense corpus fails fast before the join") {
    val dense = (0 until 10100).map(i => (i.toLong, "dup")).toDF("id", "s")
    val denseR = (0 until 10100).map(i => (200000L + i, "dup")).toDF("id", "s")
    val ex = intercept[IllegalArgumentException] {
      TextDedup.editDistanceJoin(dense, denseR, "id", "s")
    }
    ex.getMessage should include("pair budget")
    ex.getMessage should include("408040000") // 4 * 10100^2, exact
  }

  test("edit-join budget: sane corpora pass untouched, opt-out restores the lazy plan") {
    val left = (0 until 30).map(i => (i.toLong, s"a${('A' + i).toChar}"))
      .toDF("id", "s")
    val right = (0 until 30).map(i => (100L + i, s"a${('A' + i).toChar}"))
      .toDF("id", "s")
    TextDedup.editDistanceJoin(left, right, "id", "s")
      .count() shouldBe 900 // guarded default, under budget
    TextDedup.editDistanceJoin(left, right, "id", "s",
      pairBudget = Long.MaxValue).count() shouldBe 900 // explicit opt-out
  }

  test("weighted LSH: both overloads carry the default budget, raisable on each") {
    val docs = Tables.documents(spark, sfSmoke)
    val n = TextDedup.weightedLshCandidatePairs(docs, "doc_id", "text").count()
    val weights = TextDedup.dfTokenWeights(docs, "doc_id", "text", 8,
      TextDedup.normWordSet)
    // budget-less weights overload (previously REQUIRED the budget)
    TextDedup.weightedLshCandidatePairs(docs, "doc_id", "text", weights,
      64, 4, 100, TextDedup.normWordSet).count() shouldBe n
    // and the convenience overload can raise it
    TextDedup.weightedLshCandidatePairs(docs, "doc_id", "text",
      pairBudget = Long.MaxValue).count() shouldBe n
  }

  /** The ADVICE aliasing family: concat_ws SKIPS nulls, so
    * (text=NULL, lang='') and (text='', lang=NULL) both digested to
    * the empty string — a doc flipping between them read as
    * `unchanged`, the tick skipped it, and the fertility counters
    * went silently stale (the card kept a lang='' row that no longer
    * exists). Per-field md5 with an explicit null marker separates
    * every null/value boundary. */
  test("tokenizer digest: null/value boundary shift counts as changed") {
    val oldSnap = Seq((1L, null.asInstanceOf[String], ""),
        (2L, "steady words here", "en"))
      .toDF("doc_id", "text", "lang")
    val newSnap = Seq((1L, "", null.asInstanceOf[String]),
        (2L, "steady words here", "en"))
      .toDF("doc_id", "text", "lang")
    val st = TokenizerMaintenance.rebuild(oldSnap, "doc_id", "text")
    val ticked = TokenizerMaintenance.nightly(st, oldSnap, newSnap,
      "doc_id", "text")
    val fresh = TokenizerMaintenance.rebuildCountersUnder(newSnap, "doc_id",
      "text", TokenizerMaintenance.mergesOf(st))
    val got = TokenizerMaintenance.card(
        TokenizerMaintenance.TokState(st.merges, ticked.fertility))
      .orderBy("lang").collect().map(_.toSeq)
    val want = TokenizerMaintenance.card(
        TokenizerMaintenance.TokState(st.merges, fresh))
      .orderBy("lang").collect().map(_.toSeq)
    got shouldBe want
  }
}
