package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** bpeEncode: hand-checked merge application in rank order (with
  * cascades), the run-merging exactness the double-separator encoding
  * exists for, whitespace/empty edges, and the whitespace-vs-BPE
  * budget disagreement that motivates the operator. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(texts: Seq[String]) =
    TextAnalysis.bpeEncode(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text", TextAnalysis.defaultBpeMerges)
      .orderBy("doc_id")
      .select(col("n_ws_tokens"), col("tokens"), col("n_tokens"))
      .as[(Long, Seq[String], Long)].collect()

  test("merges apply in rank order, cascades included") {
    val out = enc(Seq("the tin and nation"))
    val (nWs, toks, n) = out.head
    nWs shouldBe 4L
    // the: (t,h)->th then (th,e)->the; tin: (i,n) first blocks (t,i);
    // and: (a,n) then (an,d); nation: (o,n), (a,t) — no cross-boundary
    // merge recreates an earlier-rank pair
    toks shouldBe Seq("the", "t", "in", "and", "n", "at", "i", "on")
    n shouldBe 8L
  }

  test("tion cascades through two composed merges") {
    enc(Seq("tion")).head._2 shouldBe Seq("tion") // (o,n) -> (t,i) -> (ti,on)
  }

  test("runs merge left-to-right non-overlapping — the double-wrap exactness") {
    // single-separator wrapping would consume the shared boundary and
    // produce [ll, l, ll, l] here
    enc(Seq("llll")).head._2 shouldBe Seq("ll", "ll")
    enc(Seq("lllll")).head._2 shouldBe Seq("ll", "ll", "l")
    enc(Seq("eee")).head._2 shouldBe Seq("ee", "e")
  }

  test("whitespace runs and empty docs") {
    val out = enc(Seq("zz  the", ""))
    out(0) shouldBe ((2L, Seq("z", "z", "the"), 3L))
    out(1) shouldBe ((0L, Seq.empty[String], 0L))
  }

  test("characters outside the merge alphabet pass through as singletons") {
    val (_, toks, _) = enc(Seq("x9!")).head
    toks shouldBe Seq("x", "9", "!")
  }

  test("whitespace and BPE token budgets disagree on a designed fixture") {
    // A: 2 ws words but 4 BPE tokens (no merge covers z);
    // B: 2 ws words and 2 BPE tokens (full merges). Equal scores, tie
    // by id. Budget 4: whitespace keeps {A, B}; BPE keeps only {A}.
    val docs = Seq((1L, "zz zz"), (2L, "the and")).toDF("doc_id", "text")
    val encd = TextAnalysis.bpeEncode(docs, "doc_id", "text",
        TextAnalysis.defaultBpeMerges)
      .withColumn("score", lit(10L))
    def kept(tok: String) =
      Curation.budgetSelect(encd, "doc_id", "score", tok, budget = 4L)
        .select("doc_id").as[Long].collect().toSet
    kept("n_ws_tokens") shouldBe Set(1L, 2L)
    kept("n_tokens") shouldBe Set(1L)
  }

  test("bpeTrain learns the hand-checked merge sequence and stops when dry") {
    // vocab: aab(2), aabb(1), ab(1)
    // round 1: (a,a)=3 (a,b)=4 (b,b)=1        -> merge (a,b)  np=4
    // round 2: (a,ab)=3 (ab,b)=1              -> merge (a,ab) np=3
    // round 3: (aab,b)=1                      -> merge (aab,b) np=1
    // round 4: no pairs left                  -> early stop
    val docs = Seq((1L, "aab aab"), (2L, "aabb"), (3L, "ab")).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrain(docs, "text", rounds = 10)
    learned shouldBe Seq(("a", "b", 4L), ("a", "ab", 3L), ("aab", "b", 1L))
    // trained table round-trips through the encoder
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text",
        learned.map(m => (m._1, m._2)))
      .orderBy("doc_id").select("tokens").as[Seq[String]].collect()
    enc(0) shouldBe Seq("aab", "aab")
    enc(1) shouldBe Seq("aabb")
    enc(2) shouldBe Seq("ab")
  }

  test("merge-table validation fails fast") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(docs, "doc_id", "text", Seq("a " -> "b"))
    }
  }
}
