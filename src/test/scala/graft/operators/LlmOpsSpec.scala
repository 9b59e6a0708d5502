package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "The quick brown fox jumps over the lazy dog  "), // case/trim dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog")) // exact dup of 0
    .toDF("doc_id", "text")

  test("exact dedup keeps the min-id doc per normalized text") {
    val kept = TextDedup.exactDedup(docs, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    kept shouldBe Set(0L, 2L, 3L)
  }

  test("MinHash/LSH: identical docs always collide; disjoint docs never do") {
    val pairs = TextDedup.lshCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // 0, 1, 4 have identical word sets -> identical signatures -> pairs
    pairs should contain allOf ((0L, 1L), (0L, 4L), (1L, 4L))
    // 3 shares no words with 0 -> signatures agree only by coincidence
    pairs should not contain ((0L, 3L))
  }

  test("SimHash: identical word sets get identical sketches; near-dups are close") {
    val sim = TextDedup.simHash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    sim(0L) shouldBe sim(1L)
    sim(0L) shouldBe sim(4L)
    val hamming = java.lang.Long.bitCount(sim(0L) ^ sim(2L))
    hamming should be < 20 // one word changed out of eight
    java.lang.Long.bitCount(sim(0L) ^ sim(3L)) should be >= hamming
  }

  test("jaccard: set semantics (duplicates ignored), exact values") {
    val ws = docs.select($"doc_id", TextDedup.wordSet($"text").as("ws"))
    val j = ws.filter($"doc_id" === 0).select($"ws".as("wa"))
      .crossJoin(ws.filter($"doc_id" === 2).select($"ws".as("wb")))
      .select(TextDedup.jaccard($"wa", $"wb")).as[Double].head()
    // words of 0: {the,quick,brown,fox,jumps,over,lazy,dog} (8);
    // 2 swaps dog->cat: intersect 7, union 9
    j shouldBe (7.0 / 9.0)
  }

  test("brute-force top-k is deterministic and self-excluding") {
    val e = Tables_embeddings()
    val queries = e.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val topk = Similarity.bruteForceTopK(queries, corpus, 3).cache()
    topk.filter($"qid" === $"id").count() shouldBe 0
    topk.groupBy($"qid").count().select(min($"count")).as[Long].head() shouldBe 3
    // deterministic: run twice, same rows
    val a = topk.orderBy("qid", "rank").collect()
    val b = Similarity.bruteForceTopK(queries, corpus, 3).orderBy("qid", "rank").collect()
    a shouldBe b
  }

  private def Tables_embeddings() = graft.Tables.embeddings(spark, sfSmoke)

  test("multimodal: batched extraction preserves every doc exactly once") {
    val media = Multimodal.attachMedia(
      graft.Tables.documents(spark, sfSmoke))
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 7).cache()
    feats.count() shouldBe 500
    feats.select(countDistinct($"doc_id")).as[Long].head() shouldBe 500
    // stub invariants: byte_len matches source text length
    val bad = feats.join(graft.Tables.documents(spark, sfSmoke), "doc_id")
      .filter($"byte_len" =!= org.apache.spark.sql.functions.length($"text")).count()
    bad shouldBe 0
  }
}
