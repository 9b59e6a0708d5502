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

  test("connected components: 1000-node path converges in O(log n) rounds") {
    // plain neighbor-min propagation needs 999 rounds on a path; the
    // pointer-jumping variant must close it in ~12
    val pairs = spark.range(0, 999)
      .select($"id".as("a"), ($"id" + 1L).as("b"))
    val labels = TextDedup.connectedComponents(pairs.toDF(), maxIter = 15)
    labels.count() shouldBe 1000
    labels.filter($"label" =!= 0L).count() shouldBe 0
  }

  test("connected components: separate cliques keep separate min labels") {
    val edges = (for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)) ++
      (for (a <- 10L to 12L; b <- (a + 1) to 12L) yield (a, b))
    val labels = TextDedup.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    (0L to 3L).foreach(n => labels(n) shouldBe 0L)
    (10L to 12L).foreach(n => labels(n) shouldBe 10L)
  }

  test("LSH bucket-size guard refines mega-buckets to exact set matches") {
    // 10 groups × 12 copies over a 10-word vocabulary, group g missing
    // word g: cross-group Jaccard is 0.8, identical sets within group.
    // Identical sets share every band key, so every bucket holds whole
    // groups (≥12 docs > cap=5) and gets refined by the exact set key:
    // cross-group candidates must vanish, within-group pairs must ALL
    // survive (the guard refines, never drops).
    val vocab = ('a' to 'j').map(c => s"word$c")
    val rows = for (g <- 0 until 10; c <- 0 until 12)
      yield ((g * 12 + c).toLong, vocab.patch(g, Nil, 1).mkString(" "))
    val df = rows.toDF("doc_id", "text")
    val pairs = TextDedup.lshCandidatePairs(df, "doc_id", "text", bucketCap = 5)
      .cache()
    pairs.filter(floor($"a" / 12) =!= floor($"b" / 12)).count() shouldBe 0
    pairs.count() shouldBe 10L * (12 * 11 / 2)
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
    val media = Multimodal.attachMedia(spark,
      graft.Tables.documents(spark, sfSmoke))
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 7).cache()
    feats.count() shouldBe 500
    feats.select(countDistinct($"doc_id")).as[Long].head() shouldBe 500
    // decoder invariants: dimensions derive from the text byte length,
    // and byte_len is the full media size (header + w*h*3 raster)
    val bad = feats.join(graft.Tables.documents(spark, sfSmoke), "doc_id")
      .filter($"width" =!= org.apache.spark.sql.functions.length($"text") % 13 + 2 ||
        $"height" =!= org.apache.spark.sql.functions.length($"text") % 7 + 2 ||
        $"byte_len" <= $"width" * $"height" * 3)
      .count()
    bad shouldBe 0
  }

  test("multimodal: PPM decoder round-trips the encoder and rejects garbage") {
    val doc = Multimodal.encodePpm(7L, "hello world, a decodable doc")
    val f = Multimodal.decodePpm(doc)
    f.width shouldBe 28 % 13 + 2
    f.height shouldBe 28 % 7 + 2
    // raster holds only the first w*h*3 = 4*2*3 = 24 bytes of the 28-byte doc
    f.px_checksum shouldBe "hello world, a decodable doc".getBytes("UTF-8")
      .take(24).map(_ & 0xff).sum.toLong
    // spec compliance: comments and arbitrary whitespace in the header
    val withComment = ("P6\n# a comment\n 2\t3 # trailing\n255\n" +
      "x" * 18).getBytes("ISO-8859-1")
    val g = Multimodal.decodePpm(Multimodal.MediaDoc(8L, withComment, "", 0L))
    g.width shouldBe 2
    g.height shouldBe 3
    g.px_checksum shouldBe 18L * 'x'
    // a real parser throws on malformed input instead of fabricating
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodePpm(Multimodal.MediaDoc(9L, "JFIF....".getBytes, "", 0L))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodePpm(Multimodal.MediaDoc(10L,
        "P6\n2 2\n255\nshort".getBytes, "", 0L)) // truncated raster
  }

  test("multimodal: WAV decoder round-trips, walks unknown chunks, rejects garbage") {
    val text = "hello world, a decodable doc" // 28 bytes
    val doc = Multimodal.encodeWav(7L, text)
    val f = Multimodal.decodeWav(doc)
    f.sample_rate shouldBe 8000
    f.n_samples shouldBe (28 % 50 + 10).toLong // 38
    f.byte_len shouldBe (44 + 2 * 38).toLong
    val bytes = text.getBytes("UTF-8")
    f.amp_checksum shouldBe (0 until 38)
      .map(i => math.abs(((bytes(i % 28) & 0xff) - 128) * 128).toLong).sum
    // real-file robustness: an unknown LIST chunk (odd size → padded)
    // between fmt and data must be skipped, not fatal
    val base = doc.media
    val extra = java.nio.ByteBuffer.allocate(base.length + 8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(base, 0, 36) // RIFF..fmt chunk (12 + 8 + 16)
    extra.put("LIST".getBytes("US-ASCII")).putInt(5)
    extra.put("INFOx".getBytes("US-ASCII")).put(0.toByte) // 5 bytes + pad
    extra.put(base, 36, base.length - 36) // data chunk
    val padded = extra.array()
    // patch the RIFF size field for the inserted 14 bytes
    val riffSize = padded.length - 8
    (0 until 4).foreach(i => padded(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte)
    val g = Multimodal.decodeWav(Multimodal.MediaDoc(8L, padded, "", 0L))
    g.amp_checksum shouldBe f.amp_checksum
    g.n_samples shouldBe f.n_samples
    // garbage and truncation throw instead of fabricating
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWav(Multimodal.MediaDoc(9L, "ID3....whatever".getBytes, "", 0L))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWav(Multimodal.MediaDoc(10L,
        doc.media.take(50), "", 0L)) // data chunk overruns
  }

  test("unigram surprisal: micro-nat quantization, hand-checked values") {
    // tokens: a×2, b×2, total 4 → p = 0.5 each → -ln(0.5)·1e6 = 693147
    val corpus = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(corpus, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      (1L, 3L, 3 * 693147L, 693147L),
      (2L, 1L, 693147L, 693147L))
    // rarer tokens are more surprising: a unique token scores above a
    // repeated one within the same corpus
    val c2 = Seq((1L, "x x x x y")).toDF("doc_id", "text")
    val micro = TextAnalysis.unigramSurprisal(c2, "doc_id", "text")
      .select($"surprisal_micro").as[Long].head()
    // x: -ln(4/5)×4, y: -ln(1/5) → 892574 + 1609438 = 2501 to the micro
    micro shouldBe (4 * math.round(-math.log(4.0 / 5) * 1e6) +
      math.round(-math.log(1.0 / 5) * 1e6))
  }

  test("decontaminate drops eval-overlapping docs, keeps clean and short ones") {
    val eval = Seq((1L, "the secret benchmark answer string here"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the secret benchmark answer string here"), // full overlap → drop
      (11L, "совершенно другие слова здесь без пересечения вовсе"), // clean → keep
      (12L, "tiny")) // 1 shingle, 0 shared → keep (below minShared)
      .toDF("doc_id", "text")
    val kept = TextDedup.decontaminate(corpus, eval, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    kept shouldBe Set(11L, 12L)
  }

  test("RRF fusion: integer points, both-modality docs outrank single-modality") {
    // retriever A ranks: d10=1, d11=2 ; retriever B ranks: d10=2, d12=1
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "id", "r")
    val b = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("qid", "id", "r")
    val out = HybridSearch.rrfFuse(Seq(a, b), k = 3)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    val p1 = 1000000 / 61 // rank 1 → 16393
    val p2 = 1000000 / 62 // rank 2 → 16129
    out shouldBe Seq(
      (1L, 1L, 10L, (p1 + p2).toLong), // in both lists → dominates
      (1L, 2L, 12L, p1.toLong), // rank-1 in one list beats rank-2 in one
      (1L, 3L, 11L, p2.toLong))
  }

  test("inverted-index lexical top-k matches the scan form on the fixture") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet(s"$sfSmoke/documents.parquet")
    def ws(c: Column): Column =
      transform(TextDedup.normWordSet(c), w => TextDedup.md5Hash60(w))
    val qs = d.filter($"doc_id" < 20)
      .select($"doc_id".as("qid"), ws($"text").as("qws"))
    val cs = d.filter($"doc_id" >= 20)
      .select($"doc_id".as("id"), ws($"text").as("ws"))
    val idx = HybridSearch.lexicalTopK(qs, cs, k = 20)
      .select($"qid", $"id", $"r").as[(Long, Long, Long)].collect().toSet
    // scan form: score EVERY (query, doc) pair, rank by (jac DESC, id)
    val wl = Window.partitionBy($"qid").orderBy($"jac".desc, $"id")
    val scan = cs.join(qs)
      .select($"qid", $"id",
        round(TextDedup.jaccard($"qws", $"ws"), 6).as("jac"))
      .withColumn("r", row_number().over(wl))
      .filter($"r" <= 20 && $"jac" > 0)
      .select($"qid", $"id", $"r").as[(Long, Long, Long)].collect().toSet
    idx shouldBe scan
    // the index never materializes the query×corpus product: no
    // nested-loop/cartesian join may appear in the physical plan
    val plan = HybridSearch.lexicalTopK(qs, cs, 20)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("lexical top-k: zero-overlap docs are not retrieved; ties break by id") {
    val qs = Seq((1L, Seq(10L, 11L, 12L, 13L))).toDF("qid", "qws")
    val cs = Seq(
      (100L, Seq(10L, 11L, 12L, 13L)), // jac 1.0
      (101L, Seq(10L, 11L)), //            jac 0.5
      (99L, Seq(12L, 13L)), //             jac 0.5 — ties with 101, lower id
      (102L, Seq(77L, 78L))) //            no overlap → never retrieved
      .toDF("id", "ws")
    val out = HybridSearch.lexicalTopK(qs, cs, k = 10)
      .orderBy($"r").select($"id", $"r").as[(Long, Long)].collect().toSeq
    out shouldBe Seq((100L, 1L), (99L, 2L), (101L, 3L)) // 3 rows, not 4
  }

  test("BM25: hand-checked score; rarity outweighs common terms; no-overlap docs absent") {
    val corpus = Seq(
      (100L, Seq("a", "b", "a")), // tf(a)=2, dl=3
      (101L, Seq("b", "c"))) //       dl=2 — no 'a'
      .toDF("id", "toks")
    val qs = Seq((1L, Seq("a"))).toDF("qid", "qtoks")
    val out = HybridSearch.bm25TopK(qs, corpus, k = 5)
      .select($"id", $"bm25_micro").as[(Long, Long)].collect().toSeq
    // N=2, avgdl=2.5; idf(a)=ln(1+(2-1+0.5)/(1+0.5)), tf part per the
    // operator's exact parenthesization
    val idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    val tfp = 2 * (1.2 + 1.0) / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    out shouldBe Seq((100L, math.round(idf * tfp * 1e6)))
    // a rare term must outscore a corpus-wide common term at equal tf
    val c2 = Seq(
      (200L, Seq("common", "rare")),
      (201L, Seq("common", "x")),
      (202L, Seq("common", "y")))
      .toDF("id", "toks")
    val q2 = Seq((1L, Seq("rare")), (2L, Seq("common"))).toDF("qid", "qtoks")
    val scores = HybridSearch.bm25TopK(q2, c2, k = 5)
      .select($"qid", $"id", $"bm25_micro").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    scores((1L, 200L)) should be > scores((2L, 200L))
    // plan shape: no cartesian product, and the only nested-loop join
    // is the one-row N/avgdl stats broadcast
    val plan = HybridSearch.bm25TopK(q2, c2, 5)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    ("BroadcastNestedLoopJoin".r.findAllIn(plan).size) should be <= 1
  }

  test("sketchJaccard: exact on identical/disjoint sketches, close on real overlap") {
    def kmvOf(hs: Seq[Long], k: Int = 128) =
      hs.toDF("h")
        .agg(call_function("graft_kmv", $"h", lit(k)).as("kmv"))
    def est(a: Seq[Long], b: Seq[Long], k: Int = 128): Double = {
      val df = kmvOf(a).select($"kmv".as("ka"))
        .crossJoin(kmvOf(b).select($"kmv".as("kb")))
      df.select(TextDedup.sketchJaccard($"ka", $"kb", k)).as[Double].head()
    }
    // KMV needs UNIFORM hashes (i*C is monotone — its bottom-k would
    // all come from small i); mix() is the murmur finalizer the Bloom
    // sketch uses
    def hs(r: Range): Seq[Long] = r.map(i => graft.functions.BloomUtil.mix(i.toLong))
    val xs = hs(1 to 1000)
    est(xs, xs) shouldBe 1.0
    est(xs, hs(5000 to 6000)) shouldBe 0.0
    // A = 1..1000, B = 501..1500 → |A∩B|=500, |A∪B|=1500 → true J=1/3;
    // k=128 lands within the ~1/sqrt(k) ≈ 0.09 textbook band
    // (deterministic fixture)
    est(xs, hs(501 to 1500)) should be (1.0 / 3 +- 0.09)
  }

  test("BPE pair counts weight character pairs by word frequency") {
    val corpus = Seq(
      (0L, "abab abab cd"),
      (1L, "abab x")) // "abab"×3: ab=2/word, ba=1/word; "cd"×1; "x" has no pair
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpePairCounts(corpus, "text", topK = 10)
      .as[(String, Long)].collect().toSeq
    out shouldBe Seq(("ab", 6L), ("ba", 3L), ("cd", 1L))
    // single-character words contribute nothing; empty corpus is empty
    TextAnalysis.bpePairCounts(
      Seq((0L, "a b c")).toDF("doc_id", "text"), "text", 5).count() shouldBe 0L
  }
}
