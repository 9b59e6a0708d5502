package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Late-round-8 operator specs: corpus snapshot diff, length-bucketed
  * batch assembly, asymmetric containment pairs, matryoshka
  * truncated-dim retrieval. */
class Round8cOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------- snapshotDiff

  test("snapshotDiff: added/removed/changed/unchanged classification") {
    val oldSnap = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "two"), (3L, "three prime"), (4L, "four"))
      .toDF("doc_id", "text")
    val out = Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    out shouldBe Array(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added"))
  }

  test("snapshotDiff: identical snapshots are all unchanged") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = Curation.snapshotDiff(snap, snap, "doc_id", "text").collect()
    out.map(_.getString(1)).toSet shouldBe Set("unchanged")
    out.length shouldBe 2
  }

  // ------------------------------------------------------ lengthBucketBatches

  test("lengthBucketBatches: pow-2 buckets, in-shard packing, pad accounting") {
    // nShards = 1 so every doc lands in shard 0 and the in-bucket order
    // is plain doc_id order — batch math becomes hand-checkable.
    val docs = Seq(
      (1L, 10L), // -> bucket 16, pad 6
      (2L, 16L), // -> bucket 16, pad 0
      (3L, 17L), // -> bucket 32, pad 15
      (4L, 5L),  // -> bucket 16, pad 11
      (5L, 100L) // -> bucket 64 (maxBucket), truncation -> pad 0
    ).toDF("doc_id", "n")
    val out = Curation.lengthBucketBatches(docs, "doc_id", col("n"),
        batchSize = 2, nShards = 1, minBucket = 16, maxBucket = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // bucket 16 holds docs 1,2,4 in id order -> batches 0,0,1
    out shouldBe Array(
      (1L, 10L, 16L, 0L, 0L, 6L),
      (2L, 16L, 16L, 0L, 0L, 0L),
      (3L, 17L, 32L, 0L, 0L, 15L),
      (4L, 5L, 16L, 0L, 1L, 11L),
      (5L, 100L, 64L, 0L, 0L, 0L))
  }

  test("lengthBucketBatches: batches never exceed batchSize and shards are stable") {
    val docs = (1L to 200L).map(i => (i, (i % 37) + 1)).toDF("doc_id", "n")
    val out = Curation.lengthBucketBatches(docs, "doc_id", col("n"),
      batchSize = 8, nShards = 4)
    out.groupBy("bucket_len", "shard", "batch").count()
      .agg(max("count")).head().getLong(0) should be <= 8L
    // determinism: same input, same addresses
    val a = out.orderBy("doc_id").collect().toSeq
    val b = Curation.lengthBucketBatches(docs, "doc_id", col("n"),
      batchSize = 8, nShards = 4).orderBy("doc_id").collect().toSeq
    a shouldBe b
    an[IllegalArgumentException] shouldBe thrownBy {
      Curation.lengthBucketBatches(docs, "doc_id", col("n"),
        batchSize = 8, nShards = 4, minBucket = 24, maxBucket = 64)
    }
  }

  // --------------------------------------------------------- containmentPairs

  test("containmentPairs: full quotation scores 1.0 one way while Jaccard hides it") {
    // doc 1 is quoted whole inside doc 2; doc 3 is unrelated
    val small = "alpha beta gamma delta"
    val host = s"intro words here $small trailing tail words end"
    val docs = Seq((1L, small), (2L, host), (3L, "x y z w v u t s"))
      .toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, "doc_id", "text",
        n = 3, dfCap = 10, minPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    out.length shouldBe 1
    val (a, b, shared, na, nb, contA, contB) = out.head
    (a, b) shouldBe ((1L, 2L))
    shared shouldBe na // every gram of the small doc is in the host
    contA shouldBe 1000000L
    contB should be < 500000L // the direction Jaccard-style symmetry sees
    nb should be > na
  }

  test("containmentPairs: grams above dfCap never generate pairs") {
    // "c1 c2 c3" is in every doc; with dfCap=2 it is dropped, so the
    // docs share nothing that survives and no pair is emitted
    val docs = Seq(
      (1L, "c1 c2 c3 a b"),
      (2L, "c1 c2 c3 d e"),
      (3L, "c1 c2 c3 f g")).toDF("doc_id", "text")
    TextDedup.containmentPairs(docs, "doc_id", "text",
      n = 3, dfCap = 2, minPpm = 1L).count() shouldBe 0L
    // raising the cap to 3 lets the shared gram through
    TextDedup.containmentPairs(docs, "doc_id", "text",
      n = 3, dfCap = 3, minPpm = 1L).count() shouldBe 3L
  }

  // ---------------------------------------------------------- matryoshkaTopK

  test("matryoshkaTopK: truncated ranking differs where prefix dims disagree, flags carry recall") {
    // prefix (dims=2) says v20 is closest to the query; the full 4-dim
    // vector says v21 is. The flag must expose the disagreement.
    val queries = Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("qid", "qvec")
    val corpus = Seq(
      (20L, Seq(1f, 0f, 5f, 5f)), // perfect prefix match, bad full cosine (~0.14)
      (21L, Seq(0.9f, 0.1f, 0f, 0f)), // best full-dim match (~0.994)
      (22L, Seq(0.5f, 0.5f, 0f, 0f)) // full cosine ~0.707, prefix ~0.707
    ).toDF("id", "vec")
    val out = Similarity.matryoshkaTopK(queries, corpus, dims = 2, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(4)))
    // truncated top-2 = [v20 (prefix cos 1.0), v21 (0.994)]; full
    // top-2 = {v21, v22} — v20's tail dims sink it, so its flag is 0
    out.map(_._1) shouldBe Array(20L, 21L)
    out.map(_._2) shouldBe Array(0L, 1L)
  }

  // ---------------------------------------------------------- calibrateScores

  test("calibrateScores: within-group ppm percentiles, endpoints, singleton -> 0") {
    val docs = Seq(
      (1L, "s1", 10L), (2L, "s1", 30L), (3L, "s1", 20L),
      (4L, "s2", 999L), // singleton group
      (5L, "s3", 7L), (6L, "s3", 7L) // tie broken by id
    ).toDF("doc_id", "src", "n")
    val out = Curation.calibrateScores(docs, "doc_id", "src", col("n"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    out shouldBe Array(
      (1L, 0L), (2L, 1000000L), (3L, 500000L),
      (4L, 0L),
      (5L, 0L), (6L, 1000000L))
  }

  // --------------------------------------------------- bandKeys / lshIndexDelta

  test("lshIndexDelta: applying the delta to the old index yields the new index") {
    val oldSnap = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "alpha beta gamma"), // unchanged
      (2L, "delta epsilon zeta CHANGED"), // changed
      (4L, "kappa lambda mu")).toDF("doc_id", "text") // added; 3 removed
    val delta = TextDedup.lshIndexDelta(oldSnap, newSnap, "doc_id", "text")
    val dels = delta.filter(col("op") === "del").select("id", "band", "key")
    val ins = delta.filter(col("op") === "ins").select("id", "band", "key")
    // unchanged docs never appear in the delta
    delta.filter(col("id") === 1L).count() shouldBe 0L
    // del = old keys of {2, 3}; ins = new keys of {2, 4}; 4 bands each
    dels.select("id").distinct().collect().map(_.getLong(0)).sorted shouldBe
      Array(2L, 3L)
    ins.select("id").distinct().collect().map(_.getLong(0)).sorted shouldBe
      Array(2L, 4L)
    delta.groupBy("op", "id").count().agg(min("count"), max("count"))
      .head() match { case r => (r.getLong(0), r.getLong(1)) shouldBe ((4L, 4L)) }
    // the index invariant: old − dels + ins = new
    val oldIdx = TextDedup.bandKeys(oldSnap, "doc_id", "text")
    val newIdx = TextDedup.bandKeys(newSnap, "doc_id", "text")
    val patched = oldIdx.exceptAll(dels).unionByName(ins)
    patched.exceptAll(newIdx).count() shouldBe 0L
    newIdx.exceptAll(patched).count() shouldBe 0L
  }

  // ------------------------------------------------------- signalCorrelations

  test("signalCorrelations: perfect, inverse, and degenerate signals") {
    val docs = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("doc_id", "x")
    val out = TextAnalysis.signalCorrelations(docs, Seq(
        "x" -> col("x"),
        "x2" -> col("x") * 2, // perfectly correlated
        "neg" -> -col("x"), // perfectly anti-correlated
        "const" -> lit(5L))) // zero variance -> NULL
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    out(("x", "x2")) shouldBe Some(1.0)
    out(("x", "neg")) shouldBe Some(-1.0)
    out(("x", "const")) shouldBe None
    out(("x2", "neg")) shouldBe Some(-1.0)
    out.size shouldBe 6
    an[IllegalArgumentException] shouldBe thrownBy {
      TextAnalysis.signalCorrelations(docs, Seq("x" -> col("x")))
    }
  }

  test("matryoshkaTopK: dims = full width reproduces brute-force exactly") {
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val m = Similarity.matryoshkaTopK(queries, corpus, dims = 64, k = 3)
    val bf = Similarity.bruteForceTopKAgg(queries, corpus, k = 3)
    m.select("qid", "rank", "id").except(bf.select("qid", "rank", "id"))
      .count() shouldBe 0L
    // at full width every hit is trivially in the full top-k
    m.agg(min("in_full_topk")).head().getLong(0) shouldBe 1L
  }
}
