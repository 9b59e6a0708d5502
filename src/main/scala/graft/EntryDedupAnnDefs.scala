package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
/** LLM-pipeline core query definitions: dedup, ANN, text-analysis,
  * multimodal and the orchestrated-import gates (q19–q50 accretion
  * range plus their later siblings).
  *
  * Part of the [[SparkEntry]] registry split (round 10): each trait is
  * one compilation unit; SparkEntry composes them unchanged.
  */
private[graft] trait EntryDedupAnnDefs extends EntryParityDefs {
  // ---------------------------------------------------------------------
  // LLM training-data pipeline operators (q20-q31)
  // ---------------------------------------------------------------------

  /** Exact dedup as a dataset operator: keep min-id doc per normalized
    * text, report survivors per (lang, source). One 8-byte-hash shuffle. */
  private[graft] def exactDedupRows(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("source"))
  }

  /** MinHash + LSH banding (16 hashes, 4 bands): near-dup candidate
    * pair volume. Joins happen only inside band buckets — the all-pairs
    * product never exists (the 100 TB shape). */
  private[graft] def minHashLsh(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.lshCandidatePairs(Tables.documents(s, dir), "doc_id", "text")
      .select(explode(array(col("a"), col("b"))).as("d"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
  }

  /** SimHash (60-bit bit-vote sketch) banded into 15-bit chunks. */
  private[graft] def simHashPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val sim = TextDedup.simHash(Tables.documents(s, dir), "doc_id", "text")
    val pairStats = TextDedup.simHashCandidatePairs(sim)
      .select(explode(array(col("a"), col("b"))).as("d"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
    pairStats.crossJoin(sim.agg(countDistinct(col("simhash")).as("n_distinct_hashes")))
  }

  /** The exact verify stage after LSH: word-set Jaccard on candidate
    * pairs, top-100 by (score, pair) — fully ordered for determinism. */
  private[graft] def ngramJaccardTopK(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    // intersect 8-byte word hashes, not strings: identical Jaccard
    // (60-bit collisions are negligible; the oracle verifies on raw
    // words, so a collision would fail the gate, not pass silently)
    val ws = docs.select(col("doc_id"),
      transform(TextDedup.normWordSet(col("text")),
        w => TextDedup.md5Hash60(w)).as("ws"))
    TextDedup.lshCandidatePairs(docs, "doc_id", "text")
      .join(ws.select(col("doc_id").as("a"), col("ws").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("ws").as("wb")), Seq("b"))
      .select(col("a"), col("b"),
        round(TextDedup.jaccard(col("wa"), col("wb")), 6).as("jac"))
      .orderBy(col("jac").desc, col("a"), col("b"))
      .limit(100)
  }

  /** Near-dup threshold sweep (q198): the tuning sheet for the
    * dedup threshold — ONE LSH cascade verifies its candidates once
    * (exact integer Jaccard ppm on word hashes), and every
    * threshold reads off the same pair relation (the q130
    * label-reuse discipline: sweeping must not re-run the cascade).
    * Coverage is the banding's candidate recall, stated. */
  private[graft] def dedupThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val ws = docs.select(col("doc_id"),
      transform(TextDedup.normWordSet(col("text")),
        w => TextDedup.md5Hash60(w)).as("ws"))
    val jp = TextDedup.lshCandidatePairs(docs, "doc_id", "text")
      .join(ws.select(col("doc_id").as("a"), col("ws").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("ws").as("wb")), Seq("b"))
      .filter(size(array_union(col("wa"), col("wb"))) > 0)
      .select(expr("cast(size(array_intersect(wa, wb)) as bigint) * 1000000" +
        " div cast(size(array_union(wa, wb)) as bigint)").as("jppm"))
    val thresholds = Seq(500000L, 700000L, 800000L, 900000L)
    jp.select(col("jppm"),
        explode(array(thresholds.map(lit(_)): _*)).as("threshold_ppm"))
      .groupBy(col("threshold_ppm"))
      .agg(count(when(col("jppm") >= col("threshold_ppm"), 1)).as("n_pairs"))
      .orderBy(col("threshold_ppm"))
  }

  /** Dup-graph triangle census (q205): how cliquish is the near-dup
    * relation — the ONE verified pair relation (q198's label-reuse
    * cascade at ≥ 0.5 Jaccard) read as a graph: wedges, triangles,
    * global clustering coefficient in exact ppm. */
  /** The verified near-dup pair relation (the q198/q205/q225 base):
    * one LSH cascade, exact integer Jaccard verify at ≥ 0.5. */
  private[graft] def verifiedDupPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    // spread before the per-word md5 transform (interpreted HOF — the
    // expensive narrow phase; see util.Spread)
    val ws = graft.util.Spread.byKey(docs, col("doc_id"))
      .select(col("doc_id"),
        transform(TextDedup.normWordSet(col("text")),
          w => TextDedup.md5Hash60(w)).as("ws"))
    TextDedup.lshCandidatePairs(docs, "doc_id", "text")
      .join(ws.select(col("doc_id").as("a"), col("ws").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("ws").as("wb")), Seq("b"))
      .filter(size(array_union(col("wa"), col("wb"))) > 0 &&
        expr("cast(size(array_intersect(wa, wb)) as bigint) * 1000000" +
          " div cast(size(array_union(wa, wb)) as bigint)") >= 500000L)
      .select(col("a"), col("b"))
  }

  private[graft] def dupGraphTriangles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.triangleCensus(verifiedDupPairs(s, dir))

  /** The CAPPED verified pair relation (q225's base): identical to
    * [[verifiedDupPairs]] except candidates come from
    * [[graft.operators.TextDedup.lshCandidatePairsCapped]] with
    * degreeCap = bucketCap = 100 — un-refined buckets emit their full
    * pair set (so at sane densities this relation EQUALS the uncapped
    * one; at sf0.01 the largest identical-wordset family is 29 docs,
    * measured), and only refined identical-shingle-set mega-buckets
    * are rank-chain capped, so the adversarial near-clique mass never
    * becomes edges (the round-10 g10 wall: 1,515 s at 100× paid
    * UPSTREAM of the census's own degree cap). */
  private[graft] def verifiedDupPairsCapped(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val ws = graft.util.Spread.byKey(docs, col("doc_id"))
      .select(col("doc_id"),
        transform(TextDedup.normWordSet(col("text")),
          w => TextDedup.md5Hash60(w)).as("ws"))
    TextDedup.lshCandidatePairsCapped(docs, "doc_id", "text", degreeCap = 100)
      .join(ws.select(col("doc_id").as("a"), col("ws").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("ws").as("wb")), Seq("b"))
      .filter(size(array_union(col("wa"), col("wb"))) > 0 &&
        expr("cast(size(array_intersect(wa, wb)) as bigint) * 1000000" +
          " div cast(size(array_union(wa, wb)) as bigint)") >= 500000L)
      .select(col("a"), col("b"))
  }

  /** Degree-capped census (q225): the dense-graph path — candidates
    * bucket-capped UPSTREAM (see [[verifiedDupPairsCapped]]), then
    * each node keeps its 2 smallest-id neighbors, an edge survives on
    * BOTH endpoints; the bound that keeps the dense-fixture census
    * from going quadratic, oracle-exercised on the real corpus. */
  private[graft] def dupTrianglesCapped(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.triangleCensus(verifiedDupPairsCapped(s, dir),
      maxDegree = 2)

  /** LSH cap audit (q244): [[graft.operators.TextDedup.lshCapAudit]]
    * at degreeCap = 16 — a cap that BINDS on the real corpus (the
    * planted dup families exceed 17 members at every SF), so the
    * full-vs-capped pair gap and the capped-bucket count are
    * oracle-exercised, not just spec'd. */
  private[graft] def lshCapAuditQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextDedup.lshCapAudit(
      Tables.documents(s, dir), "doc_id", "text", degreeCap = 16)

  /** SimHash pair audit (q245): the K211 budget guard's accounting —
    * chunk-bucket census + the exact pair estimate the fail-fast
    * compares against the budget, gated standalone like q243/q244 so
    * the estimate itself is oracle-verified. */
  private[graft] def simHashPairAuditQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.simHashPairAudit(
      TextDedup.simHash(Tables.documents(s, dir), "doc_id", "text"))
  }

  /** Degree-capped SimHash candidates (q249): the bounded-output
    * repair for corpora where the K211 budget fires, at degreeCap =
    * 16 — BINDING on the real corpus (max chunk bucket 155/154 at
    * sf0.01/sf0.001, measured), so the rank-successor capping itself
    * is oracle-exercised. Output: pair/doc census over the capped
    * relation beside the audit's full-vs-capped accounting. */
  private[graft] def simHashCappedPairsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val sim = TextDedup.simHash(Tables.documents(s, dir), "doc_id", "text")
      .localCheckpoint() // two consumers (pairs + audit) of one sketch
    val stats = TextDedup.simHashCandidatePairsCapped(sim, degreeCap = 16)
      .select(explode(array(col("a"), col("b"))).as("d"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
    stats.crossJoin(
      TextDedup.capAuditOverBands(TextDedup.simHashChunkKeys(sim), 16)
        .select(col("n_capped_buckets"), col("pairs_full"),
          col("pairs_capped")))
  }

  /** AMS pair-estimate sketch (q253): the map-only F₂ sketch beside
    * the exact chunk-bucket census on the SAME relation — estimate,
    * exact, and the sketch's error in ppm, so the guard fast-path's
    * accuracy claim is itself oracle-gated. */
  private[graft] def pairSketchQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val sim = TextDedup.simHash(Tables.documents(s, dir), "doc_id", "text")
    val ch = TextDedup.simHashChunkKeys(sim)
    val sk = TextDedup.pairEstimateSketch(ch,
      concat(col("band").cast("string"), lit("\u0001"),
        col("key").cast("string")))
    val exact = TextDedup.simHashPairAudit(sim)
      .select(col("pairs_est").as("pairs_exact"))
    sk.crossJoin(exact)
      .select(col("n_rows"), col("f2_est"), col("pairs_est"),
        col("pairs_exact"),
        expr("abs(pairs_est - pairs_exact) * 1000000 div " +
          "greatest(pairs_exact, 1)").as("err_ppm"))
  }

  /** Dup-graph PageRank (q254): integer-micro PageRank over the ONE
    * verified pair relation (q198/q205 label reuse) with every
    * document a node — the canonical-pick centrality read; top-100
    * with full deterministic ties. */
  private[graft] def pageRankQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.pageRank(
        verifiedDupPairs(s, dir), Tables.documents(s, dir), "doc_id")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("rank_micro").desc, col("doc_id"))
      .limit(100)

  /** Majority label propagation (q268): semi-supervised label
    * spreading over the verified dup graph — every 7th doc is seeded
    * with its language, 3 synchronous rounds push labels across
    * near-dup families (clamped seeds, count-then-label deterministic
    * ties); the oracle unrolls the same 3 rounds over the q254 graph
    * CTEs. */
  private[graft] def labelPropagationQuery(
      s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val seeds = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("lang").as("label"))
    graft.operators.Analytics.labelPropagation(
        verifiedDupPairs(s, dir), docs, "doc_id", seeds, iters = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Embedding cosine near-dup pairs (brute force — correct baseline;
    * the LSH-bucketed path in q26 is the 100 TB shape). */
  private[graft] def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    // norms precomputed once per vector (not once per pair); the
    // STREAM side of the all-pairs nested-loop join is spread so the
    // n²/2 dot products run at full width (the single-row-group
    // fixture scanned as ~4 tasks — profiled 4 tasks/4 jobs, one core
    // busy; see util.Spread)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"))
    val a = graft.util.Spread.byKeyIfNarrow(e, col("vec_id"))
      .select(col("vec_id").as("a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy(col("a"), col("b"))
  }

  /** Brute-force cosine top-5 for the first 20 vectors. */
  private[graft] def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Sign-random-projection LSH (6 deterministic md5-parity
    * hyperplanes): per query, bucket population and recall@5 overlap
    * with the exact top-5. */
  private[graft] def annLshRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", Similarity.signRandomProjection(col("embedding"), 64, 6))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("bucket"))
    val exact = Similarity.bruteForceTopK(
      queries.drop("qbucket"), corpus.drop("bucket"), k = 5)
      .select(col("qid"), col("id"))
    val lsh = Similarity.lshTopK(queries, corpus, k = 5)
      .select(col("qid"), col("id"))
    val mates = corpus.join(broadcast(queries),
        col("qbucket") === col("bucket") && col("qid") =!= col("id"))
      .groupBy("qid").agg(count(lit(1)).as("n_mates"))
    val hits = lsh.join(exact, Seq("qid", "id"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    queries.select(col("qid"))
      .join(mates, Seq("qid"), "left")
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_mates"), lit(0L)).as("n_mates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy(col("qid"))
  }

  /** Marker-word language ID vs the labeled lang column. */
  private[graft] def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    Tables.documents(s, dir)
      .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Quality facets per source — integer arithmetic only. */
  private[graft] def qualityScores(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val t = col("text")
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(t)).as("sum_words"),
        sum(length(t)).as("sum_chars"),
        sum(TextAnalysis.stopwordCount(t, TextAnalysis.langMarkers.head._2)).as("sum_stop"),
        count(when(TextAnalysis.highQuality(t), 1)).as("n_highq"))
      .orderBy(col("source"))
  }

  /** Token statistics per lang: whitespace + BPE-ish subword counts. */
  private[graft] def tokenStats(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val t = col("text")
    val d = Tables.documents(s, dir)
    val perLang = d.groupBy(col("lang"))
      .agg(
        sum(TextAnalysis.tokenCount(t)).as("total_words"),
        sum(TextAnalysis.subwordCount(t)).as("total_subwords"),
        max(array_max(transform(split(t, " "), w => length(w)))).cast("long").as("max_wlen"))
    val distinctWords = d
      .select(col("lang"), explode(split(t, " ")).as("w"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("w")).as("n_distinct_words"))
    perLang.join(distinctWords, Seq("lang")).orderBy(col("lang"))
  }

  /** Document fingerprints: MinHash@1, folded hash-sum, rolling hash. */
  private[graft] def fingerprints(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    Tables.documents(s, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        TextAnalysis.fingerprintMin(col("text")).as("fp_min"),
        TextAnalysis.fingerprintSum(col("text")).as("fp_sum"),
        TextAnalysis.fingerprintRolling(col("text")).as("fp_roll"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal pipeline: binary media column (real P6 PPM images) →
    * batched partition-local feature extraction through a real,
    * spec-compliant PPM decoder (dimensions + raster checksum). */
  private[graft] def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractFeatures(s,
        Multimodal.attachMedia(s, Tables.documents(s, dir)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Snapshot-table lifecycle (q273): the manifest-pointer commit
    * protocol end to end — v1 publishes every day of events, v2
    * transactionally overwrites the trailing 10 days with an
    * evens-only rebuild (unchanged days carry forward BY REFERENCE,
    * no rewrite), vacuum drops the superseded manifest, and the final
    * read must equal the oracle's direct CASE over the source — the
    * multi-partition-overwrite gate clear-day-then-insert can't give
    * (round-12 missing-item #4). */
  private[graft] def snapshotTableQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.store.SnapshotTable
    import graft.util.TmpDirs
    val root = TmpDirs.fresh("q273_snap")
    val t = new SnapshotTable(root)
    val ev = Tables.events(s, dir).withColumn("day", dayOf(col("ts")))
    t.commitDays(s, ev)
    val maxDay = ev.agg(max(col("day"))).head().getDate(0).toLocalDate
    val cutoff = java.sql.Date.valueOf(maxDay.minusDays(9))
    t.commitDays(s,
      ev.filter(col("day") > lit(cutoff) && col("event_id") % 2 === 0))
    t.vacuum(s): Unit
    t.read(s)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_ids"))
      .orderBy(col("day"))
  }

  /** PNG decode features (q265): the first COMPRESSED-codec modality —
    * every document's payload becomes a real zlib-backed PNG (two IDAT
    * chunks, all five scanline filters row-round-robin) and the
    * batched decoder recovers dims, the per-row filter-byte sum, the
    * inflated payload length and the unfiltered-raster checksum. The
    * oracle re-derives all of them from the synthesized text (the q31
    * convention), so a single wrong predictor byte anywhere in the
    * CRC/inflate/unfilter path fails the hash compare. */
  private[graft] def pngFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractPngFeatures(s,
        Multimodal.attachPng(s, Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_idat").cast("long").as("n_idat"),
        col("filter_sum"), col("n_filtered"), col("px_checksum"))
      .orderBy(col("doc_id"))
  }

  /** GIF decode features (q289): the SECOND compressed codec — LZW
    * with variable-width codes next to q265's DEFLATE. Every
    * document's payload becomes a real GIF89a (256-entry palette,
    * ≤126-byte sub-blocks, one image) and the decoder recovers dims
    * plus the index- and palette-resolved checksums. The oracle
    * re-derives all of them from the synthesized text (the q265
    * convention), so any LZW mis-decode — width growth, CLEAR reset,
    * KwKwK, bit packing — lands in the checksums. */
  private[graft] def gifFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractGifFeatures(s,
        Multimodal.attachGif(s, Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("idx_checksum"), col("px_checksum"))
      .orderBy(col("doc_id"))
  }

  /** JPEG decode features (q290): the THIRD compressed codec —
    * baseline sequential DCT (JFIF) next to q265's DEFLATE and
    * q289's LZW, the most common real image bytes a 100 TB corpus
    * holds. Every document becomes a real baseline JPEG (grayscale,
    * carried Huffman tables, restart interval 4) and the decoder
    * runs the full pipeline: marker walk, canonical table build from
    * DHT, entropy decode with byte unstuffing, RSTn sequence checks,
    * dequant, de-zigzag, IDCT. The fixture's blocks are DC-only, so
    * the oracle re-derives every decoded pixel from the text (the
    * q265 convention) — any mis-decode anywhere lands in
    * px_checksum. */
  private[graft] def jpegFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractJpegFeatures(s,
        Multimodal.attachJpeg(s, Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_blocks").cast("long").as("n_blocks"),
        col("n_restarts").cast("long").as("n_restarts"),
        col("px_checksum"))
      .orderBy(col("doc_id"))
  }

  /** Video frame sampling (q167): concatenated-P6 frame streams (the
    * ffmpeg image2pipe layout) walked by a real header-parsing
    * decoder, every-2nd-frame sampling — the curation primitive that
    * feeds a vision encoder. Media bytes never shuffle; only sampled
    * feature rows leave the task. */
  private[graft] def videoFrameSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.sampleFrames(s,
        Multimodal.attachVideo(s, Tables.documents(s, dir)), everyN = 2)
      .toDF()
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("px_checksum"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Image center-crop (q185): the vision-preprocessor primitive over
    * the P6 media column — centered 4×4 crop by pure byte indexing,
    * checksummed; media bytes never shuffle. */
  private[graft] def imageCropQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.centerCrop(s,
        Multimodal.attachMedia(s, Tables.documents(s, dir)),
        targetW = 4, targetH = 4)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Image resize (q202): nearest-neighbor scale of the P6 media to
    * the encoder's fixed 8×8 grid — floor index mapping, work per
    * image independent of source size; media bytes never shuffle. */
  private[graft] def imageResizeQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.resizeNearest(s,
        Multimodal.attachMedia(s, Tables.documents(s, dir)),
        targetW = 8, targetH = 8)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Audio modality (q77): deterministic 16-bit PCM WAV payloads
    * decoded by a real RIFF chunk-walking parser; Σ|sample| is the
    * integer loudness proxy. Same batched extraction shape as q31. */
  private[graft] def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractAudioFeatures(s,
        Multimodal.attachAudio(s, Tables.documents(s, dir)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Audio silence trim (q206): strip below-threshold samples from
    * both ends of each PCM clip — the pre-transcription curation
    * pass; interior quiet is kept, all-quiet clips report n_kept=0. */
  private[graft] def audioTrimQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.trimSilence(s,
        Multimodal.attachAudio(s, Tables.documents(s, dir)),
        threshold = 2048)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** MinHash over character 8-gram shingles — the fine-grained
    * shingling variant (boilerplate-heavy corpora). */
  private[graft] def minHashCharShingles(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    // 32/4 (8 rows/band ≈ 0.84 threshold): char 8-gram space is already
    // discriminative, so the steep 64/16 word-set setting would double
    // the signature cost for no selectivity gain
    TextDedup.lshCandidatePairs(Tables.documents(s, dir), "doc_id", "text",
        numHashes = 32, bands = 4, shingler = TextDedup.charShingles(_))
      .select(explode(array(col("a"), col("b"))).as("d"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
  }

  /** Embedding near-dup through SRP buckets — the 100 TB path for q24:
    * compare only within 4-bit sign-random-projection buckets, report
    * bucketed vs exact pair counts (the recall trade, quantified). */
  private[graft] def embeddingNearDupBucketed(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"),
        Similarity.signRandomProjection(col("embedding"), 64, 4).as("bucket"))
      .cache()
    def pairs(joinExtra: org.apache.spark.sql.Column): DataFrame = {
      val a = e.select(col("vec_id").as("a"), col("embedding").as("va"),
        col("nrm").as("na"), col("bucket").as("ba"))
      val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"),
        col("nrm").as("nb"), col("bucket").as("bb"))
      a.join(b, col("a") < col("b") && joinExtra)
        .select(round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
        .filter(col("cos") >= 0.4)
    }
    pairs(col("ba") === col("bb"))
      .agg(count(lit(1)).as("n_pairs_bucketed"))
      .crossJoin(pairs(lit(true)).agg(count(lit(1)).as("n_pairs_exact")))
  }

  /** Near-dup clusters: connected components over the LSH candidate
    * graph — the step that makes dedup a dataset operation (keep one
    * representative per component). Pipeline order matters at scale:
    * exact dedup runs FIRST (one cheap 8-byte-hash shuffle), so
    * byte-identical templated docs never inflate the LSH buckets or
    * the component graph. Oracle: recursive-CTE transitive closure
    * with min-label reduction over the same survivor set. */
  private[graft] def nearDupComponents(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val survivors = TextDedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
    val pairs = TextDedup.lshCandidatePairs(survivors, "doc_id", "text")
    val comp = TextDedup.connectedComponents(pairs)
    val sizes = comp.groupBy(col("label")).agg(count(lit(1)).as("csize"))
    sizes.agg(
      count(lit(1)).as("n_components"),
      max(col("csize")).as("max_component"),
      sum(col("csize")).cast("long").as("n_docs_in_pairs"))
  }

  /** Gap-based sessionization via Spark's native session_window (30-min
    * inactivity gap), verified against a gaps-and-islands oracle. */
  private[graft] def sessionWindows(s: SparkSession, dir: String): DataFrame = {
    val perSession = Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    perSession.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** The SQL surface: spark.sql over temp views, calling the engine's
    * registered native function from SQL. */
  private[graft] def sqlApiNorms(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_v")
    s.sql("""
      SELECT vec_id, label,
             round(graft_array_dot(embedding, embedding), 6) AS sqnorm
      FROM embeddings_v WHERE vec_id < 50 ORDER BY vec_id""")
  }

  /** Exact interpolated percentiles of event value per type (quality
    * cutoffs in data curation are percentile-driven; exact `percentile`
    * and DuckDB's quantile_cont share the linear-interpolation
    * definition, so the oracle matches bit-for-bit). */
  private[graft] def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))
      .orderBy(col("event_type"))

  /** ROLLUP over (lang, source): per-group, per-lang and grand-total
    * doc counts in one pass (grouping sets). */
  private[graft] def docRollup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("source"))

  /** A7 — the Pad field-count policy end to end (pad-flow-data.sh:19):
    * short lines are completed with '' fields (never dropped, never
    * null), full-width lines pass through untouched. The oracle adds
    * the literal padded rows to the clean staging aggregate. */
  private[graft] def padPolicyIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.CsvEventSource
    import graft.util.TmpDirs
    val landing = TmpDirs.fresh("q39_landing")
    val days = CsvEventSource.writeLanding(s, activityStaging(s, dir), landing, "activity")
    // short lines: 2, 5 and exactly-8 fields (activity = ts + 7 cols)
    CsvEventSource.appendLines(s, s"$landing/activity-${days.head}.csv", Seq(
      "1704100000,padb",
      "1704100001,padb,padv,pados,paduid",
      "1704100002,padb,padv,pados,paduid,padtype,padsvc,paddev"))
    val perDay = graft.util.Par.map(CsvEventSource.listDays(s, landing, "activity")) {
      case (_, file) =>
        CsvEventSource.readDay(s, file, graft.model.Schemas.activity,
          CsvEventSource.Pad, maxError = 10, persist = false)
    }
    perDay.reduce(_ unionAll _)
      .groupBy(col("type"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("uid") === "", 1)).as("n_empty_uid"),
        count(when(col("device_id") === "", 1)).as("n_empty_device"))
      .orderBy(col("type"))
  }

  /** D4 — compaction lifecycle: accrete one day partition with six
    * small incremental writes (the many-tiny-files failure mode of
    * incremental jobs), `compactDay` it back to `filesPerDay` sorted
    * files via the temp-dir-and-swap path, and prove file count AND
    * row fidelity. The oracle recomputes the day's aggregate from the
    * source table; the file counts are the operator's invariants. */
  private[graft] def compactionLifecycle(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.util.TmpDirs
    val root = TmpDirs.fresh("q40_compact")
    val t = new DayPartitionedTable(root, "events_store",
      sortCol = Some("ts"), filesPerDay = 2)
    val day = "2024-01-15"
    val slice = Tables.events(s, dir)
      .filter(dayOf(col("ts")) === lit(day).cast("date"))
    (0 until 6).foreach { i =>
      slice.filter(pmod(col("event_id"), lit(6)) === i)
        .coalesce(1)
        .write.mode("append").parquet(s"${t.path}/day=$day")
    }
    def nFiles: Long =
      t.read(s).select(input_file_name()).distinct().count()
    val before = nFiles
    t.compactDay(s, java.time.LocalDate.parse(day))
    val after = nFiles
    t.read(s)
      .groupBy(col("day").cast("string").as("day"))
      .agg(
        lit(before).as("files_before"),
        lit(after).as("files_after"),
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("sum_event_id"))
      .orderBy(col("day"))
  }

  /** J — the orchestrated driver (`make import`, Makefile:17-22): all
    * four pipelines + the daily summary over one landing root, single
    * 100%/18-day tier. The gate is the Makefile-final artifact — the
    * 7-day multi-device rollup — recomputed declaratively by the
    * oracle (device pairs over the retention-filtered staging). */
  private[graft] def runImportE2E(s: SparkSession, dir: String): DataFrame =
    runImportE2EImpl(s, dir, "q41", json = false)

  /** K40 oracle gate (q234): the SAME Makefile-order orchestration over
    * a JSON-LINES landing, hash-compared against the SAME DuckDB
    * re-derivation as the CSV path (q41) — format-blindness as a
    * CORRECTNESS row, not just the JSON≡CSV parity spec. */
  private[graft] def runImportJsonE2E(s: SparkSession, dir: String): DataFrame =
    runImportE2EImpl(s, dir, "q234", json = true)

  /** ORC columnar interchange (q257): snapshot → lang-PARTITIONED ORC
    * → read back → rollup, hash-compared against the parquet-direct
    * oracle — the export/reimport identity for the third columnar
    * wire format (CSV q41, JSON q234, ORC here). Partitioned layout
    * means a lang-filtered reader prunes directories, the same
    * mechanism DayPartitionedTable relies on. Write-path query: gated
    * in Verify, excluded from bench (the q41/q234 convention). */
  private[graft] def orcInterchangeQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q257_orc_$tag")
    Tables.documents(s, dir)
      .write.mode("overwrite").partitionBy("lang").orc(s"$root/docs")
    s.read.orc(s"$root/docs")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        countDistinct(col("doc_id")).as("n_ids"))
      .orderBy(col("lang"), col("source"))
  }

  private[graft] def runImportE2EImpl(
      s: SparkSession, dir: String, qtag: String, json: Boolean): DataFrame = {
    import graft.jobs.RunImport
    import graft.sources.{CsvEventSource, JsonEventSource, LandingFormat}
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"${qtag}_landing_$tag")
    if (json) {
      JsonEventSource.writeLanding(s, activityStaging(s, dir), s"$root/activity", "activity")
      JsonEventSource.writeLanding(s, flowStaging(s, dir), s"$root/flow", "flow")
      JsonEventSource.writeLanding(s, emailStaging(s, dir), s"$root/email", "email-events")
    } else {
      CsvEventSource.writeLanding(s, activityStaging(s, dir), s"$root/activity", "activity")
      CsvEventSource.writeLanding(s, flowStaging(s, dir), s"$root/flow", "flow")
      CsvEventSource.writeLanding(s, emailStaging(s, dir), s"$root/email", "email-events")
    }
    Tables.events(s, dir)
      .groupBy(dayOf(col("ts")).cast("string").as("day"))
      .agg(countDistinct(col("user_id")).as("accounts"),
        count(lit(1)).as("verified_accounts"))
      .collect()
      .foreach { r =>
        CsvEventSource.appendLines(s, s"$root/counts/fxa-basic-metrics-${r.getString(0)}.txt",
          Seq(s"${r.getString(0)},${r.getLong(1)},${r.getLong(2)}"))
      }
    val oneTier = dayTiers.filter(_.suffix == "")
    val formats: Map[String, LandingFormat] =
      if (json) Map("activity" -> LandingFormat.Json,
        "flow" -> LandingFormat.Json, "email" -> LandingFormat.Json)
      else Map.empty
    val job = new RunImport(TmpDirs.fresh(s"${qtag}_wh_$tag"), root, oneTier,
      countsBegin = java.time.LocalDate.parse("2024-01-10"),
      formats = formats)
    job.run(s)
    job.summaries.multiDeviceTable(oneTier.head).read(s)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("uid")).as("n_users"))
      .orderBy(col("day"))
  }

  /** The approx_percentile scale path beside q37's exact form: exact
    * `percentile` buffers EVERY value per group in one agg buffer (OOM
    * at 100 TB); `approx_percentile` is the mergeable-sketch form with
    * bounded state. The gate: exact quantiles hash-match the oracle,
    * and the sketch answer must sit within 5% of the value range of
    * the exact answer (deterministically true at this accuracy). */
  private[graft] def valuePercentilesApprox(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"),
        (max(col("value")) - min(col("value"))).as("rng"))
      .select(col("event_type"), col("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <= col("rng") * 0.05)
          .as("approx_ok"))
      .orderBy(col("event_type"))

  /** As-of join (operators/AsOfJoin): each purchase picks up the most
    * recent prior page view of the same user — one shuffle + one
    * partition-local sort, never the per-key quadratic product a range
    * join would build. Unmatched purchases (no earlier view) keep null. */
  private[graft] def asOfPrevView(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    AsOfJoin.asOf(purchases, views,
        key = "user_id", time = "ts", tie = "event_id",
        payload = Seq("event_id", "ts"))
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("asof_event_id").as("view_event_id"),
        (unix_seconds(col("ts")) - unix_seconds(col("asof_ts"))).as("gap_sec"))
      .orderBy(col("event_id"))
  }

  /** KMV distinct sketch (functions/KMinValues — native mergeable
    * aggregate with a bounded ≤k buffer): per event type, the k
    * smallest distinct user-id hashes, the textbook (k-1)/R_k
    * estimator, and the exact count beside it. The sketch is a pure
    * function of the input set, so the DuckDB oracle reproduces it
    * value-for-value — unlike HLL, whose registers no other engine can
    * check. */
  private[graft] def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup.md5Hash60
    val k = 64
    val m = 1152921504606846976.0 // 2^60: the hash space of md5Hash60
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        call_function("graft_kmv",
          md5Hash60(col("user_id").cast("string")), lit(k)).as("kmv"),
        countDistinct(col("user_id")).as("n_exact"))
      .select(
        col("event_type"),
        size(col("kmv")).cast("long").as("sketch_size"),
        try_element_at(col("kmv"), lit(k)).as("kth_min"),
        when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(m) /
              try_element_at(col("kmv"), lit(k)).cast("double"), 4))
          .as("est_distinct"),
        col("n_exact"))
      .orderBy(col("event_type"))
  }

  /** TF-IDF top terms per language (operators/TextAnalysis): corpus
    * characterization with the df side reduced to vocabulary size and
    * broadcast. */
  private[graft] def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.tfIdfTopTerms(
        Tables.documents(s, dir), "doc_id", "text", "lang", topK = 10)
      .withColumnRenamed("grp", "lang")
      .orderBy(col("lang"), col("rank"))
  }

  /** I3 "v2" under the oracle gate: the streaming sessionizer
    * (flatMapGroupsWithState + 25 h watermark) replayed over the
    * engine's own day-partitioned storage with Trigger.AvailableNow,
    * one file per batch — the watermark advances BETWEEN days exactly
    * as a live deployment would see it, and event-time timeouts flush
    * every session. Two tick days (far past the data, no flow.begin →
    * they emit nothing) push the final watermark past every timeout.
    * The oracle recomputes the same per-flow fold declaratively. */
  private[graft] def streamingSessions(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.streaming.StreamingSessionizer
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q46_stream_$tag")
    val e = Tables.events(s, dir)
    val fe = e.select(
      col("ts"),
      when(col("event_type") === "signup", lit("flow.begin"))
        .when(col("event_type") === "purchase", lit("flow.complete"))
        .when(col("event_type") === "error", lit("account.created"))
        .otherwise(lit("flow.event")).as("type"),
      md5(concat(col("user_id").cast("string"), lit("#"),
        dayOf(col("ts")).cast("string"))).as("flow_id"),
      (unix_millis(col("ts")) % 100000000L).as("flow_time"),
      concat(lit("loc"), (col("user_id") % 7).cast("string")).as("locale"),
      md5(col("user_id").cast("string")).as("uid"),
      dayOf(col("ts")).as("day"))
    val t = new DayPartitionedTable(root, "flow_events", sortCol = Some("ts"))
    t.writeDays(fe)
    val realFiles = t.read(s).select(input_file_name()).distinct().count().toInt
    // Tick days, written AFTER the data so modification time (the file
    // source's processing order) puts them last. Timeouts fire in the
    // batch AFTER the watermark advances past them, so the flush needs
    // two tick batches: batch k processes every real file (watermark
    // still at its pre-tick value — no real event is ever late), batch
    // k+1 the first tick day (advancing the watermark past every real
    // deadline), batch k+2 the second tick day (firing them). The first
    // tick day spans `realFiles` files so the two ticks can never share
    // a batch; tick flows have no flow.begin and emit nothing.
    val maxDay = t.maxDay(s).get
    def tickRows(n: Int, d: Long): DataFrame = {
      val tick = maxDay.plusDays(d)
      s.range(n.toLong).select(
        lit(java.sql.Timestamp.valueOf(s"$tick 00:00:00")).as("ts"),
        lit("tick").as("type"),
        concat(lit(s"tick-$d-"), col("id")).as("flow_id"),
        lit(0L).as("flow_time"), lit("").as("locale"), lit("").as("uid"))
    }
    tickRows(realFiles, 3).repartition(realFiles)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(3)}")
    tickRows(1, 6).coalesce(1)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(6)}")
    val sink = s"q46_sessions_$tag"
    val q = StreamingSessionizer.sessionize(
        StreamingSessionizer.fileStream(s, t.path, Some(realFiles)))
      .writeStream
      .format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink).orderBy(col("flow_id"))
  }

  /** Streaming daily rollups (StreamingRollups) oracle-gated the q46
    * way: replay the events table through the file source day by day
    * (AvailableNow + maxFilesPerTrigger so the watermark advances
    * BETWEEN days), two tick batches flush the final windows, and the
    * tick windows themselves never close so they never reach the sink.
    * Per-type daily counts are checked hash-exact; the HLL
    * `dau_approx` column is reduced to a Spark-side tolerance flag vs
    * the exact batch DAU (the q42 technique — DuckDB cannot replay
    * Spark's HLL sketch, but it can assert the flag). */
  private[graft] def streamingDailyRollups(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.streaming.StreamingRollups
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q58_stream_$tag")
    val e = Tables.events(s, dir)
      .select(col("ts"), col("user_id"), col("event_type"), dayOf(col("ts")).as("day"))
    val t = new DayPartitionedTable(root, "events_by_day", sortCol = Some("ts"))
    t.writeDays(e)
    val realFiles = t.read(s).select(input_file_name()).distinct().count().toInt
    // same two-tick flush as q46: batch k+1 advances the watermark past
    // every real day window, batch k+2 evicts/emits them; the tick
    // windows stay open and are never emitted (negative user_ids and a
    // 'tick' type keep them self-describing if one ever leaks — the
    // day join below would drop it anyway).
    val maxDay = t.maxDay(s).get
    def tickRows(n: Int, d: Long): DataFrame = {
      val tick = maxDay.plusDays(d)
      s.range(n.toLong).select(
        lit(java.sql.Timestamp.valueOf(s"$tick 00:00:00")).as("ts"),
        (col("id") - 1000000L).as("user_id"),
        lit("tick").as("event_type"))
    }
    tickRows(realFiles, 3).repartition(realFiles)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(3)}")
    tickRows(1, 6).coalesce(1)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(6)}")
    def replay(): DataFrame = s.readStream
      .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, day DATE")
      .option("maxFilesPerTrigger", realFiles)
      .parquet(t.path)
      .select("ts", "user_id", "event_type")
    def runToTable(df: DataFrame, name: String): DataFrame = {
      val q = df.writeStream
        .format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", s"$root/ckpt_$name")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
    }
    val typeCounts =
      runToTable(StreamingRollups.dailyTypeCounts(replay()), s"q58_types_$tag")
    val dau =
      runToTable(StreamingRollups.dailyActiveUsers(replay()), s"q58_dau_$tag")
    val exact = Tables.events(s, dir)
      .groupBy(dayOf(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("dau_exact"))
    val dauOk = dau.join(exact, Seq("day"))
      .select(col("day"),
        (abs(col("dau_approx") - col("dau_exact")) <=
          greatest(lit(2L), (col("dau_exact") * 0.15).cast("long"))).as("dau_ok"))
    typeCounts.join(dauOk, Seq("day"))
      .select(col("day").cast("string").as("day"), col("event_type"),
        col("n_events"), col("dau_ok"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Benchmark-contamination scan: which corpus documents share char
    * 8-gram shingles with a held-out eval set (doc_id < 20 stands in
    * for the benchmark). The eval shingle set is tiny → broadcast; the
    * corpus side is one explode + hash + count, never a doc×doc
    * product. A doc is flagged when shared shingles reach half its
    * shingle set.
    *
    * Single corpus pass: the eval set joins in as a broadcast LEFT
    * join with a hit marker, so one explode + hash + aggregation
    * computes both the total and the shared shingle counts — the
    * two-branch form scanned and hashed the corpus twice and
    * shuffled it twice. */
  private[graft] def contaminationScan(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    def shingles(d: DataFrame): DataFrame =
      // spread before the char-shingle explode + md5 (see util.Spread)
      graft.util.Spread.byKey(d, col("doc_id"))
        .select(col("doc_id"), explode(TextDedup.charShingles(col("text"))).as("w"))
        .select(col("doc_id"), TextDedup.md5Hash60(col("w")).as("h"))
    val evalSh = shingles(docs.filter(col("doc_id") < 20)).select(col("h")).distinct()
      .withColumn("hit", lit(1))
    shingles(docs.filter(col("doc_id") >= 20))
      .join(broadcast(evalSh), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        (col("n_shared") * 2 >= col("n_shingles")).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Quality-percentile curation filter: per-language p75 length
    * cutoff (exact percentile — interpolation identical to DuckDB's
    * quantile_cont), thresholds broadcast back onto the corpus, per
    * (lang, source) keep rates. The percentile-driven gate is how
    * real curation picks quality cutoffs without hand-tuned
    * constants. */
  private[graft] def qualityPercentileFilter(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val thr = d.groupBy(col("lang"))
      .agg(expr("percentile(n_chars, 0.75)").as("thr"))
    d.join(broadcast(thr), Seq("lang"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("n_chars") >= col("thr"), 1)).as("n_kept"))
      .orderBy(col("lang"), col("source"))
  }

  /** q25's brute-force ANN re-expressed through the bounded
    * `graft_topk` heap aggregate (functions/TopKByScore): same rows as
    * the window form, but the shuffle carries ≤k entries per group
    * instead of every scored pair — the form that survives a
    * billion-candidate verify stage. Oracle: identical to q25's. */
  private[graft] def annTopKAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.bruteForceTopKAgg(queries, corpus, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF-style ANN: 16 deterministic seed centroids (vec_id 20–35)
    * quantize the corpus via plan-time literal dot products (map-only
    * cell assignment); each query probes its 4 nearest cells, so the
    * exact-cosine stage touches ~4/16 of the corpus. The collect is
    * the 16-row quantizer, not data. */
  /** The fixture's shared centroid/codebook seed set (vec_id 20..35)
    * as id-sorted (id, vec) pairs — one definition for q50/q59/q63/
    * q70/q73, so the seed range can never silently diverge between
    * the oracle-gated queries and the spec fixtures. Bounded model
    * state (16 vectors), not a data collect. */
  private[graft] def seedVectors(e: DataFrame): Seq[(Long, Array[Float])] =
    e.filter(col("vec_id") >= 20 && col("vec_id") < 36)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq.sortBy(_._1)

  private[graft] def ivfAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val centroids = seedVectors(e)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.ivfTopK(queries, corpus, centroids, nprobe = 4, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Lloyd-TRAINED IVF recall audit: one deterministic spherical Lloyd
    * step (Similarity.lloydStepDeterministic — ascending-id member
    * fold, so the refined centroids are bit-reproducible in DuckDB via
    * `list_reduce`) refines q50's 16 seed centroids; the corpus
    * re-quantizes against the refined set, each query probes its 4
    * nearest refined cells, and recall@5 is scored against the exact
    * brute-force top-5. This gates the IVF TRAINING path end-to-end,
    * not just q50's probe path. At 100 TB the training sample is
    * bounded (Lloyd always trains on a sample), so the id-sorted
    * member collect stays modest while probing/scoring remain
    * distributed. IvfLloydSpec asserts the trained recall beats a
    * floor and does not trail the seed centroids' recall. */
  private[graft] def ivfLloydRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val refined = Similarity.lloydStepDeterministic(corpus, seeds)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = Similarity.ivfTopK(queries, corpus, refined, nprobe = 4, k = 5)
      .select(col("qid"), col("id"))
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select(col("qid"), col("id"))
    val hits = ivf.join(exact, Seq("qid", "id"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    queries.select(col("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy(col("qid"))
  }

  /** Bloom-prefiltered incremental exact dedup: index = docs with
    * doc_id % 10 < 8 (the q56 crawl split), new batch = the rest. A
    * graft_bloom sketch of the index (bounded bytes, broadcast as a
    * literal) splits the batch map-side: definitely-new rows skip the
    * index join entirely (a Bloom filter has no false negatives), and
    * only the maybe-seen sliver pays the anti-join shuffle — the plan
    * that survives 100 TB/day against a multi-PB index. The result is
    * EXACT, so the oracle is the plain set-semantics anti-join. */
  private[graft] def bloomIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val index = docs.filter(col("doc_id") % 10 < 8)
      .select(TextDedup.md5Hash60(TextDedup.norm(col("text"))).as("h"))
      .distinct()
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    val (survivors, _) = TextDedup.dedupAgainstIndexBloom(
      batch, "text", "doc_id", index, numBits = 1 << 16, numHashes = 7)
    survivors.select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Sharded-Bloom incremental dedup (q71): q60's exact contract
    * through the hash-prefix-sharded prefilter — the index aggregates
    * per-shard sketches instead of one driver-collected literal, so
    * the plan scales past the single-sketch broadcast ceiling. Same
    * oracle semantics as q60 by construction (the sketch changes the
    * plan, never the answer). */
  private[graft] def bloomShardedDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val index = docs.filter(col("doc_id") % 10 < 8)
      .select(TextDedup.md5Hash60(TextDedup.norm(col("text"))).as("h"))
      .distinct()
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    val (survivors, _) = TextDedup.dedupAgainstIndexBloomSharded(
      batch, "text", "doc_id", index,
      shards = 5, numBitsPerShard = 1 << 14, numHashes = 7)
    survivors.select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-window chunking: 16-token windows every 8 tokens (50%
    * overlap), the map-only explode that turns curated docs into
    * fixed-size training examples. No shuffle anywhere — the ORDER BY
    * here is only the oracle-compare canonicalization. */
  private[graft] def chunkDocumentsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.chunkDocuments(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 16, stride = 8)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

}
