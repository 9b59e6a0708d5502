package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
/** Curation / text-pipeline query definitions (sampling, packing,
  * mixtures, audits) and the first analytics family.
  *
  * Part of the [[SparkEntry]] registry split (round 10): each trait is
  * one compilation unit; SparkEntry composes them unchanged.
  */
private[graft] trait EntryCurationTextDefs extends EntryDedupAnnDefs {
  /** JSON-lines ingestion (q64): the CSV ingest contract (MAXERROR,
    * TRUNCATECOLUMNS, ''-vs-null) over a second wire format, sharing
    * the EventFamily schema metadata. Derives the same activity staging
    * days as q10, writes them as JSON-lines landing files, corrupts one
    * with malformed/unparseable lines (all of which must be dropped
    * within MAXERROR), ingests every day, and runs q10's aggregate —
    * so the oracle is the SAME clean-derivation SQL as q10's. */
  private[graft] def jsonIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{CsvEventSource, JsonEventSource}
    import graft.util.TmpDirs
    val landing = TmpDirs.fresh("q64_landing")
    val days = JsonEventSource.writeLanding(s, activityStaging(s, dir), landing, "activity")
    CsvEventSource.appendLines(s, s"$landing/activity-${days.head}.json", Seq(
      """this is not json at all""",
      """{"timestamp":"not_a_ts","ua_browser":"b1","uid":"u","type":"login"}""",
      """{"ua_browser":"missing ts","uid":"u","type":"login"}""",
      """[1, 2, 3]"""))
    val perDay = graft.util.Par.map(JsonEventSource.listDays(s, landing, "activity")) {
      case (_, file) =>
        JsonEventSource.readDay(s, file, graft.model.Schemas.activity,
          maxError = 10, persist = false)
    }
    perDay.reduce(_ unionAll _)
      .groupBy(col("type"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("uid")).as("n_users"),
        count(when(col("service") === "", 1)).as("n_empty_service"),
        count(when(length(col("ua_browser")) === 40, 1)).as("n_truncated"))
      .orderBy(col("type"))
  }

  /** Streaming watermarked dedup (q65): replay the events table through
    * `dropDuplicatesWithinWatermark` on a collision-heavy key
    * (event_id % 500) with every real file in ONE AvailableNow batch,
    * so suppression is global and the emitted key set equals batch
    * DISTINCT — which is exactly what the DuckDB oracle checks.
    * Cross-batch suppression and state expiry are covered by the
    * MemoryStream specs (StreamingRollupsSpec), where batch boundaries
    * are controllable; a file-replay oracle must not depend on file
    * listing order, so the single-batch form is the deterministic
    * contract. */
  private[graft] def streamingDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.streaming.StreamingRollups
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q65_stream_$tag")
    val e = Tables.events(s, dir)
      .select(col("ts"), (col("event_id") % 500).as("did"), dayOf(col("ts")).as("day"))
    val t = new DayPartitionedTable(root, "events_by_day", sortCol = Some("ts"))
    t.writeDays(e)
    val realFiles = t.read(s).select(input_file_name()).distinct().count().toInt
    val replayed = s.readStream
      .schema("ts TIMESTAMP, did BIGINT, day DATE")
      .option("maxFilesPerTrigger", realFiles)
      .parquet(t.path)
      .select("ts", "did")
    val q = StreamingRollups.dedupStream(replayed, "did")
      .select(col("did"))
      .writeStream
      .format("memory").queryName(s"q65_dedup_$tag").outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(s"q65_dedup_$tag").orderBy(col("did"))
  }

  /** Unigram surprisal (q67): mean negative log-probability of each
    * doc's tokens under the corpus's own unigram LM — the cheap
    * perplexity-filter proxy. Per-token surprisal quantizes to integer
    * micro-nats BEFORE the per-doc sum, so aggregation order cannot
    * move the result. */
  private[graft] def unigramSurprisalQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.unigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Shared retrieval feeders (q19/q68/q72/q76): docs 0..19 are the
    * queries, the rest the corpus; tokens are md5-hashed (counts and
    * set sizes are hash-invariant, the postings shuffle narrows). */
  private[graft] def lexFeeder(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{HybridSearch, TextDedup}
    import org.apache.spark.sql.Column
    val docs = Tables.documents(s, dir)
    def ws(c: Column): Column =
      transform(TextDedup.normWordSet(c), w => TextDedup.md5Hash60(w))
    HybridSearch.lexicalTopK(
      docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), ws(col("text")).as("qws")),
      docs.filter(col("doc_id") >= 20)
        .select(col("doc_id").as("id"), ws(col("text")).as("ws")),
      k = 20)
  }

  private[graft] def bm25Feeder(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{HybridSearch, TextDedup}
    import org.apache.spark.sql.Column
    val docs = Tables.documents(s, dir)
    def toks(c: Column): Column = transform(
      filter(split(TextDedup.norm(c), " "), w => w =!= ""),
      w => TextDedup.md5Hash60(w))
    HybridSearch.bm25TopK(
      docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), toks(col("text")).as("qtoks")),
      docs.filter(col("doc_id") >= 20)
        .select(col("doc_id").as("id"), toks(col("text")).as("toks")),
      k = 20)
  }

  /** Inverted-index lexical retrieval (q19): per-query top-20 corpus
    * docs by word-set Jaccard WITHOUT a query×corpus scan — corpus
    * explodes once to (token, doc) postings, query tokens join the
    * postings, overlaps accumulate map-side, and the bounded
    * graft_topk heap keeps 20 per query. The scale-shaped replacement
    * for the scan-form lexical feeder (identical ranked output on any
    * corpus where each query has ≥ 20 positive-Jaccard matches —
    * trivially true on the fixtures, min 479). */
  private[graft] def lexicalInvertedTopK(s: SparkSession, dir: String): DataFrame =
    lexFeeder(s, dir).orderBy(col("qid"), col("r"))

  /** BM25 retrieval (q72): the inverted-index postings carry term
    * frequencies and document lengths; scores quantize per matched
    * term to integer micro-points before the per-(query, doc) sum (the
    * q67 discipline), so the DuckDB oracle matches bit-for-bit. Hashed
    * tokens keep the postings shuffle narrow — tf/df/dl are invariant
    * under the hash. */
  private[graft] def bm25TopKQuery(s: SparkSession, dir: String): DataFrame =
    bm25Feeder(s, dir).orderBy(col("qid"), col("r"))

  /** Retrieval training pairs (q255): positives + hard negatives off
    * the q19 lexical ranking, random negatives from the bounded
    * 256-doc hash pool — the contrastive-training feed. */
  private[graft] def trainingPairsQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.operators.HybridSearch.trainingPairs(
        lexFeeder(s, dir).select(col("qid"), col("id"), col("r")),
        docs.filter(col("doc_id") >= 20).select(col("doc_id").as("id")),
        kHard = 5, kRand = 5)
      .orderBy(col("qid"), col("role"), col("pair_rank"))
  }

  /** Hybrid retrieval (q68): lexical Jaccard top-20 (via the q19
    * inverted-index feeder — no query×corpus scan) and cosine top-20
    * per query, fused by integer-micro-point reciprocal-rank fusion
    * (no floats anywhere in the fusion — 1000000 div (60+rank)), final
    * top-10 through the bounded graft_topk heap. Queries are docs
    * 0..19 (text + aligned embedding); corpus is the rest. */
  private[graft] def hybridSearchQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{HybridSearch, Similarity}
    val lex = lexFeeder(s, dir).select(col("qid"), col("id"), col("r"))
    val e = Tables.embeddings(s, dir)
    val vec = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        e.filter(col("vec_id") >= 20)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 20)
      .select(col("qid"), col("id"), col("rank").as("r"))
    HybridSearch.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy(col("qid"), col("rank"))
  }

  /** Three-retriever hybrid fusion (q76): BM25 (q72), inverted-index
    * Jaccard (q19), and exact cosine (q25's form) top-20s fused by
    * integer RRF into a final top-10 — the full hybrid stack, every
    * feeder scale-shaped. rrfFuse is retriever-count-agnostic, so the
    * only new code here is composition. */
  private[graft] def hybridSearch3Query(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{HybridSearch, Similarity}
    val lex = lexFeeder(s, dir).select(col("qid"), col("id"), col("r"))
    val bm = bm25Feeder(s, dir).select(col("qid"), col("id"), col("r"))
    val e = Tables.embeddings(s, dir)
    val vec = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        e.filter(col("vec_id") >= 20)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 20)
      .select(col("qid"), col("id"), col("rank").as("r"))
    HybridSearch.rrfFuse(Seq(bm, lex, vec), k = 10)
      .orderBy(col("qid"), col("rank"))
  }

  /** Decontamination dataset op (q69): q47's scan flag APPLIED — the
    * clean corpus with contaminated docs dropped. */
  private[graft] def decontaminateQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    TextDedup.decontaminate(
        docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20),
        "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Composite curation gate (q66): the full filter battery —
    * repetition flag, quality gate, PII counts, redacted footprint —
    * as ONE auditable verdict per document, reasons as data. */
  private[graft] def curateQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.curate(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Product-quantization ANN (q63): 8 subspaces × 16 deterministic
    * seed centroids (vec_id 20..35, the q59 seed set) — corpus vectors
    * compress to 8 small codes (map-only, literal codebooks), queries
    * score candidates via ADC table lookups, top-5 through the bounded
    * graft_topk heap. The DuckDB oracle mirrors encode + ADC exactly
    * (same subspace slicing, same left-to-right double sums, same
    * round-6 + lowest-cid tie-breaks). */
  private[graft] def pqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val cbs = Similarity.pqCodebooks(seedVectors(e).map(_._2), m = 8)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.pqTopK(queries, corpus, cbs, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF×PQ composed ANN (q70): the billion-scale pairing — IVF cell
    * pruning (q50's centroids, nprobe 4 of 16) bounds WHICH candidates
    * are scored, PQ ADC (q63's codebooks) bounds WHAT each costs, and
    * an exact squared-L2 re-rank of the 20-candidate shortlist
    * restores true ordering for the top-5. Same seed set (vec_id
    * 20..35) serves as both IVF centroids and PQ codebook seeds. */
  private[graft] def ivfPqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val cbs = Similarity.pqCodebooks(seeds.map(_._2), m = 8)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.ivfPqTopK(queries, corpus, seeds, cbs,
        nprobe = 4, shortlist = 20, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** SemDeDup semantic dedup (q73): embeddings cluster into the q50
    * IVF cells (vec_id 20..35 centroids), pairwise cosine runs only
    * within a cell, and any vector with a lower-id cell-mate at
    * cosine ≥ 0.4 (the q24 near-dup bar on this synthetic corpus) is
    * dropped — greedy keep-first. Survivors listed by vec_id. */
  private[graft] def semDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.semDedup(corpus, seeds, minCos = 0.4)
      .select(col("id").as("vec_id"))
      .orderBy(col("vec_id"))
  }

  /** Exact-size deterministic sample (q74): the 100 docs with the
    * smallest md5-derived id hash, via the bounded graft_topk heap —
    * never a global sort. The exact-N contract hashSample (q51)
    * cannot give. */
  private[graft] def exactSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.exactSample(Tables.documents(s, dir), "doc_id", n = 100)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing (q75): stream-pack each language's docs into
    * 512-token bins in doc_id order — one windowed integer running
    * sum per shard, `div`/`%` bin math. */
  private[graft] def packSequencesQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    Curation.packSequences(Tables.documents(s, dir), "lang", "doc_id",
        size(TextDedup.words(col("text"))), budgetTokens = 512)
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Corpus-overlap estimation from sketches (q78): per-language
    * bottom-128 KMV sketches of word-hash sets, pairwise sketch
    * Jaccard (pure array algebra over two 128-long arrays — the
    * corpora are never compared directly), with the exact Jaccard
    * alongside so the estimate is auditable. */
  private[graft] def corpusOverlapQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val k = 128
    val w = Tables.documents(s, dir)
      .select(col("lang"), explode(TextDedup.normWordSet(col("text"))).as("word"))
      .select(col("lang"), TextDedup.md5Hash60(col("word")).as("h"))
      .distinct()
    val sk = w.groupBy(col("lang"))
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("kmv"),
        count(lit(1)).as("n"))
    val pairs = sk.select(col("lang").as("lang_a"), col("kmv").as("ka"), col("n").as("na"))
      .join(sk.select(col("lang").as("lang_b"), col("kmv").as("kb"), col("n").as("nb")),
        col("lang_a") < col("lang_b"))
    val inter = w.select(col("lang").as("lang_a"), col("h"))
      .join(w.select(col("lang").as("lang_b"), col("h")), Seq("h"))
      .filter(col("lang_a") < col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("ni"))
    pairs.join(inter, Seq("lang_a", "lang_b"), "left")
      .select(col("lang_a"), col("lang_b"),
        TextDedup.sketchJaccard(col("ka"), col("kb"), k).as("sketch_jaccard"),
        round(coalesce(col("ni"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("ni"), lit(0L))).cast("double"), 6)
          .as("exact_jaccard"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** SQ8 scalar-quantized ANN (q79): per-dimension max-|v| scales
    * trained on the corpus side in one aggregate pass, symmetric int8
    * encode (floor(x+0.5) rounding — engine-identical, unlike round),
    * ranking by EXACT integer code dot product — the cheap point on
    * the quantization curve before PQ (q63). Top-5 per query off the
    * bounded heap. */
  private[graft] def sqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val scales = Similarity.sqTrain(corpus, "vec", dims = 64)
    Similarity.sqTopK(queries, corpus, scales, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** C4-style line-level boilerplate removal (q80): the corpus is
    * given a deterministic line structure (3-word lines — the fixture
    * has no newlines; the lining transform is mirrored exactly by the
    * oracle), then every line occurring in ≥ 3 distinct documents is
    * dropped corpus-wide and documents reassemble from surviving
    * lines in order. */
  private[graft] def lineDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val ws = split(col("text"), " ")
    val nc = ceil(size(ws) / lit(3.0)).cast("int")
    val lined = Tables.documents(s, dir)
      .select(col("doc_id"),
        array_join(
          transform(sequence(lit(0), nc - 1),
            i => array_join(slice(ws, i * 3 + 1, lit(3)), " ")),
          "\n").as("text"))
    TextDedup.lineDedup(lined, "doc_id", "text", sep = "\n", minDocs = 3)
      .orderBy(col("doc_id"))
  }

  /** Duplicated word-5-gram statistics (q81): per-doc total grams,
    * grams shared with any other doc, and the exact integer ppm
    * fraction — the substring-level dup signal that fires when no
    * full-document near-dup does. */
  private[graft] def dupNgramQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.dupNgramStats(Tables.documents(s, dir), "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))
  }

  /** Character-distribution entropy (q82): micro-nat quantized Shannon
    * entropy per doc — the model-free randomness quality signal. */
  private[graft] def charEntropyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Hashed-feature linear quality scorer (q83): feature-hashing
    * bag-of-words through a deterministic weight function — the
    * model-based-filter plumbing with a SQL-reproducible stand-in for
    * trained weights. */
  private[graft] def hashedQualityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.hashedQualityScore(Tables.documents(s, dir), "doc_id", "text",
        buckets = 1024)
      .orderBy(col("doc_id"))
  }

  /** Deterministic training-order shuffle (q84): every doc gets a
    * (shard, pos) address pseudo-random w.r.t. content but identical
    * across engines and runs — resumable-epoch ordering. */
  private[graft] def shuffleAssignQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.shuffleAssign(Tables.documents(s, dir), "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Audio frame energies (q85): 8-sample frames at hop 4 over the
    * decoded PCM — peak frame energy + index, total energy; the
    * windowing step under VAD/spectrogram featurizers, on the q77
    * decoder's samples. */
  private[graft] def audioFramesQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractAudioFrames(s,
        Multimodal.attachAudio(s, Tables.documents(s, dir)),
        frameLen = 8, hop = 4)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Exact stratified sample (q86): exactly 20 docs per language,
    * uniform within each, off per-stratum bounded heaps — the
    * balanced-mixture contract (q51 is rate-approximate, q74 is
    * global-N). */
  private[graft] def stratifiedSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.exactSampleStratified(Tables.documents(s, dir), "doc_id", "lang",
        nPerStratum = 20)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Bigram surprisal (q87): mean -ln P(w2|w1) per doc under the
    * corpus's own MLE bigram model — "common words in a weird order"
    * vs q67's unigram view. */
  private[graft] def bigramSurprisalQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.bigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Filtered ANN (q88): vector search under a metadata predicate —
    * the corpus PRE-filters (join to the doc relation on the
    * predicate), so top-k recall over the allowed set is exact by
    * construction (post-filtering an unfiltered top-k can starve);
    * then exact cosine ranking over the survivors. The fixture
    * predicate is lang='en'; at scale the same shape pushes any doc
    * predicate into the scan before vectors are touched. */
  private[graft] def filteredAnnQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val allowed = Tables.documents(s, dir)
      .filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val corpus = e.filter(col("vec_id") >= 20)
      .join(allowed, Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Semantic contamination audit (q96): q47 scans for LEXICAL overlap
    * with the eval set; this is its embedding-space complement — for
    * every eval vector, the nearest training vector by exact cosine
    * and a flag at the q24 near-dup bar. Paraphrased eval leakage
    * shows up here when no shingle matches. One bounded broadcast
    * (the eval side), k=1 through the ranking. */
  private[graft] def semanticContaminationQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val evalSet = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val train = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.bruteForceTopK(evalSet, train, k = 1)
      .select(col("qid"), col("id").as("nearest_id"), col("cos"),
        (col("cos") >= 0.4).as("contaminated"))
      .orderBy(col("qid"))
  }

  /** Per-language data card (q97): the corpus-level summary a dataset
    * release publishes — doc and exact-dup counts, token totals and
    * integer milli-mean lengths, distinct-word and source counts. Doc
    * facts aggregate once; token facts aggregate the exploded stream
    * with map-side partials; the two tiny per-lang relations join. */
  private[graft] def dataCardQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val docFacts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(TextDedup.norm(col("text"))).as("n_distinct_texts"),
        countDistinct(col("source")).as("n_sources"),
        sum(size(TextDedup.words(col("text"))).cast("long")).as("total_tokens"))
    val tokenFacts = docs
      .select(col("lang"), explode(TextDedup.words(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("lang"))
      .agg(countDistinct(col("t")).as("distinct_words"))
    docFacts.join(tokenFacts, Seq("lang"))
      .select(col("lang"), col("n_docs"),
        (col("n_docs") - col("n_distinct_texts")).as("n_exact_dups"),
        col("n_sources"), col("total_tokens"),
        expr("total_tokens * 1000 div n_docs").as("mean_tokens_milli"),
        col("distinct_words"))
      .orderBy(col("lang"))
  }

  /** Training manifest (q95): the curation pipeline end to end as ONE
    * declarative composition — quality gate (K52) → exact dedup (K1,
    * min-id per normalized text) → fixed-window chunking (K29, 32/32)
    * → per-shard stream packing with boundary split (K44/K63, budget
    * 64). The output is what a trainer reads: every chunk addressed to
    * (bin, offset) with its head/tail split. Each stage is the
    * already-gated operator; the composition itself is what this query
    * gates — one plan, no materialization between stages. */
  private[graft] def trainingManifestQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis, TextDedup}
    val docs = Tables.documents(s, dir)
    val kept = TextAnalysis.hashedQualityScore(docs, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val surv = TextDedup.exactDedup(
      docs.join(kept, Seq("doc_id"), "left_semi"), "text", "doc_id")
    // chunk_id = doc_id·1e5 + chunk_idx: collision-free up to 100k
    // chunks per doc (3.2M tokens at 32-token chunks) — a doc past
    // that would silently alias a neighbor's address space, so guard
    // it in-plan rather than assume it
    val chunks = Curation.chunkDocuments(surv, "doc_id", "text",
        chunkTokens = 32, stride = 32)
      .join(surv.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("lang"),
        (col("doc_id") * 100000 +
          when(assert_true(col("chunk_idx") < 100000,
              lit("q95: doc exceeds 100k chunks; widen the chunk_id base"))
            .isNull, col("chunk_idx"))).as("chunk_id"),
        col("n_tokens"))
    Curation.packSequencesSplit(chunks, "lang", "chunk_id",
        col("n_tokens"), budgetTokens = 64)
      .select(col("lang"), col("chunk_id"),
        expr("chunk_id div 100000").as("doc_id"),
        (col("chunk_id") % 100000).as("chunk_idx"),
        col("n_tokens"), col("bin"), col("bin_offset"),
        col("head_tokens"), col("tail_tokens"))
      .orderBy(col("lang"), col("chunk_id"))
  }

  /** Winnowing fingerprints (q93): MOSS-style robust substring
    * fingerprints — min hash per 4-hash window over word 4-gram
    * hashes; per-doc selection stats plus the cross-doc shared count
    * (a shared run of ≥ 7 words guarantees a shared fingerprint). */
  private[graft] def winnowingQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.winnowingFingerprints(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Packing boundary split (q94): q75's stream packing plus the
    * materialization step — head tokens in the assigned bin, tail
    * spilling into bin+1, the one-spill contract enforced in-plan. */
  private[graft] def packingSplitQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    // budget-capped inputs are the operator's one-spill CONTRACT
    // (enforced in-plan by assert_true): apply the cap as a filter so
    // the query cannot become a data-dependent whole-run abort on a
    // longer-tailed fixture — q95 shows the chunk-first form
    val capped = Tables.documents(s, dir)
      .filter(size(TextDedup.words(col("text"))) <= 512)
    Curation.packSequencesSplit(capped, "lang", "doc_id",
        size(TextDedup.words(col("text"))), budgetTokens = 512)
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Streaming quality gate (q92): the documents corpus replayed as a
    * file stream through the STATELESS map-only scorer — no watermark,
    * no state store, no shuffle; the form a curation gate takes inside
    * a streaming ingest (score-and-drop before anything pays storage).
    * One AvailableNow pass; emitted rows equal the batch scorer's
    * (doc_id, n_tokens, score, keep) exactly, which is what the q83
    * oracle (minus its mean column) checks. */
  private[graft] def streamingQualityGate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q92_stream_$tag")
    Tables.documents(s, dir).select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/docs")
    val replayed = s.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(s"$root/docs")
    val q = TextAnalysis.hashedQualityScoreMapOnly(replayed, "doc_id", "text")
      .writeStream
      .format("memory").queryName(s"q92_gate_$tag").outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(s"q92_gate_$tag").orderBy(col("doc_id"))
  }

  /** Corpus mixture plan (q90): per-source targets → ceiling
    * keep-rates → deterministic hash-gate apply, as one auditable
    * summary. Targets come from a closed-form hash of the source name
    * (the K52 stand-in pattern — real mixture specs broadcast as a
    * (src, target_n) relation through the identical plan). */
  private[graft] def mixturePlanQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    val docs = Tables.documents(s, dir)
    val targets = docs.select(col("source").as("src")).distinct()
      .withColumn("target_n",
        lit(5L) + pmod(TextDedup.md5Hash60(col("src")), lit(16L)))
    Curation.mixturePlan(docs, "doc_id", "source", targets)
      .orderBy(col("src"))
  }

  /** IVF index audit (q91): per-cell population + integer micro-unit
    * mean squared-L2 distortion to the assigned centroid — the index
    * health report an operator reads before trusting q50/q70/q89. */
  private[graft] def ivfAuditQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.ivfAudit(corpus, seedVectors(e))
      .orderBy(col("cell"))
  }

  /** IVF×SQ8 composed ANN (q89): cell pruning + int8 integer-dot
    * scoring + exact L2 re-rank — FAISS's IVF,SQ8 pairing next to
    * q70's IVF×PQ. Same seed centroids as q50/q70, same corpus-trained
    * scales as q79. */
  private[graft] def ivfSqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val scales = Similarity.sqTrain(corpus, "vec", dims = 64)
    Similarity.ivfSqTopK(queries, corpus, seeds, scales,
        nprobe = 4, shortlist = 20, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** BPE merge candidates: corpus-wide adjacent-character-pair counts
    * weighted by word frequency — the argmax is the pair a BPE trainer
    * merges next. The corpus collapses to its Zipf-bounded vocabulary
    * before any character work happens. */
  private[graft] def bpePairCountsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.bpePairCounts(Tables.documents(s, dir), "text", topK = 50)
  }

  /** Deterministic stratified sample: a pure map-side hash-threshold
    * filter (Curation.hashSample) — no sort, no shuffle, same rows on
    * every engine/run; stratification is free by hash uniformity. */
  private[graft] def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.hashSample(Tables.documents(s, dir), col("doc_id"), permille = 200)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Per-domain cap via the bounded graft_topk heap: ≤15 best docs
    * (n_chars DESC, doc_id) per source survive; the exchange carries
    * at most 15 entries per (partition, source), never whole domains. */
  private[graft] def domainCapQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.domainCap(Tables.documents(s, dir),
        "source", col("n_chars"), "doc_id", cap = 15)
      .orderBy(col("source"), col("rank"))
  }

  /** Gopher-style repetition quality signals per document. */
  private[graft] def repetitionSignalsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.repetitionSignals(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** PII redaction scan: deterministic synthetic emails/IPs are
    * injected into every 5th doc (the corpus has none — the same
    * concat runs in the oracle), then redacted; per-source counts and
    * a folded checksum of the redacted text prove byte-identical
    * replacement. */
  private[graft] def piiRedactScan(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    val injected = Tables.documents(s, dir).withColumn("text2",
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com at 10.0."),
            (col("doc_id") % 200).cast("string"), lit(".77")))
          .otherwise(lit(""))))
    injected
      .select(col("source"),
        Curation.emailCount(col("text2")).as("em"),
        Curation.ipv4Count(col("text2")).as("ip"),
        (TextDedup.md5Hash60(Curation.redactPii(col("text2"))) % 1048576L).as("ck"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("em")).as("n_emails"),
        sum(col("ip")).as("n_ips"), sum(col("ck")).as("redacted_checksum"))
      .orderBy(col("source"))
  }

  /** Bucketed range join: events falling in the 10 busiest 90-minute
    * windows. The interval side explodes to hour buckets and the join
    * is a hash equi-join on bucket + exact range filter — never the
    * broadcast nested loop Spark plans for a raw band join. The top-10
    * window over hourly counts sorts |hours| rows (tiny), not events. */
  private[graft] def rangeJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RangeJoin
    val ev = Tables.events(s, dir)
    val hours = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    // global top-10 as TakeOrdered (per-partition heap, no
    // single-partition window sort of every hour row)
    val top = hours.orderBy(col("n").desc, col("h")).limit(10)
      .select(col("h").as("w_start"),
        (col("h") + expr("INTERVAL 90 MINUTES")).as("w_end"))
    RangeJoin.bucketed(ev, "ts", top, "w_start", "w_end", bucketSeconds = 3600L)
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("n_users"))
      .orderBy(col("window_start"))
  }

  /** Incremental near-dup: the "new batch" (doc_id % 10 >= 8, ~20%)
    * probes the corpus index (the other 80%) through refined LSH band
    * keys — candidates are new×index only (never new×new or
    * index×index), then the exact Jaccard gate keeps ≥ 0.5. The
    * continuous-crawl shape: at 100 TB the index side is a persisted
    * (band, key) → id table and only the new batch computes
    * signatures. */
  /** Blocklist term gate (q269): exact per-doc blocklist density in
    * ppm + the gate verdict; the three terms are corpus-vocab words so
    * the fixture exercises real hits at sf0.01. */
  private[graft] def blocklistGateQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.blocklistGate(
        Tables.documents(s, dir), "doc_id", "text",
        blocklist = Seq("slow", "dup", "merge"), maxHitPpm = 80000L)
      .orderBy(col("doc_id"))

  /** Conformal quality-gate calibration (q272): per-language keep-30%
    * threshold on n_chars from the md5 calibration half, coverage
    * audited on the evaluation half. */
  private[graft] def conformalThresholdQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.conformalThreshold(
        Tables.documents(s, dir), "lang", "doc_id", col("n_chars"),
        keepPpm = 300000L)
      .orderBy(col("lang"))

  private[graft] def lshIncrementalProbe(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.lshProbeIndex(Tables.documents(s, dir), "doc_id", "text",
        isNew = col("doc_id") % 10 >= 8, minJaccard = 0.5)
      .orderBy(col("new_id"), col("dup_of"))
  }

  /** The whole dedup pipeline as one dataset operator: exact dedup →
    * LSH candidates → exact-Jaccard verify → components → keep one doc
    * per cluster. This is THE headline curation op — what a training
    * corpus actually runs. Oracle: recursive-CTE closure over the same
    * gated edge set, anti-joined back. */
  private[graft] def nearDupDedupDataset(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.nearDupDedup(Tables.documents(s, dir), "doc_id", "text",
        minJaccard = 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Corpus snapshot diff (q98): two snapshots derived
    * deterministically from the fixture — the OLD snapshot drops
    * doc_id % 10 = 3, the NEW snapshot drops doc_id % 10 = 7 and
    * rewrites the text of doc_id % 10 = 5 — then the digest-compare
    * full-outer join classifies every id. Non-`unchanged` rows only:
    * the diff's consumers (re-embed, re-dedup, index maintenance)
    * never want the unchanged bulk. */
  private[graft] def snapshotDiffQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    val d = Tables.documents(s, dir)
    val oldSnap = d.filter(col("doc_id") % 10 =!= 3)
    val newSnap = d.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .filter(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))
  }

  /** Matryoshka truncated-dim retrieval (q99): brute cosine top-5 in
    * the first 16 of 64 dimensions, each hit flagged against the
    * full-dim top-5 — the MRL cheap-first-stage pattern with recall
    * evidence inline. */
  private[graft] def matryoshkaAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.matryoshkaTopK(queries, corpus, dims = 16, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Length-bucketed batch assembly (q100): pow-2 length buckets
    * [16, 512], 8-doc batches within (bucket, shard of 4), per-doc
    * padding waste — the batching layout that minimizes pad tokens
    * without a global sort. */
  private[graft] def lengthBucketQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    Curation.lengthBucketBatches(Tables.documents(s, dir), "doc_id",
        size(TextDedup.words(col("text"))), batchSize = 8, nShards = 4,
        minBucket = 16, maxBucket = 512)
      .orderBy(col("doc_id"))
  }

  /** Containment pairs (q101): doc-inside-doc detection over word
    * 3-gram sets — postings join with df cap 100, pairs whose larger
    * containment direction ≥ 30% (the fixture's docs are synthetic
    * permutations, so full quotations don't occur; the gate is set
    * where the shared-template tail is non-empty and the asymmetry
    * column shows what Jaccard would have hidden). */
  private[graft] def containmentQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, dfCap = 100, minPpm = 300000L)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Per-source score calibration (q102): token count re-expressed as
    * a within-source percentile (integer ppm), so one global threshold
    * treats terse and verbose sources fairly. */
  private[graft] def calibrateQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    Curation.calibrateScores(Tables.documents(s, dir), "doc_id", "source",
        size(TextDedup.words(col("text"))))
      .orderBy(col("doc_id"))
  }

  /** LSH index maintenance delta (q103): the q98 snapshot pair pushed
    * through digest diff → delta-only MinHash banding — del rows carry
    * the OLD text's keys, ins rows the NEW text's; unchanged docs
    * never reach the signature stage. */
  private[graft] def lshIndexDeltaQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val d = Tables.documents(s, dir)
    val oldSnap = d.filter(col("doc_id") % 10 =!= 3)
    val newSnap = d.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    TextDedup.lshIndexDelta(oldSnap, newSnap, "doc_id", "text")
      .orderBy(col("op"), col("id"), col("band"))
  }

  /** Signal correlation audit (q104): pairwise Pearson r between
    * doc-length signals (chars, tokens, distinct tokens) from one
    * integer-sum aggregation pass — the redundancy check run before
    * adding another quality filter to the gate. */
  private[graft] def signalCorrQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{TextAnalysis, TextDedup}
    TextAnalysis.signalCorrelations(Tables.documents(s, dir), Seq(
        "n_chars" -> col("n_chars"),
        "n_tokens" -> size(TextDedup.words(col("text"))),
        "n_distinct" -> size(array_distinct(TextDedup.words(col("text"))))))
      .orderBy(col("sig_a"), col("sig_b"))
  }

  /** Keep-best near-dup dedup (q105): the q57 pipeline with the
    * production keeper — per cluster, the highest-token-count doc
    * survives (tie → lowest id) instead of the lowest id. */
  private[graft] def nearDupKeepBestQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.nearDupDedupKeepBest(Tables.documents(s, dir), "doc_id", "text",
        quality = size(TextDedup.words(col("text"))), minJaccard = 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Contamination span audit (q106): q47's eval/corpus split
    * (doc_id < 20 = eval), word 3-grams; per corpus doc the longest
    * contiguous shared-gram run and its token span. */
  private[graft] def contaminationSpanQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val d = Tables.documents(s, dir)
    TextDedup.contaminationSpans(
        d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
        "doc_id", "text", n = 3)
      .filter(col("n_hit") > 0)
      .orderBy(col("doc_id"))
  }

  /** Fractional upsampling (q107): per-source targets at 0.5×/1.5×/
    * 2.5× of the source size (closed-form hash multiplier, the q90
    * stand-in pattern), applied as deterministic whole+fractional
    * repeats with a 0-based copy index. */
  private[graft] def upsampleQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    val docs = Tables.documents(s, dir)
    val targets = docs.groupBy(col("source").as("src"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_m", pmod(TextDedup.md5Hash60(col("src")), lit(3L)))
      .select(col("src"), expr("(_n * (2 * _m + 1)) div 2").as("target_n"))
    Curation.upsample(docs, "doc_id", "source", targets)
      .orderBy(col("doc_id"), col("copy"))
  }

  /** Zipf-law audit (q108): ln-ln least squares over the top-100
    * vocabulary of the documents corpus — one row of corpus-health
    * summary (slope ≈ the Zipf exponent). */
  private[graft] def zipfAuditQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.zipfAudit(Tables.documents(s, dir), "text", topK = 100)
  }

  /** Ranking metrics (q109): the q26 retriever pair — SRP-LSH top-10
    * graded against exact cosine top-10 as truth — through the generic
    * recall@k / reciprocal-rank evaluator. */
  private[graft] def rankingMetricsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", Similarity.signRandomProjection(col("embedding"), 64, 6))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("bucket"))
    val exact = Similarity.bruteForceTopK(
      queries.drop("qbucket"), corpus.drop("bucket"), k = 10)
    val lsh = Similarity.lshTopK(queries, corpus, k = 10)
    Similarity.rankingMetrics(exact, lsh, k = 10).orderBy(col("qid"))
  }

  /** Rare-token scrub (q110): tokens seen in fewer than 2 documents
    * masked to `<unk>`, docs reassembled; per-doc scrub accounting. */
  private[graft] def rareTokenScrubQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.rareTokenScrub(Tables.documents(s, dir), "doc_id", "text",
        minDocs = 2)
      .orderBy(col("doc_id"))
  }

  /** Centroid drift (q111): per-label cosine between the q98-style
    * OLD (vec_id%10≠3) and NEW (vec_id%10≠7) snapshot centroids of the
    * embeddings table — membership churn is the drift source. */
  private[graft] def centroidDriftQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    Similarity.centroidDrift(
        e.filter(col("vec_id") % 10 =!= 3), e.filter(col("vec_id") % 10 =!= 7),
        "label", "embedding")
      .orderBy(col("grp"))
  }

  /** Duplicated-span scrub (q112): Lee-et-al-style exact-substring
    * dedup REMOVAL over the documents corpus — token runs covered by
    * cross-document 5-gram duplicates disappear, docs reassembled;
    * per-doc removal accounting. */
  private[graft] def dupSpanScrubQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.dupSpanScrub(Tables.documents(s, dir), "doc_id", "text",
        n = 5, minDocs = 2)
      .orderBy(col("doc_id"))
  }

  /** DSIR importance weights (q113): the `lang = 'en'` slice as the
    * target distribution, the full documents corpus as raw — per-doc
    * integer micro-nat log-likelihood ratios under hashed-unigram
    * models, keep = sign test. */
  private[graft] def dsirWeightsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(s, dir)
    TextAnalysis.dsirWeights(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 1024)
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity bucketing (q114): per-language unigram
    * surprisal percentiles cut into head/middle/tail thirds (head =
    * lowest surprisal — the slice CCNet keeps). Composition of K34
    * surprisal and K71 calibration; the bucket rule is pure integer
    * arithmetic on the ppm percentile. */
  private[graft] def ccnetBucketsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis}
    val docs = Tables.documents(s, dir)
    val sur = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
    val withLang = sur
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    Curation.calibrateScores(withLang, "doc_id", "lang", col("mean_micro"))
      .withColumn("bucket",
        when(col("pct_ppm") * 3 < 1000000L, lit("head"))
          .when(col("pct_ppm") * 3 < 2000000L, lit("middle"))
          .otherwise(lit("tail")))
      .orderBy(col("doc_id"))
  }

  /** Token-budget selection (q115): greedy prefix by hashed quality
    * score under a 15k-token budget — the distributed-prefix-sum cut
    * (score histogram + within-score windows; no global sort). */
  private[graft] def budgetSelectQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis}
    val scored = TextAnalysis.hashedQualityScore(
      Tables.documents(s, dir), "doc_id", "text", buckets = 1024)
    Curation.budgetSelect(scored, "doc_id", "score", "n_tokens",
        budget = 15000L)
      .orderBy(col("doc_id"))
  }

  /** Leakage-safe split (q116): near-dup-aware 80/10/10 train/val/test
    * assignment over the documents corpus — byte-identical copies and
    * near-dup cluster members always share a split. */
  private[graft] def leakageSplitQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.leakageSafeSplit(Tables.documents(s, dir), "doc_id", "text",
        valPpm = 100000L, testPpm = 100000L)
      .orderBy(col("doc_id"))
  }

  /** Embedding centroid outliers (q117): per-vector cosine to its own
    * label centroid, flagged below 0.0 — the cluster-coherence audit
    * over the embeddings table. */
  private[graft] def centroidOutliersQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    Similarity.centroidOutliers(Tables.embeddings(s, dir), "vec_id", "label",
        "embedding", minCos = 0.0)
      .orderBy(col("id"))
  }

  /** Char-class signals (q118): letter/digit/space/symbol ppm shares
    * over the events table's JSON props strings (the column with real
    * structural spread — braces, quotes, digits) — one codegen'd
    * map-side projection, no shuffle. */
  private[graft] def charClassQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.charClassSignals(
        Tables.events(s, dir).select(col("event_id"), col("props")),
        "event_id", "props")
      .orderBy(col("doc_id"))
  }

  /** Template grams (q119): top-3 most frequent word 3-grams per
    * source with ppm share — the crawl-boilerplate audit. */
  private[graft] def templateGramsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.templateGrams(Tables.documents(s, dir), "source", "text",
        n = 3, topK = 3)
      .orderBy(col("source"), col("rank"))
  }

  /** Funnel (q120): strict first-touch ordered funnel signup → view →
    * click → purchase over the events stream — one per-user min-rollup,
    * then a steps-row aggregate (Analytics.funnel). */
  private[graft] def funnelQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .orderBy(col("step_idx"))
  }

  /** Cohort retention (q121): users grouped by first-activity day,
    * counted per later-day offset 0..14 — the retention triangle. */
  private[graft] def cohortRetentionQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.cohortRetention(Tables.events(s, dir), "user_id", "ts",
        maxOffsetDays = 14)
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  /** Markov transition matrix (q122): per-user event-type bigrams with
    * exact integer row-conditional probability in ppm. */
  private[graft] def transitionMatrixQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.transitionMatrix(Tables.events(s, dir), "user_id", "ts",
        "event_type", "event_id")
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Trailing z-score anomalies (q123): per-(event_type, day) counts
    * scored against the previous 7 present days (strictly before). */
  private[graft] def trailingZscoreQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.trailingZscore(Tables.events(s, dir), "ts", "event_type",
        window = 7)
      .orderBy(col("key"), col("day"))
  }

  /** Co-occurrence top-k (q124): market-basket item-item cosine over
    * (order, part) baskets, mega-baskets (>8 items) dropped whole. */
  private[graft] def coOccurrenceQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.coOccurrenceTopK(Tables.lineitem(s, dir), "l_orderkey",
        "l_partkey", maxBasket = 8, topK = 20)
  }

  /** Data profile (q125): per-column rows/nulls/distincts/min/max over
    * the documents table (all-integer-and-varchar — no cross-engine
    * float/timestamp string-cast hazards). */
}
