package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import TextDedup.{md5Hash60, wordSet, words}

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. Integer
  * arithmetic wherever a ratio would otherwise be a float (cross-engine
  * FP determinism), pure column expressions throughout.
  */
object TextAnalysis {

  /** Marker-word lists per language (n-gram-heuristic language ID).
    * Order is the tie-break priority. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "zhe", "he", "bu"))

  private def markerArray(ws: Seq[String]): Column =
    array(ws.map(lit): _*)

  /** Distinct marker hits for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(wordSet(text), markerArray(markers)))

  /** Predicted language: argmax of marker hits, ties broken by the
    * declared priority order; no hits at all → "und" (undetermined). */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ws) => l -> langScore(text, ws) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Total (with multiplicity) hits of any marker in `markers`. */
  def stopwordCount(text: Column, markers: Seq[String]): Column =
    size(filter(words(text), w => array_contains(markerArray(markers), w)))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword count: ceil(len/4) per word, integer math. */
  def subwordCount(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => acc + ((length(w) + 3) / 4).cast(LongType))

  /** High-quality gate: ≥ minWords tokens AND stopword ratio ≥ 10%
    * (integer-compare form — no float ratios). */
  def highQuality(text: Column, minWords: Int = 50): Column =
    tokenCount(text) >= minWords &&
      stopwordCount(text, langMarkers.head._2) * 10 >= tokenCount(text)

  /** Document fingerprints: bottom word-hash (MinHash@1), a folded
    * 20-bit hash sum over the word set, and a polynomial rolling hash
    * over the first 8 words (mod 1e9+7). */
  def fingerprintMin(text: Column): Column =
    array_min(transform(wordSet(text), w => md5Hash60(w)))

  def fingerprintSum(text: Column): Column =
    aggregate(wordSet(text), lit(0L), (acc, w) => acc + (md5Hash60(w) % 1048576L))

  def fingerprintRolling(text: Column, k: Int = 8): Column =
    aggregate(slice(words(text), 1, k), lit(0L),
      (acc, w) => (acc * 31L + (md5Hash60(w) % 1000000007L)) % 1000000007L)

  /** TF-IDF top terms per group (corpus-characterization / curation:
    * "what is this language/source slice actually about").
    *
    * Scale shape: term frequencies reduce map-side (the shuffle carries
    * (group, term) partials, never token streams); document frequencies
    * aggregate to one row per DISTINCT TERM — vocabulary-sized, orders
    * of magnitude smaller than the corpus — so the df side broadcasts
    * into the score join and the big tf side never re-shuffles. The
    * final top-k sorts only |group| × |vocab| score rows.
    *
    * Determinism: scores are `round(tf * ln(N/df), 6)` (double math
    * identical in the DuckDB mirror), ranked by (score DESC, term). */
  def tfIdfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NO spread here (round-16 quiet-box interleaved A/B, 3 JVM pairs:
    // spread 0.88s vs revert 0.80s min-of-3): the downstream aggregation is
    // token-keyed, so the doc-keyed exchange is never reused and ships
    // corpus text for nothing - the round-15 artifact's regression was
    // real, not contention.
    val tokens = docs
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        explode(words(col(textCol))).as("term"))
    val tf = tokens.groupBy(col("grp"), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = tokens.groupBy(col("term")).agg(countDistinct(col("id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfc), Seq("term")).crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col("grp")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= topK)
      .select(col("grp"), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Unigram surprisal scoring — the cheap proxy for perplexity
    * filtering: score each document by the mean negative log-probability
    * of its tokens under the corpus's OWN unigram distribution. Low
    * surprisal ≈ templated/common text, high ≈ rare-token noise; both
    * tails get inspected or dropped in real pipelines.
    *
    * Determinism across engines: per-token surprisal is quantized to
    * integer MICRO-nats (round(-ln(p)·1e6) as BIGINT) before the
    * per-document sum — integer addition commutes, so partition order
    * cannot flip a rounded double the way summing raw doubles could.
    * Residual theoretical hazard (accepted, consistent with the
    * repo-wide round(x,6) practice): -ln(p) itself comes from two libm
    * implementations (java.lang.Math.log here, the oracle engine's ln
    * there); a value within ~1 ulp of a .5 micro-nat boundary could
    * round to different integers. p is always ratio-of-small-integers
    * on the fixture, so no such boundary value has been observed.
    *
    * Shape at 100 TB: the token stream aggregates once to the
    * Zipf-bounded vocabulary; the stream then joins the BROADCAST vocab
    * (the q45 tf-idf shape) and collapses to one row per doc —
    * map-side partials all the way. */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NO spread here (round-16 quiet-box interleaved A/B, 3 JVM pairs:
    // spread 1.01s vs revert 0.68s min-of-3): the downstream aggregation is
    // token-keyed, so the doc-keyed exchange is never reused and ships
    // corpus text for nothing - the round-15 artifact's regression was
    // real, not contention.
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("t"))
      .filter(col("t") =!= "")
    val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("n_w"))
    val total = vocab.agg(sum(col("n_w")).as("n_total"))
    toks.join(broadcast(vocab), Seq("t"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(-log(col("n_w").cast("double") / col("n_total").cast("double")) * 1e6)
          .cast(LongType).as("s_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_micro")).as("surprisal_micro"))
      // integer `div`, not a double `/` + cast: a double quotient can
      // land a hair under an integer and truncate differently than the
      // oracle's `//`
      .select(col("doc_id"), col("n_tokens"), col("surprisal_micro"),
        expr("surprisal_micro div n_tokens").as("mean_micro"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169,
    * "Data Selection for Language Models via Importance Resampling"):
    * score each raw document by how much more likely its tokens are
    * under a TARGET corpus's hashed-unigram distribution than under
    * the raw corpus's own — the log-likelihood-ratio feature DSIR
    * resamples by. Tokens hash into `buckets` feature buckets (hashed
    * n-gram features are the paper's device for keeping the model
    * finite); both distributions are add-one smoothed over the full
    * bucket space, so unseen buckets are defined on both sides.
    *
    * Determinism: the per-BUCKET log ratio
    * `round(ln(p_tgt(b)/p_raw(b))·1e6)` quantizes to an integer
    * micro-nat BEFORE any per-doc sum ([[unigramSurprisal]]'s
    * contract), so doc scores are exact integer sums; the accepted
    * ~1-ulp libm caveat applies only to the B bucket weights. The
    * keep verdict is a sign test on the integer sum — no integer
    * division of negatives (Spark `div` truncates, DuckDB `//`
    * floors; the sign test sidesteps the mismatch entirely).
    *
    * Shape at 100 TB: both corpora collapse to B-row bucket-count
    * relations via map-side partial counts; the weight table is B
    * rows (1024 default) — broadcast by construction, not by hope —
    * and the raw corpus then streams through one broadcast join and
    * one per-doc rollup. Nothing corpus-sized shuffles except the
    * doc-keyed partial sums. */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def toks(d: DataFrame): DataFrame = graft.util.Spread.byKey(d, col(idCol))
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .select(col("doc_id"),
        pmod(md5Hash60(col("t")), lit(buckets.toLong)).as("b"))
    val rawToks = toks(raw)
    val rc = rawToks.groupBy(col("b")).agg(count(lit(1)).as("n_raw"))
    val tc = toks(target).groupBy(col("b")).agg(count(lit(1)).as("n_tgt"))
    val byBucket = rc.join(tc, Seq("b"), "full")
      .select(col("b"), coalesce(col("n_raw"), lit(0L)).as("n_raw"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"))
    val totals = byBucket
      .agg(sum(col("n_raw")).as("t_raw"), sum(col("n_tgt")).as("t_tgt"))
    val weights = byBucket.crossJoin(broadcast(totals))
      .select(col("b"),
        round(log(
          ((col("n_tgt") + 1).cast("double") /
            (col("t_tgt") + buckets).cast("double")) /
            ((col("n_raw") + 1).cast("double") /
              (col("t_raw") + buckets).cast("double"))) * 1e6)
          .cast(LongType).as("w_micro"))
    rawToks
      .join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("w_micro")).as("logratio_micro"))
      .withColumn("keep", col("logratio_micro") >= 0)
  }

  /** BPE merge-candidate counting — step 1 of byte-pair-encoding
    * tokenizer training: corpus-wide frequencies of adjacent CHARACTER
    * pairs inside words, weighted by word frequency. The top pair is
    * what a BPE trainer would merge next.
    *
    * Shape at 100 TB: the corpus collapses to its VOCABULARY first
    * (one word-sized shuffle, Zipf-bounded — a trillion tokens is a
    * few million distinct words), and pair explosion runs over the
    * vocab, not the corpus, so per-word character work happens once no
    * matter how often the word occurs. Top-k is a per-partition heap
    * (TakeOrdered), never a full sort. */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    // spread before the token explode (keyed on the text itself — the
    // vocab rollup has no doc key; see util.Spread)
    val vocab = graft.util.Spread.byKey(docs, col(textCol))
      .select(explode(words(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    vocab
      .select(col("n"), explode(
        when(length(col("word")) >= 2,
          transform(sequence(lit(1), length(col("word")) - 1),
            i => col("word").substr(i, lit(2))))
          .otherwise(array())).as("pair"))
      .groupBy(col("pair")).agg(sum(col("n")).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("pair"))
      .limit(topK)
  }

  /** Winnowing fingerprints (the MOSS algorithm, Schleimer–Wilkerson–
    * Aiken SIGMOD'03): hash every word k-gram, slide a w-hash window,
    * keep each window's MINIMUM hash — the selected set is a robust
    * substring fingerprint with the guarantee that any shared run of
    * ≥ w+k−1 words between two documents shares at least one
    * fingerprint. The plagiarism-detector primitive, and the
    * robust middle ground between K9's whole-doc rolling fingerprint
    * and K50's every-gram statistics (winnowing stores ~1/w of the
    * grams for the same detection floor). Set semantics per doc
    * (distinct mins — the classic density argument; position lists are
    * a trivial extension the fixture doesn't need).
    *
    * Per doc: gram count, window count, fingerprint count, and how
    * many of its fingerprints appear in ≥ 1 OTHER document (the
    * cross-doc overlap signal). Docs shorter than k words have no
    * gram and emit no row; docs with fewer than w grams form ONE
    * window over what exists.
    *
    * Scale shape: grams and windows live inside one map-only
    * transform chain (arrays never leave their row); only the
    * fingerprint SET explodes — ~m/w hashes per doc — into the
    * shared-set aggregation (distinct-doc-count ≥ 2, the K49/K50
    * rollup shape) and one rejoin. */
  def winnowingFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val ws = words(col(textCol))
    val m = size(ws) - (k - 1)
    // sequence() runs DESCENDING when its upper bound goes negative
    // (docs shorter than k words), handing slice() a 0 start — clamp
    // the bound; the n_grams >= 1 filter below discards those rows
    // regardless of what the clamped expression computed for them
    val gh = transform(sequence(lit(0), greatest(m, lit(1)) - 1),
      i => md5Hash60(array_join(slice(ws, i + 1, lit(k)), " ")))
    // LOAD-BEARING EXCHANGE (the pqEncode lesson, quadratic edition):
    // a lambda body re-evaluates every expression it references PER
    // ELEMENT, and CollapseProject would inline the gh alias straight
    // into the window lambda below — m md5 digests × m windows = O(m²)
    // digests per document (observed: minutes at sf0.1 where the fixed
    // plan takes seconds). The repartition materializes the m-hash
    // array once per row; the window pass then reads an attribute.
    val hashed = docs
      .select(col(idCol).as("doc_id"), m.cast(LongType).as("n_grams"),
        gh.as("_gh"))
      .filter(col("n_grams") >= 1)
      .repartition(col("doc_id"))
    val nWin = greatest(col("n_grams") - (w - 1), lit(1L))
    val base = hashed
      .select(col("doc_id"), col("n_grams"), nWin.as("n_windows"),
        array_distinct(transform(sequence(lit(0L), nWin - 1),
          j => array_min(slice(col("_gh"), (j + 1).cast("int"), lit(w)))))
          .as("_fps"))
    // explode_OUTER, deliberately: plain explode makes
    // InferFiltersFromGenerate add a `size(_fps) > 0` guard, which
    // predicate pushdown then drags below the exchange — re-inlining
    // the whole fps expression (inner m-digest transform included)
    // into a per-row Filter and resurrecting the O(m²) plan the
    // exchange exists to prevent. _fps is non-empty for every
    // surviving row (n_grams >= 1 ⇒ at least one window), so outer
    // explode is value-identical and gets no inferred filter.
    val fp = base.select(col("doc_id"), explode_outer(col("_fps")).as("fp"))
    val shared = fp.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= 2)
      .select(col("fp"))
    val sharedPerDoc = fp.join(shared, Seq("fp"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared_fp"))
    base
      .select(col("doc_id"), col("n_grams"), col("n_windows"),
        size(col("_fps")).cast(LongType).as("n_fp"))
      .join(sharedPerDoc, Seq("doc_id"), "left")
      .withColumn("n_shared_fp", coalesce(col("n_shared_fp"), lit(0L)))
  }

  /** Bigram surprisal scoring — [[unigramSurprisal]] upgraded one
    * Markov order: each document scores by the mean negative
    * log-CONDITIONAL-probability of its token bigrams under the
    * corpus's own MLE bigram model, P(w2|w1) = c(w1 w2)/c(w1·) with
    * c(w1·) counting bigram CONTEXTS (occurrences of w1 followed by
    * anything — a doc's last token is no context), so probabilities
    * sum to exactly 1 per context and no smoothing is needed: every
    * scored bigram occurs in the corpus at least once by construction.
    * Bigram surprisal separates "common words in a weird order" from
    * "common words in a common order" — the signal unigram surprisal
    * is blind to.
    *
    * Determinism: the q67 micro-nat contract — round(-ln(p)·1e6) per
    * bigram BEFORE the integer per-doc sum; same accepted ~1-ulp libm
    * caveat. Shape at 100 TB: the bigram stream collapses to the
    * bigram vocabulary first, the context relation is a second rollup
    * OF THE VOCABULARY (not the corpus), and the doc stream equi-joins
    * the model with NO forced broadcast — the K34/K41 shape one order
    * up, except the model side is only Zipf-ish (quadratic in the
    * unigram vocab at worst), so the join strategy is left to AQE. */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    // NO spread here (round-16 quiet-box interleaved A/B, 3 JVM pairs:
    // spread 1.23s vs revert 0.87s min-of-3): the downstream aggregation is
    // token-keyed, so the doc-keyed exchange is never reused and ships
    // corpus text for nothing - the round-15 artifact's regression was
    // real, not contention.
    val bi = docs
      .select(col(idCol).as("doc_id"), ws.as("_ws"), size(ws).as("_nw"))
      .filter(col("_nw") >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("_nw") - 2),
          i => struct(element_at(col("_ws"), i + 1).as("w1"),
            element_at(col("_ws"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bigrams = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val contexts = bigrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val model = bigrams.join(contexts, Seq("w1"))
      .select(col("w1"), col("w2"),
        round(-log(col("c12").cast("double") / col("c1").cast("double")) * 1e6)
          .cast(LongType).as("s_micro"))
    // NO broadcast hint, deliberately (the r5 unbounded-hint rule): the
    // unigram vocab (K34) is Zipf-bounded tightly enough to pin, but
    // the BIGRAM vocabulary grows ~quadratically in it and can outgrow
    // any broadcast ceiling at 100 TB — AQE broadcasts it while it
    // fits and degrades to a shuffle join when it doesn't
    bi.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s_micro")).as("surprisal_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("surprisal_micro"),
        expr("surprisal_micro div n_bigrams").as("mean_micro"))
  }

  /** [[hashedQualityScore]] as a STATELESS map-only column transform:
    * the per-doc token fold runs inside an `aggregate` higher-order
    * function over the words array instead of explode + groupBy, so
    * there is NO shuffle and NO aggregation state — the form a
    * STREAMING curation gate needs (stateless operators stream with
    * no watermark, no state store, no output-mode constraints).
    * Identical numbers to the batch form (spec-asserted equal).
    *
    * The tradeoff, stated honestly: Spark's higher-order functions
    * evaluate their lambda interpreted per element, outside
    * whole-stage codegen, while the explode+agg form is codegen'd end
    * to end — so the BATCH pipeline keeps the explode form and this
    * one exists for streaming and for map-only contexts where a
    * shuffle is worth more than per-row lambda overhead. Emits
    * (doc_id, n_tokens, score, keep); docs with no tokens are dropped
    * (the explode form's implicit contract). */
  def hashedQualityScoreMapOnly(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = filter(words(col(textCol)), t => t =!= "")
    def weight(t: Column): Column =
      pmod(pmod(md5Hash60(t), lit(buckets.toLong)) * lit(2654435761L),
        lit(2001L)) - lit(1000L)
    docs
      .select(col(idCol).as("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + weight(t)).as("score"))
      .filter(col("n_tokens") > 0)
      .withColumn("keep", col("score") >= 0)
  }

  /** Character-class signal battery — per row, the integer-ppm share
    * of letters, digits, whitespace, and symbols (everything else),
    * plus bracket/punctuation density and a thresholded `codey` flag:
    * the cheap structural complement to word-level quality signals
    * that code-vs-prose and blob-vs-text filters cut on. Counts come
    * from codegen'd `regexp_replace` length deltas — no explode, no
    * shuffle, one map-side pass; the whole operator is a projection.
    *
    * All ratios are exact integer ppm (`cnt·10⁶ div n_chars`); empty
    * strings are dropped ([[charEntropy]]'s contract). The `codey`
    * flag is `bracket_ppm >= bracketPpmMin OR symbol_ppm >=
    * symbolPpmMin` — thresholds are parameters because the right cut
    * is corpus-dependent; the defaults mark heavy-markup rows. */
  /** HTML → text extraction — the first stage every web-crawl corpus
    * runs before any quality/dedup signal: script and style blocks
    * drop WITH their content, comments and tags drop, the six
    * ubiquitous entities unescape (amp LAST, so double-escaped
    * `&amp;lt;` correctly yields `&lt;`, one level per pass — the
    * HTML spec's unescape order), and whitespace collapses to single
    * spaces. Pure codegen'd regexp chain (inline `(?is)` flags work
    * identically in Java regex and RE2, so the DuckDB oracle mirrors
    * bit-for-bit); a real extractor adds DOM-aware block handling,
    * but the regexp ladder IS the shape production strippers use for
    * the 99% path. Map-only, zero corpus state. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val ent = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) => regexp_replace(c, k, v) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  def charClassSignals(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bracketPpmMin: Long = 20000L,
      symbolPpmMin: Long = 150000L): DataFrame = {
    val t = col("_t")
    def cnt(re: String): Column =
      (length(t) - length(regexp_replace(t, re, ""))).cast(LongType)
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("_t"))
      .filter(length(t) > 0)
      .select(col("doc_id"), length(t).cast(LongType).as("n_chars"),
        cnt("[A-Za-z]").as("_l"), cnt("[0-9]").as("_d"),
        cnt("\\s").as("_w"), cnt("[\\[\\]{}()<>;]").as("_b"))
      .select(col("doc_id"), col("n_chars"),
        expr("_l * 1000000 div n_chars").as("letter_ppm"),
        expr("_d * 1000000 div n_chars").as("digit_ppm"),
        expr("_w * 1000000 div n_chars").as("space_ppm"),
        expr("(n_chars - _l - _d - _w) * 1000000 div n_chars").as("symbol_ppm"),
        expr("_b * 1000000 div n_chars").as("bracket_ppm"))
      .withColumn("codey",
        col("bracket_ppm") >= bracketPpmMin ||
          col("symbol_ppm") >= symbolPpmMin)
  }

  /** Per-source template-gram detection — for each source, the topK
    * most frequent word n-grams with occurrence counts and the
    * integer-ppm share of that source's total gram instances: the
    * boilerplate audit that finds crawl templates ("click here to
    * subscribe…") before they dominate a mixture. [[bpePairCounts]]'
    * Zipf argument does NOT apply here — the ranking is per source
    * over full n-grams — so gram TEXT crosses the wire once, as its
    * own grams (the [[TextDedup.lineDedup]] adjudication), and the
    * per-source ranking is a hash-partitioned window over the
    * (source, gram) count relation, which is vocabulary-sized, not
    * corpus-sized. Ties break lexicographically on the gram (both
    * engines compare ASCII byte-wise). */
  def templateGrams(
      docs: DataFrame,
      srcCol: String,
      textCol: String,
      n: Int = 3,
      topK: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ws = words(col(textCol))
    val grams = docs
      .select(col(srcCol).as("source"), ws.as("_ws"), size(ws).as("_nw"))
      .filter(col("_nw") >= n)
      .select(col("source"),
        explode(transform(sequence(lit(0), col("_nw") - n),
          i => array_join(slice(col("_ws"), i + 1, lit(n)), " "))).as("gram"))
    val counts = grams.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("n_occ"))
    val totals = grams.groupBy(col("source")).agg(count(lit(1)).as("_tot"))
    val bySrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_occ").desc, col("gram"))
    counts
      .withColumn("rank", row_number().over(bySrc).cast(LongType))
      .filter(col("rank") <= topK)
      .join(totals, Seq("source"))
      .select(col("source"), col("rank"), col("gram"), col("n_occ"),
        expr("n_occ * 1000000 div _tot").as("share_ppm"))
  }

  /** Character-distribution Shannon entropy per document — the
    * model-free randomness signal quality pipelines pair with
    * repetition (K25) and surprisal (K34): near-zero entropy flags
    * single-character runs and trivially templated text, abnormally
    * high entropy flags base64/hex blobs and binary spill.
    *
    * Determinism: the same micro-nat contract as [[unigramSurprisal]]
    * — per distinct character, `round(-ln(c/n)·1e6)` quantizes to an
    * integer BEFORE the weighted sum, and the per-doc entropy is the
    * exact integer `Σ cnt·term_micro div n` (floor division; both
    * engines floor identically on non-negative integers). Same ~1-ulp
    * libm boundary caveat as q67, same acceptance.
    *
    * Shape at 100 TB: the WHOLE computation stays inside the doc's
    * own row — the native [[graft.functions.CharEntropy]] expression
    * (registered as `graft_char_entropy`) sorts the document's code
    * points in a primitive int array and scans the runs once: no
    * shuffle, no window, no per-character row, no Generate at ALL.
    * q82 is a pure scan→project, the K61 stateless-scorer shape. The
    * compiled pass replaced both the per-char
    * `explode(sequence…substr(i,1))` plan (one row per corpus
    * character, O(i) substr) and an interpreted-HOF fold that
    * measured SLOWER at sf0.1 (len×alphabet lambda evaluations).
    * No corpus-wide state exists at all (unlike surprisal's vocab
    * broadcast). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col("doc_id"),
        call_function("graft_char_entropy", col("_t")).as("e"))
      .select(col("doc_id"),
        col("e").getField("n_chars").as("n_chars"),
        col("e").getField("n_distinct").as("n_distinct"),
        col("e").getField("entropy_micro").as("entropy_micro"))

  /** Hashed-feature linear quality scorer — the PLUMBING of a
    * fastText-style model-based quality filter (the pipeline stage
    * CCNet/GPT-3-era corpora used), with the learned weight vector
    * replaced by a deterministic function of the feature bucket so a
    * SQL oracle reproduces scores exactly. The Spark shape is the real
    * one: token → hash-bucket (feature hashing, Weinberger et al. '09),
    * bucket → weight lookup, per-doc integer sum, threshold verdict.
    * Swapping in trained weights means broadcasting a `buckets`-row
    * weight table and joining on bucket — identical plan, and the
    * deterministic weight here IS that table expressed as a closed
    * form: w(b) = (b·2654435761) mod 2001 − 1000 ∈ [−1000, 1000]
    * (Knuth multiplicative hash, all-integer).
    *
    * Output: (doc_id, n_tokens, score, mean_milli, keep) with
    * `score = Σ w(bucket(token))`, `mean_milli = trunc(score·1000 /
    * n_tokens)`, keep = score ≥ 0. All-integer → bit-exact on every
    * engine. Because `score` can be NEGATIVE, the division rule
    * matters for the first time in this repo: both Spark's `div` and
    * DuckDB's integer `//` TRUNCATE TOWARD ZERO (verified empirically:
    * -592000 // 83 = -7132, not the floor -7133), so plain `div`
    * matches — a floor-division oracle engine would need the
    * (a − pmod(a,b))/b form instead.
    *
    * Shape at 100 TB: hash + weight are map-side column math (no
    * vocab, no model state, nothing broadcast); the only shuffle is
    * the by-doc rollup with map-side partials. */
  def hashedQualityScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("t"))
      .filter(col("t") =!= "")
    val bucket = pmod(md5Hash60(col("t")), lit(buckets.toLong))
    val weight = pmod(bucket * lit(2654435761L), lit(2001L)) - lit(1000L)
    toks
      .select(col("doc_id"), weight.as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        expr("score * 1000 div n_tokens").as("mean_milli"),
        (col("score") >= 0).as("keep"))
  }

  /** Pairwise Pearson correlation between per-document INTEGER quality
    * signals — the audit that tells a curation pipeline which of its
    * filters are redundant (two signals at r ≈ 1 gate the same docs)
    * and which genuinely add information. One aggregation pass
    * accumulates every sum (n, Σx, Σx² per signal, Σxy per pair) as
    * EXACT integers with map-side combine — the corpus is read once
    * regardless of how many signals are audited — and the closed-form
    * `(nΣxy − ΣxΣy) / √((nΣx²−Σx²)(nΣy²−Σy²))` evaluates in double on
    * the single result row (identical expression tree on both engines,
    * so round(·,6) matches exactly). Zero-variance signals yield NULL,
    * not a division error. Output: one row per unordered pair. */
  def signalCorrelations(
      docs: DataFrame,
      signals: Seq[(String, Column)]): DataFrame = {
    require(signals.size >= 2,
      s"need at least 2 signals, got ${signals.size}")
    val base = docs.select(signals.map { case (nm, c) =>
      c.cast(LongType).as(nm) }: _*)
    val names = signals.map(_._1)
    val sumAggs =
      names.flatMap { a =>
        Seq(sum(col(a)).as(s"s_$a"), sum(col(a) * col(a)).as(s"ss_$a"))
      } ++
      names.combinations(2).map { case Seq(a, b) =>
        sum(col(a) * col(b)).as(s"sp_${a}_$b")
      }.toSeq
    val agg = base.agg(count(lit(1)).as("n"), sumAggs: _*)
    val pairRows = names.combinations(2).map { case Seq(a, b) =>
      val n = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val cov = n * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val va = n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vb = n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      struct(lit(a).as("sig_a"), lit(b).as("sig_b"),
        when(va * vb > 0, round(cov / sqrt(va * vb), 6))
          .otherwise(lit(null).cast("double")).as("corr"))
    }.toSeq
    agg.select(explode(array(pairRows: _*)).as("p")).select(col("p.*"))
  }

  /** Zipf-law audit: least-squares fit of `ln freq ~ ln rank` over the
    * top-`topK` vocabulary — the corpus-health check run before
    * trusting token statistics (natural text slopes near −1;
    * template/boilerplate-heavy or spam corpora bend visibly away).
    * Returns one row: term count, slope (the Zipf exponent),
    * intercept (natural-log units), and r² of the fit.
    *
    * Determinism: ln(rank) and ln(freq) quantize to integer micro-nats
    * (q67's contract) BEFORE the regression sums, so Σx/Σy/Σxx/Σyy/Σxy
    * are exact integers and the closed-form fit evaluates in double on
    * one row with the same expression shape on both engines. Rank
    * breaks frequency ties by token, so the top-K cut is a total
    * order.
    *
    * Shape at 100 TB: corpus → vocabulary is the one shuffle
    * (Zipf-bounded); the top-K cut is a per-partition bounded heap
    * (TakeOrdered), never a vocab-wide sort; the fit itself sees K
    * rows. */
  def zipfAudit(docs: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 2, s"topK must be >= 2, got $topK")
    val top = graft.util.Spread.byKey(docs, col(textCol))
      .select(explode(words(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("n_w"))
      .orderBy(col("n_w").desc, col("t"))
      .limit(topK)
    val q = top
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n_w").desc, col("t"))).cast(LongType))
      .select(
        round(log(col("rank").cast("double")) * 1e6).cast(LongType).as("x"),
        round(log(col("n_w").cast("double")) * 1e6).cast(LongType).as("y"))
    val sums = q.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val den = n * d("sxx") - d("sx") * d("sx")
    val cov = n * d("sxy") - d("sx") * d("sy")
    val vy = n * d("syy") - d("sy") * d("sy")
    sums.select(col("n").as("n_terms"),
      when(den > 0, round(cov / den, 6))
        .otherwise(lit(null).cast("double")).as("slope"),
      when(den > 0,
        round((d("sy") * d("sxx") - d("sx") * d("sxy")) / den / 1e6, 6))
        .otherwise(lit(null).cast("double")).as("intercept"),
      when(den > 0 && vy > 0, round(cov * cov / (den * vy), 6))
        .otherwise(lit(null).cast("double")).as("r2"))
  }

  /** Vocabulary coverage curve — the tokenizer-sizing question "what
    * share of corpus tokens does a top-V vocabulary cover?" answered
    * at each checkpoint V: cumulative covered tokens, exact integer
    * coverage ppm, and the frequency floor (the V-th token's count —
    * everything below it becomes `<unk>`/byte-fallback).
    *
    * The trick that makes it 100 TB-shaped: coverage at rank V never
    * needs a vocabulary-wide ordered window. Tokens ranked
    * (count DESC, token ASC) partition into count-classes; within a
    * class every token contributes the SAME count, so
    * `cum(V) = tokens_before(class) + (V − vocab_before(class)) · c`
    * — computable from the count-class HISTOGRAM (one row per
    * distinct frequency, ~O(√corpus-tokens) rows) with one exclusive
    * prefix window over that tiny relation, the K84 budgetSelect
    * prefix trick pointed at vocabulary instead of documents. The
    * corpus pays one token-count shuffle; token text never rides
    * past the vocab rollup.
    *
    * Checkpoints past the vocabulary clamp to full coverage (10⁶ ppm
    * with the smallest count as floor). Output: (v, cov_tokens,
    * coverage_ppm, floor_count, vocab_total, token_total). */
  def vocabCoverage(
      docs: DataFrame,
      textCol: String,
      checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints.forall(_ >= 1),
      s"checkpoints must be >= 1: $checkpoints")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = graft.util.Spread.byKey(docs, col(textCol))
      .select(explode(words(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val hist = vocab.groupBy(col("c")).agg(count(lit(1)).as("n_at"))
      .select(col("c"), col("n_at"), (col("n_at") * col("c")).as("tok_at"))
    val ex = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val pre = hist
      .withColumn("vocab_before", coalesce(sum(col("n_at")).over(ex), lit(0L)))
      .withColumn("tokens_before", coalesce(sum(col("tok_at")).over(ex), lit(0L)))
    val totals = vocab.agg(count(lit(1)).as("vocab_total"),
      sum(col("c")).as("token_total"))
    checkpoints.toDF("v")
      .crossJoin(broadcast(totals))
      .withColumn("_veff", least(col("v"), col("vocab_total")))
      .join(broadcast(pre),
        col("vocab_before") < col("_veff") &&
          col("_veff") <= col("vocab_before") + col("n_at"))
      .select(col("v"),
        (col("tokens_before") + (col("_veff") - col("vocab_before")) * col("c"))
          .as("cov_tokens"),
        expr("(tokens_before + (_veff - vocab_before) * c) * 1000000 div token_total")
          .as("coverage_ppm"),
        col("c").as("floor_count"),
        col("vocab_total"), col("token_total"))
  }

  /** Demonstration merge table for [[bpeEncode]] — 20 learned-style
    * English merges in RANK order, with deliberate cascades ((t,h)→th
    * then (th,e)→the; (t,i)/(ti,on)→tion; (a,n)/(an,d)→and) so the
    * order-dependence of BPE application is exercised, not just
    * single-pair substitution. Production use passes a learned table
    * (e.g. the top pairs from [[bpePairCounts]] iterated to a real
    * merge list); the encoder is table-agnostic. */
  val defaultBpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "an" -> "d", "o" -> "n", "e" -> "n", "r" -> "e", "a" -> "t",
    "o" -> "r", "e" -> "s", "t" -> "i", "ti" -> "on", "s" -> "t",
    "a" -> "r", "o" -> "u", "l" -> "l", "o" -> "o", "e" -> "e")

  /** Separator for the in-flight BPE token encoding — a control char
    * outside the corpus alphabet (the PII/HTML ops make the same
    * printable-text assumption). */
  private val BpeSep = "\u0001"

  /** BPE TRAINER — the iterated form of [[bpePairCounts]] (which
    * scores ONE round's candidates): learn a real merge table by
    * repeatedly taking the corpus-frequency-weighted argmax adjacent
    * token pair and merging it, `rounds` times — the standard BPE
    * training loop (Sennrich et al., arXiv:1508.07909), closing the
    * tokenizer loop end to end: TRAIN here → APPLY with [[bpeEncode]]
    * → BUDGET with the real counts (the retrain-to-index discipline,
    * q146, applied to the tokenizer).
    *
    * Scale shape: the corpus collapses to its VOCABULARY once (one
    * word-sized shuffle, Zipf-bounded); every round then runs over the
    * vocab relation only — per-word segmentations re-derive from the
    * accumulated merge list as plan literals (bounded replay: round r
    * re-applies r replaces over the vocab, never touching the corpus),
    * pair counts weight by word frequency, and the argmax is a
    * TakeOrdered over the pair rollup, never a full sort. Only the
    * R-row merge table ever reaches the driver (the kmeansFit
    * eager-model contract). A 100 TB corpus trains over its vocab (or
    * a K23 hash-rate sample upstream), exactly like production BPE.
    *
    * Determinism: argmax ties break by (count DESC, left ASC,
    * right ASC) — binary string order, identical cross-engine. Stops
    * early if no adjacent pair remains. Returns (left, right,
    * weighted_count) in merge-rank order, ready for [[bpeEncode]]. */
  def bpeTrain(
      docs: DataFrame,
      textCol: String,
      rounds: Int): Seq[(String, String, Long)] = {
    require(rounds >= 1, s"bpeTrain needs rounds >= 1, got $rounds")
    def wrap(t: String) = BpeSep + t + BpeSep
    // (A round-15 spread/re-widen of this vocab pass was tried and
    // REVERTED: the vocab and its rounds are Zipf-tiny, and the added
    // exchanges measured q160 1.03 s -> 2.07 s at sf0.1 — the merge
    // loop is driver/round-bound, not compute-bound.)
    val vocab = docs
      .select(explode(words(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(regexp_replace(col("word"), "(.)", s"$BpeSep$$1$BpeSep").as("enc"),
        col("n"))
      .localCheckpoint() // the one corpus-sized pass; rounds replay merges only
    val learned = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    for (_ <- 1 to rounds if !done) {
      val folded = learned.foldLeft(col("enc")) { case (c, (l, r, _)) =>
        replace(c, lit(wrap(l) + wrap(r)), lit(wrap(l + r)))
      }
      val tk = split(trim(folded, BpeSep), BpeSep + BpeSep)
      val pairs = when(size(tk) >= 2,
          transform(sequence(lit(1), size(tk) - 1), i =>
            struct(element_at(tk, i).as("l"), element_at(tk, i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val top = vocab.select(explode(pairs).as("p"), col("n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("np"))
        .orderBy(col("np").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else learned += ((top.head.getString(0), top.head.getString(1),
        top.head.getLong(2)))
    }
    learned.toSeq
  }

  /** BPE ENCODE — apply a learned merge table to text, producing the
    * real token stream every "budget in tokens" consumer actually
    * means ([[bpePairCounts]] is the TRAINING side; this is the
    * application side that was missing: chunking/packing/budget
    * selection previously counted whitespace words).
    *
    * Algorithm: tokens start as characters; merges apply in RANK
    * order, each replacing every left-to-right non-overlapping
    * adjacent occurrence of its pair — the standard sequential
    * application, exact for LEARNED tables because a merge's parts
    * can only be produced by earlier-ranked merges.
    *
    * Encoding trick that keeps this a pure column chain (no UDF, no
    * per-token explode): each token is wrapped as `␁tok␁`, so a doc is
    * `␁h␁␁i␁ ␁y␁␁o␁` — adjacent tokens meet at a DOUBLE separator,
    * word boundaries keep their space (no merge crosses one: patterns
    * contain no space). Merge (x,y) is then the plain string replace
    * `␁x␁␁y␁ → ␁xy␁`, whose left-to-right non-overlap semantics are
    * IDENTICAL in Java and DuckDB — and, because adjacent matches
    * share no characters under double-wrapping, equal to BPE's
    * leftmost-greedy pair pass (single-wrapping would share the
    * boundary separator and skip every other merge in a run). After
    * the fold, `␁␁ → space`, strip `␁`, split, drop empties.
    *
    * Scale shape: map-only — one codegen'd string pipeline per row,
    * merge table folded into plan literals (the centroid-literal
    * pattern; table size bounds plan depth, the documented contract
    * for plan-literal models). No shuffle, no state.
    *
    * Character-level contract: `.`-per-codepoint wrapping assumes BMP
    * text (the corpus alphabet assumption above).
    *
    * Output: (doc_id, n_ws_tokens, tokens ARRAY<STRING>, n_tokens). */
  def bpeEncode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "bpeEncode needs a non-empty merge table")
    merges.foreach { case (x, y) =>
      require(x.nonEmpty && y.nonEmpty && !(x + y).exists(c => c == ' ' || c == '\u0001'),
        s"merge parts must be non-empty and space/separator-free: ($x,$y)")
    }
    def wrap(t: String) = BpeSep + t + BpeSep
    val wrapped = regexp_replace(col(textCol), "([^ ])", s"$BpeSep$$1$BpeSep")
    val folded = merges.foldLeft(wrapped) { case (c, (x, y)) =>
      replace(c, lit(wrap(x) + wrap(y)), lit(wrap(x + y)))
    }
    val tokens = filter(
      split(translate(replace(folded, lit(BpeSep + BpeSep), lit(" ")),
        BpeSep, ""), " "),
      t => t =!= "")
    docs
      .select(col(idCol).as("doc_id"),
        size(filter(words(col(textCol)), w => w =!= "")).cast(LongType)
          .as("n_ws_tokens"),
        tokens.as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast(LongType))
  }

  /** READABILITY score (Flesch reading ease, 1948) — the
    * audience-level signal the quality family ([[highQuality]],
    * [[charClassSignals]], the hashed scorer) doesn't carry: length
    * says HOW MUCH text, this says how HARD it reads.
    *
    * Deterministic proxies, stated: syllables ≈ maximal vowel runs
    * (`[aeiouy]+` over the lowered text — each run collapses to one
    * marker the lowered text cannot contain, then markers are
    * counted; the standard dictionary-free approximation), sentences
    * = maximal `[.!?]+` runs floored at 1 (an unterminated fragment
    * is one sentence), words = the house whitespace splitter (K9's
    * tokenCount). The score `206.835 − 1.015·(W/S) − 84.6·(Sy/W)` is
    * ONE stated IEEE chain micro-quantized per document (the q195
    * convention) — integer output, no cross-row float ever. Empty
    * documents are excluded (W ≥ 1 guaranteed by the splitter on
    * non-empty text). Map-only; no exchange at all. */
  def readabilityScore(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val t = col("_t")
    val r1 = regexp_replace(lower(t), "[aeiouy]+", "V")
    val r2 = regexp_replace(lower(t), "[.!?]+", "S")
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("_t"))
      .filter(length(t) > 0)
      .select(col("doc_id"),
        size(split(t, " ")).cast(LongType).as("n_words"),
        greatest(lit(1L),
          (length(r2) - length(regexp_replace(r2, "S", "")))
            .cast(LongType)).as("n_sentences"),
        (length(r1) - length(regexp_replace(r1, "V", "")))
          .cast(LongType).as("n_vowel_runs"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_vowel_runs"),
        round((lit(206.835) -
          lit(1.015) * (col("n_words").cast(DoubleType) /
            col("n_sentences").cast(DoubleType)) -
          lit(84.6) * (col("n_vowel_runs").cast(DoubleType) /
            col("n_words").cast(DoubleType))) * 1e6)
          .cast(LongType).as("flesch_micro"))
  }
}
