package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import TextDedup.{md5Hash60, words}

/** Corpus-curation operators a training-data pipeline runs between
  * ingest and dedup: deterministic sampling, per-domain caps,
  * repetition-based quality signals, and PII redaction. All column
  * math is integer or md5-derived so a DuckDB oracle mirrors results
  * bit-for-bit; nothing here shuffles more than aggregation partials.
  */
object Curation {

  /** TEMPORAL EMBARGO SPLIT — the time-series counterpart of
    * TextDedup.leakageSafeSplit (that one stops NEAR-DUP leakage
    * across a random split; this one stops TEMPORAL leakage across a
    * forecasting split): rows at day ≤ cutoff train, rows inside the
    * `embargoDays` gap after the cutoff are DROPPED (the purge window
    * that keeps label horizons from straddling the boundary), the
    * rest test. The cutoff derives from the data
    * (min_day + cutoffOffsetDays), so the split is reproducible from
    * the corpus alone.
    *
    * Output is the split AUDIT, not the row assignment (that is a
    * map-only `when` any consumer inlines): per split — row count,
    * distinct entities, day range — plus `shared_entities`, the count
    * of entities present on BOTH sides. Temporal splits share
    * entities by design; the column makes the overlap a REPORTED
    * quantity (the K147-audit discipline: an expected contamination
    * you can read is fine, one you can't is drift).
    *
    * Shape at 100 TB: one map-only classify, one entity-keyed rollup
    * (carrying per-side flags, so `shared_entities` needs no self-join),
    * then a ≤3-row aggregate. */
  def temporalSplit(
      df: DataFrame,
      tsCol: String,
      entityCol: String,
      cutoffOffsetDays: Int,
      embargoDays: Int): DataFrame = {
    require(cutoffOffsetDays >= 0, s"cutoffOffsetDays >= 0: $cutoffOffsetDays")
    require(embargoDays >= 0, s"embargoDays >= 0: $embargoDays")
    val base = df.select(to_date(col(tsCol)).as("_d"),
      col(entityCol).cast("string").as("_e"))
      .filter(col("_d").isNotNull && col("_e").isNotNull)
    val anchor = base.agg(min(col("_d")).as("_min"))
    val tagged = base.crossJoin(broadcast(anchor))
      .select(col("_d"), col("_e"),
        when(datediff(col("_d"), col("_min")) <= cutoffOffsetDays,
          lit("train"))
          .when(datediff(col("_d"), col("_min")) <=
            cutoffOffsetDays + embargoDays, lit("embargo"))
          .otherwise(lit("test")).as("split"))
    val perSplit = tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("_e")).as("n_entities"),
        min(col("_d")).cast("string").as("min_day"),
        max(col("_d")).cast("string").as("max_day"))
    val shared = tagged.groupBy(col("_e"))
      .agg(max(when(col("split") === "train", 1).otherwise(0)).as("_tr"),
        max(when(col("split") === "test", 1).otherwise(0)).as("_te"))
      .agg(coalesce(sum(when(col("_tr") === 1 && col("_te") === 1, 1L)),
        lit(0L)).as("shared_entities"))
    perSplit.crossJoin(broadcast(shared))
  }

  /** CHURN TRAINING DATASET — supervised feature/label construction
    * with the temporal hygiene [[temporalSplit]] audits: features read
    * ONLY the window at or before the cutoff (events, active days,
    * purchases, recency vs the cutoff), the label reads ONLY the
    * horizon after it (`active` = any event inside
    * (cutoff, cutoff+horizon]), and the two windows meet at a single
    * boundary so no feature can encode its own label. Users with no
    * feature-window activity are EXCLUDED (cold-start rows carry no
    * features to train on — stated).
    *
    * The cutoff derives from the data (min_day + cutoffOffsetDays),
    * so the dataset is reproducible from the corpus alone.
    *
    * Shape at 100 TB: one map-only window classify, one user-keyed
    * rollup carrying both feature partials and the label flag — the
    * label needs no second pass and no join. */
  def churnDataset(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      purchaseType: String,
      cutoffOffsetDays: Int,
      horizonDays: Int): DataFrame = {
    require(cutoffOffsetDays >= 0 && horizonDays >= 1,
      s"need cutoffOffsetDays >= 0, horizonDays >= 1: " +
        s"$cutoffOffsetDays/$horizonDays")
    val base = events.select(col(userCol).as("user_id"),
      to_date(col(tsCol)).as("_d"), col(typeCol).as("_t"))
      .filter(col("user_id").isNotNull && col("_d").isNotNull)
    val anchor = base.agg(min(col("_d")).as("_min"))
    val tagged = base.crossJoin(broadcast(anchor))
      .select(col("user_id"), col("_d"), col("_t"),
        datediff(col("_d"), col("_min")).as("_off"))
      .filter(col("_off") <= cutoffOffsetDays + horizonDays)
    tagged.groupBy(col("user_id"))
      .agg(
        count(when(col("_off") <= cutoffOffsetDays, 1)).as("n_events"),
        count_distinct(when(col("_off") <= cutoffOffsetDays, col("_d")))
          .as("n_active_days"),
        count(when(col("_off") <= cutoffOffsetDays &&
          col("_t") === purchaseType, 1)).as("n_purchases"),
        (lit(cutoffOffsetDays) -
          max(when(col("_off") <= cutoffOffsetDays, col("_off"))))
          .cast(LongType).as("recency_days"),
        max(when(col("_off") > cutoffOffsetDays, 1L).otherwise(0L))
          .as("label_active"))
      .filter(col("n_events") > 0)
  }

  /** Deterministic hash-threshold sample: keep rows whose md5-derived
    * bucket of `id` falls under `permille`/1000.
    *
    * This is the 100 TB sampler: a pure map-side FILTER — no sort, no
    * shuffle, no per-stratum state — and stratification comes free
    * because the hash is uniform within every stratum. The
    * exact-fraction alternative (row_number over each stratum) sorts
    * every stratum and is only worth it when the contract is "exactly
    * ceil(f·n) rows". Same rows on every engine and every run, unlike
    * `TABLESAMPLE`/`rand()`. */
  def hashSample(df: DataFrame, id: Column, permille: Int): DataFrame =
    df.filter(md5Hash60(id.cast("string")) % 1000 < permille)

  /** Per-domain cap: keep the best `cap` docs per domain by
    * (score DESC, id ASC), the standard guard against a handful of
    * template-heavy domains dominating a crawl corpus.
    *
    * Uses the bounded `graft_topk` heap aggregate, so each exchange
    * partition ships at most `cap` entries per domain instead of
    * sorting whole domains — the window-function form materializes and
    * sorts every row of the largest (= exactly the problem) domains. */
  def domainCap(
      docs: DataFrame,
      domainCol: String,
      score: Column,
      idCol: String,
      cap: Int): DataFrame =
    docs.groupBy(col(domainCol))
      .agg(call_function("graft_topk",
        score.cast("double"), col(idCol).cast(LongType), lit(cap)).as("tk"))
      .select(col(domainCol), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col(domainCol), (col("pos") + 1).cast(LongType).as("rank"),
        col("e.id").as(idCol), col("e.ord").as("score"))

  /** Gopher-style repetition signals per document: token totals,
    * distinct-token count, the highest single-word multiplicity and
    * the highest bigram multiplicity. A doc whose top word repeats
    * (≥ 2) and covers ≥ 10% of its tokens is flagged repetitive
    * (integer compares — no float ratios, so the oracle matches
    * exactly; the ≥ 2 guard keeps short all-distinct docs clean).
    *
    * Shape: one explode per n-gram order feeding two-level
    * aggregations — (doc, gram) partials combine map-side, then one
    * doc-sized shuffle; the token stream itself never re-shuffles. */
  def repetitionSignals(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread before the two explodes (see util.Spread)
    val toks = graft.util.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
    val wordStats = toks
      .select(col("doc_id"), explode(col("ws")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(
        sum(col("n")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).as("max_word_n"))
    val bigrams = toks.select(col("doc_id"), explode(
      when(size(col("ws")) >= 2,
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat_ws(" ",
            element_at(col("ws"), i), element_at(col("ws"), i + 1))))
        .otherwise(array())).as("g"))
    val biStats = bigrams
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(max(col("n")).as("max_bigram_n"))
    wordStats.join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        col("max_word_n"),
        coalesce(col("max_bigram_n"), lit(0L)).as("max_bigram_n"),
        (col("max_word_n") >= 2 &&
          col("max_word_n") * 10 >= col("n_words")).as("repetitive"))
  }

  /** Composite curation gate — the quality-side counterpart of
    * TextDedup.nearDupDedup: one operator that runs the standard
    * filter battery over a corpus and returns every doc with an
    * explicit keep/drop verdict and machine-readable reasons, plus the
    * PII-redacted footprint for the keepers. Real pipelines ship this
    * exact composition (filter → annotate → redact) between ingest and
    * dedup; reasons-as-data (rather than silent drops) is what makes
    * curation auditable at 100 TB — you can aggregate drop reasons per
    * source/lang and catch a filter misfiring before it deletes a
    * terabyte.
    *
    * Shape: repetition signals are the only aggregation (two-level
    * map-side partials, q53's shape); quality, redaction, and reason
    * assembly are pure codegen'd column expressions joined back on the
    * 8-byte doc id. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50): DataFrame = {
    val rep = repetitionSignals(docs, idCol, textCol)
      .select(col("doc_id"), col("repetitive"))
    val hq = TextAnalysis.highQuality(col("text"), minWords)
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(rep, Seq("doc_id"))
      .select(
        col("doc_id"),
        (!col("repetitive") && hq).as("keep"),
        concat_ws(",",
          when(col("repetitive"), lit("repetitive")),
          when(!hq, lit("low_quality"))).as("reasons"),
        (emailCount(col("text")) + ipv4Count(col("text"))).as("n_pii"),
        length(redactPii(col("text"))).cast(LongType).as("redacted_len"))
  }

  /** Sliding-window document chunking — the step that turns curated
    * documents into fixed-size training examples. Each doc yields
    * windows of `chunkTokens` whitespace tokens starting every
    * `stride` tokens; the window count is exactly enough to cover
    * every token (the final windows may be short), so no text is
    * dropped and overlap = chunkTokens - stride is the standard
    * context-continuity overlap.
    *
    * Shape at 100 TB: a pure per-row explode — no shuffle, no state,
    * no driver involvement. The token array, the start sequence, and
    * the slices are all single-pass codegen'd collection expressions,
    * and output rows stream straight to the sink, so the operator is
    * bounded by write bandwidth, not memory (a doc's chunks never
    * materialize beyond one row's expression buffer).
    *
    * Requires stride <= chunkTokens (the full-coverage contract:
    * gapped sampling would silently drop tokens). */
  def chunkDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      stride: Int): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      s"need 1 <= stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    val toks = words(col(textCol))
    val n = size(toks)
    // 1 + ceil(max(0, n - chunkTokens) / stride) window starts
    val nChunks = (lit(1) +
      floor((greatest(n - lit(chunkTokens), lit(0)) + lit(stride - 1)) /
        lit(stride.toDouble))).cast("int")
    docs
      .select(col(idCol).as("doc_id"), toks.as("ws"), n.as("n"), nChunks.as("nc"))
      .select(col("doc_id"), col("n"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => array_join(slice(col("ws"), i * stride + 1, lit(chunkTokens)), " ")))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
        least(lit(chunkTokens), col("n") - col("chunk_idx") * stride)
          .cast(LongType).as("n_tokens"),
        col("chunk"))
  }

  /** Exact-size deterministic uniform sample: the `n` rows with the
    * SMALLEST md5-derived hash of `id` — the bottom-k-by-hash sample.
    * [[hashSample]] is the rate sampler (pure filter, but only
    * approximately f·N rows); this is the contract "exactly n rows,
    * uniform, same on every engine and every run". The KMV insight in
    * reverse: the bottom-k of a uniform hash IS a uniform sample.
    *
    * Shape at 100 TB: the bounded `graft_topk` heap again — each
    * exchange partition ships at most n (hash, id) entries, so there
    * is never a global sort of the corpus (the `ORDER BY hash LIMIT n`
    * form sorts everything). Negated hash because the heap keeps
    * score-DESC; ids ride as payload. The hash is 52-BIT (13 md5 hex
    * chars), not the usual 60: the heap's score is a DOUBLE, and a
    * 52-bit integer is exactly representable where a 60-bit one loses
    * its low ~7 bits — a loss that could re-order the bottom-n
    * boundary vs an exact-integer oracle at corpus scale. Returns the
    * sampled ids joined back to the input rows. */
  def exactSample(df: DataFrame, idCol: String, n: Int): DataFrame = {
    val h52 = TextDedup.md5Hash52(col(idCol).cast("string"))
    val picked = df
      .select(h52.as("_h"), col(idCol))
      .agg(call_function("graft_topk",
        -col("_h").cast("double"), col(idCol).cast(LongType), lit(n)).as("tk"))
      .select(explode(col("tk").getField("id")).as(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }

  /** Exact-size STRATIFIED sample: exactly `min(nPerStratum, |stratum|)`
    * rows per stratum, uniform within each — the balanced-subset
    * contract corpus mixers need ("50k docs per language") that
    * neither [[hashSample]] (rate, approximate) nor [[exactSample]]
    * (global N, big strata swamp small ones) gives.
    *
    * Same bottom-n-by-hash construction as [[exactSample]] — the
    * bounded `graft_topk` heap per STRATUM key instead of one global
    * heap, so each exchange partition ships ≤ n (hash, id) entries per
    * stratum and no stratum is ever sorted. The 'strat:' salt
    * decouples the pick from the K23/K43/K53 hashes — a doc sampled
    * here must be independent of it being sampled globally. 52-bit
    * hash for the same double-representability reason as
    * [[exactSample]]. Returns the sampled input rows. */
  def exactSampleStratified(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      nPerStratum: Int): DataFrame = {
    require(nPerStratum >= 1, s"nPerStratum must be >= 1, got $nPerStratum")
    val h52 = TextDedup.md5Hash52(concat(lit("strat:"), col(idCol).cast("string")))
    val picked = df
      .select(col(stratumCol), h52.as("_h"), col(idCol))
      .groupBy(col(stratumCol))
      .agg(call_function("graft_topk",
        -col("_h").cast("double"), col(idCol).cast(LongType),
        lit(nPerStratum)).as("tk"))
      .select(explode(col("tk").getField("id")).as(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }

  /** Sequence PACKING for training: assign docs/chunks to fixed
    * token-budget bins (context windows) in deterministic id order,
    * partitioned by a shard column so the running sum parallelizes —
    * how real pipelines pack (per-shard packers; one global packer
    * would serialize the corpus through a single partition).
    *
    * This is STREAM packing ("virtual packing"): docs concatenate into
    * one per-shard token stream and a doc belongs to the bin its FIRST
    * token falls in — `bin = floor(tokens_before / budget)`, offset
    * `tokens_before % budget`. One windowed integer SUM, exactly
    * reproducible, mirrored by a `SUM() OVER` oracle. The tradeoff vs
    * greedy first-fit (which needs a sequential running-total-with-
    * reset that a window cannot express): a doc straddling a budget
    * boundary overflows its bin by up to its own length, so keep
    * inputs budget-capped via [[chunkDocuments]] upstream — training
    * packers do the same (chunk, then pack, then split the one
    * straddler per boundary at materialization).
    *
    * Emits (shard, id, n_tokens, bin, bin_offset); `bin` dense from 0
    * per shard. */
  def packSequences(
      docs: DataFrame,
      shardCol: String,
      idCol: String,
      nTokens: Column,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol))
    val cum = sum(nTokens).over(w)
    docs.select(col(shardCol), col(idCol), nTokens.cast(LongType).as("n_tokens"),
        cum.cast(LongType).as("_cum"))
      // `div`, not `/`: long division must stay integral (the q67 rule)
      .select(col(shardCol), col(idCol), col("n_tokens"),
        expr(s"(_cum - n_tokens) div ${budgetTokens.toLong}").as("bin"),
        ((col("_cum") - col("n_tokens")) % lit(budgetTokens.toLong))
          .cast(LongType).as("bin_offset"))
  }

  /** Corpus MIXTURE planner + deterministic apply — the step that
    * turns "we want this many docs per source" (Pile/Dolma-style
    * mixture specs) into per-source keep-rates and an auditable
    * summary. For each source: the corpus count, the requested target,
    * the ceiling keep-rate `min(1000, ⌈target·1000/n⌉)` permille
    * (ceiling so the plan never undershoots a reachable target; a
    * target above the stock caps at keep-everything), and the count
    * the deterministic hash gate actually keeps at that rate. The
    * 'mix:' salt keeps the gate independent of the K23/K43/K53/K55
    * picks. A source present in the corpus but absent from `targets`
    * plans to rate 0 (drop) — the explicit-allowlist contract.
    *
    * Shape at 100 TB: one by-source rollup (sources are few — the
    * rates relation broadcasts), a map-side hash filter over the
    * corpus, one more by-source rollup of the survivors. The sampled
    * DATASET itself is the same filter without the final rollup —
    * [[hashSample]] with a per-source rate column. */
  def mixturePlan(
      docs: DataFrame,
      idCol: String,
      srcCol: String,
      targets: DataFrame /* (src, target_n) */): DataFrame = {
    val counts = docs.groupBy(col(srcCol).as("src")).agg(count(lit(1)).as("n_docs"))
    val rates = counts.join(targets, Seq("src"), "left")
      .select(col("src"), col("n_docs"),
        coalesce(col("target_n"), lit(0L)).as("target_n"))
      .withColumn("rate_permille",
        least(lit(1000L), expr("(target_n * 1000 + n_docs - 1) div n_docs")))
    val sampled = docs
      .select(col(srcCol).as("src"),
        pmod(md5Hash60(concat(lit("mix:"), col(idCol).cast("string"))),
          lit(1000L)).as("_b"))
      .join(broadcast(rates.select(col("src"), col("rate_permille"))), Seq("src"))
      .filter(col("_b") < col("rate_permille"))
      .groupBy(col("src")).agg(count(lit(1)).as("n_sampled"))
    rates.join(sampled, Seq("src"), "left")
      .select(col("src"), col("n_docs"), col("target_n"), col("rate_permille"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
  }

  /** Deterministic corpus shuffle for training-order export: every row
    * gets a (shard, pos) address — shard by a salted hash, position by
    * ranking the hash within the shard — so a training run reads the
    * corpus in an order that is pseudo-random w.r.t. every content
    * column yet IDENTICAL across engines, runs, and restarts (the
    * property `ORDER BY rand()` can never give and a real pipeline
    * needs for resumable epochs). The salt ('shuf:' prefix) decouples
    * this hash from the K23/K43 sampling hashes — sampled-in rows must
    * not cluster at the front of the shuffled order.
    *
    * Shape at 100 TB: one shuffle keyed by shard, then a per-shard
    * sort for row_number — each shard sorts independently, so
    * `nShards` caps the largest sort at corpus/nShards rows; real
    * exports size nShards to the writer parallelism (thousands), and
    * no global sort ever exists. The 52-bit hash (not 60) keeps ties
    * impossible in practice while staying exactly representable if a
    * consumer ever routes it through a double. */
  def shuffleAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = TextDedup.md5Hash52(concat(lit("shuf:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_shard")).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("_shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast(LongType) - 1)
      .withColumnRenamed("_shard", "shard")
      .drop("_h")
  }

  /** Verifiable export manifest — the receipt a training run checks
    * before trusting a delivered corpus: per [[shuffleAssign]] shard,
    * the doc count, token total, an order-independent content digest
    * (`bit_xor` of the per-doc normalized-content hashes — XOR
    * commutes, never overflows, and both engines compute it exactly,
    * unlike a SUM that trips ANSI overflow at corpus scale), and the
    * max position (must equal n_docs − 1: dense positions or the
    * export is torn). A consumer re-derives the same relation from
    * the delivered files and diffs — any dropped, duplicated, or
    * altered document flips its shard's digest.
    *
    * Shape: one shuffle (the shard assignment's own), map-side
    * partial aggregates, nShards output rows. */
  def exportManifest(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int): DataFrame =
    shuffleAssign(docs, idCol, nShards)
      .withColumn("_ch",
        TextDedup.md5Hash60(TextDedup.norm(col(textCol))))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextDedup.words(col(textCol)))).cast(LongType)
          .as("n_tokens"),
        expr("bit_xor(_ch)").as("content_digest"),
        max(col("pos")).as("max_pos"))

  /** The materialization step [[packSequences]]'s docstring promises:
    * split each boundary-straddling doc at the bin edge. Every doc
    * gets `head_tokens = min(n_tokens, budget − bin_offset)` in its
    * assigned bin and `tail_tokens = n_tokens − head_tokens` spilling
    * into bin+1 (zero for the non-straddlers; inputs budget-capped via
    * [[chunkDocuments]] guarantee at most ONE spill — enforced by an
    * in-plan assert_true, not assumed). Pure integer column math on
    * top of the packing window — no new shuffle. Emits packSequences'
    * columns + (head_tokens, tail_tokens). */
  def packSequencesSplit(
      docs: DataFrame,
      shardCol: String,
      idCol: String,
      nTokens: Column,
      budgetTokens: Int): DataFrame = {
    val b = lit(budgetTokens.toLong)
    packSequences(docs, shardCol, idCol, nTokens, budgetTokens)
      .withColumn("head_tokens",
        least(col("n_tokens"), b - col("bin_offset")).cast(LongType))
      // assert_true rides inside the value expression so the optimizer
      // cannot prune it: a doc long enough to straddle TWO boundaries
      // (tail > budget) fails the job instead of silently mis-splitting
      .withColumn("tail_tokens",
        when(assert_true(col("n_tokens") - col("head_tokens") <= b,
            lit("packSequencesSplit: doc exceeds budget + remaining bin " +
              "space; chunk inputs (chunkDocuments) before packing")).isNull,
          col("n_tokens") - col("head_tokens")).cast(LongType))
  }

  /** Incremental corpus snapshot diff: classify every id present in
    * either snapshot as added / removed / changed / unchanged by
    * comparing content digests. Both sides project to `(id, md5)`
    * BEFORE the full-outer join, so the exchange carries a 32-char
    * digest per row, never document bodies — at 100 TB the join
    * co-partitions on the id both snapshots would naturally bucket
    * by, and the shuffle width is independent of document size. This
    * is the nightly-crawl refresh primitive: downstream re-embedding,
    * re-dedup and index maintenance run over `added ∪ changed` only,
    * instead of re-processing the whole corpus. */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      contentCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      md5(col(contentCol).cast("string")).as("_h_old"))
    val n = newSnap.select(col(idCol).as("id"),
      md5(col(contentCol).cast("string")).as("_h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("_h_old").isNull, lit("added"))
          .when(col("_h_new").isNull, lit("removed"))
          .when(col("_h_old") =!= col("_h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Length-bucketed batch assembly: round each doc's token count up
    * to the next power-of-two bucket in `[minBucket, maxBucket]`
    * (longer docs truncate to `maxBucket`), then pack docs into
    * fixed-`batchSize` batches WITHIN `(bucket, shard)` — shard =
    * salted md5 of the id mod `nShards` — emitting the per-doc
    * padding waste `bucket_len − min(n_tokens, bucket_len)` the
    * bucketing exists to minimize. Batch addressing is (bucket_len,
    * shard, batch) with a window per (bucket, shard): sharding is
    * what makes this a 100 TB op — a handful of global length
    * buckets would otherwise funnel the whole corpus through that
    * many window partitions, and training never needs globally
    * consecutive batch ids, only deterministic resumable ones (the
    * q84 argument applied to batching). Pure integer math
    * throughout, so a SQL oracle matches bit-for-bit. */
  def lengthBucketBatches(
      docs: DataFrame,
      idCol: String,
      nTokens: Column,
      batchSize: Int,
      nShards: Int,
      minBucket: Int = 16,
      maxBucket: Int = 1024): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(minBucket >= 1 && Integer.bitCount(minBucket) == 1 &&
      Integer.bitCount(maxBucket) == 1 && maxBucket >= minBucket,
      s"bucket bounds must be powers of two with min <= max, " +
        s"got [$minBucket, $maxBucket]")
    val sizes = Iterator.iterate(minBucket)(_ * 2)
      .takeWhile(_ <= maxBucket).toSeq
    // CASE chain from the smallest bucket out — identical fold order
    // in the SQL mirror; cheap (log2(max/min) comparisons per row).
    val bucket = sizes.reverse.foldLeft(lit(maxBucket.toLong): Column) {
      (acc, b) => when(col("n_tokens") <= b, lit(b.toLong)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket_len"), col("shard")).orderBy(col(idCol))
    docs
      .withColumn("n_tokens", nTokens.cast(LongType))
      .withColumn("bucket_len", bucket)
      .withColumn("shard",
        pmod(TextDedup.md5Hash52(
          concat(lit("lb:"), col(idCol).cast("string"))),
          lit(nShards.toLong)))
      .withColumn("_seq", row_number().over(w).cast(LongType) - 1)
      .withColumn("batch", expr(s"_seq div ${batchSize}L"))
      .withColumn("pad_tokens",
        col("bucket_len") - least(col("n_tokens"), col("bucket_len")))
      .select(col(idCol), col("n_tokens"), col("bucket_len"),
        col("shard"), col("batch"), col("pad_tokens"))
  }

  /** Within-group score calibration: replace a raw quality score with
    * its percentile INSIDE its group (integer ppm — rank 0 of n−1 →
    * 0, top rank → 1,000,000), so one global keep-threshold is fair
    * across groups whose raw score distributions differ (a fixed raw
    * cutoff over-prunes sources that are merely terse and under-prunes
    * verbose ones — the standard per-source calibration step before a
    * corpus-wide quality gate). Ties break by id, making the
    * percentile deterministic; a single-member group calibrates to 0.
    * One window per group — groups (sources/domains/languages) number
    * in the thousands-to-millions at corpus scale, so the window
    * partitioning is the natural parallelism, never a global sort. */
  def calibrateScores(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      score: Column): DataFrame = {
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    docs
      .withColumn("score", score.cast(LongType))
      .withColumn("_rk", row_number()
        .over(byGroup.orderBy(col("score"), col(idCol))).cast(LongType))
      .withColumn("_n", count(lit(1)).over(byGroup).cast(LongType))
      .withColumn("pct_ppm",
        when(col("_n") === 1, lit(0L))
          .otherwise(expr("(_rk - 1) * 1000000 div (_n - 1)")))
      .select(col(idCol), col(groupCol), col("score"), col("pct_ppm"))
  }

  /** Token-budget selection — the greedy-prefix corpus cut every
    * "train on the best N tokens" recipe needs: order docs by
    * (score DESC, id ASC) and keep the longest prefix whose running
    * token total stays within `budget`. The greedy-prefix contract is
    * deliberate (it is what quality-threshold curation means), not a
    * knapsack: a doc past the boundary is out even if some later
    * smaller doc would still fit.
    *
    * Scale shape: the global sort never happens. The running total
    * decomposes as `cumBefore(score) + runWithin(score, id)`:
    *  1. per-score token totals collapse to a score-HISTOGRAM relation
    *     (one map-side-combined shuffle, bounded by the score support
    *     — thousands of rows for integer quality scores, documented
    *     assumption);
    *  2. the histogram's exclusive prefix sum is one window over that
    *     bounded relation (single-node over model-sized state, the
    *     Lloyd-centroid adjudication — NOT over the corpus);
    *  3. within-score running sums are hash-partitioned windows keyed
    *     by score — fully parallel, and fine-grained for any scorer
    *     with real spread.
    * The doc relation joins the histogram on score (AQE broadcasts at
    * histogram size). Emits the kept prefix with its inclusive
    * `cum_tokens` audit column. */
  def budgetSelect(
      docs: DataFrame,
      idCol: String,
      scoreCol: String,
      tokCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val hist = docs.groupBy(col(scoreCol))
      .agg(sum(col(tokCol)).as("_t"))
    val exclusive = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = hist.select(col(scoreCol),
      coalesce(sum(col("_t")).over(exclusive), lit(0L)).as("_before"))
    val withinScore = org.apache.spark.sql.expressions.Window
      .partitionBy(col(scoreCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .join(cum, Seq(scoreCol))
      .withColumn("cum_tokens",
        col("_before") + sum(col(tokCol)).over(withinScore))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(scoreCol), col(tokCol), col("cum_tokens"))
  }

  /** Deterministic fractional UPSAMPLING — the half of mixture
    * targeting [[mixturePlan]] caps away: a source whose target
    * exceeds its size gets docs REPEATED. Per source,
    * `rate_ppm = ceil(target_n / n_docs · 10⁶)`; each doc emits
    * `rate_ppm div 10⁶` whole copies plus one more iff its salted
    * hash bucket falls under `rate_ppm mod 10⁶` — so expected output
    * per source ≈ target_n, each doc repeated ⌊r⌋ or ⌈r⌉ times, and
    * the choice is a pure hash of the id (identical across engines,
    * runs, and restarts — epoch composition a trainer can resume).
    * Unlisted sources rate to 0 and drop, [[mixturePlan]]'s explicit-
    * drop contract. Output rows carry a `copy` index (0-based) so
    * downstream shuffling/packing can address each repeat.
    *
    * Shape at 100 TB: the rates relation is per-source (tiny —
    * broadcast); the corpus sees one map-side join + an explode that
    * GENERATES repeats at the executor — repeated bodies never
    * shuffle, and there is no corpus-wide state beyond the per-source
    * counts rollup. The `up:` salt decouples the fractional pick from
    * the K23/K43/K53 sampling and shuffle hashes. */
  def upsample(
      docs: DataFrame,
      idCol: String,
      srcCol: String,
      targets: DataFrame /* (src, target_n) */): DataFrame = {
    val counts = docs.groupBy(col(srcCol).as("src")).agg(count(lit(1)).as("_n"))
    val rates = counts.join(targets, Seq("src"), "left")
      .select(col("src"),
        expr("(coalesce(target_n, 0L) * 1000000 + _n - 1) div _n")
          .as("rate_ppm"))
    docs
      .select(col(idCol), col(srcCol).as("src"),
        pmod(TextDedup.md5Hash60(concat(lit("up:"), col(idCol).cast("string"))),
          lit(1000000L)).as("_b"))
      .join(broadcast(rates), Seq("src"))
      .withColumn("n_copies",
        expr("rate_ppm div 1000000") +
          when(col("_b") < pmod(col("rate_ppm"), lit(1000000L)), lit(1L))
            .otherwise(lit(0L)))
      .filter(col("n_copies") >= 1)
      .select(col(idCol), col("src").as(srcCol),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy"))
  }

  /** PII patterns — valid in both Java regex (Spark) and RE2 (DuckDB):
    * no backrefs, no lookarounds. */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails then IPv4 literals with placeholder tokens (the
    * order matters: an email's host part must not be half-eaten by
    * the IP pass first). Pure codegen'd string expressions. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailRe, "<EMAIL>"),
      ipv4Re, "<IP>")

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailRe), lit(0))).cast(LongType)

  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(ipv4Re), lit(0))).cast(LongType)

  /** Schema-DRIFT audit — what changed between two snapshot
    * generations of the same table: columns added, removed, or
    * type-changed, plus each side's null rate (the silent killer —
    * a column that "still exists" but went 40% null broke upstream
    * without a schema change). Rounds out the warehouse-ops family:
    * the profiler describes ONE snapshot, the snapshot diff counts
    * row churn, the FK audit checks references — this watches the
    * CONTRACT.
    *
    * Shape at 100 TB: ONE single-row aggregate per side computes
    * every null count in the same pass (no per-column scans); the
    * verdict table unpivots through a plan-literal column list
    * (schema introspection is driver-side metadata, exactly where it
    * belongs). Output: (column, status, old_type, new_type,
    * old_null_ppm, new_null_ppm), columns sorted. */
  def schemaDriftAudit(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val oT = oldDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val nT = newDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val cols = (oldDf.schema.map(_.name) ++ newDf.schema.map(_.name))
      .distinct.sorted
    def stats(df: DataFrame, prefix: String): DataFrame = {
      val names = df.schema.map(_.name)
      df.agg(count(lit(1)).as(s"${prefix}_n"),
        names.map(c =>
          count(when(col(c).isNull, 1)).as(s"${prefix}_nc_$c")): _*)
    }
    val joined = stats(oldDf, "o").crossJoin(broadcast(stats(newDf, "n")))
    def ppm(prefix: String, c: String): Column =
      if ((if (prefix == "o") oT else nT).contains(c))
        when(col(s"${prefix}_n") > 0,
          expr(s"${prefix}_nc_$c * 1000000 div ${prefix}_n"))
          .otherwise(lit(0L))
      else lit(null).cast(LongType)
    val rows = cols.map { c =>
      val status = (oT.get(c), nT.get(c)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a != b => "type_changed"
        case _ => "kept"
      }
      struct(lit(c).as("column"), lit(status).as("status"),
        lit(oT.get(c).orNull).cast("string").as("old_type"),
        lit(nT.get(c).orNull).cast("string").as("new_type"),
        ppm("o", c).as("old_null_ppm"), ppm("n", c).as("new_null_ppm"))
    }
    joined.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column").as("column"), col("r.status").as("status"),
        col("r.old_type").as("old_type"), col("r.new_type").as("new_type"),
        col("r.old_null_ppm").as("old_null_ppm"),
        col("r.new_null_ppm").as("new_null_ppm"))
  }

  /** k-anonymity audit — the governance check next to the PII
    * redactor ([[piiSignals]] removes direct identifiers; this
    * measures whether QUASI-identifier combinations still single
    * people out): a released row is k-anonymous when at least k rows
    * share its full quasi-identifier tuple. Reports how much of the
    * dataset violates that, plus the smallest equivalence class.
    * NULL quasi-values form their own class (GROUP BY NULL-equality,
    * identical in both engines).
    *
    * Shape at 100 TB: one shuffle collapses rows to the
    * quasi-tuple count relation (map-side partials make the exchange
    * class-sized), then a one-row aggregate over it. Nothing ever
    * materializes a class's rows. */
  def kAnonymityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    val g = df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("c"))
    g.agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("c") < k, col("c"))), lit(0L))
          .as("n_violating_rows"),
        count(when(col("c") < k, 1)).as("n_violating_groups"),
        min(col("c")).as("min_group"))
      .select(col("n_rows"), col("n_groups"), lit(k.toLong).as("k"),
        col("n_violating_groups"), col("n_violating_rows"),
        col("min_group"),
        when(col("n_rows") > 0,
          expr("n_violating_rows * 1000000 div n_rows"))
          .otherwise(lit(0L)).as("violating_ppm"))
  }

  /** Deterministic weighted sample WITHOUT replacement — Efraimidis &
    * Spirakis's A-ES (IPL 97(5), 2006) with the randomness replaced
    * by the house md5 hash: row priority `u^(1/w)` becomes, in log
    * space, minimizing `cost = (−ln u)·/w` — computed as the INTEGER
    * `(−lnu_micro)·1000 div w` so both engines order identically
    * (the negation keeps the numerator nonnegative: Spark's `div`
    * truncates toward zero where the oracle engine's `//` floors —
    * they agree only on nonnegative operands). `u` is the salted
    * 60-bit hash folded to (0, 10⁶] millionths; the single `ln` rides
    * the accepted ~1-ulp libm caveat (the q67 convention).
    *
    * Rows with weight ≤ 0 are never sampled (stated, filtered).
    *
    * Shape at 100 TB: map-only cost column + bounded top-n
    * (TakeOrdered: per-partition heap then a driver merge of n·P
    * candidates — no global sort, no full shuffle). Deterministic
    * across runs, engines, and partitionings, unlike rand()-weighted
    * reservoir implementations. */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val u = md5Hash60(concat(lit("wsamp:"), col(idCol).cast("string"))) %
      1000000L + 1L
    df.withColumn("_w", weight.cast(LongType))
      .filter(col("_w") > 0)
      .withColumn("_lnu",
        round(log(u.cast("double") / 1e6) * 1e6).cast(LongType))
      .withColumn("cost_nano", expr("(-_lnu) * 1000 div _w"))
      .orderBy(col("cost_nano").asc, col(idCol).asc)
      .limit(n)
      .select(col(idCol), col("_w").as("weight"), col("cost_nano"))
  }

  /** WINSORIZE — clamp a value to its group's exact [pLow, pHigh]
    * percentile band: the outlier-taming transform every robust
    * statistic wants upstream (a mean over winsorized lengths is not
    * dragged by one pathological document; dropping the outliers
    * instead would bias the count). Calibration ([[calibrateScores]])
    * re-maps the whole distribution; this touches ONLY the tails,
    * and the row count never changes.
    *
    * Thresholds are the EXACT per-group order statistics from the
    * K137 histogram-prefix machinery (`Analytics.exactPercentiles` —
    * label reuse, not a reimplementation), pivoted to a
    * groups-sized (lo, hi) relation and broadcast back onto the
    * rows: one histogram shuffle, one map-only clamp, no sort, no
    * per-group buffering. Output: every input row with its original
    * and clamped value plus the band — hash-sensitive to the exact
    * clamping, not just counts. */
  def winsorize(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      value: Column,
      pLow: Int,
      pHigh: Int): DataFrame = {
    require(1 <= pLow && pLow < pHigh && pHigh <= 100,
      s"need 1 <= pLow < pHigh <= 100: $pLow/$pHigh")
    val rows = df.select(col(idCol),
      col(keyCol).cast("string").as("key"), value.cast(LongType).as("v"))
      .filter(col("v").isNotNull)
    val bands = Analytics.exactPercentiles(rows, "key", col("v"),
      Seq(pLow, pHigh))
    val lim = bands.groupBy(col("key"))
      .agg(max(when(col("pct") === pLow, col("value"))).as("lo"),
        max(when(col("pct") === pHigh, col("value"))).as("hi"))
    rows.join(broadcast(lim), Seq("key"))
      .select(col(idCol), col("key"), col("v"),
        greatest(col("lo"), least(col("hi"), col("v"))).as("v_clipped"),
        col("lo"), col("hi"))
  }

  /** BLOCKLIST TERM GATE — the unsafe-content screen every production
    * curation pass runs before anything model-based: per document,
    * the exact count and ppm density of tokens from a (small, plan-
    * literal) blocklist, and the gate verdict at `maxHitPpm`. The
    * blocklist folds into generated code as an array literal — one
    * map-only pass, no join, no shuffle beyond nothing; at 100 TB
    * this is a free rider on whatever scan reads the text anyway.
    * Token convention: whitespace split of the lowercased trimmed
    * text, empties dropped (the [[TextDedup.normWordSet]] family).
    * Empty documents have density 0 and pass. */
  def blocklistGate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blocklist: Seq[String],
      maxHitPpm: Long): DataFrame = {
    require(blocklist.nonEmpty, "blocklistGate needs a non-empty blocklist")
    require(blocklist.size <= 10000,
      s"blocklist has ${blocklist.size} terms; a list this large should " +
        "be a broadcast-joined relation, not a plan literal")
    require(maxHitPpm >= 0, s"maxHitPpm must be >= 0: $maxHitPpm")
    val bl = array(blocklist.map(t => lit(t.toLowerCase)): _*)
    val toks = filter(words(lower(trim(col(textCol)))), t => t =!= "")
    docs.select(col(idCol),
        size(toks).cast(LongType).as("n_tokens"),
        size(filter(toks, t => array_contains(bl, t))).cast(LongType)
          .as("n_hits"))
      .select(col(idCol), col("n_tokens"), col("n_hits"),
        when(col("n_tokens") > 0,
          expr("n_hits * 1000000 div n_tokens")).otherwise(lit(0L))
          .as("hit_ppm"))
      .withColumn("blocked", col("hit_ppm") > maxHitPpm)
  }

  /** CONFORMAL QUALITY-GATE CALIBRATION — turn "keep the best X% by
    * this score" into a NUMERIC threshold with a measured coverage
    * audit, the way a production gate is actually deployed (the
    * threshold ships; the percentile doesn't). Rows split
    * deterministically into a calibration half and an evaluation half
    * (md5 of the id — the q51 sampler convention); per group the
    * threshold is the k-th LARGEST calibration score with
    * k = max(1, n_calib·keepPpm div 10⁶) (an exact order statistic,
    * ties by id), and the evaluation half reports realized coverage
    * of `score >= threshold` — which can exceed the target when the
    * threshold value is tied (stated; the audit is the point).
    *
    * Shape at 100 TB: the calibration half collapses to a per-(group,
    * score) COUNT relation in one shuffle (map-side partials), and the
    * order-statistic threshold comes from a descending cumulative
    * window over THAT — the K149 equi-depth discipline: windows over
    * per-group score SUPPORT, never per-group rows, so no task ever
    * sorts a group's corpus. The k-th-largest ROW value and the first
    * score whose descending cumulative count reaches k are the same
    * number, so the histogram form is output-identical to a
    * row_number rank. Thresholds are a groups-sized relation
    * broadcast back; the audit is one rollup. */
  def conformalThreshold(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      score: Column,
      keepPpm: Long): DataFrame = {
    require(keepPpm >= 1 && keepPpm <= 1000000,
      s"keepPpm must be in [1, 1e6]: $keepPpm")
    val base = df.select(col(groupCol).as("g"), col(idCol).as("_id"),
        score.cast(LongType).as("_s"))
      .filter(col("g").isNotNull && col("_s").isNotNull)
      .withColumn("_calib",
        md5Hash60(concat(lit("conf:"), col("_id").cast("string"))) % 2 === 0)
    val hist = base.filter(col("_calib"))
      .groupBy(col("g"), col("_s"))
      .agg(count(lit(1)).as("_c"))
    val cumW = Window.partitionBy(col("g")).orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val thresholds = hist
      .withColumn("_cum", sum(col("_c")).over(cumW))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col("g"))))
      .withColumn("_k", greatest(lit(1L), expr(s"_n * $keepPpm div 1000000")))
      // first (largest) score whose descending cumulative count reaches
      // k = the k-th largest row value
      .filter(col("_cum") >= col("_k") && col("_cum") - col("_c") < col("_k"))
      .select(col("g"), col("_n").as("n_calib"), col("_s").as("threshold"))
    val eval = base.filter(!col("_calib"))
      .join(thresholds, Seq("g"))
      .groupBy(col("g"), col("n_calib"), col("threshold"))
      .agg(count(lit(1)).as("n_eval"),
        count(when(col("_s") >= col("threshold"), 1)).as("n_kept"))
    eval.select(col("g").as(groupCol), col("n_calib"), col("threshold"),
      col("n_eval"), col("n_kept"),
      expr("n_kept * 1000000 div greatest(n_eval, 1)").as("kept_ppm"))
  }

  /** ROLLING-ORIGIN CROSS-VALIDATION FOLDS — the time-series
    * evaluation protocol next to the q258 temporal embargo split: an
    * EXPANDING training window with a fixed-length test horizon
    * rolled forward `nFolds` times across the corpus's day span.
    * Fold i (1-based) trains on days [minDay, cut_i) and tests on
    * [cut_i, cut_i + horizonDays), with cut_i = minDay +
    * ceil(span·i / (nFolds+1)) in days — the classic scheme where
    * every test day is strictly after every training day of its fold
    * (no temporal leakage by construction) and later folds subsume
    * earlier training windows. Day spans come from ONE day rollup;
    * fold boundaries are arithmetic over that rollup — corpus rows
    * are touched exactly once, folds are (nFolds × days)-joined on a
    * days-sized relation. Output per fold: the boundary dates and
    * exact train/test row counts (a fold whose test window falls
    * past the data reports n_test 0 — visible, not dropped). */
  def rollingOriginFolds(
      df: DataFrame,
      tsCol: Column,
      nFolds: Int,
      horizonDays: Int): DataFrame = {
    require(nFolds >= 1 && nFolds <= 100, s"nFolds must be in [1,100]: $nFolds")
    require(horizonDays >= 1, s"horizonDays must be >= 1: $horizonDays")
    val days = df.select(tsCol.cast("date").as("d"))
      .filter(col("d").isNotNull)
      .groupBy(col("d")).agg(count(lit(1)).as("c"))
    val span = days.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("d0"), (datediff(col("d1"), col("d0")) + 1).as("span"))
    val folds = span.crossJoin(
        df.sparkSession.range(1, nFolds + 1).select(col("id").as("fold")))
      .select(col("fold"), col("d0"),
        expr(s"(span * fold + ${nFolds + 1} - 1) div ${nFolds + 1}")
          .as("_cut"))
      .select(col("fold"),
        col("d0").as("train_from"),
        date_add(col("d0"), col("_cut").cast("int")).as("test_from"),
        date_add(col("d0"), (col("_cut") + lit(horizonDays)).cast("int"))
          .as("test_until"))
    folds.join(days,
        col("d") < col("test_until"), "left")
      .groupBy(col("fold"), col("train_from"), col("test_from"),
        col("test_until"))
      .agg(
        coalesce(sum(when(col("d") < col("test_from"), col("c"))), lit(0L))
          .as("n_train"),
        coalesce(sum(when(col("d") >= col("test_from"), col("c"))), lit(0L))
          .as("n_test"))
  }

  /** TEMPERATURE-0.5 MIXTURE PLAN — the multilingual-pretraining
    * rebalance (the √-share rule from the multilingual-LM lineage):
    * tempered target shares ∝ √(source share) lift low-resource
    * sources without letting any head source dominate. K59's planner
    * takes targets as INPUT; this one DERIVES them. Exactness
    * discipline: the ONLY non-integer op is one correctly-rounded
    * IEEE sqrt per source (√(n_k·10¹² div N), rounded to a long);
    * target shares renormalize exactly off those longs, the
    * achievable total is the bottleneck source's exact ceiling
    * C = min_k(n_k·10⁶ div target_k), and keep rates are
    * half-up-rounded exact integers —
    * the bottleneck source keeps everything to the nearest row
    * (exactly 10⁶ whenever its target share ≤ 50%, the always-true
    * case for a real multi-source corpus), every other source
    * downsamples. One source rollup; sources-sized
    * everything after. */
  def temperatureMixture(
      df: DataFrame,
      sourceCol: String): DataFrame = {
    val counts = df.select(col(sourceCol).cast("string").as("src"))
      .filter(col("src").isNotNull)
      .groupBy(col("src")).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("nn"))
    // share quantized to exact ppm BEFORE the sqrt (stated), so the
    // sqrt input n_rows*1e6 div nn * 1e6 <= 1e12 never wraps at any
    // corpus size with sources up to ~9.2e12 rows
    val raw = counts.crossJoin(broadcast(tot))
      .select(col("src"), col("n_rows"), col("nn"),
        round(sqrt(expr("(n_rows * 1000000 div nn) * 1000000")
          .cast("double"))).cast(LongType).as("_raw"))
    val rawTot = raw.agg(sum(col("_raw")).as("rt"))
    val targets = raw.crossJoin(broadcast(rawTot))
      .select(col("src"), col("n_rows"), col("nn"),
        expr("_raw * 1000000 div rt").as("target_ppm"))
    // achievable total under the bottleneck source (exact rows)
    val ceiling = targets
      .agg(min(expr("n_rows * 1000000 div greatest(target_ppm, 1)"))
        .as("cap"))
    // target_ppm * cap div 1e6 without the 64-bit wrap a direct
    // product hits past ~9.2e12 total rows: split cap into
    // 1e6-quotient and remainder — floor(t*(a*1e6+b)/1e6) = t*a +
    // floor(t*b/1e6), each term provably in range
    targets.crossJoin(broadcast(ceiling))
      .withColumn("n_keep_expected",
        expr("""least(n_rows,
                 target_ppm * (cap div 1000000)
                 + (target_ppm * (cap % 1000000) + 500000) div 1000000)"""))
      .select(col("src").as(sourceCol), col("n_rows"),
        expr("n_rows * 1000000 div nn").as("share_ppm"),
        col("target_ppm"),
        least(lit(1000000L),
          expr("n_keep_expected * 1000000 div n_rows")).as("keep_rate_ppm"),
        col("n_keep_expected"))
  }

  /** PREFERENCE-PAIR ASSEMBLY — the DPO/RLHF dataset builder: per
    * prompt group, the best-scoring candidate becomes `chosen`, the
    * worst `rejected`, and the pair ships only when the score margin
    * clears `minMargin` (a pair the scorer can barely separate
    * teaches the wrong thing) and the group actually has two distinct
    * candidates. Ties break to the SMALLEST id on both sides
    * (deterministic across runs/partitionings); a group whose best
    * and worst tie end-to-end (margin 0 with minMargin 0) still
    * requires chosen ≠ rejected, so single-candidate groups never
    * emit. NULL scores/ids drop (stated).
    *
    * Shape at 100 TB: ONE groupBy on the prompt key carrying two
    * struct-extrema — no per-group candidate list ever materializes,
    * no window sort; output is prompts-sized. */
  def preferencePairs(
      df: DataFrame,
      promptCol: String,
      idCol: String,
      score: Column,
      minMargin: Long = 0L): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0: $minMargin")
    val q = df.select(col(promptCol).as("prompt"),
        col(idCol).cast(LongType).as("_id"),
        score.cast(LongType).as("_s"))
      .filter(col("prompt").isNotNull && col("_id").isNotNull &&
        col("_s").isNotNull)
    q.groupBy(col("prompt"))
      .agg(count(lit(1)).as("n_candidates"),
        max(struct(col("_s").as("s"), (-col("_id")).as("ni"))).as("_ch"),
        min(struct(col("_s").as("s"), col("_id").as("i"))).as("_rj"))
      .select(col("prompt"), col("n_candidates"),
        (-col("_ch.ni")).as("chosen_id"), col("_rj.i").as("rejected_id"),
        col("_ch.s").as("chosen_score"), col("_rj.s").as("rejected_score"),
        (col("_ch.s") - col("_rj.s")).as("margin"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)
  }
}
