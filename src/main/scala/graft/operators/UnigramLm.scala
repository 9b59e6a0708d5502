package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextDedup.words

/** Unigram-LM tokenizer (SentencePiece-style; Kudo 2018,
  * arXiv:1804.10959) — the OTHER tokenizer family real pipelines
  * compare against BPE: pieces carry probabilities and a document
  * segments to the MAXIMUM-LIKELIHOOD piece sequence (Viterbi over the
  * word lattice), where BPE replays a fixed merge order. The two
  * disagree on designed inputs (UnigramVsBpeSpec) and on real corpora.
  *
  * House determinism contract: a piece's probability quantizes to an
  * integer COST in micro-nats, `cost(p) = round(−ln(cnt_p/total)·1e6)`,
  * BEFORE any sum ([[TextAnalysis.unigramSurprisal]]'s convention — the
  * accepted ~1-ulp libm caveat applies only to the per-piece quantize;
  * everything downstream is exact integer DP: Viterbi minimizes the
  * integer cost sum, ties break by earliest split point, so Spark and
  * DuckDB walk bit-identical lattices).
  *
  * Training is hard EM over the VOCABULARY relation (Viterbi counts —
  * the standard practical approximation to full forward–backward EM):
  *   seed   = all length-1..[[maxPieceLen]] substrings of corpus words,
  *            frequency-weighted; every single char survives (coverage
  *            guarantee), multi-char pieces keep the top `seedMulti` by
  *            (count DESC, piece ASC);
  *   E-step = Viterbi-segment every vocab word under the current cost
  *            table (a plan-literal map — the centroid-literal pattern),
  *            count pieces weighted by word frequency;
  *   M-step = re-quantize costs from the new counts (single-char counts
  *            floor at 1 — add-one-style smoothing so ln stays finite;
  *            multi-char pieces that fell to zero drop).
  * Scale shape mirrors [[TextAnalysis.bpeTrain]] (K127): ONE corpus→
  * vocab shuffle, then every round is map-only segmentation over the
  * Zipf-bounded vocab plus one piece-sized rollup; only the ≤(seed)
  * piece table ever reaches the driver (boundedCollect-style require).
  *
  * Reference scope note: the reference pipeline (fxa-activity-metrics)
  * has no tokenizer; this extends the engine's LLM-pipeline surface
  * (SURVEY §2-K), like K125–K128.
  */
object UnigramLm {

  /** Shared constants — these drive BOTH the Spark plans and the
    * generated DuckDB oracle SQL (the minHashCoeffsSql discipline). */
  val MaxPieceLen = 4
  val SeedMulti = 60
  val EmRounds = 2

  /** Missing-piece costs: a char absent from the table is expensive
    * but FINITE (every position stays reachable), while a multi-char
    * miss is so dear it can never beat single-char coverage (yet still
    * sums without overflow: ≤ 4.2e17 + 64·1e13 < 2^63). */
  val MissSingle = 10000000000000L // 1e13
  val MissMulti = 400000000000000000L // 4e17

  /** Integer micro-nat cost of a piece with count `cnt` out of `total`
    * (single libm ln + one round — the stated quantize point). */
  def costMicro(cnt: Long, total: Long): Long = {
    require(total >= 1, s"costMicro: empty piece table (total=$total)")
    math.round(-math.log(math.max(cnt, 1L).toDouble / total.toDouble) * 1e6)
  }

  /** Viterbi segmentation of one word under a cost map literal:
    * array<string> of the minimum-total-cost piece sequence, ties by
    * earliest split (smallest predecessor position, scanned ascending
    * with strict <). Pure higher-order column expression — no UDF, no
    * explode; the DP array lives inside one `aggregate` per word. */
  def segment(word: Column, costs: Column, maxPieceLen: Int): Column = {
    val inf = lit(Long.MaxValue / 2)
    val missCost = (pieceLen: Column) =>
      when(pieceLen === 1, lit(MissSingle)).otherwise(lit(MissMulti))
    // dp(i) at element i+1: struct(c = min cost of word[0,i), bp = the
    // argmin predecessor position j (piece = word[j, i)))
    val dp = aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0L).as("c"), lit(0).as("bp"))),
      (acc, i) => concat(acc, array(aggregate(
        sequence(greatest(lit(0), i - maxPieceLen), i - 1),
        struct(inf.as("c"), lit(-1).as("bp")),
        (best, j) => {
          val piece = word.substr(j + 1, i - j)
          val pc = coalesce(element_at(costs, piece), missCost(i - j))
          val cand = element_at(acc, j + 1).getField("c") + pc
          when(cand < best.getField("c"),
            struct(cand.as("c"), j.cast("int").as("bp")))
            .otherwise(best)
        }))))
    // backtrack from position L over bp; at most L steps
    aggregate(
      sequence(lit(1), length(word)),
      struct(length(word).cast("int").as("p"),
        array().cast("array<string>").as("ts")),
      (st, _) => {
        val p = st.getField("p")
        val bp = element_at(dp, p + 1).getField("bp")
        when(p > 0,
          struct(bp.as("p"),
            concat(array(word.substr(bp + 1, p - bp)), st.getField("ts"))
              .as("ts")))
          .otherwise(st)
      },
      st => st.getField("ts"))
  }

  private def costMapLit(table: Seq[(String, Long)]): Column =
    map(table.flatMap { case (p, c) => Seq(lit(p), lit(c)) }: _*)

  /** Train on a corpus: returns (piece, weighted_count, cost_micro) —
    * counts from the LAST E-step, costs from the final M-step — in
    * (count DESC, piece ASC) order, ready for [[encode]]. */
  def train(
      docs: DataFrame,
      textCol: String,
      rounds: Int = EmRounds,
      maxPieceLen: Int = MaxPieceLen,
      seedMulti: Int = SeedMulti): Seq[(String, Long, Long)] = {
    require(rounds >= 1 && rounds <= 16, s"rounds in [1,16]: $rounds")
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen in [2,16]: $maxPieceLen")
    // (A round-15 spread/re-widen pass here was tried and REVERTED:
    // the vocab is Zipf-tiny and the tokenizer family benched slower
    // with the extra exchanges — q246 2.85 s -> 4.15 s at sf0.1.)
    val vocab = docs
      .select(explode(words(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // the one corpus-sized pass (bpeTrain contract)
    // seed: every substring occurrence of length 1..maxPieceLen,
    // frequency-weighted (overlaps count — occurrence statistics)
    val subs = vocab.select(col("n"), explode(flatten(
        transform(sequence(lit(0), length(col("word")) - 1), j =>
          transform(sequence(lit(1),
              least(lit(maxPieceLen), length(col("word")) - j)), k =>
            col("word").substr(j + 1, k))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
    def collectPieces(df: DataFrame, bound: Int, what: String) = {
      val rows = df.limit(bound + 1).collect()
      require(rows.length <= bound, s"$what exceeds $bound pieces")
      rows.map(r => r.getString(0) -> r.getLong(1)).toSeq
    }
    val singles0 = collectPieces(
      subs.filter(length(col("piece")) === 1)
        .orderBy(col("cnt").desc, col("piece")),
      4096, "unigramTrain: alphabet")
    val multi0 = collectPieces(
      subs.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(seedMulti),
      seedMulti, "unigramTrain: seed pieces")
    var counts: Seq[(String, Long)] = singles0 ++ multi0
    val alphabet = singles0.map(_._1).toSet
    for (_ <- 1 to rounds) {
      val total = counts.map { case (p, c) => math.max(c, 1L) }.sum
      val costTable = counts.map { case (p, c) => p -> costMicro(c, total) }
      val costs = costMapLit(costTable)
      val eCounts = vocab
        .select(col("n"),
          explode(segment(col("word"), costs, maxPieceLen)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      val used = collectPieces(
        eCounts.orderBy(col("cnt").desc, col("piece")),
        4096 + seedMulti, "unigramTrain: E-step pieces").toMap
      // singles persist (coverage); multi-char pieces that fell out drop
      counts = counts.flatMap { case (p, _) =>
        val c = used.getOrElse(p, 0L)
        if (p.length == 1 || c > 0) Some(p -> c) else None
      }
    }
    val total = counts.map { case (_, c) => math.max(c, 1L) }.sum
    counts
      .map { case (p, c) => (p, c, costMicro(c, total)) }
      .sortBy { case (p, c, _) => (-c, p) }
  }

  /** Apply a trained table: Viterbi-segment the corpus's DISTINCT
    * words once (the lattice cost amortizes over word frequency — the
    * Zipf shape that makes tokenizers trainable at all), then join the
    * per-word segmentations back to the (doc, position, word) relation
    * and reassemble in order. At 100 TB this is the only sane plan:
    * the lattice DP never runs per occurrence, the corpus shuffles
    * once on the word key (AQE broadcasts the vocab side when small),
    * and the doc-keyed rollup is the second and last exchange.
    * Output: (doc_id, n_ws_tokens, n_tokens, tokens '|'-joined,
    * cost_micro = exact integer sum). */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      table: Seq[(String, Long, Long)],
      maxPieceLen: Int = MaxPieceLen): DataFrame = {
    require(table.nonEmpty, "unigramEncode needs a non-empty table")
    val costs = costMapLit(table.map { case (p, _, m) => p -> m })
    val occ = docs.select(col(idCol).as("doc_id"),
        posexplode(filter(words(col(textCol)), w => w =!= ""))
          .as(Seq("wi", "word")))
    val segd = occ.select(col("word")).distinct()
      .withColumn("_ts", segment(col("word"), costs, maxPieceLen))
      .withColumn("_wcost", aggregate(col("_ts"), lit(0L),
        (acc, t) => acc + coalesce(element_at(costs, t),
          when(length(t) === 1, lit(MissSingle)).otherwise(lit(MissMulti)))))
    val perDoc = occ.join(segd, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws_tokens"),
        sum(size(col("_ts"))).cast("long").as("n_tokens"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("wi"), col("_ts")))),
          s => s.getField("_ts"))), "|").as("tokens"),
        sum(col("_wcost")).as("cost_micro"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_ws_tokens"), lit(0L)).as("n_ws_tokens"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("tokens"), lit("")).as("tokens"),
        coalesce(col("cost_micro"), lit(0L)).as("cost_micro"))
  }
}
