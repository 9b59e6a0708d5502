package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Hybrid retrieval: fuse any number of per-query rankings (lexical,
  * vector, …) with reciprocal-rank fusion. RRF is the standard fusion
  * for heterogeneous retrievers because it needs NO score calibration —
  * only ranks — and a document strong in either modality surfaces.
  *
  * Determinism: contributions are integer micro-points,
  * `1000000 div (k0 + rank)`, so sums commute and a DuckDB `//` oracle
  * matches bit-for-bit — no floating point anywhere in the fusion.
  *
  * Scale shape: each input ranking is already top-N per query (bounded
  * rows); fusion is one union + one (qid, id)-keyed aggregation over
  * ≤ N·retrievers rows per query, and the final per-query top-k goes
  * through the bounded `graft_topk` heap.
  */
object HybridSearch {

  /** Fuse rankings — each `(qid, id, r)` with `r` the 1-based rank —
    * into `(qid, rank, id, rrf_micro)`, top `k` per query by
    * (rrf_micro DESC, id). `k0` is the standard RRF damping constant. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val pts = rankings.map(df =>
      df.select(col("qid"), col("id"),
        expr(s"CAST(1000000 div ($k0 + r) AS BIGINT)").as("pts")))
    pts.reduce(_ unionByName _)
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("pts")).as("rrf_micro"))
      .groupBy(col("qid"))
      .agg(call_function("graft_topk",
        col("rrf_micro").cast("double"), col("id"), lit(k)).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).cast(LongType).as("rank"),
        col("e.id").as("id"), col("e.ord").cast(LongType).as("rrf_micro"))
  }

  /** Inverted-index lexical retrieval: per-query top-`k` corpus docs by
    * set Jaccard, WITHOUT ever scoring a (query, doc) pair that shares
    * no token. The scan form (score every pair against every doc) is
    * quadratic in the query load; this is the IR-textbook shape that
    * survives 100 TB:
    *
    *  1. explode the corpus word sets into (token, id, dlen) POSTINGS —
    *     map-only, one row per corpus token occurrence;
    *  2. explode the query word sets the same way and join on token —
    *     only postings for tokens some query contains flow on; the
    *     query side is orders of magnitude smaller, so AQE broadcasts
    *     it at real scale (no forced hint, per the r5 lesson);
    *  3. count matched tokens per (qid, id) — map-side partial count,
    *     the ONLY corpus-sized shuffle, keyed by pair;
    *  4. Jaccard from the counted overlap: |A∩B| / (|A|+|B|−|A∩B|) —
    *     identical arithmetic to the scan form's intersect/union, so
    *     ranked output matches it wherever the top-k is positive-score;
    *  5. per-query top-k through the bounded `graft_topk` heap (score
    *     DESC, id ASC — the q68 tie-break), never a global sort.
    *
    * Semantics vs the scan form: zero-overlap docs are NOT retrieved
    * (they have no posting match to generate a row). That is the
    * correct retrieval contract — a document sharing no token is not a
    * result — and the only observable difference: a query with fewer
    * than `k` positive-Jaccard docs returns fewer than `k` rows where
    * the scan form pads with zero-score ids.
    *
    * Inputs: `queries` = (qid BIGINT, qws ARRAY<token>), `corpus` =
    * (id BIGINT, ws ARRAY<token>) — tokens hashed or raw, as long as
    * both sides agree (TextDedup.normWordSet→md5Hash60 is the repo
    * convention). Output: (qid, id, r, jac), r the 1-based rank —
    * directly consumable by [[rrfFuse]]. */
  def lexicalTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val post = corpus.select(col("id"), size(col("ws")).as("dlen"),
      explode(col("ws")).as("tok"))
    val qpost = queries.select(col("qid"), size(col("qws")).as("qlen"),
      explode(col("qws")).as("tok"))
    val overlap = post.join(qpost, Seq("tok"))
      .groupBy(col("qid"), col("id"))
      // qlen/dlen are functionally determined by the group key — first()
      // is deterministic here, and carrying them through the aggregate
      // saves two re-joins against the size maps.
      .agg(count(lit(1)).as("ov"),
        first(col("qlen")).as("qlen"), first(col("dlen")).as("dlen"))
    val scored = overlap.select(col("qid"), col("id"),
      round(col("ov").cast(DoubleType) /
        (col("qlen") + col("dlen") - col("ov")).cast(DoubleType), 6).as("jac"))
    scored.groupBy(col("qid"))
      .agg(call_function("graft_topk",
        col("jac"), col("id"), lit(k)).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("id"),
        (col("pos") + 1).cast(LongType).as("r"), col("e.ord").as("jac"))
  }

  /** BM25 retrieval over the same inverted-index shape as
    * [[lexicalTopK]] — the scoring real lexical search ranks by (term
    * saturation + length normalization + rarity weighting), where
    * Jaccard is the dedup-style overlap measure:
    *
    *   score(q,d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *   idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))       (Lucene form)
    *
    * Determinism across engines: a per-(query, doc) SUM of doubles is
    * aggregation-order-dependent, so each matched term's contribution
    * quantizes to integer MICRO-points (round(·1e6) as BIGINT) before
    * the sum — the q67 surprisal discipline; integer addition commutes,
    * and the oracle mirrors the arithmetic with identical
    * parenthesization. (Same accepted cross-libm `ln` caveat as q67.)
    *
    * Scale shape: ONE corpus pass builds tf postings (the (doc, token)
    * aggregation shuffle); document frequencies come from a window
    * count over those postings keyed by token — a second exchange of
    * the already-aggregated postings, NOT a second corpus scan (a
    * dfreq self-join would re-execute the corpus explode+aggregate:
    * Catalyst does not dedupe repeated subplans without persist).
    * N/avgdl are a one-row broadcast; query terms join the postings;
    * the per-pair integer sum combines map-side and the per-query
    * top-k is the bounded `graft_topk` heap.
    *
    * Inputs: `queries` = (qid, qtoks ARRAY — duplicates ignored, query
    * tf is 1 per the standard short-query simplification), `corpus` =
    * (id, toks ARRAY — duplicates are the term frequencies). Output:
    * (qid, id, r, bm25_micro). */
  def bm25TopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val post = corpus
      .select(col("id"), size(col("toks")).as("dl"), explode(col("toks")).as("tok"))
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      // df from a window, not a dfreq self-join: the postings plan
      // executes ONCE (see docstring)
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))))
    val stats = corpus.agg(
      count(lit(1)).as("n_docs"),
      avg(size(col("toks")).cast(DoubleType)).as("avgdl"))
    val qt = queries.select(col("qid"), explode(array_distinct(col("qtoks"))).as("tok"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfp = (col("tf") * lit(k1 + 1.0)).cast(DoubleType) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val contrib = round(idf * tfp * lit(1e6), 0).cast(LongType)
    post.join(qt, Seq("tok"))
      .crossJoin(broadcast(stats)) // one row: corpus-level N and avgdl
      .select(col("qid"), col("id"), contrib.as("c_micro"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("c_micro")).as("bm25_micro"))
      .groupBy(col("qid"))
      .agg(call_function("graft_topk",
        col("bm25_micro").cast(DoubleType), col("id"), lit(k)).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("id"),
        (col("pos") + 1).cast(LongType).as("r"),
        col("e.ord").cast(LongType).as("bm25_micro"))
  }

  /** RETRIEVAL TRAINING-PAIR BUILDER — the contrastive-training feed a
    * retrieval pipeline mines from its own index: per query a positive
    * (pseudo-relevance top-1), `kHard` HARD negatives (the next ranks —
    * lexically close but not the match, the pairs that actually teach
    * the margin) and `kRand` RANDOM negatives drawn deterministically
    * from a BOUNDED corpus pool, excluding anything the retriever
    * surfaced.
    *
    * The random draw is the scale-critical part: per-query sampling of
    * the full corpus would be a queries × corpus product. Instead the
    * corpus reduces ONCE to a `poolSize` candidate pool through the
    * bounded `graft_topk` heap on a global salt hash (map-side
    * combine, ≤ poolSize entries per partition cross the exchange),
    * and each query ranks only that broadcast pool by its own
    * query-salted hash — queries × poolSize rows, constant per query.
    * Hashes are 52-bit (double-exact through the heap's DOUBLE score,
    * the md5Hash52 contract).
    *
    * Input `retrieved` is any (qid, id, r) ranking (lexical, BM25,
    * fused); `corpus` is (id). Output: (qid, id, role, pair_rank) with role
    * ∈ pos | hard_neg | rand_neg, pair_rank 1-based within role. */
  def trainingPairs(
      retrieved: DataFrame,
      corpus: DataFrame,
      kHard: Int,
      kRand: Int,
      poolSize: Int = 256): DataFrame = {
    require(kHard >= 1 && kRand >= 1, s"need kHard, kRand >= 1")
    require(poolSize >= kRand,
      s"poolSize ($poolSize) must cover kRand ($kRand)")
    val pos = retrieved.filter(col("r") === 1)
      .select(col("qid"), col("id"), lit("pos").as("role"),
        lit(1L).as("pair_rank"))
    val hard = retrieved
      .filter(col("r") >= 2 && col("r") <= kHard + 1)
      .select(col("qid"), col("id"), lit("hard_neg").as("role"),
        (col("r") - 1).cast(LongType).as("pair_rank"))
    val pool = corpus
      .agg(call_function("graft_topk",
        (-TextDedup.md5Hash52(concat(lit("pool:"),
          col("id").cast("string")))).cast(DoubleType),
        col("id").cast(LongType), lit(poolSize)).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id").as("id"))
    val qids = retrieved.select(col("qid")).distinct()
    val seen = retrieved.filter(col("r") <= kHard + 1)
      .select(col("qid"), col("id"))
    val rand = qids.crossJoin(broadcast(pool))
      .join(seen, Seq("qid", "id"), "left_anti")
      .groupBy(col("qid"))
      .agg(call_function("graft_topk",
        (-TextDedup.md5Hash52(concat(lit("neg:"),
          col("qid").cast("string"), lit(":"),
          col("id").cast("string")))).cast(DoubleType),
        col("id").cast(LongType), lit(kRand)).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("id"),
        lit("rand_neg").as("role"),
        (col("pos") + 1).cast(LongType).as("pair_rank"))
    pos.unionByName(hard).unionByName(rand)
  }
}
