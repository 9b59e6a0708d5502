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
}
