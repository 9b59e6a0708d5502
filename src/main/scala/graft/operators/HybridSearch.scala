package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
}
