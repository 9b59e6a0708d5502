package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Exact cosine math runs in DOUBLE with a fixed left-to-right
  * summation order (`aggregate` over `zip_with`), which makes results
  * bit-reproducible — and mirrorable by a DuckDB oracle using
  * `list_sum(list_transform(...))` with the same ordering. Rankings
  * order by (round(cos, 6) DESC, id) so ties break identically across
  * engines.
  *
  * Scale paths:
  *  - [[bruteForceTopK]]: broadcast the (small) query set, one pass
  *    over the corpus, per-query top-k via a window — the baseline.
  *  - [[signRandomProjection]]: nbits deterministic ±1 hyperplanes
  *    (md5-parity signs) bucket the corpus; candidate sets shrink by
  *    ~2^nbits, trading recall — the 100 TB path (IVF-style: search
  *    only the query's bucket).
  */
object Similarity {

  /** Fixed-order float→double dot product via the native codegen
    * expression (graft.functions.ArrayDotProduct — ~50× the
    * interpreted `aggregate(zip_with(...))` form on all-pairs scans).
    * Requires GraftExtensions to be registered on the session
    * (GraftSession does this). */
  def dot(a: Column, b: Column): Column = call_function("graft_array_dot", a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Exact top-k neighbors for each query row (brute force baseline).
    * `queries` must be small (it is broadcast). */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (id, vec)
      k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        round(cosine(col("qvec"), col("vec")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane sign for (bit b, dim d): parity of an
    * md5-derived integer — identical in the DuckDB mirror
    * (`('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2`).
    * The sign depends only on the CONSTANTS (b, d), so it is computed
    * once driver-side and folded into a literal array at plan time —
    * the round-2 form re-evaluated md5 per row per (bit, dim): 384
    * interpreted digests per vector for a 6-bit/64-dim signature. */
  private def planeSign(b: Int, d: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hp-$b-$d".getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 1) 1.0f
    else -1.0f
  }

  /** Sign-random-projection bucket id (nbits-bit LSH signature): nbits
    * codegen'd dot products against plan-time ±1 literal arrays (±1 is
    * exact in float, so the double math matches the oracle's ±1.0). */
  def signRandomProjection(vec: Column, dims: Int, nbits: Int): Column =
    (0 until nbits).map { b =>
      val signs = lit((0 until dims).map(d => planeSign(b, d)).toArray)
      when(dot(vec, signs) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** [[bruteForceTopK]] with the per-query top-k done by the bounded
    * `graft_topk` heap aggregate instead of a window sort: partials
    * combine map-side and the exchange carries at most k entries per
    * (partition, query) — at 100 TB the window form shuffles and sorts
    * every scored candidate pair, this form never materializes them
    * past the map stage. Same output contract as [[bruteForceTopK]]. */
  def bruteForceTopKAgg(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (id, vec)
      k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        round(cosine(col("qvec"), col("vec")), 6).as("cos"))
    scored.groupBy(col("qid"))
      .agg(call_function("graft_topk", col("cos"), col("id"), lit(k)).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("id"), col("e.ord").as("cos"))
  }

  /** IVF cell assignment: argmax-cosine over a tiny centroid set that
    * is folded into the plan as LITERALS — so assignment is a pure
    * map (nlist codegen'd dot products per row, no explode, no
    * shuffle, no join). Ties break to the smaller centroid id, which a
    * DuckDB `row_number() OVER (... ORDER BY cos DESC, cid)` oracle
    * reproduces. Centroid norms are precomputed driver-side in the
    * same left-to-right double order as the oracle's `list_sum`. */
  def ivfAssign(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[(Long, Array[Float])]): DataFrame = {
    val scored = centroids.map { case (cid, cv) =>
      val cn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      struct(
        round(dot(col(vecCol), lit(cv)) / (col("__nrm") * lit(cn)), 6).as("c"),
        lit(-cid).as("negid"))
    }
    df.withColumn("__nrm", norm2(col(vecCol)))
      .withColumn("cell", greatest(scored: _*).getField("negid") * -1)
      .drop("__nrm")
  }

  /** IVF-style ANN: the corpus is partitioned into `centroids.size`
    * cells by [[ivfAssign]] (map-only); each query probes its `nprobe`
    * nearest cells and exact cosine runs ONLY inside probed cells —
    * ~nprobe/nlist of the corpus per query instead of all of it. The
    * per-query top-k goes through the bounded `graft_topk` heap, so
    * the exchange carries ≤ k entries per (partition, query).
    *
    * Centroids are caller-provided: deterministic seed vectors in the
    * oracle-gated query, or a [[lloydStep]]-refined set at scale
    * (train on a sample, then this probe path is unchanged). */
  def ivfTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame, // (id, vec)
      centroids: Seq[(Long, Array[Float])],
      nprobe: Int,
      k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = centroids.toDF("cid", "cvec")
    val wp = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(centDf))
      .select(col("qid"), col("qvec"), col("cid"),
        round(cosine(col("qvec"), col("cvec")), 6).as("c"))
      .withColumn("pr", row_number().over(wp)).filter(col("pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid").as("cell"))
    val scored = ivfAssign(corpus, "vec", centroids)
      .join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        round(cosine(col("qvec"), col("vec")), 6).as("cos"))
    scored.groupBy(col("qid"))
      .agg(call_function("graft_topk", col("cos"), col("id"), lit(k)).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("id"), col("e.ord").as("cos"))
  }

  /** One SPHERICAL Lloyd refinement step: reassign (map-only, via
    * [[ivfAssign]]) then set each cell's centroid to the renormalized
    * mean of its members' UNIT-normalized vectors. Assignment maximizes
    * cosine, and for a fixed assignment the unit vector maximizing
    * Σ cos(vᵢ, c) is exactly normalize(Σ vᵢ/‖vᵢ‖) — so total cosine
    * cost is non-increasing by the standard Lloyd argument (a raw
    * arithmetic mean only guarantees this for squared-Euclidean cost).
    * The per-dimension mean aggregates (cell, dim) partials map-side —
    * the explode never re-shuffles raw vectors. Float means are
    * summation-order dependent, so this is for TRAINING (where any
    * near-mean works), not for oracle-gated paths; the spec asserts
    * cost monotonicity, which the spherical update makes a theorem.
    * Empty and degenerate (zero-mean) cells keep their old centroid. */
  def lloydStep(
      corpus: DataFrame, // (id, vec)
      centroids: Seq[(Long, Array[Float])]): Seq[(Long, Array[Float])] = {
    val dims = centroids.head._2.length
    val means = ivfAssign(corpus, "vec", centroids)
      .select(col("cell"), col("vec"), norm2(col("vec")).as("__nrm"))
      .select(col("cell"), col("__nrm"), posexplode(col("vec")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(avg(col("x") / col("__nrm")).as("m"))
      .groupBy(col("cell"))
      .agg(map_from_arrays(collect_list(col("d")), collect_list(col("m"))).as("dm"))
      .collect()
      .flatMap { r =>
        val dm = r.getMap[Int, Double](1)
        val mean = Array.tabulate(dims)(d => dm(d))
        val n = math.sqrt(mean.foldLeft(0.0)((a, x) => a + x * x))
        if (n > 0.0) Some(r.getLong(0) -> mean.map(x => (x / n).toFloat))
        else None
      }.toMap
    centroids.map { case (cid, cv) => cid -> means.getOrElse(cid, cv) }
  }

  /** Deterministic twin of [[lloydStep]] for AUDIT paths: the same
    * spherical update, but each cell's member fold runs in ascending-id
    * order with double math, so the refined centroids are
    * bit-reproducible and mirrorable by a DuckDB oracle (list
    * aggregates walk ascending there too). The returned centroid is
    * the UNNORMALIZED per-dim sum of unit members cast to float —
    * cosine assignment is scale-invariant, so skipping the final
    * renormalize changes nothing and avoids a second cross-engine
    * rounding point. Collects one id-sorted member list per cell, so
    * cells must be modest (audit/sample scale, where Lloyd training
    * runs anyway); [[lloydStep]] is the distributed form for when cell
    * member lists would not fit. Empty cells keep their seed. */
  def lloydStepDeterministic(
      corpus: DataFrame, // (id, vec)
      centroids: Seq[(Long, Array[Float])]): Seq[(Long, Array[Float])] = {
    val dims = centroids.head._2.length
    val sums = ivfAssign(corpus, "vec", centroids)
      .withColumn("__n", norm2(col("vec")))
      .withColumn("nvec",
        transform(col("vec"), x => x.cast(DoubleType) / col("__n")))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("id"), col("nvec")))).as("ms"))
      .select(col("cell"), transform(sequence(lit(0), lit(dims - 1)),
        d => aggregate(col("ms"), lit(0.0),
          (acc, m) => acc + element_at(m.getField("nvec"), d + 1))).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray.map(_.toFloat))
      .toMap
    centroids.map { case (cid, cv) => cid -> sums.getOrElse(cid, cv) }
  }

  /** Bucketed ANN: top-k among same-bucket mates only, plus the bucket
    * population (candidate count actually scanned). */
  def lshTopK(
      queries: DataFrame, // (qid, qvec, qbucket)
      corpus: DataFrame, // (id, vec, bucket)
      k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries),
        col("qbucket") === col("bucket") && col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        round(cosine(col("qvec"), col("vec")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
