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

  /** Element-wise float→double (exact), then fixed-order dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x))

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
    * md5-derived integer — identical in the DuckDB mirror. */
  private def planeSign(b: Int, d: Column): Column =
    when(TextDedup.md5Hash60(concat(lit(s"hp-$b-"), d.cast("string"))) % 2 === 1,
      lit(1.0)).otherwise(lit(-1.0))

  /** Sign-random-projection bucket id (nbits-bit LSH signature). */
  def signRandomProjection(vec: Column, dims: Int, nbits: Int): Column =
    (0 until nbits).map { b =>
      val proj = aggregate(sequence(lit(0), lit(dims - 1)), lit(0.0),
        (acc, d) => acc + element_at(vec, d + 1).cast(DoubleType) * planeSign(b, d))
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

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
