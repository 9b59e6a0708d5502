package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join: points `p.ts ∈ [i.start, i.end)`.
  *
  * Spark has no native band join — the declarative form
  * (`p JOIN i ON p.ts >= i.start AND p.ts < i.end`) plans as a
  * broadcast nested loop: every point is tested against every
  * interval, O(|P|·|I|) at 100 TB. This operator discretizes time
  * into fixed-width buckets, EXPLODES each interval to the buckets it
  * overlaps, and equi-joins points on the bucket id before applying
  * the exact range predicate. Candidates shrink from the cross
  * product to per-bucket co-residents, and the join is a hash join
  * AQE can size and skew-split. Intervals spanning b buckets appear b
  * times on the build side — pick `bucketSeconds` near the typical
  * interval length so the blow-up stays ~2×.
  */
object RangeJoin {

  /** Join `points` (timestamp column `pointTs`) to `intervals`
    * (timestamp columns `startTs`/`endTs`, end exclusive). Output:
    * one row per (point, containing interval), with all columns of
    * both inputs. Empty intervals (end <= start) match nothing.
    *
    * The two inputs must have DISJOINT column names (alias/prefix one
    * side first) — enforced, since shared names would make the output
    * ambiguous. The bucket helper column is generated collision-proof
    * against both schemas. */
  def bucketed(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startTs: String, endTs: String,
      bucketSeconds: Long): DataFrame = {
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must have disjoint column names; " +
        s"shared: ${shared.mkString(", ")}")
    val bucket = Iterator.from(0)
      .map(n => if (n == 0) "__bucket" else s"__bucket_$n")
      .find(c => !points.columns.contains(c) && !intervals.columns.contains(c))
      .get
    val busPer = bucketSeconds * 1000000L // bucket width in microseconds
    val p = points.withColumn(bucket,
      expr(s"unix_micros($pointTs) div $busPer"))
    val i = intervals
      .filter(col(endTs) > col(startTs))
      .withColumn(bucket, explode(sequence(
        expr(s"unix_micros($startTs) div $busPer"),
        expr(s"(unix_micros($endTs) - 1) div $busPer"))))
    p.join(i, Seq(bucket))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop(bucket)
  }
}
