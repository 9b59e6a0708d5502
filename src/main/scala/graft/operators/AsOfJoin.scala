package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * the same key and `right.time <= left.time` (event-time point lookup —
  * "what was the last quote before this trade", "the last page view
  * before this purchase").
  *
  * Spark has no native as-of join, and the naive encoding —
  * `left JOIN right ON key AND r.t <= l.t` + a max-per-left reduction —
  * materializes every (left, earlier-right) combination before pruning:
  * quadratic per key, fatal at 100 TB. This operator never builds that
  * product. Shape:
  *
  *   1. union the two inputs as one tagged stream (left rows carry a
  *      null right-payload);
  *   2. one hash exchange on `key` — the only shuffle;
  *   3. one partition-local sort by (time, side, tiebreak);
  *   4. a running `last(payload, ignoreNulls)` window picks up the most
  *      recent right row at each left row. O(n log n) per partition,
  *      no join at all.
  *
  * AQE handles key skew by splitting oversized partitions (the window
  * is per-key, so any key's rows still co-locate).
  *
  * Determinism: among right rows with equal time the largest `tieCol`
  * wins; `inclusive` controls whether a right row at exactly the left
  * row's time is visible (ties between sides are broken by the `side`
  * sort column, so the choice is exact, not float-fuzzy).
  */
object AsOfJoin {

  /** @param left     probe side; all its columns survive
    * @param right    build side; only `payload` columns survive, as
    *                 `asof_<name>` (null when no right row qualifies)
    * @param key      equi-join key column (both sides)
    * @param time     event-time column (both sides, same type)
    * @param tie      deterministic tie-break column on the right side
    * @param payload  right-side columns to attach
    * @param inclusive when true, a right row at time == left.time matches
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tie: String,
      payload: Seq[String],
      inclusive: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // side sorts right rows before the left row at equal time iff inclusive
    val rightSide = if (inclusive) 0 else 2
    val p = struct(payload.map(col): _*)
    val r = right.select(
      col(key), col(time).as("_t"), lit(rightSide).as("_side"),
      col(tie).as("_tie"), p.as("_p"))
    val l = left.select(
      (Seq(col(key), col(time).as("_t"), lit(1).as("_side"),
        col(tie).as("_tie"), lit(null).cast(r.schema("_p").dataType).as("_p")) ++
        leftCols.map(c => col(c).as(s"_l_$c"))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.select(
        (Seq(col(key), col("_t"), col("_side"), col("_tie"), col("_p")) ++
          leftCols.map(c => lit(null).cast(l.schema(s"_l_$c").dataType).as(s"_l_$c"))): _*)
      .unionByName(l)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    matched.select(
      leftCols.map(c => col(s"_l_$c").as(c)) ++
        payload.map(c => col(s"_m.$c").as(s"asof_$c")): _*)
  }

  /** Column helper for callers composing their own variant: the running
    * most-recent-non-null over the tagged union (exposed for tests). */
  def lastIgnoreNulls(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    last(c, ignoreNulls = true).over(w)
}
