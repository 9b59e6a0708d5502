package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming daily rollups — the §2-E4 counts-generating queries as
  * Structured Streaming: 1-day tumbling windows (the `::DATE` bucket,
  * SURVEY §2-I "tumbling windows") with the same 25-hour allowed
  * lateness the batch pipeline's d+1 lookback implies. Distinct-user
  * counts use HLL `approx_count_distinct` — exact distinct is not
  * expressible incrementally without keeping every uid in state, which
  * is precisely why the reference materializes its `counts` table
  * upstream (SURVEY §2-E4 note).
  */
object StreamingRollups {

  /** Per-day active users + event volume over a streaming event frame
    * with columns (ts TIMESTAMP, user_id, event_type). */
  def dailyActiveUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "25 hours")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(
        approx_count_distinct("user_id").as("dau_approx"),
        count(lit(1)).as("n_events"))
      .select(to_date(col("w.start")).as("day"), col("dau_approx"), col("n_events"))

  /** Streaming exact dedup on an id column: duplicates arriving within
    * the watermark window are suppressed, and per-key state expires
    * with the watermark (bounded state — the property that makes
    * streaming dedup viable at 100 TB/day; an unbounded dropDuplicates
    * would hold every id ever seen). */
  def dedupStream(events: DataFrame, idCol: String): DataFrame =
    events
      .withWatermark("ts", "25 hours")
      .dropDuplicatesWithinWatermark(idCol)

  /** Per-day, per-type counts (the events-side generator for the
    * reference's pre-aggregated counts file). */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "25 hours")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(to_date(col("w.start")).as("day"), col("event_type"), col("n_events"))
}
