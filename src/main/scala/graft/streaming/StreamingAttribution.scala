package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import StreamingFunnel.UserEvent

/** Streaming conversion↔touch pairing — the K122 last-touch
  * attribution contract with BOTH sides streaming: the one Structured
  * Streaming shape the other nine gates don't exercise, a watermarked
  * STREAM-STREAM INTERVAL JOIN. Conversions and touches are two
  * filtered views of the same event stream; each conversion LEFT OUTER
  * interval-joins every touch of the same user inside its attribution
  * horizon.
  *
  * Semantics mirror the batch operator exactly: a touch attributes to
  * a conversion only if STRICTLY EARLIER AT MILLISECOND GRAIN
  * (`unix_millis(touch) < unix_millis(conv)` — the batch window orders
  * by epoch ms with RANGE .. 1 PRECEDING, so a same-ms touch never
  * counts); the horizon bound is the piece the batch form leaves
  * unbounded — stated, because an UNBOUNDED stream join cannot free
  * state (production attribution always carries a lookback window; the
  * q238 gate's corpus spans 30 days inside the 90-day default, so the
  * replay hash-equals the unbounded batch oracle).
  *
  * Why the time bounds matter at 100 TB: the interval condition is
  * what lets Spark expire join state — touch-side rows free once the
  * watermark passes `t_ts + horizon`, conversion-side rows once it
  * passes `c_ts` (at which point the LEFT OUTER null-row for
  * untouched conversions also emits). Without them the join would
  * buffer both streams forever.
  *
  * DRAIN SEMANTICS (the shared gate contract): outer null-rows emit
  * only when the watermark confirms no match can still arrive;
  * stopping a stream never flushes them — the replay pushes the
  * watermark past the corpus end with tick rows, a restart with a
  * checkpoint drains the rest.
  *
  * Output: one row per (conversion, matching touch) plus one
  * null-channel row per untouched conversion; the LAST-touch
  * distillation and channel shares are a batch rollup over this
  * relation (q238 compares them against the SAME oracle as q153). */
object StreamingAttribution {

  def touchPairs(
      events: Dataset[UserEvent],
      convType: String,
      channels: Seq[String],
      horizonDays: Int): DataFrame = {
    require(channels.nonEmpty, "need at least one channel type")
    require(horizonDays >= 1, s"horizonDays must be >= 1: $horizonDays")
    // Event time truncates to MILLISECONDS first: the batch operator
    // orders by epoch ms, so ms is the contract grain — and it turns
    // the strict same-ms exclusion into the pure interval condition
    // `t_ts <= c_ts - 1ms`, which StreamingJoinHelper can extract
    // state watermarks from (a unix_millis() inequality cannot be
    // analyzed, and without state watermarks the LEFT OUTER null-rows
    // never emit). Same-user conversions colliding at the same ms
    // would merge downstream — stated envelope, absent at every SF.
    // The replay's 'tick' watermark carriers pass through BOTH join
    // inputs: a plain type filter gets pushed below the
    // EventTimeWatermark node by the optimizer, so filtered-out ticks
    // would never advance event time and conversions near the corpus
    // end would hold their outer null-row forever. Tick rows carry
    // negative user ids, join only each other, and every consumer
    // drops them (`c_user < 0` — the replayedStreamTable contract).
    val wm = events.toDF()
      .withColumn("ts", date_trunc("millisecond", col("ts")))
      .withWatermark("ts", "25 hours")
    val conv = wm
      .filter(col("event_type").isin(convType, "tick"))
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val touch = wm
      .filter(col("event_type").isin(channels :+ "tick": _*))
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
        col("event_type").as("channel"))
    conv.join(touch,
        col("c_user") === col("t_user") &&
          col("t_ts") >= col("c_ts") - expr(s"INTERVAL $horizonDays DAYS") &&
          col("t_ts") <= col("c_ts") - expr("INTERVAL 1 MILLISECOND"),
        "leftOuter")
      .select(col("c_user"), col("c_ts"), col("channel"), col("t_ts"))
  }
}
