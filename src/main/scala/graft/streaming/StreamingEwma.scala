package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import StreamingFunnel.UserEvent

/** Streaming form of the K177 EWMA baseline — `flatMapGroupsWithState`
  * keyed by EVENT TYPE (the first non-user-keyed gate: the state that
  * matters to a monitor is per-series, not per-user): state holds the
  * type's per-day counts as a map, and the sequential fold runs ONCE,
  * at event-time timeout, over the sorted completed days.
  *
  * Why buffered evaluation rather than an incrementally-held s_t: a
  * late event increments a PAST day's count, which re-bases every
  * subsequent smoothed value — the same no-summary-answers-late-data
  * argument as [[StreamingGaps]]; the day-count map is bounded by the
  * series' day span, the smallest state of any gate.
  *
  * The q212 gate replays the events table through this operator and
  * hash-compares against the SAME DuckDB oracle as the batch q209
  * (identical integer recurrence, so equality is exact).
  *
  * DRAIN SEMANTICS (the [[StreamingFunnel.reach]] contract): rows
  * emit ONLY via event-time timeout; stopping a stream never flushes
  * pending state. With a checkpoint the held state survives the stop
  * and drains after restart; without one the run loses open series. */
object StreamingEwma extends Serializable {

  final case class EwmaState(dayCounts: Map[String, Long], maxEventMs: Long)

  final case class TypeDayEwma(
      event_type: String,
      day: String,
      v: Long,
      ewma_micro: Long,
      dev_micro: Long)

  private val lateness: Long = 25L * 3600 * 1000

  private def dayOfMs(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  /** Per-type smoothed series; the fold is the batch recurrence
    * verbatim (s₁ = v₁·10⁶, s_t = α·v_t + (10⁶−α)·s_{t−1} div 10⁶). */
  def ewma(
      events: Dataset[UserEvent],
      alphaPpm: Long): Dataset[TypeDayEwma] = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000,
      s"alphaPpm must be in [1, 1e6]: $alphaPpm")
    val spark = events.sparkSession
    import spark.implicits._

    def update(
        typ: String,
        es: Iterator[UserEvent],
        state: GroupState[EwmaState]): Iterator[TypeDayEwma] = {
      if (state.hasTimedOut) {
        val s0 = state.get
        state.remove()
        val byDay = s0.dayCounts.toSeq.sortBy(_._1)
        var s = 0L
        byDay.zipWithIndex.iterator.map { case ((day, v), i) =>
          val dev = if (i == 0) 0L else v * 1000000L - s
          s = if (i == 0) v * 1000000L
              else alphaPpm * v + (1000000L - alphaPpm) * s / 1000000L
          TypeDayEwma(typ, day, v, s, dev)
        }
      } else {
        val s0 = state.getOption.getOrElse(
          EwmaState(Map.empty, Long.MinValue))
        var m = s0.dayCounts
        var maxMs = s0.maxEventMs
        es.foreach { e =>
          val ms = e.ts.getTime
          val d = dayOfMs(ms)
          m = m.updated(d, m.getOrElse(d, 0L) + 1L)
          maxMs = math.max(maxMs, ms)
        }
        state.update(EwmaState(m, maxMs))
        state.setTimeoutTimestamp(maxMs + lateness)
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", "25 hours")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
