package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import StreamingFunnel.UserEvent

/** Streaming per-key exact counter — the streaming twin of the K169
  * heavy-hitters read (q201's Count–Min pass only PRE-filters; its
  * output is the EXACT keys with share ≥ threshold, so a per-key
  * exact count drained at timeout reproduces the same relation).
  *
  * State is ONE counter per key — bounded by key cardinality, the
  * smallest state of any gate (the EWMA gate holds a day map per
  * type; this holds 16 bytes). That is the operational point: a
  * monitor wanting live key skew does not need the CMS until the key
  * space itself explodes, at which point the batch q201 sketch is the
  * fallback — stated trade, both gated against the same corpus.
  *
  * The q259 gate replays the events table through this operator,
  * thresholds the drained counts batch-side (share ≥ 5%, the q201
  * constant) and hash-compares against a DuckDB re-derivation.
  *
  * DRAIN SEMANTICS (the [[StreamingFunnel.reach]] contract): rows
  * emit ONLY via event-time timeout; stopping a stream never flushes
  * pending state. */
object StreamingHeavyHitters extends Serializable {

  final case class CountState(n: Long, maxEventMs: Long)

  final case class KeyCount(key: String, n_rows: Long)

  private val lateness: Long = 25L * 3600 * 1000

  def keyCounts(events: Dataset[UserEvent]): Dataset[KeyCount] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(
        key: String,
        es: Iterator[UserEvent],
        state: GroupState[CountState]): Iterator[KeyCount] = {
      if (state.hasTimedOut) {
        val s0 = state.get
        state.remove()
        Iterator.single(KeyCount(key, s0.n))
      } else {
        val s0 = state.getOption.getOrElse(CountState(0L, Long.MinValue))
        var n = s0.n
        var maxMs = s0.maxEventMs
        es.foreach { e =>
          n += 1L
          maxMs = math.max(maxMs, e.ts.getTime)
        }
        state.update(CountState(n, maxMs))
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
