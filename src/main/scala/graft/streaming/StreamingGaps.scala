package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import StreamingFunnel.UserEvent

/** Streaming form of the inter-event gap extraction (the K142 batch
  * operator's per-user pass) — `flatMapGroupsWithState` keyed by
  * user: state buffers the user's (second, type) events until the
  * watermark passes their lateness window, then emits one row per
  * CONSECUTIVE gap in (second, type) order and frees itself.
  *
  * Why the state buffers events where the sessionizer keeps a
  * watermark-sized tail: a late event lands BETWEEN two already-seen
  * neighbours and REPLACES their single gap with two — no summary
  * short of the event multiset answers that retroactively, so
  * evaluation happens once, at event-time timeout, exactly like the
  * batch operator (the windowedReach state argument; bounded by the
  * user's event count inside their activity horizon).
  *
  * Downstream, the power-of-two bucket rollup over these gap rows
  * reproduces the batch histogram exactly — the q180 gate replays
  * the events table through this operator and hash-compares against
  * the SAME DuckDB oracle as the batch q174 (ties are harmless: the
  * gap MULTISET is invariant under permutations of identical rows).
  *
  * DRAIN SEMANTICS (the [[StreamingFunnel.reach]] contract): rows
  * emit ONLY via event-time timeout; stopping a stream never flushes
  * pending state. With a checkpoint the held state survives the stop
  * and drains after restart; without one the run undercounts open
  * users. */
object StreamingGaps extends Serializable {

  final case class GapState(secs: Seq[Long], typs: Seq[String], maxEventMs: Long)

  final case class UserGap(user_id: Long, gap: Long)

  private val lateness: Long = 25L * 3600 * 1000

  /** Per-user consecutive-gap stream; single-event users emit
    * nothing (no gap exists — the batch lag() contract). */
  def gaps(events: Dataset[UserEvent]): Dataset[UserGap] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(
        uid: Long,
        es: Iterator[UserEvent],
        state: GroupState[GapState]): Iterator[UserGap] = {
      if (state.hasTimedOut) {
        val s0 = state.get
        state.remove()
        val sorted = s0.secs.zip(s0.typs).sortBy(identity)
        sorted.iterator.zip(sorted.iterator.drop(1))
          .map { case ((a, _), (b, _)) => UserGap(uid, b - a) }
      } else {
        val s0 = state.getOption.getOrElse(
          GapState(Vector.empty, Vector.empty, Long.MinValue))
        var secs = s0.secs.toVector
        var typs = s0.typs.toVector
        var maxMs = s0.maxEventMs
        es.foreach { e =>
          val ms = e.ts.getTime
          secs :+= Math.floorDiv(ms, 1000L)
          typs :+= e.event_type
          maxMs = math.max(maxMs, ms)
        }
        state.update(GapState(secs, typs, maxMs))
        state.setTimeoutTimestamp(maxMs + lateness)
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", "25 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
