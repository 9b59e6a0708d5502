package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the ordered first-occurrence funnel (the K89
  * batch operator) — `flatMapGroupsWithState` keyed by user: per-user
  * state holds the FIRST timestamp of each funnel step; once the
  * watermark passes the user's lateness window, the state evaluates
  * the strict-order chain (m₀ < m₁ < … — equal timestamps do NOT
  * advance, the batch contract) and emits one (user, steps_reached)
  * row, then frees itself.
  *
  * Why stateful and not a windowed aggregate: a funnel is an order
  * predicate over FIRST OCCURRENCES — arrival order proves nothing
  * (a late `signup` can retroactively un-reach a `view` that
  * previously looked first), so per-user mins must be held until no
  * more data can arrive. State is bounded: `steps` longs per ACTIVE
  * user, freed by event-time timeout (the 25 h d+1-lookback analog,
  * StreamingSessionizer's TTL argument).
  *
  * Downstream, `steps_reached ≥ k` counts reproduce the batch
  * funnel's per-step rows exactly — the q148 gate replays the events
  * table through this operator and hash-compares against the SAME
  * DuckDB oracle as the batch q120.
  *
  * DRAIN SEMANTICS (the stopped-stream contract): rows emit ONLY via
  * event-time timeout — stopping a stream never flushes pending
  * state, so a user whose lateness window the watermark has not yet
  * passed emits NOTHING in that run (no partial/speculative row that
  * a later first-touch could contradict). With a checkpoint, the
  * held state survives the stop and drains normally after restart
  * once the watermark passes; without one, the run simply
  * undercounts open users. Locked by StreamingFunnelSpec's
  * stop/restart test. */
// Serializable: the per-user update closure is nested inside reach()
// (it captures the step list), so the lambda lifts a reference to this
// object into the task
object StreamingFunnel extends Serializable {

  final case class UserEvent(user_id: Long, ts: Timestamp, event_type: String)

  final case class FunnelState(mins: Seq[Long], maxEventMs: Long)

  final case class UserReach(user_id: Long, steps_reached: Int)

  private val Unseen = Long.MinValue
  private val lateness: Long = 25L * 3600 * 1000

  /** Per-user furthest-step stream. Users whose events never include
    * step 0 emit steps_reached = 0 (the caller counts `≥ k`). */
  def reach(steps: Seq[String])(events: Dataset[UserEvent]): Dataset[UserReach] = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnel steps must be non-empty and distinct: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap

    def update(
        uid: Long,
        es: Iterator[UserEvent],
        state: GroupState[FunnelState]): Iterator[UserReach] = {
      if (state.hasTimedOut) {
        val m = state.get.mins
        state.remove()
        var r = 0
        if (m.head != Unseen) {
          r = 1
          var i = 1
          while (i < m.length && m(i) != Unseen && m(i - 1) < m(i)) {
            r += 1; i += 1
          }
        }
        Iterator.single(UserReach(uid, r))
      } else {
        val s0 = state.getOption.getOrElse(
          FunnelState(Seq.fill(steps.length)(Unseen), Long.MinValue))
        val mins = s0.mins.toArray
        var maxMs = s0.maxEventMs
        es.foreach { e =>
          val t = e.ts.getTime
          stepIdx.get(e.event_type).foreach { i =>
            if (mins(i) == Unseen || t < mins(i)) mins(i) = t
          }
          maxMs = math.max(maxMs, t)
        }
        state.update(FunnelState(mins.toSeq, maxMs))
        state.setTimeoutTimestamp(maxMs + lateness)
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", "25 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class WinFunnelState(times: Seq[Seq[Long]], maxEventMs: Long)

  /** WINDOWED streaming funnel — the K134 deadline semantics held as
    * state: step i qualifies only in (mᵢ₋₁, mᵢ₋₁ + W] seconds of the
    * previous step's RESOLVED time.
    *
    * Why this buffers per-step event TIMES where [[reach]] kept one
    * min per step: a late earlier-step arrival re-bases every later
    * deadline, and the event that newly qualifies may not be any
    * step's minimum — dropping non-minimal occurrences provably loses
    * answers. State is the per-step sorted-on-eval distinct second
    * sets, bounded by the user's funnel-step event count inside their
    * activity horizon (the sessionizer's state argument); evaluation
    * happens ONCE, at event-time timeout, exactly like the batch
    * operator. Same drain contract as [[reach]]: stop never flushes,
    * checkpointed state drains after restart. */
  def windowedReach(steps: Seq[String], windowSecs: Long)(
      events: Dataset[UserEvent]): Dataset[UserReach] = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnel steps must be non-empty and distinct: $steps")
    require(windowSecs >= 1, s"windowSecs must be >= 1, got $windowSecs")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap

    def update(
        uid: Long,
        es: Iterator[UserEvent],
        state: GroupState[WinFunnelState]): Iterator[UserReach] = {
      if (state.hasTimedOut) {
        val ts = state.get.times
        state.remove()
        var r = 0
        var m = Long.MinValue
        var i = 0
        var open = true
        while (open && i < ts.length) {
          val qualifying =
            if (i == 0) ts(0).minOption
            else ts(i).filter(t => t > m && t <= m + windowSecs).minOption
          qualifying match {
            case Some(t) => m = t; r += 1; i += 1
            case None => open = false
          }
        }
        Iterator.single(UserReach(uid, r))
      } else {
        val s0 = state.getOption.getOrElse(
          WinFunnelState(Seq.fill(steps.length)(Seq.empty), Long.MinValue))
        val buf = s0.times.map(ts => scala.collection.mutable.Set(ts: _*))
        var maxMs = s0.maxEventMs
        es.foreach { e =>
          val t = e.ts.getTime
          stepIdx.get(e.event_type).foreach { i =>
            buf(i) += Math.floorDiv(t, 1000L): Unit
          }
          maxMs = math.max(maxMs, t)
        }
        state.update(WinFunnelState(buf.map(_.toSeq), maxMs))
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
