package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the flow sessionizer — SURVEY.md §2-I3 "v2": the
  * batch cascade's session semantics expressed as
  * `flatMapGroupsWithState` keyed by flow_id.
  *
  * The reference re-reads day d ∪ d+1 instead of keeping state open
  * (the +1-day late-data lookback, import_flow_events.py:170-171); the
  * streaming equivalent is a 25-hour watermark with event-time state
  * timeout: a flow's session row is emitted once no event can arrive
  * inside its lateness window. The reference never closes flows
  * (duration = last seen flow_time), so the timeout doubles as the
  * state-TTL the batch design implies (SURVEY §7.4 #6).
  *
  * Input rows are the permanent flow-events layout (type, flow_id,
  * flow_time, locale, uid + event ts); `flow.begin` opens the session,
  * MAX(flow_time) extends it, `flow.complete` / `account.created` set
  * the sticky flags — the same fold as Q_UPDATE_METADATA/COMPLETED/
  * NEW_ACCOUNT, but incremental and single-pass.
  */
object StreamingSessionizer {

  final case class FlowEvent(
      flow_id: String,
      `type`: String,
      ts: Timestamp,
      flow_time: Long,
      locale: String,
      uid: String)

  final case class FlowState(
      beginMs: Long, // Long.MinValue = no begin seen yet
      maxFlowTime: Long,
      completed: Boolean,
      newAccount: Boolean,
      maxLocale: String,
      maxUid: String,
      maxEventMs: Long)

  final case class FlowSession(
      flow_id: String,
      begin_time: Timestamp,
      duration: Long,
      completed: Boolean,
      new_account: Boolean,
      locale: String,
      uid: String)

  private def maxStr(a: String, b: String): String =
    if (a == null) b else if (b == null) a else if (a.compareTo(b) >= 0) a else b

  private val lateness: Long = 25L * 3600 * 1000 // 25h, reference's d+1 analog

  private def update(
      flowId: String,
      events: Iterator[FlowEvent],
      state: GroupState[FlowState]): Iterator[FlowSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      if (s.beginMs == Long.MinValue) Iterator.empty // no begin: no metadata row
      else
        Iterator.single(FlowSession(flowId, new Timestamp(s.beginMs),
          s.maxFlowTime, s.completed, s.newAccount, s.maxLocale, s.maxUid))
    } else {
      val s0 = state.getOption.getOrElse(
        FlowState(Long.MinValue, 0L, completed = false, newAccount = false,
          null, null, Long.MinValue))
      val s = events.foldLeft(s0) { (acc, e) =>
        val t = e.ts.getTime
        val isBegin = e.`type` == "flow.begin"
        acc.copy(
          beginMs =
            if (isBegin && (acc.beginMs == Long.MinValue || t < acc.beginMs)) t
            else acc.beginMs,
          maxFlowTime =
            if (!isBegin) math.max(acc.maxFlowTime, e.flow_time) else acc.maxFlowTime,
          completed = acc.completed || e.`type` == "flow.complete",
          newAccount = acc.newAccount || e.`type` == "account.created",
          maxLocale = if (!isBegin) maxStr(acc.maxLocale, e.locale) else acc.maxLocale,
          maxUid = if (!isBegin) maxStr(acc.maxUid, e.uid) else acc.maxUid,
          maxEventMs = math.max(acc.maxEventMs, t))
      }
      state.update(s)
      state.setTimeoutTimestamp(s.maxEventMs + lateness)
      Iterator.empty
    }
  }

  /** Sessionize a (possibly streaming) flow-event Dataset. */
  def sessionize(events: Dataset[FlowEvent]): Dataset[FlowSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "25 hours")
      .groupByKey(_.flow_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** File-streaming entry: tail a day-partitioned flow_events table
    * (the engine's own storage) as a stream — `Trigger.AvailableNow`
    * replays the backlog in order, then stops; a long-running query
    * picks up new day partitions as the batch importer lands them. */
  def fileStream(
      spark: SparkSession,
      tablePath: String,
      maxFilesPerTrigger: Option[Int] = None): Dataset[FlowEvent] = {
    import spark.implicits._
    val reader = spark.readStream
      .schema("ts TIMESTAMP, type STRING, flow_id STRING, flow_time BIGINT, " +
        "locale STRING, uid STRING, day DATE")
    // bounding files-per-batch makes the watermark advance BETWEEN
    // files — an AvailableNow backlog replay then fires event-time
    // timeouts exactly as a live run would, instead of swallowing the
    // whole history in one zero-watermark batch
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .parquet(tablePath)
      .selectExpr("flow_id", "type", "ts", "flow_time", "locale", "uid")
      .as[FlowEvent]
  }
}
