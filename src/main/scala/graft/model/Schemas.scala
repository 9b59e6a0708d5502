package graft.model

import java.time.Period

import org.apache.spark.sql.types._

/** One declared column of an event family.
  *
  * Mirrors the semantic content of the reference's DDL (SURVEY.md §1.2):
  * a name, a type, the VARCHAR width (0 = unbounded / non-string), and
  * NOT NULL-ness. Widths drive the TRUNCATECOLUMNS analog at ingest
  * (import_events.py:96); NOT NULL BIGINT casts drive the MAXERROR
  * analog (a row whose required long fails to parse is an error row).
  */
final case class ColSpec(
    name: String,
    dataType: DataType = StringType,
    width: Int = 0,
    notNull: Boolean = false) {
  def field: StructField = StructField(name, dataType, nullable = !notNull)
}

/** An importable event family: CSV column order, id column for sampling,
  * and the staging→permanent projection (B1).
  *
  * The CSV layout is always `timestamp` (epoch seconds, BIGINT —
  * import_events.py:82) followed by `columns` in declared order
  * (import_events.py:88-91). `permColumns` is the projected subset kept
  * in the permanent tables (17→5 for flow, import_flow_events.py:29-63).
  */
final case class EventFamily(
    name: String,
    idColumn: String,
    columns: Seq[ColSpec],
    permColumns: Seq[String]) {

  /** Staging schema: ts epoch-seconds + declared columns, CSV order. */
  def stagingSchema: StructType =
    StructType(StructField("timestamp", LongType, nullable = false) +: columns.map(_.field))

  def colNames: Seq[String] = columns.map(_.name)
  def widthOf: Map[String, Int] = columns.map(c => c.name -> c.width).toMap
  def tableName(suffix: String): String = s"${name}_events$suffix"
}

/** A sampling tier (import_events.py:43-47): deterministic cohort
  * membership below `percent`, retained for `retention`. The reference
  * uses months; tests use day-granular periods to exercise expiry within
  * a 30-day fixture. Tiers are nested: cohort<10 ⊂ cohort<50 ⊂ <100. */
final case class SampleTier(percent: Int, retention: Period, suffix: String)

object SampleTier {
  /** The reference's tiers: 10%/24mo, 50%/6mo, 100%/3mo. */
  val defaults: Seq[SampleTier] = Seq(
    SampleTier(10, Period.ofMonths(24), "_sampled_10"),
    SampleTier(50, Period.ofMonths(6), "_sampled_50"),
    SampleTier(100, Period.ofMonths(3), ""))
}

object Schemas {

  /** Activity events (import_activity_events.py:7-17); CSV column order
    * is the COLUMNS constant, not the DDL order. */
  val activity: EventFamily = EventFamily(
    name = "activity",
    idColumn = "uid",
    columns = Seq(
      ColSpec("ua_browser", width = 40),
      ColSpec("ua_version", width = 40),
      ColSpec("ua_os", width = 40),
      ColSpec("uid", width = 64, notNull = true),
      ColSpec("type", width = 30, notNull = true),
      ColSpec("service", width = 40),
      ColSpec("device_id", width = 32)),
    permColumns = Seq(
      "ua_browser", "ua_version", "ua_os", "uid", "type", "service", "device_id"))

  /** Flow events (import_flow_events.py:9-47): 17-column staging,
    * 5-column permanent projection. type is VARCHAR(79) so it can hold
    * `flow.continued.${flow_id}` (import_flow_events.py:7-8). */
  val flow: EventFamily = EventFamily(
    name = "flow",
    idColumn = "flow_id",
    columns = Seq(
      ColSpec("type", width = 79, notNull = true),
      ColSpec("flow_id", width = 64, notNull = true),
      ColSpec("flow_time", LongType, notNull = true),
      ColSpec("ua_browser", width = 40),
      ColSpec("ua_version", width = 40),
      ColSpec("ua_os", width = 40),
      ColSpec("context", width = 40),
      ColSpec("entrypoint", width = 40),
      ColSpec("migration", width = 40),
      ColSpec("service", width = 40),
      ColSpec("utm_campaign", width = 40),
      ColSpec("utm_content", width = 40),
      ColSpec("utm_medium", width = 40),
      ColSpec("utm_source", width = 40),
      ColSpec("utm_term", width = 40),
      ColSpec("locale", width = 40),
      ColSpec("uid", width = 64)),
    permColumns = Seq("type", "flow_id", "flow_time", "locale", "uid"))

  /** Email events (import_email_events.py:6-17). flow_id is NULLABLE —
    * NULL cohort fails every `cohort < pct` predicate, so NULL-flow rows
    * land in no tier (the semantic trap SURVEY §5.4 flags). */
  val email: EventFamily = EventFamily(
    name = "email",
    idColumn = "flow_id",
    columns = Seq(
      ColSpec("flow_id", width = 64),
      ColSpec("domain", width = 40),
      ColSpec("template", width = 64),
      ColSpec("type", width = 64, notNull = true),
      ColSpec("bounced", width = 64),
      ColSpec("complaint", width = 64),
      ColSpec("locale", width = 64)),
    permColumns = Seq(
      "flow_id", "domain", "template", "type", "bounced", "complaint", "locale"))
}
