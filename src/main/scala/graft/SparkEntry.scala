package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from the SURVEY §2 inventory
  * (or a 100TB-pipeline extension), expressed Spark-first over the
  * driver-generated test tables. `oracleSql` carries the DuckDB-equivalent
  * SQL; column names and row order match exactly (each query ends in a
  * deterministic sort, and money arithmetic goes through DECIMAL so Spark
  * and DuckDB produce bit-identical doubles).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    revenueByNation(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Parity queries (SURVEY §2)
  // ---------------------------------------------------------------------

  /** E2/B3/G1-style pricing summary (TPC-H Q1 shape): wide aggregate with
    * decimal-exact money math, partial aggregation map-side. */
  private def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)").as("sum_qty"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)").as("sum_base_price"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE)").as("sum_disc_price"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*)").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** E4 — daily rollup: the generating query for the reference's `counts`
    * table (import_counts.py): per-day active users + volume. */
  private def dailyActiveUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(dayOf(col("ts")).cast("string").as("day"))
      .agg(
        countDistinct(col("user_id")).as("dau"),
        count(lit(1)).as("n_events"))
      .orderBy(col("day"))

  /** F2/B4/§1.5 — deterministic hex-prefix sampling cohorts: the
    * three-tier (10/50/100) membership counts. Tier subsets are nested by
    * construction (cohort<10 ⊂ cohort<50 ⊂ cohort<100). */
  private def samplingTiers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), numericCohort(col("user_id")).as("cohort"))
      .agg(
        count(when(col("cohort") < 10, 1L)).as("events_t10"),
        count(when(col("cohort") < 50, 1L)).as("events_t50"),
        count(lit(1)).as("events_t100"),
        countDistinct(when(col("cohort") < 10, col("user_id"))).as("users_t10"),
        countDistinct(when(col("cohort") < 50, col("user_id"))).as("users_t50"),
        countDistinct(col("user_id")).as("users_t100"))

  /** C1 — the 7-day trailing range self-join
    * (calculate_daily_summary.py:92-105): users active with ≥2 distinct
    * "devices" (event_type stands in for device_id in the test data)
    * within a trailing 7-day window. Aggregated per day to keep the
    * output compact; the join itself is the operator under test. */
  private def multiDevice7d(s: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(s, dir)
      .select(dayOf(col("ts")).as("day"), col("user_id"), col("event_type"))
      .distinct()
    val present = activity.as("present")
    val past = activity.as("past")
    val pairs = present.join(past,
        col("present.user_id") === col("past.user_id") &&
        col("present.event_type") =!= col("past.event_type") &&
        col("past.day") <= col("present.day") &&
        col("past.day") >= date_sub(col("present.day"), 7))
      .select(
        col("present.day").as("day"),
        col("present.user_id").as("user_id"),
        col("present.event_type").as("type_now"),
        col("past.event_type").as("type_prev"))
      .distinct()
    pairs.groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"))
  }

  /** C2/C3/I2 — sessionization as a join cascade (import_flow_events.py):
    * session opens at the user's first `signup` (flow.begin analog), is
    * folded from events within the begin day and the next day (the
    * reference's +1-day late-data lookback), and `completed` is a
    * semi-join flag from `purchase` (flow.complete analog). */
  private def sessionMetadata(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    // INSERT INTO flow_metadata ... WHERE type = 'flow.begin'.
    // `meta` is one row per signup user — small relative to `events` — so
    // cache it (it feeds both the window join and the final left join;
    // uncached it would rescan `events` twice). Deliberately NO
    // broadcast() hint: it is an ALL-TIME per-user aggregate, so a
    // literal hint would override AQE's size check and OOM the driver at
    // 100×. AQE broadcasts it while it measures small and degrades to a
    // shuffle join when it no longer does (plan-asserted in
    // ScalePatternsSpec).
    val meta = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("began_at"))
      .cache()
    // UPDATE ... FROM (SELECT ... GROUP BY flow_id): fold day d ∪ d+1
    val inWindow = events.as("e")
      .join(meta.as("m"), col("e.user_id") === col("m.user_id"))
      .filter(dayOf(col("e.ts")).between(
        dayOf(col("m.began_at")), date_add(dayOf(col("m.began_at")), 1)))
      .filter(col("e.ts") >= col("m.began_at"))
    val folded = inWindow
      .groupBy(col("e.user_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("e.ts")).as("last_ts"),
        max(when(col("e.event_type") === "purchase", 1L).otherwise(0L)).as("has_purchase"))
    meta.join(folded, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("began_at"),
        (unix_millis(col("last_ts")) - unix_millis(col("began_at"))).as("duration_ms"),
        col("n_events"),
        (col("has_purchase") === 1L).as("completed"))
      .orderBy(col("user_id"))
  }

  /** C-joins — star join: revenue per nation. Only the FIXED-cardinality
    * dims carry broadcast hints (nation = 25 rows, region = 5 — bounded
    * by the world, not the scale factor); customer GROWS with SF, so
    * its join strategy is left to AQE's size check, which broadcasts it
    * while small and degrades to shuffle join at 100×. */
  private def revenueByNation(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE)").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("nation"))

  /** C4 — anti-join: customers with no high-value order, per segment. */
  private def customersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("segment"))

  /** Dedup (exact) — scale-safe global stats: distinct over the 64-bit
    * xxhash64 of the normalized text, so the exchange moves 8-byte keys
    * instead of full document bodies (at 100 TB the full-text variant
    * shuffles the whole corpus). Collision risk at 64 bits is negligible
    * below ~4B docs; the oracle counts distinct raw text, so a collision
    * would surface as a mismatch rather than pass silently. */
  private def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(xxhash64(lower(trim(col("text")))).as("h"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dupes"))

  /** D1/D2/D4/B9 — the storage layer's lifecycle, end to end: write all
    * days of `events` into a day-partitioned table, rebuild one day
    * (idempotent dynamic partition overwrite), expire days older than
    * max_day - 20 days, and return the surviving per-day rollup. The
    * oracle recomputes the survivors straight from the source table. */
  private def dayStoreLifecycle(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.util.TmpDirs
    val root = TmpDirs.fresh("q09_day_store")
    val t = new DayPartitionedTable(root, "events_store", sortCol = Some("ts"))
    val ev = Tables.events(s, dir).withColumn("day", dayOf(col("ts")))
    t.writeDays(ev)
    // idempotent rebuild of one mid-range day (D1): must be a fixed point
    t.writeDays(ev.filter(col("day") === lit("2024-01-15").cast("date")))
    // retention expiry (D2): keep the trailing 21 days
    val cutoff = t.maxDay(s).get.minusDays(20)
    t.expireBefore(s, cutoff)
    t.read(s)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"))
  }

  /** Derive an activity-events staging frame from the `events` test
    * table — the same derivation is mirrored in the DuckDB oracles so
    * ingest/import pipelines can be verified end-to-end. uid is a real
    * 32-char hex string (md5), so the F2 hex-prefix cohort is exercised
    * directly, not through indirection. ua_browser is over-width for
    * user_id%10=0 rows to exercise TRUNCATECOLUMNS. */
  private[graft] def activityStaging(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      unix_seconds(col("ts")).as("timestamp"),
      when(col("user_id") % 10 === 0, concat(lit("b"), lit("x" * 45)))
        .otherwise(concat(lit("b"), (col("user_id") % 3).cast("string")))
        .as("ua_browser"),
      concat(lit("v"), (col("user_id") % 4).cast("string")).as("ua_version"),
      concat(lit("os"), (col("user_id") % 2).cast("string")).as("ua_os"),
      md5(col("user_id").cast("string")).as("uid"),
      col("event_type").as("type"),
      when(col("event_id") % 4 === 0, lit(""))
        .otherwise(concat(lit("svc"), (col("event_id") % 3).cast("string")))
        .as("service"),
      when(col("event_id") % 13 === 0, lit("")) // exercises B7 device_id != ''
        .otherwise(concat(lit("d"), (col("event_id") % 5).cast("string")))
        .as("device_id"),
      dayOf(col("ts")).as("day"))

  /** SQL fragment mirroring [[activityStaging]] for the DuckDB oracle. */
  private val activityStagingSql: String =
    """SELECT epoch_ms(ts) // 1000 AS "timestamp",
         CASE WHEN user_id % 10 = 0 THEN 'b' || repeat('x', 45)
              ELSE 'b' || (user_id % 3) END AS ua_browser,
         'v' || (user_id % 4) AS ua_version,
         'os' || (user_id % 2) AS ua_os,
         md5(CAST(user_id AS VARCHAR)) AS uid,
         event_type AS type,
         CASE WHEN event_id % 4 = 0 THEN '' ELSE 'svc' || (event_id % 3) END AS service,
         CASE WHEN event_id % 13 = 0 THEN '' ELSE 'd' || (event_id % 5) END AS device_id,
         ts::DATE AS day
       FROM events"""

  /** Shared q41/q234 oracle: the Makefile-final multi-device rollup
    * recomputed declaratively from the retention-filtered staging —
    * the SAME expected relation whether the landing wire format was
    * CSV (q41) or JSON-lines (q234); format-blindness is the gate. */
  private lazy val runImportOracleSql: String =
    s"""WITH staging AS ($activityStagingSql),
         P AS (SELECT MAX(day) AS max_day FROM staging),
         dev AS (SELECT DISTINCT day, uid, device_id
                 FROM staging CROSS JOIN P
                 WHERE device_id <> '' AND day >= max_day - INTERVAL 18 DAY),
         pairs AS (
           SELECT DISTINCT p.day, p.uid, p.device_id AS device_now, q.device_id AS device_prev
           FROM dev p JOIN dev q
             ON p.uid = q.uid AND p.device_id <> q.device_id
            AND q.day <= p.day AND q.day >= p.day - INTERVAL 7 DAY)
         SELECT CAST(day AS VARCHAR) AS day, COUNT(*) AS n_pairs,
                COUNT(DISTINCT uid) AS n_users
         FROM pairs GROUP BY 1 ORDER BY 1"""

  /** A1/A2/A6/A7 — the CSV ingestion layer end to end: derive activity
    * CSV day files from `events`, corrupt one file with blocklist /
    * malformed / over-long lines, ingest every day through the
    * sanitizer + field-count filter + MAXERROR gate + TRUNCATECOLUMNS,
    * and aggregate the surviving typed rows. The oracle computes the
    * same aggregate from the clean derivation — every injected junk
    * line must have been dropped, every over-width browser truncated,
    * every empty service kept as '' (never null). */
  private def csvIngestSanitize(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.CsvEventSource
    import graft.util.TmpDirs
    val landing = TmpDirs.fresh("q10_landing")
    val days = CsvEventSource.writeLanding(s, activityStaging(s, dir), landing, "activity")
    // corrupt the first day's file: sanitizer + MAXERROR fodder
    CsvEventSource.appendLines(s, s"$landing/activity-${days.head}.csv", Seq(
      "1704100000,\"quoted\",1.0,linux,aa,login,s,d",
      "1704100001,x;DROP,1.0,linux,aa,login,s,d",
      "1704100002,SELECT 1,1.0,linux,aa,login,s,d",
      "1704100003,nslookup x,1.0,linux,aa,login,s,d",
      "not_a_ts,b,v,o,u,t,s,d",
      "also_not_a_ts,b,v,o,u,t,s,d",
      "1704100004,too,few"))
    // each readDay runs its MAXERROR count job; days are independent
    val perDay = graft.util.Par.map(CsvEventSource.listDays(s, landing, "activity")) {
      case (_, file) =>
        CsvEventSource.readDay(s, file, graft.model.Schemas.activity,
          CsvEventSource.Strict, maxError = 10, persist = false)
    }
    perDay.reduce(_ unionAll _)
      .groupBy(col("type"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("uid")).as("n_users"),
        count(when(col("service") === "", 1)).as("n_empty_service"),
        count(when(length(col("ua_browser")) === 40, 1)).as("n_truncated"))
      .orderBy(col("type"))
  }

  /** Day-granular sample tiers so retention/expiry are observable inside
    * the 30-day test fixture (the reference's months-granular tiers,
    * import_events.py:43-47, would never expire anything here). */
  private[graft] val dayTiers = Seq(
    graft.model.SampleTier(10, java.time.Period.ofDays(36), "_sampled_10"),
    graft.model.SampleTier(50, java.time.Period.ofDays(24), "_sampled_50"),
    graft.model.SampleTier(100, java.time.Period.ofDays(18), ""))

  /** F1/F2/B2/B3/B4/B9/D1/D2/I4 — the three-tier EventImporter end to
    * end: landing CSVs → sanitize/type → per-day, per-tier sampled +
    * retention-filtered partition writes → expiry — then read the tier
    * tables back and roll them up. The oracle recomputes each tier
    * directly from the shared staging derivation: hex cohort on the
    * REAL 32-char hex uid (7-char prefix), retention from max day. */
  /** One activity import per sf dir, shared by q11 and the summaries. */
  private val activityRuns =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.EventImporter]

  private[graft] def activityRun(s: SparkSession, dir: String): graft.operators.EventImporter =
    activityRuns.getOrElseUpdate(dir, {
      import graft.sources.CsvEventSource
      import graft.util.TmpDirs
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val landing = TmpDirs.fresh(s"activity_landing_$tag")
      CsvEventSource.writeLanding(s, activityStaging(s, dir), landing, "activity")
      val imp = new graft.operators.EventImporter(
        TmpDirs.fresh(s"activity_wh_$tag"), graft.model.Schemas.activity, dayTiers)
      imp.run(s, landing, "activity")
      imp
    })

  private def activityImportTiers(s: SparkSession, dir: String): DataFrame = {
    val imp = activityRun(s, dir)
    dayTiers.map { tier =>
      imp.table(tier).read(s)
        .groupBy(col("day").cast("string").as("day"))
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("uid")).as("n_users"))
        .withColumn("tier_pct", lit(tier.percent))
    }.reduce(_ unionAll _).orderBy(col("tier_pct"), col("day"))
  }

  /** Email-family staging: flow_id is EMPTY for event_id%7=0 rows — the
    * NULL-cohort trap (import_email_events.py:7): those rows belong to
    * no sample tier because `NULL < pct` is never true. */
  private[graft] def emailStaging(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      unix_seconds(col("ts")).as("timestamp"),
      when(col("event_id") % 7 === 0, lit(""))
        .otherwise(md5(col("event_id").cast("string"))).as("flow_id"),
      concat(lit("dom"), (col("user_id") % 5).cast("string")).as("domain"),
      concat(lit("t"), (col("event_id") % 3).cast("string")).as("template"),
      col("event_type").as("type"),
      when(col("event_id") % 11 === 0, lit("true")).otherwise(lit("")).as("bounced"),
      lit("").as("complaint"),
      concat(lit("loc"), (col("user_id") % 7).cast("string")).as("locale"),
      dayOf(col("ts")).as("day"))

  private val emailStagingSql: String =
    """SELECT epoch_ms(ts) // 1000 AS "timestamp",
         CASE WHEN event_id % 7 = 0 THEN ''
              ELSE md5(CAST(event_id AS VARCHAR)) END AS flow_id,
         'dom' || (user_id % 5) AS domain,
         't' || (event_id % 3) AS template,
         event_type AS type,
         CASE WHEN event_id % 11 = 0 THEN 'true' ELSE '' END AS bounced,
         '' AS complaint,
         'loc' || (user_id % 7) AS locale,
         ts::DATE AS day
       FROM events"""

  /** The email-events import: same importer, flow_id id-column, and the
    * ''-flow_id rows must land in NO tier. */
  private def emailImportTiers(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.EventImporter
    import graft.sources.CsvEventSource
    import graft.util.TmpDirs
    val landing = TmpDirs.fresh("q18_landing")
    CsvEventSource.writeLanding(s, emailStaging(s, dir), landing, "email-events")
    val imp = new EventImporter(
      TmpDirs.fresh("q18_wh"), graft.model.Schemas.email, dayTiers)
    imp.run(s, landing, "email-events")
    dayTiers.map { tier =>
      imp.table(tier).read(s)
        .groupBy(col("type"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("flow_id")).as("n_flows"),
          count(when(col("bounced") === "true", 1)).as("n_bounced"))
        .withColumn("tier_pct", lit(tier.percent))
    }.reduce(_ unionAll _).orderBy(col("tier_pct"), col("type"))
  }

  // ---------------------------------------------------------------------
  // Flow sessionizer pipeline (q12-q14)
  // ---------------------------------------------------------------------

  /** Synthetic flow-events staging derived from `events`: each
    * (user, 2-day bucket) is one flow; signup→flow.begin,
    * purchase→flow.complete, error→created/continued/error by event_id,
    * every 5th view→flow.experiment.{name}.{cohort}. Deterministic and
    * mirrored in SQL so the WHOLE 12-step cascade has a DuckDB oracle. */
  private[graft] def flowStaging(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val day = dayOf(col("ts"))
    val anchor = lit("2024-01-01").cast("date")
    val bucketStart = date_add(anchor, (datediff(day, anchor) / 2).cast("int") * 2)
    val uidStr = col("user_id").cast("string")
    e.select(
      unix_seconds(col("ts")).as("timestamp"),
      when(col("event_type") === "signup", lit("flow.begin"))
        .when(col("event_type") === "purchase", lit("flow.complete"))
        .when(col("event_type") === "click", lit("flow.signin"))
        .when(col("event_type") === "view",
          when(col("event_id") % 5 === 0,
            concat(lit("flow.experiment.exp"), (col("event_id") % 3).cast("string"),
              lit(".c"), (col("event_id") % 2).cast("string")))
            .otherwise(lit("flow.viewed")))
        .otherwise(
          when(col("event_id") % 3 === 0, lit("account.created"))
            .when(col("event_id") % 3 === 1,
              concat(lit("flow.continued."), md5(concat(uidStr, lit("#prev")))))
            .otherwise(lit("flow.error")))
        .as("type"),
      md5(concat(uidStr, lit("#"), bucketStart.cast("string"))).as("flow_id"),
      (unix_millis(col("ts")) % 100000000L).as("flow_time"),
      concat(lit("fb"), (col("user_id") % 3).cast("string")).as("ua_browser"),
      concat(lit("v"), (col("user_id") % 2).cast("string")).as("ua_version"),
      concat(lit("os"), (col("user_id") % 2).cast("string")).as("ua_os"),
      when(col("event_id") % 4 === 0, lit(""))
        .otherwise(concat(lit("ctx"), (col("user_id") % 3).cast("string"))).as("context"),
      concat(lit("ep"), (col("user_id") % 2).cast("string")).as("entrypoint"),
      lit("").as("migration"),
      when(col("user_id") % 5 === 0, lit("")).otherwise(lit("sync")).as("service"),
      when(col("event_id") % 3 === 0, lit(""))
        .otherwise(concat(lit("camp"), (col("user_id") % 2).cast("string"))).as("utm_campaign"),
      lit("con").as("utm_content"),
      lit("med").as("utm_medium"),
      lit("src").as("utm_source"),
      lit("term").as("utm_term"),
      when(col("event_id") % 6 === 0, lit(""))
        .otherwise(concat(lit("loc"), (col("user_id") % 7).cast("string"))).as("locale"),
      md5(uidStr).as("uid"),
      day.as("day"))
  }

  private val flowStagingSql: String =
    """SELECT epoch_ms(ts) // 1000 AS "timestamp",
         CASE
           WHEN event_type = 'signup' THEN 'flow.begin'
           WHEN event_type = 'purchase' THEN 'flow.complete'
           WHEN event_type = 'click' THEN 'flow.signin'
           WHEN event_type = 'view' THEN
             CASE WHEN event_id % 5 = 0
               THEN 'flow.experiment.exp' || (event_id % 3) || '.c' || (event_id % 2)
               ELSE 'flow.viewed' END
           ELSE CASE WHEN event_id % 3 = 0 THEN 'account.created'
                     WHEN event_id % 3 = 1 THEN 'flow.continued.' || md5(user_id || '#prev')
                     ELSE 'flow.error' END
         END AS type,
         md5(user_id || '#' ||
             CAST(DATE '2024-01-01' +
                  CAST(((ts::DATE - DATE '2024-01-01') // 2) * 2 AS INTEGER)
                  AS VARCHAR)) AS flow_id,
         epoch_ms(ts) % 100000000 AS flow_time,
         'fb' || (user_id % 3) AS ua_browser,
         'v' || (user_id % 2) AS ua_version,
         'os' || (user_id % 2) AS ua_os,
         CASE WHEN event_id % 4 = 0 THEN '' ELSE 'ctx' || (user_id % 3) END AS context,
         'ep' || (user_id % 2) AS entrypoint,
         '' AS migration,
         CASE WHEN user_id % 5 = 0 THEN '' ELSE 'sync' END AS service,
         CASE WHEN event_id % 3 = 0 THEN '' ELSE 'camp' || (user_id % 2) END AS utm_campaign,
         'con' AS utm_content, 'med' AS utm_medium, 'src' AS utm_source, 'term' AS utm_term,
         CASE WHEN event_id % 6 = 0 THEN '' ELSE 'loc' || (user_id % 7) END AS locale,
         md5(CAST(user_id AS VARCHAR)) AS uid,
         ts::DATE AS day
       FROM events"""

  /** One pipeline run per sf dir, shared by q12/q13/q14. */
  private val flowRuns =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.FlowPipeline]

  private[graft] def flowRun(s: SparkSession, dir: String): graft.operators.FlowPipeline =
    flowRuns.getOrElseUpdate(dir, {
      import graft.sources.CsvEventSource
      import graft.util.TmpDirs
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val landing = TmpDirs.fresh(s"flow_landing_$tag")
      CsvEventSource.writeLanding(s, flowStaging(s, dir), landing, "flow")
      val p = new graft.operators.FlowPipeline(
        TmpDirs.fresh(s"flow_wh_$tag"), dayTiers,
        historicalCutoff = java.time.LocalDate.parse("2030-01-01"),
        // wider than the 30-day fixture, so identical to unbounded —
        // exercises the scale knob inside the oracle-gated path
        updateHorizon = Some(40))
      p.run(s, landing, "flow")
      p
    })

  /** C2/C3/I2/I3/F3/B8/D3 — the final flow_metadata (100% tier) after
    * the full newest-first multi-day cascade. The oracle reproduces the
    * end state declaratively, including the last-writer fold-window
    * semantics: the oldest processing day that still matches a flow
    * wins, so the counted rows are X(D) ∪ E(D+1) with
    * D = max(min_day, least(min X-day, min E-day - 1)) where X = all
    * non-begin rows (controls not yet absorbed on their own day) and
    * E = payload-only rows (what older processings see on disk). */
  private def flowMetadataFinal(s: SparkSession, dir: String): DataFrame = {
    val p = flowRun(s, dir)
    p.metadataTable(dayTiers.find(_.suffix == "").get).read(s)
      .select(
        col("flow_id"), col("begin_time"), col("duration"), col("completed"),
        col("new_account"), col("context"), col("utm_campaign"), col("locale"),
        col("uid"), col("continued_from"),
        col("export_date").cast("string").as("export_date"))
      .orderBy(col("flow_id"), col("begin_time"))
  }

  /** F4 — the final flow_experiments (100% tier). */
  private def flowExperimentsFinal(s: SparkSession, dir: String): DataFrame = {
    val p = flowRun(s, dir)
    p.experimentsTable(dayTiers.find(_.suffix == "").get).read(s)
      .select(col("experiment"), col("cohort"), col("timestamp"), col("flow_id"),
        col("uid"), col("export_date").cast("string").as("export_date"))
      .orderBy(col("flow_id"), col("timestamp"), col("experiment"))
  }

  /** D3 invariant + per-tier sampling/retention of the absorbed
    * flow_events tables: per (tier, type) counts — control event types
    * must be gone, and the oracle recomputes every surviving count. */
  private def flowEventsAbsorbed(s: SparkSession, dir: String): DataFrame = {
    val p = flowRun(s, dir)
    dayTiers.map { tier =>
      p.importer.table(tier).read(s)
        .groupBy(col("type"))
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("flow_id")).as("n_flows"))
        .withColumn("tier_pct", lit(tier.percent))
    }.reduce(_ unionAll _).orderBy(col("tier_pct"), col("type"))
  }

  // ---------------------------------------------------------------------
  // Daily summaries + counts (q15-q17)
  // ---------------------------------------------------------------------

  /** E3/B7/G1 — daily_activity_per_device: the distinct device rollup
    * over the imported (truncated, retention-filtered) activity tables.
    * Returns the 100% tier's rows. */
  private def dailyDevicesRollup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DailySummaries
    import graft.util.TmpDirs
    val imp = activityRun(s, dir)
    val sums = new DailySummaries(
      TmpDirs.fresh(s"q15_sum_${java.lang.Integer.toHexString(dir.hashCode)}"),
      imp, dayTiers)
    sums.summarize(s)
    sums.devicesTable(dayTiers.find(_.suffix == "").get).read(s)
      .select(col("day").cast("string").as("day"), col("uid"), col("device_id"),
        col("service"), col("ua_browser"), col("ua_version"), col("ua_os"))
      .orderBy(col("day"), col("uid"), col("device_id"), col("service"))
  }

  /** C1 + I4/I5 — the 7-day multi-device self-join built INCREMENTALLY:
    * import the first 20 days, summarize, import the rest, summarize
    * again (day_from = MAX(day)+1), and the final table must equal the
    * oracle's one-shot computation. Single 100%/60-day tier so retention
    * does not interact with the phase boundary. */
  private def multiDeviceIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{DailySummaries, EventImporter}
    import graft.sources.CsvEventSource
    import graft.util.TmpDirs
    val oneTier = Seq(graft.model.SampleTier(100, java.time.Period.ofDays(60), ""))
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val landing = TmpDirs.fresh(s"q16_landing_$tag")
    val wh = TmpDirs.fresh(s"q16_wh_$tag")
    val staged = activityStaging(s, dir)
    val imp = new EventImporter(wh, graft.model.Schemas.activity, oneTier)
    val sums = new DailySummaries(TmpDirs.fresh(s"q16_sum_$tag"), imp, oneTier)
    val split = lit("2024-01-20").cast("date")
    CsvEventSource.writeLanding(s, staged.filter(col("day") <= split), landing, "activity")
    imp.run(s, landing, "activity")
    sums.summarize(s)
    CsvEventSource.writeLanding(s, staged.filter(col("day") > split), landing, "activity")
    imp.run(s, landing, "activity")
    sums.summarize(s)
    sums.multiDeviceTable(oneTier.head).read(s)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("uid")).as("n_users"))
      .orderBy(col("day"))
  }

  /** F6/A2 + COUNTS_BEGIN — the counts import: one pre-aggregated
    * (day, accounts, verified_accounts) line per day file, hard floor
    * date, MAXERROR tolerance for a corrupted file. */
  private def countsImport(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CountsImporter
    import graft.sources.CsvEventSource
    import graft.util.TmpDirs
    val landing = TmpDirs.fresh("q17_landing")
    val perDay = Tables.events(s, dir)
      .groupBy(dayOf(col("ts")).cast("string").as("day"))
      .agg(countDistinct(col("user_id")).as("accounts"),
        count(lit(1)).as("verified_accounts"))
      .collect()
    perDay.foreach { r =>
      CsvEventSource.appendLines(s, s"$landing/fxa-basic-metrics-${r.getString(0)}.txt",
        Seq(s"${r.getString(0)},${r.getLong(1)},${r.getLong(2)}"))
    }
    // corrupt one file: a bad-arity line and a non-numeric line (< MAXERROR)
    CsvEventSource.appendLines(s, s"$landing/fxa-basic-metrics-2024-01-15.txt",
      Seq("2024-01-15,12", "2024-01-15,notanumber,3"))
    val imp = new CountsImporter(TmpDirs.fresh("q17_wh"),
      countsBegin = java.time.LocalDate.parse("2024-01-10"))
    imp.run(s, landing, "fxa-basic-metrics")
    imp.table.read(s)
      .select(col("day").cast("string").as("day"), col("accounts"),
        col("verified_accounts"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------------
  // LLM training-data pipeline operators (q20-q31)
  // ---------------------------------------------------------------------

  /** Exact dedup as a dataset operator: keep min-id doc per normalized
    * text, report survivors per (lang, source). One 8-byte-hash shuffle. */
  private def exactDedupRows(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("source"))
  }

  /** MinHash + LSH banding (16 hashes, 4 bands): near-dup candidate
    * pair volume. Joins happen only inside band buckets — the all-pairs
    * product never exists (the 100 TB shape). */
  private def minHashLsh(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.lshCandidatePairs(Tables.documents(s, dir), "doc_id", "text")
      .select(explode(array(col("a"), col("b"))).as("d"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
  }

  /** SimHash (60-bit bit-vote sketch) banded into 15-bit chunks. */
  private def simHashPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val sim = TextDedup.simHash(Tables.documents(s, dir), "doc_id", "text")
    val pairStats = TextDedup.simHashCandidatePairs(sim)
      .select(explode(array(col("a"), col("b"))).as("d"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
    pairStats.crossJoin(sim.agg(countDistinct(col("simhash")).as("n_distinct_hashes")))
  }

  /** The exact verify stage after LSH: word-set Jaccard on candidate
    * pairs, top-100 by (score, pair) — fully ordered for determinism. */
  private def ngramJaccardTopK(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    // intersect 8-byte word hashes, not strings: identical Jaccard
    // (60-bit collisions are negligible; the oracle verifies on raw
    // words, so a collision would fail the gate, not pass silently)
    val ws = docs.select(col("doc_id"),
      transform(TextDedup.normWordSet(col("text")),
        w => TextDedup.md5Hash60(w)).as("ws"))
    TextDedup.lshCandidatePairs(docs, "doc_id", "text")
      .join(ws.select(col("doc_id").as("a"), col("ws").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("ws").as("wb")), Seq("b"))
      .select(col("a"), col("b"),
        round(TextDedup.jaccard(col("wa"), col("wb")), 6).as("jac"))
      .orderBy(col("jac").desc, col("a"), col("b"))
      .limit(100)
  }

  /** Near-dup threshold sweep (q198): the tuning sheet for the
    * dedup threshold — ONE LSH cascade verifies its candidates once
    * (exact integer Jaccard ppm on word hashes), and every
    * threshold reads off the same pair relation (the q130
    * label-reuse discipline: sweeping must not re-run the cascade).
    * Coverage is the banding's candidate recall, stated. */
  private def dedupThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val ws = docs.select(col("doc_id"),
      transform(TextDedup.normWordSet(col("text")),
        w => TextDedup.md5Hash60(w)).as("ws"))
    val jp = TextDedup.lshCandidatePairs(docs, "doc_id", "text")
      .join(ws.select(col("doc_id").as("a"), col("ws").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("ws").as("wb")), Seq("b"))
      .filter(size(array_union(col("wa"), col("wb"))) > 0)
      .select(expr("cast(size(array_intersect(wa, wb)) as bigint) * 1000000" +
        " div cast(size(array_union(wa, wb)) as bigint)").as("jppm"))
    val thresholds = Seq(500000L, 700000L, 800000L, 900000L)
    jp.select(col("jppm"),
        explode(array(thresholds.map(lit(_)): _*)).as("threshold_ppm"))
      .groupBy(col("threshold_ppm"))
      .agg(count(when(col("jppm") >= col("threshold_ppm"), 1)).as("n_pairs"))
      .orderBy(col("threshold_ppm"))
  }

  /** Dup-graph triangle census (q205): how cliquish is the near-dup
    * relation — the ONE verified pair relation (q198's label-reuse
    * cascade at ≥ 0.5 Jaccard) read as a graph: wedges, triangles,
    * global clustering coefficient in exact ppm. */
  /** The verified near-dup pair relation (the q198/q205/q225 base):
    * one LSH cascade, exact integer Jaccard verify at ≥ 0.5. */
  private def verifiedDupPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val ws = docs.select(col("doc_id"),
      transform(TextDedup.normWordSet(col("text")),
        w => TextDedup.md5Hash60(w)).as("ws"))
    TextDedup.lshCandidatePairs(docs, "doc_id", "text")
      .join(ws.select(col("doc_id").as("a"), col("ws").as("wa")), Seq("a"))
      .join(ws.select(col("doc_id").as("b"), col("ws").as("wb")), Seq("b"))
      .filter(size(array_union(col("wa"), col("wb"))) > 0 &&
        expr("cast(size(array_intersect(wa, wb)) as bigint) * 1000000" +
          " div cast(size(array_union(wa, wb)) as bigint)") >= 500000L)
      .select(col("a"), col("b"))
  }

  private def dupGraphTriangles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.triangleCensus(verifiedDupPairs(s, dir))

  /** Degree-capped census (q225): the dense-graph path — each node
    * keeps its 2 smallest-id neighbors, an edge survives on BOTH
    * endpoints; the bound that kept the 10× fixture census from
    * going quadratic, oracle-exercised on the real corpus. */
  private def dupTrianglesCapped(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.triangleCensus(verifiedDupPairs(s, dir),
      maxDegree = 2)

  /** Embedding cosine near-dup pairs (brute force — correct baseline;
    * the LSH-bucketed path in q26 is the 100 TB shape). */
  private def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    // norms precomputed once per vector (not once per pair)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy(col("a"), col("b"))
  }

  /** Brute-force cosine top-5 for the first 20 vectors. */
  private def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Sign-random-projection LSH (6 deterministic md5-parity
    * hyperplanes): per query, bucket population and recall@5 overlap
    * with the exact top-5. */
  private def annLshRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", Similarity.signRandomProjection(col("embedding"), 64, 6))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("bucket"))
    val exact = Similarity.bruteForceTopK(
      queries.drop("qbucket"), corpus.drop("bucket"), k = 5)
      .select(col("qid"), col("id"))
    val lsh = Similarity.lshTopK(queries, corpus, k = 5)
      .select(col("qid"), col("id"))
    val mates = corpus.join(broadcast(queries),
        col("qbucket") === col("bucket") && col("qid") =!= col("id"))
      .groupBy("qid").agg(count(lit(1)).as("n_mates"))
    val hits = lsh.join(exact, Seq("qid", "id"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    queries.select(col("qid"))
      .join(mates, Seq("qid"), "left")
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_mates"), lit(0L)).as("n_mates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy(col("qid"))
  }

  /** Marker-word language ID vs the labeled lang column. */
  private def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    Tables.documents(s, dir)
      .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Quality facets per source — integer arithmetic only. */
  private def qualityScores(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val t = col("text")
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(t)).as("sum_words"),
        sum(length(t)).as("sum_chars"),
        sum(TextAnalysis.stopwordCount(t, TextAnalysis.langMarkers.head._2)).as("sum_stop"),
        count(when(TextAnalysis.highQuality(t), 1)).as("n_highq"))
      .orderBy(col("source"))
  }

  /** Token statistics per lang: whitespace + BPE-ish subword counts. */
  private def tokenStats(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val t = col("text")
    val d = Tables.documents(s, dir)
    val perLang = d.groupBy(col("lang"))
      .agg(
        sum(TextAnalysis.tokenCount(t)).as("total_words"),
        sum(TextAnalysis.subwordCount(t)).as("total_subwords"),
        max(array_max(transform(split(t, " "), w => length(w)))).cast("long").as("max_wlen"))
    val distinctWords = d
      .select(col("lang"), explode(split(t, " ")).as("w"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("w")).as("n_distinct_words"))
    perLang.join(distinctWords, Seq("lang")).orderBy(col("lang"))
  }

  /** Document fingerprints: MinHash@1, folded hash-sum, rolling hash. */
  private def fingerprints(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    Tables.documents(s, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        TextAnalysis.fingerprintMin(col("text")).as("fp_min"),
        TextAnalysis.fingerprintSum(col("text")).as("fp_sum"),
        TextAnalysis.fingerprintRolling(col("text")).as("fp_roll"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal pipeline: binary media column (real P6 PPM images) →
    * batched partition-local feature extraction through a real,
    * spec-compliant PPM decoder (dimensions + raster checksum). */
  private def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractFeatures(s,
        Multimodal.attachMedia(s, Tables.documents(s, dir)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Video frame sampling (q167): concatenated-P6 frame streams (the
    * ffmpeg image2pipe layout) walked by a real header-parsing
    * decoder, every-2nd-frame sampling — the curation primitive that
    * feeds a vision encoder. Media bytes never shuffle; only sampled
    * feature rows leave the task. */
  private def videoFrameSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.sampleFrames(s,
        Multimodal.attachVideo(s, Tables.documents(s, dir)), everyN = 2)
      .toDF()
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("px_checksum"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Image center-crop (q185): the vision-preprocessor primitive over
    * the P6 media column — centered 4×4 crop by pure byte indexing,
    * checksummed; media bytes never shuffle. */
  private def imageCropQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.centerCrop(s,
        Multimodal.attachMedia(s, Tables.documents(s, dir)),
        targetW = 4, targetH = 4)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Image resize (q202): nearest-neighbor scale of the P6 media to
    * the encoder's fixed 8×8 grid — floor index mapping, work per
    * image independent of source size; media bytes never shuffle. */
  private def imageResizeQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.resizeNearest(s,
        Multimodal.attachMedia(s, Tables.documents(s, dir)),
        targetW = 8, targetH = 8)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Audio modality (q77): deterministic 16-bit PCM WAV payloads
    * decoded by a real RIFF chunk-walking parser; Σ|sample| is the
    * integer loudness proxy. Same batched extraction shape as q31. */
  private def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractAudioFeatures(s,
        Multimodal.attachAudio(s, Tables.documents(s, dir)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Audio silence trim (q206): strip below-threshold samples from
    * both ends of each PCM clip — the pre-transcription curation
    * pass; interior quiet is kept, all-quiet clips report n_kept=0. */
  private def audioTrimQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.trimSilence(s,
        Multimodal.attachAudio(s, Tables.documents(s, dir)),
        threshold = 2048)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** MinHash over character 8-gram shingles — the fine-grained
    * shingling variant (boilerplate-heavy corpora). */
  private def minHashCharShingles(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    // 32/4 (8 rows/band ≈ 0.84 threshold): char 8-gram space is already
    // discriminative, so the steep 64/16 word-set setting would double
    // the signature cost for no selectivity gain
    TextDedup.lshCandidatePairs(Tables.documents(s, dir), "doc_id", "text",
        numHashes = 32, bands = 4, shingler = TextDedup.charShingles(_))
      .select(explode(array(col("a"), col("b"))).as("d"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
  }

  /** Embedding near-dup through SRP buckets — the 100 TB path for q24:
    * compare only within 4-bit sign-random-projection buckets, report
    * bucketed vs exact pair counts (the recall trade, quantified). */
  private def embeddingNearDupBucketed(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"),
        Similarity.signRandomProjection(col("embedding"), 64, 4).as("bucket"))
      .cache()
    def pairs(joinExtra: org.apache.spark.sql.Column): DataFrame = {
      val a = e.select(col("vec_id").as("a"), col("embedding").as("va"),
        col("nrm").as("na"), col("bucket").as("ba"))
      val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"),
        col("nrm").as("nb"), col("bucket").as("bb"))
      a.join(b, col("a") < col("b") && joinExtra)
        .select(round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
        .filter(col("cos") >= 0.4)
    }
    pairs(col("ba") === col("bb"))
      .agg(count(lit(1)).as("n_pairs_bucketed"))
      .crossJoin(pairs(lit(true)).agg(count(lit(1)).as("n_pairs_exact")))
  }

  /** Near-dup clusters: connected components over the LSH candidate
    * graph — the step that makes dedup a dataset operation (keep one
    * representative per component). Pipeline order matters at scale:
    * exact dedup runs FIRST (one cheap 8-byte-hash shuffle), so
    * byte-identical templated docs never inflate the LSH buckets or
    * the component graph. Oracle: recursive-CTE transitive closure
    * with min-label reduction over the same survivor set. */
  private def nearDupComponents(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val survivors = TextDedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
    val pairs = TextDedup.lshCandidatePairs(survivors, "doc_id", "text")
    val comp = TextDedup.connectedComponents(pairs)
    val sizes = comp.groupBy(col("label")).agg(count(lit(1)).as("csize"))
    sizes.agg(
      count(lit(1)).as("n_components"),
      max(col("csize")).as("max_component"),
      sum(col("csize")).cast("long").as("n_docs_in_pairs"))
  }

  /** Gap-based sessionization via Spark's native session_window (30-min
    * inactivity gap), verified against a gaps-and-islands oracle. */
  private def sessionWindows(s: SparkSession, dir: String): DataFrame = {
    val perSession = Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    perSession.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** The SQL surface: spark.sql over temp views, calling the engine's
    * registered native function from SQL. */
  private def sqlApiNorms(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_v")
    s.sql("""
      SELECT vec_id, label,
             round(graft_array_dot(embedding, embedding), 6) AS sqnorm
      FROM embeddings_v WHERE vec_id < 50 ORDER BY vec_id""")
  }

  /** Exact interpolated percentiles of event value per type (quality
    * cutoffs in data curation are percentile-driven; exact `percentile`
    * and DuckDB's quantile_cont share the linear-interpolation
    * definition, so the oracle matches bit-for-bit). */
  private def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))
      .orderBy(col("event_type"))

  /** ROLLUP over (lang, source): per-group, per-lang and grand-total
    * doc counts in one pass (grouping sets). */
  private def docRollup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("source"))

  /** A7 — the Pad field-count policy end to end (pad-flow-data.sh:19):
    * short lines are completed with '' fields (never dropped, never
    * null), full-width lines pass through untouched. The oracle adds
    * the literal padded rows to the clean staging aggregate. */
  private def padPolicyIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.CsvEventSource
    import graft.util.TmpDirs
    val landing = TmpDirs.fresh("q39_landing")
    val days = CsvEventSource.writeLanding(s, activityStaging(s, dir), landing, "activity")
    // short lines: 2, 5 and exactly-8 fields (activity = ts + 7 cols)
    CsvEventSource.appendLines(s, s"$landing/activity-${days.head}.csv", Seq(
      "1704100000,padb",
      "1704100001,padb,padv,pados,paduid",
      "1704100002,padb,padv,pados,paduid,padtype,padsvc,paddev"))
    val perDay = graft.util.Par.map(CsvEventSource.listDays(s, landing, "activity")) {
      case (_, file) =>
        CsvEventSource.readDay(s, file, graft.model.Schemas.activity,
          CsvEventSource.Pad, maxError = 10, persist = false)
    }
    perDay.reduce(_ unionAll _)
      .groupBy(col("type"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("uid") === "", 1)).as("n_empty_uid"),
        count(when(col("device_id") === "", 1)).as("n_empty_device"))
      .orderBy(col("type"))
  }

  /** D4 — compaction lifecycle: accrete one day partition with six
    * small incremental writes (the many-tiny-files failure mode of
    * incremental jobs), `compactDay` it back to `filesPerDay` sorted
    * files via the temp-dir-and-swap path, and prove file count AND
    * row fidelity. The oracle recomputes the day's aggregate from the
    * source table; the file counts are the operator's invariants. */
  private def compactionLifecycle(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.util.TmpDirs
    val root = TmpDirs.fresh("q40_compact")
    val t = new DayPartitionedTable(root, "events_store",
      sortCol = Some("ts"), filesPerDay = 2)
    val day = "2024-01-15"
    val slice = Tables.events(s, dir)
      .filter(dayOf(col("ts")) === lit(day).cast("date"))
    (0 until 6).foreach { i =>
      slice.filter(pmod(col("event_id"), lit(6)) === i)
        .coalesce(1)
        .write.mode("append").parquet(s"${t.path}/day=$day")
    }
    def nFiles: Long =
      t.read(s).select(input_file_name()).distinct().count()
    val before = nFiles
    t.compactDay(s, java.time.LocalDate.parse(day))
    val after = nFiles
    t.read(s)
      .groupBy(col("day").cast("string").as("day"))
      .agg(
        lit(before).as("files_before"),
        lit(after).as("files_after"),
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("sum_event_id"))
      .orderBy(col("day"))
  }

  /** J — the orchestrated driver (`make import`, Makefile:17-22): all
    * four pipelines + the daily summary over one landing root, single
    * 100%/18-day tier. The gate is the Makefile-final artifact — the
    * 7-day multi-device rollup — recomputed declaratively by the
    * oracle (device pairs over the retention-filtered staging). */
  private def runImportE2E(s: SparkSession, dir: String): DataFrame =
    runImportE2EImpl(s, dir, "q41", json = false)

  /** K40 oracle gate (q234): the SAME Makefile-order orchestration over
    * a JSON-LINES landing, hash-compared against the SAME DuckDB
    * re-derivation as the CSV path (q41) — format-blindness as a
    * CORRECTNESS row, not just the JSON≡CSV parity spec. */
  private def runImportJsonE2E(s: SparkSession, dir: String): DataFrame =
    runImportE2EImpl(s, dir, "q234", json = true)

  private def runImportE2EImpl(
      s: SparkSession, dir: String, qtag: String, json: Boolean): DataFrame = {
    import graft.jobs.RunImport
    import graft.sources.{CsvEventSource, JsonEventSource, LandingFormat}
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"${qtag}_landing_$tag")
    if (json) {
      JsonEventSource.writeLanding(s, activityStaging(s, dir), s"$root/activity", "activity")
      JsonEventSource.writeLanding(s, flowStaging(s, dir), s"$root/flow", "flow")
      JsonEventSource.writeLanding(s, emailStaging(s, dir), s"$root/email", "email-events")
    } else {
      CsvEventSource.writeLanding(s, activityStaging(s, dir), s"$root/activity", "activity")
      CsvEventSource.writeLanding(s, flowStaging(s, dir), s"$root/flow", "flow")
      CsvEventSource.writeLanding(s, emailStaging(s, dir), s"$root/email", "email-events")
    }
    Tables.events(s, dir)
      .groupBy(dayOf(col("ts")).cast("string").as("day"))
      .agg(countDistinct(col("user_id")).as("accounts"),
        count(lit(1)).as("verified_accounts"))
      .collect()
      .foreach { r =>
        CsvEventSource.appendLines(s, s"$root/counts/fxa-basic-metrics-${r.getString(0)}.txt",
          Seq(s"${r.getString(0)},${r.getLong(1)},${r.getLong(2)}"))
      }
    val oneTier = dayTiers.filter(_.suffix == "")
    val formats: Map[String, LandingFormat] =
      if (json) Map("activity" -> LandingFormat.Json,
        "flow" -> LandingFormat.Json, "email" -> LandingFormat.Json)
      else Map.empty
    val job = new RunImport(TmpDirs.fresh(s"${qtag}_wh_$tag"), root, oneTier,
      countsBegin = java.time.LocalDate.parse("2024-01-10"),
      formats = formats)
    job.run(s)
    job.summaries.multiDeviceTable(oneTier.head).read(s)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("uid")).as("n_users"))
      .orderBy(col("day"))
  }

  /** The approx_percentile scale path beside q37's exact form: exact
    * `percentile` buffers EVERY value per group in one agg buffer (OOM
    * at 100 TB); `approx_percentile` is the mergeable-sketch form with
    * bounded state. The gate: exact quantiles hash-match the oracle,
    * and the sketch answer must sit within 5% of the value range of
    * the exact answer (deterministically true at this accuracy). */
  private def valuePercentilesApprox(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"),
        (max(col("value")) - min(col("value"))).as("rng"))
      .select(col("event_type"), col("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <= col("rng") * 0.05)
          .as("approx_ok"))
      .orderBy(col("event_type"))

  /** As-of join (operators/AsOfJoin): each purchase picks up the most
    * recent prior page view of the same user — one shuffle + one
    * partition-local sort, never the per-key quadratic product a range
    * join would build. Unmatched purchases (no earlier view) keep null. */
  private def asOfPrevView(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    AsOfJoin.asOf(purchases, views,
        key = "user_id", time = "ts", tie = "event_id",
        payload = Seq("event_id", "ts"))
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("asof_event_id").as("view_event_id"),
        (unix_seconds(col("ts")) - unix_seconds(col("asof_ts"))).as("gap_sec"))
      .orderBy(col("event_id"))
  }

  /** KMV distinct sketch (functions/KMinValues — native mergeable
    * aggregate with a bounded ≤k buffer): per event type, the k
    * smallest distinct user-id hashes, the textbook (k-1)/R_k
    * estimator, and the exact count beside it. The sketch is a pure
    * function of the input set, so the DuckDB oracle reproduces it
    * value-for-value — unlike HLL, whose registers no other engine can
    * check. */
  private def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup.md5Hash60
    val k = 64
    val m = 1152921504606846976.0 // 2^60: the hash space of md5Hash60
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        call_function("graft_kmv",
          md5Hash60(col("user_id").cast("string")), lit(k)).as("kmv"),
        countDistinct(col("user_id")).as("n_exact"))
      .select(
        col("event_type"),
        size(col("kmv")).cast("long").as("sketch_size"),
        try_element_at(col("kmv"), lit(k)).as("kth_min"),
        when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(m) /
              try_element_at(col("kmv"), lit(k)).cast("double"), 4))
          .as("est_distinct"),
        col("n_exact"))
      .orderBy(col("event_type"))
  }

  /** TF-IDF top terms per language (operators/TextAnalysis): corpus
    * characterization with the df side reduced to vocabulary size and
    * broadcast. */
  private def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.tfIdfTopTerms(
        Tables.documents(s, dir), "doc_id", "text", "lang", topK = 10)
      .withColumnRenamed("grp", "lang")
      .orderBy(col("lang"), col("rank"))
  }

  /** I3 "v2" under the oracle gate: the streaming sessionizer
    * (flatMapGroupsWithState + 25 h watermark) replayed over the
    * engine's own day-partitioned storage with Trigger.AvailableNow,
    * one file per batch — the watermark advances BETWEEN days exactly
    * as a live deployment would see it, and event-time timeouts flush
    * every session. Two tick days (far past the data, no flow.begin →
    * they emit nothing) push the final watermark past every timeout.
    * The oracle recomputes the same per-flow fold declaratively. */
  private def streamingSessions(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.streaming.StreamingSessionizer
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q46_stream_$tag")
    val e = Tables.events(s, dir)
    val fe = e.select(
      col("ts"),
      when(col("event_type") === "signup", lit("flow.begin"))
        .when(col("event_type") === "purchase", lit("flow.complete"))
        .when(col("event_type") === "error", lit("account.created"))
        .otherwise(lit("flow.event")).as("type"),
      md5(concat(col("user_id").cast("string"), lit("#"),
        dayOf(col("ts")).cast("string"))).as("flow_id"),
      (unix_millis(col("ts")) % 100000000L).as("flow_time"),
      concat(lit("loc"), (col("user_id") % 7).cast("string")).as("locale"),
      md5(col("user_id").cast("string")).as("uid"),
      dayOf(col("ts")).as("day"))
    val t = new DayPartitionedTable(root, "flow_events", sortCol = Some("ts"))
    t.writeDays(fe)
    val realFiles = t.read(s).select(input_file_name()).distinct().count().toInt
    // Tick days, written AFTER the data so modification time (the file
    // source's processing order) puts them last. Timeouts fire in the
    // batch AFTER the watermark advances past them, so the flush needs
    // two tick batches: batch k processes every real file (watermark
    // still at its pre-tick value — no real event is ever late), batch
    // k+1 the first tick day (advancing the watermark past every real
    // deadline), batch k+2 the second tick day (firing them). The first
    // tick day spans `realFiles` files so the two ticks can never share
    // a batch; tick flows have no flow.begin and emit nothing.
    val maxDay = t.maxDay(s).get
    def tickRows(n: Int, d: Long): DataFrame = {
      val tick = maxDay.plusDays(d)
      s.range(n.toLong).select(
        lit(java.sql.Timestamp.valueOf(s"$tick 00:00:00")).as("ts"),
        lit("tick").as("type"),
        concat(lit(s"tick-$d-"), col("id")).as("flow_id"),
        lit(0L).as("flow_time"), lit("").as("locale"), lit("").as("uid"))
    }
    tickRows(realFiles, 3).repartition(realFiles)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(3)}")
    tickRows(1, 6).coalesce(1)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(6)}")
    val sink = s"q46_sessions_$tag"
    val q = StreamingSessionizer.sessionize(
        StreamingSessionizer.fileStream(s, t.path, Some(realFiles)))
      .writeStream
      .format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink).orderBy(col("flow_id"))
  }

  /** Streaming daily rollups (StreamingRollups) oracle-gated the q46
    * way: replay the events table through the file source day by day
    * (AvailableNow + maxFilesPerTrigger so the watermark advances
    * BETWEEN days), two tick batches flush the final windows, and the
    * tick windows themselves never close so they never reach the sink.
    * Per-type daily counts are checked hash-exact; the HLL
    * `dau_approx` column is reduced to a Spark-side tolerance flag vs
    * the exact batch DAU (the q42 technique — DuckDB cannot replay
    * Spark's HLL sketch, but it can assert the flag). */
  private def streamingDailyRollups(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.streaming.StreamingRollups
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q58_stream_$tag")
    val e = Tables.events(s, dir)
      .select(col("ts"), col("user_id"), col("event_type"), dayOf(col("ts")).as("day"))
    val t = new DayPartitionedTable(root, "events_by_day", sortCol = Some("ts"))
    t.writeDays(e)
    val realFiles = t.read(s).select(input_file_name()).distinct().count().toInt
    // same two-tick flush as q46: batch k+1 advances the watermark past
    // every real day window, batch k+2 evicts/emits them; the tick
    // windows stay open and are never emitted (negative user_ids and a
    // 'tick' type keep them self-describing if one ever leaks — the
    // day join below would drop it anyway).
    val maxDay = t.maxDay(s).get
    def tickRows(n: Int, d: Long): DataFrame = {
      val tick = maxDay.plusDays(d)
      s.range(n.toLong).select(
        lit(java.sql.Timestamp.valueOf(s"$tick 00:00:00")).as("ts"),
        (col("id") - 1000000L).as("user_id"),
        lit("tick").as("event_type"))
    }
    tickRows(realFiles, 3).repartition(realFiles)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(3)}")
    tickRows(1, 6).coalesce(1)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(6)}")
    def replay(): DataFrame = s.readStream
      .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, day DATE")
      .option("maxFilesPerTrigger", realFiles)
      .parquet(t.path)
      .select("ts", "user_id", "event_type")
    def runToTable(df: DataFrame, name: String): DataFrame = {
      val q = df.writeStream
        .format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", s"$root/ckpt_$name")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
    }
    val typeCounts =
      runToTable(StreamingRollups.dailyTypeCounts(replay()), s"q58_types_$tag")
    val dau =
      runToTable(StreamingRollups.dailyActiveUsers(replay()), s"q58_dau_$tag")
    val exact = Tables.events(s, dir)
      .groupBy(dayOf(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("dau_exact"))
    val dauOk = dau.join(exact, Seq("day"))
      .select(col("day"),
        (abs(col("dau_approx") - col("dau_exact")) <=
          greatest(lit(2L), (col("dau_exact") * 0.15).cast("long"))).as("dau_ok"))
    typeCounts.join(dauOk, Seq("day"))
      .select(col("day").cast("string").as("day"), col("event_type"),
        col("n_events"), col("dau_ok"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Benchmark-contamination scan: which corpus documents share char
    * 8-gram shingles with a held-out eval set (doc_id < 20 stands in
    * for the benchmark). The eval shingle set is tiny → broadcast; the
    * corpus side is one explode + hash + count, never a doc×doc
    * product. A doc is flagged when shared shingles reach half its
    * shingle set.
    *
    * Single corpus pass: the eval set joins in as a broadcast LEFT
    * join with a hit marker, so one explode + hash + aggregation
    * computes both the total and the shared shingle counts — the
    * two-branch form scanned and hashed the corpus twice and
    * shuffled it twice. */
  private def contaminationScan(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    def shingles(d: DataFrame): DataFrame = d
      .select(col("doc_id"), explode(TextDedup.charShingles(col("text"))).as("w"))
      .select(col("doc_id"), TextDedup.md5Hash60(col("w")).as("h"))
    val evalSh = shingles(docs.filter(col("doc_id") < 20)).select(col("h")).distinct()
      .withColumn("hit", lit(1))
    shingles(docs.filter(col("doc_id") >= 20))
      .join(broadcast(evalSh), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        (col("n_shared") * 2 >= col("n_shingles")).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Quality-percentile curation filter: per-language p75 length
    * cutoff (exact percentile — interpolation identical to DuckDB's
    * quantile_cont), thresholds broadcast back onto the corpus, per
    * (lang, source) keep rates. The percentile-driven gate is how
    * real curation picks quality cutoffs without hand-tuned
    * constants. */
  private def qualityPercentileFilter(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val thr = d.groupBy(col("lang"))
      .agg(expr("percentile(n_chars, 0.75)").as("thr"))
    d.join(broadcast(thr), Seq("lang"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("n_chars") >= col("thr"), 1)).as("n_kept"))
      .orderBy(col("lang"), col("source"))
  }

  /** q25's brute-force ANN re-expressed through the bounded
    * `graft_topk` heap aggregate (functions/TopKByScore): same rows as
    * the window form, but the shuffle carries ≤k entries per group
    * instead of every scored pair — the form that survives a
    * billion-candidate verify stage. Oracle: identical to q25's. */
  private def annTopKAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.bruteForceTopKAgg(queries, corpus, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF-style ANN: 16 deterministic seed centroids (vec_id 20–35)
    * quantize the corpus via plan-time literal dot products (map-only
    * cell assignment); each query probes its 4 nearest cells, so the
    * exact-cosine stage touches ~4/16 of the corpus. The collect is
    * the 16-row quantizer, not data. */
  /** The fixture's shared centroid/codebook seed set (vec_id 20..35)
    * as id-sorted (id, vec) pairs — one definition for q50/q59/q63/
    * q70/q73, so the seed range can never silently diverge between
    * the oracle-gated queries and the spec fixtures. Bounded model
    * state (16 vectors), not a data collect. */
  private def seedVectors(e: DataFrame): Seq[(Long, Array[Float])] =
    e.filter(col("vec_id") >= 20 && col("vec_id") < 36)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq.sortBy(_._1)

  private def ivfAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val centroids = seedVectors(e)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.ivfTopK(queries, corpus, centroids, nprobe = 4, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Lloyd-TRAINED IVF recall audit: one deterministic spherical Lloyd
    * step (Similarity.lloydStepDeterministic — ascending-id member
    * fold, so the refined centroids are bit-reproducible in DuckDB via
    * `list_reduce`) refines q50's 16 seed centroids; the corpus
    * re-quantizes against the refined set, each query probes its 4
    * nearest refined cells, and recall@5 is scored against the exact
    * brute-force top-5. This gates the IVF TRAINING path end-to-end,
    * not just q50's probe path. At 100 TB the training sample is
    * bounded (Lloyd always trains on a sample), so the id-sorted
    * member collect stays modest while probing/scoring remain
    * distributed. IvfLloydSpec asserts the trained recall beats a
    * floor and does not trail the seed centroids' recall. */
  private def ivfLloydRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val refined = Similarity.lloydStepDeterministic(corpus, seeds)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = Similarity.ivfTopK(queries, corpus, refined, nprobe = 4, k = 5)
      .select(col("qid"), col("id"))
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select(col("qid"), col("id"))
    val hits = ivf.join(exact, Seq("qid", "id"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    queries.select(col("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy(col("qid"))
  }

  /** Bloom-prefiltered incremental exact dedup: index = docs with
    * doc_id % 10 < 8 (the q56 crawl split), new batch = the rest. A
    * graft_bloom sketch of the index (bounded bytes, broadcast as a
    * literal) splits the batch map-side: definitely-new rows skip the
    * index join entirely (a Bloom filter has no false negatives), and
    * only the maybe-seen sliver pays the anti-join shuffle — the plan
    * that survives 100 TB/day against a multi-PB index. The result is
    * EXACT, so the oracle is the plain set-semantics anti-join. */
  private def bloomIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val index = docs.filter(col("doc_id") % 10 < 8)
      .select(TextDedup.md5Hash60(TextDedup.norm(col("text"))).as("h"))
      .distinct()
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    val (survivors, _) = TextDedup.dedupAgainstIndexBloom(
      batch, "text", "doc_id", index, numBits = 1 << 16, numHashes = 7)
    survivors.select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Sharded-Bloom incremental dedup (q71): q60's exact contract
    * through the hash-prefix-sharded prefilter — the index aggregates
    * per-shard sketches instead of one driver-collected literal, so
    * the plan scales past the single-sketch broadcast ceiling. Same
    * oracle semantics as q60 by construction (the sketch changes the
    * plan, never the answer). */
  private def bloomShardedDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val index = docs.filter(col("doc_id") % 10 < 8)
      .select(TextDedup.md5Hash60(TextDedup.norm(col("text"))).as("h"))
      .distinct()
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    val (survivors, _) = TextDedup.dedupAgainstIndexBloomSharded(
      batch, "text", "doc_id", index,
      shards = 5, numBitsPerShard = 1 << 14, numHashes = 7)
    survivors.select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-window chunking: 16-token windows every 8 tokens (50%
    * overlap), the map-only explode that turns curated docs into
    * fixed-size training examples. No shuffle anywhere — the ORDER BY
    * here is only the oracle-compare canonicalization. */
  private def chunkDocumentsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.chunkDocuments(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 16, stride = 8)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** JSON-lines ingestion (q64): the CSV ingest contract (MAXERROR,
    * TRUNCATECOLUMNS, ''-vs-null) over a second wire format, sharing
    * the EventFamily schema metadata. Derives the same activity staging
    * days as q10, writes them as JSON-lines landing files, corrupts one
    * with malformed/unparseable lines (all of which must be dropped
    * within MAXERROR), ingests every day, and runs q10's aggregate —
    * so the oracle is the SAME clean-derivation SQL as q10's. */
  private def jsonIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{CsvEventSource, JsonEventSource}
    import graft.util.TmpDirs
    val landing = TmpDirs.fresh("q64_landing")
    val days = JsonEventSource.writeLanding(s, activityStaging(s, dir), landing, "activity")
    CsvEventSource.appendLines(s, s"$landing/activity-${days.head}.json", Seq(
      """this is not json at all""",
      """{"timestamp":"not_a_ts","ua_browser":"b1","uid":"u","type":"login"}""",
      """{"ua_browser":"missing ts","uid":"u","type":"login"}""",
      """[1, 2, 3]"""))
    val perDay = graft.util.Par.map(JsonEventSource.listDays(s, landing, "activity")) {
      case (_, file) =>
        JsonEventSource.readDay(s, file, graft.model.Schemas.activity,
          maxError = 10, persist = false)
    }
    perDay.reduce(_ unionAll _)
      .groupBy(col("type"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("uid")).as("n_users"),
        count(when(col("service") === "", 1)).as("n_empty_service"),
        count(when(length(col("ua_browser")) === 40, 1)).as("n_truncated"))
      .orderBy(col("type"))
  }

  /** Streaming watermarked dedup (q65): replay the events table through
    * `dropDuplicatesWithinWatermark` on a collision-heavy key
    * (event_id % 500) with every real file in ONE AvailableNow batch,
    * so suppression is global and the emitted key set equals batch
    * DISTINCT — which is exactly what the DuckDB oracle checks.
    * Cross-batch suppression and state expiry are covered by the
    * MemoryStream specs (StreamingRollupsSpec), where batch boundaries
    * are controllable; a file-replay oracle must not depend on file
    * listing order, so the single-batch form is the deterministic
    * contract. */
  private def streamingDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.streaming.StreamingRollups
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q65_stream_$tag")
    val e = Tables.events(s, dir)
      .select(col("ts"), (col("event_id") % 500).as("did"), dayOf(col("ts")).as("day"))
    val t = new DayPartitionedTable(root, "events_by_day", sortCol = Some("ts"))
    t.writeDays(e)
    val realFiles = t.read(s).select(input_file_name()).distinct().count().toInt
    val replayed = s.readStream
      .schema("ts TIMESTAMP, did BIGINT, day DATE")
      .option("maxFilesPerTrigger", realFiles)
      .parquet(t.path)
      .select("ts", "did")
    val q = StreamingRollups.dedupStream(replayed, "did")
      .select(col("did"))
      .writeStream
      .format("memory").queryName(s"q65_dedup_$tag").outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(s"q65_dedup_$tag").orderBy(col("did"))
  }

  /** Unigram surprisal (q67): mean negative log-probability of each
    * doc's tokens under the corpus's own unigram LM — the cheap
    * perplexity-filter proxy. Per-token surprisal quantizes to integer
    * micro-nats BEFORE the per-doc sum, so aggregation order cannot
    * move the result. */
  private def unigramSurprisalQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.unigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Shared retrieval feeders (q19/q68/q72/q76): docs 0..19 are the
    * queries, the rest the corpus; tokens are md5-hashed (counts and
    * set sizes are hash-invariant, the postings shuffle narrows). */
  private def lexFeeder(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{HybridSearch, TextDedup}
    import org.apache.spark.sql.Column
    val docs = Tables.documents(s, dir)
    def ws(c: Column): Column =
      transform(TextDedup.normWordSet(c), w => TextDedup.md5Hash60(w))
    HybridSearch.lexicalTopK(
      docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), ws(col("text")).as("qws")),
      docs.filter(col("doc_id") >= 20)
        .select(col("doc_id").as("id"), ws(col("text")).as("ws")),
      k = 20)
  }

  private def bm25Feeder(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{HybridSearch, TextDedup}
    import org.apache.spark.sql.Column
    val docs = Tables.documents(s, dir)
    def toks(c: Column): Column = transform(
      filter(split(TextDedup.norm(c), " "), w => w =!= ""),
      w => TextDedup.md5Hash60(w))
    HybridSearch.bm25TopK(
      docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), toks(col("text")).as("qtoks")),
      docs.filter(col("doc_id") >= 20)
        .select(col("doc_id").as("id"), toks(col("text")).as("toks")),
      k = 20)
  }

  /** Inverted-index lexical retrieval (q19): per-query top-20 corpus
    * docs by word-set Jaccard WITHOUT a query×corpus scan — corpus
    * explodes once to (token, doc) postings, query tokens join the
    * postings, overlaps accumulate map-side, and the bounded
    * graft_topk heap keeps 20 per query. The scale-shaped replacement
    * for the scan-form lexical feeder (identical ranked output on any
    * corpus where each query has ≥ 20 positive-Jaccard matches —
    * trivially true on the fixtures, min 479). */
  private def lexicalInvertedTopK(s: SparkSession, dir: String): DataFrame =
    lexFeeder(s, dir).orderBy(col("qid"), col("r"))

  /** BM25 retrieval (q72): the inverted-index postings carry term
    * frequencies and document lengths; scores quantize per matched
    * term to integer micro-points before the per-(query, doc) sum (the
    * q67 discipline), so the DuckDB oracle matches bit-for-bit. Hashed
    * tokens keep the postings shuffle narrow — tf/df/dl are invariant
    * under the hash. */
  private def bm25TopKQuery(s: SparkSession, dir: String): DataFrame =
    bm25Feeder(s, dir).orderBy(col("qid"), col("r"))

  /** Hybrid retrieval (q68): lexical Jaccard top-20 (via the q19
    * inverted-index feeder — no query×corpus scan) and cosine top-20
    * per query, fused by integer-micro-point reciprocal-rank fusion
    * (no floats anywhere in the fusion — 1000000 div (60+rank)), final
    * top-10 through the bounded graft_topk heap. Queries are docs
    * 0..19 (text + aligned embedding); corpus is the rest. */
  private def hybridSearchQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{HybridSearch, Similarity}
    val lex = lexFeeder(s, dir).select(col("qid"), col("id"), col("r"))
    val e = Tables.embeddings(s, dir)
    val vec = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        e.filter(col("vec_id") >= 20)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 20)
      .select(col("qid"), col("id"), col("rank").as("r"))
    HybridSearch.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy(col("qid"), col("rank"))
  }

  /** Three-retriever hybrid fusion (q76): BM25 (q72), inverted-index
    * Jaccard (q19), and exact cosine (q25's form) top-20s fused by
    * integer RRF into a final top-10 — the full hybrid stack, every
    * feeder scale-shaped. rrfFuse is retriever-count-agnostic, so the
    * only new code here is composition. */
  private def hybridSearch3Query(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{HybridSearch, Similarity}
    val lex = lexFeeder(s, dir).select(col("qid"), col("id"), col("r"))
    val bm = bm25Feeder(s, dir).select(col("qid"), col("id"), col("r"))
    val e = Tables.embeddings(s, dir)
    val vec = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        e.filter(col("vec_id") >= 20)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 20)
      .select(col("qid"), col("id"), col("rank").as("r"))
    HybridSearch.rrfFuse(Seq(bm, lex, vec), k = 10)
      .orderBy(col("qid"), col("rank"))
  }

  /** Decontamination dataset op (q69): q47's scan flag APPLIED — the
    * clean corpus with contaminated docs dropped. */
  private def decontaminateQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    TextDedup.decontaminate(
        docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20),
        "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Composite curation gate (q66): the full filter battery —
    * repetition flag, quality gate, PII counts, redacted footprint —
    * as ONE auditable verdict per document, reasons as data. */
  private def curateQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.curate(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Product-quantization ANN (q63): 8 subspaces × 16 deterministic
    * seed centroids (vec_id 20..35, the q59 seed set) — corpus vectors
    * compress to 8 small codes (map-only, literal codebooks), queries
    * score candidates via ADC table lookups, top-5 through the bounded
    * graft_topk heap. The DuckDB oracle mirrors encode + ADC exactly
    * (same subspace slicing, same left-to-right double sums, same
    * round-6 + lowest-cid tie-breaks). */
  private def pqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val cbs = Similarity.pqCodebooks(seedVectors(e).map(_._2), m = 8)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.pqTopK(queries, corpus, cbs, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF×PQ composed ANN (q70): the billion-scale pairing — IVF cell
    * pruning (q50's centroids, nprobe 4 of 16) bounds WHICH candidates
    * are scored, PQ ADC (q63's codebooks) bounds WHAT each costs, and
    * an exact squared-L2 re-rank of the 20-candidate shortlist
    * restores true ordering for the top-5. Same seed set (vec_id
    * 20..35) serves as both IVF centroids and PQ codebook seeds. */
  private def ivfPqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val cbs = Similarity.pqCodebooks(seeds.map(_._2), m = 8)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.ivfPqTopK(queries, corpus, seeds, cbs,
        nprobe = 4, shortlist = 20, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** SemDeDup semantic dedup (q73): embeddings cluster into the q50
    * IVF cells (vec_id 20..35 centroids), pairwise cosine runs only
    * within a cell, and any vector with a lower-id cell-mate at
    * cosine ≥ 0.4 (the q24 near-dup bar on this synthetic corpus) is
    * dropped — greedy keep-first. Survivors listed by vec_id. */
  private def semDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.semDedup(corpus, seeds, minCos = 0.4)
      .select(col("id").as("vec_id"))
      .orderBy(col("vec_id"))
  }

  /** Exact-size deterministic sample (q74): the 100 docs with the
    * smallest md5-derived id hash, via the bounded graft_topk heap —
    * never a global sort. The exact-N contract hashSample (q51)
    * cannot give. */
  private def exactSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.exactSample(Tables.documents(s, dir), "doc_id", n = 100)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing (q75): stream-pack each language's docs into
    * 512-token bins in doc_id order — one windowed integer running
    * sum per shard, `div`/`%` bin math. */
  private def packSequencesQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    Curation.packSequences(Tables.documents(s, dir), "lang", "doc_id",
        size(TextDedup.words(col("text"))), budgetTokens = 512)
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Corpus-overlap estimation from sketches (q78): per-language
    * bottom-128 KMV sketches of word-hash sets, pairwise sketch
    * Jaccard (pure array algebra over two 128-long arrays — the
    * corpora are never compared directly), with the exact Jaccard
    * alongside so the estimate is auditable. */
  private def corpusOverlapQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val k = 128
    val w = Tables.documents(s, dir)
      .select(col("lang"), explode(TextDedup.normWordSet(col("text"))).as("word"))
      .select(col("lang"), TextDedup.md5Hash60(col("word")).as("h"))
      .distinct()
    val sk = w.groupBy(col("lang"))
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("kmv"),
        count(lit(1)).as("n"))
    val pairs = sk.select(col("lang").as("lang_a"), col("kmv").as("ka"), col("n").as("na"))
      .join(sk.select(col("lang").as("lang_b"), col("kmv").as("kb"), col("n").as("nb")),
        col("lang_a") < col("lang_b"))
    val inter = w.select(col("lang").as("lang_a"), col("h"))
      .join(w.select(col("lang").as("lang_b"), col("h")), Seq("h"))
      .filter(col("lang_a") < col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("ni"))
    pairs.join(inter, Seq("lang_a", "lang_b"), "left")
      .select(col("lang_a"), col("lang_b"),
        TextDedup.sketchJaccard(col("ka"), col("kb"), k).as("sketch_jaccard"),
        round(coalesce(col("ni"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("ni"), lit(0L))).cast("double"), 6)
          .as("exact_jaccard"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** SQ8 scalar-quantized ANN (q79): per-dimension max-|v| scales
    * trained on the corpus side in one aggregate pass, symmetric int8
    * encode (floor(x+0.5) rounding — engine-identical, unlike round),
    * ranking by EXACT integer code dot product — the cheap point on
    * the quantization curve before PQ (q63). Top-5 per query off the
    * bounded heap. */
  private def sqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val scales = Similarity.sqTrain(corpus, "vec", dims = 64)
    Similarity.sqTopK(queries, corpus, scales, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** C4-style line-level boilerplate removal (q80): the corpus is
    * given a deterministic line structure (3-word lines — the fixture
    * has no newlines; the lining transform is mirrored exactly by the
    * oracle), then every line occurring in ≥ 3 distinct documents is
    * dropped corpus-wide and documents reassemble from surviving
    * lines in order. */
  private def lineDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val ws = split(col("text"), " ")
    val nc = ceil(size(ws) / lit(3.0)).cast("int")
    val lined = Tables.documents(s, dir)
      .select(col("doc_id"),
        array_join(
          transform(sequence(lit(0), nc - 1),
            i => array_join(slice(ws, i * 3 + 1, lit(3)), " ")),
          "\n").as("text"))
    TextDedup.lineDedup(lined, "doc_id", "text", sep = "\n", minDocs = 3)
      .orderBy(col("doc_id"))
  }

  /** Duplicated word-5-gram statistics (q81): per-doc total grams,
    * grams shared with any other doc, and the exact integer ppm
    * fraction — the substring-level dup signal that fires when no
    * full-document near-dup does. */
  private def dupNgramQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.dupNgramStats(Tables.documents(s, dir), "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))
  }

  /** Character-distribution entropy (q82): micro-nat quantized Shannon
    * entropy per doc — the model-free randomness quality signal. */
  private def charEntropyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Hashed-feature linear quality scorer (q83): feature-hashing
    * bag-of-words through a deterministic weight function — the
    * model-based-filter plumbing with a SQL-reproducible stand-in for
    * trained weights. */
  private def hashedQualityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.hashedQualityScore(Tables.documents(s, dir), "doc_id", "text",
        buckets = 1024)
      .orderBy(col("doc_id"))
  }

  /** Deterministic training-order shuffle (q84): every doc gets a
    * (shard, pos) address pseudo-random w.r.t. content but identical
    * across engines and runs — resumable-epoch ordering. */
  private def shuffleAssignQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.shuffleAssign(Tables.documents(s, dir), "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Audio frame energies (q85): 8-sample frames at hop 4 over the
    * decoded PCM — peak frame energy + index, total energy; the
    * windowing step under VAD/spectrogram featurizers, on the q77
    * decoder's samples. */
  private def audioFramesQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.extractAudioFrames(s,
        Multimodal.attachAudio(s, Tables.documents(s, dir)),
        frameLen = 8, hop = 4)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Exact stratified sample (q86): exactly 20 docs per language,
    * uniform within each, off per-stratum bounded heaps — the
    * balanced-mixture contract (q51 is rate-approximate, q74 is
    * global-N). */
  private def stratifiedSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.exactSampleStratified(Tables.documents(s, dir), "doc_id", "lang",
        nPerStratum = 20)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Bigram surprisal (q87): mean -ln P(w2|w1) per doc under the
    * corpus's own MLE bigram model — "common words in a weird order"
    * vs q67's unigram view. */
  private def bigramSurprisalQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.bigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Filtered ANN (q88): vector search under a metadata predicate —
    * the corpus PRE-filters (join to the doc relation on the
    * predicate), so top-k recall over the allowed set is exact by
    * construction (post-filtering an unfiltered top-k can starve);
    * then exact cosine ranking over the survivors. The fixture
    * predicate is lang='en'; at scale the same shape pushes any doc
    * predicate into the scan before vectors are touched. */
  private def filteredAnnQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val allowed = Tables.documents(s, dir)
      .filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val corpus = e.filter(col("vec_id") >= 20)
      .join(allowed, Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Semantic contamination audit (q96): q47 scans for LEXICAL overlap
    * with the eval set; this is its embedding-space complement — for
    * every eval vector, the nearest training vector by exact cosine
    * and a flag at the q24 near-dup bar. Paraphrased eval leakage
    * shows up here when no shingle matches. One bounded broadcast
    * (the eval side), k=1 through the ranking. */
  private def semanticContaminationQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val evalSet = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val train = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.bruteForceTopK(evalSet, train, k = 1)
      .select(col("qid"), col("id").as("nearest_id"), col("cos"),
        (col("cos") >= 0.4).as("contaminated"))
      .orderBy(col("qid"))
  }

  /** Per-language data card (q97): the corpus-level summary a dataset
    * release publishes — doc and exact-dup counts, token totals and
    * integer milli-mean lengths, distinct-word and source counts. Doc
    * facts aggregate once; token facts aggregate the exploded stream
    * with map-side partials; the two tiny per-lang relations join. */
  private def dataCardQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val docs = Tables.documents(s, dir)
    val docFacts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(TextDedup.norm(col("text"))).as("n_distinct_texts"),
        countDistinct(col("source")).as("n_sources"),
        sum(size(TextDedup.words(col("text"))).cast("long")).as("total_tokens"))
    val tokenFacts = docs
      .select(col("lang"), explode(TextDedup.words(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("lang"))
      .agg(countDistinct(col("t")).as("distinct_words"))
    docFacts.join(tokenFacts, Seq("lang"))
      .select(col("lang"), col("n_docs"),
        (col("n_docs") - col("n_distinct_texts")).as("n_exact_dups"),
        col("n_sources"), col("total_tokens"),
        expr("total_tokens * 1000 div n_docs").as("mean_tokens_milli"),
        col("distinct_words"))
      .orderBy(col("lang"))
  }

  /** Training manifest (q95): the curation pipeline end to end as ONE
    * declarative composition — quality gate (K52) → exact dedup (K1,
    * min-id per normalized text) → fixed-window chunking (K29, 32/32)
    * → per-shard stream packing with boundary split (K44/K63, budget
    * 64). The output is what a trainer reads: every chunk addressed to
    * (bin, offset) with its head/tail split. Each stage is the
    * already-gated operator; the composition itself is what this query
    * gates — one plan, no materialization between stages. */
  private def trainingManifestQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis, TextDedup}
    val docs = Tables.documents(s, dir)
    val kept = TextAnalysis.hashedQualityScore(docs, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val surv = TextDedup.exactDedup(
      docs.join(kept, Seq("doc_id"), "left_semi"), "text", "doc_id")
    // chunk_id = doc_id·1e5 + chunk_idx: collision-free up to 100k
    // chunks per doc (3.2M tokens at 32-token chunks) — a doc past
    // that would silently alias a neighbor's address space, so guard
    // it in-plan rather than assume it
    val chunks = Curation.chunkDocuments(surv, "doc_id", "text",
        chunkTokens = 32, stride = 32)
      .join(surv.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("lang"),
        (col("doc_id") * 100000 +
          when(assert_true(col("chunk_idx") < 100000,
              lit("q95: doc exceeds 100k chunks; widen the chunk_id base"))
            .isNull, col("chunk_idx"))).as("chunk_id"),
        col("n_tokens"))
    Curation.packSequencesSplit(chunks, "lang", "chunk_id",
        col("n_tokens"), budgetTokens = 64)
      .select(col("lang"), col("chunk_id"),
        expr("chunk_id div 100000").as("doc_id"),
        (col("chunk_id") % 100000).as("chunk_idx"),
        col("n_tokens"), col("bin"), col("bin_offset"),
        col("head_tokens"), col("tail_tokens"))
      .orderBy(col("lang"), col("chunk_id"))
  }

  /** Winnowing fingerprints (q93): MOSS-style robust substring
    * fingerprints — min hash per 4-hash window over word 4-gram
    * hashes; per-doc selection stats plus the cross-doc shared count
    * (a shared run of ≥ 7 words guarantees a shared fingerprint). */
  private def winnowingQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.winnowingFingerprints(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Packing boundary split (q94): q75's stream packing plus the
    * materialization step — head tokens in the assigned bin, tail
    * spilling into bin+1, the one-spill contract enforced in-plan. */
  private def packingSplitQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    // budget-capped inputs are the operator's one-spill CONTRACT
    // (enforced in-plan by assert_true): apply the cap as a filter so
    // the query cannot become a data-dependent whole-run abort on a
    // longer-tailed fixture — q95 shows the chunk-first form
    val capped = Tables.documents(s, dir)
      .filter(size(TextDedup.words(col("text"))) <= 512)
    Curation.packSequencesSplit(capped, "lang", "doc_id",
        size(TextDedup.words(col("text"))), budgetTokens = 512)
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Streaming quality gate (q92): the documents corpus replayed as a
    * file stream through the STATELESS map-only scorer — no watermark,
    * no state store, no shuffle; the form a curation gate takes inside
    * a streaming ingest (score-and-drop before anything pays storage).
    * One AvailableNow pass; emitted rows equal the batch scorer's
    * (doc_id, n_tokens, score, keep) exactly, which is what the q83
    * oracle (minus its mean column) checks. */
  private def streamingQualityGate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q92_stream_$tag")
    Tables.documents(s, dir).select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/docs")
    val replayed = s.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(s"$root/docs")
    val q = TextAnalysis.hashedQualityScoreMapOnly(replayed, "doc_id", "text")
      .writeStream
      .format("memory").queryName(s"q92_gate_$tag").outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(s"q92_gate_$tag").orderBy(col("doc_id"))
  }

  /** Corpus mixture plan (q90): per-source targets → ceiling
    * keep-rates → deterministic hash-gate apply, as one auditable
    * summary. Targets come from a closed-form hash of the source name
    * (the K52 stand-in pattern — real mixture specs broadcast as a
    * (src, target_n) relation through the identical plan). */
  private def mixturePlanQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    val docs = Tables.documents(s, dir)
    val targets = docs.select(col("source").as("src")).distinct()
      .withColumn("target_n",
        lit(5L) + pmod(TextDedup.md5Hash60(col("src")), lit(16L)))
    Curation.mixturePlan(docs, "doc_id", "source", targets)
      .orderBy(col("src"))
  }

  /** IVF index audit (q91): per-cell population + integer micro-unit
    * mean squared-L2 distortion to the assigned centroid — the index
    * health report an operator reads before trusting q50/q70/q89. */
  private def ivfAuditQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.ivfAudit(corpus, seedVectors(e))
      .orderBy(col("cell"))
  }

  /** IVF×SQ8 composed ANN (q89): cell pruning + int8 integer-dot
    * scoring + exact L2 re-rank — FAISS's IVF,SQ8 pairing next to
    * q70's IVF×PQ. Same seed centroids as q50/q70, same corpus-trained
    * scales as q79. */
  private def ivfSqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val scales = Similarity.sqTrain(corpus, "vec", dims = 64)
    Similarity.ivfSqTopK(queries, corpus, seeds, scales,
        nprobe = 4, shortlist = 20, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** BPE merge candidates: corpus-wide adjacent-character-pair counts
    * weighted by word frequency — the argmax is the pair a BPE trainer
    * merges next. The corpus collapses to its Zipf-bounded vocabulary
    * before any character work happens. */
  private def bpePairCountsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.bpePairCounts(Tables.documents(s, dir), "text", topK = 50)
  }

  /** Deterministic stratified sample: a pure map-side hash-threshold
    * filter (Curation.hashSample) — no sort, no shuffle, same rows on
    * every engine/run; stratification is free by hash uniformity. */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.hashSample(Tables.documents(s, dir), col("doc_id"), permille = 200)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Per-domain cap via the bounded graft_topk heap: ≤15 best docs
    * (n_chars DESC, doc_id) per source survive; the exchange carries
    * at most 15 entries per (partition, source), never whole domains. */
  private def domainCapQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.domainCap(Tables.documents(s, dir),
        "source", col("n_chars"), "doc_id", cap = 15)
      .orderBy(col("source"), col("rank"))
  }

  /** Gopher-style repetition quality signals per document. */
  private def repetitionSignalsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.repetitionSignals(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** PII redaction scan: deterministic synthetic emails/IPs are
    * injected into every 5th doc (the corpus has none — the same
    * concat runs in the oracle), then redacted; per-source counts and
    * a folded checksum of the redacted text prove byte-identical
    * replacement. */
  private def piiRedactScan(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    val injected = Tables.documents(s, dir).withColumn("text2",
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com at 10.0."),
            (col("doc_id") % 200).cast("string"), lit(".77")))
          .otherwise(lit(""))))
    injected
      .select(col("source"),
        Curation.emailCount(col("text2")).as("em"),
        Curation.ipv4Count(col("text2")).as("ip"),
        (TextDedup.md5Hash60(Curation.redactPii(col("text2"))) % 1048576L).as("ck"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("em")).as("n_emails"),
        sum(col("ip")).as("n_ips"), sum(col("ck")).as("redacted_checksum"))
      .orderBy(col("source"))
  }

  /** Bucketed range join: events falling in the 10 busiest 90-minute
    * windows. The interval side explodes to hour buckets and the join
    * is a hash equi-join on bucket + exact range filter — never the
    * broadcast nested loop Spark plans for a raw band join. The top-10
    * window over hourly counts sorts |hours| rows (tiny), not events. */
  private def rangeJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RangeJoin
    val ev = Tables.events(s, dir)
    val hours = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    // global top-10 as TakeOrdered (per-partition heap, no
    // single-partition window sort of every hour row)
    val top = hours.orderBy(col("n").desc, col("h")).limit(10)
      .select(col("h").as("w_start"),
        (col("h") + expr("INTERVAL 90 MINUTES")).as("w_end"))
    RangeJoin.bucketed(ev, "ts", top, "w_start", "w_end", bucketSeconds = 3600L)
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("n_users"))
      .orderBy(col("window_start"))
  }

  /** Incremental near-dup: the "new batch" (doc_id % 10 >= 8, ~20%)
    * probes the corpus index (the other 80%) through refined LSH band
    * keys — candidates are new×index only (never new×new or
    * index×index), then the exact Jaccard gate keeps ≥ 0.5. The
    * continuous-crawl shape: at 100 TB the index side is a persisted
    * (band, key) → id table and only the new batch computes
    * signatures. */
  private def lshIncrementalProbe(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.lshProbeIndex(Tables.documents(s, dir), "doc_id", "text",
        isNew = col("doc_id") % 10 >= 8, minJaccard = 0.5)
      .orderBy(col("new_id"), col("dup_of"))
  }

  /** The whole dedup pipeline as one dataset operator: exact dedup →
    * LSH candidates → exact-Jaccard verify → components → keep one doc
    * per cluster. This is THE headline curation op — what a training
    * corpus actually runs. Oracle: recursive-CTE closure over the same
    * gated edge set, anti-joined back. */
  private def nearDupDedupDataset(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.nearDupDedup(Tables.documents(s, dir), "doc_id", "text",
        minJaccard = 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Corpus snapshot diff (q98): two snapshots derived
    * deterministically from the fixture — the OLD snapshot drops
    * doc_id % 10 = 3, the NEW snapshot drops doc_id % 10 = 7 and
    * rewrites the text of doc_id % 10 = 5 — then the digest-compare
    * full-outer join classifies every id. Non-`unchanged` rows only:
    * the diff's consumers (re-embed, re-dedup, index maintenance)
    * never want the unchanged bulk. */
  private def snapshotDiffQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    val d = Tables.documents(s, dir)
    val oldSnap = d.filter(col("doc_id") % 10 =!= 3)
    val newSnap = d.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .filter(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))
  }

  /** Matryoshka truncated-dim retrieval (q99): brute cosine top-5 in
    * the first 16 of 64 dimensions, each hit flagged against the
    * full-dim top-5 — the MRL cheap-first-stage pattern with recall
    * evidence inline. */
  private def matryoshkaAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.matryoshkaTopK(queries, corpus, dims = 16, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Length-bucketed batch assembly (q100): pow-2 length buckets
    * [16, 512], 8-doc batches within (bucket, shard of 4), per-doc
    * padding waste — the batching layout that minimizes pad tokens
    * without a global sort. */
  private def lengthBucketQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    Curation.lengthBucketBatches(Tables.documents(s, dir), "doc_id",
        size(TextDedup.words(col("text"))), batchSize = 8, nShards = 4,
        minBucket = 16, maxBucket = 512)
      .orderBy(col("doc_id"))
  }

  /** Containment pairs (q101): doc-inside-doc detection over word
    * 3-gram sets — postings join with df cap 100, pairs whose larger
    * containment direction ≥ 30% (the fixture's docs are synthetic
    * permutations, so full quotations don't occur; the gate is set
    * where the shared-template tail is non-empty and the asymmetry
    * column shows what Jaccard would have hidden). */
  private def containmentQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, dfCap = 100, minPpm = 300000L)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Per-source score calibration (q102): token count re-expressed as
    * a within-source percentile (integer ppm), so one global threshold
    * treats terse and verbose sources fairly. */
  private def calibrateQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    Curation.calibrateScores(Tables.documents(s, dir), "doc_id", "source",
        size(TextDedup.words(col("text"))))
      .orderBy(col("doc_id"))
  }

  /** LSH index maintenance delta (q103): the q98 snapshot pair pushed
    * through digest diff → delta-only MinHash banding — del rows carry
    * the OLD text's keys, ins rows the NEW text's; unchanged docs
    * never reach the signature stage. */
  private def lshIndexDeltaQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val d = Tables.documents(s, dir)
    val oldSnap = d.filter(col("doc_id") % 10 =!= 3)
    val newSnap = d.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    TextDedup.lshIndexDelta(oldSnap, newSnap, "doc_id", "text")
      .orderBy(col("op"), col("id"), col("band"))
  }

  /** Signal correlation audit (q104): pairwise Pearson r between
    * doc-length signals (chars, tokens, distinct tokens) from one
    * integer-sum aggregation pass — the redundancy check run before
    * adding another quality filter to the gate. */
  private def signalCorrQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{TextAnalysis, TextDedup}
    TextAnalysis.signalCorrelations(Tables.documents(s, dir), Seq(
        "n_chars" -> col("n_chars"),
        "n_tokens" -> size(TextDedup.words(col("text"))),
        "n_distinct" -> size(array_distinct(TextDedup.words(col("text"))))))
      .orderBy(col("sig_a"), col("sig_b"))
  }

  /** Keep-best near-dup dedup (q105): the q57 pipeline with the
    * production keeper — per cluster, the highest-token-count doc
    * survives (tie → lowest id) instead of the lowest id. */
  private def nearDupKeepBestQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.nearDupDedupKeepBest(Tables.documents(s, dir), "doc_id", "text",
        quality = size(TextDedup.words(col("text"))), minJaccard = 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Contamination span audit (q106): q47's eval/corpus split
    * (doc_id < 20 = eval), word 3-grams; per corpus doc the longest
    * contiguous shared-gram run and its token span. */
  private def contaminationSpanQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val d = Tables.documents(s, dir)
    TextDedup.contaminationSpans(
        d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
        "doc_id", "text", n = 3)
      .filter(col("n_hit") > 0)
      .orderBy(col("doc_id"))
  }

  /** Fractional upsampling (q107): per-source targets at 0.5×/1.5×/
    * 2.5× of the source size (closed-form hash multiplier, the q90
    * stand-in pattern), applied as deterministic whole+fractional
    * repeats with a 0-based copy index. */
  private def upsampleQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextDedup}
    val docs = Tables.documents(s, dir)
    val targets = docs.groupBy(col("source").as("src"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_m", pmod(TextDedup.md5Hash60(col("src")), lit(3L)))
      .select(col("src"), expr("(_n * (2 * _m + 1)) div 2").as("target_n"))
    Curation.upsample(docs, "doc_id", "source", targets)
      .orderBy(col("doc_id"), col("copy"))
  }

  /** Zipf-law audit (q108): ln-ln least squares over the top-100
    * vocabulary of the documents corpus — one row of corpus-health
    * summary (slope ≈ the Zipf exponent). */
  private def zipfAuditQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.zipfAudit(Tables.documents(s, dir), "text", topK = 100)
  }

  /** Ranking metrics (q109): the q26 retriever pair — SRP-LSH top-10
    * graded against exact cosine top-10 as truth — through the generic
    * recall@k / reciprocal-rank evaluator. */
  private def rankingMetricsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", Similarity.signRandomProjection(col("embedding"), 64, 6))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("bucket"))
    val exact = Similarity.bruteForceTopK(
      queries.drop("qbucket"), corpus.drop("bucket"), k = 10)
    val lsh = Similarity.lshTopK(queries, corpus, k = 10)
    Similarity.rankingMetrics(exact, lsh, k = 10).orderBy(col("qid"))
  }

  /** Rare-token scrub (q110): tokens seen in fewer than 2 documents
    * masked to `<unk>`, docs reassembled; per-doc scrub accounting. */
  private def rareTokenScrubQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.rareTokenScrub(Tables.documents(s, dir), "doc_id", "text",
        minDocs = 2)
      .orderBy(col("doc_id"))
  }

  /** Centroid drift (q111): per-label cosine between the q98-style
    * OLD (vec_id%10≠3) and NEW (vec_id%10≠7) snapshot centroids of the
    * embeddings table — membership churn is the drift source. */
  private def centroidDriftQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    Similarity.centroidDrift(
        e.filter(col("vec_id") % 10 =!= 3), e.filter(col("vec_id") % 10 =!= 7),
        "label", "embedding")
      .orderBy(col("grp"))
  }

  /** Duplicated-span scrub (q112): Lee-et-al-style exact-substring
    * dedup REMOVAL over the documents corpus — token runs covered by
    * cross-document 5-gram duplicates disappear, docs reassembled;
    * per-doc removal accounting. */
  private def dupSpanScrubQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.dupSpanScrub(Tables.documents(s, dir), "doc_id", "text",
        n = 5, minDocs = 2)
      .orderBy(col("doc_id"))
  }

  /** DSIR importance weights (q113): the `lang = 'en'` slice as the
    * target distribution, the full documents corpus as raw — per-doc
    * integer micro-nat log-likelihood ratios under hashed-unigram
    * models, keep = sign test. */
  private def dsirWeightsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(s, dir)
    TextAnalysis.dsirWeights(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 1024)
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity bucketing (q114): per-language unigram
    * surprisal percentiles cut into head/middle/tail thirds (head =
    * lowest surprisal — the slice CCNet keeps). Composition of K34
    * surprisal and K71 calibration; the bucket rule is pure integer
    * arithmetic on the ppm percentile. */
  private def ccnetBucketsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis}
    val docs = Tables.documents(s, dir)
    val sur = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
    val withLang = sur
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    Curation.calibrateScores(withLang, "doc_id", "lang", col("mean_micro"))
      .withColumn("bucket",
        when(col("pct_ppm") * 3 < 1000000L, lit("head"))
          .when(col("pct_ppm") * 3 < 2000000L, lit("middle"))
          .otherwise(lit("tail")))
      .orderBy(col("doc_id"))
  }

  /** Token-budget selection (q115): greedy prefix by hashed quality
    * score under a 15k-token budget — the distributed-prefix-sum cut
    * (score histogram + within-score windows; no global sort). */
  private def budgetSelectQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis}
    val scored = TextAnalysis.hashedQualityScore(
      Tables.documents(s, dir), "doc_id", "text", buckets = 1024)
    Curation.budgetSelect(scored, "doc_id", "score", "n_tokens",
        budget = 15000L)
      .orderBy(col("doc_id"))
  }

  /** Leakage-safe split (q116): near-dup-aware 80/10/10 train/val/test
    * assignment over the documents corpus — byte-identical copies and
    * near-dup cluster members always share a split. */
  private def leakageSplitQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    TextDedup.leakageSafeSplit(Tables.documents(s, dir), "doc_id", "text",
        valPpm = 100000L, testPpm = 100000L)
      .orderBy(col("doc_id"))
  }

  /** Embedding centroid outliers (q117): per-vector cosine to its own
    * label centroid, flagged below 0.0 — the cluster-coherence audit
    * over the embeddings table. */
  private def centroidOutliersQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    Similarity.centroidOutliers(Tables.embeddings(s, dir), "vec_id", "label",
        "embedding", minCos = 0.0)
      .orderBy(col("id"))
  }

  /** Char-class signals (q118): letter/digit/space/symbol ppm shares
    * over the events table's JSON props strings (the column with real
    * structural spread — braces, quotes, digits) — one codegen'd
    * map-side projection, no shuffle. */
  private def charClassQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.charClassSignals(
        Tables.events(s, dir).select(col("event_id"), col("props")),
        "event_id", "props")
      .orderBy(col("doc_id"))
  }

  /** Template grams (q119): top-3 most frequent word 3-grams per
    * source with ppm share — the crawl-boilerplate audit. */
  private def templateGramsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.templateGrams(Tables.documents(s, dir), "source", "text",
        n = 3, topK = 3)
      .orderBy(col("source"), col("rank"))
  }

  /** Funnel (q120): strict first-touch ordered funnel signup → view →
    * click → purchase over the events stream — one per-user min-rollup,
    * then a steps-row aggregate (Analytics.funnel). */
  private def funnelQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .orderBy(col("step_idx"))
  }

  /** Cohort retention (q121): users grouped by first-activity day,
    * counted per later-day offset 0..14 — the retention triangle. */
  private def cohortRetentionQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.cohortRetention(Tables.events(s, dir), "user_id", "ts",
        maxOffsetDays = 14)
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  /** Markov transition matrix (q122): per-user event-type bigrams with
    * exact integer row-conditional probability in ppm. */
  private def transitionMatrixQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.transitionMatrix(Tables.events(s, dir), "user_id", "ts",
        "event_type", "event_id")
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Trailing z-score anomalies (q123): per-(event_type, day) counts
    * scored against the previous 7 present days (strictly before). */
  private def trailingZscoreQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.trailingZscore(Tables.events(s, dir), "ts", "event_type",
        window = 7)
      .orderBy(col("key"), col("day"))
  }

  /** Co-occurrence top-k (q124): market-basket item-item cosine over
    * (order, part) baskets, mega-baskets (>8 items) dropped whole. */
  private def coOccurrenceQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.coOccurrenceTopK(Tables.lineitem(s, dir), "l_orderkey",
        "l_partkey", maxBasket = 8, topK = 20)
  }

  /** Data profile (q125): per-column rows/nulls/distincts/min/max over
    * the documents table (all-integer-and-varchar — no cross-engine
    * float/timestamp string-cast hazards). */
  /** The one column list both q125 sides derive from: the Spark query
    * projects exactly these columns before profiling and the oracle's
    * UNION ALL branches are generated from the same Seq, so schema
    * drift in the documents parquet breaks both sides together
    * instead of silently diverging. */
  private val documentsProfileCols =
    Seq("doc_id", "text", "lang", "source", "n_chars")

  private def profileQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.profile(
        Tables.documents(s, dir).select(documentsProfileCols.map(col): _*))
      .orderBy(col("column"))
  }

  /** Cap-guarded SemDeDup (q126): the q73 cell assignment with
    * cellCap=12, so every over-cap cell splits into id%nsub sub-cells
    * and pairwise cosine runs only within a sub-cell. Output is the
    * per-cell audit (population, split factor, capped flag) joined
    * with the survivor count — the relation an operator reads to see
    * exactly what the cap did. */
  private def semDedupCappedQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val kept = Similarity.semDedup(corpus, seeds, minCos = 0.4, cellCap = 12)
    val audit = Similarity.semDedupCellAudit(corpus, seeds, cellCap = 12)
    val keptPerCell = Similarity.ivfAssign(kept, "vec", seeds)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_kept"))
    audit.join(keptPerCell, Seq("cell"), "left")
      .select(col("cell"), col("n"), col("nsub"), col("capped"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("cell"))
  }

  /** The q103/q127/q128 two-snapshot fixture: old = docs where
    * doc_id%10≠3; new = docs where doc_id%10≠7, with the %10=5 group's
    * text changed — so the diff has added, removed, changed and
    * unchanged docs. */
  private def snapshotFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val d = Tables.documents(s, dir)
    val oldSnap = d.filter(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"), col("text"))
    val newSnap = d.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    (oldSnap, newSnap)
  }

  /** Nightly band-key index maintenance (q127): the index is BUILT
    * over the old snapshot, one [[graft.jobs.IndexMaintenance]] tick
    * brings it to the new snapshot at O(changed) cost, and the output
    * is the maintained index itself. The DuckDB oracle computes a
    * FULL REBUILD from the new snapshot — the driver's hash compare
    * of the two relations IS the delta≡rebuild gate, cross-engine. */
  private def bandIndexNightlyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.jobs.IndexMaintenance
    val (oldSnap, newSnap) = snapshotFixture(s, dir)
    val st = IndexMaintenance.rebuild(oldSnap, "doc_id", "text")
    IndexMaintenance.nightly(st, oldSnap, newSnap, "doc_id", "text")
      .bandIndex
      .orderBy(col("id"), col("band"))
  }

  /** Nightly exact-hash index maintenance (q128): same tick as q127;
    * output is the maintained (h, cnt) multiplicity relation, the
    * oracle is a direct GROUP BY over the new snapshot. */
  private def hashIndexNightlyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.jobs.IndexMaintenance
    val (oldSnap, newSnap) = snapshotFixture(s, dir)
    val st = IndexMaintenance.rebuild(oldSnap, "doc_id", "text")
    IndexMaintenance.nightly(st, oldSnap, newSnap, "doc_id", "text")
      .hashIndex
      .orderBy(col("h"))
  }

  /** Df-weighted near-dup pairs (q129): weighted-MinHash candidates
    * (token replicated by its integer rarity weight, banding + bucket
    * cap as q21) scored by exact df-weighted Jaccard — the
    * boilerplate-robust twin of the q21→q24 family. */
  private def weightedNearDupQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val d = Tables.documents(s, dir)
    // vocabulary df-aggregation shared by sketch and exact gate. The
    // shared subtree plans once per reference; AQE's
    // ReuseExchangeAndSubquery dedupes the identical exchanges at
    // runtime, and forcing materialization via localCheckpoint
    // measured no better at sf0.1 (within noise) while paying an
    // extra eager job — so plain sharing wins on simplicity.
    val weights = TextDedup.dfTokenWeights(d, "doc_id", "text")
    val pairs = TextDedup.weightedLshCandidatePairs(d, "doc_id", "text",
      weights, 64, 4, 100, TextDedup.normWordSet)
    TextDedup.weightedJaccardPairs(d, "doc_id", "text", pairs, weights,
        TextDedup.normWordSet)
      .orderBy(col("a"), col("b"))
  }

  /** Composed curation pass (q130): the realistic dedup-then-split
    * pipeline — near-dup component labels computed ONCE
    * ([[graft.operators.TextDedup.nearDupLabels]]), then keep-best
    * dedup AND the leakage-safe split consume the same labels via
    * their label-reuse overloads. Output: per split, its doc count
    * and keep-best survivor count. One LSH cascade instead of the
    * two q105/q116 pay separately (bench: q130 ≪ q105 + q116). */
  private def curationComposedQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val d = Tables.documents(s, dir)
    val labels = TextDedup.nearDupLabels(d, "doc_id", "text")
    val kept = TextDedup.nearDupDedupKeepBest(d, "doc_id", "text",
        size(TextDedup.words(col("text"))), labels)
      .select(col("doc_id"), lit(1L).as("_kept"))
    val split = TextDedup.leakageSafeSplit(d, "doc_id", "text",
      100000L, 100000L, labels)
    split.join(kept, Seq("doc_id"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("_kept"), lit(0L))).as("n_kept_best"))
      .orderBy(col("split"))
  }

  /** URL-level dedup (q131): four deterministic URL VARIANTS per page
    * (scheme/host case, `www.`, default port, trailing slash, tracking
    * params, param order, fragment — every normalization step
    * exercised) derived from doc_id; all four must collapse to one
    * canonical URL with the min-id keeper and an exact variant
    * count. */
  private def urlDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val g = expr("doc_id div 4").cast("string")
    val url = when(col("doc_id") % 4 === 0,
        concat(lit("https://www.example.com/d/"), g, lit("?b=2&a=1")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("HTTPS://EXAMPLE.COM:443/d/"), g, lit("/?a=1&b=2")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://example.com/d/"), g,
          lit("?utm_source=feed&b=2&fbclid=x&a=1")))
      .otherwise(
        concat(lit("https://www.example.com:443/d/"), g,
          lit("/?a=1&utm_campaign=z&b=2#frag")))
    TextDedup.urlDedup(
        Tables.documents(s, dir).select(col("doc_id"), url.as("url")),
        "doc_id", "url")
      .orderBy(col("url"))
  }

  /** Streaming Bloom dedup gate (q132): docs with doc_id ≥ 400 REPLAY
    * as a stream through the stateless membership gate against the
    * index built over doc_id < 400 (broadcast sharded-Bloom prefilter
    * + exact stream-static left_anti). Survivor ids must equal the
    * batch anti-join the oracle computes directly. */
  private def streamingBloomGate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    import graft.util.TmpDirs
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"q132_stream_$tag")
    val d = Tables.documents(s, dir)
    d.filter(col("doc_id") >= 400).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$root/docs")
    val seen = d.filter(col("doc_id") < 400)
      .select(TextDedup.md5Hash60(TextDedup.norm(col("text"))).as("h"))
      .distinct()
    val replayed = s.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(s"$root/docs")
    val q = TextDedup.streamingDedupGate(replayed, "text", "doc_id", seen)
      .select(col("doc_id"))
      .writeStream
      .format("memory").queryName(s"q132_gate_$tag").outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(s"q132_gate_$tag").orderBy(col("doc_id"))
  }

  /** Nightly VECTOR-index maintenance (q133): the IVF×SQ8 postings
    * built over the old embedding snapshot, one
    * [[graft.operators.Similarity.ivfSqIndexMaintain]] tick to the
    * new snapshot (model PINNED: q50 seed centroids + scales trained
    * on the OLD corpus). The oracle computes a full rebuild from the
    * new snapshot with the same pinned model — equality is the
    * delta≡rebuild gate, q127's discipline on the vector side. Codes
    * emit as a comma-joined string (cross-engine integer formatting;
    * array reprs differ between the compare's readers). */
  private def vectorIndexNightlyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val seeds = seedVectors(e)
    val oldV = e.filter(col("vec_id") % 10 =!= 3)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val newV = e.filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id").as("id"),
        when(col("vec_id") % 10 === 5,
          concat(array(-element_at(col("embedding"), 1)),
            slice(col("embedding"), 2, 63)))
          .otherwise(col("embedding")).as("vec"))
    val scales = Similarity.sqTrain(oldV, "vec", dims = 64) // pinned on OLD
    val index0 = Similarity.ivfSqIndexBuild(oldV, "id", "vec", seeds, scales)
    Similarity.ivfSqIndexMaintain(index0, oldV, newV, "id", "vec", seeds, scales)
      .select(col("id"), col("cell"),
        concat_ws(",", col("code")).as("code_str"))
      .orderBy(col("id"))
  }

  /** HTML extraction (q134): every doc wrapped in a deterministic
    * page shell exercising script/style content drop, comments, tags,
    * all six entities (including the double-escape &amp;lt; case) and
    * whitespace collapse — the stripped text must match the oracle's
    * identical regexp ladder byte-for-byte. */
  private def stripHtmlQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val html = concat(
      lit("""<html><head><title>T</title><style type="text/css">p{x:1}</style>"""),
      lit("""<script>if (a &amp;&amp; b) { f(); }</script></head><body><h1>"""),
      col("source"),
      lit("""</h1><!-- hidden --><p class="main">"""),
      col("text"),
      lit("""</p><p>Q &amp; A &lt;tag&gt; &quot;x&quot; &#39;y&#39;&nbsp;z &amp;lt;esc&gt;</p></body></html>"""))
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.stripHtml(html).as("clean"))
      .select(col("doc_id"), col("clean"),
        length(col("clean")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end web ingest (q135): the crawl-side pipeline composed as
    * ONE plan over the q131 URL variants and the q134 page shells —
    * canonical-URL dedup keeps one page per identity, HTML extraction
    * recovers the text, a token-length gate drops thin pages, exact
    * dedup collapses byte-identical content, and the per-source audit
    * reports every stage's survivor count. The integration proof that
    * K99 → K102 → K8 → K1 compose as relations. */
  private def webIngestQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{TextAnalysis, TextDedup}
    val g = expr("doc_id div 4").cast("string")
    val url = when(col("doc_id") % 4 === 0,
        concat(lit("https://www.example.com/d/"), g, lit("?b=2&a=1")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("HTTPS://EXAMPLE.COM:443/d/"), g, lit("/?a=1&b=2")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://example.com/d/"), g,
          lit("?utm_source=feed&b=2&fbclid=x&a=1")))
      .otherwise(
        concat(lit("https://www.example.com:443/d/"), g,
          lit("/?a=1&utm_campaign=z&b=2#frag")))
    val html = concat(
      lit("""<html><head><title>T</title><style type="text/css">p{x:1}</style>"""),
      lit("""<script>if (a &amp;&amp; b) { f(); }</script></head><body><h1>"""),
      col("source"),
      lit("""</h1><!-- hidden --><p class="main">"""),
      col("text"),
      lit("""</p><p>Q &amp; A &lt;tag&gt; &quot;x&quot; &#39;y&#39;&nbsp;z &amp;lt;esc&gt;</p></body></html>"""))
    val pages = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), url.as("url"), html.as("html"))
    val keepers = TextDedup.urlDedup(pages, "doc_id", "url")
      .select(col("keeper").as("doc_id"))
    val cleaned = pages.join(keepers, Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        TextAnalysis.stripHtml(col("html")).as("clean"))
    val gated = cleaned
      .filter(size(TextDedup.words(col("clean"))) >= 25)
    val unique = TextDedup.exactDedup(gated, "clean", "doc_id")
    val perSrc = Seq(
      cleaned.groupBy(col("source")).agg(count(lit(1)).as("n_pages")),
      gated.groupBy(col("source")).agg(count(lit(1)).as("n_gated")),
      unique.groupBy(col("source")).agg(count(lit(1)).as("n_unique"),
        sum(size(TextDedup.words(col("clean")))).cast("long").as("n_tokens")))
    perSrc.reduce((a, b) => a.join(b, Seq("source"), "left"))
      .select(col("source"), col("n_pages"),
        coalesce(col("n_gated"), lit(0L)).as("n_gated"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .orderBy(col("source"))
  }

  /** Export manifest (q136): the per-shard receipt — doc count, token
    * total, order-independent XOR content digest, dense-position
    * check — a consumer re-derives from delivered files to detect any
    * dropped/duplicated/altered document. */
  private def exportManifestQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.exportManifest(Tables.documents(s, dir), "doc_id", "text",
        nShards = 16)
      .orderBy(col("shard"))
  }

  /** Integer equi-width histogram (q137): doc-length distribution in
    * 12 bins — q125's distribution twin, exact integer bin math. */
  private def histogramQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.histogram(Tables.documents(s, dir), col("n_chars"), nBins = 12)
      .orderBy(col("bin"))
  }

  /** Corpus-scale k-means fit (q138): 8 centroids × 3 full Lloyd
    * iterations over the embeddings table in exact offset-micro
    * integer arithmetic — the trainer that PRODUCES the pinned
    * centroid artifacts the IVF family (q50/q70/q89/q133) consumes.
    * Vectors never leave the executors: each iteration is a map-only
    * codegen'd argmin pass plus one shuffle of 8-byte per-(cell, dim)
    * partial sums; only the k×dims model reaches the driver. */
  private def kmeansFitQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    Similarity.kmeansFit(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iters = 3)
      .orderBy(col("cell"), col("d"))
  }

  /** Covariance sufficient statistics (q139): (n, Σxᵢ, Σxᵢxⱼ) for all
    * 2,080 dim pairs of the embeddings table in ONE graft_gram
    * aggregate pass — kilo-unit exact integers, corpus never shuffles
    * (one flat long buffer per partition, merged by addition). The
    * PCA/whitening front door; covariance numerator = n·s12 − s1·s2
    * driver-side. */
  private def covarianceStatsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    Similarity.covarianceStats(Tables.embeddings(s, dir), "embedding", dims = 64)
      .orderBy(col("d1"), col("d2"))
  }

  /** Key-skew audit (q140): top-15 heaviest user_id keys in the events
    * stream with exact ppm shares against the global bucket-size
    * distribution (n_total/n_keys/max/p99) — the diagnostic run BEFORE
    * committing a 100 TB shuffle to a key, deciding salting/AQE skew
    * handling. One shuffle to the key-count relation; every window
    * after runs over that rollup. */
  private def keySkewAuditQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.keySkewAudit(Tables.events(s, dir), "user_id", topK = 15)
      .orderBy(col("rank"))
  }

  /** Snapshot fixture for the card-maintenance tick (q141): the q98
    * membership churn PLUS a metadata-only edit — doc_id%10==5 rows
    * change text AND source, exercising the "same text, new tag" path
    * a text-only digest would miss. */
  private def cardSnapshotFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val d = Tables.documents(s, dir)
    val oldSnap = d.filter(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val newSnap = d.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("lang"),
        when(col("doc_id") % 10 === 5, lit("patched"))
          .otherwise(col("source")).as("source"))
    (oldSnap, newSnap)
  }

  /** Delta-maintained data card (q141): the card state is BUILT over
    * the old snapshot, one [[graft.jobs.CardMaintenance]] tick brings
    * it to the new snapshot at O(changed) cost, and the output is the
    * card derived from the MAINTAINED state. The DuckDB oracle
    * computes the card directly over the new snapshot — the hash
    * compare IS the delta≡rebuild gate for aggregate maintenance, the
    * q127/q128 contract extended from indexes to views. */
  private def cardNightlyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.jobs.CardMaintenance
    val (o, n) = cardSnapshotFixture(s, dir)
    val st = CardMaintenance.rebuild(o, "doc_id", "text")
    CardMaintenance.card(CardMaintenance.nightly(st, o, n, "doc_id", "text"))
      .orderBy(col("lang"))
  }

  /** JL-projected ANN (q142): brute cosine top-5 in a 16-dim md5-sign
    * Johnson–Lindenstrauss projection of the 64-dim embeddings — the
    * model-free twin of q99's matryoshka prefix (any embedding gets
    * the 4× search-cost cut, no retraining), with the same inline
    * full-dim recall audit. Projection is map-only plan-literal ±1
    * dots; the scored space pays outDims multiplies per pair. */
  private def jlAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.jlTopK(q, c, dims = 64, outDims = 16, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Vocabulary coverage curve (q143): corpus-token coverage ppm of a
    * top-V vocabulary at six size checkpoints — the tokenizer-sizing
    * curve, computed from the count-class histogram (no vocab-wide
    * window; the budgetSelect prefix trick over frequencies). */
  private def vocabCoverageQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.vocabCoverage(Tables.documents(s, dir), "text",
        Seq(16L, 64L, 256L, 1024L, 4096L, 16384L))
      .orderBy(col("v"))
  }

  /** Delta-maintained covariance (q144): the q139 sufficient-stats
    * state built over the OLD embedding snapshot (vec_id%10≠3), one
    * covarianceDelta tick to the NEW snapshot (vec_id%10≠7, %10==5
    * vectors sign-flipped) — output is the MAINTAINED state, oracle
    * computes the stats directly over the new snapshot. The q141
    * tick≡rebuild contract on the Gram relation. */
  private def covarianceNightlyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val oldSnap = e.filter(col("vec_id") % 10 =!= 3)
      .select(col("vec_id"), col("embedding"))
    val newSnap = e.filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id"),
        when(col("vec_id") % 10 === 5,
            transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
    val st = Similarity.covarianceStats(oldSnap, "embedding", dims = 64)
    Similarity.covarianceDelta(st, oldSnap, newSnap,
        "vec_id", "embedding", dims = 64)
      .orderBy(col("d1"), col("d2"))
  }

  /** Retrained vector index (q146): the loop K101 left open — "retrain
    * = scheduled rebuild" — actually closed: kmeansFit TRAINS fresh
    * centroids on the corpus (2 exact-integer Lloyd iterations), the
    * trained model converts to the float quantizer the IVF family
    * uses, and ivfSqIndexBuild rebuilds the postings (cosine cell
    * assignment + SQ8 codes) under it. The oracle re-derives the
    * WHOLE composition — training included — via the shared kmeans
    * CTE generator, so the trained-model index is hash-gated end to
    * end, not just the assignment step. */
  private def retrainedIndexQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val fit = Similarity.kmeansFit(e, "vec_id", "embedding", k = 8, iters = 2)
      .select(col("cell"), col("d"), col("c")).collect()
    val cents: Seq[(Long, Array[Float])] = fit.groupBy(_.getLong(0)).toSeq
      .sortBy(_._1)
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getLong(1))
          .map(r => (r.getLong(2).toDouble / 1e6 - 1.0).toFloat).toArray
      }
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val scales = Similarity.sqTrain(corpus, "vec", dims = 64)
    Similarity.ivfSqIndexBuild(corpus, "id", "vec", cents, scales)
      .select(col("id"), col("cell"),
        concat_ws(",", col("code")).as("code_str"))
      .orderBy(col("id"))
  }

  /** Near-dup cluster-size histogram (q145): the q34 component labels
    * rolled to cluster sizes and binned by the q137 integer histogram
    * — the "how bad is my duplication" distribution an operator reads
    * before choosing dedup aggressiveness. Pure composition: one
    * cascade, one rollup, one aggregate pass. */
  private def clusterSizeHistogramQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Analytics, TextDedup}
    val labels = TextDedup.nearDupLabels(Tables.documents(s, dir),
      "doc_id", "text")
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("csize"))
    Analytics.histogram(sizes, col("csize"), nBins = 8)
      .orderBy(col("bin"))
  }

  /** Streaming funnel (q148): the K89 funnel computed by the STATEFUL
    * streaming operator — per-user first-touch state flushed by
    * event-time timeout — replayed over day-partitioned storage with
    * the q46/q58 two-tick watermark flush, then rolled to per-step
    * rows and hash-compared against the SAME oracle as the batch
    * q120. Order-proof: a late `signup` retroactively re-evaluates
    * the whole chain, which is why this is state, not a windowed
    * aggregate. */
  private def streamingFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val steps = Seq("signup", "view", "click", "purchase")
    val reach = replayedFunnelReach(s, dir, "q148",
      graft.streaming.StreamingFunnel.reach(steps))
    val cs = steps.indices.map(k =>
      count(when(col("steps_reached") >= k + 1, 1)).as(s"_c$k"))
    val counts = reach.agg(cs.head, cs.tail: _*)
    val stepsDf = steps.zipWithIndex
      .map { case (st, i) => (i.toLong + 1L, st) }.toDF("step_idx", "step")
    counts.crossJoin(stepsDf)
      .select(col("step_idx"), col("step"),
        steps.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("step_idx") === (i + 1), col(s"_c$i")).otherwise(acc)
        }.as("n_users"),
        col("_c0").as("_base"))
      .select(col("step_idx"), col("step"), col("n_users"),
        when(col("_base") > 0,
          expr("n_users * 1000000 div _base")).as("conversion_ppm"))
      .orderBy(col("step_idx"))
  }

  /** Shared q148/q168/q180 replay machinery: events → day-partitioned
    * storage → file stream with the q46/q58 two-tick watermark flush →
    * the given stateful per-user operator → collected output relation
    * (tick users filtered via their negative user_id, which every
    * output type carries). */
  private def replayedFunnelReach[T](
      s: SparkSession,
      dir: String,
      qtag: String,
      reachFn: org.apache.spark.sql.Dataset[graft.streaming.StreamingFunnel.UserEvent] =>
        org.apache.spark.sql.Dataset[T])
      : DataFrame =
    replayedStreamTable(s, dir, qtag, reachFn)
      .filter(col("user_id") >= 0)

  /** The replay machinery itself, UNFILTERED — for gates whose output
    * carries no user_id (the q212 type-keyed EWMA filters its tick
    * rows by event_type instead). */
  private def replayedStreamTable[T](
      s: SparkSession,
      dir: String,
      qtag: String,
      reachFn: org.apache.spark.sql.Dataset[graft.streaming.StreamingFunnel.UserEvent] =>
        org.apache.spark.sql.Dataset[T])
      : DataFrame = {
    import graft.store.DayPartitionedTable
    import graft.streaming.StreamingFunnel
    import graft.util.TmpDirs
    import s.implicits._
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val root = TmpDirs.fresh(s"${qtag}_stream_$tag")
    val e = Tables.events(s, dir)
      .select(col("ts"), col("user_id"), col("event_type"), dayOf(col("ts")).as("day"))
    val t = new DayPartitionedTable(root, "events_by_day", sortCol = Some("ts"))
    t.writeDays(e)
    val realFiles = t.read(s).select(input_file_name()).distinct().count().toInt
    // q46/q58 two-tick flush; tick users are negative and filtered out
    val maxDay = t.maxDay(s).get
    def tickRows(n: Int, d: Long): DataFrame = {
      val tick = maxDay.plusDays(d)
      s.range(n.toLong).select(
        lit(java.sql.Timestamp.valueOf(s"$tick 00:00:00")).as("ts"),
        (col("id") - 1000000L).as("user_id"),
        lit("tick").as("event_type"))
    }
    tickRows(realFiles, 3).repartition(realFiles)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(3)}")
    tickRows(1, 6).coalesce(1)
      .write.mode("append").parquet(s"${t.path}/day=${maxDay.plusDays(6)}")
    val stream = s.readStream
      .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, day DATE")
      .option("maxFilesPerTrigger", realFiles)
      .parquet(t.path)
      .select("user_id", "ts", "event_type")
      .as[StreamingFunnel.UserEvent]
    val sink = s"${qtag}_reach_$tag"
    val q = reachFn(stream)
      .writeStream
      .format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }

  /** Streaming WINDOWED funnel (q168): the K134 per-step deadlines
    * held as state (buffered per-step times — a late earlier-step
    * arrival re-bases every later deadline), replayed to completion
    * and hash-compared against the SAME oracle as the batch q166. */
  private def streamingWindowedFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val steps = Seq("signup", "view", "click", "purchase")
    val reach = replayedFunnelReach(s, dir, "q168",
      graft.streaming.StreamingFunnel.windowedReach(steps, windowSecs = 172800L))
    val cs = steps.indices.map(k =>
      count(when(col("steps_reached") >= k + 1, 1)).as(s"_c$k"))
    val counts = reach.agg(cs.head, cs.tail: _*)
    val stepsDf = steps.zipWithIndex
      .map { case (st, i) => (i.toLong, st) }.toDF("step_idx", "step")
    counts.crossJoin(stepsDf)
      .select(col("step_idx"), col("step"),
        steps.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("step_idx") === i, col(s"_c$i")).otherwise(acc)
        }.as("n_users"),
        col("_c0").as("_base"))
      .select(col("step_idx"), col("step"), col("n_users"),
        expr("n_users * 1000000 div _base").as("conversion_ppm"))
      .orderBy(col("step_idx"))
  }

  /** Streaming gap histogram (q180): the K142 gap extraction held as
    * per-user state (a late event splits an existing gap in two, so
    * the event multiset buffers until timeout), replayed to
    * completion and hash-compared against the SAME oracle as the
    * batch q174. */
  private def streamingGapsQuery(s: SparkSession, dir: String): DataFrame = {
    val gapRows = replayedFunnelReach(s, dir, "q180",
      graft.streaming.StreamingGaps.gaps _)
    gapRows
      .withColumn("bucket",
        when(col("gap") === 0, lit(0L))
          .otherwise(length(bin(col("gap"))).cast("long")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_secs"),
        max(col("gap")).as("max_gap_secs"))
      .orderBy(col("bucket"))
  }

  /** Streaming EWMA (q212): the K177 baseline held as per-TYPE state
    * (the first non-user-keyed gate), folded once at event-time
    * timeout, replayed to completion and hash-compared against the
    * SAME oracle as the batch q209. */
  private def streamingEwmaQuery(s: SparkSession, dir: String): DataFrame =
    replayedStreamTable(s, dir, "q212",
      graft.streaming.StreamingEwma.ewma(_, alphaPpm = 300000L))
      .filter(col("event_type") =!= "tick")
      .orderBy(col("event_type"), col("day"))

  /** BPE encode (q158): apply the literal demonstration merge table to
    * every document — real subword tokens, not whitespace words. The
    * oracle unrolls the SAME table as a DuckDB replace chain; the
    * `segmented` column (full token stream) makes the hash sensitive
    * to the exact tokenization, not just counts. */
  private def bpeEncodeQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.bpeEncode(Tables.documents(s, dir), "doc_id", "text",
        TextAnalysis.defaultBpeMerges)
      .select(col("doc_id"), col("n_ws_tokens"), col("n_tokens"),
        array_join(col("tokens"), " ").as("segmented"))
      .orderBy(col("doc_id"))
  }

  /** BPE-budgeted selection (q159): q115's greedy-prefix budget cut,
    * but budgeted in REAL tokens — [[bpeEncodeQuery]]'s counts feed
    * [[Curation.budgetSelect]], closing the "token budgets were
    * whitespace words" gap for the curation surface. */
  private def bpeBudgetQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis}
    val docs = Tables.documents(s, dir)
    val scored = TextAnalysis.hashedQualityScore(docs, "doc_id", "text",
        buckets = 1024)
      .select(col("doc_id"), col("score"))
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text",
        TextAnalysis.defaultBpeMerges)
      .select(col("doc_id"), col("n_tokens"))
    Curation.budgetSelect(scored.join(enc, Seq("doc_id")),
        "doc_id", "score", "n_tokens", budget = 60000L)
      .orderBy(col("doc_id"))
  }

  /** Skew-join equivalence (q156): the K14 scale patterns finally
    * oracle-gated — the salted inner join (probe-side deterministic
    * salt, build side replicated salt ways) and the bucketed
    * co-located sort-merge join both run against a planted-skew
    * fixture (events: 5 keys ≈ 2k rows each) and must produce row sets
    * IDENTICAL to a plain join: the salt and the bucketing are pure
    * execution-strategy choices, semantically invisible. The DuckDB
    * oracle is the plain join, emitted once per strategy label. */
  private def skewJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SkewJoin
    val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"))
    val dim = Tables.events(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("type_n"))
    val salted = SkewJoin.saltedInner(ev, dim, Seq("event_type"), salt = 8)
      .select(lit("salted").as("op"), col("event_id"),
        col("event_type"), col("type_n"))
    // bucketed twin: both sides written bucketed on the key, merge-join
    // reads bucket-aligned (the no-exchange property is locked by
    // ScalePatternsSpec; here the VALUES are gated). Table names carry
    // the input-dir tag so concurrent runs sharing a warehouse don't
    // collide (same discipline as the streaming gates' TmpDirs tags).
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val (evT, dimT) = (s"q156_bk_ev_$tag", s"q156_bk_dim_$tag")
    Seq(evT, dimT).foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      graft.util.TmpDirs.deleteRecursively(s"target/spark-warehouse/$t")
    }
    ev.write.mode("overwrite").bucketBy(8, "event_type").saveAsTable(evT)
    dim.write.mode("overwrite").bucketBy(8, "event_type").saveAsTable(dimT)
    val bucketed = s.table(evT).hint("merge")
      .join(s.table(dimT).hint("merge"), Seq("event_type"))
      .select(lit("bucketed").as("op"), col("event_id"),
        col("event_type"), col("type_n"))
    salted.unionByName(bucketed).orderBy(col("op"), col("event_id"))
  }

  /** Composed nightly tick (q157): ONE RunNightly.tick over a fresh
    * state dir — bootstrap (index/card/model/postings/cov built from
    * the OLD snapshots, quantizer TRAINED on old vectors) plus one
    * old→new maintenance tick — then every persisted relation read
    * back from disk and emitted under a `rel` tag. The DuckDB oracle
    * REBUILDS all four relations directly from the new snapshots
    * (training included, via the shared kmeans CTE generator): the
    * hash compare is the tick≡rebuild gate for the whole composed
    * driver, not just its parts (q127/q128/q141/q133/q144 gate the
    * parts; this gates their orchestration). */
  private def nightlyTickQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.jobs.{CardMaintenance, RunNightly}
    // dir-tagged state path: concurrent runs must not share (ADVICE r9)
    val stateDir =
      s"target/q157_nightly_state_${java.lang.Integer.toHexString(dir.hashCode)}"
    graft.util.TmpDirs.deleteRecursively(stateDir)
    val (oldDocs, newDocs) = cardSnapshotFixture(s, dir)
    val e = Tables.embeddings(s, dir)
    val oldVecs = e.filter(col("vec_id") % 10 =!= 3)
      .select(col("vec_id"), col("embedding"))
    val newVecs = e.filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id"),
        when(col("vec_id") % 10 === 5, transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
    RunNightly.tick(s, stateDir, oldDocs, newDocs, oldVecs, newVecs)
    def pad(df: DataFrame, rel: String, cols: Column*): DataFrame = {
      val cs = cols.zipWithIndex.map { case (c, i) =>
        c.cast("string").as(s"c${i + 1}") }
      val nulls = (cols.size until 7).map(i =>
        lit(null).cast("string").as(s"c${i + 1}"))
      df.select((lit(rel).as("rel") +: (cs ++ nulls)): _*)
    }
    val band = pad(s.read.parquet(s"$stateDir/index/band_index"),
      "band", col("id"), col("band"), col("key"))
    val hash = pad(s.read.parquet(s"$stateDir/index/hash_index"),
      "hash", col("h"), col("cnt"))
    val card = pad(
      CardMaintenance.card(CardMaintenance.load(s, s"$stateDir/card").get),
      "card", col("lang"), col("n_docs"), col("n_exact_dups"),
      col("n_sources"), col("total_tokens"), col("mean_tokens_milli"),
      col("distinct_words"))
    val post = pad(
      s.read.parquet(s"$stateDir/vecindex")
        .select(col("id"), col("cell"), concat_ws(",", col("code")).as("cs")),
      "vecpost", col("id"), col("cell"), col("cs"))
    val cov = pad(s.read.parquet(s"$stateDir/cov"),
      "cov", col("d1"), col("d2"), col("n"), col("s1"), col("s2"), col("s12"))
    band.unionByName(hash).unionByName(card).unionByName(post).unionByName(cov)
      .orderBy(col("rel"), col("c1"), col("c2"))
  }

  /** BPE trainer (q160): learn a 10-merge table from the corpus — the
    * weighted-argmax merge loop, each round's pick gated (rank, left,
    * right, weighted count) against the oracle's unrolled rounds. */
  private def bpeTrainQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.TextAnalysis
    TextAnalysis.bpeTrain(Tables.documents(s, dir), "text", rounds = 10)
      .zipWithIndex
      .map { case ((l, r, np), i) => (i + 1L, l, r, np) }
      .toDF("mrank", "l", "r", "n_pairs")
      .orderBy(col("mrank"))
  }

  /** Train-then-encode (q161): the q146 retrain-to-index discipline
    * applied to the tokenizer — the table LEARNED by bpeTrain feeds
    * bpeEncode, and the oracle re-derives the whole composition
    * (training rounds included) before segmenting. */
  private def bpeTrainedEncodeQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(s, dir)
    val learned = TextAnalysis.bpeTrain(docs, "text", rounds = 10)
      .map(m => (m._1, m._2))
    TextAnalysis.bpeEncode(docs, "doc_id", "text", learned)
      .select(col("doc_id"), col("n_tokens"),
        array_join(col("tokens"), " ").as("segmented"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility card (q178): per-language chars-per-token
    * and tokens-per-word under the TRAINED merge table — the metric a
    * tokenizer team reads before committing a vocab (a fertility
    * spike flags an under-served language). q160's trainer feeds
    * q161's encoder, then one language-sized rollup; every ratio is
    * an exact integer ppm. */
  private def bpeFertilityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(s, dir)
    val learned = TextAnalysis.bpeTrain(docs, "text", rounds = 10)
      .map(m => (m._1, m._2))
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", learned)
    docs.select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("nch"))
      .join(enc.select(col("doc_id"), col("n_ws_tokens"), col("n_tokens")),
        Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nch")).as("n_chars"),
        sum(col("n_ws_tokens")).as("n_ws_tokens"),
        sum(col("n_tokens")).as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_chars"),
        col("n_ws_tokens"), col("n_tokens"),
        when(col("n_tokens") > 0,
          expr("n_chars * 1000000 div n_tokens")).otherwise(lit(0L))
          .as("chars_per_token_ppm"),
        when(col("n_ws_tokens") > 0,
          expr("n_tokens * 1000000 div n_ws_tokens")).otherwise(lit(0L))
          .as("fertility_ppm"))
      .orderBy(col("lang"))
  }

  /** Equi-depth histogram (q181): eight equal-count buckets of the
    * cent-quantized event values — the exact quantile sheet, no
    * global sort, no value buffering (q137's equi-width twin). */
  private def equiDepthQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.equiDepthHistogram(Tables.events(s, dir),
        round(col("value") * 100), buckets = 8)
      .orderBy(col("bucket"))
  }

  /** Stickiness (q184): per-day DAU/WAU/MAU distinct actives and the
    * DAU/WAU ratio — sliding-window distinct via the bounded
    * 28-offset fan-out of the user-day rollup. */
  private def stickinessQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.stickiness(Tables.events(s, dir), "user_id", "ts")
      .orderBy(col("day"))
  }

  /** Fulfillment latency (q190): exact p25/p50/p75 of order-to-ship
    * days per order priority — the warehouse-side twin of the q188
    * funnel latency, over the orders⋈lineitem star (keys + two small
    * columns shuffle, the histogram-prefix percentile machinery). */
  private def fulfillmentLatencyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
    val gaps = li.join(o, Seq("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("days"))
    Analytics.exactPercentiles(gaps, "o_orderpriority", col("days"),
        Seq(25, 50, 75))
      .select(col("key").as("o_orderpriority"), col("pct"),
        col("value").as("days"))
      .orderBy(col("o_orderpriority"), col("pct"))
  }

  /** CUBE rollup (q191): q38's ROLLUP twin — all four grouping
    * combinations of (returnflag, linestatus) with grouping_id
    * disambiguation, one pass. */
  private def cubeQuery(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id(col("l_returnflag"), col("l_linestatus"))
          .cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  /** Corpus health report (q200): the composed daily sheet — six
    * headline audits reduced to one (metric, value) long-format
    * relation: shuffle balance (q170), key concentration (q172),
    * FK orphan rate on the real lineitem→orders edge (q171's
    * operator, clean data ⇒ 0), Benford total deviation (q187),
    * k-anonymity violating rate (q179), en↔de length drift (q199),
    * plus the exact-dup document rate. Every number reuses a gated
    * operator; the report is pure composition. */
  private def healthReportQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Analytics, Curation, TextDedup}
    val e = Tables.events(s, dir)
    val docs = Tables.documents(s, dir)
    def one(name: String, df: DataFrame, valueCol: String): DataFrame =
      df.select(lit(name).as("metric"), col(valueCol).cast("long").as("value"))
    val balance = one("key_balance_ppm",
      Analytics.keyEntropy(e, "user_id"), "balance_ppm")
    val gini = one("key_gini_ppm", Analytics.keyGini(e, "user_id"),
      "gini_ppm")
    val fk = one("fk_orphan_ppm",
      Analytics.fkIntegrityAudit(Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey", "lineitem->orders"),
      "orphan_ppm")
    val benford = one("benford_deviation_ppm",
      Analytics.benfordAudit(Tables.lineitem(s, dir),
          round(col("l_extendedprice") * 100))
        .agg(sum(col("deviation_ppm")).as("v")), "v")
    val kanon = one("k_anonymity_violating_ppm",
      Curation.kAnonymityAudit(docs.select(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket")),
        Seq("lang", "source", "len_bucket"), k = 5), "violating_ppm")
    val ks = one("ks_en_de_ppm",
      Analytics.ksDrift(docs, "lang", col("n_chars"), "en", "de"),
      "ks_ppm")
    val dups = one("exact_dup_ppm",
      docs.agg(count(lit(1)).as("n"),
          count_distinct(md5(col("text"))).as("d"))
        .select(expr("(n - d) * 1000000 div n").as("v")), "v")
    Seq(balance, gini, fk, benford, kanon, ks, dups)
      .reduce(_ unionByName _)
      .orderBy(col("metric"))
  }

  /** Kaplan–Meier survival (q233): the retention curve with
    * right-censoring — users last seen within 14 days of the corpus
    * end are censored, not churned; exact ppm product. */
  private def kaplanMeierQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.kaplanMeier(
        Tables.events(s, dir), "user_id", "ts", censorDays = 14)
      .orderBy(col("offset_days"))

  /** Fixture-stats gate (q235): K129's scale-rehearsal writer finally
    * oracle-gated — its OBSERVABLE statistics (language mix, exact-dup
    * mass, source mix, word-length histogram, total word mass, vector
    * cluster mix) measured from the relations the writer EMITS
    * (dup/word stats read the text column itself, not the generator's
    * internals) and hash-compared against a DuckDB re-derivation of
    * the same md5 definitions from nothing but range(n). Sizes are
    * fixed constants: the generator is input-blind by design. */
  private def fixtureStatsQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = ScaleFixture.documents(s, 5000L)
    val vecs = ScaleFixture.embeddings(s, 2000L)
    val d = docs.select(col("lang"), col("source"), col("text"),
      size(split(col("text"), " ")).cast("long").as("w"))
    def rel(df: DataFrame, tag: String): DataFrame =
      df.select(lit(tag).as("rel"), col("key").cast("string").as("key"),
        col("n").cast("long").as("n"))
    val langMix = rel(d.groupBy(col("lang").as("key"))
      .agg(count(lit(1)).as("n")), "lang")
    val wordMass = rel(d.groupBy(col("lang").as("key"))
      .agg(sum(col("w")).as("n")), "words")
    val dupDocs = rel(
      d.withColumn("_c", count(lit(1)).over(Window.partitionBy(col("text"))))
        .filter(col("_c") >= 2)
        .groupBy(col("lang").as("key")).agg(count(lit(1)).as("n")), "dup")
    val srcMix = rel(d.groupBy(col("source").as("key"))
      .agg(count(lit(1)).as("n")), "src")
    val lenHist = rel(d.groupBy(col("w").as("key"))
      .agg(count(lit(1)).as("n")), "len")
    val labelMix = rel(vecs.groupBy(col("label").as("key"))
      .agg(count(lit(1)).as("n")), "label")
    Seq(langMix, wordMass, dupDocs, srcMix, lenHist, labelMix)
      .reduce(_ unionByName _)
      .orderBy(col("rel"), col("key"))
  }

  /** Forecast backtest (q232): is the q209 smoother actually better
    * than naive-yesterday — per-type MAE of the EWMA's standing
    * one-step error (its dev_micro IS the forecast error) vs the
    * naive |v_t − v_{t−1}|·10⁶, exact integers, over days ≥ 2. Pure
    * composition over the q209 relation. */
  private def forecastBacktestQuery(s: SparkSession, dir: String): DataFrame = {
    val e = graft.operators.Analytics.ewmaBaseline(
      Tables.events(s, dir), "event_type", "ts", alphaPpm = 300000L)
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    e.withColumn("vprev", lag(col("v"), 1).over(byDay))
      .filter(col("vprev").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(abs(dev_micro)) div count(1)").as("mae_ewma_micro"),
        expr("sum(abs(v - vprev) * 1000000) div count(1)")
          .as("mae_naive_micro"))
      .withColumn("ewma_wins",
        col("mae_ewma_micro") < col("mae_naive_micro"))
      .orderBy(col("event_type"))
  }

  /** Classification report (q231): per-language precision/recall/F1
    * of the K9 language-ID against the labeled lang column — what
    * the q27 confusion matrix's errors actually COST. */
  private def classReportQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val scored = Tables.documents(s, dir)
      .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
    graft.operators.Analytics.classificationReport(scored, "lang",
        "predicted")
      .orderBy(col("cls"))
  }

  /** Next-event accuracy (q230): the transition matrix scored as the
    * predictor it implicitly is — in-sample ceiling, stated. */
  private def nextEventQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.nextEventAccuracy(
        Tables.events(s, dir), "user_id", "ts", "event_type", "event_id")
      .orderBy(col("from_type"))

  /** q229's decay table: half-life 7 days over a 31-day window — ONE
    * Scala constant drives the plan literal and the oracle VALUES. */
  private val DecayWeightsPpm: Seq[Long] =
    (0 to 30).map(g => math.round(1e6 * math.pow(0.5, g / 7.0)))

  /** Time-decay attribution (q229): the recency-weighted member of
    * the attribution family — exact 10⁶-ppm conservation per
    * conversion, remainder to the most recent touch's channel. */
  private def timeDecayQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.timeDecayAttribution(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        convType = "purchase", channels = Seq("signup", "view", "click"),
        weights = DecayWeightsPpm)
      .orderBy(col("channel"))

  /** Cohort LTV (q228): cumulative cent-exact revenue per first-order
    * cohort week and weeks-since-first — the payback-period curve;
    * timezone-proof integer weeks. */
  private def cohortLtvQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.cohortLtv(
        Tables.orders(s, dir), "o_custkey", "o_orderdate",
        round(col("o_totalprice") * 100))
      .orderBy(col("cohort_week"), col("offset_weeks"))

  /** q227's iteration constant — drives BOTH the Spark driver loop
    * and the unrolled oracle CTE chain (determinism does not require
    * convergence; iters is part of the contract). */
  private val PcaPowerIters = 12

  /** Top principal component (q227): the embedding-collapse audit —
    * exact-integer power iteration on the graft_gram covariance,
    * sign-canonicalized; explained_ppm is the one-number collapse
    * score. */
  private def topPcQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    Similarity.topPrincipalComponent(Tables.embeddings(s, dir),
        "embedding", dims = 64, iters = PcaPowerIters)
      .orderBy(col("dim"))
  }

  /** Holt smoothing (q226): level + trend per event type — the
    * forecast that stops trailing a ramp; truncation direction on the
    * signed trend is contractual and mirrored sign-split. */
  private def holtQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.holtSmoothing(
        Tables.events(s, dir), "event_type", "ts",
        alphaPpm = 300000L, betaPpm = 200000L)
      .orderBy(col("event_type"), col("day"))

  /** Aggregate consistency (q223): does the stored order total match
    * the line sum — denormalization drift at cent precision, 5%
    * tolerance; childless parents counted separately. */
  private def aggConsistencyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.aggregateConsistencyAudit(
      Tables.orders(s, dir), "o_orderkey", round(col("o_totalprice") * 100),
      Tables.lineitem(s, dir), "l_orderkey",
      round(col("l_extendedprice") * 100), tolerancePpm = 50000L)

  /** Calendar densification (q224): the dense per-type day axis with
    * explicit zero days — the gapless basis every series window
    * assumes. */
  private def densifyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.densifyDays(
        Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"), col("day"))

  /** Behavioral diversity (q221): per-user event-mix entropy in
    * exact micro-nats, published as the quarter-nat bucket
    * histogram — the exploration-vs-routine segmentation. */
  private def diversityQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.behavioralDiversity(
        Tables.events(s, dir), "user_id", "event_type")
      .orderBy(col("bucket"))

  /** Frequency response (q222): conversion rate by pre-conversion
    * view count — the diminishing-returns curve behind frequency
    * capping; strict-before tie rule. */
  private def frequencyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.frequencyResponse(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        touchType = "view", convType = "purchase", cap = 10)
      .orderBy(col("touch_bucket"))

  /** Readability (q220): Flesch reading ease per document —
    * dictionary-free vowel-run syllables, punctuation-run sentences,
    * one micro-quantized IEEE chain; the audience-level quality
    * signal. */
  private def readabilityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.readabilityScore(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Functional dependencies (q219): which order columns determine
    * which — candidate keys and near-held invariants over a literal
    * 4-column list, violating-group ppm per ordered pair. */
  private def fdAuditQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.functionalDependencies(
        Tables.orders(s, dir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy(col("determinant"), col("dependent"))

  /** Pettitt changepoint (q218): the nonparametric split-day per
    * event type — rank algebra along time, robust where q149's CUSUM
    * is outlier-dragged. */
  private def pettittQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.pettittChangepoint(
        Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))

  /** Scene-change detection (q217): consecutive-frame checksum deltas
    * over the full decoded frame stream — a cut is a frame whose
    * brightness mass moved ≥ 10% (|Δ| ≥ max(1, prev div 10)); the
    * shot-boundary primitive video curation samples around. Pure
    * composition: q167's decoder + a per-doc window. */
  private def sceneChangeQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val fr = Multimodal.sampleFrames(s,
      Multimodal.attachVideo(s, Tables.documents(s, dir)), everyN = 1).toDF()
    val byF = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    fr.withColumn("prev", lag(col("px_checksum"), 1).over(byF))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        count(when(col("prev").isNotNull &&
          abs(col("px_checksum") - col("prev")) >=
            greatest(lit(1L), expr("prev div 10")), 1)).as("n_cuts"),
        coalesce(max(abs(col("px_checksum") - col("prev"))), lit(0L))
          .as("max_delta"))
      .orderBy(col("doc_id"))
  }

  /** Winsorize (q216): clamp document lengths to each language's
    * exact [p10, p90] band — the outlier-taming transform upstream of
    * robust statistics; row-level output, hash-sensitive to the
    * exact clamping. */
  private def winsorizeQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.winsorize(
        Tables.documents(s, dir), "doc_id", "lang", col("n_chars"),
        pLow = 10, pHigh = 90)
      .orderBy(col("doc_id"))

  /** Peak concurrency (q215): how many user-day sessions were open AT
    * ONCE, per day — the day-partitioned +1/−1 boundary sweep; the
    * capacity read next to q192's depth histogram. */
  private def peakConcurrencyQuery(s: SparkSession, dir: String): DataFrame = {
    val sess = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
    graft.operators.Analytics.peakConcurrency(sess, "start_ts", "end_ts")
      .orderBy(col("day"))
  }

  /** Q–Q decile table (q214): en vs de document lengths aligned
    * quantile by quantile — K137's exact order statistic per slice,
    * joined on the decile, with the per-decile length ratio; the
    * distribution-shape read that says WHERE the drift q199 detects
    * actually lives. Pure composition of the gated q169 machinery. */
  private def qqTableQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val docs = Tables.documents(s, dir).filter(col("lang").isin("en", "de"))
    val bands = Analytics.exactPercentiles(docs, "lang", col("n_chars"),
      (1 to 9).map(_ * 10))
    val en = bands.filter(col("key") === "en")
      .select(col("pct"), col("value").as("v_en"))
    val de = bands.filter(col("key") === "de")
      .select(col("pct"), col("value").as("v_de"))
    en.join(de, Seq("pct"))
      .select(col("pct"), col("v_en"), col("v_de"),
        when(col("v_de") =!= 0, expr("v_en * 1000000 div v_de"))
          .otherwise(lit(null).cast("long")).as("ratio_ppm"))
      .orderBy(col("pct"))
  }

  /** Spearman correlation (q213): do quantity and price move together
    * on the order line — tie-aware midrank correlation in exact
    * integers off the two value histograms. */
  private def spearmanQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.spearmanCorrelation(
      Tables.lineitem(s, dir), col("l_quantity"),
      round(col("l_extendedprice") * 100))

  /** Mann–Whitney U (q210): does German length stochastically
    * dominate English — doubled rank sums off the shared value
    * histogram, AUC effect size in exact ppm (the q199 pair). */
  private def mannWhitneyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.mannWhitneyU(
      Tables.documents(s, dir), "lang", col("n_chars"), "en", "de")

  /** KL divergence (q211): weekday vs weekend event-type mix — the
    * categorical drift screen, per-category micro terms summed
    * exactly, NULL on disjoint support. */
  private def klDivergenceQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("slice",
        when(dayofweek(to_date(col("ts"))).between(2, 6), "weekday")
          .otherwise("weekend"))
    graft.operators.Analytics.klDivergence(
      e, "event_type", "slice", "weekday", "weekend")
  }

  /** EWMA baseline (q209): the exact-integer smoothed expected volume
    * per event type (α = 0.3) with per-day deviations — the monitor
    * primitive; driver fold over the days-sized rollup, recursive-CTE
    * oracle. */
  private def ewmaQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.ewmaBaseline(
        Tables.events(s, dir), "event_type", "ts", alphaPpm = 300000L)
      .orderBy(col("event_type"), col("day"))

  /** Audience overlap (q208): the pairwise Jaccard of event-type
    * audiences — one distinct (user, type) shuffle, types²-bounded
    * everything after. */
  private def audienceOverlapQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.audienceOverlap(
        Tables.events(s, dir), "event_type", "user_id")
      .orderBy(col("type_a"), col("type_b"))

  /** Cross-correlation (q207): does the signup series lead purchases
    * by a week — lag-7 cross-correlation of the two daily series on
    * the shared day axis, exact sums, one stated IEEE tail. */
  private def crossCorrQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.crossCorrelation(
      Tables.events(s, dir), "event_type", "ts",
      typeX = "signup", typeY = "purchase", lag = 7)

  /** Chi-square independence (q204): is the event mix associated with
    * the weekday — Pearson X² over the full type×weekday grid,
    * per-cell micro terms summed exactly. */
  private def chiSquareQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.chiSquareIndependence(
      Tables.events(s, dir)
        .select(col("event_type"),
          dayofweek(to_date(col("ts"))).as("weekday")),
      "event_type", "weekday")

  /** Contribution analysis (q203): why did the metric move — each
    * event type's share of the total absolute odd-vs-even-day volume
    * change, conserving exactly 10⁶ ppm across segments. */
  private def contributionQuery(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
    graft.operators.Analytics.contributionAnalysis(
        Tables.events(s, dir), "event_type",
        day % 2 === 0, day % 2 === 1)
      .orderBy(col("segment"))
  }

  /** Heavy hitters (q201): every event type holding ≥ 5% of the
    * events, exact counts, via the Count–Min candidate pass — the
    * bounded-exchange alternative to a full key rollup. */
  private def heavyHittersQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.heavyHitters(
        Tables.events(s, dir), "event_type", minSharePpm = 50000L)
      .orderBy(col("n_rows").desc, col("key"))

  /** KS drift (q199): the supremum CDF gap between English and
    * German document lengths in exact ppm — the covariate-shift
    * screen between any two corpus slices. */
  private def ksDriftQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.ksDrift(Tables.documents(s, dir), "lang", col("n_chars"),
      groupA = "en", groupB = "de")
  }

  /** Schema drift (q197): two generations of an events extract —
    * a column dropped, one added, one type-widened to string, and
    * null-rate movement on the kept ones. */
  private def schemaDriftQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    val e = Tables.events(s, dir)
    val oldSnap = e.select(col("event_id"), col("user_id"),
      col("event_type"),
      when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))
        .as("value"),
      col("props").as("legacy"))
    val newSnap = e.select(col("event_id"),
      when(col("event_id") % 5 === 0, lit(null)).otherwise(col("user_id"))
        .as("user_id"),
      col("event_type"), col("value").cast("string").as("value"),
      col("props").as("extra"))
    Curation.schemaDriftAudit(oldSnap, newSnap).orderBy(col("column"))
  }

  /** Revenue Pareto (q196): the Lorenz curve of per-customer revenue
    * in ten equal-count buckets — "the top decile drives what share",
    * exact cumulative ppm, no global sort of customers. */
  private def revenueParetoQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val rev = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        Seq("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("revenue"))
    Analytics.lorenzCurve(rev, col("revenue"), buckets = 10)
      .orderBy(col("bucket"))
  }

  /** A/B test harness (q195): deterministic hash-split arms, purchase
    * conversion per arm, pooled two-proportion z — the
    * experimentation primitive with no framework dependency. */
  private def abTestQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.abTestHarness(Tables.events(s, dir), "user_id",
      "event_type", conversionType = "purchase", salt = "exp1")
  }

  /** Cohort-split funnel (q194): the q166 windowed funnel broken out
    * by signup week — "did the new onboarding cohort convert better".
    * The week comes from PURE integer arithmetic on the resolved
    * epoch seconds (Monday-aligned days-since-epoch, 1970-01-05 was
    * a Monday), so no engine timezone can skew the bucket. */
  private def cohortFunnelQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val steps = Seq("signup", "view", "click", "purchase")
    val reach = Analytics.windowedFunnelResolved(Tables.events(s, dir),
      "user_id", "ts", "event_type", steps, windowSecs = 172800L)
    val cohort = reach.withColumn("cw",
      date_add(lit("1970-01-01").cast("date"),
        (lit(4L) + lit(7L) * expr("(m0 div 86400 - 4) div 7"))
          .cast("int")))
    val counts = cohort.groupBy(col("cw"))
      .agg(count(col("m0")).as("n0"),
        steps.indices.tail.map(i => count(col(s"m$i")).as(s"n$i")): _*)
    counts.select(col("cw"), explode(array(steps.zipWithIndex.map {
        case (st, i) => struct(lit(i.toLong).as("step_idx"),
          lit(st).as("step"), col(s"n$i").as("n_users"))
      }: _*)).as("s"), col("n0"))
      .select(col("cw").cast("string").as("cohort_week"),
        col("s.step_idx"), col("s.step"), col("s.n_users"),
        expr("s.n_users * 1000000 div n0").as("conversion_ppm"))
      .orderBy(col("cohort_week"), col("step_idx"))
  }

  /** Session depth histogram (q192): how long and how deep sessions
    * run — q35's session windows rolled into log₂ event-count
    * buckets (the q174 integer-log₂ convention), with span extremes
    * per bucket. */
  private def sessionDepthQuery(s: SparkSession, dir: String): DataFrame = {
    val perSession = Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_seconds(max(col("ts"))) - unix_seconds(min(col("ts"))))
          .as("span_secs"))
    perSession
      .withColumn("bucket", length(bin(col("n_events"))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        min(col("n_events")).as("min_events"),
        max(col("n_events")).as("max_events"),
        max(col("span_secs")).as("max_span_secs"))
      .orderBy(col("bucket"))
  }

  /** Week-over-week metrics (q193): per-type ISO-week counts with
    * the WoW delta in exact ppm — the first derivative every metrics
    * dashboard plots. */
  private def wowQuery(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .agg(count(lit(1)).as("n"))
    val byWk = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    weekly
      .withColumn("prev", lag(col("n"), 1).over(byWk))
      .select(col("event_type"), col("wk").cast("string").as("week"),
        col("n"), col("prev"),
        when(col("prev").isNotNull && col("prev") > 0,
          expr("(n - prev) * 1000000 div prev")).as("wow_delta_ppm"))
      .orderBy(col("event_type"), col("week"))
  }

  /** Weekly retention triangle (q189): cohort week × week offset
    * distinct returners in exact ppm — the growth chart, on ISO
    * Monday weeks in both engines. */
  private def weeklyRetentionQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.weeklyRetention(Tables.events(s, dir), "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Funnel step latency (q188): p25/p50/p75 of the per-user
    * resolution gap for each consecutive step pair of the q166
    * windowed funnel — where users stall, in exact order
    * statistics. */
  private def funnelLatencyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.funnelStepLatency(Tables.events(s, dir), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"),
        windowSecs = 172800L, pcts = Seq(25, 50, 75))
      .orderBy(col("pair"), col("pct"))
  }

  /** Weekday-adjusted anomalies (q186): each day scored against its
    * own weekday's distribution — the seasonal repair of q123's
    * trailing z-score (a quiet Sunday is normal; the same count on a
    * Tuesday is an incident). */
  private def weekdayZscoreQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.weekdayAdjustedZscore(Tables.events(s, dir), "ts", "event_type")
      .orderBy(col("key"), col("day"))
  }

  /** Benford audit (q187): first-digit distribution of cent-quantized
    * extended prices vs the log₁₀(1+1/d) expectation — the
    * fraud/data-quality screen, literal-driven on both sides. */
  private def benfordQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.benfordAudit(Tables.lineitem(s, dir),
        round(col("l_extendedprice") * 100))
      .orderBy(col("digit"))
  }

  /** Edit-distance join (q183): customers fuzzy-matched against a
    * mutated copy (every 7th name grows a trailing char) at ED ≤ 1
    * via deletion neighborhoods — digit-neighbour key collisions
    * ("…001" vs "…002") surface as genuine distance-1 pairs, the
    * entity-resolution shape. */
  private def editJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val c = Tables.customer(s, dir)
    val left = c.select(col("c_custkey").as("id"), col("c_name").as("name"))
    val right = c.select(col("c_custkey").as("id"),
      when(col("c_custkey") % 7 === 3, concat(col("c_name"), lit("x")))
        .otherwise(col("c_name")).as("name"))
    TextDedup.editDistanceJoin(left, right, "id", "name")
      .orderBy(col("left_id"), col("right_id"))
  }

  /** Delta-maintained key stats (q182): the diagnostics-state tick —
    * counts/counts-of-counts/sufficient-stats are BUILT over an old
    * events snapshot, one [[graft.jobs.KeyStatsMaintenance]] tick
    * brings them to the new snapshot at O(changed) cost (deleted
    * events, plus every id%10==5 event REASSIGNED to a new user — the
    * key-change path), and the output sheet (entropy + Gini) derives
    * from the MAINTAINED state. The DuckDB oracle computes both
    * statistics directly over the new snapshot — the hash compare IS
    * the delta≡rebuild gate (the q141 contract extended to the
    * distribution diagnostics). */
  private def keyStatsNightlyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.jobs.KeyStatsMaintenance
    val e = Tables.events(s, dir).select(col("event_id"), col("user_id"))
    val oldSnap = e.filter(col("event_id") % 10 =!= 3)
    val newSnap = e.filter(col("event_id") % 10 =!= 7)
      .select(col("event_id"),
        when(col("event_id") % 10 === 5, col("user_id") + 1000000L)
          .otherwise(col("user_id")).as("user_id"))
    val st = KeyStatsMaintenance.rebuild(oldSnap, "user_id")
    KeyStatsMaintenance.stats(
      KeyStatsMaintenance.tick(st, oldSnap, newSnap, "event_id", "user_id"))
  }

  /** k-anonymity audit (q179): how much of the corpus a
    * (lang, source, length-bucket) quasi-identifier tuple still
    * singles out at k = 5 — the release-gate companion to q54's PII
    * redaction. */
  private def kAnonymityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.kAnonymityAudit(
      Tables.documents(s, dir).select(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket")),
      Seq("lang", "source", "len_bucket"), k = 5)
  }

  /** Salted two-stage aggregation (q162): the hot-key rollup spread
    * over (key, salt) reducers then re-aggregated — must equal the
    * plain GROUP BY exactly (integer sums; the K14 salt-invisibility
    * contract on the aggregation side). */
  private def saltedAggQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SkewJoin
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
    SkewJoin.saltedAgg(li, "l_returnflag", Seq("qty"), salt = 16)
      .orderBy(col("l_returnflag"))
  }

  /** Pre-join cardinality audit (q163): exact |lineitem ⋈ orders| plus
    * the worst contributing key, from the key-count relations only —
    * the explosion check an operator runs BEFORE the shuffle. */
  private def joinCardinalityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.joinCardinalityAudit(
      Tables.lineitem(s, dir), "l_orderkey",
      Tables.orders(s, dir), "o_orderkey")
  }

  /** Top user paths (q164): each user's first five events as a
    * `a>b>c` journey string, ranked by user count — the pathfinder
    * view next to q122's one-step transition matrix. */
  private def topPathsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.topPaths(Tables.events(s, dir), "user_id", "ts", "event_type",
      maxSteps = 5, topK = 20)
  }

  /** SCD2 merge (q165): one type-2 versioning pass over the customer
    * dimension exercising all five cases — version (%10==3, with an
    * older superseded update), equal no-op (%10==6), late-update
    * no-op (%10==4, ts 900 ≤ valid_from 1000), untouched keys, and
    * inserts (%10==9 under key+100000) — plus history passthrough
    * (%10==0 carries a closed prior version). */
  private def scd2Query(s: SparkSession, dir: String): DataFrame = {
    import graft.store.Scd2
    val c = Tables.customer(s, dir)
    def nk(delta: Int) = (col("c_nationkey") + delta).cast("long").as("c_nationkey")
    val current = c.select(col("c_custkey"), col("c_name"), nk(0),
      lit(1000L).as("valid_from"), lit(null).cast("long").as("valid_to"))
    val history = c.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"), nk(100),
        lit(500L).as("valid_from"), lit(1000L).as("valid_to"))
    val dim = current.unionByName(history)
    def upd(m: Int, delta: Int, ts: Long) = c.filter(col("c_custkey") % 10 === m)
      .select(col("c_custkey"), col("c_name"), nk(delta), lit(ts).as("ts"))
    val updates = upd(3, 1, 2000L)
      .unionByName(upd(3, 50, 1500L)) // superseded by the collapse
      .unionByName(upd(6, 0, 2000L)) // equal attrs: no-op
      .unionByName(upd(4, 7, 900L)) // late: rejected
      .unionByName(c.filter(col("c_custkey") % 10 === 9)
        .select((col("c_custkey") + 100000L).as("c_custkey"), col("c_name"),
          nk(0), lit(2000L).as("ts"))) // inserts
    Scd2.merge(dim, updates, "c_custkey", Seq("c_name", "c_nationkey"), "ts")
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Windowed funnel (q166): signup → view → click → purchase with a
    * 48 h per-step deadline — each step's qualifying minimum is
    * conditional on the previous step's resolved time, the semantics
    * the plain q120 funnel cannot express. */
  private def windowedFunnelQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.windowedFunnel(Tables.events(s, dir), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"),
        windowSecs = 172800L)
      .orderBy(col("step_idx"))
  }

  /** Exact percentile bands (q169): p25/p50/p75 of cent-quantized
    * event values per type — the histogram-prefix order statistic as
    * a reusable operator (bounded memory where percentile() buffers
    * every group value). */
  private def exactPercentilesQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.exactPercentiles(Tables.events(s, dir), "event_type",
        round(col("value") * 100), Seq(25, 50, 75))
      .select(col("key").as("event_type"), col("pct"),
        col("value").as("value_cents"))
      .orderBy(col("event_type"), col("pct"))
  }

  /** Key entropy (q170): the shuffle-balance score of the user_id
    * distribution in integer micro-nats vs the ln(K) maximum. */
  private def keyEntropyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.keyEntropy(Tables.events(s, dir), "user_id")
  }

  /** Referential-integrity audit (q171): orphan-row counts for three
    * FK edges of the warehouse star — lineitem→orders (clean),
    * orders→customer with the parent restricted to `c_custkey % 7 <> 3`
    * and every 13th order's FK nulled (exercises the orphan AND the
    * null-FK paths), customer→nation restricted to `n_nationkey < 20`. */
  private def fkIntegrityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r1 = Analytics.fkIntegrityAudit(
      li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
    val r2 = Analytics.fkIntegrityAudit(
      o.select(when(col("o_orderkey") % 13 === 5, lit(null))
        .otherwise(col("o_custkey")).as("o_custkey")),
      "o_custkey",
      c.filter(col("c_custkey") % 7 =!= 3), "c_custkey",
      "orders->customer")
    val r3 = Analytics.fkIntegrityAudit(
      c, "c_nationkey",
      n.filter(col("n_nationkey") < 20), "n_nationkey",
      "customer->nation")
    r1.unionByName(r2).unionByName(r3).orderBy(col("relation"))
  }

  /** Key-concentration Gini (q172): the 0…1e6-ppm concentration score
    * of the user_id distribution, from the counts-of-counts histogram
    * — completes the pre-shuffle triptych (q140 offenders, q170
    * balance, q172 concentration). */
  private def keyGiniQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.keyGini(Tables.events(s, dir), "user_id")
  }

  /** Weekday seasonality (q173): between-group variance share of the
    * per-type daily series grouped by weekday, in ppm — "is this
    * metric weekly-periodic, and which weekday peaks". */
  private def weekdaySeasonalityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.weekdaySeasonality(Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))
  }

  /** Inter-event gap histogram (q174): per-user consecutive-event
    * gaps in power-of-two second buckets — the empirical basis for
    * every session-gap parameter. */
  private def eventGapsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.interEventGaps(Tables.events(s, dir), "user_id", "ts",
        "event_type")
      .orderBy(col("bucket"))
  }

  /** q176 shared constant: power-iteration count — drives BOTH the
    * Spark loop and the unrolled oracle CTEs (the kmeansCtesSql
    * pattern: one constant, two engines). */
  private val stationaryIters = 8

  /** Markov stationary distribution (q176): equilibrium state mass of
    * the event-type transition chain in exact integer ppm — q122's
    * one-step matrix run to its fixed point. */
  private def stationaryQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.stationaryDistribution(Tables.events(s, dir), "user_id",
        "ts", "event_type", "event_id", iters = stationaryIters)
      .orderBy(col("event_type"))
  }

  /** Weighted sample (q177): 100 documents drawn by n_chars weight —
    * deterministic Efraimidis–Spirakis A-ES, the curation sampler
    * between q51's uniform rate and q74's exact-N uniform. */
  private def weightedSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.weightedSample(Tables.documents(s, dir), "doc_id",
        col("n_chars"), n = 100)
      .orderBy(col("cost_nano"), col("doc_id"))
  }

  /** Linear attribution (q175): every purchase splits exactly 10⁶ ppm
    * of credit equally across its prior signup/view/click touches
    * (remainder to the last touch) — q153's fair-split twin. */
  private def linearAttributionQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.linearAttribution(Tables.events(s, dir), "user_id", "ts",
        "event_type", conversionType = "purchase",
        channelTypes = Seq("signup", "view", "click"))
      .orderBy(col("channel"))
  }

  /** Conversion latency (q155): integer seconds from each user's
    * first signup to their first purchase (strict order), summarized
    * by exact order statistics — n, min, lower-median, max. */
  private def conversionLatencyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.conversionLatency(Tables.events(s, dir), "user_id", "ts",
      "event_type", fromType = "signup", toType = "purchase")
  }

  /** MAD outlier gate (q154): per event type, the exact lower-median
    * and median-absolute-deviation of daily counts plus the
    * |v−med| > 3·MAD outlier count — the robust spread pairing
    * q150's robust center; pure order statistics, no floats. */
  private def madQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.madOutliers(Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))
  }

  /** Last-touch attribution (q153): every purchase credits the most
    * recent strictly-earlier signup/view/click of the same user — the
    * as-of join folded into one per-user window pass, deterministic
    * under timestamp ties via the range frame + order-independent
    * max-string rule. */
  private def attributionQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.lastTouchAttribution(Tables.events(s, dir), "user_id", "ts",
        "event_type", conversionType = "purchase",
        channelTypes = Seq("signup", "view", "click"))
      .orderBy(col("channel"))
  }

  /** Multi-probe SRP ANN (q152): each query probes its own 6-bit
    * sign-projection bucket plus the two buckets across its
    * lowest-margin hyperplanes — the recall knob q26's single-probe
    * path lacks — with the standard inline brute-force audit flag. */
  private def multiProbeAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.multiProbeTopK(q, c, dims = 64, nbits = 6, nprobe = 2, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Lag-7 autocorrelation (q151): weekly-rhythm detection per event
    * type — exact scaled-integer numerator/denominator, one final
    * rounded division. Completes the series family: anomaly (q123),
    * break day (q149), trend (q150), periodicity (q151). */
  private def autocorrQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.autocorrelation(Tables.events(s, dir), "event_type", "ts",
        lag = 7)
      .orderBy(col("event_type"))
  }

  /** Theil–Sen robust trend (q150): per event type, the median of all
    * pairwise daily-count slopes — the outlier-proof trend the K77
    * least-squares fit isn't; pairs bounded by days², exact integer
    * (dv, dd) median pair plus the rounded slope. */
  private def theilSenQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.theilSenTrend(Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))
  }

  /** CUSUM changepoints (q149): per event type, the day the daily
    * count series most likely level-shifted — exact scaled-integer
    * cumulative sums (v·n − total, so the mean never divides), peak
    * by |S| with earliest-day ties, break size in ppm. */
  private def cusumQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.cusumChangepoint(Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))
  }

  /** SAX time-series words (q147): each event type's 30-day count
    * series → 6 integer PAA means → 4-symbol equi-width bins → one
    * SAX word per type. Equality on the word buckets shape-similar
    * metrics — the LSH pattern pointed at time series. */
  private def saxWordsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.saxWords(Tables.events(s, dir), "event_type", "ts",
        windows = 6, alphabet = 4)
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------------
  // Contract maps
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_daily_active_users" -> (dailyActiveUsers _),
    "q03_sampling_tiers" -> (samplingTiers _),
    "q04_multi_device_7d" -> (multiDevice7d _),
    "q05_session_metadata" -> (sessionMetadata _),
    "q06_revenue_by_nation" -> (revenueByNation _),
    "q07_customers_without_orders" -> (customersWithoutOrders _),
    "q08_exact_dedup" -> (exactDedup _),
    "q09_day_store_lifecycle" -> (dayStoreLifecycle _),
    "q10_csv_ingest_sanitize" -> (csvIngestSanitize _),
    "q11_activity_import_tiers" -> (activityImportTiers _),
    "q12_flow_metadata_cascade" -> (flowMetadataFinal _),
    "q13_flow_experiments" -> (flowExperimentsFinal _),
    "q14_flow_events_absorbed" -> (flowEventsAbsorbed _),
    "q15_daily_devices_rollup" -> (dailyDevicesRollup _),
    "q16_multi_device_incremental" -> (multiDeviceIncremental _),
    "q17_counts_import" -> (countsImport _),
    "q18_email_import_tiers" -> (emailImportTiers _),
    "q19_lexical_inverted_topk" -> (lexicalInvertedTopK _),
    "q20_exact_dedup_rows" -> (exactDedupRows _),
    "q21_minhash_lsh_pairs" -> (minHashLsh _),
    "q22_simhash_pairs" -> (simHashPairs _),
    "q23_ngram_jaccard_topk" -> (ngramJaccardTopK _),
    "q24_embedding_neardup" -> (embeddingNearDup _),
    "q25_ann_bruteforce_topk" -> (annBruteForce _),
    "q26_ann_lsh_recall" -> (annLshRecall _),
    "q27_lang_id" -> (langIdConfusion _),
    "q28_quality_scores" -> (qualityScores _),
    "q29_token_stats" -> (tokenStats _),
    "q30_fingerprints" -> (fingerprints _),
    "q31_multimodal_features" -> (multimodalFeatures _),
    "q32_minhash_char_shingles" -> (minHashCharShingles _),
    "q33_embedding_neardup_bucketed" -> (embeddingNearDupBucketed _),
    "q34_neardup_components" -> (nearDupComponents _),
    "q35_session_windows" -> (sessionWindows _),
    "q36_sql_api_norms" -> (sqlApiNorms _),
    "q37_value_percentiles" -> (valuePercentiles _),
    "q38_doc_rollup" -> (docRollup _),
    "q39_pad_policy_ingest" -> (padPolicyIngest _),
    "q40_compaction_lifecycle" -> (compactionLifecycle _),
    "q41_run_import_e2e" -> (runImportE2E _),
    "q42_value_percentiles_approx" -> (valuePercentilesApprox _),
    "q43_asof_prev_view" -> (asOfPrevView _),
    "q44_kmv_distinct" -> (kmvDistinct _),
    "q45_tfidf_top_terms" -> (tfidfTopTerms _),
    "q46_streaming_sessions" -> (streamingSessions _),
    "q47_contamination_scan" -> (contaminationScan _),
    "q48_quality_percentile_filter" -> (qualityPercentileFilter _),
    "q49_ann_topk_agg" -> (annTopKAgg _),
    "q50_ivf_ann" -> (ivfAnn _),
    "q51_stratified_sample" -> (stratifiedSample _),
    "q52_domain_cap" -> (domainCapQuery _),
    "q53_repetition_signals" -> (repetitionSignalsQuery _),
    "q54_pii_redact" -> (piiRedactScan _),
    "q55_range_join_windows" -> (rangeJoinBucketed _),
    "q56_lsh_incremental" -> (lshIncrementalProbe _),
    "q57_neardup_dedup_dataset" -> (nearDupDedupDataset _),
    "q58_streaming_rollups" -> (streamingDailyRollups _),
    "q59_ivf_lloyd_recall" -> (ivfLloydRecall _),
    "q60_bloom_incremental_dedup" -> (bloomIncrementalDedup _),
    "q61_doc_chunking" -> (chunkDocumentsQuery _),
    "q62_bpe_pair_counts" -> (bpePairCountsQuery _),
    "q63_pq_ann" -> (pqAnn _),
    "q64_json_ingest" -> (jsonIngest _),
    "q65_streaming_dedup" -> (streamingDedup _),
    "q66_curation_gate" -> (curateQuery _),
    "q67_unigram_surprisal" -> (unigramSurprisalQuery _),
    "q68_hybrid_search" -> (hybridSearchQuery _),
    "q69_decontaminate" -> (decontaminateQuery _),
    "q70_ivf_pq_ann" -> (ivfPqAnn _),
    "q71_bloom_sharded_dedup" -> (bloomShardedDedup _),
    "q72_bm25_topk" -> (bm25TopKQuery _),
    "q73_semantic_dedup" -> (semDedupQuery _),
    "q74_exact_sample" -> (exactSampleQuery _),
    "q75_sequence_packing" -> (packSequencesQuery _),
    "q76_hybrid_search_3way" -> (hybridSearch3Query _),
    "q77_multimodal_audio" -> (multimodalAudio _),
    "q78_corpus_overlap" -> (corpusOverlapQuery _),
    "q79_sq_ann" -> (sqAnn _),
    "q80_line_dedup" -> (lineDedupQuery _),
    "q81_dup_ngrams" -> (dupNgramQuery _),
    "q82_char_entropy" -> (charEntropyQuery _),
    "q83_hashed_quality" -> (hashedQualityQuery _),
    "q84_shuffle_assign" -> (shuffleAssignQuery _),
    "q85_audio_frames" -> (audioFramesQuery _),
    "q86_stratified_sample" -> (stratifiedSampleQuery _),
    "q87_bigram_surprisal" -> (bigramSurprisalQuery _),
    "q88_filtered_ann" -> (filteredAnnQuery _),
    "q89_ivf_sq_ann" -> (ivfSqAnn _),
    "q90_mixture_plan" -> (mixturePlanQuery _),
    "q91_ivf_audit" -> (ivfAuditQuery _),
    "q92_streaming_quality" -> (streamingQualityGate _),
    "q93_winnowing" -> (winnowingQuery _),
    "q94_packing_split" -> (packingSplitQuery _),
    "q95_training_manifest" -> (trainingManifestQuery _),
    "q96_semantic_contamination" -> (semanticContaminationQuery _),
    "q97_data_card" -> (dataCardQuery _),
    "q98_snapshot_diff" -> (snapshotDiffQuery _),
    "q99_matryoshka_ann" -> (matryoshkaAnn _),
    "q100_length_buckets" -> (lengthBucketQuery _),
    "q101_containment_pairs" -> (containmentQuery _),
    "q102_score_calibration" -> (calibrateQuery _),
    "q103_lsh_index_delta" -> (lshIndexDeltaQuery _),
    "q104_signal_correlations" -> (signalCorrQuery _),
    "q105_neardup_keep_best" -> (nearDupKeepBestQuery _),
    "q106_contamination_spans" -> (contaminationSpanQuery _),
    "q107_upsample" -> (upsampleQuery _),
    "q108_zipf_audit" -> (zipfAuditQuery _),
    "q109_ranking_metrics" -> (rankingMetricsQuery _),
    "q110_rare_token_scrub" -> (rareTokenScrubQuery _),
    "q111_centroid_drift" -> (centroidDriftQuery _),
    "q112_dup_span_scrub" -> (dupSpanScrubQuery _),
    "q113_dsir_weights" -> (dsirWeightsQuery _),
    "q114_ccnet_buckets" -> (ccnetBucketsQuery _),
    "q115_budget_select" -> (budgetSelectQuery _),
    "q116_leakage_split" -> (leakageSplitQuery _),
    "q117_centroid_outliers" -> (centroidOutliersQuery _),
    "q118_char_class_signals" -> (charClassQuery _),
    "q119_template_grams" -> (templateGramsQuery _),
    "q120_funnel" -> (funnelQuery _),
    "q121_cohort_retention" -> (cohortRetentionQuery _),
    "q122_transition_matrix" -> (transitionMatrixQuery _),
    "q123_trailing_zscore" -> (trailingZscoreQuery _),
    "q124_cooccurrence_topk" -> (coOccurrenceQuery _),
    "q125_data_profile" -> (profileQuery _),
    "q126_semdedup_capped" -> (semDedupCappedQuery _),
    "q127_band_index_nightly" -> (bandIndexNightlyQuery _),
    "q128_hash_index_nightly" -> (hashIndexNightlyQuery _),
    "q129_weighted_neardup" -> (weightedNearDupQuery _),
    "q130_curation_composed" -> (curationComposedQuery _),
    "q131_url_dedup" -> (urlDedupQuery _),
    "q132_streaming_bloom_gate" -> (streamingBloomGate _),
    "q133_vector_index_nightly" -> (vectorIndexNightlyQuery _),
    "q134_html_extract" -> (stripHtmlQuery _),
    "q135_web_ingest" -> (webIngestQuery _),
    "q136_export_manifest" -> (exportManifestQuery _),
    "q137_histogram" -> (histogramQuery _),
    "q138_kmeans_fit" -> (kmeansFitQuery _),
    "q139_covariance_stats" -> (covarianceStatsQuery _),
    "q140_key_skew_audit" -> (keySkewAuditQuery _),
    "q141_card_nightly" -> (cardNightlyQuery _),
    "q142_jl_ann" -> (jlAnn _),
    "q143_vocab_coverage" -> (vocabCoverageQuery _),
    "q144_covariance_nightly" -> (covarianceNightlyQuery _),
    "q145_cluster_size_histogram" -> (clusterSizeHistogramQuery _),
    "q146_retrained_index" -> (retrainedIndexQuery _),
    "q147_sax_words" -> (saxWordsQuery _),
    "q148_streaming_funnel" -> (streamingFunnel _),
    "q149_cusum_changepoint" -> (cusumQuery _),
    "q150_theil_sen_trend" -> (theilSenQuery _),
    "q151_autocorrelation" -> (autocorrQuery _),
    "q152_multiprobe_ann" -> (multiProbeAnn _),
    "q153_attribution" -> (attributionQuery _),
    "q154_mad_outliers" -> (madQuery _),
    "q155_conversion_latency" -> (conversionLatencyQuery _),
    "q156_skew_join" -> (skewJoinQuery _),
    "q157_nightly_tick" -> (nightlyTickQuery _),
    "q158_bpe_encode" -> (bpeEncodeQuery _),
    "q159_bpe_budget_select" -> (bpeBudgetQuery _),
    "q160_bpe_train" -> (bpeTrainQuery _),
    "q161_bpe_trained_encode" -> (bpeTrainedEncodeQuery _),
    "q162_salted_agg" -> (saltedAggQuery _),
    "q163_join_cardinality" -> (joinCardinalityQuery _),
    "q164_top_paths" -> (topPathsQuery _),
    "q165_scd2_merge" -> (scd2Query _),
    "q166_windowed_funnel" -> (windowedFunnelQuery _),
    "q167_video_frame_sample" -> (videoFrameSample _),
    "q168_streaming_windowed_funnel" -> (streamingWindowedFunnel _),
    "q169_exact_percentiles" -> (exactPercentilesQuery _),
    "q170_key_entropy" -> (keyEntropyQuery _),
    "q171_fk_integrity" -> (fkIntegrityQuery _),
    "q172_key_gini" -> (keyGiniQuery _),
    "q173_weekday_seasonality" -> (weekdaySeasonalityQuery _),
    "q174_event_gaps" -> (eventGapsQuery _),
    "q175_linear_attribution" -> (linearAttributionQuery _),
    "q176_stationary_distribution" -> (stationaryQuery _),
    "q177_weighted_sample" -> (weightedSampleQuery _),
    "q178_bpe_fertility" -> (bpeFertilityQuery _),
    "q179_k_anonymity" -> (kAnonymityQuery _),
    "q180_streaming_gaps" -> (streamingGapsQuery _),
    "q181_equi_depth_histogram" -> (equiDepthQuery _),
    "q182_key_stats_nightly" -> (keyStatsNightlyQuery _),
    "q183_edit_distance_join" -> (editJoinQuery _),
    "q184_stickiness" -> (stickinessQuery _),
    "q185_image_crop" -> (imageCropQuery _),
    "q186_weekday_zscore" -> (weekdayZscoreQuery _),
    "q187_benford_audit" -> (benfordQuery _),
    "q188_funnel_latency" -> (funnelLatencyQuery _),
    "q189_weekly_retention" -> (weeklyRetentionQuery _),
    "q190_fulfillment_latency" -> (fulfillmentLatencyQuery _),
    "q191_cube" -> (cubeQuery _),
    "q192_session_depth" -> (sessionDepthQuery _),
    "q193_wow_metrics" -> (wowQuery _),
    "q194_cohort_funnel" -> (cohortFunnelQuery _),
    "q195_ab_test" -> (abTestQuery _),
    "q196_revenue_pareto" -> (revenueParetoQuery _),
    "q197_schema_drift" -> (schemaDriftQuery _),
    "q198_dedup_threshold_sweep" -> (dedupThresholdSweep _),
    "q199_ks_drift" -> (ksDriftQuery _),
    "q200_health_report" -> (healthReportQuery _),
    "q201_heavy_hitters" -> (heavyHittersQuery _),
    "q202_image_resize" -> (imageResizeQuery _),
    "q203_contribution" -> (contributionQuery _),
    "q204_chi_square" -> (chiSquareQuery _),
    "q205_dup_triangles" -> (dupGraphTriangles _),
    "q206_audio_trim" -> (audioTrimQuery _),
    "q207_cross_correlation" -> (crossCorrQuery _),
    "q208_audience_overlap" -> (audienceOverlapQuery _),
    "q209_ewma_baseline" -> (ewmaQuery _),
    "q210_mann_whitney" -> (mannWhitneyQuery _),
    "q211_kl_divergence" -> (klDivergenceQuery _),
    "q212_streaming_ewma" -> (streamingEwmaQuery _),
    "q213_spearman" -> (spearmanQuery _),
    "q214_qq_table" -> (qqTableQuery _),
    "q215_peak_concurrency" -> (peakConcurrencyQuery _),
    "q216_winsorize" -> (winsorizeQuery _),
    "q217_scene_changes" -> (sceneChangeQuery _),
    "q218_pettitt" -> (pettittQuery _),
    "q219_fd_audit" -> (fdAuditQuery _),
    "q220_readability" -> (readabilityQuery _),
    "q221_behavioral_diversity" -> (diversityQuery _),
    "q222_frequency_response" -> (frequencyQuery _),
    "q223_agg_consistency" -> (aggConsistencyQuery _),
    "q224_densify_days" -> (densifyQuery _),
    "q225_triangles_capped" -> (dupTrianglesCapped _),
    "q226_holt" -> (holtQuery _),
    "q227_top_pc" -> (topPcQuery _),
    "q228_cohort_ltv" -> (cohortLtvQuery _),
    "q229_time_decay_attribution" -> (timeDecayQuery _),
    "q230_next_event_accuracy" -> (nextEventQuery _),
    "q231_classification_report" -> (classReportQuery _),
    "q232_forecast_backtest" -> (forecastBacktestQuery _),
    "q233_kaplan_meier" -> (kaplanMeierQuery _),
    "q234_run_import_json" -> (runImportJsonE2E _),
    "q235_fixture_stats" -> (fixtureStatsQuery _))

  /** SQL VALUES list of the MinHash coefficients — generated from the
    * same Scala constants the operators use. */
  private def minHashCoeffsSql(numHashes: Int): String =
    graft.operators.TextDedup.minHashCoeffs(numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  /** Shared q158/q159 oracle fragment: the BPE merge chain unrolled
    * from the SAME literal table the Spark plan folds (the
    * minHashCoeffsSql pattern — one constant list drives both sides).
    * DuckDB's `replace` shares Java's left-to-right non-overlap scan,
    * and the double-separator wrapping makes that exactly BPE's
    * leftmost pair pass (see TextAnalysis.bpeEncode). `inner` is the
    * text expression to encode. */
  private def bpeChainSql(inner: String): String = {
    def w(t: String) = s"chr(1) || '$t' || chr(1)"
    graft.operators.TextAnalysis.defaultBpeMerges.foldLeft(
      s"regexp_replace($inner, '([^ ])', chr(1) || '\\1' || chr(1), 'g')") {
      case (acc, (x, y)) => s"replace($acc, ${w(x)} || ${w(y)}, ${w(x + y)})"
    }
  }

  /** q160/q161 oracle fragment: the BPE TRAINING rounds unrolled
    * mechanically (the kmeansCtesSql pattern). Round i CTEs: `tk$i`
    * segments the frequency-weighted vocab under the merges so far,
    * `pr$i` counts adjacent pairs weighted by word frequency, `m$i`
    * is the (count DESC, l, r) argmax, `r$i` applies it. The learned
    * table lives in m1..m$rounds. */
  private def bpeTrainCtesSql(rounds: Int): String = {
    def round(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""tk$i AS (SELECT string_split(trim(enc, chr(1)), chr(1) || chr(1)) AS tk, n
                   FROM $prev),
         pr$i AS (SELECT tk[j] AS l, tk[j + 1] AS r, CAST(sum(n) AS BIGINT) AS np
                  FROM tk$i, UNNEST(range(1, len(tk))) AS u(j) GROUP BY 1, 2),
         m$i AS (SELECT CAST($i AS BIGINT) AS mrank, l, r, np
                 FROM pr$i ORDER BY np DESC, l, r LIMIT 1),
         r$i AS (SELECT replace(enc, chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
                                chr(1) || m.l || m.r || chr(1)) AS enc, n
                 FROM $prev, m$i m)"""
    }
    s"""v AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
               SELECT unnest(string_split(text, ' ')) AS word FROM documents) z
             WHERE word <> '' GROUP BY word),
       r0 AS (SELECT regexp_replace(word, '(.)', chr(1) || '\\1' || chr(1), 'g') AS enc, n
              FROM v),
       ${(1 to rounds).map(round).mkString(",\n       ")}"""
  }

  /** q158/q159 shared token-list CTE body over `documents`. */
  private def bpeToksSql: String =
    s"""e AS (SELECT doc_id, ${bpeChainSql("text")} AS enc FROM documents),
        tk AS (SELECT doc_id,
                      list_filter(string_split(
                        replace(replace(enc, chr(1) || chr(1), ' '), chr(1), ''),
                        ' '), x -> x <> '') AS toks
               FROM e)"""

  /** Shared oracle fragment: MinHash + banded LSH candidate pairs with
    * the bucket-size guard — mirrors TextDedup.lshCandidatePairs over
    * any `w(doc_id, word)` shingle CTE. Buckets over 100 docs are
    * refined by the exact shingle-set hash, exactly like the Spark
    * side. */
  private def lshPairsSqlOverShingles(
      wCte: String, numHashes: Int = 64, rowsPerBand: Int = 16,
      pairPred: String = "a.doc_id < b.doc_id"): String =
    s"""w AS ($wCte),
       hb AS (SELECT doc_id,
                     ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS h
              FROM w),
       hs AS (SELECT doc_id, c.i AS i,
                     MIN((h * c.a + c.b) % 2147483647) AS sig
              FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(numHashes)}) AS c(i, a, b)
              GROUP BY doc_id, c.i),
       sk AS (SELECT doc_id, md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)) AS setkey
              FROM (SELECT DISTINCT doc_id, h FROM hb) GROUP BY doc_id),
       bands AS (SELECT doc_id, i // $rowsPerBand AS band,
                        string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                 FROM hs GROUP BY doc_id, (i // $rowsPerBand)),
       bsz AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
       rb AS (SELECT b.doc_id, b.band,
                     CASE WHEN s.n <= 100 THEN b.key
                          ELSE b.key || '!' || k.setkey END AS key
              FROM bands b JOIN bsz s USING (band, key) JOIN sk k USING (doc_id)),
       pairs AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                 FROM rb a JOIN rb b
                   ON a.band = b.band AND a.key = b.key AND $pairPred)"""

  /** Word-set shingles over a docs relation (the default shingler). */
  private def minHashPairsSqlOver(docs: String): String =
    lshPairsSqlOverShingles(
      s"""SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
          FROM $docs""")

  /** The q131/q135 URL-variant derivation (4 variants per page id). */
  private val urlVariantSql: String =
    """CASE doc_id % 4
             WHEN 0 THEN 'https://www.example.com/d/' || CAST(doc_id // 4 AS VARCHAR) || '?b=2&a=1'
             WHEN 1 THEN 'HTTPS://EXAMPLE.COM:443/d/' || CAST(doc_id // 4 AS VARCHAR) || '/?a=1&b=2'
             WHEN 2 THEN 'https://example.com/d/' || CAST(doc_id // 4 AS VARCHAR) || '?utm_source=feed&b=2&fbclid=x&a=1'
             ELSE 'https://www.example.com:443/d/' || CAST(doc_id // 4 AS VARCHAR) || '/?a=1&utm_campaign=z&b=2#frag'
           END"""

  /** URL canonicalization CTE block — expects a CTE `u(doc_id, url)`,
    * yields `canon(doc_id, url)`; mirrors TextDedup.normalizeUrl. */
  private val urlCanonSqlCtes: String =
    """n AS (SELECT doc_id,
                 lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 1)) AS scheme,
                 regexp_replace(lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 2)), '^www\.', '') AS auth0,
                 regexp_replace(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 3), '/+$', '') AS path,
                 regexp_replace(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 4), '^\?', '') AS q
               FROM u),
         n2 AS (SELECT doc_id, scheme,
                  CASE WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
                       WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '')
                       ELSE auth0 END AS auth,
                  path,
                  list_sort(list_filter(string_split(q, '&'),
                    x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)=')
                         AND x <> '')) AS ps
                FROM n),
         canon AS (SELECT doc_id,
                     scheme || '://' || auth || path ||
                     CASE WHEN len(ps) > 0
                          THEN '?' || array_to_string(ps, '&')
                          ELSE '' END AS url
                   FROM n2)"""

  /** The q134/q135 HTML page shell around (source, text). */
  private val htmlShellSql: String =
    """'<html><head><title>T</title><style type="text/css">p{x:1}</style>'
           || '<script>if (a &amp;&amp; b) { f(); }</script></head><body><h1>'
           || source || '</h1><!-- hidden --><p class="main">' || text
           || '</p><p>Q &amp; A &lt;tag&gt; &quot;x&quot; &#39;y&#39;&nbsp;z &amp;lt;esc&gt;</p></body></html>'"""

  /** TextAnalysis.stripHtml mirrored as one SQL expression over `x`. */
  private def stripHtmlSql(x: String): String = {
    val tags =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($x,
             '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
             '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
             '(?s)<!--.*?-->', ' ', 'g'),
             '(?s)<[^>]+>', ' ', 'g')"""
    val ent =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace($tags,
             '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
             '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')"""
    s"""trim(regexp_replace($ent, '\\s+', ' ', 'g'))"""
  }

  /** Shared CTE block for the near-dup component pipeline over the
    * documents table (exact-dedup survivors → LSH candidates → exact
    * Jaccard gate ≥ 0.5 → connected components) — the q34/q57 stages
    * that q105, q116 and q130 all build on; ends with
    * `comp(d, label)`. Callers embed inside `WITH RECURSIVE …`. */
  private def nearDupComponentsSql: String =
    s"""kmin AS (SELECT MIN(doc_id) AS doc_id FROM documents
                                  GROUP BY lower(trim(text))),
         sdocs AS (SELECT d.* FROM documents d JOIN kmin USING (doc_id)),
         ${minHashPairsSqlOver("sdocs")},
         hws AS (SELECT doc_id,
                        list_distinct(list_transform(
                          list_distinct(string_split(lower(trim(text)), ' ')),
                          w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)) AS ws
                 FROM sdocs),
         gp AS (SELECT p.a, p.b FROM pairs p
                JOIN hws wa ON wa.doc_id = p.a
                JOIN hws wb ON wb.doc_id = p.b
                WHERE round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
                            CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE), 6)
                      >= 0.5),
         ed AS (SELECT a AS src, b AS dst FROM gp UNION SELECT b, a FROM gp),
         reach(d, r) AS (
           SELECT src AS d, src AS r FROM ed
           UNION
           SELECT ed.src AS d, reach.r FROM ed JOIN reach ON ed.dst = reach.d),
         comp AS (SELECT d, MIN(r) AS label FROM reach GROUP BY d)"""

  private lazy val minHashPairsSql: String = minHashPairsSqlOver("documents")

  /** Ordered double dot product over the first n dims — mirrors
    * graft_array_dot's left-to-right summation. */
  /** Shared oracle fragment: the q142 JL sign projection — md5-parity
    * ±1 per (j, d), one double dot per output coordinate cast to
    * FLOAT, mirroring Similarity.jlProject bit-for-bit. */
  private def jlProjSql(vecExpr: String, outDims: Int, dims: Int): String =
    s"""list_transform(range($outDims), j ->
          CAST(list_sum(list_transform(range($dims), d ->
            (CASE WHEN ('0x' || substr(md5('jl-' || j || '-' || d), 1, 15))::BIGINT % 2 = 1
                  THEN 1.0 ELSE -1.0 END)
            * $vecExpr[CAST(d + 1 AS INTEGER)]::DOUBLE)) AS FLOAT))"""

  private def dotSqlN(va: String, vb: String, n: Int): String =
    s"""list_sum(list_transform(range($n), d ->
         $va[CAST(d + 1 AS INTEGER)]::DOUBLE * $vb[CAST(d + 1 AS INTEGER)]::DOUBLE))"""

  /** Shared oracle fragment: rounded cosine between two 64-dim FLOAT[]
    * columns — same double math and summation order as Similarity. */
  private def cosSql(va: String, vb: String): String =
    s"""round(
         list_sum(list_transform(range(64), d ->
           $va[CAST(d + 1 AS INTEGER)]::DOUBLE * $vb[CAST(d + 1 AS INTEGER)]::DOUBLE)) /
         (sqrt(list_sum(list_transform($va, x -> x::DOUBLE * x::DOUBLE))) *
          sqrt(list_sum(list_transform($vb, x -> x::DOUBLE * x::DOUBLE)))), 6)"""

  /** Headline bench set: the analytics + LLM-operator queries (compute
    * throughput) plus one end-to-end CSV ingest. The write-protocol
    * pipelines (q11-q18) are correctness-gated in Verify but excluded
    * here — they measure per-day write orchestration (hundreds of tiny
    * local jobs), not operator throughput. */
  val benchQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q02_daily_active_users", "q03_sampling_tiers",
    "q04_multi_device_7d", "q05_session_metadata", "q06_revenue_by_nation",
    "q07_customers_without_orders", "q08_exact_dedup",
    "q09_day_store_lifecycle", "q10_csv_ingest_sanitize",
    "q19_lexical_inverted_topk",
    "q20_exact_dedup_rows", "q21_minhash_lsh_pairs", "q22_simhash_pairs",
    "q23_ngram_jaccard_topk", "q24_embedding_neardup",
    "q25_ann_bruteforce_topk", "q26_ann_lsh_recall", "q27_lang_id",
    "q28_quality_scores", "q29_token_stats", "q30_fingerprints",
    "q31_multimodal_features", "q32_minhash_char_shingles",
    "q33_embedding_neardup_bucketed", "q34_neardup_components",
    "q35_session_windows", "q36_sql_api_norms", "q37_value_percentiles",
    "q38_doc_rollup", "q43_asof_prev_view", "q44_kmv_distinct",
    "q45_tfidf_top_terms", "q47_contamination_scan",
    "q48_quality_percentile_filter", "q49_ann_topk_agg",
    "q50_ivf_ann", "q51_stratified_sample", "q52_domain_cap",
    "q53_repetition_signals", "q54_pii_redact", "q55_range_join_windows",
    "q56_lsh_incremental", "q57_neardup_dedup_dataset",
    "q59_ivf_lloyd_recall", "q60_bloom_incremental_dedup",
    "q61_doc_chunking", "q62_bpe_pair_counts", "q63_pq_ann",
    "q64_json_ingest", "q66_curation_gate", "q67_unigram_surprisal",
    "q68_hybrid_search", "q69_decontaminate", "q70_ivf_pq_ann",
    "q71_bloom_sharded_dedup", "q72_bm25_topk", "q73_semantic_dedup",
    "q74_exact_sample", "q75_sequence_packing", "q76_hybrid_search_3way",
    "q77_multimodal_audio", "q78_corpus_overlap", "q79_sq_ann",
    "q80_line_dedup", "q81_dup_ngrams", "q82_char_entropy",
    "q83_hashed_quality", "q84_shuffle_assign", "q85_audio_frames",
    "q86_stratified_sample", "q87_bigram_surprisal", "q88_filtered_ann",
    "q89_ivf_sq_ann", "q90_mixture_plan", "q91_ivf_audit",
    "q93_winnowing", "q94_packing_split", "q95_training_manifest",
    "q96_semantic_contamination", "q97_data_card",
    "q98_snapshot_diff", "q99_matryoshka_ann", "q100_length_buckets",
    "q101_containment_pairs", "q102_score_calibration",
    "q103_lsh_index_delta", "q104_signal_correlations",
    "q105_neardup_keep_best", "q106_contamination_spans",
    "q107_upsample", "q108_zipf_audit", "q109_ranking_metrics",
    "q110_rare_token_scrub", "q111_centroid_drift",
    "q112_dup_span_scrub", "q113_dsir_weights",
    "q114_ccnet_buckets", "q115_budget_select",
    "q116_leakage_split", "q117_centroid_outliers",
    "q118_char_class_signals", "q119_template_grams",
    "q120_funnel", "q121_cohort_retention", "q122_transition_matrix",
    "q123_trailing_zscore", "q124_cooccurrence_topk", "q125_data_profile",
    "q126_semdedup_capped", "q127_band_index_nightly",
    "q128_hash_index_nightly", "q129_weighted_neardup",
    "q130_curation_composed", "q131_url_dedup",
    "q133_vector_index_nightly", "q134_html_extract",
    "q135_web_ingest", "q136_export_manifest", "q137_histogram",
    "q138_kmeans_fit", "q139_covariance_stats", "q140_key_skew_audit",
    "q141_card_nightly", "q142_jl_ann", "q143_vocab_coverage",
    "q144_covariance_nightly", "q145_cluster_size_histogram",
    "q146_retrained_index", "q147_sax_words", "q149_cusum_changepoint",
    "q150_theil_sen_trend", "q151_autocorrelation", "q152_multiprobe_ann",
    "q153_attribution", "q154_mad_outliers", "q155_conversion_latency",
    "q156_skew_join", "q157_nightly_tick",
    "q158_bpe_encode", "q159_bpe_budget_select",
    "q160_bpe_train", "q161_bpe_trained_encode",
    "q162_salted_agg", "q163_join_cardinality", "q164_top_paths",
    "q165_scd2_merge", "q166_windowed_funnel", "q167_video_frame_sample",
    "q169_exact_percentiles", "q170_key_entropy",
    "q171_fk_integrity", "q172_key_gini",
    "q173_weekday_seasonality", "q174_event_gaps",
    "q175_linear_attribution", "q176_stationary_distribution",
    "q177_weighted_sample", "q178_bpe_fertility", "q179_k_anonymity",
    "q181_equi_depth_histogram", "q182_key_stats_nightly",
    "q183_edit_distance_join", "q184_stickiness", "q185_image_crop",
    "q186_weekday_zscore", "q187_benford_audit", "q188_funnel_latency",
    "q189_weekly_retention", "q190_fulfillment_latency", "q191_cube",
    "q192_session_depth", "q193_wow_metrics", "q194_cohort_funnel",
    "q195_ab_test", "q196_revenue_pareto", "q197_schema_drift",
    "q198_dedup_threshold_sweep", "q199_ks_drift", "q200_health_report",
    "q201_heavy_hitters", "q202_image_resize", "q203_contribution",
    "q204_chi_square", "q205_dup_triangles", "q206_audio_trim",
    "q207_cross_correlation", "q208_audience_overlap",
    "q209_ewma_baseline", "q210_mann_whitney", "q211_kl_divergence",
    "q213_spearman", "q214_qq_table", "q215_peak_concurrency",
    "q216_winsorize", "q217_scene_changes", "q218_pettitt",
    "q219_fd_audit", "q220_readability", "q221_behavioral_diversity",
    "q222_frequency_response", "q223_agg_consistency",
    "q224_densify_days", "q225_triangles_capped", "q226_holt",
    "q227_top_pc", "q228_cohort_ltv", "q229_time_decay_attribution",
    "q230_next_event_accuracy", "q231_classification_report",
    "q232_forecast_backtest", "q233_kaplan_meier",
    // q234 joins q41 in the write-path exclusion (bench measures
    // engine plans, not tmp-dir file IO); q235 is compute-only
    "q235_fixture_stats")

  /** Shared q166/q168 oracle: the batch windowed funnel and its
    * streaming stateful replay must produce the SAME per-step rows
    * (the q120/q148 twin contract under per-step deadlines). */
  private val windowedFunnelOracleSql: String =
    """WITH e AS (SELECT user_id AS u,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                         event_type AS typ
                  FROM events),
       c0 AS (SELECT u, min(sec) AS m0 FROM e WHERE typ = 'signup' GROUP BY u),
       c1 AS (SELECT e.u, min(sec) AS m1 FROM e JOIN c0 USING (u)
              WHERE typ = 'view' AND sec > m0 AND sec <= m0 + 172800
              GROUP BY e.u),
       c2 AS (SELECT e.u, min(sec) AS m2 FROM e JOIN c1 USING (u)
              WHERE typ = 'click' AND sec > m1 AND sec <= m1 + 172800
              GROUP BY e.u),
       c3 AS (SELECT e.u, min(sec) AS m3 FROM e JOIN c2 USING (u)
              WHERE typ = 'purchase' AND sec > m2 AND sec <= m2 + 172800
              GROUP BY e.u),
       n AS (SELECT (SELECT count(*) FROM c0) AS n0,
                    (SELECT count(*) FROM c1) AS n1,
                    (SELECT count(*) FROM c2) AS n2,
                    (SELECT count(*) FROM c3) AS n3)
       SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
              CAST(CASE WHEN n0 > 0 THEN n_users * 1000000 // n0 END
                   AS BIGINT) AS conversion_ppm
       FROM (SELECT 0 AS step_idx, 'signup' AS step, n0 AS n_users, n0 FROM n
             UNION ALL SELECT 1, 'view', n1, n0 FROM n
             UNION ALL SELECT 2, 'click', n2, n0 FROM n
             UNION ALL SELECT 3, 'purchase', n3, n0 FROM n)
       ORDER BY step_idx"""

  /** Shared q120/q148 oracle: the batch funnel and the streaming
    * stateful replay must produce the SAME per-step rows. */
  private val funnelOracleSql: String =
    """WITH m AS (SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'signup') AS m0,
               min(ts) FILTER (WHERE event_type = 'view') AS m1,
               min(ts) FILTER (WHERE event_type = 'click') AS m2,
               min(ts) FILTER (WHERE event_type = 'purchase') AS m3
             FROM events GROUP BY user_id),
         c AS (SELECT
               count(*) FILTER (WHERE m0 IS NOT NULL) AS c0,
               count(*) FILTER (WHERE m0 IS NOT NULL AND m0 < m1) AS c1,
               count(*) FILTER (WHERE m0 IS NOT NULL AND m0 < m1
                                  AND m1 < m2) AS c2,
               count(*) FILTER (WHERE m0 IS NOT NULL AND m0 < m1
                                  AND m1 < m2 AND m2 < m3) AS c3
             FROM m),
         s(step_idx, step) AS (VALUES (1, 'signup'), (2, 'view'),
                                      (3, 'click'), (4, 'purchase')),
         l AS (SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
                      CAST(CASE step_idx WHEN 1 THEN c0 WHEN 2 THEN c1
                           WHEN 3 THEN c2 ELSE c3 END AS BIGINT) AS n_users,
                      CAST(c0 AS BIGINT) AS base
               FROM c CROSS JOIN s)
         SELECT step_idx, step, n_users,
                CASE WHEN base > 0 THEN n_users * 1000000 // base END
                  AS conversion_ppm
         FROM l ORDER BY step_idx"""

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_daily_active_users" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day, COUNT(DISTINCT user_id) AS dau, COUNT(*) AS n_events
         FROM events GROUP BY 1 ORDER BY 1""",
    "q03_sampling_tiers" ->
      """WITH c AS (SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 100 AS cohort
           FROM events)
         SELECT COUNT(CASE WHEN cohort < 10 THEN 1 END) AS events_t10,
                COUNT(CASE WHEN cohort < 50 THEN 1 END) AS events_t50,
                COUNT(*) AS events_t100,
                COUNT(DISTINCT CASE WHEN cohort < 10 THEN user_id END) AS users_t10,
                COUNT(DISTINCT CASE WHEN cohort < 50 THEN user_id END) AS users_t50,
                COUNT(DISTINCT user_id) AS users_t100
         FROM c""",
    "q04_multi_device_7d" ->
      """WITH activity AS (SELECT DISTINCT ts::DATE AS day, user_id, event_type FROM events),
         pairs AS (
           SELECT DISTINCT present.day, present.user_id,
                  present.event_type AS type_now, past.event_type AS type_prev
           FROM activity present JOIN activity past
             ON present.user_id = past.user_id
            AND present.event_type <> past.event_type
            AND past.day <= present.day
            AND past.day >= present.day - INTERVAL 7 DAY)
         SELECT CAST(day AS VARCHAR) AS day, COUNT(*) AS n_pairs, COUNT(DISTINCT user_id) AS n_users
         FROM pairs GROUP BY 1 ORDER BY 1""",
    "q05_session_metadata" ->
      """WITH meta AS (
           SELECT user_id, MIN(ts) AS began_at FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
         folded AS (
           SELECT e.user_id, COUNT(*) AS n_events, MAX(e.ts) AS last_ts,
                  MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
           FROM events e JOIN meta m ON e.user_id = m.user_id
           WHERE e.ts::DATE BETWEEN m.began_at::DATE AND m.began_at::DATE + INTERVAL 1 DAY
             AND e.ts >= m.began_at
           GROUP BY e.user_id)
         SELECT m.user_id, m.began_at,
                date_diff('millisecond', m.began_at, f.last_ts) AS duration_ms,
                f.n_events, f.has_purchase = 1 AS completed
         FROM meta m LEFT JOIN folded f ON m.user_id = f.user_id
         ORDER BY m.user_id""",
    "q06_revenue_by_nation" ->
      """SELECT n_name AS nation,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name ORDER BY nation""",
    "q07_customers_without_orders" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_customers
         FROM customer WHERE NOT EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
         GROUP BY 1 ORDER BY 1""",
    "q08_exact_dedup" ->
      """SELECT COUNT(*) AS n_docs, COUNT(DISTINCT lower(trim(text))) AS n_unique,
                COUNT(*) - COUNT(DISTINCT lower(trim(text))) AS n_dupes
         FROM documents""",
    "q09_day_store_lifecycle" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day, COUNT(*) AS n_events,
                COUNT(DISTINCT user_id) AS n_users
         FROM events
         WHERE ts::DATE >= (SELECT MAX(ts::DATE) - INTERVAL 20 DAY FROM events)
         GROUP BY 1 ORDER BY 1""",
    "q10_csv_ingest_sanitize" ->
      s"""WITH staging AS ($activityStagingSql)
         SELECT type, COUNT(*) AS n_rows, COUNT(DISTINCT uid) AS n_users,
                COUNT(CASE WHEN service = '' THEN 1 END) AS n_empty_service,
                COUNT(CASE WHEN length(substr(ua_browser, 1, 40)) = 40 THEN 1 END) AS n_truncated
         FROM staging GROUP BY type ORDER BY type""",
    "q11_activity_import_tiers" ->
      s"""WITH staging AS ($activityStagingSql),
         c AS (SELECT *, ('0x' || substr(uid, 1, 7))::BIGINT % 100 AS cohort,
                      (SELECT MAX(ts::DATE) FROM events) AS max_day
               FROM staging)
         SELECT CAST(day AS VARCHAR) AS day, COUNT(*) AS n_rows,
                COUNT(DISTINCT uid) AS n_users, 10 AS tier_pct
         FROM c WHERE cohort < 10 AND day >= max_day - INTERVAL 36 DAY GROUP BY day
         UNION ALL
         SELECT CAST(day AS VARCHAR), COUNT(*), COUNT(DISTINCT uid), 50
         FROM c WHERE cohort < 50 AND day >= max_day - INTERVAL 24 DAY GROUP BY day
         UNION ALL
         SELECT CAST(day AS VARCHAR), COUNT(*), COUNT(DISTINCT uid), 100
         FROM c WHERE cohort < 100 AND day >= max_day - INTERVAL 18 DAY GROUP BY day
         ORDER BY tier_pct, day""",
    "q12_flow_metadata_cascade" ->
      s"""WITH S AS ($flowStagingSql),
         P AS (SELECT MAX(day) AS max_day, MIN(day) AS min_day FROM S),
         X AS (SELECT s.* FROM S s CROSS JOIN P
               WHERE s.day >= P.max_day - INTERVAL 18 DAY AND s.type <> 'flow.begin'),
         E AS (SELECT * FROM X
               WHERE type NOT LIKE 'flow.continued.%' AND type NOT LIKE 'flow.experiment.%'),
         mx AS (SELECT flow_id, MIN(day) AS mx_day FROM X GROUP BY flow_id),
         me AS (SELECT flow_id, MIN(day) AS me_day FROM E GROUP BY flow_id),
         dsel AS (SELECT mx.flow_id,
                    GREATEST(P.min_day,
                      LEAST(mx.mx_day, COALESCE(me.me_day - 1, mx.mx_day))) AS d
                  FROM mx LEFT JOIN me USING (flow_id) CROSS JOIN P),
         counted AS (
           SELECT x.flow_id, x.flow_time, x.locale, x.uid
           FROM X x JOIN dsel USING (flow_id) WHERE x.day = dsel.d
           UNION ALL
           SELECT e.flow_id, e.flow_time, e.locale, e.uid
           FROM E e JOIN dsel USING (flow_id) WHERE e.day = dsel.d + 1),
         fold AS (SELECT flow_id, MAX(flow_time) AS f_time, MAX(locale) AS f_locale,
                         MAX(uid) AS f_uid
                  FROM counted GROUP BY flow_id),
         compl AS (SELECT DISTINCT flow_id FROM E WHERE type = 'flow.complete'),
         acct AS (SELECT DISTINCT flow_id FROM E WHERE type = 'account.created'),
         contd AS (SELECT flow_id, MIN(day) AS cmin, substr(MAX(type), 16, 64) AS cont
                   FROM X WHERE type LIKE 'flow.continued.%' GROUP BY flow_id),
         base AS (SELECT flow_id, make_timestamp("timestamp" * 1000000) AS begin_time,
                         context, utm_campaign, day AS export_date
                  FROM S WHERE type = 'flow.begin'),
         -- a metadata row inserted on begin-day b only receives updates
         -- from processings at days <= b (newest-first: older days run
         -- later); the backfill likewise only sees staging days <= b
         mcxrow AS (SELECT b2.flow_id, b2.export_date,
                           MAX(s.context) AS mx_context,
                           MAX(s.utm_campaign) AS mx_camp
                    FROM (SELECT DISTINCT flow_id, export_date FROM base) b2
                    JOIN S s ON s.flow_id = b2.flow_id AND s.day <= b2.export_date
                    GROUP BY b2.flow_id, b2.export_date)
         SELECT b.flow_id, b.begin_time,
           CASE WHEN ds.d IS NOT NULL AND ds.d <= b.export_date
                THEN f.f_time ELSE 0 END AS duration,
           (c.flow_id IS NOT NULL) AS completed,
           (a.flow_id IS NOT NULL) AS new_account,
           CASE WHEN b.context <> '' THEN b.context ELSE m.mx_context END AS context,
           CASE WHEN b.utm_campaign <> '' THEN b.utm_campaign ELSE m.mx_camp END AS utm_campaign,
           CASE WHEN ds.d IS NOT NULL AND ds.d <= b.export_date
                THEN f.f_locale END AS locale,
           CASE WHEN ds.d IS NOT NULL AND ds.d <= b.export_date
                THEN f.f_uid END AS uid,
           CASE WHEN d.cmin IS NOT NULL AND d.cmin <= b.export_date
                THEN d.cont END AS continued_from,
           CAST(b.export_date AS VARCHAR) AS export_date
         FROM base b
         LEFT JOIN dsel ds USING (flow_id)
         LEFT JOIN fold f USING (flow_id)
         LEFT JOIN compl c USING (flow_id)
         LEFT JOIN acct a USING (flow_id)
         LEFT JOIN contd d USING (flow_id)
         LEFT JOIN mcxrow m ON m.flow_id = b.flow_id AND m.export_date = b.export_date
         CROSS JOIN P
         WHERE b.export_date >= P.max_day - INTERVAL 18 DAY
         ORDER BY b.flow_id, b.begin_time""",
    "q13_flow_experiments" ->
      s"""WITH S AS ($flowStagingSql),
         P AS (SELECT MAX(day) AS max_day FROM S)
         SELECT split_part(type, '.', 3) AS experiment,
                split_part(type, '.', 4) AS cohort,
                make_timestamp("timestamp" * 1000000) AS timestamp,
                flow_id, uid, CAST(day AS VARCHAR) AS export_date
         FROM S CROSS JOIN P
         WHERE type LIKE 'flow.experiment.%'
           AND day >= P.max_day - INTERVAL 18 DAY
         ORDER BY flow_id, timestamp, experiment""",
    "q14_flow_events_absorbed" ->
      s"""WITH S AS ($flowStagingSql),
         P AS (SELECT MAX(day) AS max_day FROM S),
         C AS (SELECT s.*, ('0x' || substr(flow_id, 1, 7))::BIGINT % 100 AS cohort_pct
               FROM S s
               WHERE s.type <> 'flow.begin'
                 AND s.type NOT LIKE 'flow.continued.%'
                 AND s.type NOT LIKE 'flow.experiment.%')
         SELECT type, COUNT(*) AS n_rows, COUNT(DISTINCT flow_id) AS n_flows, 10 AS tier_pct
         FROM C CROSS JOIN P
         WHERE cohort_pct < 10 AND day >= P.max_day - INTERVAL 36 DAY GROUP BY type
         UNION ALL
         SELECT type, COUNT(*), COUNT(DISTINCT flow_id), 50
         FROM C CROSS JOIN P
         WHERE cohort_pct < 50 AND day >= P.max_day - INTERVAL 24 DAY GROUP BY type
         UNION ALL
         SELECT type, COUNT(*), COUNT(DISTINCT flow_id), 100
         FROM C CROSS JOIN P
         WHERE cohort_pct < 100 AND day >= P.max_day - INTERVAL 18 DAY GROUP BY type
         ORDER BY tier_pct, type""",
    "q15_daily_devices_rollup" ->
      s"""WITH staging AS ($activityStagingSql),
         P AS (SELECT MAX(day) AS max_day FROM staging)
         SELECT DISTINCT CAST(day AS VARCHAR) AS day, uid, device_id, service,
                substr(ua_browser, 1, 40) AS ua_browser, ua_version, ua_os
         FROM staging CROSS JOIN P
         WHERE device_id <> '' AND day >= P.max_day - INTERVAL 18 DAY
         ORDER BY day, uid, device_id, service""",
    "q16_multi_device_incremental" ->
      s"""WITH staging AS ($activityStagingSql),
         dev AS (SELECT DISTINCT day, uid, device_id FROM staging WHERE device_id <> ''),
         pairs AS (
           SELECT DISTINCT p.day, p.uid, p.device_id AS device_now, q.device_id AS device_prev
           FROM dev p JOIN dev q
             ON p.uid = q.uid AND p.device_id <> q.device_id
            AND q.day <= p.day AND q.day >= p.day - INTERVAL 7 DAY)
         SELECT CAST(day AS VARCHAR) AS day, COUNT(*) AS n_pairs,
                COUNT(DISTINCT uid) AS n_users
         FROM pairs GROUP BY 1 ORDER BY 1""",
    "q17_counts_import" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day,
                COUNT(DISTINCT user_id) AS accounts, COUNT(*) AS verified_accounts
         FROM events WHERE ts::DATE >= DATE '2024-01-10'
         GROUP BY 1 ORDER BY 1""",
    "q18_email_import_tiers" ->
      s"""WITH staging AS ($emailStagingSql),
         c AS (SELECT *,
                 CASE WHEN flow_id = '' THEN NULL
                      ELSE ('0x' || substr(flow_id, 1, 7))::BIGINT % 100 END AS cohort,
                 (SELECT MAX(ts::DATE) FROM events) AS max_day
               FROM staging)
         SELECT type, COUNT(*) AS n_rows, COUNT(DISTINCT flow_id) AS n_flows,
                COUNT(CASE WHEN bounced = 'true' THEN 1 END) AS n_bounced, 10 AS tier_pct
         FROM c WHERE cohort < 10 AND day >= max_day - INTERVAL 36 DAY GROUP BY type
         UNION ALL
         SELECT type, COUNT(*), COUNT(DISTINCT flow_id),
                COUNT(CASE WHEN bounced = 'true' THEN 1 END), 50
         FROM c WHERE cohort < 50 AND day >= max_day - INTERVAL 24 DAY GROUP BY type
         UNION ALL
         SELECT type, COUNT(*), COUNT(DISTINCT flow_id),
                COUNT(CASE WHEN bounced = 'true' THEN 1 END), 100
         FROM c WHERE cohort < 100 AND day >= max_day - INTERVAL 18 DAY GROUP BY type
         ORDER BY tier_pct, type""",
    // Inverted-index lexical retrieval: the oracle scores pairs by the
    // same overlap arithmetic (|A∩B| / (|A|+|B|−|A∩B|)) and keeps only
    // positive-overlap docs — the operator's retrieval contract (a doc
    // sharing no token is not a result, so the index never scores it).
    "q19_lexical_inverted_topk" ->
      """WITH qw AS (SELECT doc_id AS qid,
                            list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                     FROM documents WHERE doc_id < 20),
         cw AS (SELECT doc_id AS id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents WHERE doc_id >= 20),
         sc AS (SELECT q.qid, c.id,
                       len(list_intersect(q.ws, c.ws)) AS ov,
                       round(CAST(len(list_intersect(q.ws, c.ws)) AS DOUBLE) /
                             CAST(len(q.ws) + len(c.ws)
                                  - len(list_intersect(q.ws, c.ws)) AS DOUBLE), 6) AS jac
                FROM qw q CROSS JOIN cw c)
         SELECT qid, id, CAST(r AS BIGINT) AS r, jac FROM (
           SELECT qid, id, jac,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY jac DESC, id) AS r
           FROM sc WHERE ov > 0) t
         WHERE r <= 20 ORDER BY qid, r""",
    "q20_exact_dedup_rows" ->
      """WITH k AS (SELECT MIN(doc_id) AS doc_id FROM documents
                    GROUP BY lower(trim(text)))
         SELECT d.lang, d.source, COUNT(*) AS n_docs
         FROM documents d JOIN k USING (doc_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q21_minhash_lsh_pairs" ->
      s"""WITH $minHashPairsSql,
         e AS (SELECT a AS d FROM pairs UNION ALL SELECT b FROM pairs)
         SELECT (SELECT COUNT(*) FROM pairs) AS n_pairs,
                (SELECT COUNT(DISTINCT d) FROM e) AS n_docs""",
    "q22_simhash_pairs" ->
      """WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
                    FROM documents),
         h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM w),
         v AS (SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
               FROM h CROSS JOIN (SELECT unnest(range(60)) AS j) GROUP BY doc_id, j),
         sh AS (SELECT doc_id,
                       CAST(SUM(CASE WHEN vote > 0 THEN 1::BIGINT << CAST(j AS INTEGER)
                                     ELSE 0 END) AS BIGINT) AS simhash
                FROM v GROUP BY doc_id),
         ch AS (SELECT doc_id, k, (simhash >> CAST(k * 15 AS INTEGER)) & 32767 AS key
                FROM sh CROSS JOIN (SELECT unnest(range(4)) AS k)),
         p AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
               FROM ch a JOIN ch b
                 ON a.k = b.k AND a.key = b.key AND a.doc_id < b.doc_id),
         e AS (SELECT a AS d FROM p UNION ALL SELECT b FROM p)
         SELECT (SELECT COUNT(*) FROM p) AS n_pairs,
                (SELECT COUNT(DISTINCT d) FROM e) AS n_docs,
                (SELECT COUNT(DISTINCT simhash) FROM sh) AS n_distinct_hashes""",
    "q23_ngram_jaccard_topk" ->
      s"""WITH $minHashPairsSql,
         ws AS (SELECT doc_id, list_distinct(string_split(lower(trim(text)), ' ')) AS ws FROM documents)
         SELECT p.a, p.b,
                round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
                      CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE), 6) AS jac
         FROM pairs p
         JOIN ws wa ON wa.doc_id = p.a
         JOIN ws wb ON wb.doc_id = p.b
         ORDER BY jac DESC, p.a, p.b LIMIT 100""",
    "q24_embedding_neardup" ->
      s"""SELECT a.vec_id AS a, b.vec_id AS b,
                ${cosSql("a.embedding", "b.embedding")} AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4
         ORDER BY a, b""",
    "q25_ann_bruteforce_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         scored AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
                    FROM q JOIN c ON qid <> id)
         SELECT qid, rank, id, cos FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    "q26_ann_lsh_recall" ->
      s"""WITH vb AS (SELECT vec_id, b,
                list_sum(list_transform(range(64), d ->
                  embedding[CAST(d + 1 AS INTEGER)]::DOUBLE *
                  (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                        THEN 1.0 ELSE -1.0 END))) AS proj
              FROM embeddings CROSS JOIN (SELECT unnest(range(6)) AS b)),
         bk AS (SELECT vec_id,
                       CAST(SUM(CASE WHEN proj > 0 THEN 1::BIGINT << CAST(b AS INTEGER)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM vb GROUP BY vec_id),
         q AS (SELECT e.vec_id AS qid, e.embedding AS qvec, bk.bucket AS qbucket
               FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id WHERE e.vec_id < 20),
         c AS (SELECT e.vec_id AS id, e.embedding AS vec, bk.bucket
               FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id),
         exact AS (SELECT qid, id FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
             FROM q JOIN c ON qid <> id) t WHERE r <= 5),
         lsh AS (SELECT qid, id FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
             FROM q JOIN c ON qid <> id AND qbucket = bucket) t WHERE r <= 5),
         mates AS (SELECT qid, COUNT(*) AS n_mates
                   FROM q JOIN c ON qbucket = bucket AND qid <> id GROUP BY qid),
         hits AS (SELECT l.qid, COUNT(*) AS n_hits
                  FROM lsh l JOIN exact x ON l.qid = x.qid AND l.id = x.id GROUP BY l.qid)
         SELECT q.qid, COALESCE(m.n_mates, 0) AS n_mates, COALESCE(h.n_hits, 0) AS n_hits
         FROM q LEFT JOIN mates m ON q.qid = m.qid LEFT JOIN hits h ON q.qid = h.qid
         ORDER BY q.qid""",
    "q27_lang_id" ->
      """WITH s AS (SELECT lang, list_distinct(string_split(text, ' ')) AS ws FROM documents),
         sc AS (SELECT lang,
             len(list_intersect(ws, ['the','a','of','and','to'])) AS s_en,
             len(list_intersect(ws, ['der','die','das','und','ist'])) AS s_de,
             len(list_intersect(ws, ['el','la','los','y','es'])) AS s_es,
             len(list_intersect(ws, ['le','la','les','et','est'])) AS s_fr,
             len(list_intersect(ws, ['de','shi','zhe','he','bu'])) AS s_zh
           FROM s),
         p AS (SELECT lang, CASE
             WHEN s_en = g AND g > 0 THEN 'en'
             WHEN s_de = g AND g > 0 THEN 'de'
             WHEN s_es = g AND g > 0 THEN 'es'
             WHEN s_fr = g AND g > 0 THEN 'fr'
             WHEN s_zh = g AND g > 0 THEN 'zh'
             ELSE 'und' END AS predicted
           FROM (SELECT *, GREATEST(s_en, s_de, s_es, s_fr, s_zh) AS g FROM sc) t)
         SELECT lang, predicted, COUNT(*) AS n_docs
         FROM p GROUP BY 1, 2 ORDER BY 1, 2""",
    "q28_quality_scores" ->
      """SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
           CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
           CAST(SUM(len(list_filter(string_split(text, ' '),
             w -> list_contains(['the','a','of','and','to'], w)))) AS BIGINT) AS sum_stop,
           COUNT(CASE WHEN len(string_split(text, ' ')) >= 50
                       AND len(list_filter(string_split(text, ' '),
                         w -> list_contains(['the','a','of','and','to'], w))) * 10
                           >= len(string_split(text, ' '))
                 THEN 1 END) AS n_highq
         FROM documents GROUP BY source ORDER BY source""",
    "q29_token_stats" ->
      """WITH d AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
         a1 AS (SELECT lang,
             CAST(SUM(len(w)) AS BIGINT) AS total_words,
             CAST(SUM(list_sum(list_transform(w, x -> (length(x) + 3) // 4))) AS BIGINT)
               AS total_subwords,
             CAST(MAX(list_max(list_transform(w, x -> length(x)))) AS BIGINT) AS max_wlen
           FROM d GROUP BY lang),
         a2 AS (SELECT lang, COUNT(DISTINCT word) AS n_distinct_words
                FROM (SELECT lang, unnest(w) AS word FROM d) t GROUP BY lang)
         SELECT a1.lang, a1.total_words, a1.total_subwords, a1.max_wlen,
                a2.n_distinct_words
         FROM a1 JOIN a2 USING (lang) ORDER BY a1.lang""",
    "q30_fingerprints" ->
      """SELECT doc_id,
           list_min(list_transform(list_distinct(string_split(text, ' ')),
             w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)) AS fp_min,
           CAST(list_sum(list_transform(list_distinct(string_split(text, ' ')),
             w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 1048576)) AS BIGINT) AS fp_sum,
           list_reduce(list_prepend(0::BIGINT,
             list_transform((string_split(text, ' '))[1:8],
               w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 1000000007)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fp_roll
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    // Recomputes what the PPM decoder extracts: dimensions from the
    // byte length (the encoder's derivation), total media size =
    // header + raster, and the raster checksum = byte sum of the
    // doc's leading min(strlen, w*h*3) bytes (the zero padding adds 0).
    "q31_multimodal_features" ->
      """WITH m AS (SELECT doc_id, text,
             strlen(text) % 13 + 2 AS w,
             strlen(text) % 7 + 2 AS h
           FROM documents)
         SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(strlen('P6' || chr(10) || CAST(w AS VARCHAR) || ' ' ||
                       CAST(h AS VARCHAR) || chr(10) || '255' || chr(10))
                + w * h * 3 AS BIGINT) AS byte_len,
           CAST(COALESCE(list_sum(list_transform(
                  range(1, LEAST(w * h * 3, strlen(text)) + 1),
                  i -> ord(substr(text, CAST(i AS INTEGER), 1)))), 0)
                AS BIGINT) AS px_checksum
         FROM m ORDER BY doc_id""",
    "q32_minhash_char_shingles" ->
      s"""WITH ${lshPairsSqlOverShingles(
             """SELECT doc_id, unnest(list_distinct(list_transform(
                  range(1, greatest(length(lower(trim(text))) - 7, 1) + 1),
                  i -> substr(lower(trim(text)), CAST(i AS INTEGER), 8)))) AS word
                FROM documents""", numHashes = 32, rowsPerBand = 8)},
         e AS (SELECT a AS d FROM pairs UNION ALL SELECT b FROM pairs)
         SELECT (SELECT COUNT(*) FROM pairs) AS n_pairs,
                (SELECT COUNT(DISTINCT d) FROM e) AS n_docs""",
    "q33_embedding_neardup_bucketed" ->
      s"""WITH vb AS (SELECT vec_id, b,
                list_sum(list_transform(range(64), d ->
                  embedding[CAST(d + 1 AS INTEGER)]::DOUBLE *
                  (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                        THEN 1.0 ELSE -1.0 END))) AS proj
              FROM embeddings CROSS JOIN (SELECT unnest(range(4)) AS b)),
         bk AS (SELECT vec_id,
                       CAST(SUM(CASE WHEN proj > 0 THEN 1::BIGINT << CAST(b AS INTEGER)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM vb GROUP BY vec_id),
         e AS (SELECT emb.vec_id, emb.embedding, bk.bucket
               FROM embeddings emb JOIN bk ON emb.vec_id = bk.vec_id),
         bp AS (SELECT COUNT(*) AS n_pairs_bucketed
                FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.bucket = b.bucket
                WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4),
         ep AS (SELECT COUNT(*) AS n_pairs_exact
                FROM e a JOIN e b ON a.vec_id < b.vec_id
                WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4)
         SELECT bp.n_pairs_bucketed, ep.n_pairs_exact FROM bp CROSS JOIN ep""",
    "q34_neardup_components" ->
      s"""WITH RECURSIVE kmin AS (SELECT MIN(doc_id) AS doc_id FROM documents
                                  GROUP BY lower(trim(text))),
         sdocs AS (SELECT d.* FROM documents d JOIN kmin USING (doc_id)),
         ${minHashPairsSqlOver("sdocs")},
         ed AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         reach(d, r) AS (
           SELECT src AS d, src AS r FROM ed
           UNION
           SELECT ed.src AS d, reach.r FROM ed JOIN reach ON ed.dst = reach.d),
         comp AS (SELECT d, MIN(r) AS label FROM reach GROUP BY d),
         sizes AS (SELECT label, COUNT(*) AS csize FROM comp GROUP BY label)
         SELECT COUNT(*) AS n_components, MAX(csize) AS max_component,
                CAST(SUM(csize) AS BIGINT) AS n_docs_in_pairs FROM sizes""",
    "q35_session_windows" ->
      """WITH m AS (SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         g AS (SELECT user_id,
                      SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM m),
         sess AS (SELECT user_id, sid, COUNT(*) AS n_events FROM g GROUP BY 1, 2)
         SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events,
                CAST(SUM(n_events) AS BIGINT) AS n_events
         FROM sess GROUP BY 1 ORDER BY 1""",
    "q36_sql_api_norms" ->
      """SELECT vec_id, label,
                round(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), 6) AS sqnorm
         FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""",
    "q37_value_percentiles" ->
      """SELECT event_type,
                quantile_cont(value, 0.5) AS p50,
                quantile_cont(value, 0.9) AS p90,
                quantile_cont(value, 0.99) AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q38_doc_rollup" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY ROLLUP (lang, source)
         ORDER BY lang, source""",
    "q39_pad_policy_ingest" ->
      s"""WITH staging AS ($activityStagingSql),
         base AS (
           SELECT type, COUNT(*) AS n_rows,
                  COUNT(CASE WHEN uid = '' THEN 1 END) AS n_empty_uid,
                  COUNT(CASE WHEN device_id = '' THEN 1 END) AS n_empty_device
           FROM staging GROUP BY type),
         -- the three appended lines after padding to 8 fields:
         -- 2-field  -> type '', uid '',      device_id ''
         -- 5-field  -> type '', uid paduid,  device_id ''
         -- 8-field  -> type padtype, uid paduid, device_id paddev
         pads AS (SELECT * FROM (VALUES
           ('', 2, 1, 2), ('padtype', 1, 0, 0))
           AS t(type, n_rows, n_empty_uid, n_empty_device))
         SELECT type, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
                CAST(SUM(n_empty_uid) AS BIGINT) AS n_empty_uid,
                CAST(SUM(n_empty_device) AS BIGINT) AS n_empty_device
         FROM (SELECT * FROM base UNION ALL SELECT * FROM pads)
         GROUP BY type ORDER BY type""",
    "q40_compaction_lifecycle" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day,
                CAST(6 AS BIGINT) AS files_before,
                CAST(2 AS BIGINT) AS files_after,
                COUNT(*) AS n_events,
                COUNT(DISTINCT user_id) AS n_users,
                CAST(SUM(event_id) AS BIGINT) AS sum_event_id
         FROM events WHERE ts::DATE = DATE '2024-01-15'
         GROUP BY 1 ORDER BY 1""",
    "q41_run_import_e2e" -> runImportOracleSql,
    "q234_run_import_json" -> runImportOracleSql,
    "q42_value_percentiles_approx" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50_exact,
                true AS approx_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q43_asof_prev_view" ->
      """WITH u AS (
           SELECT user_id, ts, event_id, 1 AS side,
                  NULL::BIGINT AS r_event_id, NULL::TIMESTAMP AS r_ts
           FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, ts, event_id, 0, event_id, ts
           FROM events WHERE event_type = 'view'),
         w AS (
           SELECT *,
             last_value(r_event_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_event_id,
             last_value(r_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
           FROM u)
         SELECT user_id, event_id, ts, view_event_id,
                epoch_ms(ts) // 1000 - epoch_ms(view_ts) // 1000 AS gap_sec
         FROM w WHERE side = 1 AND user_id < 30 ORDER BY event_id""",
    "q44_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM events),
         r AS (SELECT event_type, h,
                      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
                      COUNT(*) OVER (PARTITION BY event_type) AS nd
               FROM h),
         k AS (SELECT event_type, MIN(nd) AS nd,
                      MAX(CASE WHEN rn = 64 THEN h END) AS kth
               FROM r GROUP BY event_type),
         x AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
               FROM events GROUP BY event_type)
         SELECT k.event_type,
                CAST(LEAST(k.nd, 64) AS BIGINT) AS sketch_size,
                k.kth AS kth_min,
                CASE WHEN k.nd < 64 THEN CAST(k.nd AS DOUBLE)
                     ELSE round(63.0 * 1152921504606846976.0 / CAST(k.kth AS DOUBLE), 4)
                END AS est_distinct,
                x.n_exact
         FROM k JOIN x USING (event_type) ORDER BY k.event_type""",
    "q45_tfidf_top_terms" ->
      """WITH tokens AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term
                         FROM documents),
         tf AS (SELECT lang, term, COUNT(*) AS tf FROM tokens GROUP BY 1, 2),
         dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (SELECT tf.lang, tf.term, tf.tf, dfc.df,
                           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfc.df), 6) AS tfidf
                    FROM tf JOIN dfc USING (term) CROSS JOIN n),
         ranked AS (SELECT *, row_number() OVER (
                      PARTITION BY lang ORDER BY tfidf DESC, term) AS rank
                    FROM scored)
         SELECT lang, rank, term, tf, df, tfidf
         FROM ranked WHERE rank <= 10 ORDER BY lang, rank""",
    "q46_streaming_sessions" ->
      """WITH fe AS (
           SELECT ts,
                  CASE event_type WHEN 'signup' THEN 'flow.begin'
                                  WHEN 'purchase' THEN 'flow.complete'
                                  WHEN 'error' THEN 'account.created'
                                  ELSE 'flow.event' END AS type,
                  md5(user_id || '#' || CAST(ts::DATE AS VARCHAR)) AS flow_id,
                  epoch_ms(ts) % 100000000 AS flow_time,
                  'loc' || (user_id % 7) AS locale,
                  md5(CAST(user_id AS VARCHAR)) AS uid
           FROM events),
         b AS (SELECT flow_id,
                      make_timestamp(CAST(epoch_ms(MIN(ts)) AS BIGINT) * 1000) AS begin_time
               FROM fe WHERE type = 'flow.begin' GROUP BY flow_id),
         f AS (SELECT flow_id,
                      COALESCE(MAX(CASE WHEN type <> 'flow.begin' THEN flow_time END), 0)
                        AS duration,
                      BOOL_OR(type = 'flow.complete') AS completed,
                      BOOL_OR(type = 'account.created') AS new_account,
                      MAX(CASE WHEN type <> 'flow.begin' THEN locale END) AS locale,
                      MAX(CASE WHEN type <> 'flow.begin' THEN uid END) AS uid
               FROM fe GROUP BY flow_id)
         SELECT b.flow_id, b.begin_time, f.duration, f.completed, f.new_account,
                f.locale, f.uid
         FROM b JOIN f USING (flow_id) ORDER BY b.flow_id""",
    "q47_contamination_scan" ->
      """WITH sh AS (
           SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(length(lower(trim(text))) - 7, 1) + 1),
                   i -> substr(lower(trim(text)), CAST(i AS INTEGER), 8)))) AS word
                 FROM documents) t),
         ev AS (SELECT DISTINCT h FROM sh WHERE doc_id < 20),
         c AS (SELECT doc_id, h FROM sh WHERE doc_id >= 20),
         tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM c GROUP BY doc_id),
         shared AS (SELECT c.doc_id, COUNT(*) AS n_shared
                    FROM c JOIN ev USING (h) GROUP BY c.doc_id)
         SELECT s.doc_id, s.n_shared, t.n_shingles,
                s.n_shared * 2 >= t.n_shingles AS contaminated
         FROM shared s JOIN tot t USING (doc_id)
         WHERE s.n_shared >= 3 ORDER BY s.doc_id""",
    "q48_quality_percentile_filter" ->
      """WITH thr AS (SELECT lang, quantile_cont(n_chars, 0.75) AS thr
                      FROM documents GROUP BY lang)
         SELECT d.lang, d.source, COUNT(*) AS n_docs,
                COUNT(CASE WHEN d.n_chars >= t.thr THEN 1 END) AS n_kept
         FROM documents d JOIN thr t USING (lang)
         GROUP BY d.lang, d.source ORDER BY d.lang, d.source""",
    "q49_ann_topk_agg" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         scored AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
                    FROM q JOIN c ON qid <> id)
         SELECT qid, rank, id, cos FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    "q50_ivf_ann" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                       WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         asg AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         pr AS (SELECT qid, qvec, cell FROM (
             SELECT q.qid, q.qvec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM q CROSS JOIN cen) t WHERE rn <= 4),
         scored AS (SELECT pr.qid, asg.id, ${cosSql("pr.qvec", "asg.vec")} AS cos
                    FROM pr JOIN asg USING (cell) WHERE pr.qid <> asg.id)
         SELECT qid, rank, id, cos FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    "q51_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 200
         ORDER BY doc_id""",
    "q52_domain_cap" ->
      """SELECT source, rank, doc_id, score FROM (
           SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS score,
                  row_number() OVER (PARTITION BY source
                    ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id) AS rank
           FROM documents) t
         WHERE rank <= 15 ORDER BY source, rank""",
    "q53_repetition_signals" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         wstats AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
                           COUNT(*) AS n_distinct, MAX(n) AS max_word_n
                    FROM (SELECT doc_id, t, COUNT(*) AS n
                          FROM (SELECT doc_id, unnest(l) AS t FROM ws) u
                          GROUP BY doc_id, t) g
                    GROUP BY doc_id),
         bstats AS (SELECT doc_id, MAX(n) AS max_bigram_n
                    FROM (SELECT doc_id, g, COUNT(*) AS n
                          FROM (SELECT doc_id,
                                  unnest(CASE WHEN len(l) >= 2
                                    THEN list_transform(range(1, len(l)),
                                      i -> l[CAST(i AS INTEGER)] || ' ' || l[CAST(i AS INTEGER) + 1])
                                    ELSE []::VARCHAR[] END) AS g
                                FROM ws) u
                          GROUP BY doc_id, g) g2
                    GROUP BY doc_id)
         SELECT w.doc_id, w.n_words, w.n_distinct, w.max_word_n,
                COALESCE(b.max_bigram_n, 0) AS max_bigram_n,
                w.max_word_n >= 2 AND w.max_word_n * 10 >= w.n_words AS repetitive
         FROM wstats w LEFT JOIN bstats b USING (doc_id)
         ORDER BY w.doc_id""",
    "q54_pii_redact" ->
      """WITH t AS (SELECT source,
             text || CASE WHEN doc_id % 5 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com at 10.0.'
                    || CAST(doc_id % 200 AS VARCHAR) || '.77'
               ELSE '' END AS text2
           FROM documents),
         r AS (SELECT source,
             len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS em,
             len(regexp_extract_all(text2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ip,
             ('0x' || substr(md5(
               regexp_replace(
                 regexp_replace(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')), 1, 15))::BIGINT % 1048576 AS ck
           FROM t)
         SELECT source, COUNT(*) AS n_docs, CAST(SUM(em) AS BIGINT) AS n_emails,
                CAST(SUM(ip) AS BIGINT) AS n_ips,
                CAST(SUM(ck) AS BIGINT) AS redacted_checksum
         FROM r GROUP BY source ORDER BY source""",
    "q55_range_join_windows" ->
      """WITH hours AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
                        FROM events GROUP BY 1),
         top AS (SELECT h FROM (
             SELECT h, row_number() OVER (ORDER BY n DESC, h) AS r FROM hours) t
           WHERE r <= 10)
         SELECT strftime(t.h, '%Y-%m-%d %H:%M:%S') AS window_start,
                COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users
         FROM events e JOIN top t
           ON e.ts >= t.h AND e.ts < t.h + INTERVAL 90 MINUTE
         GROUP BY t.h ORDER BY window_start""",
    "q56_lsh_incremental" ->
      s"""WITH ${lshPairsSqlOverShingles(
             s"""SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
                 FROM documents""",
             pairPred = "a.doc_id % 10 >= 8 AND b.doc_id % 10 < 8")},
         ws AS (SELECT doc_id, list_distinct(string_split(lower(trim(text)), ' ')) AS ws FROM documents)
         SELECT new_id, dup_of, jac FROM (
           SELECT p.a AS new_id, p.b AS dup_of,
                  round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
                        CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE), 6) AS jac
           FROM pairs p
           JOIN ws wa ON wa.doc_id = p.a
           JOIN ws wb ON wb.doc_id = p.b) t
         WHERE jac >= 0.5
         ORDER BY new_id, dup_of""",
    // Mirrors TextDedup.nearDupDedup stage for stage: exact dedup
    // (min-id per normalized text) → banded LSH candidates over the
    // survivors → exact-Jaccard gate on the 60-bit-hashed word sets →
    // recursive-CTE min-label closure (the q34 pattern) → drop every
    // non-label member of a component.
    "q57_neardup_dedup_dataset" ->
      s"""WITH RECURSIVE kmin AS (SELECT MIN(doc_id) AS doc_id FROM documents
                                  GROUP BY lower(trim(text))),
         sdocs AS (SELECT d.* FROM documents d JOIN kmin USING (doc_id)),
         ${minHashPairsSqlOver("sdocs")},
         hws AS (SELECT doc_id,
                        list_distinct(list_transform(
                          list_distinct(string_split(lower(trim(text)), ' ')),
                          w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)) AS ws
                 FROM sdocs),
         gp AS (SELECT p.a, p.b FROM pairs p
                JOIN hws wa ON wa.doc_id = p.a
                JOIN hws wb ON wb.doc_id = p.b
                WHERE round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
                            CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE), 6)
                      >= 0.5),
         ed AS (SELECT a AS src, b AS dst FROM gp UNION SELECT b, a FROM gp),
         reach(d, r) AS (
           SELECT src AS d, src AS r FROM ed
           UNION
           SELECT ed.src AS d, reach.r FROM ed JOIN reach ON ed.dst = reach.d),
         comp AS (SELECT d, MIN(r) AS label FROM reach GROUP BY d),
         losers AS (SELECT d AS doc_id FROM comp WHERE d <> label)
         SELECT doc_id, lang, source FROM sdocs
         WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         ORDER BY doc_id""",
    // Exact mirror of the streaming per-type daily counts; the HLL DAU
    // column is asserted Spark-side as a tolerance flag (q42 technique).
    "q58_streaming_rollups" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day, event_type,
                COUNT(*) AS n_events, true AS dau_ok
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q59_ivf_lloyd_recall" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                       WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         asg0 AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         nv AS (SELECT id, cell,
                  list_transform(vec, x -> x::DOUBLE /
                    sqrt(list_sum(list_transform(vec, y -> y::DOUBLE * y::DOUBLE)))) AS nvec
                FROM asg0),
         ms AS (SELECT cell, list(nvec ORDER BY id) AS vs FROM nv GROUP BY cell),
         ref AS (SELECT cell AS cid,
                   list_transform(range(64), d ->
                     CAST(list_reduce(
                       list_transform(vs, v -> v[CAST(d + 1 AS INTEGER)]),
                       (a, b) -> a + b) AS REAL)) AS cvec
                 FROM ms),
         asg AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, ref.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "ref.cvec")} DESC, ref.cid) AS rn
             FROM c CROSS JOIN ref) t WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         pr AS (SELECT qid, qvec, cell FROM (
             SELECT q.qid, q.qvec, ref.cid AS cell,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "ref.cvec")} DESC, ref.cid) AS rn
             FROM q CROSS JOIN ref) t WHERE rn <= 4),
         scored AS (SELECT pr.qid, a.id, ${cosSql("pr.qvec", "a.vec")} AS cos
                    FROM pr JOIN asg a USING (cell) WHERE pr.qid <> a.id),
         ivf AS (SELECT qid, id FROM (
             SELECT qid, id,
                    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
             FROM scored) t WHERE rank <= 5),
         ex AS (SELECT qid, id FROM (
             SELECT q.qid, c.id,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "c.vec")} DESC, c.id) AS rank
             FROM q CROSS JOIN c WHERE q.qid <> c.id) t WHERE rank <= 5)
         SELECT q.qid, COALESCE(h.n_hits, 0) AS n_hits
         FROM q LEFT JOIN (SELECT qid, COUNT(*) AS n_hits
                           FROM ivf JOIN ex USING (qid, id) GROUP BY qid) h USING (qid)
         ORDER BY q.qid""",
    // The Bloom prefilter changes the PLAN, never the answer (no false
    // negatives + exact verify of maybe-seen rows), so the oracle is
    // the sketch-free set-semantics form: dedupe the new batch by
    // normalized text (min-id keeper), drop texts already in the index.
    "q60_bloom_incremental_dedup" ->
      """WITH newb AS (SELECT * FROM documents WHERE doc_id % 10 >= 8),
         idx AS (SELECT DISTINCT lower(trim(text)) AS t FROM documents
                 WHERE doc_id % 10 < 8),
         k AS (SELECT MIN(doc_id) AS doc_id FROM newb GROUP BY lower(trim(text)))
         SELECT d.doc_id, d.lang, d.source
         FROM newb d JOIN k USING (doc_id)
         WHERE lower(trim(d.text)) NOT IN (SELECT t FROM idx)
         ORDER BY doc_id""",
    // 16-token windows every 8 tokens; window count covers every token
    // (1 + ceil(max(0, n-16)/8)); DuckDB's inclusive 1-based list slice
    // toks[a:b] mirrors Spark's slice(toks, a, 16) with b = a+15.
    "q61_doc_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n,
                      1 + (greatest(len(toks) - 16, 0) + 7) // 8 AS nc
               FROM t),
         e AS (SELECT doc_id, toks, n, unnest(range(nc)) AS i FROM s)
         SELECT doc_id, i AS chunk_idx,
                least(16, n - i * 8) AS n_tokens,
                array_to_string(toks[(i * 8 + 1):(i * 8 + 16)], ' ') AS chunk
         FROM e ORDER BY doc_id, chunk_idx""",
    // Corpus → vocab (word, count) → per-word character pairs weighted
    // by word count → top-50 by (total DESC, pair). Same tie-break both
    // sides, so the row SET is deterministic.
    "q62_bpe_pair_counts" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         wc AS (SELECT word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY word),
         pe AS (SELECT n, unnest(list_transform(range(1, length(word)),
                         i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
                FROM wc),
         agg AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pairs FROM pe GROUP BY pair)
         SELECT pair, n_pairs FROM agg
         ORDER BY n_pairs DESC, pair LIMIT 50""",
    // Exact mirror of PQ encode + ADC: same subspace slices, the same
    // argmax form (dot - |c|²/2, round 6, lowest-cid tie), and the ADC
    // sum walks subspaces in ascending order (list(dd ORDER BY sub))
    // to match Spark's zip_with/aggregate left fold.
    "q63_pq_ann" ->
      s"""WITH sp AS (SELECT unnest(range(8)) AS sub),
         cb AS (SELECT vec_id - 20 AS cid, sub,
                       embedding[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS cv
                FROM embeddings, sp WHERE vec_id BETWEEN 20 AND 35),
         cb2 AS (SELECT cid, sub, cv,
                        list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE)) AS c2
                 FROM cb),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         sv AS (SELECT id, sub,
                       vec[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS sv
                FROM c, sp),
         enc AS (SELECT id, sub, cid AS code FROM (
             SELECT sv.id, sv.sub, cb2.cid,
                    row_number() OVER (PARTITION BY sv.id, sv.sub
                      ORDER BY round(${dotSqlN("sv.sv", "cb2.cv", 8)} - c2 / 2, 6) DESC,
                               cb2.cid) AS rn
             FROM sv JOIN cb2 ON cb2.sub = sv.sub) t WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         qs AS (SELECT qid, sub,
                       qvec[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS qsv
                FROM q, sp),
         qt AS (SELECT qid, cb2.sub, cid,
                       ${dotSqlN("qs.qsv", "qs.qsv", 8)}
                         - 2 * ${dotSqlN("qs.qsv", "cb2.cv", 8)} + c2 AS dd
                FROM qs JOIN cb2 ON cb2.sub = qs.sub),
         ad AS (SELECT qt.qid, e.id,
                       round(list_sum(list(dd ORDER BY e.sub)), 6) AS adist
                FROM enc e JOIN qt ON qt.sub = e.sub AND qt.cid = e.code
                WHERE qt.qid <> e.id
                GROUP BY qt.qid, e.id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, adist FROM (
           SELECT qid, id, adist,
                  row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rank
           FROM ad) t WHERE rank <= 5
         ORDER BY qid, rank""",
    // Same clean-derivation aggregate as q10: every injected junk line
    // must be dropped by the JSON MAXERROR accounting, every over-width
    // browser truncated, every empty service kept as '' (never null).
    "q64_json_ingest" ->
      s"""WITH staging AS ($activityStagingSql)
         SELECT type, COUNT(*) AS n_rows, COUNT(DISTINCT uid) AS n_users,
                COUNT(CASE WHEN service = '' THEN 1 END) AS n_empty_service,
                COUNT(CASE WHEN length(substr(ua_browser, 1, 40)) = 40 THEN 1 END) AS n_truncated
         FROM staging GROUP BY type ORDER BY type""",
    // Single-batch replay → global suppression → the emitted key set is
    // exactly batch DISTINCT.
    "q65_streaming_dedup" ->
      """SELECT DISTINCT event_id % 500 AS did FROM events ORDER BY did""",
    // Composes the q53 repetition CTE, the q28 quality predicate, and
    // the q54 regex mirrors into one verdict row per document;
    // concat_ws skips NULL reason slots on both engines.
    "q66_curation_gate" ->
      """WITH wstats AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
                                MAX(n) AS max_word_n
                         FROM (SELECT doc_id, t, COUNT(*) AS n
                               FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                                     FROM documents) u
                               GROUP BY doc_id, t) g
                         GROUP BY doc_id),
         rep AS (SELECT doc_id,
                        max_word_n >= 2 AND max_word_n * 10 >= n_words AS repetitive
                 FROM wstats),
         qual AS (SELECT doc_id,
                         len(string_split(text, ' ')) >= 50
                         AND len(list_filter(string_split(text, ' '),
                           w -> list_contains(['the','a','of','and','to'], w))) * 10
                             >= len(string_split(text, ' ')) AS hq
                  FROM documents)
         SELECT d.doc_id,
                (NOT r.repetitive AND q.hq) AS keep,
                concat_ws(',',
                  CASE WHEN r.repetitive THEN 'repetitive' END,
                  CASE WHEN NOT q.hq THEN 'low_quality' END) AS reasons,
                len(regexp_extract_all(d.text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                  + len(regexp_extract_all(d.text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_pii,
                length(regexp_replace(
                  regexp_replace(d.text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_len
         FROM documents d JOIN rep r USING (doc_id) JOIN qual q USING (doc_id)
         ORDER BY d.doc_id""",
    // Per-token micro-nat quantization BEFORE the per-doc sum: integer
    // addition commutes, so both engines agree regardless of
    // aggregation order; `div`/`//` keeps the mean integral too.
    "q67_unigram_surprisal" ->
      """WITH toks AS (SELECT doc_id, t
                       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                             FROM documents) u
                       WHERE t <> ''),
         vocab AS (SELECT t, COUNT(*) AS n_w FROM toks GROUP BY t),
         tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM vocab),
         sc AS (SELECT doc_id,
                       CAST(round(-ln(CAST(n_w AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1e6)
                            AS BIGINT) AS s_micro
                FROM toks JOIN vocab USING (t) CROSS JOIN tot)
         SELECT doc_id, COUNT(*) AS n_tokens,
                CAST(SUM(s_micro) AS BIGINT) AS surprisal_micro,
                CAST(SUM(s_micro) AS BIGINT) // COUNT(*) AS mean_micro
         FROM sc GROUP BY doc_id ORDER BY doc_id""",
    // Integer RRF: 1000000 // (60 + rank) per retriever, summed —
    // no floats in the fusion, so the oracle matches exactly. Lexical
    // jaccard and cosine ranks mirror the q56/q25 oracle forms.
    "q68_hybrid_search" ->
      s"""WITH qw AS (SELECT doc_id AS qid,
                             list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                      FROM documents WHERE doc_id < 20),
         cw AS (SELECT doc_id AS id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents WHERE doc_id >= 20),
         -- ov > 0 mirrors the inverted-index feeder's retrieval
         -- contract: a doc sharing no token is not a result (identical
         -- output on the fixture, where every query has hundreds of
         -- positive matches; divergence-proof off-fixture)
         lex AS (SELECT qid, id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY jac DESC, id) AS r
                 FROM (SELECT q.qid, c.id,
                              len(list_intersect(q.ws, c.ws)) AS ov,
                              round(CAST(len(list_intersect(q.ws, c.ws)) AS DOUBLE) /
                                    CAST(len(list_distinct(q.ws || c.ws)) AS DOUBLE), 6) AS jac
                       FROM qw q CROSS JOIN cw c) t
                 WHERE ov > 0),
         lexp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM lex WHERE r <= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         vec AS (SELECT qid, id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY cos DESC, id) AS r
                 FROM (SELECT q.qid, c.id, ${cosSql("q.qvec", "c.vec")} AS cos
                       FROM q CROSS JOIN c WHERE q.qid <> c.id) t),
         vecp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM vec WHERE r <= 20),
         fused AS (SELECT qid, id, CAST(SUM(pts) AS BIGINT) AS rrf_micro
                   FROM (SELECT * FROM lexp UNION ALL SELECT * FROM vecp) u
                   GROUP BY qid, id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, rrf_micro FROM (
           SELECT qid, id, rrf_micro,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY rrf_micro DESC, id) AS rank
           FROM fused) t
         WHERE rank <= 10 ORDER BY qid, rank""",
    // q47's CTEs with the flag applied: anti-join the contaminated ids.
    "q69_decontaminate" ->
      """WITH sh AS (
           SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(length(lower(trim(text))) - 7, 1) + 1),
                   i -> substr(lower(trim(text)), CAST(i AS INTEGER), 8)))) AS word
                 FROM documents) t),
         ev AS (SELECT DISTINCT h FROM sh WHERE doc_id < 20),
         c AS (SELECT doc_id, h FROM sh WHERE doc_id >= 20),
         tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM c GROUP BY doc_id),
         shared AS (SELECT c.doc_id, COUNT(*) AS n_shared
                    FROM c JOIN ev USING (h) GROUP BY c.doc_id),
         bad AS (SELECT s.doc_id FROM shared s JOIN tot t USING (doc_id)
                 WHERE s.n_shared >= 3 AND s.n_shared * 2 >= t.n_shingles)
         SELECT doc_id, lang, source FROM documents
         WHERE doc_id >= 20 AND doc_id NOT IN (SELECT doc_id FROM bad)
         ORDER BY doc_id""",
    // IVF×PQ: q50's assignment/probe CTEs gate WHICH (qid, id) pairs
    // the q63 ADC CTEs score; a 20-deep shortlist per query is then
    // exactly re-ranked by true squared-L2 (same left-to-right double
    // sums as graft_array_dot, same (a−b)+c association).
    "q70_ivf_pq_ann" ->
      s"""WITH sp AS (SELECT unnest(range(8)) AS sub),
         cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         cb AS (SELECT vec_id - 20 AS cid, sub,
                       embedding[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS cv
                FROM embeddings, sp WHERE vec_id BETWEEN 20 AND 35),
         cb2 AS (SELECT cid, sub, cv,
                        list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE)) AS c2
                 FROM cb),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         asg AS (SELECT id, cell FROM (
             SELECT c.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         sv AS (SELECT id, sub,
                       vec[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS sv
                FROM c, sp),
         enc AS (SELECT id, sub, cid AS code FROM (
             SELECT sv.id, sv.sub, cb2.cid,
                    row_number() OVER (PARTITION BY sv.id, sv.sub
                      ORDER BY round(${dotSqlN("sv.sv", "cb2.cv", 8)} - c2 / 2, 6) DESC,
                               cb2.cid) AS rn
             FROM sv JOIN cb2 ON cb2.sub = sv.sub) t WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         pr AS (SELECT qid, cell FROM (
             SELECT q.qid, cen.cid AS cell,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM q CROSS JOIN cen) t WHERE rn <= 4),
         qs AS (SELECT qid, sub,
                       qvec[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS qsv
                FROM q, sp),
         qt AS (SELECT qid, cb2.sub, cid,
                       ${dotSqlN("qs.qsv", "qs.qsv", 8)}
                         - 2 * ${dotSqlN("qs.qsv", "cb2.cv", 8)} + c2 AS dd
                FROM qs JOIN cb2 ON cb2.sub = qs.sub),
         ad AS (SELECT qt.qid, e.id,
                       round(list_sum(list(dd ORDER BY e.sub)), 6) AS adist
                FROM enc e
                JOIN asg a ON a.id = e.id
                JOIN pr ON pr.cell = a.cell
                JOIN qt ON qt.sub = e.sub AND qt.cid = e.code AND qt.qid = pr.qid
                WHERE pr.qid <> e.id
                GROUP BY qt.qid, e.id),
         sl AS (SELECT qid, id FROM (
             SELECT qid, id,
                    row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rn
             FROM ad) t WHERE rn <= 20),
         rr AS (SELECT sl.qid, sl.id,
                       round(${dotSqlN("q.qvec", "q.qvec", 64)}
                             - 2 * ${dotSqlN("q.qvec", "c.vec", 64)}
                             + ${dotSqlN("c.vec", "c.vec", 64)}, 6) AS d2
                FROM sl JOIN q ON q.qid = sl.qid JOIN c ON c.id = sl.id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, d2 FROM (
           SELECT qid, id, d2,
                  row_number() OVER (PARTITION BY qid ORDER BY d2, id) AS rank
           FROM rr) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // Sharded Bloom prefilter: exact contract — identical oracle to
    // q60 (the sketch sharding changes the plan, never the answer).
    "q71_bloom_sharded_dedup" ->
      """WITH newb AS (SELECT * FROM documents WHERE doc_id % 10 >= 8),
         idx AS (SELECT DISTINCT lower(trim(text)) AS t FROM documents
                 WHERE doc_id % 10 < 8),
         k AS (SELECT MIN(doc_id) AS doc_id FROM newb GROUP BY lower(trim(text)))
         SELECT d.doc_id, d.lang, d.source
         FROM newb d JOIN k USING (doc_id)
         WHERE lower(trim(d.text)) NOT IN (SELECT t FROM idx)
         ORDER BY doc_id""",
    // BM25 over inverted-index postings. Arithmetic parity notes:
    // (1.2 + 1.0) is written as an ADDITION so both engines perform the
    // same IEEE add (the literal 2.2 could differ by 1 ulp from the
    // sum); 1 − 0.75 = 0.25 is exact so it may be a literal; per-term
    // contributions quantize to micro-points (BIGINT) before the
    // order-insensitive integer SUM; avgdl is exact because integer-
    // valued doubles sum exactly below 2^53.
    "q72_bm25_topk" ->
      """WITH qd AS (SELECT doc_id AS qid,
                            list_filter(string_split(lower(trim(text)), ' '),
                                        t -> t <> '') AS toks
                     FROM documents WHERE doc_id < 20),
         cd AS (SELECT doc_id AS id,
                       list_filter(string_split(lower(trim(text)), ' '),
                                   t -> t <> '') AS toks
                FROM documents WHERE doc_id >= 20),
         post AS (SELECT id, tok, COUNT(*) AS tf, MAX(dl) AS dl FROM (
                    SELECT id, len(toks) AS dl, unnest(toks) AS tok FROM cd) u
                  GROUP BY id, tok),
         dfreq AS (SELECT tok, COUNT(*) AS df FROM post GROUP BY tok),
         st AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM cd),
         qt AS (SELECT qid, unnest(list_distinct(toks)) AS tok FROM qd),
         sc AS (SELECT qt.qid, p.id,
                       CAST(round(ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
                            * (p.tf * (1.2 + 1.0) /
                               (p.tf + 1.2 * (0.25 + 0.75 * p.dl / st.avgdl)))
                            * 1e6) AS BIGINT) AS c_micro
                FROM post p
                JOIN qt ON qt.tok = p.tok
                JOIN dfreq d ON d.tok = p.tok
                CROSS JOIN st),
         agg AS (SELECT qid, id, CAST(SUM(c_micro) AS BIGINT) AS bm25_micro
                 FROM sc GROUP BY qid, id)
         SELECT qid, id, CAST(r AS BIGINT) AS r, bm25_micro FROM (
           SELECT qid, id, bm25_micro,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY bm25_micro DESC, id) AS r
           FROM agg) t
         WHERE r <= 20 ORDER BY qid, r""",
    // SemDeDup: q50's cell-assignment CTE over the full vector set,
    // pairwise cosine within cells only, drop any id with a lower-id
    // cell-mate at >= 0.4.
    "q73_semantic_dedup" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                       WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         asg AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         losers AS (SELECT DISTINCT b.id
                    FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
                    WHERE ${cosSql("a.vec", "b.vec")} >= 0.4)
         SELECT id AS vec_id FROM c
         WHERE id NOT IN (SELECT id FROM losers)
         ORDER BY vec_id""",
    // Bottom-100-by-hash = exact-size uniform sample (13 hex chars =
    // 52 bits, exactly representable in the heap's DOUBLE score; an
    // ORDER/LIMIT oracle — the engine side uses the bounded heap).
    "q74_exact_sample" ->
      """WITH h AS (SELECT doc_id,
                           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS hh
                    FROM documents),
         p AS (SELECT doc_id FROM h ORDER BY hh, doc_id LIMIT 100)
         SELECT d.doc_id, d.lang, d.source
         FROM documents d JOIN p USING (doc_id) ORDER BY d.doc_id""",
    // Stream packing: bin = tokens_before // budget per (lang) shard in
    // doc_id order — pure integer window math on both engines.
    "q75_sequence_packing" ->
      """WITH t AS (SELECT lang, doc_id,
                           len(string_split(text, ' ')) AS n_tokens
                    FROM documents),
         c AS (SELECT lang, doc_id, n_tokens,
                      SUM(n_tokens) OVER (PARTITION BY lang
                        ORDER BY doc_id) AS cum
               FROM t)
         SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
                CAST((cum - n_tokens) % 512 AS BIGINT) AS bin_offset
         FROM c ORDER BY lang, doc_id""",
    // Three-retriever RRF: the q72 BM25 CTEs, the q19 inverted-index
    // Jaccard CTEs, and the q68 cosine CTE feed the q68 fusion tail.
    "q76_hybrid_search_3way" ->
      s"""WITH qd AS (SELECT doc_id AS qid,
                             list_filter(string_split(lower(trim(text)), ' '),
                                         t -> t <> '') AS toks
                      FROM documents WHERE doc_id < 20),
         cd AS (SELECT doc_id AS id,
                       list_filter(string_split(lower(trim(text)), ' '),
                                   t -> t <> '') AS toks
                FROM documents WHERE doc_id >= 20),
         post AS (SELECT id, tok, COUNT(*) AS tf, MAX(dl) AS dl FROM (
                    SELECT id, len(toks) AS dl, unnest(toks) AS tok FROM cd) u
                  GROUP BY id, tok),
         dfreq AS (SELECT tok, COUNT(*) AS df FROM post GROUP BY tok),
         st AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM cd),
         qtk AS (SELECT qid, unnest(list_distinct(toks)) AS tok FROM qd),
         bsc AS (SELECT qtk.qid, p.id,
                        CAST(round(ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
                             * (p.tf * (1.2 + 1.0) /
                                (p.tf + 1.2 * (0.25 + 0.75 * p.dl / st.avgdl)))
                             * 1e6) AS BIGINT) AS c_micro
                 FROM post p
                 JOIN qtk ON qtk.tok = p.tok
                 JOIN dfreq d ON d.tok = p.tok
                 CROSS JOIN st),
         bagg AS (SELECT qid, id, CAST(SUM(c_micro) AS BIGINT) AS bm25_micro
                  FROM bsc GROUP BY qid, id),
         bmr AS (SELECT qid, id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY bm25_micro DESC, id) AS r
                 FROM bagg),
         bmp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM bmr WHERE r <= 20),
         qw AS (SELECT doc_id AS qid,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents WHERE doc_id < 20),
         cw AS (SELECT doc_id AS id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents WHERE doc_id >= 20),
         lsc AS (SELECT q.qid, c.id,
                        len(list_intersect(q.ws, c.ws)) AS ov,
                        round(CAST(len(list_intersect(q.ws, c.ws)) AS DOUBLE) /
                              CAST(len(q.ws) + len(c.ws)
                                   - len(list_intersect(q.ws, c.ws)) AS DOUBLE), 6) AS jac
                 FROM qw q CROSS JOIN cw c),
         lexr AS (SELECT qid, id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY jac DESC, id) AS r
                  FROM lsc WHERE ov > 0),
         lexp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM lexr WHERE r <= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         vecr AS (SELECT qid, id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY cos DESC, id) AS r
                  FROM (SELECT q.qid, c.id, ${cosSql("q.qvec", "c.vec")} AS cos
                        FROM q CROSS JOIN c WHERE q.qid <> c.id) t),
         vecp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM vecr WHERE r <= 20),
         fused AS (SELECT qid, id, CAST(SUM(pts) AS BIGINT) AS rrf_micro
                   FROM (SELECT * FROM bmp UNION ALL
                         SELECT * FROM lexp UNION ALL
                         SELECT * FROM vecp) u
                   GROUP BY qid, id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, rrf_micro FROM (
           SELECT qid, id, rrf_micro,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY rrf_micro DESC, id) AS rank
           FROM fused) t
         WHERE rank <= 10 ORDER BY qid, rank""",
    // Audio modality: the oracle recomputes the deterministic encoder's
    // output from strlen/ord, exactly like q31's PPM mirror — sample i
    // is (byte(i mod len) − 128)·128, so Σ|sample| is pure integer math.
    "q77_multimodal_audio" ->
      """WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 50 + 10 AS n
                    FROM documents)
         SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,
                CAST(n AS BIGINT) AS n_samples,
                CAST(44 + 2 * n AS BIGINT) AS byte_len,
                CAST(list_sum(list_transform(range(n),
                     i -> abs((CASE WHEN len = 0 THEN 0
                               ELSE ord(substr(text, CAST(i % len AS INTEGER) + 1, 1))
                               END - 128) * 128)))
                     AS BIGINT) AS amp_checksum
         FROM m ORDER BY doc_id""",
    // Bottom-k sketch Jaccard: |U_k ∩ A ∩ B| / |U_k| over per-lang KMV
    // sketches (q44's bottom-k form), exact Jaccard alongside.
    "q78_corpus_overlap" ->
      """WITH w AS (SELECT DISTINCT lang,
                           ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
                    FROM (SELECT lang,
                                 unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
                          FROM documents) t),
         r AS (SELECT lang, h,
                      row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
               FROM w),
         sk AS (SELECT lang, list(h ORDER BY h) AS kmv FROM r
                WHERE rn <= 128 GROUP BY lang),
         sz AS (SELECT lang, COUNT(*) AS n FROM w GROUP BY lang),
         pr AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
                       a.kmv AS ka, b.kmv AS kb
                FROM sk a JOIN sk b ON a.lang < b.lang),
         ex AS (SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS ni
                FROM w a JOIN w b ON a.h = b.h AND a.lang < b.lang
                GROUP BY 1, 2),
         est AS (SELECT lang_a, lang_b,
                        list_sort(list_distinct(ka || kb))[1:128] AS u, ka, kb
                 FROM pr)
         SELECT e.lang_a, e.lang_b,
                round(CAST(len(list_intersect(list_intersect(e.u, e.ka), e.kb)) AS DOUBLE) /
                      CAST(len(e.u) AS DOUBLE), 6) AS sketch_jaccard,
                round(CAST(COALESCE(x.ni, 0) AS DOUBLE) /
                      CAST(sa.n + sb.n - COALESCE(x.ni, 0) AS DOUBLE), 6) AS exact_jaccard
         FROM est e
         JOIN sz sa ON sa.lang = e.lang_a
         JOIN sz sb ON sb.lang = e.lang_b
         LEFT JOIN ex x ON x.lang_a = e.lang_a AND x.lang_b = e.lang_b
         ORDER BY e.lang_a, e.lang_b""",
    // SQ8: per-dim max-|v| scales from the corpus side, symmetric int8
    // encode with floor(x+0.5) (round() halves differ across engines;
    // floor is IEEE-identical), then EXACT integer dot ranking — no
    // rounding tolerance anywhere in this oracle.
    "q79_sq_ann" ->
      """WITH dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM c, dims GROUP BY i),
         ce AS (SELECT id, sc.i,
                       CASE WHEN s <= 0 THEN 0
                            ELSE CAST(greatest(-127, least(127,
                              floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5))) AS BIGINT)
                       END AS code
                FROM c, sc),
         qe AS (SELECT qid, sc.i,
                       CASE WHEN s <= 0 THEN 0
                            ELSE CAST(greatest(-127, least(127,
                              floor(CAST(qvec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5))) AS BIGINT)
                       END AS code
                FROM q, sc),
         d AS (SELECT qid, id, CAST(SUM(qe.code * ce.code) AS BIGINT) AS idot
               FROM qe JOIN ce ON qe.i = ce.i AND qe.qid <> ce.id
               GROUP BY qid, id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, idot FROM (
           SELECT qid, id, idot,
                  row_number() OVER (PARTITION BY qid ORDER BY idot DESC, id) AS rank
           FROM d) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // C4 line dedup: the same deterministic 3-word lining transform,
    // boilerplate = line in >= 3 distinct docs, reassembly by pos.
    // string_agg skips the NULLs the CASE leaves for dropped lines.
    "q80_line_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         l AS (SELECT doc_id,
                      unnest(range(CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS pos,
                      unnest(list_transform(range(CAST(ceil(len(ws) / 3.0) AS BIGINT)),
                             i -> array_to_string(ws[CAST(i * 3 + 1 AS BIGINT):CAST(i * 3 + 3 AS BIGINT)], ' '))) AS line
               FROM w),
         b AS (SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 3)
         SELECT l.doc_id,
                count(*) AS n_lines,
                count(*) FILTER (WHERE b.line IS NULL) AS n_kept,
                coalesce(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
                                    chr(10) ORDER BY l.pos), '') AS text
         FROM l LEFT JOIN b ON l.line = b.line
         GROUP BY l.doc_id ORDER BY l.doc_id""",
    // Duplicated 5-gram stats: gram in >= 2 distinct docs is "dup";
    // integer ppm via floor division (operands non-negative, so
    // DuckDB // == Spark div).
    "q81_dup_ngrams" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT doc_id,
                      unnest(list_transform(range(len(ws) - 4),
                             i -> array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 5 AS BIGINT)], ' '))) AS gram
               FROM w WHERE len(ws) >= 5),
         d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
         SELECT g.doc_id, count(*) AS n_grams, count(d.gram) AS n_dup,
                count(d.gram) * 1000000 // count(*) AS dup_ppm
         FROM g LEFT JOIN d USING (gram)
         GROUP BY g.doc_id ORDER BY g.doc_id""",
    // Char entropy: same micro-nat contract as q67 — per distinct char
    // round(-ln(p)*1e6) quantizes BEFORE the weighted sum; floor
    // division on non-negative integers matches Spark's div.
    "q82_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
                            unnest(list_transform(range(length(text)),
                                   i -> substr(text, CAST(i AS INTEGER) + 1, 1))) AS c
                     FROM documents WHERE length(text) > 0),
         cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
         nn AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM cc GROUP BY doc_id),
         t AS (SELECT cc.doc_id, cnt, n,
                      CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS term
               FROM cc JOIN nn USING (doc_id))
         SELECT doc_id, max(n) AS n_chars, count(*) AS n_distinct,
                CAST(sum(cnt * term) AS BIGINT) // max(n) AS entropy_micro
         FROM t GROUP BY doc_id ORDER BY doc_id""",
    // Hashed linear scorer: same 60-bit md5 bucket, same Knuth
    // multiplicative weight, all-integer. score may be negative, and
    // both engines' integer division (Spark div, DuckDB //) TRUNCATES
    // toward zero, so mean_milli agrees exactly.
    "q83_hashed_quality" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id)
         SELECT doc_id, n_tokens, score,
                (score * 1000) // n_tokens AS mean_milli,
                score >= 0 AS keep
         FROM s ORDER BY doc_id""",
    // Deterministic shuffle: salted 52-bit hash, shard = h % 8, pos =
    // rank of (h, id) within the shard.
    "q84_shuffle_assign" ->
      """WITH h AS (SELECT doc_id,
                           ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS hh
                    FROM documents)
         SELECT doc_id, hh % 8 AS shard,
                CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
         FROM h ORDER BY shard, pos""",
    // Audio frames: rebuild the generator's samples from the text
    // (the q77 contract), then 8-sample frames at hop 4 — ceil(n/4)
    // frames, ragged tail kept; list_position gives the FIRST index of
    // the max (ties -> lowest frame, matching the Scala fold).
    "q85_audio_frames" ->
      """WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 50 + 10 AS n
                    FROM documents),
         e AS (SELECT doc_id, n,
                      list_transform(range((n + 3) // 4),
                        f -> list_sum(list_transform(range(least(8, n - f * 4)),
                               j -> CAST((CASE WHEN len = 0 THEN 0
                                          ELSE ord(substr(text, CAST((f * 4 + j) % len AS INTEGER) + 1, 1))
                                          END - 128) * 128 AS BIGINT)
                                    * CAST((CASE WHEN len = 0 THEN 0
                                            ELSE ord(substr(text, CAST((f * 4 + j) % len AS INTEGER) + 1, 1))
                                            END - 128) * 128 AS BIGINT)))) AS en,
                      list_sum(list_transform(range(n),
                        i -> CAST((CASE WHEN len = 0 THEN 0
                                   ELSE ord(substr(text, CAST(i % len AS INTEGER) + 1, 1))
                                   END - 128) * 128 AS BIGINT)
                             * CAST((CASE WHEN len = 0 THEN 0
                                     ELSE ord(substr(text, CAST(i % len AS INTEGER) + 1, 1))
                                     END - 128) * 128 AS BIGINT))) AS tot
               FROM m)
         SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
                CAST((n + 3) // 4 AS BIGINT) AS n_frames,
                CAST(list_max(en) AS BIGINT) AS max_frame_energy,
                CAST(list_position(en, list_max(en)) - 1 AS BIGINT) AS max_frame_idx,
                CAST(tot AS BIGINT) AS total_energy
         FROM e ORDER BY doc_id""",
    // Stratified exact sample: bottom-20-by-salted-hash per language
    // (the q74 convention, per stratum).
    "q86_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang,
                           ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS hh
                    FROM documents),
         p AS (SELECT doc_id, lang FROM (
                 SELECT doc_id, lang,
                        row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn
                 FROM h) t WHERE rn <= 20)
         SELECT doc_id, lang FROM p ORDER BY doc_id""",
    // Bigram surprisal: MLE P(w2|w1) with context counts summed over
    // the bigram vocabulary; q67's micro-nat quantization.
    "q87_bigram_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         b AS (SELECT doc_id,
                      unnest(list_transform(range(len(ws) - 1), i -> ws[CAST(i + 1 AS BIGINT)])) AS w1,
                      unnest(list_transform(range(len(ws) - 1), i -> ws[CAST(i + 2 AS BIGINT)])) AS w2
               FROM w WHERE len(ws) >= 2),
         cnt AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
         ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM cnt GROUP BY w1),
         model AS (SELECT cnt.w1, cnt.w2,
                          CAST(round(-ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1e6) AS BIGINT) AS s
                   FROM cnt JOIN ctx USING (w1))
         SELECT b.doc_id, count(*) AS n_bigrams,
                CAST(sum(s) AS BIGINT) AS surprisal_micro,
                CAST(sum(s) AS BIGINT) // count(*) AS mean_micro
         FROM b JOIN model USING (w1, w2)
         GROUP BY b.doc_id ORDER BY b.doc_id""",
    // Filtered ANN: the corpus PRE-filters on the doc predicate
    // (exact recall over the allowed set), then q25's cosine ranking.
    "q88_filtered_ann" ->
      s"""WITH a AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
               JOIN a ON vec_id = doc_id WHERE vec_id >= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         scored AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
                    FROM q JOIN c ON qid <> id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, cos FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // IVF×SQ8: q70's cell assignment + probes, q79's scales + int8
    // codes + exact integer dot for the shortlist, q70's exact-L2
    // re-rank on the survivors.
    "q89_ivf_sq_ann" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM c, dims GROUP BY i),
         ce AS (SELECT id, sc.i,
                       CASE WHEN s <= 0 THEN 0
                            ELSE CAST(greatest(-127, least(127,
                              floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5))) AS BIGINT)
                       END AS code
                FROM c, sc),
         qe AS (SELECT qid, sc.i,
                       CASE WHEN s <= 0 THEN 0
                            ELSE CAST(greatest(-127, least(127,
                              floor(CAST(qvec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5))) AS BIGINT)
                       END AS code
                FROM q, sc),
         asg AS (SELECT id, cell FROM (
             SELECT c.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         pr AS (SELECT qid, cell FROM (
             SELECT q.qid, cen.cid AS cell,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM q CROSS JOIN cen) t WHERE rn <= 4),
         idot AS (SELECT qe.qid, ce.id, CAST(SUM(qe.code * ce.code) AS BIGINT) AS idot
                  FROM qe JOIN ce ON qe.i = ce.i
                  JOIN asg ON asg.id = ce.id
                  JOIN pr ON pr.qid = qe.qid AND pr.cell = asg.cell
                  WHERE qe.qid <> ce.id
                  GROUP BY qe.qid, ce.id),
         sl AS (SELECT qid, id FROM (
             SELECT qid, id,
                    row_number() OVER (PARTITION BY qid ORDER BY idot DESC, id) AS rn
             FROM idot) t WHERE rn <= 20),
         rr AS (SELECT sl.qid, sl.id,
                       round(${dotSqlN("q.qvec", "q.qvec", 64)}
                             - 2 * ${dotSqlN("q.qvec", "c.vec", 64)}
                             + ${dotSqlN("c.vec", "c.vec", 64)}, 6) AS d2
                FROM sl JOIN q ON q.qid = sl.qid JOIN c ON c.id = sl.id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, d2 FROM (
           SELECT qid, id, d2,
                  row_number() OVER (PARTITION BY qid ORDER BY d2, id) AS rank
           FROM rr) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // Mixture plan: closed-form per-source targets, ceiling keep-rate,
    // salted hash gate — all-integer, truncating division on both
    // engines (operands non-negative here).
    "q90_mixture_plan" ->
      """WITH t AS (SELECT DISTINCT source AS src,
                           5 + ('0x' || substr(md5(source), 1, 15))::BIGINT % 16 AS target_n
                    FROM documents),
         c AS (SELECT source AS src, count(*) AS n_docs FROM documents GROUP BY source),
         r AS (SELECT c.src, n_docs,
                      coalesce(target_n, CAST(0 AS BIGINT)) AS target_n,
                      least(CAST(1000 AS BIGINT),
                            (coalesce(target_n, CAST(0 AS BIGINT)) * 1000 + n_docs - 1) // n_docs) AS rate_permille
               FROM c LEFT JOIN t USING (src)),
         s AS (SELECT source AS src, count(*) AS n_sampled
               FROM documents d JOIN r ON r.src = d.source
               WHERE ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < rate_permille
               GROUP BY source)
         SELECT r.src, n_docs, target_n, rate_permille,
                coalesce(n_sampled, CAST(0 AS BIGINT)) AS n_sampled
         FROM r LEFT JOIN s USING (src) ORDER BY r.src""",
    // IVF audit: q89's cosine cell assignment; per-row squared-L2 to
    // the assigned centroid quantized to integer micro units BEFORE
    // the per-cell sum (the q67 commuting contract).
    "q91_ivf_audit" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         asg AS (SELECT id, cell FROM (
             SELECT c.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         d AS (SELECT asg.cell,
                      CAST(round((${dotSqlN("c.vec", "c.vec", 64)}
                                  - 2 * ${dotSqlN("c.vec", "cen.cvec", 64)}
                                  + ${dotSqlN("cen.cvec", "cen.cvec", 64)}) * 1e6) AS BIGINT) AS d2u
               FROM asg JOIN c ON c.id = asg.id JOIN cen ON cen.cid = asg.cell),
         g AS (SELECT cell, count(*) AS n_vectors,
                      CAST(sum(d2u) AS BIGINT) AS sum_d2_micro,
                      CAST(sum(d2u) AS BIGINT) // count(*) AS mean_d2_micro
               FROM d GROUP BY cell)
         SELECT cen.cid AS cell,
                coalesce(n_vectors, CAST(0 AS BIGINT)) AS n_vectors,
                coalesce(sum_d2_micro, CAST(0 AS BIGINT)) AS sum_d2_micro,
                coalesce(mean_d2_micro, CAST(0 AS BIGINT)) AS mean_d2_micro
         FROM cen LEFT JOIN g ON g.cell = cen.cid ORDER BY cell""",
    // Streaming quality gate: the stateless map-only scorer must emit
    // exactly the batch scorer's rows — q83's oracle minus its mean.
    "q92_streaming_quality" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id)
         SELECT doc_id, n_tokens, score, score >= 0 AS keep
         FROM s ORDER BY doc_id""",
    // Winnowing: word 4-gram hashes, min per 4-hash window, distinct
    // set per doc; shared = fingerprint in >= 2 distinct docs.
    "q93_winnowing" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT doc_id, len(ws) - 3 AS m,
                      list_transform(range(len(ws) - 3),
                        i -> ('0x' || substr(md5(array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 4 AS BIGINT)], ' ')), 1, 15))::BIGINT) AS gh
               FROM w WHERE len(ws) >= 4),
         f AS (SELECT doc_id, m, greatest(m - 3, 1) AS nw,
                      list_distinct(list_transform(range(greatest(m - 3, 1)),
                        j -> list_min(gh[CAST(j + 1 AS BIGINT):CAST(j + 4 AS BIGINT)]))) AS fps
               FROM g),
         e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
         sh AS (SELECT fp FROM e GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
         sc AS (SELECT e.doc_id, count(*) AS cnt
                FROM e JOIN sh USING (fp) GROUP BY e.doc_id)
         SELECT f.doc_id, CAST(m AS BIGINT) AS n_grams,
                CAST(nw AS BIGINT) AS n_windows,
                CAST(len(fps) AS BIGINT) AS n_fp,
                CAST(coalesce(cnt, 0) AS BIGINT) AS n_shared_fp
         FROM f LEFT JOIN sc USING (doc_id)
         ORDER BY f.doc_id""",
    // Packing split: the q75 window plus head/tail integer math
    // (head = min(n, budget - offset); tail spills into bin+1).
    "q94_packing_split" ->
      """WITH t AS (SELECT lang, doc_id,
                           len(string_split(text, ' ')) AS n_tokens
                    FROM documents
                    WHERE len(string_split(text, ' ')) <= 512),
         c AS (SELECT lang, doc_id, n_tokens,
                      SUM(n_tokens) OVER (PARTITION BY lang
                        ORDER BY doc_id) AS cum
               FROM t),
         p AS (SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                      CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
                      CAST((cum - n_tokens) % 512 AS BIGINT) AS bin_offset
               FROM c)
         SELECT lang, doc_id, n_tokens, bin, bin_offset,
                least(n_tokens, 512 - bin_offset) AS head_tokens,
                n_tokens - least(n_tokens, 512 - bin_offset) AS tail_tokens
         FROM p ORDER BY lang, doc_id""",
    // Training manifest: q83's gate, q20's min-id dedup over the kept
    // set, q61's chunk-count formula (32/32), q75's packing window at
    // budget 64 plus the q94 split — one composed oracle.
    "q95_training_manifest" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         fw AS (SELECT doc_id,
                       (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
                FROM tk WHERE tok <> ''),
         kept AS (SELECT doc_id FROM fw GROUP BY doc_id HAVING CAST(sum(w) AS BIGINT) >= 0),
         surv AS (SELECT MIN(doc_id) AS doc_id FROM documents
                  WHERE doc_id IN (SELECT doc_id FROM kept)
                  GROUP BY lower(trim(text))),
         d AS (SELECT dd.doc_id, dd.lang,
                      len(string_split(dd.text, ' ')) AS n
               FROM documents dd JOIN surv USING (doc_id)),
         ch AS (SELECT doc_id, lang, n,
                       unnest(range(1 + CAST(ceil(greatest(n - 32, 0) / 32.0) AS BIGINT))) AS chunk_idx
                FROM d),
         cc AS (SELECT lang, doc_id * 100000 + chunk_idx AS chunk_id, doc_id, chunk_idx,
                       least(32, n - chunk_idx * 32) AS n_tokens
                FROM ch),
         cm AS (SELECT lang, chunk_id, doc_id, chunk_idx, n_tokens,
                       SUM(n_tokens) OVER (PARTITION BY lang ORDER BY chunk_id) AS cum
                FROM cc),
         p AS (SELECT lang, chunk_id, doc_id, chunk_idx,
                      CAST(n_tokens AS BIGINT) AS n_tokens,
                      CAST((cum - n_tokens) // 64 AS BIGINT) AS bin,
                      CAST((cum - n_tokens) % 64 AS BIGINT) AS bin_offset
               FROM cm)
         SELECT lang, chunk_id, doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                n_tokens, bin, bin_offset,
                least(n_tokens, 64 - bin_offset) AS head_tokens,
                n_tokens - least(n_tokens, 64 - bin_offset) AS tail_tokens
         FROM p ORDER BY lang, chunk_id""",
    // Semantic contamination: q25's exact cosine ranking at k=1 with
    // the q24 near-dup flag.
    "q96_semantic_contamination" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         scored AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
                    FROM q JOIN c ON qid <> id)
         SELECT qid, id AS nearest_id, cos, cos >= 0.4 AS contaminated FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank = 1 ORDER BY qid""",
    // Data card: doc facts + exploded-token facts per lang, integer
    // milli-mean (non-negative, so // == div).
    "q97_data_card" ->
      """WITH df AS (SELECT lang, count(*) AS n_docs,
                            count(DISTINCT lower(trim(text))) AS n_distinct_texts,
                            count(DISTINCT source) AS n_sources,
                            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                     FROM documents GROUP BY lang),
         tf AS (SELECT lang, count(DISTINCT t) AS distinct_words
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents) x
                WHERE t <> '' GROUP BY lang)
         SELECT df.lang, n_docs,
                n_docs - n_distinct_texts AS n_exact_dups,
                n_sources, total_tokens,
                total_tokens * 1000 // n_docs AS mean_tokens_milli,
                distinct_words
         FROM df JOIN tf USING (lang) ORDER BY df.lang""",
    // Snapshot diff: digest-compare full-outer join over the two
    // deterministically derived snapshots; non-unchanged rows only.
    "q98_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h_old
                    FROM documents WHERE doc_id % 10 <> 3),
         n AS (SELECT doc_id,
                      md5(CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                               ELSE text END) AS h_new
               FROM documents WHERE doc_id % 10 <> 7),
         d AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                      CASE WHEN h_old IS NULL THEN 'added'
                           WHEN h_new IS NULL THEN 'removed'
                           WHEN h_old <> h_new THEN 'changed'
                           ELSE 'unchanged' END AS status
               FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
         SELECT doc_id, status FROM d
         WHERE status <> 'unchanged' ORDER BY doc_id""",
    // Matryoshka: cosine in the first 16 dims (slice is 1-based
    // inclusive in both engines; norms over the SLICED arrays), each
    // truncated hit flagged against the full-64-dim top-5.
    "q99_matryoshka_ann" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         ts AS (SELECT qid, id,
                       round(${dotSqlN("qvec", "vec", 16)} /
                         (sqrt(${dotSqlN("qvec", "qvec", 16)}) *
                          sqrt(${dotSqlN("vec", "vec", 16)})), 6) AS cos
                FROM q JOIN c ON qid <> id),
         tr AS (SELECT qid, id, cos,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, id) AS rank
                FROM ts),
         fs AS (SELECT qid, id FROM (
                  SELECT qid, id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
                  FROM q JOIN c ON qid <> id) x WHERE r <= 5)
         SELECT t.qid, CAST(t.rank AS BIGINT) AS rank, t.id,
                t.cos AS cos_trunc,
                CAST(CASE WHEN f.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS in_full_topk
         FROM tr t LEFT JOIN fs f ON t.qid = f.qid AND t.id = f.id
         WHERE t.rank <= 5 ORDER BY t.qid, t.rank""",
    // Length buckets: pow-2 CASE chain, salted-52-bit shard, in-shard
    // row_number packing — all integer, both engines identical.
    "q100_length_buckets" ->
      """WITH t AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                           ('0x' || substr(md5('lb:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT % 4 AS shard
                    FROM documents),
         b AS (SELECT doc_id, n_tokens, shard,
                      CASE WHEN n_tokens <= 16 THEN 16
                           WHEN n_tokens <= 32 THEN 32
                           WHEN n_tokens <= 64 THEN 64
                           WHEN n_tokens <= 128 THEN 128
                           WHEN n_tokens <= 256 THEN 256
                           ELSE 512 END AS bucket_len
               FROM t)
         SELECT doc_id, n_tokens, CAST(bucket_len AS BIGINT) AS bucket_len,
                CAST(shard AS BIGINT) AS shard,
                CAST((row_number() OVER (PARTITION BY bucket_len, shard
                       ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch,
                CAST(bucket_len - least(n_tokens, bucket_len) AS BIGINT) AS pad_tokens
         FROM b ORDER BY doc_id""",
    // Containment: distinct word-3-gram sets, df-capped postings
    // self-join, integer-ppm containment both directions; gram
    // identity (string here ≡ 60-bit md5 on the Spark side, the q81
    // convention).
    "q101_containment_pairs" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT DISTINCT doc_id, gram FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(len(ws) - 2),
                          i -> array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 3 AS BIGINT)], ' '))) AS gram
                 FROM w WHERE len(ws) >= 3) x),
         sz AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
         dfc AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 100),
         r AS (SELECT g.doc_id, g.gram FROM g JOIN dfc USING (gram)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      count(*) AS n_shared
               FROM r a JOIN r b ON a.gram = b.gram AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
         SELECT id_a, id_b, n_shared, sa.ng AS na, sb.ng AS nb,
                n_shared * 1000000 // sa.ng AS cont_a_ppm,
                n_shared * 1000000 // sb.ng AS cont_b_ppm
         FROM p JOIN sz sa ON p.id_a = sa.doc_id
                JOIN sz sb ON p.id_b = sb.doc_id
         WHERE greatest(n_shared * 1000000 // sa.ng,
                        n_shared * 1000000 // sb.ng) >= 300000
         ORDER BY id_a, id_b""",
    // Score calibration: within-source integer-ppm percentile with
    // (score, doc_id) tie-break; single-member sources -> 0.
    "q102_score_calibration" ->
      """WITH t AS (SELECT doc_id, source,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS score
                    FROM documents),
         r AS (SELECT doc_id, source, score,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY score, doc_id) AS BIGINT) AS rk,
                      CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
               FROM t)
         SELECT doc_id, source, score,
                CASE WHEN n = 1 THEN 0
                     ELSE (rk - 1) * 1000000 // (n - 1) END AS pct_ppm
         FROM r ORDER BY doc_id""",
    // LSH index delta: q98's digest diff picks the delta docs, then
    // raw (uncapped) 64-hash/4-band MinHash keys — del from OLD text,
    // ins from NEW text. Same signature algebra as the q21 fragment.
    "q103_lsh_index_delta" ->
      s"""WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3),
         nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 7),
         st AS (SELECT COALESCE(o.doc_id, nw.doc_id) AS doc_id,
                       CASE WHEN o.doc_id IS NULL THEN 'added'
                            WHEN nw.doc_id IS NULL THEN 'removed'
                            WHEN md5(o.text) <> md5(nw.text) THEN 'changed'
                            ELSE 'unchanged' END AS status
                FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id),
         dd AS (SELECT 'del' AS op, o.doc_id, o.text
                FROM o JOIN st USING (doc_id)
                WHERE status IN ('removed', 'changed')
                UNION ALL
                SELECT 'ins' AS op, nw.doc_id, nw.text
                FROM nw JOIN st USING (doc_id)
                WHERE status IN ('added', 'changed')),
         w AS (SELECT op, doc_id,
                      unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
               FROM dd),
         hb AS (SELECT op, doc_id,
                       ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS h
                FROM w),
         hs AS (SELECT op, doc_id, c.i AS i,
                       MIN((h * c.a + c.b) % 2147483647) AS sig
                FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(64)}) AS c(i, a, b)
                GROUP BY op, doc_id, c.i),
         bands AS (SELECT op, doc_id, i // 16 AS band,
                          string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                   FROM hs GROUP BY op, doc_id, (i // 16))
         SELECT op, doc_id AS id, CAST(band AS BIGINT) AS band, key
         FROM bands ORDER BY op, id, band""",
    // Signal correlations: exact integer sums, closed-form Pearson in
    // double with the SAME expression shape as the Scala side;
    // zero-variance guard -> NULL.
    "q104_signal_correlations" ->
      """WITH t AS (SELECT CAST(n_chars AS BIGINT) AS a,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS b,
                           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS c
                    FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      CAST(sum(a) AS DOUBLE) AS sa, CAST(sum(a*a) AS DOUBLE) AS ssa,
                      CAST(sum(b) AS DOUBLE) AS sb, CAST(sum(b*b) AS DOUBLE) AS ssb,
                      CAST(sum(c) AS DOUBLE) AS sc, CAST(sum(c*c) AS DOUBLE) AS ssc,
                      CAST(sum(a*b) AS DOUBLE) AS sab,
                      CAST(sum(a*c) AS DOUBLE) AS sac,
                      CAST(sum(b*c) AS DOUBLE) AS sbc
               FROM t)
         SELECT sig_a, sig_b, corr FROM (
           SELECT 'n_chars' AS sig_a, 'n_tokens' AS sig_b,
                  CASE WHEN (n*ssa - sa*sa) * (n*ssb - sb*sb) > 0
                       THEN round((n*sab - sa*sb) /
                              sqrt((n*ssa - sa*sa) * (n*ssb - sb*sb)), 6)
                       ELSE NULL END AS corr
           FROM s
           UNION ALL
           SELECT 'n_chars', 'n_distinct',
                  CASE WHEN (n*ssa - sa*sa) * (n*ssc - sc*sc) > 0
                       THEN round((n*sac - sa*sc) /
                              sqrt((n*ssa - sa*sa) * (n*ssc - sc*sc)), 6)
                       ELSE NULL END
           FROM s
           UNION ALL
           SELECT 'n_tokens', 'n_distinct',
                  CASE WHEN (n*ssb - sb*sb) * (n*ssc - sc*sc) > 0
                       THEN round((n*sbc - sb*sc) /
                              sqrt((n*ssb - sb*sb) * (n*ssc - sc*sc)), 6)
                       ELSE NULL END
           FROM s) x
         ORDER BY sig_a, sig_b""",
    // Keep-best near-dup dedup: q57's recursive-CTE closure, but the
    // per-component keeper is argmax(token count) with min-id tiebreak.
    "q105_neardup_keep_best" ->
      s"""WITH RECURSIVE ${nearDupComponentsSql},
         q AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS qual
               FROM sdocs),
         losers AS (SELECT d AS doc_id FROM (
             SELECT comp.d,
                    row_number() OVER (PARTITION BY comp.label
                      ORDER BY q.qual DESC, comp.d) AS rn
             FROM comp JOIN q ON q.doc_id = comp.d) t
           WHERE rn > 1)
         SELECT doc_id, lang, source FROM sdocs
         WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         ORDER BY doc_id""",
    // Contamination spans: positional word 3-grams, eval = doc_id<20;
    // maximal runs via the gaps-and-islands identity; a run of r grams
    // spans r + 2 tokens. Only contaminated docs (n_hit > 0) emit.
    "q106_contamination_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                      ('0x' || substr(md5(array_to_string(
                        ws[CAST(pos + 1 AS BIGINT):CAST(pos + 3 AS BIGINT)], ' ')),
                        1, 15))::BIGINT AS gh
               FROM (SELECT doc_id, ws, unnest(range(len(ws) - 2)) AS pos
                     FROM w WHERE len(ws) >= 3)),
         ev AS (SELECT DISTINCT gh FROM g WHERE doc_id < 20),
         cg AS (SELECT doc_id, pos, gh FROM g WHERE doc_id >= 20),
         hit AS (SELECT cg.doc_id, cg.pos FROM cg JOIN ev USING (gh)),
         isl AS (SELECT doc_id,
                        pos - row_number() OVER (PARTITION BY doc_id
                          ORDER BY pos) AS grp
                 FROM hit),
         runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS run
                  FROM isl GROUP BY doc_id, grp),
         agg AS (SELECT doc_id, max(run) AS max_run,
                        CAST(sum(run) AS BIGINT) AS n_hit
                 FROM runs GROUP BY doc_id),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                 FROM cg GROUP BY doc_id)
         SELECT t.doc_id, t.n_grams, a.n_hit, a.max_run,
                a.max_run + 2 AS span_tokens
         FROM tot t JOIN agg a USING (doc_id)
         ORDER BY t.doc_id""",
    // Fractional upsampling: ceil-ppm rate per source; each doc emits
    // rate//1e6 whole copies + 1 iff its 'up:'-salted hash bucket is
    // under rate%1e6. range(n) unnest mirrors Spark's sequence explode.
    "q107_upsample" ->
      """WITH c AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS n
                    FROM documents GROUP BY source),
         t AS (SELECT src,
                      (n * (2 * (('0x' || substr(md5(src), 1, 15))::BIGINT % 3) + 1)) // 2 AS target_n
               FROM c),
         r AS (SELECT c.src,
                      (coalesce(t.target_n, 0) * 1000000 + n - 1) // n AS rate_ppm
               FROM c LEFT JOIN t USING (src)),
         d AS (SELECT doc_id, source,
                      ('0x' || substr(md5('up:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS b
               FROM documents),
         nc AS (SELECT doc_id, d.source,
                       rate_ppm // 1000000 +
                         CASE WHEN b < rate_ppm % 1000000 THEN 1 ELSE 0 END AS n_copies
                FROM d JOIN r ON r.src = d.source)
         SELECT doc_id, source, CAST(unnest(range(n_copies)) AS BIGINT) AS copy
         FROM nc WHERE n_copies >= 1
         ORDER BY doc_id, copy""",
    // Zipf audit: top-100 vocab by (freq DESC, token ASC); ln(rank)/
    // ln(freq) quantized to integer micro-nats before the regression
    // sums; closed-form slope/intercept/r2 in double, round 6.
    "q108_zipf_audit" ->
      """WITH v AS (SELECT t, CAST(count(*) AS BIGINT) AS n_w
                    FROM (SELECT unnest(string_split(text, ' ')) AS t
                          FROM documents) x
                    WHERE t <> '' GROUP BY t
                    ORDER BY n_w DESC, t LIMIT 100),
         q AS (SELECT CAST(round(ln(CAST(row_number() OVER
                        (ORDER BY n_w DESC, t) AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                      CAST(round(ln(CAST(n_w AS DOUBLE)) * 1e6) AS BIGINT) AS y
               FROM v),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x*x) AS BIGINT) AS sxx,
                      CAST(sum(y*y) AS BIGINT) AS syy,
                      CAST(sum(x*y) AS BIGINT) AS sxy
               FROM q)
         SELECT n AS n_terms,
                CASE WHEN CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx > 0
                     THEN round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) /
                            (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx), 6)
                     ELSE NULL END AS slope,
                CASE WHEN CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx > 0
                     THEN round((CAST(sy AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sxy) /
                            (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) / 1e6, 6)
                     ELSE NULL END AS intercept,
                CASE WHEN CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx > 0
                      AND CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy > 0
                     THEN round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) *
                                (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) /
                            ((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) *
                             (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)), 6)
                     ELSE NULL END AS r2
         FROM s""",
    // Ranking metrics: q26's SRP bucketing and retriever pair at k=10;
    // recall@10 in ppm, reciprocal rank of the first relevant hit in
    // micro units — all integer division.
    "q109_ranking_metrics" ->
      s"""WITH vb AS (SELECT vec_id, b,
                list_sum(list_transform(range(64), d ->
                  embedding[CAST(d + 1 AS INTEGER)]::DOUBLE *
                  (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                        THEN 1.0 ELSE -1.0 END))) AS proj
              FROM embeddings CROSS JOIN (SELECT unnest(range(6)) AS b)),
         bk AS (SELECT vec_id,
                       CAST(SUM(CASE WHEN proj > 0 THEN 1::BIGINT << CAST(b AS INTEGER)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM vb GROUP BY vec_id),
         q AS (SELECT e.vec_id AS qid, e.embedding AS qvec, bk.bucket AS qbucket
               FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id WHERE e.vec_id < 20),
         c AS (SELECT e.vec_id AS id, e.embedding AS vec, bk.bucket
               FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id),
         exact AS (SELECT qid, id FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
             FROM q JOIN c ON qid <> id) t WHERE r <= 10),
         lsh AS (SELECT qid, id, r FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
             FROM q JOIN c ON qid <> id AND qbucket = bucket) t WHERE r <= 10),
         hits AS (SELECT l.qid, CAST(count(*) AS BIGINT) AS n_hits,
                         CAST(min(l.r) AS BIGINT) AS first_r
                  FROM lsh l JOIN exact x ON l.qid = x.qid AND l.id = x.id
                  GROUP BY l.qid)
         SELECT q.qid, COALESCE(h.n_hits, 0) AS n_hits,
                COALESCE(h.n_hits, 0) * 1000000 // 10 AS recall_ppm,
                COALESCE(1000000 // h.first_r, 0) AS rr_micro
         FROM q LEFT JOIN hits h ON q.qid = h.qid
         ORDER BY q.qid""",
    // Rare-token scrub: document frequency per token; df < 2 masks to
    // <unk>; string_agg ORDER BY pos mirrors the collect-sort-join
    // reassembly.
    "q110_rare_token_scrub" ->
      """WITH tk AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                            ws[CAST(pos + 1 AS BIGINT)] AS tok
                     FROM (SELECT doc_id, string_split(text, ' ') AS ws,
                                  unnest(range(len(ws))) AS pos
                           FROM documents)),
         r AS (SELECT tok FROM tk GROUP BY tok
               HAVING count(DISTINCT doc_id) < 2),
         o AS (SELECT tk.doc_id, tk.pos,
                      CASE WHEN r.tok IS NOT NULL THEN '<unk>' ELSE tk.tok END AS tok2,
                      CASE WHEN r.tok IS NOT NULL THEN 1 ELSE 0 END AS sc
               FROM tk LEFT JOIN r USING (tok))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(sc) AS BIGINT) AS n_scrubbed,
                string_agg(tok2, ' ' ORDER BY pos) AS text
         FROM o GROUP BY doc_id ORDER BY doc_id""",
    // Centroid drift: micro-unit quantized per-(label, dim) integer
    // sums; cos(sum) = cos(mean); dims summed left-to-right in double.
    "q111_centroid_drift" ->
      """WITH o AS (SELECT label, embedding FROM embeddings WHERE vec_id % 10 <> 3),
         nw AS (SELECT label, embedding FROM embeddings WHERE vec_id % 10 <> 7),
         oq AS (SELECT label, d,
                       CAST(sum(CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e6) AS BIGINT)) AS BIGINT) AS s
                FROM o CROSS JOIN (SELECT unnest(range(64)) AS d)
                GROUP BY label, d),
         nq AS (SELECT label, d,
                       CAST(sum(CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e6) AS BIGINT)) AS BIGINT) AS s
                FROM nw CROSS JOIN (SELECT unnest(range(64)) AS d)
                GROUP BY label, d),
         oa AS (SELECT label, list(s ORDER BY d) AS so FROM oq GROUP BY label),
         na AS (SELECT label, list(s ORDER BY d) AS sn FROM nq GROUP BY label),
         oc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_old FROM o GROUP BY label),
         nc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_new FROM nw GROUP BY label)
         SELECT oc.label AS grp, n_old, n_new,
                CASE WHEN list_sum(list_transform(range(64), i ->
                            so[CAST(i + 1 AS INTEGER)]::DOUBLE * so[CAST(i + 1 AS INTEGER)]::DOUBLE)) > 0
                      AND list_sum(list_transform(range(64), i ->
                            sn[CAST(i + 1 AS INTEGER)]::DOUBLE * sn[CAST(i + 1 AS INTEGER)]::DOUBLE)) > 0
                     THEN round(
                       list_sum(list_transform(range(64), i ->
                         so[CAST(i + 1 AS INTEGER)]::DOUBLE * sn[CAST(i + 1 AS INTEGER)]::DOUBLE)) /
                       (sqrt(list_sum(list_transform(range(64), i ->
                          so[CAST(i + 1 AS INTEGER)]::DOUBLE * so[CAST(i + 1 AS INTEGER)]::DOUBLE))) *
                        sqrt(list_sum(list_transform(range(64), i ->
                          sn[CAST(i + 1 AS INTEGER)]::DOUBLE * sn[CAST(i + 1 AS INTEGER)]::DOUBLE)))), 6)
                     ELSE NULL END AS centroid_cos
         FROM oc JOIN oa USING (label) JOIN na USING (label) JOIN nc USING (label)
         ORDER BY grp""",
    // Dup-span scrub: positions covered by a >=2-distinct-doc 5-gram
    // are removed; docs reassembled from survivors (gram compared by
    // STRING here vs 60-bit md5 hash in Spark — same classification,
    // the q81 adjudication).
    "q112_dup_span_scrub" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         tk AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                       ws[CAST(pos + 1 AS BIGINT)] AS tok
                FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS pos FROM w)),
         g AS (SELECT doc_id, CAST(s AS BIGINT) AS s,
                      array_to_string(ws[CAST(s + 1 AS BIGINT):CAST(s + 5 AS BIGINT)], ' ') AS gram
               FROM (SELECT doc_id, ws, unnest(range(len(ws) - 4)) AS s
                     FROM w WHERE len(ws) >= 5)),
         d AS (SELECT gram FROM g GROUP BY gram
               HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT g.doc_id, g.s + u.i AS pos
                 FROM g JOIN d USING (gram)
                 CROSS JOIN (SELECT CAST(unnest(range(5)) AS BIGINT) AS i) u),
         o AS (SELECT tk.doc_id, tk.pos, tk.tok,
                      (cov.pos IS NOT NULL) AS cv
               FROM tk LEFT JOIN cov
                 ON tk.doc_id = cov.doc_id AND tk.pos = cov.pos)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(count(CASE WHEN cv THEN 1 END) AS BIGINT) AS n_removed,
                coalesce(string_agg(CASE WHEN NOT cv THEN tok END,
                                    ' ' ORDER BY pos), '') AS text
         FROM o GROUP BY doc_id ORDER BY doc_id""",
    // DSIR weights: per-bucket micro-nat log ratios quantize BEFORE
    // the per-doc integer sum; keep is a sign test (no negative
    // integer division — Spark div truncates, DuckDB // floors).
    "q113_dsir_weights" ->
      """WITH tk AS (SELECT doc_id,
                            ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
                     FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                           FROM documents)
                     WHERE tok <> ''),
         tt AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
                FROM (SELECT unnest(string_split(text, ' ')) AS tok
                      FROM documents WHERE lang = 'en')
                WHERE tok <> ''),
         rc AS (SELECT b, count(*) AS n_raw FROM tk GROUP BY b),
         tc AS (SELECT b, count(*) AS n_tgt FROM tt GROUP BY b),
         j AS (SELECT coalesce(rc.b, tc.b) AS b,
                      coalesce(n_raw, 0) AS n_raw, coalesce(n_tgt, 0) AS n_tgt
               FROM rc FULL JOIN tc ON rc.b = tc.b),
         tot AS (SELECT CAST(sum(n_raw) AS BIGINT) AS t_raw,
                        CAST(sum(n_tgt) AS BIGINT) AS t_tgt FROM j),
         wt AS (SELECT b,
                       CAST(round(ln(
                         (CAST(n_tgt + 1 AS DOUBLE) / CAST(t_tgt + 1024 AS DOUBLE)) /
                         (CAST(n_raw + 1 AS DOUBLE) / CAST(t_raw + 1024 AS DOUBLE))) * 1e6)
                         AS BIGINT) AS w
                FROM j CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(w) AS BIGINT) AS logratio_micro,
                (sum(w) >= 0) AS keep
         FROM tk JOIN wt USING (b) GROUP BY doc_id ORDER BY doc_id""",
    // CCNet buckets: q67's surprisal mean -> q102's per-group ppm
    // percentile (group = lang) -> integer third cuts; head = lowest.
    "q114_ccnet_buckets" ->
      """WITH toks AS (SELECT doc_id, t
                       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                             FROM documents) u
                       WHERE t <> ''),
         vocab AS (SELECT t, COUNT(*) AS n_w FROM toks GROUP BY t),
         tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM vocab),
         sc AS (SELECT doc_id,
                       CAST(round(-ln(CAST(n_w AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1e6)
                            AS BIGINT) AS s_micro
                FROM toks JOIN vocab USING (t) CROSS JOIN tot),
         m AS (SELECT doc_id, CAST(SUM(s_micro) AS BIGINT) // COUNT(*) AS score
               FROM sc GROUP BY doc_id),
         l AS (SELECT m.doc_id, lang, score FROM m JOIN documents USING (doc_id)),
         r AS (SELECT doc_id, lang, score,
                      CAST(row_number() OVER (PARTITION BY lang
                        ORDER BY score, doc_id) AS BIGINT) AS rk,
                      CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
               FROM l),
         p AS (SELECT doc_id, lang, score,
                      CASE WHEN n = 1 THEN 0
                           ELSE (rk - 1) * 1000000 // (n - 1) END AS pct_ppm
               FROM r)
         SELECT doc_id, lang, score, pct_ppm,
                CASE WHEN pct_ppm * 3 < 1000000 THEN 'head'
                     WHEN pct_ppm * 3 < 2000000 THEN 'middle'
                     ELSE 'tail' END AS bucket
         FROM p ORDER BY doc_id""",
    // Budget select: the q83 scorer, then one running sum over
    // (score DESC, doc_id) <= 15000 — the oracle affords the global
    // sort the Spark side decomposes away.
    "q115_budget_select" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                      CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id),
         r AS (SELECT doc_id, score, n_tokens,
                      CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
               FROM s)
         SELECT doc_id, score, n_tokens, cum_tokens
         FROM r WHERE cum_tokens <= 15000 ORDER BY doc_id""",
    // Leakage-safe split: doc -> exact-group keeper -> near-dup
    // component label (the q34/q105 recursive machinery) -> salted
    // 52-bit hash of the root, ppm-thresholded 10/10/80.
    "q116_leakage_split" ->
      s"""WITH RECURSIVE groups AS (SELECT lower(trim(text)) AS k,
                                           MIN(doc_id) AS keeper
                                    FROM documents GROUP BY 1),
         wk AS (SELECT d.doc_id, g.keeper FROM documents d
                JOIN groups g ON lower(trim(d.text)) = g.k),
         ${nearDupComponentsSql},
         rooted AS (SELECT wk.doc_id,
                           coalesce(comp.label, wk.keeper) AS root
                    FROM wk LEFT JOIN comp ON comp.d = wk.keeper),
         sp AS (SELECT doc_id, root,
                       ('0x' || substr(md5('split:' || CAST(root AS VARCHAR)), 1, 13))::BIGINT % 1000000 AS b
                FROM rooted)
         SELECT doc_id, root,
                CASE WHEN b < 100000 THEN 'test'
                     WHEN b < 200000 THEN 'val'
                     ELSE 'train' END AS split
         FROM sp ORDER BY doc_id""",
    // Centroid outliers: q111's micro-unit integer sum vector per
    // label; cos(v, sum) left-to-right in double, round 6; outlier =
    // cos < 0.0, degenerate rows flag with null cosine.
    "q117_centroid_outliers" ->
      """WITH q AS (SELECT label, d,
                           CAST(sum(CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e6) AS BIGINT)) AS BIGINT) AS s
                    FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS d)
                    GROUP BY label, d),
         a AS (SELECT label, list(s ORDER BY d) AS sv FROM q GROUP BY label),
         c AS (SELECT vec_id AS id, e.label AS grp,
                      CASE WHEN list_sum(list_transform(range(64), i ->
                                  embedding[CAST(i + 1 AS INTEGER)]::DOUBLE * embedding[CAST(i + 1 AS INTEGER)]::DOUBLE)) > 0
                            AND list_sum(list_transform(range(64), i ->
                                  sv[CAST(i + 1 AS INTEGER)]::DOUBLE * sv[CAST(i + 1 AS INTEGER)]::DOUBLE)) > 0
                           THEN round(
                             list_sum(list_transform(range(64), i ->
                               embedding[CAST(i + 1 AS INTEGER)]::DOUBLE * sv[CAST(i + 1 AS INTEGER)]::DOUBLE)) /
                             (sqrt(list_sum(list_transform(range(64), i ->
                                embedding[CAST(i + 1 AS INTEGER)]::DOUBLE * embedding[CAST(i + 1 AS INTEGER)]::DOUBLE))) *
                              sqrt(list_sum(list_transform(range(64), i ->
                                sv[CAST(i + 1 AS INTEGER)]::DOUBLE * sv[CAST(i + 1 AS INTEGER)]::DOUBLE)))), 6)
                           ELSE NULL END AS cos_centroid
               FROM embeddings e JOIN a USING (label))
         SELECT id, grp, cos_centroid,
                coalesce(cos_centroid < 0.0, TRUE) AS outlier
         FROM c ORDER BY id""",
    // Char-class signals over customer addresses: regexp length deltas
    // (DuckDB needs the 'g' flag; Spark replaces all by default).
    "q118_char_class_signals" ->
      """WITH t AS (SELECT event_id AS doc_id, props AS a FROM events
                    WHERE length(props) > 0),
         c AS (SELECT doc_id, CAST(length(a) AS BIGINT) AS n_chars,
                      CAST(length(a) - length(regexp_replace(a, '[A-Za-z]', '', 'g')) AS BIGINT) AS l,
                      CAST(length(a) - length(regexp_replace(a, '[0-9]', '', 'g')) AS BIGINT) AS d,
                      CAST(length(a) - length(regexp_replace(a, '\s', '', 'g')) AS BIGINT) AS w,
                      CAST(length(a) - length(regexp_replace(a, '[\[\]{}()<>;]', '', 'g')) AS BIGINT) AS b
               FROM t)
         SELECT doc_id, n_chars,
                l * 1000000 // n_chars AS letter_ppm,
                d * 1000000 // n_chars AS digit_ppm,
                w * 1000000 // n_chars AS space_ppm,
                (n_chars - l - d - w) * 1000000 // n_chars AS symbol_ppm,
                b * 1000000 // n_chars AS bracket_ppm,
                (b * 1000000 // n_chars >= 20000 OR
                 (n_chars - l - d - w) * 1000000 // n_chars >= 150000) AS codey
         FROM c ORDER BY doc_id""",
    // Template grams: per-source word-3-gram counts, top-3 by
    // (count desc, gram asc), ppm share of the source's gram total.
    "q119_template_grams" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT source,
                      array_to_string(ws[CAST(s + 1 AS BIGINT):CAST(s + 3 AS BIGINT)], ' ') AS gram
               FROM (SELECT source, ws, unnest(range(len(ws) - 2)) AS s
                     FROM w WHERE len(ws) >= 3)),
         c AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS n_occ
               FROM g GROUP BY source, gram),
         t AS (SELECT source, CAST(sum(n_occ) AS BIGINT) AS tot
               FROM c GROUP BY source),
         r AS (SELECT source, gram, n_occ,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY n_occ DESC, gram) AS BIGINT) AS rank
               FROM c)
         SELECT r.source, r.rank, r.gram, r.n_occ,
                r.n_occ * 1000000 // t.tot AS share_ppm
         FROM r JOIN t USING (source)
         WHERE r.rank <= 3 ORDER BY r.source, r.rank""",
    // Funnel: strict order of first touches (m0 < m1 < ... all
    // present); exact integer ppm vs step 1.
    "q120_funnel" -> funnelOracleSql,
    // Cohort retention triangle: first-activity day x offset 0..14.
    "q121_cohort_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, ts::DATE AS d FROM events),
         c AS (SELECT u, min(d) AS cd FROM ud GROUP BY u)
         SELECT CAST(cd AS VARCHAR) AS cohort_day,
                CAST(d - cd AS BIGINT) AS offset_days,
                count(*) AS n_users
         FROM ud JOIN c USING (u)
         WHERE d - cd <= 14
         GROUP BY cd, d - cd ORDER BY 1, 2""",
    // Markov transitions: per-user (ts, event_id)-ordered bigrams,
    // exact integer row-conditional ppm.
    "q122_transition_matrix" ->
      """WITH p AS (SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS to_type
             FROM events),
         c AS (SELECT from_type, to_type, count(*) AS n_trans
               FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
                CAST(n_trans * 1000000 //
                     sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
                  AS prob_ppm
         FROM c ORDER BY from_type, to_type""",
    // Trailing z-score: stats over the previous 7 PRESENT days
    // (rows-based); variance from exact integer sums; the double
    // expression mirrors the Spark operand order op-for-op.
    "q123_trailing_zscore" ->
      """WITH daily AS (SELECT event_type AS key, ts::DATE AS d,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
         w AS (SELECT key, d, n,
                      count(n) OVER win AS cnt,
                      CAST(sum(n) OVER win AS BIGINT) AS s,
                      CAST(sum(n * n) OVER win AS BIGINT) AS ss
               FROM daily
               WINDOW win AS (PARTITION BY key ORDER BY d
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         z AS (SELECT key, CAST(d AS VARCHAR) AS day, n,
                      CASE WHEN cnt = 7 AND ss * 7 - s * s > 0
                           THEN round((CAST(n AS DOUBLE)
                                       - CAST(s AS DOUBLE) / 7.0)
                                      / (sqrt(CAST(ss * 7 - s * s AS DOUBLE))
                                         / 7.0), 6)
                      END AS z
               FROM w)
         SELECT key, day, n, z,
                coalesce(abs(z) >= 3.0, FALSE) AS anomaly
         FROM z ORDER BY key, day""",
    // Co-occurrence: distinct (order, part) baskets, mega-baskets
    // (>8 items) dropped whole, global top-20 by (n_both, pair).
    "q124_cooccurrence_topk" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                     FROM lineitem),
         sized AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 8),
         kept AS (SELECT bi.b, bi.i FROM bi JOIN sized USING (b)),
         itemn AS (SELECT i, CAST(count(*) AS BIGINT) AS n_item
                   FROM kept GROUP BY i),
         pairn AS (SELECT a.i AS item_a, c.i AS item_b,
                          CAST(count(*) AS BIGINT) AS n_both
                   FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
                   GROUP BY 1, 2)
         SELECT item_a, item_b, n_both, na.n_item AS n_a, nb.n_item AS n_b,
                round(CAST(n_both AS DOUBLE)
                      / sqrt(CAST(na.n_item * nb.n_item AS DOUBLE)), 6)
                  AS cosine
         FROM pairn
         JOIN itemn na ON pairn.item_a = na.i
         JOIN itemn nb ON pairn.item_b = nb.i
         ORDER BY n_both DESC, item_a, item_b LIMIT 20""",
    // Data profile over documents (all BIGINT/VARCHAR — no float or
    // timestamp string-cast hazards across engines). Branches are
    // GENERATED from documentsProfileCols — the same Seq the q125
    // Spark side projects — so the two sides cannot silently diverge
    // on schema drift.
    "q125_data_profile" -> {
      val branches = documentsProfileCols.map { c =>
        s"""SELECT '$c' AS col, count(*) AS n_rows,
                  count(*) FILTER (WHERE $c IS NULL) AS n_null,
                  count(DISTINCT $c) AS n_distinct,
                  CAST(min($c) AS VARCHAR) AS min_str,
                  CAST(max($c) AS VARCHAR) AS max_str FROM documents"""
      }.mkString("\n           UNION ALL\n           ")
      s"""WITH p AS (
           $branches)
         SELECT col AS "column", n_rows, n_null, n_distinct, min_str, max_str
         FROM p ORDER BY col"""
    },
    // Cap-guarded SemDeDup: the q73 CTEs plus a per-cell split factor
    // nsub = ceil(n / 12); pairs join on (cell, id % nsub) so no task
    // ever sees more than ~cap rows per side. Output is the per-cell
    // audit + survivor count.
    "q126_semdedup_capped" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                       WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         asg AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         sizes AS (SELECT cell, COUNT(*) AS n,
                          GREATEST(1, CAST(ceil(COUNT(*) / 12.0) AS BIGINT)) AS nsub
                   FROM asg GROUP BY cell),
         sub AS (SELECT asg.id, asg.vec, asg.cell, sizes.nsub,
                        asg.id % sizes.nsub AS sub
                 FROM asg JOIN sizes USING (cell)),
         losers AS (SELECT DISTINCT b.id
                    FROM sub a JOIN sub b
                      ON a.cell = b.cell AND a.sub = b.sub AND a.id < b.id
                    WHERE ${cosSql("a.vec", "b.vec")} >= 0.4),
         kept AS (SELECT id, cell FROM asg
                  WHERE id NOT IN (SELECT id FROM losers))
         SELECT s.cell, s.n, s.nsub, (s.nsub > 1) AS capped,
                COUNT(k.id) AS n_kept
         FROM sizes s LEFT JOIN kept k USING (cell)
         GROUP BY s.cell, s.n, s.nsub ORDER BY cell""",
    // Nightly band-index maintenance: the Spark side delta-maintains
    // the index built on the OLD snapshot; the oracle REBUILDS from
    // the NEW snapshot (q103's band-key CTEs, no delta) — equality of
    // the relations is the delta≡rebuild gate, enforced cross-engine
    // by the driver's hash compare.
    "q127_band_index_nightly" ->
      s"""WITH nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 7),
         w AS (SELECT doc_id,
                      unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
               FROM nw),
         hb AS (SELECT doc_id,
                       ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS h
                FROM w),
         hs AS (SELECT doc_id, c.i AS i,
                       MIN((h * c.a + c.b) % 2147483647) AS sig
                FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(64)}) AS c(i, a, b)
                GROUP BY doc_id, c.i),
         bands AS (SELECT doc_id, i // 16 AS band,
                          string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                   FROM hs GROUP BY doc_id, (i // 16))
         SELECT doc_id AS id, CAST(band AS BIGINT) AS band, key
         FROM bands ORDER BY id, band""",
    // Nightly hash-index maintenance: maintained (h, cnt)
    // multiplicities must equal a direct GROUP BY over the new
    // snapshot's normalized-content hashes.
    "q128_hash_index_nightly" ->
      """WITH nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 7)
         SELECT ('0x' || substr(md5(lower(trim(text))), 1, 15))::BIGINT AS h,
                count(*) AS cnt
         FROM nw GROUP BY 1 ORDER BY h""",
    // Df-weighted MinHash: integer rarity weights wt = clamp(N // df,
    // 1, 8), token replicated wt times (t#1..t#wt), then the exact
    // q21 signature/band/bucket-cap machinery over elements; exact
    // weighted Jaccard = shared/(sa+sb-shared) scores the candidates.
    "q129_weighted_neardup" ->
      s"""WITH toks AS (SELECT doc_id,
                      unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS tok
               FROM documents),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         wts AS (SELECT tok,
                        GREATEST(1, LEAST(8, (SELECT n_docs FROM nd) // count(*))) AS wt
                 FROM toks GROUP BY tok),
         tw AS (SELECT toks.doc_id, toks.tok, wts.wt
                FROM toks JOIN wts USING (tok)),
         ex AS (SELECT doc_id,
                       tok || '#' || CAST(unnest(range(1, wt + 1)) AS VARCHAR) AS e
                FROM tw),
         hb AS (SELECT doc_id,
                       ('0x' || substr(md5(e), 1, 15))::BIGINT % 2147483647 AS h
                FROM ex),
         hs AS (SELECT doc_id, c.i AS i,
                       MIN((h * c.a + c.b) % 2147483647) AS sig
                FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(64)}) AS c(i, a, b)
                GROUP BY doc_id, c.i),
         sk AS (SELECT doc_id,
                       md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)) AS setkey
                FROM (SELECT DISTINCT doc_id, h FROM hb) d GROUP BY doc_id),
         bands AS (SELECT doc_id, i // 16 AS band,
                          string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                   FROM hs GROUP BY doc_id, (i // 16)),
         sized AS (SELECT b.doc_id, b.band, b.key, sk.setkey,
                          COUNT(*) OVER (PARTITION BY b.band, b.key) AS n
                   FROM bands b JOIN sk USING (doc_id)),
         rb AS (SELECT doc_id, band,
                       CASE WHEN n <= 100 THEN key
                            ELSE key || '!' || setkey END AS key
                FROM sized),
         cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                  FROM rb a JOIN rb b
                    ON a.band = b.band AND a.key = b.key
                       AND a.doc_id < b.doc_id),
         tot AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS s
                 FROM tw GROUP BY doc_id),
         sh AS (SELECT c.a, c.b, CAST(SUM(ta.wt) AS BIGINT) AS shared
                FROM cand c
                JOIN tw ta ON ta.doc_id = c.a
                JOIN tw tb ON tb.doc_id = c.b AND tb.tok = ta.tok
                GROUP BY c.a, c.b)
         SELECT c.a AS a, c.b AS b,
                round(CAST(COALESCE(sh.shared, 0) AS DOUBLE) /
                      CAST(sa.s + sb.s - COALESCE(sh.shared, 0) AS DOUBLE), 6)
                  AS wjac
         FROM cand c
         LEFT JOIN sh ON sh.a = c.a AND sh.b = c.b
         JOIN tot sa ON sa.doc_id = c.a
         JOIN tot sb ON sb.doc_id = c.b
         ORDER BY c.a, c.b""",
    // Composed curation pass: ONE near-dup component pipeline feeds
    // both the q105 keep-best rule and the q116 split rule; per-split
    // doc + keep-best-survivor counts.
    "q130_curation_composed" ->
      s"""WITH RECURSIVE groups AS (SELECT lower(trim(text)) AS k,
                                           MIN(doc_id) AS keeper
                                    FROM documents GROUP BY 1),
         wk AS (SELECT d.doc_id, g.keeper FROM documents d
                JOIN groups g ON lower(trim(d.text)) = g.k),
         ${nearDupComponentsSql},
         q AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS qual
               FROM sdocs),
         losers AS (SELECT d AS doc_id FROM (
             SELECT comp.d,
                    row_number() OVER (PARTITION BY comp.label
                      ORDER BY q.qual DESC, comp.d) AS rn
             FROM comp JOIN q ON q.doc_id = comp.d) t
           WHERE rn > 1),
         kept AS (SELECT doc_id FROM sdocs
                  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         rooted AS (SELECT wk.doc_id,
                           coalesce(comp.label, wk.keeper) AS root
                    FROM wk LEFT JOIN comp ON comp.d = wk.keeper),
         sp AS (SELECT doc_id,
                       ('0x' || substr(md5('split:' || CAST(root AS VARCHAR)), 1, 13))::BIGINT % 1000000 AS b
                FROM rooted),
         spl AS (SELECT doc_id,
                        CASE WHEN b < 100000 THEN 'test'
                             WHEN b < 200000 THEN 'val'
                             ELSE 'train' END AS split
                 FROM sp)
         SELECT spl.split, count(*) AS n_docs,
                CAST(sum(CASE WHEN kept.doc_id IS NULL THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_kept_best
         FROM spl LEFT JOIN kept USING (doc_id)
         GROUP BY spl.split ORDER BY split""",
    // URL dedup: same four deterministic variants, same normalization
    // steps (lowercase scheme/authority, strip www./default port/
    // trailing slash/tracking params/fragment, sort surviving params).
    "q131_url_dedup" ->
      s"""WITH u AS (SELECT doc_id, $urlVariantSql AS url FROM documents),
         $urlCanonSqlCtes
         SELECT url, MIN(doc_id) AS keeper, count(*) AS n_variants
         FROM canon GROUP BY url ORDER BY url""",
    // Streaming Bloom gate: the batch-equivalent membership anti-join
    // (per-arrival semantics: batch-internal dups NOT collapsed).
    "q132_streaming_bloom_gate" ->
      """SELECT doc_id FROM documents
         WHERE doc_id >= 400 AND lower(trim(text)) NOT IN
           (SELECT lower(trim(text)) FROM documents WHERE doc_id < 400)
         ORDER BY doc_id""",
    // Vector-index nightly upkeep: the oracle REBUILDS the IVF×SQ8
    // postings from the new snapshot with the pinned model (seed
    // centroids; scales = per-dim max|v| over the OLD snapshot) — the
    // Spark side delta-maintains and must hash-match.
    "q133_vector_index_nightly" ->
      s"""WITH dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         o AS (SELECT vec_id AS id, embedding AS vec
               FROM embeddings WHERE vec_id % 10 <> 3),
         nw AS (SELECT vec_id AS id,
                       CASE WHEN vec_id % 10 = 5
                            THEN list_concat([-embedding[1]], embedding[2:64])
                            ELSE embedding END AS vec
                FROM embeddings WHERE vec_id % 10 <> 7),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM o, dims GROUP BY i),
         cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         asg AS (SELECT id, cell FROM (
             SELECT nw.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY nw.id
                      ORDER BY ${cosSql("nw.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM nw CROSS JOIN cen) t WHERE rn = 1),
         codes AS (SELECT id, sc.i,
                          CASE WHEN s <= 0 THEN 0
                               ELSE CAST(greatest(-127, least(127,
                                 floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5)))
                                 AS BIGINT)
                          END AS code
                   FROM nw, sc),
         cs AS (SELECT id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)
                         AS code_str
                FROM codes GROUP BY id)
         SELECT asg.id, asg.cell, cs.code_str
         FROM asg JOIN cs USING (id) ORDER BY asg.id""",
    // HTML extraction: the same regexp ladder (RE2 and Java regex
    // agree on (?is) inline flags, \b, and non-greedy .*?); entities
    // unescape with &amp; LAST for correct single-level unescaping.
    "q134_html_extract" ->
      s"""WITH h AS (SELECT doc_id, $htmlShellSql AS html FROM documents),
         c AS (SELECT doc_id, ${stripHtmlSql("html")} AS clean FROM h)
         SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS n_chars
         FROM c ORDER BY doc_id""",
    // End-to-end web ingest: canonical-URL keepers -> HTML extraction
    // -> >= 25-token gate -> exact dedup -> per-source stage audit.
    "q135_web_ingest" ->
      s"""WITH u AS (SELECT doc_id, $urlVariantSql AS url FROM documents),
         $urlCanonSqlCtes,
         k AS (SELECT MIN(doc_id) AS doc_id FROM canon GROUP BY url),
         h AS (SELECT d.doc_id, d.source, $htmlShellSql AS html
               FROM documents d JOIN k USING (doc_id)),
         c AS (SELECT doc_id, source, ${stripHtmlSql("html")} AS clean FROM h),
         gt AS (SELECT * FROM c WHERE len(string_split(clean, ' ')) >= 25),
         dd AS (SELECT MIN(doc_id) AS doc_id FROM gt
                GROUP BY lower(trim(clean))),
         uq AS (SELECT gt.* FROM gt JOIN dd USING (doc_id)),
         a1 AS (SELECT source, count(*) AS n_pages FROM c GROUP BY source),
         a2 AS (SELECT source, count(*) AS n_gated FROM gt GROUP BY source),
         a3 AS (SELECT source, count(*) AS n_unique,
                       CAST(SUM(len(string_split(clean, ' '))) AS BIGINT)
                         AS n_tokens
                FROM uq GROUP BY source)
         SELECT a1.source, a1.n_pages,
                coalesce(a2.n_gated, 0) AS n_gated,
                coalesce(a3.n_unique, 0) AS n_unique,
                coalesce(a3.n_tokens, 0) AS n_tokens
         FROM a1 LEFT JOIN a2 USING (source) LEFT JOIN a3 USING (source)
         ORDER BY source""",
    // Export manifest: q84's shard rule, XOR content digest (order-
    // independent, overflow-free), dense-position audit as count-1.
    "q136_export_manifest" ->
      """WITH a AS (SELECT doc_id, text,
           ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT % 16
             AS shard,
           ('0x' || substr(md5(lower(trim(text))), 1, 15))::BIGINT AS ch
         FROM documents)
         SELECT shard, count(*) AS n_docs,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                bit_xor(ch) AS content_digest,
                count(*) - 1 AS max_pos
         FROM a GROUP BY shard ORDER BY shard""",
    // Integer equi-width histogram: same clamp((v-mn)*12 // span)
    // bin rule; empty bins absent on both sides.
    "q137_histogram" ->
      """WITH s AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents),
         mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM s)
         SELECT CASE WHEN mx = mn THEN 0
                     ELSE LEAST(11, (v - mn) * 12 // (mx - mn + 1)) END AS bin,
                count(*) AS n_rows, mn, mx
         FROM s, mm GROUP BY 1, mn, mx ORDER BY bin""",
    "q138_kmeans_fit" -> kmeansOracleSql(k = 8, iters = 3, dims = 64),
    // Covariance sufficient stats: kilo-unit integer sums per dim pair
    // (i <= j) — the graft_gram buffer, re-derived relationally.
    "q139_covariance_stats" ->
      """WITH q AS (SELECT list_transform(range(64), d ->
                      CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e3) AS BIGINT)) AS qv
                    FROM embeddings),
         p AS (SELECT CAST(d1.d AS BIGINT) AS d1, CAST(d2.d AS BIGINT) AS d2,
                      qv[CAST(d1.d + 1 AS INTEGER)] AS x1,
                      qv[CAST(d2.d + 1 AS INTEGER)] AS x2
               FROM q
               CROSS JOIN (SELECT unnest(range(64)) AS d) d1
               CROSS JOIN (SELECT unnest(range(64)) AS d) d2
               WHERE d1.d <= d2.d)
         SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x1) AS BIGINT) AS s1,
                CAST(sum(x2) AS BIGINT) AS s2,
                CAST(sum(x1 * x2) AS BIGINT) AS s12
         FROM p GROUP BY d1, d2 ORDER BY d1, d2""",
    // Key-skew audit: exact order statistics over the per-key count
    // relation; p99 = bucket size at ascending position ceil(0.99 * K).
    "q140_key_skew_audit" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                           CAST(count(*) AS BIGINT) AS n_rows
                    FROM events GROUP BY 1),
         t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(max(n_rows) AS BIGINT) AS max_n FROM c),
         p AS (SELECT n_rows AS p99_n FROM (
                 SELECT n_rows,
                        row_number() OVER (ORDER BY n_rows ASC, key ASC) AS pos,
                        count(*) OVER () AS nk
                 FROM c)
               WHERE pos = CAST(ceil(0.99 * nk) AS BIGINT)),
         r AS (SELECT key, n_rows,
                      row_number() OVER (ORDER BY n_rows DESC, key ASC) AS rnk
               FROM c)
         SELECT CAST(r.rnk AS BIGINT) AS "rank", r.key, r.n_rows,
                CAST(r.n_rows * 1000000 // t.n_total AS BIGINT) AS share_ppm,
                t.n_total, t.n_keys, t.max_n, p.p99_n,
                (r.n_rows > 4 * (t.n_total // t.n_keys)) AS hot
         FROM r, t, p WHERE r.rnk <= 15 ORDER BY "rank"""",
    // Delta-maintained card: oracle = the q97 card computed DIRECTLY
    // over the new snapshot (text+source edits on %10==5, membership
    // churn as q98) — equality proves the maintained state.
    "q141_card_nightly" ->
      """WITH nsnap AS (SELECT doc_id,
                CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END AS text,
                lang,
                CASE WHEN doc_id % 10 = 5 THEN 'patched' ELSE source END AS source
              FROM documents WHERE doc_id % 10 <> 7),
         df AS (SELECT lang, count(*) AS n_docs,
                       count(DISTINCT lower(trim(text))) AS n_distinct_texts,
                       count(DISTINCT source) AS n_sources,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                FROM nsnap GROUP BY lang),
         tf AS (SELECT lang, count(DISTINCT t) AS distinct_words
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM nsnap) x
                WHERE t <> '' GROUP BY lang)
         SELECT df.lang, n_docs,
                n_docs - n_distinct_texts AS n_exact_dups,
                n_sources, total_tokens,
                total_tokens * 1000 // n_docs AS mean_tokens_milli,
                distinct_words
         FROM df JOIN tf USING (lang) ORDER BY df.lang""",
    // JL ANN: 16-dim md5-parity sign projection (same ±1 formula as
    // the Spark plan literals), cosine rank in the reduced space,
    // full-64-dim top-5 as the audit flag — the q99 contract.
    "q142_jl_ann" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec,
                           ${jlProjSql("embedding", 16, 64)} AS pq
                    FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec,
                      ${jlProjSql("embedding", 16, 64)} AS pv
               FROM embeddings WHERE vec_id >= 20),
         ts AS (SELECT qid, id,
                       round(${dotSqlN("pq", "pv", 16)} /
                         (sqrt(${dotSqlN("pq", "pq", 16)}) *
                          sqrt(${dotSqlN("pv", "pv", 16)})), 6) AS cos
                FROM q JOIN c ON qid <> id),
         tr AS (SELECT qid, id, cos,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, id) AS rank
                FROM ts),
         fs AS (SELECT qid, id FROM (
                  SELECT qid, id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
                  FROM q JOIN c ON qid <> id) x WHERE r <= 5)
         SELECT t.qid, CAST(t.rank AS BIGINT) AS rank, t.id,
                t.cos AS cos_jl,
                CAST(CASE WHEN f.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS in_full_topk
         FROM tr t LEFT JOIN fs f ON t.qid = f.qid AND t.id = f.id
         WHERE t.rank <= 5 ORDER BY t.qid, t.rank""",
    // Vocab coverage: direct ordered cumsum over the vocabulary (the
    // count-class formula the Spark side uses is order-equivalent
    // within a class, so rank-V cum matches exactly).
    "q143_vocab_coverage" ->
      """WITH tk AS (SELECT t FROM (SELECT unnest(string_split(text, ' ')) AS t
                                    FROM documents) x WHERE t <> ''),
         vb AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY t),
         r AS (SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rnk,
                      sum(c) OVER (ORDER BY c DESC, t
                        ROWS UNBOUNDED PRECEDING) AS cum
               FROM vb),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS vocab_total,
                        CAST(sum(c) AS BIGINT) AS token_total FROM vb),
         cp AS (SELECT CAST(unnest([16, 64, 256, 1024, 4096, 16384]) AS BIGINT) AS v)
         SELECT cp.v, CAST(r.cum AS BIGINT) AS cov_tokens,
                CAST(r.cum * 1000000 // t.token_total AS BIGINT) AS coverage_ppm,
                r.c AS floor_count, t.vocab_total, t.token_total
         FROM cp CROSS JOIN tot t
         JOIN r ON r.rnk = least(cp.v, t.vocab_total)
         ORDER BY cp.v""",
    // Delta-maintained covariance: oracle = the q139 stats computed
    // DIRECTLY over the new snapshot (membership churn + sign-flipped
    // %10==5 vectors) — equality proves the maintained Gram state.
    "q144_covariance_nightly" ->
      """WITH ns AS (SELECT vec_id,
                CASE WHEN vec_id % 10 = 5
                     THEN list_transform(embedding, x -> -x)
                     ELSE embedding END AS embedding
              FROM embeddings WHERE vec_id % 10 <> 7),
         q AS (SELECT list_transform(range(64), d ->
                 CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e3) AS BIGINT)) AS qv
               FROM ns),
         p AS (SELECT CAST(d1.d AS BIGINT) AS d1, CAST(d2.d AS BIGINT) AS d2,
                      qv[CAST(d1.d + 1 AS INTEGER)] AS x1,
                      qv[CAST(d2.d + 1 AS INTEGER)] AS x2
               FROM q
               CROSS JOIN (SELECT unnest(range(64)) AS d) d1
               CROSS JOIN (SELECT unnest(range(64)) AS d) d2
               WHERE d1.d <= d2.d)
         SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x1) AS BIGINT) AS s1,
                CAST(sum(x2) AS BIGINT) AS s2,
                CAST(sum(x1 * x2) AS BIGINT) AS s12
         FROM p GROUP BY d1, d2 ORDER BY d1, d2""",
    // Cluster-size histogram: the q34 component fragment rolled to
    // sizes, binned with the q137 integer-histogram formula.
    "q145_cluster_size_histogram" ->
      s"""WITH RECURSIVE ${nearDupComponentsSql},
         sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS csize
                   FROM comp GROUP BY label),
         mm AS (SELECT MIN(csize) AS mn, MAX(csize) AS mx FROM sizes)
         SELECT CASE WHEN mx = mn THEN 0
                     ELSE LEAST(7, (csize - mn) * 8 // (mx - mn + 1)) END AS bin,
                count(*) AS n_rows, mn, mx
         FROM sizes, mm GROUP BY 1, mn, mx ORDER BY bin""",
    // Retrained index: the SAME kmeans CTE chain as q138 (k=8,
    // iters=2) trains centroids in-oracle; trained offset-micro
    // integers convert to FLOAT vectors, cells assign by the q133
    // rounded-cosine rule, codes by the q79 SQ8 formula.
    "q146_retrained_index" ->
      s"""WITH ${kmeansCtesSql(8, 2, 64)},
         cf AS (SELECT cell,
                       list(CAST(CAST(c AS DOUBLE) / 1000000.0 - 1.0 AS FLOAT)
                            ORDER BY d) AS cvec
                FROM c2 GROUP BY cell),
         dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         co AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM co, dims GROUP BY i),
         asg AS (SELECT id, cell FROM (
             SELECT co.id, cf.cell,
                    row_number() OVER (PARTITION BY co.id
                      ORDER BY ${cosSql("co.vec", "cf.cvec")} DESC, cf.cell) AS rn
             FROM co CROSS JOIN cf) t WHERE rn = 1),
         codes AS (SELECT id, sc.i,
                          CASE WHEN s <= 0 THEN 0
                               ELSE CAST(greatest(-127, least(127,
                                 floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5)))
                                 AS BIGINT)
                          END AS code
                   FROM co, sc),
         cs AS (SELECT id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)
                         AS code_str
                FROM codes GROUP BY id)
         SELECT asg.id, asg.cell, cs.code_str
         FROM asg JOIN cs USING (id) ORDER BY asg.id""",
    // SAX words: integer PAA (win = idx*6 // n, sum // count) + q137
    // equi-width symbol bins over each type's own PAA range.
    "q147_sax_words" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         ix AS (SELECT typ, v,
                       CAST(row_number() OVER (PARTITION BY typ ORDER BY day) - 1
                            AS BIGINT) AS idx,
                       CAST(count(*) OVER (PARTITION BY typ) AS BIGINT) AS n
                FROM daily),
         paa AS (SELECT typ, idx * 6 // n AS win,
                        CAST(sum(v) // count(*) AS BIGINT) AS p,
                        CAST(max(n) AS BIGINT) AS n_days
                 FROM ix GROUP BY typ, idx * 6 // n),
         sym AS (SELECT typ, win, n_days,
                        CASE WHEN max(p) OVER (PARTITION BY typ)
                                  = min(p) OVER (PARTITION BY typ) THEN 0
                             ELSE (p - min(p) OVER (PARTITION BY typ)) * 4
                                  // (max(p) OVER (PARTITION BY typ)
                                      - min(p) OVER (PARTITION BY typ) + 1)
                        END AS s
                 FROM paa)
         SELECT typ AS event_type, CAST(max(n_days) AS BIGINT) AS n_days,
                CAST(count(*) AS BIGINT) AS n_windows,
                string_agg(CAST(s AS VARCHAR), '' ORDER BY win) AS sax_word
         FROM sym GROUP BY typ ORDER BY event_type""",
    // Streaming funnel: SAME oracle as the batch q120 — the stateful
    // replay must reproduce the batch per-step rows exactly.
    "q148_streaming_funnel" -> funnelOracleSql,
    // CUSUM: scaled-integer deviations (v*n - total), running sum,
    // peak by |S| with earliest-day tie.
    "q149_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         t AS (SELECT typ, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(v) AS BIGINT) AS total
               FROM daily GROUP BY typ),
         c AS (SELECT d.typ, d.day, t.n, t.total,
                      CAST(sum(d.v * t.n - t.total) OVER (
                        PARTITION BY d.typ ORDER BY d.day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
               FROM daily d JOIN t USING (typ)),
         p AS (SELECT typ, day, n, total, s,
                      row_number() OVER (PARTITION BY typ
                        ORDER BY abs(s) DESC, day ASC) AS r
               FROM c)
         SELECT typ AS event_type, n AS n_days,
                CAST(day AS VARCHAR) AS change_day,
                s AS peak_cusum, total,
                CAST(abs(s) * 1000000 // (total * n) AS BIGINT) AS peak_share_ppm
         FROM p WHERE r = 1 ORDER BY event_type""",
    // Theil-Sen: lower median of pairwise slopes; order by the exact
    // IEEE-double ratio then (dv, dd, i, j); no negative integer div.
    "q150_theil_sen_trend" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         ix AS (SELECT typ, v,
                       CAST(row_number() OVER (PARTITION BY typ ORDER BY day) - 1
                            AS BIGINT) AS idx,
                       CAST(count(*) OVER (PARTITION BY typ) AS BIGINT) AS n
                FROM daily),
         pr AS (SELECT a.typ, a.n,
                       b.v - a.v AS dv, b.idx - a.idx AS dd,
                       a.idx AS i, b.idx AS j
                FROM ix a JOIN ix b
                  ON a.typ = b.typ AND a.idx < b.idx),
         rk AS (SELECT typ, n, dv, dd, i, j,
                       row_number() OVER (PARTITION BY typ
                         ORDER BY CAST(dv AS DOUBLE) / dd ASC, dv ASC,
                                  dd ASC, i ASC, j ASC) AS r,
                       count(*) OVER (PARTITION BY typ) AS m
                FROM pr)
         SELECT typ AS event_type, n AS n_days, CAST(m AS BIGINT) AS n_pairs,
                dv, dd, round(CAST(dv AS DOUBLE) / dd, 6) AS slope
         FROM rk WHERE r = CAST(ceil(m / 2.0) AS BIGINT)
         ORDER BY event_type""",
    // Autocorrelation: scaled-integer deviations, exact num/den sums,
    // one rounded division at the end.
    "q151_autocorrelation" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         t AS (SELECT typ, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(v) AS BIGINT) AS total
               FROM daily GROUP BY typ),
         dv AS (SELECT d.typ, t.n,
                       d.v * t.n - t.total AS dd,
                       lead(d.v * t.n - t.total, 7) OVER (
                         PARTITION BY d.typ ORDER BY d.day) AS dl
                FROM daily d JOIN t USING (typ))
         SELECT typ AS event_type, CAST(7 AS BIGINT) AS lag,
                CAST(max(n) AS BIGINT) AS n_days,
                CAST(coalesce(sum(dd * dl), 0) AS BIGINT) AS num,
                CAST(sum(dd * dd) AS BIGINT) AS den,
                CASE WHEN sum(dd * dd) > 0
                     THEN round(CAST(coalesce(sum(dd * dl), 0) AS DOUBLE) /
                                CAST(sum(dd * dd) AS DOUBLE), 6)
                END AS r
         FROM dv GROUP BY typ ORDER BY event_type""",
    // Multi-probe SRP: per-bit md5-parity sign dots (the q26 bucket
    // formula), flip the two lowest-|dot| bits, rank candidates from
    // the three buckets by exact cosine, audit vs brute top-5.
    "q152_multiprobe_ann" ->
      s"""WITH bits AS (SELECT CAST(unnest(range(6)) AS BIGINT) AS b),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         qd AS (SELECT qid, b,
                       list_sum(list_transform(range(64), d ->
                         (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                               THEN 1.0 ELSE -1.0 END)
                         * qvec[CAST(d + 1 AS INTEGER)]::DOUBLE)) AS dt
                FROM q CROSS JOIN bits),
         qb AS (SELECT qid,
                       CAST(sum(CASE WHEN dt > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS base
                FROM qd GROUP BY qid),
         fl AS (SELECT qid, b FROM (
                  SELECT qid, b,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY abs(dt) ASC, b ASC) AS r
                  FROM qd) WHERE r <= 2),
         pr AS (SELECT qid, base AS probe FROM qb
                UNION ALL
                SELECT fl.qid, xor(qb.base, CAST(1 AS BIGINT) << CAST(fl.b AS INTEGER))
                FROM fl JOIN qb USING (qid)),
         cb AS (SELECT id, vec,
                       CAST(sum(CASE WHEN dt > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
                FROM (SELECT id, vec, b,
                        list_sum(list_transform(range(64), d ->
                          (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                                THEN 1.0 ELSE -1.0 END)
                          * vec[CAST(d + 1 AS INTEGER)]::DOUBLE)) AS dt
                      FROM c CROSS JOIN bits) x
                GROUP BY id, vec),
         cand AS (SELECT DISTINCT pr.qid, cb.id FROM pr JOIN cb ON cb.bucket = pr.probe
                  WHERE pr.qid <> cb.id),
         sc AS (SELECT cand.qid, cand.id,
                       round(${cosSql("q.qvec", "cb.vec")}, 6) AS cos
                FROM cand JOIN q ON q.qid = cand.qid
                JOIN cb ON cb.id = cand.id),
         mp AS (SELECT qid, id, cos,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, id) AS rank
                FROM sc),
         fs AS (SELECT qid, id FROM (
                  SELECT q.qid, c.id,
                         row_number() OVER (PARTITION BY q.qid
                           ORDER BY ${cosSql("q.qvec", "c.vec")} DESC, c.id) AS r
                  FROM q JOIN c ON q.qid <> c.id) x WHERE r <= 5)
         SELECT m.qid, CAST(m.rank AS BIGINT) AS rank, m.id,
                m.cos AS cos_mp,
                CAST(CASE WHEN f.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS in_full_topk
         FROM mp m LEFT JOIN fs f ON f.qid = m.qid AND f.id = m.id
         WHERE m.rank <= 5 ORDER BY m.qid, m.rank""",
    // Attribution: strictly-earlier range frame + order-independent
    // max of the padded epoch#channel string; no-touch -> 'none'.
    "q153_attribution" ->
      """WITH t AS (SELECT user_id, ts, event_type,
                max(CASE WHEN event_type IN ('signup', 'view', 'click')
                         THEN lpad(CAST(epoch_ms(ts) AS VARCHAR), 20, '0')
                              || '#' || event_type END)
                  OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS touch
              FROM events),
         conv AS (SELECT CASE WHEN touch IS NULL THEN 'none'
                              ELSE split_part(touch, '#', 2) END AS channel
                  FROM t WHERE event_type = 'purchase'),
         c AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions
               FROM conv GROUP BY channel),
         tot AS (SELECT CAST(sum(n_conversions) AS BIGINT) AS t FROM c)
         SELECT channel, n_conversions,
                CAST(n_conversions * 1000000 // tot.t AS BIGINT) AS share_ppm
         FROM c, tot ORDER BY channel""",
    // MAD: two exact lower-median selections ((value, day) order,
    // position ceil(n/2)), then the 3*MAD outlier count.
    "q154_mad_outliers" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         m1 AS (SELECT typ, v AS median_v FROM (
                  SELECT typ, v,
                         row_number() OVER (PARTITION BY typ
                           ORDER BY v ASC, day ASC) AS r,
                         count(*) OVER (PARTITION BY typ) AS n
                  FROM daily) WHERE r = CAST(ceil(n / 2.0) AS BIGINT)),
         dev AS (SELECT d.typ, d.day, d.v, m1.median_v,
                        abs(d.v - m1.median_v) AS ad
                 FROM daily d JOIN m1 USING (typ)),
         m2 AS (SELECT typ, ad AS mad FROM (
                  SELECT typ, ad,
                         row_number() OVER (PARTITION BY typ
                           ORDER BY ad ASC, day ASC) AS r,
                         count(*) OVER (PARTITION BY typ) AS n
                  FROM dev) WHERE r = CAST(ceil(n / 2.0) AS BIGINT))
         SELECT dev.typ AS event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(max(dev.median_v) AS BIGINT) AS median_v,
                CAST(max(m2.mad) AS BIGINT) AS mad,
                CAST(count(CASE WHEN dev.ad > 3 * m2.mad THEN 1 END) AS BIGINT)
                  AS n_outliers
         FROM dev JOIN m2 USING (typ)
         GROUP BY dev.typ ORDER BY event_type""",
    // Conversion latency: strict first-signup < first-purchase,
    // integer seconds, lower-median by (secs, user).
    "q155_conversion_latency" ->
      """WITH m AS (SELECT user_id AS u,
               min(CAST(floor(epoch(ts)) AS BIGINT))
                 FILTER (WHERE event_type = 'signup') AS m0,
               min(CAST(floor(epoch(ts)) AS BIGINT))
                 FILTER (WHERE event_type = 'purchase') AS m1
             FROM events GROUP BY user_id),
         s AS (SELECT u, m1 - m0 AS secs FROM m
               WHERE m0 IS NOT NULL AND m1 IS NOT NULL AND m0 < m1),
         md AS (SELECT secs AS median_s FROM (
                  SELECT secs, row_number() OVER (ORDER BY secs ASC, u ASC) AS r,
                         count(*) OVER () AS n
                  FROM s) WHERE r = CAST(ceil(n / 2.0) AS BIGINT))
         SELECT CAST(count(*) AS BIGINT) AS n_converted,
                CAST(min(secs) AS BIGINT) AS min_s,
                CAST(max(md.median_s) AS BIGINT) AS median_s,
                CAST(max(secs) AS BIGINT) AS max_s
         FROM s, md""",
    // BPE encode: the merge chain unrolled over the same literal
    // table; segmented = the full token stream, so the hash checks
    // the exact tokenization, not just counts.
    "q158_bpe_encode" ->
      s"""WITH $bpeToksSql
         SELECT d.doc_id,
                CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_ws_tokens,
                CAST(len(tk.toks) AS BIGINT) AS n_tokens,
                array_to_string(tk.toks, ' ') AS segmented
         FROM documents d JOIN tk USING (doc_id) ORDER BY doc_id""",
    // BPE-budgeted greedy-prefix selection: q115's score CTEs with the
    // token column swapped to real BPE counts.
    "q159_bpe_budget_select" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id),
         $bpeToksSql,
         j AS (SELECT s.doc_id, s.score,
                      CAST(len(tk.toks) AS BIGINT) AS n_tokens
               FROM s JOIN tk USING (doc_id)),
         r AS (SELECT doc_id, score, n_tokens,
                      CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
               FROM j)
         SELECT doc_id, score, n_tokens, cum_tokens
         FROM r WHERE cum_tokens <= 60000 ORDER BY doc_id""",
    // Skew-join equivalence: salt and bucketing are execution-strategy
    // choices only — the oracle is the PLAIN join, once per label.
    "q156_skew_join" ->
      """WITH dim AS (SELECT event_type, CAST(count(*) AS BIGINT) AS type_n
                      FROM events GROUP BY 1),
         j AS (SELECT e.event_id, e.event_type, d.type_n
               FROM events e JOIN dim d USING (event_type))
         SELECT 'salted' AS op, event_id, event_type, type_n FROM j
         UNION ALL
         SELECT 'bucketed' AS op, event_id, event_type, type_n FROM j
         ORDER BY op, event_id""",
    // Composed nightly tick: FULL REBUILDS of all four maintained
    // relations from the new snapshots — band/hash index (q127/q128),
    // data card (q141), vector postings under the old-snapshot-TRAINED
    // model (q146's kmeans CTEs scoped to the old vec snapshot +
    // q133's rebuild convention), covariance state (q144) — stacked
    // under a rel tag with stringified payload columns.
    "q157_nightly_tick" ->
      s"""WITH ${kmeansCtesSql(8, 2, 64,
            "(SELECT * FROM embeddings WHERE vec_id % 10 <> 3) emb")},
         cf AS (SELECT cell,
                       list(CAST(CAST(c AS DOUBLE) / 1000000.0 - 1.0 AS FLOAT)
                            ORDER BY d) AS cvec
                FROM c2 GROUP BY cell),
         dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         o AS (SELECT vec_id AS id, embedding AS vec
               FROM embeddings WHERE vec_id % 10 <> 3),
         nv AS (SELECT vec_id AS id,
                       CASE WHEN vec_id % 10 = 5
                            THEN list_transform(embedding, x -> -x)
                            ELSE embedding END AS vec
                FROM embeddings WHERE vec_id % 10 <> 7),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM o, dims GROUP BY i),
         asg AS (SELECT id, cell FROM (
             SELECT nv.id, cf.cell,
                    row_number() OVER (PARTITION BY nv.id
                      ORDER BY ${cosSql("nv.vec", "cf.cvec")} DESC, cf.cell) AS rn
             FROM nv CROSS JOIN cf) t WHERE rn = 1),
         codes AS (SELECT id, sc.i,
                          CASE WHEN s <= 0 THEN 0
                               ELSE CAST(greatest(-127, least(127,
                                 floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5)))
                                 AS BIGINT)
                          END AS code
                   FROM nv, sc),
         cspost AS (SELECT id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)
                           AS code_str
                    FROM codes GROUP BY id),
         nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END AS text,
                       lang,
                       CASE WHEN doc_id % 10 = 5 THEN 'patched' ELSE source END AS source
                FROM documents WHERE doc_id % 10 <> 7),
         w AS (SELECT doc_id,
                      unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
               FROM nw),
         hb AS (SELECT doc_id,
                       ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS h
                FROM w),
         hs AS (SELECT doc_id, c.i AS i,
                       MIN((h * c.a + c.b) % 2147483647) AS sig
                FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(64)}) AS c(i, a, b)
                GROUP BY doc_id, c.i),
         bands AS (SELECT doc_id, i // 16 AS band,
                          string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                   FROM hs GROUP BY doc_id, (i // 16)),
         hidx AS (SELECT ('0x' || substr(md5(lower(trim(text))), 1, 15))::BIGINT AS h,
                         count(*) AS cnt
                  FROM nw GROUP BY 1),
         cdf AS (SELECT lang, count(*) AS n_docs,
                        count(DISTINCT lower(trim(text))) AS n_distinct_texts,
                        count(DISTINCT source) AS n_sources,
                        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                 FROM nw GROUP BY lang),
         ctf AS (SELECT lang, count(DISTINCT t) AS distinct_words
                 FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM nw) x
                 WHERE t <> '' GROUP BY lang),
         qc AS (SELECT list_transform(range(64), d ->
                  CAST(round(vec[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e3) AS BIGINT)) AS qv
                FROM nv),
         cp AS (SELECT CAST(e1.d AS BIGINT) AS d1, CAST(e2.d AS BIGINT) AS d2,
                       qv[CAST(e1.d + 1 AS INTEGER)] AS x1,
                       qv[CAST(e2.d + 1 AS INTEGER)] AS x2
                FROM qc
                CROSS JOIN (SELECT unnest(range(64)) AS d) e1
                CROSS JOIN (SELECT unnest(range(64)) AS d) e2
                WHERE e1.d <= e2.d),
         covrel AS (SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x1) AS BIGINT) AS s1,
                           CAST(sum(x2) AS BIGINT) AS s2,
                           CAST(sum(x1 * x2) AS BIGINT) AS s12
                    FROM cp GROUP BY d1, d2)
         SELECT 'band' AS rel, CAST(doc_id AS VARCHAR) AS c1,
                CAST(band AS VARCHAR) AS c2, key AS c3,
                NULL AS c4, NULL AS c5, NULL AS c6, NULL AS c7 FROM bands
         UNION ALL
         SELECT 'hash', CAST(h AS VARCHAR), CAST(cnt AS VARCHAR),
                NULL, NULL, NULL, NULL, NULL FROM hidx
         UNION ALL
         SELECT 'card', cdf.lang, CAST(n_docs AS VARCHAR),
                CAST(n_docs - n_distinct_texts AS VARCHAR),
                CAST(n_sources AS VARCHAR), CAST(total_tokens AS VARCHAR),
                CAST(total_tokens * 1000 // n_docs AS VARCHAR),
                CAST(distinct_words AS VARCHAR)
         FROM cdf JOIN ctf USING (lang)
         UNION ALL
         SELECT 'vecpost', CAST(asg.id AS VARCHAR), CAST(asg.cell AS VARCHAR),
                cspost.code_str, NULL, NULL, NULL, NULL
         FROM asg JOIN cspost USING (id)
         UNION ALL
         SELECT 'cov', CAST(d1 AS VARCHAR), CAST(d2 AS VARCHAR),
                CAST(n AS VARCHAR), CAST(s1 AS VARCHAR), CAST(s2 AS VARCHAR),
                CAST(s12 AS VARCHAR), NULL FROM covrel
         ORDER BY rel, c1, c2""",
    // BPE trainer: each round's argmax merge, unrolled.
    "q160_bpe_train" ->
      s"""WITH ${bpeTrainCtesSql(10)}
         SELECT mrank, l, r, np AS n_pairs FROM (
           ${(1 to 10).map(i => s"SELECT * FROM m$i").mkString("\n           UNION ALL ")})
         ORDER BY mrank""",
    // Train-then-encode: the training rounds re-derived, the learned
    // merges applied to the documents, segmentation as q158.
    "q161_bpe_trained_encode" ->
      s"""WITH ${bpeTrainCtesSql(10)},
         a0 AS (SELECT doc_id,
                       regexp_replace(text, '([^ ])', chr(1) || '\\1' || chr(1), 'g') AS enc
                FROM documents),
         ${(1 to 10).map(i =>
            s"""a$i AS (SELECT doc_id,
                   replace(enc, chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
                           chr(1) || m.l || m.r || chr(1)) AS enc
                 FROM a${i - 1}, m$i m)""").mkString(",\n         ")},
         tka AS (SELECT doc_id,
                        list_filter(string_split(
                          replace(replace(enc, chr(1) || chr(1), ' '), chr(1), ''),
                          ' '), x -> x <> '') AS toks
                 FROM a10)
         SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                array_to_string(toks, ' ') AS segmented
         FROM tka ORDER BY doc_id""",
    // Salted two-stage aggregation: must equal the plain GROUP BY.
    "q162_salted_agg" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    // Join-cardinality audit: exact sum-of-products over the two
    // key-count relations, worst key by (contribution DESC, key DESC).
    "q163_join_cardinality" ->
      """WITH ca AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                            CAST(count(*) AS BIGINT) AS na
                     FROM lineitem GROUP BY 1),
         cb AS (SELECT CAST(o_orderkey AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS nb
                FROM orders GROUP BY 1),
         sh AS (SELECT key, na * nb AS prod FROM ca JOIN cb USING (key)),
         sa AS (SELECT CAST(sum(na) AS BIGINT) AS n_rows_a,
                       CAST(count(*) AS BIGINT) AS n_keys_a FROM ca),
         sb AS (SELECT CAST(sum(nb) AS BIGINT) AS n_rows_b,
                       CAST(count(*) AS BIGINT) AS n_keys_b FROM cb),
         js AS (SELECT CAST(count(*) AS BIGINT) AS n_shared_keys,
                       CAST(coalesce(sum(prod), 0) AS BIGINT) AS join_rows
                FROM sh),
         t AS (SELECT key AS top_key, CAST(prod AS BIGINT) AS top_rows
               FROM sh ORDER BY prod DESC, key DESC LIMIT 1)
         SELECT sa.n_rows_a, sa.n_keys_a, sb.n_rows_b, sb.n_keys_b,
                js.n_shared_keys, js.join_rows, t.top_key, t.top_rows
         FROM js CROSS JOIN sa CROSS JOIN sb LEFT JOIN t ON TRUE""",
    // Top user paths: first-5-event journeys ranked by user count,
    // ties (n DESC, path) — rn ties among identical (ts, type) rows
    // cannot change the path string.
    "q164_top_paths" ->
      """WITH f AS (SELECT user_id AS u, event_type AS typ,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_type) AS rn
                    FROM events),
         p AS (SELECT u, string_agg(typ, '>' ORDER BY rn) AS path
               FROM f WHERE rn <= 5 GROUP BY u)
         SELECT path, CAST(count(*) AS BIGINT) AS n_users
         FROM p GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20""",
    // SCD2 merge: the five cases re-derived relationally — full outer
    // current×collapsed-updates, branch per outcome, history unioned.
    "q165_scd2_merge" ->
      """WITH cur AS (SELECT c_custkey, c_name,
                             CAST(c_nationkey AS BIGINT) AS c_nationkey,
                             CAST(1000 AS BIGINT) AS valid_from
                      FROM customer),
         hist AS (SELECT c_custkey, c_name,
                         CAST(c_nationkey + 100 AS BIGINT) AS c_nationkey,
                         CAST(500 AS BIGINT) AS valid_from,
                         CAST(1000 AS BIGINT) AS valid_to
                  FROM customer WHERE c_custkey % 10 = 0),
         ua AS (SELECT c_custkey, c_name,
                       CAST(c_nationkey + 1 AS BIGINT) AS c_nationkey,
                       CAST(2000 AS BIGINT) AS ts
                FROM customer WHERE c_custkey % 10 = 3
                UNION ALL
                SELECT c_custkey, c_name, CAST(c_nationkey + 50 AS BIGINT),
                       CAST(1500 AS BIGINT)
                FROM customer WHERE c_custkey % 10 = 3
                UNION ALL
                SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT),
                       CAST(2000 AS BIGINT)
                FROM customer WHERE c_custkey % 10 = 6
                UNION ALL
                SELECT c_custkey, c_name, CAST(c_nationkey + 7 AS BIGINT),
                       CAST(900 AS BIGINT)
                FROM customer WHERE c_custkey % 10 = 4
                UNION ALL
                SELECT c_custkey + 100000, c_name, CAST(c_nationkey AS BIGINT),
                       CAST(2000 AS BIGINT)
                FROM customer WHERE c_custkey % 10 = 9),
         upd AS (SELECT c_custkey, c_name, c_nationkey, ts FROM (
                   SELECT *, row_number() OVER (PARTITION BY c_custkey
                     ORDER BY ts DESC, c_name DESC, c_nationkey DESC) AS rn
                   FROM ua) WHERE rn = 1),
         j AS (SELECT cur.c_custkey AS ck, cur.c_name AS cn,
                      cur.c_nationkey AS cnk, cur.valid_from AS vf,
                      u.c_custkey AS uk, u.c_name AS un,
                      u.c_nationkey AS unk, u.ts AS uts
               FROM cur FULL OUTER JOIN upd u ON cur.c_custkey = u.c_custkey),
         chg AS (SELECT *,
                        (un IS DISTINCT FROM cn OR unk IS DISTINCT FROM cnk)
                          AS changed,
                        (uts IS NOT NULL AND uts > vf) AS applies
                 FROM j)
         SELECT c_custkey, c_name, c_nationkey, valid_from, valid_to FROM (
           SELECT ck AS c_custkey, cn AS c_name, cnk AS c_nationkey,
                  vf AS valid_from, CAST(NULL AS BIGINT) AS valid_to
           FROM chg WHERE ck IS NOT NULL AND NOT (applies AND changed)
           UNION ALL
           SELECT ck, cn, cnk, vf, uts
           FROM chg WHERE ck IS NOT NULL AND applies AND changed
           UNION ALL
           SELECT ck, un, unk, uts, NULL
           FROM chg WHERE ck IS NOT NULL AND applies AND changed
           UNION ALL
           SELECT uk, un, unk, uts, NULL FROM chg WHERE ck IS NULL
           UNION ALL
           SELECT c_custkey, c_name, c_nationkey, valid_from, valid_to
           FROM hist)
         ORDER BY c_custkey, valid_from""",
    // Windowed funnel: per-step 48 h deadline, each stage's minimum
    // conditional on the previous stage's resolved time. SHARED by the
    // batch q166 and the streaming q168 (the q120/q148 twin contract).
    "q166_windowed_funnel" -> windowedFunnelOracleSql,
    "q168_streaming_windowed_funnel" -> windowedFunnelOracleSql,
    // Video frame sampling: every sampled frame's raster is the doc's
    // bytes rotated by the frame index — the checksum re-derives from
    // text, pixel by pixel.
    "q167_video_frame_sample" ->
      """WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 13 + 2 AS w,
                           strlen(text) % 7 + 2 AS h,
                           strlen(text) % 5 + 2 AS nf
                    FROM documents),
         fr AS (SELECT doc_id, text, len, w, h, unnest(range(nf)) AS f FROM m),
         sm AS (SELECT * FROM fr WHERE f % 2 = 0),
         px AS (SELECT doc_id, f, w, h, len, text,
                       unnest(range(w * h * 3)) AS i
                FROM sm),
         ck AS (SELECT doc_id, f, w, h,
                       CAST(sum(ord(substr(text,
                         CAST((i + f) % len AS INTEGER) + 1, 1))) AS BIGINT)
                         AS px_checksum
                FROM px GROUP BY 1, 2, 3, 4)
         SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
                CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                px_checksum
         FROM ck ORDER BY doc_id, frame_idx""",
    // Exact percentile bands: per-key value histogram + per-key
    // exclusive prefix, position (p*n + 99) // 100 — integer ceil.
    "q169_exact_percentiles" ->
      """WITH q AS (SELECT CAST(event_type AS VARCHAR) AS k,
                           CAST(round(value * 100) AS BIGINT) AS v
                    FROM events),
         h AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1, 2),
         w AS (SELECT k, v, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY k),
         p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct)
         SELECT w.k AS event_type, p.pct, w.v AS value_cents
         FROM w JOIN t USING (k) CROSS JOIN p
         WHERE below < (pct * n + 99) // 100
           AND (pct * n + 99) // 100 <= below + c
         ORDER BY event_type, pct""",
    // Key entropy: micro-nat Shannon entropy of the key distribution
    // vs its ln(K) maximum — per-key terms quantized before the sum.
    "q170_key_entropy" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1),
         a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT))
                        AS BIGINT) AS t
               FROM c)
         SELECT n_rows, n_keys,
                CAST(round(ln(n_rows) * 1e6) AS BIGINT) - t // n_rows
                  AS entropy_micro,
                CAST(round(ln(n_keys) * 1e6) AS BIGINT) AS max_entropy_micro,
                CASE WHEN CAST(round(ln(n_keys) * 1e6) AS BIGINT) > 0
                     THEN (CAST(round(ln(n_rows) * 1e6) AS BIGINT) - t // n_rows)
                          * 1000000 // CAST(round(ln(n_keys) * 1e6) AS BIGINT)
                     ELSE 1000000 END AS balance_ppm
         FROM a""",
    // FK integrity: per-relation orphan audit re-derived with
    // NOT EXISTS anti-joins over the key-count relations; NULL FKs
    // counted separately, never as orphans.
    "q171_fk_integrity" ->
      """WITH
         c1 AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS c
                FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
         p1 AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
                FROM orders WHERE o_orderkey IS NOT NULL),
         n1 AS (SELECT CAST(count(*) AS BIGINT) AS n_null_rows
                FROM lineitem WHERE l_orderkey IS NULL),
         o1 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orphan_rows,
                       CAST(count(*) AS BIGINT) AS n_orphan_keys
                FROM c1 WHERE NOT EXISTS
                  (SELECT 1 FROM p1 WHERE p1.key = c1.key)),
         b1 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_child_rows,
                       CAST(count(*) AS BIGINT) AS n_child_keys FROM c1),
         r1 AS (SELECT 'lineitem->orders' AS relation, b1.*, n1.*, o1.*
                FROM b1 CROSS JOIN n1 CROSS JOIN o1),
         e2 AS (SELECT CASE WHEN o_orderkey % 13 = 5 THEN NULL
                            ELSE o_custkey END AS fk FROM orders),
         c2 AS (SELECT CAST(fk AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS c
                FROM e2 WHERE fk IS NOT NULL GROUP BY 1),
         p2 AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS key
                FROM customer WHERE c_custkey % 7 <> 3),
         n2 AS (SELECT CAST(count(*) AS BIGINT) AS n_null_rows
                FROM e2 WHERE fk IS NULL),
         o2 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orphan_rows,
                       CAST(count(*) AS BIGINT) AS n_orphan_keys
                FROM c2 WHERE NOT EXISTS
                  (SELECT 1 FROM p2 WHERE p2.key = c2.key)),
         b2 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_child_rows,
                       CAST(count(*) AS BIGINT) AS n_child_keys FROM c2),
         r2 AS (SELECT 'orders->customer' AS relation, b2.*, n2.*, o2.*
                FROM b2 CROSS JOIN n2 CROSS JOIN o2),
         c3 AS (SELECT CAST(c_nationkey AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS c
                FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
         p3 AS (SELECT DISTINCT CAST(n_nationkey AS VARCHAR) AS key
                FROM nation WHERE n_nationkey < 20),
         n3 AS (SELECT CAST(count(*) AS BIGINT) AS n_null_rows
                FROM customer WHERE c_nationkey IS NULL),
         o3 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orphan_rows,
                       CAST(count(*) AS BIGINT) AS n_orphan_keys
                FROM c3 WHERE NOT EXISTS
                  (SELECT 1 FROM p3 WHERE p3.key = c3.key)),
         b3 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_child_rows,
                       CAST(count(*) AS BIGINT) AS n_child_keys FROM c3),
         r3 AS (SELECT 'customer->nation' AS relation, b3.*, n3.*, o3.*
                FROM b3 CROSS JOIN n3 CROSS JOIN o3),
         u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
               UNION ALL SELECT * FROM r3)
         SELECT relation, n_child_rows, n_child_keys, n_null_rows,
                n_orphan_rows, n_orphan_keys,
                CASE WHEN n_child_rows > 0
                     THEN n_orphan_rows * 1000000 // n_child_rows
                     ELSE 0 END AS orphan_ppm
         FROM u ORDER BY relation""",
    // Key Gini: rank-weighted sum via counts-of-counts classes —
    // contiguous rank runs collapse to c*(m*r0 + m*(m+1)/2); the
    // numerator 2S-(n+1)T is provably >= 0 so // == div here.
    "q172_key_gini" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1),
         cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY 1),
         w AS (SELECT c, m,
                      CAST(coalesce(sum(m) OVER (ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS r0
               FROM cc),
         a AS (SELECT CAST(sum(c * m) AS BIGINT) AS n_rows,
                      CAST(sum(m) AS BIGINT) AS n_keys,
                      CAST(sum(c * (m * r0 + m * (m + 1) // 2))
                        AS BIGINT) AS s
               FROM w)
         SELECT n_rows, n_keys,
                CASE WHEN n_rows <= 0 OR n_keys <= 1 THEN 0
                     ELSE (2 * s - (n_keys + 1) * n_rows) * 1000000
                          // (n_keys * n_rows) END AS gini_ppm
         FROM a""",
    // Weekday seasonality: one-way ANOVA between-group share with
    // cusum-scaled integer deviations (d = v*n - total, sum d = 0);
    // DuckDB dayofweek is 0=Sunday, Spark's is 1=Sunday -> +1.
    // dg*dg // ng and ssb*1e6 // sst: numerators nonnegative so
    // // == div.
    "q173_weekday_seasonality" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         st AS (SELECT typ, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(v) AS BIGINT) AS total
                FROM daily GROUP BY typ),
         dev AS (SELECT d.typ, d.v * t.n - t.total AS dd,
                        CAST(dayofweek(d.day) + 1 AS BIGINT) AS g, t.n
                 FROM daily d JOIN st t USING (typ)),
         bg AS (SELECT typ, g, CAST(sum(dd) AS BIGINT) AS dg,
                       CAST(count(*) AS BIGINT) AS ng,
                       CAST(sum(dd * dd) AS BIGINT) AS sstp,
                       CAST(max(n) AS BIGINT) AS n_days
                FROM dev GROUP BY 1, 2),
         agg AS (SELECT typ AS event_type,
                        CAST(max(n_days) AS BIGINT) AS n_days,
                        CAST(sum(sstp) AS BIGINT) AS sst,
                        CAST(sum(dg * dg // ng) AS BIGINT) AS ssb
                 FROM bg GROUP BY 1),
         pk AS (SELECT typ AS event_type, g AS peak_weekday FROM (
                  SELECT typ, g, row_number() OVER (PARTITION BY typ
                    ORDER BY dg DESC, g ASC) AS rn FROM bg) WHERE rn = 1)
         SELECT a.event_type, a.n_days,
                CASE WHEN sst > 0 THEN ssb * 1000000 // sst
                     ELSE 0 END AS seasonality_ppm,
                p.peak_weekday
         FROM agg a JOIN pk p USING (event_type) ORDER BY a.event_type""",
    // Inter-event gaps: consecutive order (second, type) per user;
    // bucket = length of the binary string = floor(log2)+1, an
    // integer log2 with no float boundary hazard.
    "q174_event_gaps" -> eventGapsOracleSql,
    // The streaming twin must reproduce the batch histogram exactly
    // (the q120/q148 and q166/q168 twin contract).
    "q180_streaming_gaps" -> eventGapsOracleSql,
    // Linear attribution: per-conversion per-channel touch counts via
    // FILTERed windows (the frame excludes same-ms rows, the q153
    // convention), credit = n_c * (1e6 // nt) with the remainder to
    // the last touch, unpivoted through literal UNION arms.
    "q175_linear_attribution" ->
      """WITH t AS (SELECT user_id AS u, event_type AS typ,
                count(*) FILTER (WHERE event_type = 'signup') OVER pw AS n0,
                count(*) FILTER (WHERE event_type = 'view') OVER pw AS n1,
                count(*) FILTER (WHERE event_type = 'click') OVER pw AS n2,
                max(CASE WHEN event_type IN ('signup', 'view', 'click')
                         THEN lpad(CAST(epoch_ms(ts) AS VARCHAR), 20, '0')
                              || '#' || event_type END) OVER pw AS lastt
              FROM events
              WINDOW pw AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         c AS (SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
                      CAST(n2 AS BIGINT) AS n2,
                      CAST(n0 + n1 + n2 AS BIGINT) AS nt,
                      split_part(lastt, '#', 2) AS lastch
               FROM t WHERE typ = 'purchase'),
         arms AS (
           SELECT 'signup' AS channel, n0 AS touches,
                  CASE WHEN nt = 0 THEN 0
                       ELSE n0 * (1000000 // nt) +
                            CASE WHEN lastch = 'signup'
                                 THEN 1000000 - nt * (1000000 // nt)
                                 ELSE 0 END END AS credit FROM c
           UNION ALL
           SELECT 'view', n1,
                  CASE WHEN nt = 0 THEN 0
                       ELSE n1 * (1000000 // nt) +
                            CASE WHEN lastch = 'view'
                                 THEN 1000000 - nt * (1000000 // nt)
                                 ELSE 0 END END FROM c
           UNION ALL
           SELECT 'click', n2,
                  CASE WHEN nt = 0 THEN 0
                       ELSE n2 * (1000000 // nt) +
                            CASE WHEN lastch = 'click'
                                 THEN 1000000 - nt * (1000000 // nt)
                                 ELSE 0 END END FROM c
           UNION ALL
           SELECT 'none', CAST(0 AS BIGINT),
                  CASE WHEN nt = 0 THEN 1000000 ELSE 0 END FROM c),
         g AS (SELECT channel,
                      CAST(count(*) FILTER (WHERE credit > 0) AS BIGINT)
                        AS n_conversions,
                      CAST(sum(touches) AS BIGINT) AS touches,
                      CAST(sum(credit) AS BIGINT) AS credit_ppm
               FROM arms GROUP BY 1),
         tot AS (SELECT CAST(sum(credit) // 1000000 AS BIGINT) AS t
                 FROM arms)
         SELECT channel, n_conversions, touches, credit_ppm,
                CASE WHEN t > 0 THEN credit_ppm // t ELSE 0 END AS share_ppm
         FROM g CROSS JOIN tot
         WHERE touches > 0 OR credit_ppm > 0
         ORDER BY channel""",
    // Stationary distribution: the power iteration unrolled to the
    // same `stationaryIters` the Spark loop uses; per-edge
    // pi*c // r truncation (nonnegative, so // == div), absorbing
    // states hold their mass via the NOT EXISTS arm.
    "q176_stationary_distribution" -> stationaryCtesSql(stationaryIters),
    // Weighted sample: A-ES in log space; the negated cost keeps the
    // numerator nonnegative so // == div; same salted 60-bit hash,
    // same single-ln libm caveat as q67/q170.
    "q177_weighted_sample" ->
      """WITH s AS (SELECT doc_id, n_chars,
                ('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)),
                  1, 15))::BIGINT % 1000000 + 1 AS u
              FROM documents WHERE n_chars > 0),
         c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                      (-CAST(round(ln(u / 1000000.0) * 1e6) AS BIGINT))
                        * 1000 // n_chars AS cost_nano
               FROM s)
         SELECT doc_id, weight, CAST(cost_nano AS BIGINT) AS cost_nano
         FROM c ORDER BY cost_nano, doc_id LIMIT 100""",
    // Tokenizer fertility: the q161 trained-encode chain joined back
    // to language, rolled up with exact-integer ppm ratios.
    "q178_bpe_fertility" ->
      s"""WITH ${bpeTrainCtesSql(10)},
         a0 AS (SELECT doc_id,
                       regexp_replace(text, '([^ ])', chr(1) || '\\1' || chr(1), 'g') AS enc
                FROM documents),
         ${(1 to 10).map(i =>
            s"""a$i AS (SELECT doc_id,
                   replace(enc, chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
                           chr(1) || m.l || m.r || chr(1)) AS enc
                 FROM a${i - 1}, m$i m)""").mkString(",\n         ")},
         tka AS (SELECT doc_id,
                        list_filter(string_split(
                          replace(replace(enc, chr(1) || chr(1), ' '), chr(1), ''),
                          ' '), x -> x <> '') AS toks
                 FROM a10),
         j AS (SELECT d.lang, CAST(length(d.text) AS BIGINT) AS nch,
                      CAST(len(list_filter(string_split(d.text, ' '),
                        x -> x <> '')) AS BIGINT) AS nws,
                      CAST(len(t.toks) AS BIGINT) AS ntk
               FROM documents d JOIN tka t USING (doc_id))
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nch) AS BIGINT) AS n_chars,
                CAST(sum(nws) AS BIGINT) AS n_ws_tokens,
                CAST(sum(ntk) AS BIGINT) AS n_tokens,
                CASE WHEN sum(ntk) > 0
                     THEN CAST(sum(nch) * 1000000 // sum(ntk) AS BIGINT)
                     ELSE 0 END AS chars_per_token_ppm,
                CASE WHEN sum(nws) > 0
                     THEN CAST(sum(ntk) * 1000000 // sum(nws) AS BIGINT)
                     ELSE 0 END AS fertility_ppm
         FROM j GROUP BY lang ORDER BY lang""",
    // k-anonymity: quasi-tuple class sizes, the violating mass and
    // the smallest class; NULL quasi-values group together in both
    // engines.
    "q179_k_anonymity" ->
      """WITH q AS (SELECT lang, source, n_chars // 100 AS len_bucket
                    FROM documents),
         g AS (SELECT lang, source, len_bucket,
                      CAST(count(*) AS BIGINT) AS c
               FROM q GROUP BY 1, 2, 3),
         a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS n_groups,
                      CAST(coalesce(sum(c) FILTER (WHERE c < 5), 0)
                        AS BIGINT) AS n_violating_rows,
                      CAST(count(*) FILTER (WHERE c < 5) AS BIGINT)
                        AS n_violating_groups,
                      CAST(min(c) AS BIGINT) AS min_group
               FROM g)
         SELECT n_rows, n_groups, CAST(5 AS BIGINT) AS k,
                n_violating_groups, n_violating_rows, min_group,
                CASE WHEN n_rows > 0
                     THEN n_violating_rows * 1000000 // n_rows
                     ELSE 0 END AS violating_ppm
         FROM a""",
    // Equi-depth histogram: position p -> bucket (p-1)*b // n; a
    // value class spans buckets via generate_series, per-bucket count
    // = exact interval overlap; all numerators nonnegative.
    "q181_equi_depth_histogram" ->
      """WITH q AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
                    FROM events WHERE value IS NOT NULL),
         h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1),
         w AS (SELECT v, c,
                      CAST(coalesce(sum(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
         x0 AS (SELECT v, c, below, n,
                       generate_series(below * 8 // n,
                         (below + c - 1) * 8 // n) AS bs
                FROM w CROSS JOIN t),
         x AS (SELECT v, c, below, n, unnest(bs) AS bucket FROM x0),
         y AS (SELECT v, bucket,
                      least(below + c, (bucket * n + n + 7) // 8) -
                      greatest(below + 1, (bucket * n + 7) // 8 + 1) + 1 AS k
               FROM x)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(sum(k) AS BIGINT) AS n_rows,
                CAST(min(v) AS BIGINT) AS min_value,
                CAST(max(v) AS BIGINT) AS max_value
         FROM y WHERE k > 0 GROUP BY 1 ORDER BY 1""",
    // Maintained key stats: the oracle computes entropy + Gini
    // DIRECTLY over the new snapshot — the hash compare is the
    // delta≡rebuild gate for the maintained diagnostics state.
    "q182_key_stats_nightly" ->
      """WITH nsnap AS (SELECT CASE WHEN event_id % 10 = 5
                               THEN user_id + 1000000
                               ELSE user_id END AS user_id
                        FROM events WHERE event_id % 10 <> 7),
         c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                      CAST(count(*) AS BIGINT) AS c
               FROM nsnap GROUP BY 1),
         a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT))
                        AS BIGINT) AS t
               FROM c),
         cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY 1),
         w AS (SELECT c, m,
                      CAST(coalesce(sum(m) OVER (ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS r0
               FROM cc),
         g AS (SELECT CAST(sum(c * (m * r0 + m * (m + 1) // 2))
                        AS BIGINT) AS s
               FROM w)
         SELECT a.n_rows, a.n_keys,
                CAST(round(ln(a.n_rows) * 1e6) AS BIGINT) - a.t // a.n_rows
                  AS entropy_micro,
                CAST(round(ln(a.n_keys) * 1e6) AS BIGINT)
                  AS max_entropy_micro,
                CASE WHEN CAST(round(ln(a.n_keys) * 1e6) AS BIGINT) > 0
                     THEN (CAST(round(ln(a.n_rows) * 1e6) AS BIGINT)
                           - a.t // a.n_rows) * 1000000
                          // CAST(round(ln(a.n_keys) * 1e6) AS BIGINT)
                     ELSE 1000000 END AS balance_ppm,
                CASE WHEN a.n_rows <= 0 OR a.n_keys <= 1 THEN 0
                     ELSE (2 * g.s - (a.n_keys + 1) * a.n_rows) * 1000000
                          // (a.n_keys * a.n_rows) END AS gini_ppm
         FROM a CROSS JOIN g""",
    // Edit-distance join: deletion-neighborhood candidates (a string
    // plus its delete-one variants, hashed 60-bit) equi-joined, then
    // the exact levenshtein verify — identical classic DP in both
    // engines. unnest stands on its own level (the q181 binder note).
    "q183_edit_distance_join" ->
      """WITH l AS (SELECT c_custkey AS lid, c_name AS ls FROM customer),
         r AS (SELECT c_custkey AS rid,
                      CASE WHEN c_custkey % 7 = 3 THEN c_name || 'x'
                           ELSE c_name END AS rs
               FROM customer),
         lv1 AS (SELECT lid, ls, list_prepend(ls,
                   [substr(ls, 1, i - 1) || substr(ls, i + 1)
                    FOR i IN generate_series(1, length(ls))]) AS vs
                 FROM l),
         lv2 AS (SELECT lid, ls, unnest(vs) AS v FROM lv1),
         lv AS (SELECT DISTINCT lid, ls,
                       ('0x' || substr(md5(v), 1, 15))::BIGINT AS h
                FROM lv2),
         rv1 AS (SELECT rid, rs, list_prepend(rs,
                   [substr(rs, 1, i - 1) || substr(rs, i + 1)
                    FOR i IN generate_series(1, length(rs))]) AS vs
                 FROM r),
         rv2 AS (SELECT rid, rs, unnest(vs) AS v FROM rv1),
         rv AS (SELECT DISTINCT rid, rs,
                       ('0x' || substr(md5(v), 1, 15))::BIGINT AS h
                FROM rv2),
         cand AS (SELECT DISTINCT lid, rid, ls, rs
                  FROM lv JOIN rv USING (h) WHERE lid <> rid)
         SELECT lid AS left_id, rid AS right_id,
                ls AS left_str, rs AS right_str,
                CAST(levenshtein(ls, rs) AS BIGINT) AS distance
         FROM cand WHERE levenshtein(ls, rs) <= 1
         ORDER BY left_id, right_id""",
    // Stickiness: sliding distinct via the user-day rollup spread to
    // its 28 target days; week/month split read off the offset.
    "q184_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, ts::DATE AS day
                     FROM events),
         dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                 FROM ud GROUP BY 1),
         os AS (SELECT CAST(unnest(generate_series(0, 27)) AS INTEGER) AS o),
         t AS (SELECT u, o, day + o AS d FROM ud CROSS JOIN os),
         w AS (SELECT d AS day,
                      CAST(count(DISTINCT CASE WHEN o <= 6 THEN u END)
                        AS BIGINT) AS wau,
                      CAST(count(DISTINCT u) AS BIGINT) AS mau
               FROM t GROUP BY 1)
         SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, w.wau, w.mau,
                dau.dau * 1000000 // w.wau AS stickiness_ppm
         FROM dau JOIN w USING (day) ORDER BY day""",
    // Center crop: the synthesized raster byte i is text byte i
    // (zero-filled past the text), so the crop checksum mirrors as
    // index arithmetic — the q31/q167 blob-mirroring convention.
    "q185_image_crop" ->
      """WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 13 + 2 AS w,
                           strlen(text) % 7 + 2 AS h
                    FROM documents),
         c AS (SELECT doc_id, text, len, w, h,
                      least(4, w) AS cw, least(4, h) AS ch,
                      (w - least(4, w)) // 2 AS x0,
                      (h - least(4, h)) // 2 AS y0
               FROM m),
         ys AS (SELECT doc_id, text, len, w, h, cw, ch, x0, y0,
                       unnest(range(ch)) AS dy
                FROM c),
         js AS (SELECT doc_id, text, len, w, h, cw, ch,
                       ((y0 + dy) * w + x0) * 3 AS base,
                       unnest(range(cw * 3)) AS j
                FROM ys),
         px AS (SELECT doc_id, w, h, cw, ch,
                       CASE WHEN base + j < len
                            THEN ord(substr(text,
                              CAST(base + j AS INTEGER) + 1, 1))
                            ELSE 0 END AS v
                FROM js)
         SELECT doc_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(cw AS BIGINT) AS crop_w, CAST(ch AS BIGINT) AS crop_h,
                CAST(sum(v) AS BIGINT) AS px_checksum
         FROM px GROUP BY doc_id, w, h, cw, ch ORDER BY doc_id""",
    // Weekday-adjusted z: per-(key, weekday) group stats, exact
    // integer numerator, one sqrt + one divide rounded to 6 (the
    // q123 bit-identical-IEEE convention); DuckDB dayofweek + 1.
    "q186_weekday_zscore" ->
      """WITH daily AS (SELECT event_type AS key, ts::DATE AS d,
                               CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
         gd AS (SELECT key, d, n,
                       CAST(dayofweek(d) + 1 AS BIGINT) AS g
                FROM daily),
         st AS (SELECT key, d, g, n,
                       CAST(count(*) OVER pw AS BIGINT) AS ng,
                       CAST(sum(n) OVER pw AS BIGINT) AS s,
                       CAST(sum(n * n) OVER pw AS BIGINT) AS ss
                FROM gd
                WINDOW pw AS (PARTITION BY key, g)),
         z AS (SELECT key, CAST(d AS VARCHAR) AS day, g AS weekday, n,
                      CASE WHEN ng >= 2 AND ss * ng - s * s > 0
                           THEN round((n * ng - s) / sqrt(ss * ng - s * s), 6)
                           END AS z
               FROM st)
         SELECT key, day, weekday, n, z,
                coalesce(abs(z) >= 3.0, false) AS anomaly
         FROM z ORDER BY key, day""",
    // Benford: the same Scala constants unroll to the VALUES list;
    // first digit off the decimal string, never a float log10.
    "q187_benford_audit" -> s"""
         WITH exp AS (SELECT * FROM (VALUES ${
           graft.operators.Analytics.benfordExpectedPpm
             .map { case (d, p) => s"($d, $p)" }.mkString(", ")
         }) AS t(digit, expected_ppm)),
         q AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS a
               FROM lineitem),
         dg AS (SELECT CAST(substr(CAST(a AS VARCHAR), 1, 1) AS BIGINT)
                  AS digit
                FROM q WHERE a > 0),
         c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
               FROM dg GROUP BY 1),
         t AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS tt FROM c),
         j AS (SELECT e.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
                      CASE WHEN t.tt > 0
                           THEN coalesce(c.n, 0) * 1000000 // t.tt
                           ELSE 0 END AS observed_ppm,
                      CAST(e.expected_ppm AS BIGINT) AS expected_ppm
               FROM exp e LEFT JOIN c ON e.digit = c.digit CROSS JOIN t)
         SELECT CAST(digit AS BIGINT) AS digit, n, observed_ppm,
                expected_ppm,
                abs(observed_ppm - expected_ppm) AS deviation_ppm
         FROM j ORDER BY digit""",
    // Funnel step latency: the q166 resolved-times chain, gaps per
    // consecutive pair, then the q169 histogram-prefix percentile
    // lookup per pair.
    "q188_funnel_latency" ->
      """WITH e AS (SELECT user_id AS u,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                           event_type AS typ
                    FROM events),
         c0 AS (SELECT u, min(sec) AS m0 FROM e WHERE typ = 'signup'
                GROUP BY u),
         c1 AS (SELECT e.u, min(sec) AS m1 FROM e JOIN c0 USING (u)
                WHERE typ = 'view' AND sec > m0 AND sec <= m0 + 172800
                GROUP BY e.u),
         c2 AS (SELECT e.u, min(sec) AS m2 FROM e JOIN c1 USING (u)
                WHERE typ = 'click' AND sec > m1 AND sec <= m1 + 172800
                GROUP BY e.u),
         c3 AS (SELECT e.u, min(sec) AS m3 FROM e JOIN c2 USING (u)
                WHERE typ = 'purchase' AND sec > m2 AND sec <= m2 + 172800
                GROUP BY e.u),
         g AS (SELECT 'signup->view' AS pair, m1 - m0 AS gap
               FROM c1 JOIN c0 USING (u)
               UNION ALL
               SELECT 'view->click', m2 - m1 FROM c2 JOIN c1 USING (u)
               UNION ALL
               SELECT 'click->purchase', m3 - m2 FROM c3 JOIN c2 USING (u)),
         h AS (SELECT pair, gap, CAST(count(*) AS BIGINT) AS c
               FROM g GROUP BY 1, 2),
         w AS (SELECT pair, gap, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY pair
                        ORDER BY gap
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT pair, CAST(sum(c) AS BIGINT) AS n
               FROM h GROUP BY pair),
         p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct)
         SELECT w.pair, p.pct, w.gap AS gap_secs
         FROM w JOIN t USING (pair) CROSS JOIN p
         WHERE below < (pct * n + 99) // 100
           AND (pct * n + 99) // 100 <= below + c
         ORDER BY pair, pct""",
    // Weekly retention: ISO Monday weeks in both engines; date
    // subtraction yields days, always a multiple of 7 here.
    "q189_weekly_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
                            CAST(date_trunc('week', ts) AS DATE) AS wk
                     FROM events),
         ch AS (SELECT u, min(wk) AS cw FROM uw GROUP BY u),
         sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
                FROM ch GROUP BY cw),
         act AS (SELECT ch.cw, CAST((uw.wk - ch.cw) // 7 AS BIGINT)
                        AS week_offset,
                        CAST(count(*) AS BIGINT) AS n_active
                 FROM uw JOIN ch USING (u) GROUP BY 1, 2)
         SELECT CAST(act.cw AS VARCHAR) AS cohort_week, act.week_offset,
                act.n_active, sz.cohort_size,
                act.n_active * 1000000 // sz.cohort_size AS retention_ppm
         FROM act JOIN sz USING (cw)
         ORDER BY cohort_week, week_offset""",
    // Fulfillment latency: order->ship day gaps per priority through
    // the q169 per-key percentile machinery; DATE minus DATE is days.
    "q190_fulfillment_latency" ->
      """WITH g AS (SELECT o.o_orderpriority AS k,
                           CAST(l.l_shipdate::DATE - o.o_orderdate::DATE
                             AS BIGINT) AS v
                    FROM lineitem l
                    JOIN orders o ON l.l_orderkey = o.o_orderkey),
         h AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c
               FROM g GROUP BY 1, 2),
         w AS (SELECT k, v, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY k),
         p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct)
         SELECT w.k AS o_orderpriority, p.pct, w.v AS days
         FROM w JOIN t USING (k) CROSS JOIN p
         WHERE below < (pct * n + 99) // 100
           AND (pct * n + 99) // 100 <= below + c
         ORDER BY o_orderpriority, pct""",
    // CUBE: all four grouping combinations, grouping_id = bit order
    // (returnflag, linestatus) in both engines.
    "q191_cube" ->
      """SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                  AS BIGINT) AS gid,
                coalesce(l_returnflag, 'ALL') AS l_returnflag,
                coalesce(l_linestatus, 'ALL') AS l_linestatus,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    // Session depth: the q35 gap-islands derivation, rolled into
    // integer-log2 event-count buckets with span extremes.
    "q192_session_depth" ->
      """WITH m AS (SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         g AS (SELECT user_id, ts,
                      SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM m),
         sess AS (SELECT user_id, sid,
                         CAST(count(*) AS BIGINT) AS n_events,
                         CAST(floor(epoch(max(ts))) AS BIGINT) -
                           CAST(floor(epoch(min(ts))) AS BIGINT) AS span
                  FROM g GROUP BY 1, 2)
         SELECT CAST(length(bin(n_events)) AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(min(n_events) AS BIGINT) AS min_events,
                CAST(max(n_events) AS BIGINT) AS max_events,
                CAST(max(span) AS BIGINT) AS max_span_secs
         FROM sess GROUP BY 1 ORDER BY 1""",
    // WoW: weekly counts + lag delta in exact ppm; delta may be
    // negative, but DuckDB // floors while Spark div truncates —
    // (n - prev) and prev are both handled via the same // on a
    // nonneg... see note: deltas CAN be negative, so mirror Spark's
    // truncate-toward-zero with a sign split.
    "q193_wow_metrics" ->
      """WITH w AS (SELECT event_type,
                           CAST(date_trunc('week', ts) AS DATE) AS wk,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1, 2),
         l AS (SELECT event_type, wk, n,
                      lag(n) OVER (PARTITION BY event_type ORDER BY wk)
                        AS prev
               FROM w)
         SELECT event_type, CAST(wk AS VARCHAR) AS week, n, prev,
                CASE WHEN prev IS NULL OR prev <= 0 THEN NULL
                     WHEN n >= prev THEN (n - prev) * 1000000 // prev
                     ELSE -((prev - n) * 1000000 // prev) END
                  AS wow_delta_ppm
         FROM l ORDER BY event_type, week""",
    // Cohort funnel: the q166 resolved chain bucketed by a PURE
    // integer Monday-aligned week of m0 (no engine timezone in play).
    "q194_cohort_funnel" ->
      """WITH e AS (SELECT user_id AS u,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                           event_type AS typ
                    FROM events),
         c0 AS (SELECT u, min(sec) AS m0 FROM e WHERE typ = 'signup'
                GROUP BY u),
         c1 AS (SELECT e.u, min(sec) AS m1 FROM e JOIN c0 USING (u)
                WHERE typ = 'view' AND sec > m0 AND sec <= m0 + 172800
                GROUP BY e.u),
         c2 AS (SELECT e.u, min(sec) AS m2 FROM e JOIN c1 USING (u)
                WHERE typ = 'click' AND sec > m1 AND sec <= m1 + 172800
                GROUP BY e.u),
         c3 AS (SELECT e.u, min(sec) AS m3 FROM e JOIN c2 USING (u)
                WHERE typ = 'purchase' AND sec > m2 AND sec <= m2 + 172800
                GROUP BY e.u),
         r AS (SELECT c0.u, c0.m0, c1.m1, c2.m2, c3.m3,
                      DATE '1970-01-01' + CAST(4 + 7 *
                        ((m0 // 86400 - 4) // 7) AS INTEGER) AS cw
               FROM c0 LEFT JOIN c1 USING (u) LEFT JOIN c2 USING (u)
                       LEFT JOIN c3 USING (u)),
         g AS (SELECT cw, CAST(count(m0) AS BIGINT) AS n0,
                      CAST(count(m1) AS BIGINT) AS n1,
                      CAST(count(m2) AS BIGINT) AS n2,
                      CAST(count(m3) AS BIGINT) AS n3
               FROM r GROUP BY cw)
         SELECT CAST(cw AS VARCHAR) AS cohort_week, step_idx, step,
                n_users, n_users * 1000000 // n0 AS conversion_ppm
         FROM (SELECT cw, 0 AS step_idx, 'signup' AS step,
                      n0 AS n_users, n0 FROM g
               UNION ALL SELECT cw, 1, 'view', n1, n0 FROM g
               UNION ALL SELECT cw, 2, 'click', n2, n0 FROM g
               UNION ALL SELECT cw, 3, 'purchase', n3, n0 FROM g)
         ORDER BY cohort_week, step_idx""",
    // A/B harness: same salted hash split, exact counts; z evaluates
    // in the SAME left-assoc IEEE op order as the Spark chain
    // ((X/N)*(N-X))*n_a)*n_b then sqrt then divide, round 6.
    "q195_ab_test" ->
      """WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS u,
                     CASE WHEN max(CASE WHEN event_type = 'purchase'
                                        THEN 1 END) IS NULL THEN 0
                          ELSE 1 END AS conv
               FROM events GROUP BY 1),
         a AS (SELECT ('0x' || substr(md5('ab:exp1:' || u), 1, 15))::BIGINT
                        % 2 AS arm, conv
               FROM pu),
         arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(conv) AS BIGINT) AS x
                  FROM a GROUP BY 1),
         w AS (SELECT
                 CAST(coalesce(sum(CASE WHEN arm = 0 THEN n END), 0)
                   AS BIGINT) AS n_a,
                 CAST(coalesce(sum(CASE WHEN arm = 0 THEN x END), 0)
                   AS BIGINT) AS x_a,
                 CAST(coalesce(sum(CASE WHEN arm = 1 THEN n END), 0)
                   AS BIGINT) AS n_b,
                 CAST(coalesce(sum(CASE WHEN arm = 1 THEN x END), 0)
                   AS BIGINT) AS x_b
               FROM arms),
         z AS (SELECT n_a, x_a, n_b, x_b,
                      x_a * 1000000 // n_a AS rate_a_ppm,
                      x_b * 1000000 // n_b AS rate_b_ppm,
                      CASE WHEN n_a > 0 AND n_b > 0
                             AND x_a + x_b > 0
                             AND x_a + x_b < n_a + n_b
                           THEN round(
                             CAST(x_a * n_b - x_b * n_a AS DOUBLE) /
                             sqrt(CAST(x_a + x_b AS DOUBLE) /
                                  CAST(n_a + n_b AS DOUBLE) *
                                  CAST(n_a + n_b - x_a - x_b AS DOUBLE) *
                                  CAST(n_a AS DOUBLE) *
                                  CAST(n_b AS DOUBLE)), 6)
                           END AS z
               FROM w)
         SELECT n_a, x_a, n_b, x_b, rate_a_ppm, rate_b_ppm, z,
                coalesce(abs(z) >= 1.96, false) AS significant
         FROM z""",
    // Lorenz: the q181 bucket machinery with value mass v*overlap
    // and a cumulative share; unnest on its own level (q181 note).
    "q196_revenue_pareto" ->
      """WITH rev AS (SELECT o.o_custkey,
                             CAST(sum(CAST(round(l.l_extendedprice * 100)
                               AS BIGINT)) AS BIGINT) AS v
                      FROM orders o
                      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                      GROUP BY 1),
         h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM rev GROUP BY 1),
         w AS (SELECT v, c,
                      CAST(coalesce(sum(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                      CAST(sum(v * c) AS BIGINT) AS tv FROM h),
         x0 AS (SELECT v, c, below, n, tv,
                       generate_series(below * 10 // n,
                         (below + c - 1) * 10 // n) AS bs
                FROM w CROSS JOIN t),
         x AS (SELECT v, c, below, n, tv, unnest(bs) AS bucket FROM x0),
         y AS (SELECT v, tv, bucket,
                      least(below + c, (bucket * n + n + 9) // 10) -
                      greatest(below + 1, (bucket * n + 9) // 10 + 1) + 1 AS k
               FROM x),
         pb AS (SELECT CAST(bucket AS BIGINT) AS bucket,
                       CAST(sum(k) AS BIGINT) AS n_rows,
                       CAST(sum(v * k) AS BIGINT) AS value_sum,
                       CAST(max(tv) AS BIGINT) AS tv
                FROM y WHERE k > 0 GROUP BY 1),
         cu AS (SELECT bucket, n_rows, value_sum,
                       CAST(sum(value_sum) OVER (ORDER BY bucket
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, tv
                FROM pb)
         SELECT bucket, n_rows, value_sum,
                CASE WHEN tv > 0 THEN cum * 1000000 // tv
                     ELSE 0 END AS cum_value_ppm
         FROM cu ORDER BY bucket""",
    // Schema drift: the fixture's generation rules re-derived as null
    // predicates; statuses/types are literal (the fixture IS the
    // schema change).
    "q197_schema_drift" ->
      """WITH o AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN event_id IS NULL THEN 1 END)
                 AS BIGINT) AS eid,
               CAST(count(CASE WHEN user_id IS NULL THEN 1 END)
                 AS BIGINT) AS uid,
               CAST(count(CASE WHEN event_type IS NULL THEN 1 END)
                 AS BIGINT) AS typ,
               CAST(count(CASE WHEN event_id % 7 = 0 OR value IS NULL
                 THEN 1 END) AS BIGINT) AS val,
               CAST(count(CASE WHEN props IS NULL THEN 1 END)
                 AS BIGINT) AS pr
             FROM events),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN event_id IS NULL THEN 1 END)
                 AS BIGINT) AS eid,
               CAST(count(CASE WHEN event_id % 5 = 0 OR user_id IS NULL
                 THEN 1 END) AS BIGINT) AS uid,
               CAST(count(CASE WHEN event_type IS NULL THEN 1 END)
                 AS BIGINT) AS typ,
               CAST(count(CASE WHEN value IS NULL THEN 1 END)
                 AS BIGINT) AS val,
               CAST(count(CASE WHEN props IS NULL THEN 1 END)
                 AS BIGINT) AS pr
             FROM events)
         SELECT * FROM (
           SELECT 'event_id' AS "column", 'kept' AS status,
                  'bigint' AS old_type, 'bigint' AS new_type,
                  o.eid * 1000000 // o.n AS old_null_ppm,
                  nn.eid * 1000000 // nn.n AS new_null_ppm
           FROM o, nn
           UNION ALL SELECT 'event_type', 'kept', 'string', 'string',
                  o.typ * 1000000 // o.n, nn.typ * 1000000 // nn.n
           FROM o, nn
           UNION ALL SELECT 'extra', 'added', NULL, 'string',
                  NULL, nn.pr * 1000000 // nn.n
           FROM o, nn
           UNION ALL SELECT 'legacy', 'removed', 'string', NULL,
                  o.pr * 1000000 // o.n, NULL
           FROM o, nn
           UNION ALL SELECT 'user_id', 'kept', 'bigint', 'bigint',
                  o.uid * 1000000 // o.n, nn.uid * 1000000 // nn.n
           FROM o, nn
           UNION ALL SELECT 'value', 'type_changed', 'double', 'string',
                  o.val * 1000000 // o.n, nn.val * 1000000 // nn.n
           FROM o, nn)
         ORDER BY "column"""",
    // Threshold sweep: the q23 candidate CTEs verified once in
    // integer ppm; every threshold reads the same pair relation.
    "q198_dedup_threshold_sweep" ->
      s"""WITH $minHashPairsSql,
         ws AS (SELECT doc_id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents),
         j AS (SELECT CAST(len(list_intersect(wa.ws, wb.ws)) AS BIGINT)
                        * 1000000
                        // CAST(len(list_distinct(wa.ws || wb.ws)) AS BIGINT)
                        AS jppm
               FROM pairs p
               JOIN ws wa ON wa.doc_id = p.a
               JOIN ws wb ON wb.doc_id = p.b
               WHERE len(list_distinct(wa.ws || wb.ws)) > 0),
         th AS (SELECT CAST(unnest([500000, 700000, 800000, 900000])
                  AS BIGINT) AS threshold_ppm)
         SELECT th.threshold_ppm,
                CAST(count(CASE WHEN j.jppm >= th.threshold_ppm THEN 1 END)
                  AS BIGINT) AS n_pairs
         FROM th CROSS JOIN j GROUP BY 1 ORDER BY 1""",
    // KS: both CDFs advance on ONE shared value histogram, the
    // scaled gap |cumA*nB - cumB*nA| exact, smallest-v supremum.
    "q199_ks_drift" ->
      """WITH q AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                    FROM documents
                    WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
         h AS (SELECT v,
                      CAST(count(CASE WHEN g = 'en' THEN 1 END)
                        AS BIGINT) AS ca,
                      CAST(count(CASE WHEN g = 'de' THEN 1 END)
                        AS BIGINT) AS cb
               FROM q GROUP BY 1),
         c AS (SELECT v,
                      CAST(sum(ca) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
                      CAST(sum(cb) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
               FROM h),
         t AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
                      CAST(coalesce(sum(cb), 0) AS BIGINT) AS nb
               FROM h),
         d AS (SELECT na, nb, abs(cuma * nb - cumb * na) AS d, v
               FROM c CROSS JOIN t),
         m AS (SELECT na, nb, d, v,
                      row_number() OVER (ORDER BY d DESC, v ASC) AS rn
               FROM d)
         SELECT na AS n_a, nb AS n_b,
                CASE WHEN na = 0 OR nb = 0 THEN 0
                     ELSE d * 1000000 // (na * nb) END AS ks_ppm,
                CAST(v AS BIGINT) AS at_value
         FROM m WHERE rn = 1""",
    // Health report: every fragment is the corresponding gated
    // oracle reduced to its scalar, unioned long-format.
    "q200_health_report" -> s"""
         WITH c1 AS (SELECT CAST(user_id AS VARCHAR) AS key,
                            CAST(count(*) AS BIGINT) AS c
                     FROM events GROUP BY 1),
         a1 AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                       CAST(count(*) AS BIGINT) AS n_keys,
                       CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT))
                         AS BIGINT) AS t
                FROM c1),
         cc2 AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c1 GROUP BY 1),
         w2 AS (SELECT c, m,
                       CAST(coalesce(sum(m) OVER (ORDER BY c
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS BIGINT) AS r0
                FROM cc2),
         a2 AS (SELECT CAST(sum(c * m) AS BIGINT) AS n_rows,
                       CAST(sum(m) AS BIGINT) AS n_keys,
                       CAST(sum(c * (m * r0 + m * (m + 1) // 2))
                         AS BIGINT) AS s2
                FROM w2),
         cf AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS c
                FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
         pf AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
                FROM orders WHERE o_orderkey IS NOT NULL),
         ofk AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS orows
                 FROM cf WHERE NOT EXISTS
                   (SELECT 1 FROM pf WHERE pf.key = cf.key)),
         bfk AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS crows
                 FROM cf),
         expb AS (SELECT * FROM (VALUES ${
           graft.operators.Analytics.benfordExpectedPpm
             .map { case (d, p) => s"($d, $p)" }.mkString(", ")
         }) AS t(digit, expected_ppm)),
         qb AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS a
                FROM lineitem),
         dgb AS (SELECT CAST(substr(CAST(a AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit
                 FROM qb WHERE a > 0),
         cb AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
                FROM dgb GROUP BY 1),
         tb AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS tt FROM cb),
         jb AS (SELECT CASE WHEN tb.tt > 0
                            THEN coalesce(cb.n, 0) * 1000000 // tb.tt
                            ELSE 0 END AS observed_ppm,
                       CAST(e.expected_ppm AS BIGINT) AS expected_ppm
                FROM expb e LEFT JOIN cb ON e.digit = cb.digit
                     CROSS JOIN tb),
         qk AS (SELECT lang, source, n_chars // 100 AS len_bucket
                FROM documents),
         gk AS (SELECT lang, source, len_bucket,
                       CAST(count(*) AS BIGINT) AS c
                FROM qk GROUP BY 1, 2, 3),
         ak AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                       CAST(coalesce(sum(c) FILTER (WHERE c < 5), 0)
                         AS BIGINT) AS vrows
                FROM gk),
         qs AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                FROM documents
                WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
         hs AS (SELECT v,
                       CAST(count(CASE WHEN g = 'en' THEN 1 END)
                         AS BIGINT) AS ca,
                       CAST(count(CASE WHEN g = 'de' THEN 1 END)
                         AS BIGINT) AS cb2
                FROM qs GROUP BY 1),
         cs AS (SELECT v,
                       CAST(sum(ca) OVER (ORDER BY v
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
                       CAST(sum(cb2) OVER (ORDER BY v
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
                FROM hs),
         ts AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
                       CAST(coalesce(sum(cb2), 0) AS BIGINT) AS nb
                FROM hs),
         ds AS (SELECT na, nb, abs(cuma * nb - cumb * na) AS d
                FROM cs CROSS JOIN ts),
         mks AS (SELECT CASE WHEN max(na) = 0 OR max(nb) = 0 THEN 0
                             ELSE max(d) * 1000000 // (max(na) * max(nb))
                        END AS ksv
                 FROM ds),
         dup AS (SELECT (count(*) - count(DISTINCT md5(text)))
                          * 1000000 // count(*) AS dv
                 FROM documents)
         SELECT metric, CAST(value AS BIGINT) AS value FROM (
           SELECT 'key_balance_ppm' AS metric,
                  CASE WHEN CAST(round(ln(n_keys) * 1e6) AS BIGINT) > 0
                       THEN (CAST(round(ln(n_rows) * 1e6) AS BIGINT)
                             - t // n_rows) * 1000000
                            // CAST(round(ln(n_keys) * 1e6) AS BIGINT)
                       ELSE 1000000 END AS value
           FROM a1
           UNION ALL
           SELECT 'key_gini_ppm',
                  CASE WHEN n_rows <= 0 OR n_keys <= 1 THEN 0
                       ELSE (2 * s2 - (n_keys + 1) * n_rows) * 1000000
                            // (n_keys * n_rows) END
           FROM a2
           UNION ALL
           SELECT 'fk_orphan_ppm',
                  CASE WHEN crows > 0 THEN orows * 1000000 // crows
                       ELSE 0 END
           FROM bfk CROSS JOIN ofk
           UNION ALL
           SELECT 'benford_deviation_ppm',
                  CAST(sum(abs(observed_ppm - expected_ppm)) AS BIGINT)
           FROM jb
           UNION ALL
           SELECT 'k_anonymity_violating_ppm',
                  CASE WHEN n_rows > 0 THEN vrows * 1000000 // n_rows
                       ELSE 0 END
           FROM ak
           UNION ALL
           SELECT 'ks_en_de_ppm', ksv FROM mks
           UNION ALL
           SELECT 'exact_dup_ppm', dv FROM dup)
         ORDER BY metric""",
    // Heavy hitters: the same Count-Min candidate pass + exact verify,
    // re-derived over the same salted md5 buckets.
    "q201_heavy_hitters" -> """
         WITH r AS (SELECT CAST(event_type AS VARCHAR) AS key FROM events
                    WHERE event_type IS NOT NULL),
         t AS (SELECT greatest(1, count(*) * 50000 // 1000000) AS thr FROM r),
         s0 AS (SELECT ('0x' || substr(md5('cm0:' || key), 1, 15))::BIGINT
                         % 1024 AS b, CAST(count(*) AS BIGINT) AS c
                FROM r GROUP BY 1),
         s1 AS (SELECT ('0x' || substr(md5('cm1:' || key), 1, 15))::BIGINT
                         % 1024 AS b, CAST(count(*) AS BIGINT) AS c
                FROM r GROUP BY 1),
         s2 AS (SELECT ('0x' || substr(md5('cm2:' || key), 1, 15))::BIGINT
                         % 1024 AS b, CAST(count(*) AS BIGINT) AS c
                FROM r GROUP BY 1),
         surv AS (SELECT r.key FROM r
                  JOIN s0 ON ('0x' || substr(md5('cm0:' || r.key), 1, 15))
                               ::BIGINT % 1024 = s0.b
                  JOIN s1 ON ('0x' || substr(md5('cm1:' || r.key), 1, 15))
                               ::BIGINT % 1024 = s1.b
                  JOIN s2 ON ('0x' || substr(md5('cm2:' || r.key), 1, 15))
                               ::BIGINT % 1024 = s2.b
                  CROSS JOIN t
                  WHERE s0.c >= t.thr AND s1.c >= t.thr AND s2.c >= t.thr),
         ex AS (SELECT key, CAST(count(*) AS BIGINT) AS n_rows
                FROM surv GROUP BY 1)
         SELECT key, n_rows FROM ex CROSS JOIN t
         WHERE n_rows >= thr
         ORDER BY n_rows DESC, key""",
    // Nearest-neighbor resize: the q185 index-arithmetic mirror with
    // the floor source mapping (dx*w//8, dy*h//8) instead of the crop
    // window.
    "q202_image_resize" -> """
         WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 13 + 2 AS w,
                           strlen(text) % 7 + 2 AS h
                    FROM documents),
         ys AS (SELECT doc_id, text, len, w, h, unnest(range(8)) AS dy
                FROM m),
         xs AS (SELECT doc_id, text, len, w, h, (dy * h) // 8 AS sy,
                       unnest(range(8)) AS dx
                FROM ys),
         js AS (SELECT doc_id, text, len, w, h,
                       (sy * w + (dx * w) // 8) * 3 AS base,
                       unnest(range(3)) AS j
                FROM xs),
         px AS (SELECT doc_id, w, h,
                       CASE WHEN base + j < len
                            THEN ord(substr(text,
                              CAST(base + j AS INTEGER) + 1, 1))
                            ELSE 0 END AS v
                FROM js)
         SELECT doc_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
                CAST(sum(v) AS BIGINT) AS px_checksum
         FROM px GROUP BY doc_id, w, h ORDER BY doc_id""",
    // Contribution analysis: same floor-share + winner-absorbs-the-
    // remainder arithmetic; the winner picked by ORDER BY ... LIMIT 1
    // mirrors the struct-min (largest |delta|, then smallest name).
    "q203_contribution" -> """
         WITH e AS (SELECT event_type AS segment,
                           (ts::DATE - DATE '1970-01-01') % 2 AS par
                    FROM events),
         seg AS (SELECT CAST(segment AS VARCHAR) AS segment,
                        CAST(count(*) FILTER (WHERE par = 0) AS BIGINT)
                          AS n_a,
                        CAST(count(*) FILTER (WHERE par = 1) AS BIGINT)
                          AS n_b
                 FROM e GROUP BY 1),
         d AS (SELECT segment, n_a, n_b, n_b - n_a AS delta FROM seg),
         t AS (SELECT CAST(coalesce(sum(abs(delta)), 0) AS BIGINT) AS s
               FROM d),
         w AS (SELECT segment AS wseg FROM d
               ORDER BY abs(delta) DESC, segment LIMIT 1),
         b AS (SELECT segment, n_a, n_b, delta,
                      CASE WHEN t.s > 0
                           THEN abs(delta) * 1000000 // t.s
                           ELSE 0 END AS base
               FROM d CROSS JOIN t),
         fs AS (SELECT CAST(coalesce(sum(base), 0) AS BIGINT) AS f FROM b)
         SELECT segment, n_a, n_b, CAST(delta AS BIGINT) AS delta,
                CAST(base + CASE WHEN t.s > 0 AND segment = w.wseg
                                 THEN 1000000 - fs.f
                                 ELSE 0 END AS BIGINT) AS share_ppm
         FROM b CROSS JOIN t CROSS JOIN w CROSS JOIN fs
         ORDER BY segment""",
    // Chi-square: the same full-grid construction; each cell's micro
    // term is the identical stated IEEE chain (long-exact d, cast,
    // d*d / ((r*c)::DOUBLE * n::DOUBLE) * 1e6, round), then an exact
    // integer sum. DuckDB dayofweek is 0-based (q186 convention).
    "q204_chi_square" -> """
         WITH e AS (SELECT CAST(event_type AS VARCHAR) AS a,
                           CAST(dayofweek(ts::DATE) + 1 AS VARCHAR) AS b
                    FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
                   FROM e GROUP BY 1, 2),
         rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
         ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
         t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                      CAST(count(DISTINCT a) AS BIGINT) AS n_a,
                      CAST(count(DISTINCT b) AS BIGINT) AS n_b
               FROM cells),
         grid AS (SELECT rt.a, ct.b, rt.r, ct.c,
                         CAST(coalesce(cells.o, 0) AS BIGINT) AS o
                  FROM rt CROSS JOIN ct
                  LEFT JOIN cells ON rt.a = cells.a AND ct.b = cells.b),
         dd AS (SELECT r, c, o, n, n_a, n_b,
                       CAST(o * n - r * c AS BIGINT) AS d
                FROM grid CROSS JOIN t),
         terms AS (SELECT n, n_a, n_b,
                          CAST(round(d::DOUBLE * d::DOUBLE
                            / ((r * c)::DOUBLE * n::DOUBLE) * 1000000)
                            AS BIGINT) AS term
                   FROM dd)
         SELECT n AS n_rows, n_a, n_b,
                CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
                CAST(sum(term) AS BIGINT) AS chi2_micro
         FROM terms GROUP BY n, n_a, n_b""",
    // Triangle census: the q198 verified-pair relation at >= 0.5
    // Jaccard, canonicalized, wedges via degrees, each triangle
    // counted once through its middle vertex.
    "q205_dup_triangles" ->
      s"""WITH $minHashPairsSql,
         ws AS (SELECT doc_id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents),
         vp AS (SELECT p.a, p.b
                FROM pairs p
                JOIN ws wa ON wa.doc_id = p.a
                JOIN ws wb ON wb.doc_id = p.b
                WHERE len(list_distinct(wa.ws || wb.ws)) > 0
                  AND CAST(len(list_intersect(wa.ws, wb.ws)) AS BIGINT)
                        * 1000000
                        // CAST(len(list_distinct(wa.ws || wb.ws)) AS BIGINT)
                        >= 500000),
         e AS (SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
               FROM vp WHERE a <> b),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT x AS v FROM e UNION ALL SELECT y FROM e) u
                 GROUP BY 1),
         shape AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                          CAST(coalesce(sum(d * (d - 1) // 2), 0)
                            AS BIGINT) AS n_wedges
                   FROM deg),
         ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         tr AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                FROM e e1 JOIN e e2 ON e1.y = e2.x
                WHERE EXISTS (SELECT 1 FROM e e3
                              WHERE e3.x = e1.x AND e3.y = e2.y))
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
                CASE WHEN n_wedges > 0
                     THEN 3 * n_triangles * 1000000 // n_wedges
                     ELSE 0 END AS clustering_ppm
         FROM shape CROSS JOIN ne CROSS JOIN tr""",
    // Silence trim: the q85 cyclic-sample synthesis mirrored; the
    // loud-index list gives lead/trail, the 1-based inclusive slice
    // sums the kept span.
    "q206_audio_trim" -> """
         WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 50 + 10 AS n
                    FROM documents),
         s AS (SELECT doc_id, n,
                      list_transform(range(n),
                        i -> abs(CAST((CASE WHEN len = 0 THEN 0
                               ELSE ord(substr(text,
                                 CAST(i % len AS INTEGER) + 1, 1))
                               END - 128) * 128 AS BIGINT))) AS a
               FROM m),
         idx AS (SELECT doc_id, n, a,
                        list_filter(range(n),
                          i -> a[CAST(i AS INTEGER) + 1] >= 2048) AS loud
                 FROM s),
         t AS (SELECT doc_id, n,
                      CASE WHEN len(loud) = 0 THEN n
                           ELSE loud[1] END AS lead,
                      CASE WHEN len(loud) = 0 THEN 0
                           ELSE n - 1 - loud[len(loud)] END AS trail,
                      CASE WHEN len(loud) = 0 THEN 0
                           ELSE list_sum(a[CAST(loud[1] AS INTEGER) + 1
                                           : CAST(loud[len(loud)]
                                               AS INTEGER) + 1])
                      END AS kept
               FROM idx)
         SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
                CAST(lead AS BIGINT) AS n_leading,
                CAST(trail AS BIGINT) AS n_trailing,
                CAST(n - lead - trail AS BIGINT) AS n_kept,
                CAST(kept AS BIGINT) AS kept_abs_sum
         FROM t ORDER BY doc_id""",
    // Cross-correlation: the q151 exact-centering scheme on the
    // shared day axis; the IEEE tail (two sqrts, multiply, divide,
    // round 6) mirrors the Spark chain op for op.
    "q207_cross_correlation" -> """
         WITH daily AS (SELECT ts::DATE AS day,
                               CAST(count(*) FILTER (WHERE event_type
                                 = 'signup') AS BIGINT) AS x,
                               CAST(count(*) FILTER (WHERE event_type
                                 = 'purchase') AS BIGINT) AS y
                        FROM events
                        WHERE event_type IN ('signup', 'purchase')
                        GROUP BY 1),
         w AS (SELECT day, x, y,
                      CAST(count(*) OVER () AS BIGINT) AS n,
                      CAST(sum(x) OVER () AS BIGINT) AS tx,
                      CAST(sum(y) OVER () AS BIGINT) AS ty
               FROM daily),
         d AS (SELECT day, n, x * n - tx AS dx, y * n - ty AS dy FROM w),
         l AS (SELECT n, dx, dy,
                      lead(dy, 7) OVER (ORDER BY day) AS dyl
               FROM d),
         a AS (SELECT CAST(max(n) AS BIGINT) AS n_days,
                      CAST(coalesce(sum(dx * dyl), 0) AS BIGINT) AS num,
                      CAST(sum(dx * dx) AS BIGINT) AS den_x,
                      CAST(sum(dy * dy) AS BIGINT) AS den_y
               FROM l)
         SELECT 'signup' AS type_x, 'purchase' AS type_y,
                CAST(7 AS BIGINT) AS lag, n_days, num, den_x, den_y,
                CASE WHEN den_x > 0 AND den_y > 0
                     THEN round(num::DOUBLE
                       / (sqrt(den_x::DOUBLE) * sqrt(den_y::DOUBLE)), 6)
                     ELSE NULL END AS r
         FROM a""",
    // Audience overlap: the same distinct (user, type) relation
    // self-joined, grid zero-filled, exact ppm Jaccard.
    "q208_audience_overlap" -> """
         WITH ut AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS u,
                            CAST(event_type AS VARCHAR) AS t
                     FROM events
                     WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         tot AS (SELECT t, CAST(count(*) AS BIGINT) AS n
                 FROM ut GROUP BY 1),
         b AS (SELECT a.t AS type_a, c.t AS type_b,
                      CAST(count(*) AS BIGINT) AS n_both
               FROM ut a JOIN ut c ON a.u = c.u AND a.t < c.t
               GROUP BY 1, 2),
         grid AS (SELECT ta.t AS type_a, tb.t AS type_b,
                         ta.n AS n_a, tb.n AS n_b,
                         CAST(coalesce(b.n_both, 0) AS BIGINT) AS n_both
                  FROM tot ta CROSS JOIN tot tb
                  LEFT JOIN b ON b.type_a = ta.t AND b.type_b = tb.t
                  WHERE ta.t < tb.t)
         SELECT type_a, type_b, n_a, n_b, n_both,
                CAST(n_both * 1000000 // (n_a + n_b - n_both) AS BIGINT)
                  AS jaccard_ppm
         FROM grid ORDER BY type_a, type_b""",
    // EWMA: the identical integer recurrence as a recursive CTE —
    // the oracle engine walks day i from day i-1 exactly as the
    // driver fold does. SHARED by the batch q209 and the streaming
    // q212 (the gate: replay-to-completion must equal the batch).
    "q209_ewma_baseline" -> ewmaOracleSql,
    "q212_streaming_ewma" -> ewmaOracleSql,
    // Mann-Whitney: doubled midranks off the q199 shared histogram;
    // 2R_A = sum ca*(2*r0 + m + 1) with the exclusive prefix.
    "q210_mann_whitney" -> """
         WITH q AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                    FROM documents
                    WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
         h AS (SELECT v,
                      CAST(count(CASE WHEN g = 'en' THEN 1 END)
                        AS BIGINT) AS ca,
                      CAST(count(CASE WHEN g = 'de' THEN 1 END)
                        AS BIGINT) AS cb
               FROM q GROUP BY 1),
         c AS (SELECT v, ca, cb, ca + cb AS m,
                      CAST(coalesce(sum(ca + cb) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS r0
               FROM h),
         t AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
                      CAST(coalesce(sum(cb), 0) AS BIGINT) AS nb,
                      CAST(coalesce(sum(ca * (2 * r0 + m + 1)), 0)
                        AS BIGINT) AS r2a
               FROM c)
         SELECT na AS n_a, nb AS n_b,
                CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
                CAST(2 * na * nb - (r2a - na * (na + 1)) AS BIGINT)
                  AS u2_b,
                CASE WHEN na = 0 OR nb = 0 THEN 0
                     ELSE (r2a - na * (na + 1)) * 1000000
                          // (2 * na * nb) END AS auc_ppm
         FROM t""",
    // KL: per-category micro terms via the identical stated chain
    // (exact-long ratios through one ln), summed exactly; weekday =
    // Spark dayofweek 2..6 = DuckDB dayofweek+1 in 2..6.
    "q211_kl_divergence" -> """
         WITH e AS (SELECT CAST(event_type AS VARCHAR) AS cat,
                           CASE WHEN dayofweek(ts::DATE) + 1 BETWEEN 2
                                  AND 6
                                THEN 'weekday' ELSE 'weekend' END AS g
                    FROM events WHERE event_type IS NOT NULL),
         cells AS (SELECT cat,
                          CAST(count(CASE WHEN g = 'weekday' THEN 1 END)
                            AS BIGINT) AS a,
                          CAST(count(CASE WHEN g = 'weekend' THEN 1 END)
                            AS BIGINT) AS b
                   FROM e GROUP BY 1),
         t AS (SELECT CAST(coalesce(sum(a), 0) AS BIGINT) AS ta,
                      CAST(coalesce(sum(b), 0) AS BIGINT) AS tb
               FROM cells),
         terms AS (SELECT a, b, ta, tb,
                          CASE WHEN a = 0 THEN 0
                               WHEN b = 0 THEN NULL
                               ELSE CAST(round(a::DOUBLE / ta::DOUBLE
                                 * ln((a * tb)::DOUBLE / (b * ta)::DOUBLE)
                                 * 1000000) AS BIGINT)
                          END AS term
                   FROM cells CROSS JOIN t),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
                        CAST(count(CASE WHEN a > 0 AND b = 0 THEN 1 END)
                          AS BIGINT) AS n_a_only,
                        CAST(coalesce(max(ta), 0) AS BIGINT) AS n_rows_a,
                        CAST(coalesce(max(tb), 0) AS BIGINT) AS n_rows_b,
                        CAST(sum(term) AS BIGINT) AS kl
                 FROM terms)
         SELECT n_categories, n_a_only, n_rows_a, n_rows_b,
                CASE WHEN n_a_only > 0 OR n_rows_a = 0 OR n_rows_b = 0
                     THEN NULL ELSE kl END AS kl_micro
         FROM agg""",
    // Spearman: both columns' doubled midranks joined back on the
    // value, centered by the exact integer mean rank n+1, Pearson
    // tail in the stated IEEE chain.
    "q213_spearman" -> """
         WITH q AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                           CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS y
                    FROM lineitem
                    WHERE l_quantity IS NOT NULL
                      AND l_extendedprice IS NOT NULL),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
         hx AS (SELECT x, CAST(count(*) AS BIGINT) AS m FROM q GROUP BY 1),
         rx AS (SELECT x,
                       2 * CAST(coalesce(sum(m) OVER (ORDER BY x
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS BIGINT) + m + 1 AS r2x
                FROM hx),
         hy AS (SELECT y, CAST(count(*) AS BIGINT) AS m FROM q GROUP BY 1),
         ry AS (SELECT y,
                       2 * CAST(coalesce(sum(m) OVER (ORDER BY y
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS BIGINT) + m + 1 AS r2y
                FROM hy),
         c AS (SELECT r2x - (n + 1) AS cx, r2y - (n + 1) AS cy, n
               FROM q JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN t),
         a AS (SELECT n,
                      CAST(coalesce(sum(cx * cy), 0) AS BIGINT) AS sxy,
                      CAST(coalesce(sum(cx * cx), 0) AS BIGINT) AS sxx,
                      CAST(coalesce(sum(cy * cy), 0) AS BIGINT) AS syy
               FROM c GROUP BY n)
         SELECT n, sxy, sxx, syy,
                CASE WHEN sxx > 0 AND syy > 0
                     THEN round(sxy::DOUBLE
                       / (sqrt(sxx::DOUBLE) * sqrt(syy::DOUBLE)), 6)
                     ELSE NULL END AS rho
         FROM a""",
    // Q-Q: the q169 per-group position selection, en joined to de on
    // the decile.
    "q214_qq_table" -> """
         WITH q AS (SELECT lang AS k, CAST(n_chars AS BIGINT) AS v
                    FROM documents WHERE lang IN ('en', 'de')),
         h AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c
               FROM q GROUP BY 1, 2),
         w AS (SELECT k, v, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS below
               FROM h),
         t AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY k),
         p AS (SELECT CAST(unnest([10, 20, 30, 40, 50, 60, 70, 80, 90])
                 AS BIGINT) AS pct),
         sel AS (SELECT w.k, p.pct, w.v
                 FROM w JOIN t USING (k) CROSS JOIN p
                 WHERE below < (pct * n + 99) // 100
                   AND (pct * n + 99) // 100 <= below + c)
         SELECT e.pct, e.v AS v_en, d.v AS v_de,
                CASE WHEN d.v <> 0 THEN e.v * 1000000 // d.v
                     ELSE NULL END AS ratio_ppm
         FROM sel e JOIN sel d ON e.pct = d.pct
         WHERE e.k = 'en' AND d.k = 'de'
         ORDER BY e.pct""",
    // Peak concurrency: the same +1/-1 sweep per day; the first
    // second attaining the peak mirrors the struct-max.
    "q215_peak_concurrency" -> """
         WITH sess AS (SELECT user_id, ts::DATE AS d,
                              CAST(floor(epoch(min(ts))) AS BIGINT) AS s,
                              CAST(floor(epoch(max(ts))) AS BIGINT) AS e
                       FROM events GROUP BY 1, 2),
         del AS (SELECT d AS day, s AS sec, 1 AS delta FROM sess
                 UNION ALL
                 SELECT d, e + 1, -1 FROM sess),
         h AS (SELECT day, sec, CAST(sum(delta) AS BIGINT) AS dl,
                      CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS ns
               FROM del GROUP BY 1, 2),
         c AS (SELECT day, sec, ns,
                      CAST(sum(dl) OVER (PARTITION BY day ORDER BY sec
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM h),
         t AS (SELECT day, CAST(sum(ns) AS BIGINT) AS n_intervals
               FROM c GROUP BY 1),
         r AS (SELECT day, cum, sec,
                      row_number() OVER (PARTITION BY day
                        ORDER BY cum DESC, sec ASC) AS rn
               FROM c)
         SELECT CAST(r.day AS VARCHAR) AS day, t.n_intervals,
                r.cum AS peak_concurrent, r.sec AS at_second
         FROM r JOIN t USING (day)
         WHERE rn = 1 ORDER BY day""",
    // Winsorize: the q169 position selection pivoted to per-group
    // (lo, hi), clamped row-level.
    "q216_winsorize" -> """
         WITH q AS (SELECT doc_id, CAST(lang AS VARCHAR) AS key,
                           CAST(n_chars AS BIGINT) AS v
                    FROM documents WHERE n_chars IS NOT NULL),
         h AS (SELECT key, v, CAST(count(*) AS BIGINT) AS c
               FROM q GROUP BY 1, 2),
         w AS (SELECT key, v, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY key
                        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS below
               FROM h),
         t AS (SELECT key, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
         p AS (SELECT CAST(unnest([10, 90]) AS BIGINT) AS pct),
         sel AS (SELECT w.key, p.pct, w.v
                 FROM w JOIN t USING (key) CROSS JOIN p
                 WHERE below < (pct * n + 99) // 100
                   AND (pct * n + 99) // 100 <= below + c),
         lim AS (SELECT key,
                        max(CASE WHEN pct = 10 THEN v END) AS lo,
                        max(CASE WHEN pct = 90 THEN v END) AS hi
                 FROM sel GROUP BY 1)
         SELECT q.doc_id, q.key, q.v,
                greatest(lim.lo, least(lim.hi, q.v)) AS v_clipped,
                lim.lo, lim.hi
         FROM q JOIN lim USING (key) ORDER BY q.doc_id""",
    // Scene changes: q167's frame checksums (every frame, no
    // sampling) + per-doc lag; a cut moves >= 10% of the previous
    // frame's mass.
    "q217_scene_changes" -> """
         WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 13 + 2 AS w,
                           strlen(text) % 7 + 2 AS h,
                           strlen(text) % 5 + 2 AS nf
                    FROM documents),
         fr AS (SELECT doc_id, text, len, w, h, unnest(range(nf)) AS f
                FROM m),
         px AS (SELECT doc_id, f, w, h, len, text,
                       unnest(range(w * h * 3)) AS i
                FROM fr),
         ck AS (SELECT doc_id, f,
                       CAST(sum(ord(substr(text,
                         CAST((i + f) % len AS INTEGER) + 1, 1)))
                         AS BIGINT) AS px_checksum
                FROM px GROUP BY 1, 2),
         d AS (SELECT doc_id, f, px_checksum,
                      lag(px_checksum) OVER (PARTITION BY doc_id
                        ORDER BY f) AS prev
               FROM ck)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
                CAST(count(CASE WHEN prev IS NOT NULL
                           AND abs(px_checksum - prev)
                               >= greatest(1, prev // 10)
                           THEN 1 END) AS BIGINT) AS n_cuts,
                CAST(coalesce(max(abs(px_checksum - prev)), 0) AS BIGINT)
                  AS max_delta
         FROM d GROUP BY doc_id ORDER BY doc_id""",
    // Pettitt: U_t = cum(2R) - t*(n+1) over per-type doubled
    // midranks; the first day maximizing |U| is the split.
    "q218_pettitt" -> """
         WITH daily AS (SELECT CAST(event_type AS VARCHAR) AS typ,
                               ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         h AS (SELECT typ, v, CAST(count(*) AS BIGINT) AS m
               FROM daily GROUP BY 1, 2),
         r AS (SELECT typ, v,
                      2 * CAST(coalesce(sum(m) OVER (PARTITION BY typ
                        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) + m + 1 AS r2
               FROM h),
         j AS (SELECT d.typ, d.day,
                      CAST(count(*) OVER (PARTITION BY d.typ) AS BIGINT)
                        AS n,
                      CAST(row_number() OVER (PARTITION BY d.typ
                        ORDER BY d.day) AS BIGINT) AS t,
                      CAST(sum(r.r2) OVER (PARTITION BY d.typ
                        ORDER BY d.day ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum
               FROM daily d JOIN r ON d.typ = r.typ AND d.v = r.v),
         u AS (SELECT typ, day, n, abs(cum - t * (n + 1)) AS a
               FROM j WHERE t < n),
         mx AS (SELECT typ, day, n, a,
                       row_number() OVER (PARTITION BY typ
                         ORDER BY a DESC, day ASC) AS rn
                FROM u)
         SELECT typ AS event_type, n AS n_days, a AS k2,
                CAST(day AS VARCHAR) AS at_day
         FROM mx WHERE rn = 1
         UNION ALL
         SELECT typ, CAST(count(*) AS BIGINT), CAST(0 AS BIGINT), NULL
         FROM daily GROUP BY typ HAVING count(*) < 2
         ORDER BY event_type""",
    // FD audit: the pair list is generated from the SAME Scala
    // literal as the Spark plan (the minHashCoeffsSql discipline).
    "q219_fd_audit" -> {
      val fdCols =
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      val parts = for { a <- fdCols; b <- fdCols if a != b } yield
        s"""SELECT '$a' AS determinant, '$b' AS dependent,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(count(CASE WHEN d > 1 THEN 1 END) AS BIGINT)
                     AS n_violating,
                   CASE WHEN count(*) > 0
                        THEN count(CASE WHEN d > 1 THEN 1 END)
                             * 1000000 // count(*)
                        ELSE 0 END AS violating_ppm
            FROM (SELECT _a, CAST(count(DISTINCT _b) AS BIGINT) AS d
                  FROM (SELECT CAST($a AS VARCHAR) AS _a,
                               CAST($b AS VARCHAR) AS _b
                        FROM orders
                        WHERE $a IS NOT NULL AND $b IS NOT NULL) z
                  GROUP BY _a) g"""
      s"""SELECT * FROM (${parts.mkString(" UNION ALL ")}) u
          ORDER BY determinant, dependent"""
    },
    // Readability: the identical marker-collapse runs counting and
    // the identical IEEE chain (DuckDB regexp_replace needs 'g').
    "q220_readability" -> """
         WITH m AS (SELECT doc_id, text,
                           regexp_replace(lower(text), '[aeiouy]+', 'V',
                             'g') AS r1,
                           regexp_replace(lower(text), '[.!?]+', 'S',
                             'g') AS r2
                    FROM documents WHERE strlen(text) > 0),
         x AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT)
                        AS n_words,
                      greatest(1, CAST(strlen(r2)
                        - strlen(regexp_replace(r2, 'S', '', 'g'))
                        AS BIGINT)) AS n_sentences,
                      CAST(strlen(r1)
                        - strlen(regexp_replace(r1, 'V', '', 'g'))
                        AS BIGINT) AS n_vowel_runs
               FROM m)
         SELECT doc_id, n_words, n_sentences, n_vowel_runs,
                CAST(round((206.835
                  - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
                  - 84.6 * (n_vowel_runs::DOUBLE / n_words::DOUBLE))
                  * 1000000) AS BIGINT) AS flesch_micro
         FROM x ORDER BY doc_id""",
    // Behavioral diversity: the q170 entropy arithmetic per user,
    // bucketed quarter-nat; h_micro stays in the min/max columns so
    // the hash is sensitive to the exact per-user values.
    "q221_behavioral_diversity" -> """
         WITH ut AS (SELECT CAST(user_id AS VARCHAR) AS u,
                            CAST(event_type AS VARCHAR) AS t,
                            CAST(count(*) AS BIGINT) AS c
                     FROM events
                     WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                     GROUP BY 1, 2),
         per AS (SELECT u,
                        CAST(sum(c) AS BIGINT) AS n,
                        CAST(count(*) AS BIGINT) AS n_types,
                        CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT))
                          AS BIGINT) AS t
                 FROM ut GROUP BY 1),
         h AS (SELECT u, n_types,
                      CAST(round(ln(n) * 1e6) AS BIGINT) - t // n
                        AS h_micro
               FROM per)
         SELECT greatest(h_micro, 0) // 250000 AS bucket,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(min(h_micro) AS BIGINT) AS min_h_micro,
                CAST(max(h_micro) AS BIGINT) AS max_h_micro,
                CAST(max(n_types) AS BIGINT) AS max_types
         FROM h GROUP BY 1 ORDER BY 1""",
    // Frequency response: strict-before touch counts, cap+1 buckets,
    // exact conversion ppm.
    "q222_frequency_response" -> """
         WITH e AS (SELECT CAST(user_id AS VARCHAR) AS u, ts,
                           CAST(event_type AS VARCHAR) AS t
                    FROM events WHERE user_id IS NOT NULL),
         per AS (SELECT u,
                        min(CASE WHEN t = 'purchase' THEN ts END)
                          AS conv_ts,
                        CAST(count(CASE WHEN t = 'view' THEN 1 END)
                          AS BIGINT) AS all_touches
                 FROM e GROUP BY 1),
         pre AS (SELECT e.u, CAST(count(*) AS BIGINT) AS pre_touches
                 FROM e JOIN per ON e.u = per.u
                 WHERE e.t = 'view' AND per.conv_ts IS NOT NULL
                   AND e.ts < per.conv_ts
                 GROUP BY 1),
         j AS (SELECT per.u,
                      per.conv_ts IS NOT NULL AS converted,
                      CASE WHEN per.conv_ts IS NOT NULL
                           THEN coalesce(pre.pre_touches, 0)
                           ELSE per.all_touches END AS touches
               FROM per LEFT JOIN pre ON per.u = pre.u)
         SELECT least(touches, 10) AS touch_bucket,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(count(CASE WHEN converted THEN 1 END) AS BIGINT)
                  AS n_converted,
                CAST(count(CASE WHEN converted THEN 1 END) * 1000000
                  // count(*) AS BIGINT) AS conversion_ppm
         FROM j GROUP BY 1 ORDER BY 1""",
    // Aggregate consistency: cent-quantized parent total vs child
    // rollup, relative gap in exact ppm, childless split out.
    "q223_agg_consistency" -> """
         WITH p AS (SELECT CAST(o_orderkey AS VARCHAR) AS key,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                             AS pv
                    FROM orders
                    WHERE o_orderkey IS NOT NULL
                      AND o_totalprice IS NOT NULL),
         c AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                      CAST(sum(CAST(round(l_extendedprice * 100)
                        AS BIGINT)) AS BIGINT) AS cs
               FROM lineitem
               WHERE l_orderkey IS NOT NULL
                 AND l_extendedprice IS NOT NULL
               GROUP BY 1),
         j AS (SELECT p.key, c.cs IS NULL AS childless,
                      CASE WHEN c.cs IS NULL THEN 0
                           ELSE abs(p.pv - c.cs) * 1000000
                                // greatest(1, abs(p.pv)) END
                        AS rel_gap_ppm
               FROM p LEFT JOIN c ON p.key = c.key),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_parents,
                      CAST(count(CASE WHEN childless THEN 1 END)
                        AS BIGINT) AS n_childless,
                      CAST(count(CASE WHEN NOT childless
                                 AND rel_gap_ppm > 50000 THEN 1 END)
                        AS BIGINT) AS n_violating,
                      CAST(coalesce(max(CASE WHEN NOT childless
                                        THEN rel_gap_ppm END), 0)
                        AS BIGINT) AS max_rel_gap_ppm
               FROM j)
         SELECT n_parents, n_childless, n_violating,
                CASE WHEN n_parents > 0
                     THEN n_violating * 1000000 // n_parents
                     ELSE 0 END AS violating_ppm,
                max_rel_gap_ppm
         FROM a""",
    // Densify: generate_series over each type's span, left join,
    // explicit zero days.
    "q224_densify_days" -> """
         WITH daily AS (SELECT CAST(event_type AS VARCHAR) AS typ,
                               ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         span AS (SELECT typ, min(day) AS d0, max(day) AS d1
                  FROM daily GROUP BY 1),
         axis AS (SELECT typ,
                         CAST(unnest(generate_series(d0, d1,
                           INTERVAL 1 DAY)) AS DATE) AS day
                  FROM span)
         SELECT axis.typ AS event_type, CAST(axis.day AS VARCHAR) AS day,
                CAST(coalesce(daily.v, 0) AS BIGINT) AS v,
                daily.v IS NULL AS is_gap
         FROM axis LEFT JOIN daily
           ON axis.typ = daily.typ AND axis.day = daily.day
         ORDER BY event_type, day""",
    // Capped census: the q205 graph with the both-endpoint degree-2
    // cap applied before the same census arithmetic.
    "q225_triangles_capped" ->
      s"""WITH $minHashPairsSql,
         ws AS (SELECT doc_id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents),
         vp AS (SELECT p.a, p.b
                FROM pairs p
                JOIN ws wa ON wa.doc_id = p.a
                JOIN ws wb ON wb.doc_id = p.b
                WHERE len(list_distinct(wa.ws || wb.ws)) > 0
                  AND CAST(len(list_intersect(wa.ws, wb.ws)) AS BIGINT)
                        * 1000000
                        // CAST(len(list_distinct(wa.ws || wb.ws)) AS BIGINT)
                        >= 500000),
         e0 AS (SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
                FROM vp WHERE a <> b),
         half AS (SELECT x AS v, y AS w FROM e0
                  UNION ALL SELECT y, x FROM e0),
         rk AS (SELECT v, w,
                       row_number() OVER (PARTITION BY v ORDER BY w) AS r
                FROM half),
         e AS (SELECT x, y FROM (
                 SELECT least(v, w) AS x, greatest(v, w) AS y,
                        count(*) AS k
                 FROM rk WHERE r <= 2 GROUP BY 1, 2) z
               WHERE k = 2),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT x AS v FROM e UNION ALL SELECT y FROM e) u
                 GROUP BY 1),
         shape AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                          CAST(coalesce(sum(d * (d - 1) // 2), 0)
                            AS BIGINT) AS n_wedges
                   FROM deg),
         ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         tr AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                FROM e e1 JOIN e e2 ON e1.y = e2.x
                WHERE EXISTS (SELECT 1 FROM e e3
                              WHERE e3.x = e1.x AND e3.y = e2.y))
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
                CASE WHEN n_wedges > 0
                     THEN 3 * n_triangles * 1000000 // n_wedges
                     ELSE 0 END AS clustering_ppm
         FROM shape CROSS JOIN ne CROSS JOIN tr""",
    // Holt: the identical two-state recurrence as a recursive CTE;
    // every micro division truncates TOWARD ZERO (sign-split) to
    // mirror the driver fold's Long division on the signed trend.
    "q226_holt" -> {
      def tdiv(x: String): String =
        s"(CASE WHEN ($x) >= 0 THEN ($x) // 1000000" +
          s" ELSE -((-($x)) // 1000000) END)"
      val l2 = s"(300000 * o.v + ${tdiv("(1000000 - 300000) * (r.l + r.b)")})"
      s"""WITH RECURSIVE daily AS (
           SELECT CAST(event_type AS VARCHAR) AS typ, ts::DATE AS day,
                  CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         ord AS (SELECT typ, day, v,
                        CAST(row_number() OVER (PARTITION BY typ
                          ORDER BY day) AS BIGINT) AS i
                 FROM daily),
         rec AS (
           SELECT typ, day, v, i,
                  CAST(v * 1000000 AS BIGINT) AS l,
                  CAST(0 AS BIGINT) AS b
           FROM ord WHERE i = 1
           UNION ALL
           SELECT o.typ, o.day, o.v, o.i,
                  CAST($l2 AS BIGINT),
                  CAST(${tdiv(s"200000 * ($l2 - r.l)")}
                    + ${tdiv("(1000000 - 200000) * r.b")} AS BIGINT)
           FROM ord o JOIN rec r ON o.typ = r.typ AND o.i = r.i + 1)
         SELECT typ AS event_type, CAST(day AS VARCHAR) AS day, v,
                CAST(l AS BIGINT) AS level_micro,
                CAST(b AS BIGINT) AS trend_micro,
                CAST(l + b AS BIGINT) AS forecast_micro
         FROM rec ORDER BY event_type, day"""
    },
    // Top PC: the q139 sufficient-stats mirror feeding an unrolled
    // power-iteration CTE chain generated from PcaPowerIters; every
    // signed division truncates toward zero (the q226 convention).
    "q227_top_pc" -> {
      def tz(x: String, d: String): String =
        s"(CASE WHEN ($x) >= 0 THEN ($x) // ($d)" +
          s" ELSE -((-($x)) // ($d)) END)"
      val chain = (1 to PcaPowerIters).map { k =>
        val p = k - 1
        s"""y$k AS MATERIALIZED (SELECT cs.i AS d,
                     CAST(sum(cs.cv * x$p.x) AS BIGINT) AS y
              FROM cs JOIN x$p ON cs.j = x$p.d GROUP BY cs.i),
         m$k AS MATERIALIZED (SELECT greatest(1, max(abs(y)) // 1000000) AS dv,
                        CAST(max(abs(y)) AS BIGINT) AS my FROM y$k),
         mp$k AS MATERIALIZED (SELECT greatest(1, max(abs(x))) AS m FROM x$p),
         x$k AS MATERIALIZED (SELECT d, ${tz("y", "dv")} AS x
                 FROM y$k CROSS JOIN m$k)"""
      }.mkString(",\n         ")
      val n = PcaPowerIters
      s"""WITH q AS MATERIALIZED (SELECT list_transform(range(64), d ->
                      CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE
                        * 1e3) AS BIGINT)) AS qv
                    FROM embeddings),
         pp AS MATERIALIZED (SELECT CAST(d1.d AS BIGINT) AS d1,
                       CAST(d2.d AS BIGINT) AS d2,
                       qv[CAST(d1.d + 1 AS INTEGER)] AS x1,
                       qv[CAST(d2.d + 1 AS INTEGER)] AS x2
                FROM q
                CROSS JOIN (SELECT unnest(range(64)) AS d) d1
                CROSS JOIN (SELECT unnest(range(64)) AS d) d2
                WHERE d1.d <= d2.d),
         st AS MATERIALIZED (SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x1) AS BIGINT) AS s1,
                       CAST(sum(x2) AS BIGINT) AS s2,
                       CAST(sum(x1 * x2) AS BIGINT) AS s12
                FROM pp GROUP BY d1, d2),
         cf AS MATERIALIZED (SELECT d1 AS i, d2 AS j, n * s12 - s1 * s2 AS cv FROM st
                UNION ALL
                SELECT d2, d1, n * s12 - s1 * s2 FROM st WHERE d1 <> d2),
         sc AS MATERIALIZED (SELECT greatest(1, max(abs(cv)) // 1000000) AS s FROM cf),
         cs AS MATERIALIZED (SELECT i, j, ${tz("cv", "s")} AS cv
                FROM cf CROSS JOIN sc),
         x0 AS MATERIALIZED (SELECT CAST(unnest(range(64)) AS BIGINT) AS d,
                       CAST(1000000 AS BIGINT) AS x),
         $chain,
         lam AS MATERIALIZED (SELECT m$n.my // greatest(1, mp$n.m // 1000000)
                   AS lambda
                 FROM m$n CROSS JOIN mp$n),
         tr AS MATERIALIZED (SELECT CAST(sum(cv) AS BIGINT) AS t FROM cs WHERE i = j),
         mxf AS MATERIALIZED (SELECT max(abs(x)) AS m FROM x$n),
         ld AS MATERIALIZED (SELECT min(d) AS d FROM x$n CROSS JOIN mxf
                WHERE abs(x) = m),
         sg AS MATERIALIZED (SELECT CASE WHEN xf.x < 0 THEN -1 ELSE 1 END AS s
                FROM x$n xf JOIN ld ON xf.d = ld.d),
         ex AS MATERIALIZED (SELECT CASE WHEN tr.t > 0
                            THEN lam.lambda // greatest(1, tr.t)
                            ELSE 0 END AS e
                FROM lam CROSS JOIN tr)
         SELECT xf.d AS dim, CAST(xf.x * sg.s AS BIGINT) AS component_ppm,
                CAST(lam.lambda AS BIGINT) AS lambda_scaled,
                CAST(tr.t AS BIGINT) AS trace_scaled,
                CAST(ex.e AS BIGINT) AS explained_ppm
         FROM x$n xf CROSS JOIN lam CROSS JOIN tr CROSS JOIN sg
              CROSS JOIN ex
         ORDER BY dim"""
    },
    // Cohort LTV: the q194 integer-week arithmetic; epoch days via
    // the date-difference form (both engines agree on DATE - DATE).
    "q228_cohort_ltv" -> """
         WITH q AS (SELECT CAST(o_custkey AS VARCHAR) AS e,
                           (o_orderdate::DATE - DATE '1970-01-01') AS ed,
                           CAST(round(o_totalprice * 100) AS BIGINT) AS v
                    FROM orders
                    WHERE o_custkey IS NOT NULL
                      AND o_orderdate IS NOT NULL
                      AND o_totalprice IS NOT NULL),
         qw AS (SELECT e, (ed - 4) // 7 AS w, v FROM q),
         first AS (SELECT e, CAST(min(w) AS BIGINT) AS w0
                   FROM qw GROUP BY 1),
         sizes AS (SELECT w0, CAST(count(*) AS BIGINT) AS n_entities
                   FROM first GROUP BY 1),
         rev AS (SELECT f.w0, CAST(qw.w - f.w0 AS BIGINT)
                          AS offset_weeks,
                        CAST(sum(qw.v) AS BIGINT) AS revenue
                 FROM qw JOIN first f ON qw.e = f.e
                 GROUP BY 1, 2),
         cum AS (SELECT w0, offset_weeks, revenue,
                        CAST(sum(revenue) OVER (PARTITION BY w0
                          ORDER BY offset_weeks
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                          AS cum_revenue
                 FROM rev)
         SELECT CAST(DATE '1970-01-01' + CAST(4 + 7 * cum.w0 AS INTEGER)
                  AS VARCHAR) AS cohort_week,
                cum.offset_weeks, sizes.n_entities, cum.revenue,
                cum.cum_revenue,
                CAST(cum.cum_revenue // sizes.n_entities AS BIGINT)
                  AS cum_per_entity
         FROM cum JOIN sizes ON cum.w0 = sizes.w0
         ORDER BY cohort_week, offset_weeks""",
    // Time-decay attribution: the same decay VALUES, floor shares,
    // and most-recent-touch remainder pinning (micros precision,
    // ties to the smallest channel name).
    "q229_time_decay_attribution" -> {
      val vals = DecayWeightsPpm.zipWithIndex
        .map { case (w, g) => s"($g, $w)" }.mkString(", ")
      s"""WITH w(g, wt) AS (SELECT * FROM (VALUES $vals)),
         e AS (SELECT CAST(user_id AS VARCHAR) AS u, ts,
                      CAST(event_type AS VARCHAR) AS t,
                      (ts::DATE - DATE '1970-01-01') AS d
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         conv AS (SELECT DISTINCT u, epoch_us(ts) AS cus, d AS cd
                  FROM e WHERE t = 'purchase'),
         touch AS (SELECT u, epoch_us(ts) AS tus, d AS td,
                          t AS channel
                   FROM e WHERE t IN ('signup', 'view', 'click')),
         j AS (SELECT c.u, c.cus, tch.channel, tch.tus,
                      CAST(w.wt AS BIGINT) AS wv
               FROM conv c
               JOIN touch tch ON c.u = tch.u AND tch.tus < c.cus
                 AND c.cd - tch.td BETWEEN 0 AND 30
               JOIN w ON w.g = c.cd - tch.td),
         perchan AS (SELECT u, cus, channel,
                            CAST(sum(wv) AS BIGINT) AS ws,
                            max(tus) AS lastT
                     FROM j GROUP BY 1, 2, 3),
         perconv AS (SELECT u, cus, CAST(sum(ws) AS BIGINT) AS wtot
                     FROM perchan GROUP BY 1, 2),
         win AS (SELECT u, cus, channel AS winner FROM (
                   SELECT u, cus, channel,
                          row_number() OVER (PARTITION BY u, cus
                            ORDER BY lastT DESC, channel ASC) AS rn
                   FROM perchan) z
                 WHERE rn = 1),
         based AS (SELECT pc.u, pc.cus, pc.channel, pc.ws, p.wtot,
                          wn.winner,
                          CASE WHEN p.wtot > 0
                               THEN pc.ws * 1000000 // p.wtot
                               ELSE 0 END AS base
                   FROM perchan pc
                   JOIN perconv p ON pc.u = p.u AND pc.cus = p.cus
                   JOIN win wn ON pc.u = wn.u AND pc.cus = wn.cus),
         fs AS (SELECT u, cus, CAST(sum(base) AS BIGINT) AS f
                FROM based GROUP BY 1, 2),
         cr AS (SELECT b.channel,
                       b.base + CASE WHEN b.wtot > 0
                                     AND b.channel = b.winner
                                THEN 1000000 - fs.f ELSE 0 END AS credit
                FROM based b
                JOIN fs ON b.u = fs.u AND b.cus = fs.cus),
         nt AS (SELECT 'none' AS channel,
                       CAST(1000000 AS BIGINT) AS credit
                FROM conv c
                WHERE NOT EXISTS (SELECT 1 FROM j
                                  WHERE j.u = c.u AND j.cus = c.cus)),
         al AS (SELECT channel, credit FROM cr
                UNION ALL SELECT channel, credit FROM nt)
         SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
                CAST(sum(credit) AS BIGINT) AS credit_ppm_total
         FROM al GROUP BY 1 ORDER BY channel"""
    },
    // Next-event accuracy: the q122 pair extraction, argmax by
    // (n desc, name asc), scored against actual successors.
    "q230_next_event_accuracy" -> """
         WITH pairs AS (SELECT event_type AS from_type,
                               lead(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS to_type
                        FROM events),
         p2 AS (SELECT from_type, to_type FROM pairs
                WHERE to_type IS NOT NULL),
         counts AS (SELECT from_type, to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM p2 GROUP BY 1, 2),
         pred AS (SELECT from_type, to_type AS predicted FROM (
                    SELECT from_type, to_type,
                           row_number() OVER (PARTITION BY from_type
                             ORDER BY n DESC, to_type ASC) AS rn
                    FROM counts) z
                  WHERE rn = 1),
         scored AS (SELECT p2.from_type, pred.predicted,
                           CAST(count(*) AS BIGINT) AS n_transitions,
                           CAST(count(CASE WHEN p2.to_type
                                      = pred.predicted THEN 1 END)
                             AS BIGINT) AS n_correct
                    FROM p2 JOIN pred ON p2.from_type = pred.from_type
                    GROUP BY 1, 2),
         al AS (SELECT from_type, predicted, n_transitions, n_correct
                FROM scored
                UNION ALL
                SELECT '__overall__', NULL,
                       CAST(coalesce(sum(n_transitions), 0) AS BIGINT),
                       CAST(coalesce(sum(n_correct), 0) AS BIGINT)
                FROM scored)
         SELECT from_type, predicted, n_transitions, n_correct,
                CASE WHEN n_transitions > 0
                     THEN n_correct * 1000000 // n_transitions
                     ELSE 0 END AS accuracy_ppm
         FROM al ORDER BY from_type""",
    // Classification report: the q27 prediction CTEs feeding exact
    // ppm P/R/F1 per class plus the floor-mean macro row.
    "q231_classification_report" -> """
         WITH s AS (SELECT lang,
                           list_distinct(string_split(text, ' ')) AS ws
                    FROM documents),
         sc AS (SELECT lang,
             len(list_intersect(ws, ['the','a','of','and','to'])) AS s_en,
             len(list_intersect(ws, ['der','die','das','und','ist'])) AS s_de,
             len(list_intersect(ws, ['el','la','los','y','es'])) AS s_es,
             len(list_intersect(ws, ['le','la','les','et','est'])) AS s_fr,
             len(list_intersect(ws, ['de','shi','zhe','he','bu'])) AS s_zh
           FROM s),
         pr AS (SELECT lang AS a, CASE
             WHEN s_en = g AND g > 0 THEN 'en'
             WHEN s_de = g AND g > 0 THEN 'de'
             WHEN s_es = g AND g > 0 THEN 'es'
             WHEN s_fr = g AND g > 0 THEN 'fr'
             WHEN s_zh = g AND g > 0 THEN 'zh'
             ELSE 'und' END AS pdt
           FROM (SELECT *, GREATEST(s_en, s_de, s_es, s_fr, s_zh) AS g
                 FROM sc) t),
         cells AS (SELECT a, pdt, CAST(count(*) AS BIGINT) AS n
                   FROM pr GROUP BY 1, 2),
         classes AS (SELECT a AS cls FROM cells
                     UNION SELECT pdt FROM cells),
         act AS (SELECT a AS cls, CAST(sum(n) AS BIGINT) AS n_actual
                 FROM cells GROUP BY 1),
         prd AS (SELECT pdt AS cls, CAST(sum(n) AS BIGINT) AS n_predicted
                 FROM cells GROUP BY 1),
         tp AS (SELECT a AS cls, n AS n_correct FROM cells WHERE a = pdt),
         per AS (SELECT classes.cls,
                        CAST(coalesce(act.n_actual, 0) AS BIGINT)
                          AS n_actual,
                        CAST(coalesce(prd.n_predicted, 0) AS BIGINT)
                          AS n_predicted,
                        CAST(coalesce(tp.n_correct, 0) AS BIGINT)
                          AS n_correct
                 FROM classes
                 LEFT JOIN act USING (cls)
                 LEFT JOIN prd USING (cls)
                 LEFT JOIN tp USING (cls)),
         m AS (SELECT cls, n_actual, n_predicted, n_correct,
                      CASE WHEN n_predicted > 0
                           THEN n_correct * 1000000 // n_predicted
                           ELSE 0 END AS precision_ppm,
                      CASE WHEN n_actual > 0
                           THEN n_correct * 1000000 // n_actual
                           ELSE 0 END AS recall_ppm
               FROM per),
         f AS (SELECT *, CASE WHEN precision_ppm + recall_ppm > 0
                              THEN 2 * precision_ppm * recall_ppm
                                   // (precision_ppm + recall_ppm)
                              ELSE 0 END AS f1_ppm
               FROM m),
         mac AS (SELECT '__macro__' AS cls,
                        CAST(sum(n_actual) AS BIGINT) AS n_actual,
                        CAST(sum(n_predicted) AS BIGINT) AS n_predicted,
                        CAST(sum(n_correct) AS BIGINT) AS n_correct,
                        CAST(sum(precision_ppm) // count(*) AS BIGINT)
                          AS precision_ppm,
                        CAST(sum(recall_ppm) // count(*) AS BIGINT)
                          AS recall_ppm,
                        CAST(sum(f1_ppm) // count(*) AS BIGINT) AS f1_ppm
                 FROM f)
         SELECT cls, n_actual, n_predicted, n_correct, precision_ppm,
                recall_ppm, f1_ppm
         FROM (SELECT * FROM f UNION ALL SELECT * FROM mac) u
         ORDER BY cls""",
    // Forecast backtest: the q209 recurrence + the MAE tail over
    // days >= 2 (the EWMA's dev IS its standing one-step error).
    "q232_forecast_backtest" -> """
         WITH RECURSIVE daily AS (
           SELECT CAST(event_type AS VARCHAR) AS typ, ts::DATE AS day,
                  CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         ord AS (SELECT typ, day, v,
                        CAST(row_number() OVER (PARTITION BY typ
                          ORDER BY day) AS BIGINT) AS i
                 FROM daily),
         rec AS (
           SELECT typ, day, v, i,
                  v * 1000000 AS s, CAST(0 AS BIGINT) AS dev
           FROM ord WHERE i = 1
           UNION ALL
           SELECT o.typ, o.day, o.v, o.i,
                  300000 * o.v + (1000000 - 300000) * r.s // 1000000,
                  o.v * 1000000 - r.s
           FROM ord o JOIN rec r ON o.typ = r.typ AND o.i = r.i + 1),
         l AS (SELECT typ, day, v, dev,
                      lag(v) OVER (PARTITION BY typ ORDER BY day)
                        AS vprev
               FROM rec),
         a AS (SELECT typ AS event_type,
                      CAST(count(*) AS BIGINT) AS n_days,
                      CAST(sum(abs(dev)) // count(*) AS BIGINT)
                        AS mae_ewma_micro,
                      CAST(sum(abs(v - vprev) * 1000000) // count(*)
                        AS BIGINT) AS mae_naive_micro
               FROM l WHERE vprev IS NOT NULL GROUP BY 1)
         SELECT event_type, n_days, mae_ewma_micro, mae_naive_micro,
                mae_ewma_micro < mae_naive_micro AS ewma_wins
         FROM a ORDER BY event_type""",
    // Kaplan-Meier: risk set by suffix sum over the lifetimes
    // histogram, the survival product as the q209-style recursive
    // recurrence with per-step ppm truncation.
    "q233_kaplan_meier" -> """
         WITH RECURSIVE e AS (SELECT CAST(user_id AS VARCHAR) AS u,
                                     (ts::DATE - DATE '1970-01-01') AS d
                              FROM events
                              WHERE user_id IS NOT NULL
                                AND ts IS NOT NULL),
         mx AS (SELECT max(d) AS md FROM e),
         per AS (SELECT u, min(d) AS f, max(d) AS l FROM e GROUP BY 1),
         du AS (SELECT CAST(l - f AS BIGINT) AS t,
                       (l > md - 14) AS cen
                FROM per CROSS JOIN mx),
         h AS (SELECT t,
                      CAST(count(CASE WHEN NOT cen THEN 1 END)
                        AS BIGINT) AS d,
                      CAST(count(CASE WHEN cen THEN 1 END) AS BIGINT)
                        AS c
               FROM du GROUP BY 1),
         r AS (SELECT t, d, c,
                      CAST(sum(d + c) OVER (ORDER BY t DESC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                        AS n_at_risk
               FROM h),
         o AS (SELECT t, d, c, n_at_risk,
                      CAST(row_number() OVER (ORDER BY t) AS BIGINT)
                        AS i
               FROM r),
         s AS (SELECT i, t, d, c, n_at_risk,
                      CAST((1000000 * (CASE WHEN n_at_risk > 0
                             THEN (n_at_risk - d) * 1000000 // n_at_risk
                             ELSE 1000000 END)) // 1000000 AS BIGINT)
                        AS surv
               FROM o WHERE i = 1
               UNION ALL
               SELECT o.i, o.t, o.d, o.c, o.n_at_risk,
                      (s.surv * (CASE WHEN o.n_at_risk > 0
                         THEN (o.n_at_risk - o.d) * 1000000
                              // o.n_at_risk
                         ELSE 1000000 END)) // 1000000
               FROM o JOIN s ON o.i = s.i + 1)
         SELECT t AS offset_days, n_at_risk, d AS n_events,
                c AS n_censored, CAST(surv AS BIGINT) AS survival_ppm
         FROM s ORDER BY offset_days""",

    // Fixture stats: re-derive the K129 writer's hash-defined corpus
    // from nothing but range(n) — the vocab literal and every md5
    // tag below are generated from the SAME Scala constants the
    // writer uses (literal-driven both-sides).
    "q235_fixture_stats" -> s"""
         WITH ids AS (SELECT range AS doc_id FROM range(5000)),
         e AS (SELECT doc_id,
                      CASE WHEN doc_id % 625 = 624 THEN doc_id - 1
                           ELSE doc_id END AS eid
               FROM ids),
         b AS (SELECT doc_id, eid,
                      (('0x' || substr(md5('len:' || eid), 1, 15))::BIGINT
                        % 91) + 10 AS len,
                      ('0x' || substr(md5('lang:' || doc_id), 1, 15))::BIGINT
                        % 1000 AS lh,
                      'src' || (('0x' || substr(md5('src:' || doc_id), 1, 15))::BIGINT
                        % 20) AS source
               FROM e),
         d AS (SELECT doc_id, eid, len, source,
                      CASE WHEN lh < 412 THEN 'en' WHEN lh < 559 THEN 'de'
                           WHEN lh < 706 THEN 'es' WHEN lh < 853 THEN 'fr'
                           ELSE 'zh' END AS lang
               FROM b),
         wi AS (SELECT doc_id, eid, unnest(generate_series(1, len)) AS i
                FROM d),
         w AS (SELECT doc_id, i,
                      ($fixtureVocabSql)[
                        CAST((('0x' || substr(md5('w:' || eid || '_' || i),
                          1, 15))::BIGINT % 31) + 1 AS INT)] AS word
               FROM wi),
         txt AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text
                 FROM w GROUP BY doc_id),
         dj AS (SELECT d.lang, txt.text FROM d JOIN txt USING (doc_id)),
         dup AS (SELECT lang FROM dj
                 QUALIFY count(*) OVER (PARTITION BY text) >= 2),
         vl AS (SELECT range AS vec_id,
                       ('0x' || substr(md5('lbl:' || range), 1, 15))::BIGINT
                         % 10 AS label
                FROM range(2000))
         SELECT rel, key, CAST(n AS BIGINT) AS n FROM (
           SELECT 'lang' AS rel, lang AS key, count(*) AS n FROM d GROUP BY 2
           UNION ALL
           SELECT 'words', lang, sum(len) FROM d GROUP BY 2
           UNION ALL
           SELECT 'dup', lang, count(*) FROM dup GROUP BY 2
           UNION ALL
           SELECT 'src', source, count(*) FROM d GROUP BY 2
           UNION ALL
           SELECT 'len', CAST(len AS VARCHAR), count(*) FROM d GROUP BY 2
           UNION ALL
           SELECT 'label', CAST(label AS VARCHAR), count(*) FROM vl GROUP BY 2)
         ORDER BY rel, key""")

  /** The q235 vocab as a DuckDB list literal — generated from the SAME
    * Scala constant [[ScaleFixture.vocab]] the writer builds text from. */
  private lazy val fixtureVocabSql: String =
    ScaleFixture.vocab.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared q209/q212 oracle: the batch EWMA fold and its streaming
    * type-keyed replay must produce the SAME per-day rows — the
    * identical integer recurrence walked as a recursive CTE. */
  private val ewmaOracleSql: String = """
         WITH RECURSIVE daily AS (
           SELECT CAST(event_type AS VARCHAR) AS typ, ts::DATE AS day,
                  CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         ord AS (SELECT typ, day, v,
                        CAST(row_number() OVER (PARTITION BY typ
                          ORDER BY day) AS BIGINT) AS i
                 FROM daily),
         rec AS (
           SELECT typ, day, v, i,
                  v * 1000000 AS s, CAST(0 AS BIGINT) AS dev
           FROM ord WHERE i = 1
           UNION ALL
           SELECT o.typ, o.day, o.v, o.i,
                  300000 * o.v + (1000000 - 300000) * r.s // 1000000,
                  o.v * 1000000 - r.s
           FROM ord o JOIN rec r ON o.typ = r.typ AND o.i = r.i + 1)
         SELECT typ AS event_type, CAST(day AS VARCHAR) AS day, v,
                CAST(s AS BIGINT) AS ewma_micro,
                CAST(dev AS BIGINT) AS dev_micro
         FROM rec ORDER BY event_type, day"""

  /** Shared q174/q180 oracle: the batch gap histogram and its
    * streaming stateful replay must produce the SAME bucket rows. */
  private val eventGapsOracleSql: String =
    """WITH e AS (SELECT user_id AS u,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                         event_type AS typ
                  FROM events),
       g AS (SELECT sec - lag(sec) OVER (PARTITION BY u
               ORDER BY sec, typ) AS gap
             FROM e)
       SELECT CASE WHEN gap = 0 THEN 0
                   ELSE CAST(length(bin(gap)) AS BIGINT) END AS bucket,
              CAST(count(*) AS BIGINT) AS n_gaps,
              CAST(min(gap) AS BIGINT) AS min_gap_secs,
              CAST(max(gap) AS BIGINT) AS max_gap_secs
       FROM g WHERE gap IS NOT NULL
       GROUP BY 1 ORDER BY 1"""

  /** q176 oracle fragment: the power-iteration CTEs p0…p<iters>,
    * unrolled mechanically from the same iteration count the Spark
    * loop uses. Mirrors stationaryDistribution exactly: uniform start
    * with the remainder pinned to the smallest state, per-edge
    * `π·c div r` contributions, absorbing states hold their mass. */
  private def stationaryCtesSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""in$i AS (SELECT tr.tt AS typ,
                      CAST(sum(p.pi * tr.c // rs.r) AS BIGINT) AS v
               FROM $prev p JOIN tr ON p.typ = tr.ft
                    JOIN rs ON tr.ft = rs.ft
               GROUP BY 1),
         ab$i AS (SELECT p.typ, p.pi FROM $prev p
                  WHERE NOT EXISTS (SELECT 1 FROM rs WHERE rs.ft = p.typ)),
         p$i AS (SELECT st.typ,
                        CAST(coalesce(i.v, 0) + coalesce(a.pi, 0)
                          AS BIGINT) AS pi
                 FROM st LEFT JOIN in$i i ON st.typ = i.typ
                         LEFT JOIN ab$i a ON st.typ = a.typ)"""
    }.mkString(",\n         ")
    s"""WITH e AS (SELECT user_id AS u, ts, event_id AS eid,
                          event_type AS typ
                   FROM events),
         pr AS (SELECT typ AS ft, lead(typ) OVER (PARTITION BY u
                  ORDER BY ts, eid) AS tt FROM e),
         tr AS (SELECT ft, tt, CAST(count(*) AS BIGINT) AS c
                FROM pr WHERE tt IS NOT NULL GROUP BY 1, 2),
         rs AS (SELECT ft, CAST(sum(c) AS BIGINT) AS r FROM tr GROUP BY 1),
         st AS (SELECT DISTINCT typ FROM e),
         sm AS (SELECT CAST(count(*) AS BIGINT) AS s, min(typ) AS m FROM st),
         p0 AS (SELECT st.typ,
                       CAST(1000000 // s + CASE WHEN st.typ = m
                         THEN 1000000 - s * (1000000 // s)
                         ELSE 0 END AS BIGINT) AS pi
                FROM st CROSS JOIN sm),
         $iterCtes
         SELECT st.typ AS event_type,
                CAST(coalesce(rs.r, 0) AS BIGINT) AS n_out,
                p.pi AS pi_ppm
         FROM st LEFT JOIN rs ON st.typ = rs.ft
                 JOIN p$iters p ON st.typ = p.typ
         ORDER BY event_type"""
  }

  /** q138/q146 shared oracle fragment: the exact-integer Lloyd
    * iteration CTEs, unrolled mechanically from the same (k, iters)
    * the Spark calls use (the minHashCoeffsSql pattern: one set of
    * constants drives both sides). Mirrors kmeansFit exactly:
    * offset-micro quantization, bottom-k-by-md5 seeding, exact-integer
    * argmin with smaller-cell ties, `sum // n` centroid update with
    * empty-cell carry. Final trained centroids live in CTE
    * `c<iters>`. */
  private def kmeansCtesSql(k: Int, iters: Int, dims: Int,
      source: String = "embeddings"): String = {
    def iterCtes(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""d$i AS (SELECT q.id, c.cell,
                sum((q.qv[CAST(c.d + 1 AS INTEGER)] - c.c)
                    * (q.qv[CAST(c.d + 1 AS INTEGER)] - c.c)) AS d2
              FROM q CROSS JOIN $prev c GROUP BY q.id, c.cell),
         a$i AS (SELECT id, cell FROM (
                  SELECT id, cell,
                         row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rn
                  FROM d$i) WHERE rn = 1),
         s$i AS (SELECT a.cell, dd.d,
                        sum(q.qv[CAST(dd.d + 1 AS INTEGER)]) AS s, count(*) AS n
              FROM q JOIN a$i a USING (id)
              CROSS JOIN (SELECT CAST(unnest(range($dims)) AS BIGINT) AS d) dd
              GROUP BY a.cell, dd.d),
         c$i AS (SELECT p.cell, p.d, CAST(coalesce(s.s // s.n, p.c) AS BIGINT) AS c
              FROM $prev p LEFT JOIN s$i s ON p.cell = s.cell AND p.d = s.d)"""
    }
    s"""q AS (SELECT vec_id AS id,
              list_transform(range($dims), d ->
                CAST(round((embedding[CAST(d + 1 AS INTEGER)]::DOUBLE + 1.0) * 1e6) AS BIGINT)) AS qv
            FROM $source),
       sd AS (SELECT id, qv,
                row_number() OVER (ORDER BY
                  ('0x' || substr(md5('kmseed:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT,
                  id) - 1 AS cell
              FROM q),
       c0 AS (SELECT CAST(sd.cell AS BIGINT) AS cell, CAST(dd.d AS BIGINT) AS d,
                     qv[CAST(dd.d + 1 AS INTEGER)] AS c
              FROM sd CROSS JOIN (SELECT unnest(range($dims)) AS d) dd
              WHERE sd.cell < $k),
       ${(1 to iters).map(iterCtes).mkString(",\n       ")}"""
  }

  /** q138 oracle generator — kmeans CTEs + final assignment stats. */
  private def kmeansOracleSql(k: Int, iters: Int, dims: Int): String = {
    s"""WITH ${kmeansCtesSql(k, iters, dims)},
       dF AS (SELECT q.id, c.cell,
                sum((q.qv[CAST(c.d + 1 AS INTEGER)] - c.c)
                    * (q.qv[CAST(c.d + 1 AS INTEGER)] - c.c)) AS d2
              FROM q CROSS JOIN c$iters c GROUP BY q.id, c.cell),
       aF AS (SELECT id, cell, d2 FROM (
                SELECT id, cell, d2,
                       row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rn
                FROM dF) WHERE rn = 1),
       st AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
                     CAST(sum(d2) AS BIGINT) AS sum_d2
              FROM aF GROUP BY cell)
       SELECT c.cell, c.d, c.c,
              coalesce(st.n_vectors, 0) AS n_vectors,
              coalesce(st.sum_d2, 0) AS sum_d2
       FROM c$iters c LEFT JOIN st USING (cell)
       ORDER BY c.cell, c.d"""
  }
}
