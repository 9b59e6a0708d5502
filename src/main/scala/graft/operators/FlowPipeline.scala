package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions._
import graft.model.{SampleTier, Schemas}
import graft.store.DayPartitionedTable

/** The flow sessionizer — SURVEY.md §3 entry point 2
  * (import_flow_events.py), the reference's hardest surface, re-expressed
  * as one lineage DAG per day instead of 12 mutating SQL statements.
  *
  * Statement-by-statement mapping (reference lines in
  * import_flow_events.py):
  *
  *  1/2. clear+insert day-d `flow_metadata` from staging `flow.begin`
  *       rows, sampled by flow_id cohort (`:104-149`) → dynamic
  *       partition overwrite of `export_date=d`.
  *  3.   DELETE `flow.begin` from permanent events (`:151-155`, D3) →
  *       the permanent write already excludes ALL control events
  *       (begin/continued/experiment) via the importer's insertFilter;
  *       the update windows below re-derive day-d's
  *       "begin-deleted-but-continued-still-present" intermediate state
  *       from the staging lineage, so ordering semantics are preserved
  *       without rewriting the partition three times.
  *  4.   UPDATE duration/locale/uid from `GROUP BY flow_id MAX(...)`
  *       over permanent days d ∪ d+1 (`:157-175`, C2 + I2 late-data).
  *  5/6. UPDATE completed / new_account flags from `flow.complete` /
  *       `account.created` in the window (`:177-205`, C3 semi-join).
  *  7.   metrics-context backfill — CASE-on-'' merge of 9 columns from
  *       the day's staging aggregate, only for days before the
  *       historical cutoff (`:207-240,344-352`, B8).
  *  8/9. UPDATE continued_from = SUBSTRING(type,16,64) from day-d
  *       `flow.continued.%` rows, then absorb them (`:242-261`, F3).
  * 10-12. clear+insert day-d `flow_experiments` from
  *       `flow.experiment.%` staging rows (SPLIT_PART name/cohort, F4),
  *       UPDATE uid from the window fold, absorb (`:263-304`).
  *
  * All update build sides are one-day aggregates — broadcast joins —
  * and metadata rewrites touch only the partitions that contain matched
  * flow_ids (collected driver-side from the joined frame).
  *
  * `updateHorizon` bounds the update scan to metadata partitions with
  * export_date ≥ day − horizon. Flows span at most 2 calendar days by
  * construction (one +1-day late-data lookback), so `Some(2)` — the
  * default — sees every metadata row a day-d processing can legitimately
  * touch while scanning O(1) partitions instead of the whole table (the
  * reference's unbounded `UPDATE ... FROM` scope is the classic
  * full-table-scan-per-day scale trap). `None` restores the
  * reference-faithful unbounded scope for parity experiments;
  * FlowPipelineSpec locks horizon-2 ≡ unbounded on a 30-day fixture.
  */
final class FlowPipeline(
    val warehouse: String,
    val tiers: Seq[SampleTier] = SampleTier.defaults,
    val historicalCutoff: LocalDate = LocalDate.parse("2016-10-25"),
    val maxError: Int = 100,
    val updateHorizon: Option[Int] = Some(2),
    val format: graft.sources.LandingFormat = graft.sources.LandingFormat.Csv) {

  /** Control events are absorbed into metadata/experiments (D3): the
    * permanent flow_events tables hold payload events only. */
  private val controlFilter: Column =
    !(col("type") === "flow.begin" ||
      col("type").like("flow.continued.%") || // B6
      col("type").like("flow.experiment.%"))

  val importer = new EventImporter(
    warehouse, Schemas.flow, tiers, maxError = maxError,
    insertFilter = Some(controlFilter), format = format)

  def metadataTable(tier: SampleTier): DayPartitionedTable =
    new DayPartitionedTable(warehouse, s"flow_metadata${tier.suffix}",
      dayCol = "export_date", sortCol = Some("begin_time"))

  def experimentsTable(tier: SampleTier): DayPartitionedTable =
    new DayPartitionedTable(warehouse, s"flow_experiments${tier.suffix}",
      dayCol = "export_date", sortCol = Some("timestamp"))

  private val metaContextCols = Seq(
    "ua_browser", "ua_version", "ua_os", "context", "entrypoint",
    "migration", "service", "utm_campaign", "utm_content", "utm_medium",
    "utm_source", "utm_term")

  /** The 9 columns the metrics-context backfill repairs (`:211-219`). */
  private val backfillCols = Seq(
    "context", "entrypoint", "migration", "service", "utm_campaign",
    "utm_content", "utm_medium", "utm_source", "utm_term")

  /** Q_INSERT_METADATA (`:109-149`): begin rows → metadata, sampled. */
  private def metadataInsert(typed: DataFrame, tier: SampleTier, day: LocalDate): DataFrame =
    typed
      .filter(col("cohort") < tier.percent)
      .filter(col("type") === "flow.begin") // B5
      .select(
        (col("flow_id") +:
          epochSecondsToTs(col("timestamp")).as("begin_time") +:
          lit(0L).as("duration") +:
          lit(false).as("completed") +:
          lit(false).as("new_account") +:
          metaContextCols.map(col)) :+
          lit(null).cast(StringType).as("locale") :+
          lit(null).cast(StringType).as("uid") :+
          lit(null).cast(StringType).as("continued_from") :+
          lit(day.toString).cast(DateType).as("export_date"): _*)

  /** Per-tier after-day cascade. `typed` is the day's typed staging. */
  private def afterDayTier(
      spark: SparkSession,
      tier: SampleTier,
      day: LocalDate,
      typed: DataFrame,
      maxDay: LocalDate): Unit = {
    val metaT = metadataTable(tier)
    val expT = experimentsTable(tier)

    // 1/2: clear+insert day-d metadata
    metaT.clearDay(spark, day)
    metaT.writeDays(metadataInsert(typed, tier, day))

    // The update window (I2): day d in its mid-cascade state — begin
    // rows deleted, continued/experiment still present — union the
    // already-absorbed day d+1 partition from disk.
    val dayState = importer
      .tierSlice(typed, tier, day, maxDay)
      .filter(col("type") =!= "flow.begin")
    val next = day.plusDays(1)
    val window =
      if (importer.table(tier).hasDay(spark, next))
        dayState.unionByName(
          importer.table(tier).read(spark)
            .filter(col("day") === lit(next.toString).cast("date")))
      else dayState
    val w = window.cache()

    // 4: fold — MAX(flow_time), MAX(locale), MAX(uid) per flow (E2; MAX
    // over VARCHAR = "any non-blank wins" since ''/NULL sort low).
    // localCheckpoint: the fold is read THREE times (the upd chain, the
    // experiments update's emptiness probe, its join) — one day-sized
    // materialization beats three aggregations of the window.
    val fold = w.groupBy("flow_id").agg(
      max("flow_time").as("upd_flow_time"),
      max("locale").as("upd_locale"),
      max("uid").as("upd_uid"))
      .withColumn("fold_m", lit(true))
      .localCheckpoint()
    // 5/6: completed / new_account flag sets (C3)
    val completedIds = w.filter(col("type") === "flow.complete")
      .select("flow_id").distinct().withColumn("completed_m", lit(true))
    val createdIds = w.filter(col("type") === "account.created")
      .select("flow_id").distinct().withColumn("created_m", lit(true))
    // 8: continued_from source rows — only day d still has them (F3/B6)
    val continued = w.filter(col("type").like("flow.continued.%"))
      .groupBy("flow_id").agg(max("type").as("cont_type"))
      .withColumn("cont_m", lit(true))
    // 7: metrics-context backfill build side — from STAGING (sampled,
    // no day filter), gated on the historical cutoff (`:344-352`)
    val mcx =
      if (day.isBefore(historicalCutoff))
        Some(typed.filter(col("cohort") < tier.percent)
          .groupBy("flow_id")
          .agg(max(backfillCols.head).as(s"mcx_${backfillCols.head}"),
            backfillCols.tail.map(c => max(c).as(s"mcx_$c")): _*)
          .withColumn("mcx_m", lit(true)))
      else None

    // one combined update frame, one metadata rewrite. localCheckpoint:
    // applyMetadataUpdates probes emptiness and then joins — without
    // the checkpoint each of those re-evaluates the 5-way full-outer
    // chain (measured: the q41 profile's isEmpty line was 47 s of the
    // 30-day cascade before this).
    val upd = Seq(Some(fold), Some(completedIds), Some(createdIds),
      Some(continued), mcx).flatten
      .reduce(_.join(_, Seq("flow_id"), "full_outer"))
      .localCheckpoint()
    applyMetadataUpdates(spark, metaT, upd, day)

    // 10/11: experiments clear+insert (SPLIT_PART name/cohort — F4)
    expT.clearDay(spark, day)
    expT.writeDays(
      typed
        .filter(col("cohort") < tier.percent)
        .filter(col("type").like("flow.experiment.%"))
        .select(
          splitPart(col("type"), ".", 3).as("experiment"),
          splitPart(col("type"), ".", 4).as("cohort"),
          epochSecondsToTs(col("timestamp")).as("timestamp"),
          col("flow_id"),
          col("uid"),
          lit(day.toString).cast(DateType).as("export_date")))
    // 12: experiments uid update from the window fold
    applyExperimentsUpdate(spark, expT, fold, day)
    w.unpersist(): Unit
  }

  private def horizonFilter(day: LocalDate): Column =
    updateHorizon match {
      case Some(h) =>
        col("export_date") >= lit(day.minusDays(h.toLong).toString).cast(DateType)
      case None => lit(true)
    }

  /** Join the combined update frame and rewrite ONLY the partitions
    * that contain matched flows. UPDATE-on-match semantics: a column is
    * overwritten only when its source subquery matched (left join +
    * per-column `when`), matching Redshift UPDATE ... FROM. */
  private def applyMetadataUpdates(
      spark: SparkSession,
      metaT: DayPartitionedTable,
      upd: DataFrame,
      day: LocalDate): Unit = {
    if (metaT.days(spark).isEmpty || upd.isEmpty) return
    val meta = metaT.read(spark).filter(horizonFilter(day))
    // No broadcast() hint: `upd` is one row per flow of one day —
    // bounded by day volume, but at 100 TB/day that is far past
    // broadcast range, and a literal hint overrides AQE's size check.
    // AQE broadcasts it while small, shuffle-joins when not.
    val u = upd.withColumnRenamed("flow_id", "u_flow_id")
    // localCheckpoint, not cache: writeDays below dynamically overwrites
    // the very partitions this frame reads. A cached plan keeps its full
    // lineage, so losing a block mid-write would recompute from the
    // half-overwritten table; checkpointing severs the lineage before
    // the first overwritten byte.
    val joined = meta.join(u, meta("flow_id") === u("u_flow_id"), "left")
      .localCheckpoint()
    def m(c: String): Column = coalesce(col(c), lit(false))
    val anyMatch = m("fold_m") || m("completed_m") || m("created_m") ||
      m("cont_m") || (if (joined.columns.contains("mcx_m")) m("mcx_m") else lit(false))
    val affected = joined.filter(anyMatch)
      .select(col("export_date").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (affected.nonEmpty) {
      val backfilled = backfillCols.foldLeft(joined) { (df, c) =>
        if (df.columns.contains(s"mcx_$c"))
          df.withColumn(c,
            when(m("mcx_m") && col(c) === "", emptyBackfill(col(c), col(s"mcx_$c")))
              .otherwise(col(c))) // B8: fill only blank fields
        else df
      }
      val updated = backfilled
        .withColumn("duration",
          when(m("fold_m"), col("upd_flow_time")).otherwise(col("duration")))
        .withColumn("locale",
          when(m("fold_m"), col("upd_locale")).otherwise(col("locale")))
        .withColumn("uid",
          when(m("fold_m"), col("upd_uid")).otherwise(col("uid")))
        .withColumn("completed", col("completed") || m("completed_m"))
        .withColumn("new_account", col("new_account") || m("created_m"))
        .withColumn("continued_from",
          when(m("cont_m"), continuedFrom(col("cont_type")))
            .otherwise(col("continued_from")))
      val outCols = meta.columns.toIndexedSeq.map(col)
      metaT.writeDays(
        updated
          .filter(col("export_date").cast("string").isin(affected: _*))
          .select(outCols: _*))
    }
  }

  /** Step 12 — Q_UPDATE_EXPERIMENTS (`:287-298`). */
  private def applyExperimentsUpdate(
      spark: SparkSession,
      expT: DayPartitionedTable,
      fold: DataFrame,
      day: LocalDate): Unit = {
    if (expT.days(spark).isEmpty || fold.isEmpty) return
    val exp = expT.read(spark).filter(horizonFilter(day))
    // un-hinted for the same per-day-volume reason as applyMetadataUpdates
    val u = fold
      .select(col("flow_id").as("u_flow_id"), col("upd_uid"), col("fold_m"))
    // localCheckpoint for the same read-then-overwrite reason as
    // applyMetadataUpdates
    val joined = exp.join(u, exp("flow_id") === u("u_flow_id"), "left")
      .localCheckpoint()
    val affected = joined.filter(coalesce(col("fold_m"), lit(false)))
      .select(col("export_date").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (affected.nonEmpty) {
      val updated = joined.withColumn("uid",
        when(coalesce(col("fold_m"), lit(false)), col("upd_uid"))
          .otherwise(col("uid")))
      val outCols = exp.columns.toIndexedSeq.map(col)
      expT.writeDays(
        updated
          .filter(col("export_date").cast("string").isin(affected: _*))
          .select(outCols: _*))
    }
  }

  /** Full run: generic import (with absorption-filtered inserts) + the
    * per-day cascade + metadata/experiments expiry (`:379-386`). */
  def run(
      spark: SparkSession,
      landingDir: String,
      prefix: String,
      dayFrom: Option[LocalDate] = None,
      dayUntil: Option[LocalDate] = None,
      forceReload: Boolean = false): Seq[LocalDate] = {
    val days = importer.run(spark, landingDir, prefix, dayFrom, dayUntil,
      forceReload,
      afterDay = (sp, day, staging, maxDay) => {
        val typed = importer.typedStaging(staging)
        // per-tier cascades touch disjoint metadata/experiments tables
        graft.util.Par.foreach(tiers)(t => afterDayTier(sp, t, day, typed, maxDay))
      })
    importer.maxExtantDay(spark).foreach { maxDay =>
      tiers.foreach { tier =>
        metadataTable(tier).expireBefore(spark, maxDay.minus(tier.retention))
        experimentsTable(tier).expireBefore(spark, maxDay.minus(tier.retention))
      }
    }
    days
  }
}
