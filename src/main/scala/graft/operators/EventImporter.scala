package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.model.{EventFamily, SampleTier}
import graft.sources.{CsvEventSource, LandingFormat}
import graft.store.DayPartitionedTable

/** The generic per-day event importer — SURVEY.md §3 entry point 1
  * (import_events.py:147-258), Spark-first.
  *
  * Per day file: type the staging frame (F1 epoch→timestamp), derive the
  * deterministic hex-prefix cohort (F2) from the family's id column, and
  * for each sample tier write the `cohort < percent` (B4) slice of rows
  * whose timestamp falls on the target day (B2 — cross-day rows in the
  * file are dropped) and inside the retention window (B3,
  * import_events.py:107-127). The write is a dynamic partition
  * overwrite, so re-importing a day is the reference's
  * clear-day-then-insert (D1/I5) — an idempotent rebuild.
  *
  * Day discovery (A2/C4), the `_sampled_10` populated-day probe (B9 —
  * longest retention, import_events.py:72-78), newest-first ordering
  * (G3), the `max(extant, newest)` high-water mark with the empty-list
  * crash fixed (import_events.py:245-253 — `unpopulated_days[0]` raises
  * on empty; here an empty landing dir is a no-op), and retention expiry
  * (D2, import_events.py:226-236) all live in [[run]].
  *
  * Scale shape: each tier insert is a narrow filter+project over the
  * day's staging (persisted once, scanned once per tier), the write
  * shuffles only that day's rows, and all predicates are
  * codegen-friendly column expressions — no UDFs, no driver loops over
  * data (the per-day loop is over *files*, as in the reference).
  */
final class EventImporter(
    val warehouse: String,
    val family: EventFamily,
    val tiers: Seq[SampleTier] = SampleTier.defaults,
    val policy: CsvEventSource.FieldCountPolicy = CsvEventSource.Strict,
    val maxError: Int = 100,
    val filesPerDay: Int = 1,
    val insertFilter: Option[org.apache.spark.sql.Column] = None,
    val format: LandingFormat = LandingFormat.Csv) {

  def table(tier: SampleTier): DayPartitionedTable =
    new DayPartitionedTable(warehouse, family.tableName(tier.suffix),
      sortCol = Some("ts"), filesPerDay = filesPerDay)

  def tableBySuffix(suffix: String): DayPartitionedTable =
    table(tiers.find(_.suffix == suffix).get)

  /** B9 — is this day already imported? The reference probes only the
    * longest-retention table (import_events.py:77), which re-imports a
    * day forever when its 10% sample happens to be empty; since all
    * tiers are written by the same importDay, ANY tier's partition
    * proves the day was processed. Ordered longest-retention-first so
    * the common case is still a single metadata probe. */
  private def isDayPopulated(spark: SparkSession, day: LocalDate): Boolean =
    tiers.sortBy(t => -(t.retention.toTotalMonths * 31 + t.retention.getDays))
      .exists(t => table(t).hasDay(spark, day))

  /** E1/I4 — high-water mark from the 100% table (Q_GET_MAX_DAY reads
    * suffix "", import_events.py:67-70); partition metadata, no scan. */
  def maxExtantDay(spark: SparkSession): Option[LocalDate] =
    tableBySuffix("").maxDay(spark)

  /** F1/F2/F5 typing of a staging frame (shared with pipeline hooks so
    * derived views use the exact same lineage as the inserts). */
  def typedStaging(staging: DataFrame): DataFrame =
    staging
      .withColumn("ts", epochSecondsToTs(col("timestamp"))) // F1
      .withColumn("cohort", hexPrefixCohort(col(family.idColumn))) // F2
      .withColumn("day", dayOf(col("ts"))) // F5

  /** The rows of `typed` that belong in `tier`'s permanent table for
    * `day` — sampling (B4), same-day (B2), retention (B3) — BEFORE the
    * optional insertFilter. Projected to the permanent layout. */
  def tierSlice(
      typed: DataFrame,
      tier: SampleTier,
      day: LocalDate,
      maxDay: LocalDate): DataFrame = {
    val cutoff = maxDay.minus(tier.retention)
    typed
      .filter(col("cohort") < tier.percent) // B4
      .filter(col("day") === lit(day.toString).cast("date")) // B2
      .filter(col("day") >= lit(cutoff.toString).cast("date")) // B3
      .select((col("ts") +: col("day") +: family.permColumns.map(col)): _*)
  }

  /** Import one day's staging frame into all tiers. */
  def importDay(
      spark: SparkSession,
      day: LocalDate,
      staging: DataFrame,
      maxDay: LocalDate): Unit = {
    val typed = typedStaging(staging)
    // tiers write to disjoint tables — run them concurrently so the
    // Spark scheduler fills executor slots a serial loop leaves idle
    graft.util.Par.foreach(tiers) { tier =>
      val slice = tierSlice(typed, tier, day, maxDay)
      val ins = insertFilter.fold(slice)(slice.filter)
      val t = table(tier)
      t.clearDay(spark, day) // D1 clear half: a zero-row rebuild must clear
      t.writeDays(ins) // D1 insert half
    }
  }

  /** D2 — expire each tier past its retention horizon. */
  def expire(spark: SparkSession, maxDay: LocalDate): Unit =
    tiers.foreach { tier =>
      table(tier).expireBefore(spark, maxDay.minus(tier.retention))
    }

  /** Full import run over a landing dir (import_events.py:242-258).
    * Returns the days imported (newest first). */
  def run(
      spark: SparkSession,
      landingDir: String,
      prefix: String,
      dayFrom: Option[LocalDate] = None,
      dayUntil: Option[LocalDate] = None,
      forceReload: Boolean = false,
      afterDay: (SparkSession, LocalDate, DataFrame, LocalDate) => Unit =
        (_, _, _, _) => ())
      : Seq[LocalDate] = {
    val extant = maxExtantDay(spark)
    val from = dayFrom.orElse(extant)
    def candidate(d: LocalDate): Boolean =
      from.forall(f => !d.isBefore(f)) && dayUntil.forall(u => !d.isAfter(u))
    val unpopulated = format
      .listDays(spark, landingDir, prefix)
      .filter { case (d, _) =>
        candidate(d) && (forceReload || !isDayPopulated(spark, d))
      }
      .sortBy(_._1)(Ordering[LocalDate].reverse) // G3 newest-first
    if (unpopulated.isEmpty && extant.isEmpty) return Seq.empty // empty-safe
    val maxDay = (extant.toSeq ++ unpopulated.headOption.map(_._1)).max
    unpopulated.foreach { case (day, file) =>
      val staging = format.readDay(
        spark, file, family, policy, maxError)
      // Staging sanity probe (import_events.py:129-131,188-192): the
      // reference prints the staged MIN/MAX timestamps per day before
      // loading — the operator guardrail against a mis-dated or
      // mis-clocked file. One agg job over the already-persisted frame.
      val mm = staging.agg(min(col("timestamp")), max(col("timestamp"))).head()
      println(s"[graft-import] $prefix $day staged ${mm.get(0)}..${mm.get(1)} (epoch s)")
      importDay(spark, day, staging, maxDay)
      afterDay(spark, day, staging, maxDay)
      staging.unpersist()
    }
    expire(spark, maxDay)
    unpopulated.map(_._1)
  }
}
