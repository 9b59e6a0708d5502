package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.CsvEventSource
import graft.store.DayPartitionedTable

/** The account-counts import — import_counts.py, the simplest pipeline:
  * pre-aggregated (day, accounts, verified_accounts) rows, no sampling.
  *
  *  - day files `{prefix}-YYYY-MM-DD.txt` (`import_counts.py:212`),
  *    filtered by the hard floor COUNTS_BEGIN (`:214,275`).
  *  - staging types day as CHAR(10) then casts on insert (`:233,255` —
  *    F6); bad rows count against MAXERROR 10 (`:249`).
  *  - clear-day-then-insert idempotency + force_reload (`:265,287-291`).
  */
final class CountsImporter(
    val warehouse: String,
    val countsBegin: LocalDate,
    val maxError: Int = 10) {

  val table = new DayPartitionedTable(warehouse, "counts", sortCol = Some("accounts"))

  def run(
      spark: SparkSession,
      landingDir: String,
      prefix: String,
      forceReload: Boolean = false): Seq[LocalDate] = {
    val days = CsvEventSource.listDays(spark, landingDir, prefix, ext = ".txt")
      .filter { case (d, _) => !d.isBefore(countsBegin) } // COUNTS_BEGIN floor
      .filter { case (d, _) => forceReload || !table.hasDay(spark, d) }
      .sortBy(_._1)(Ordering[LocalDate].reverse)
    days.foreach { case (day, file) =>
      val fields = split(col("value"), ",", -1)
      def tryLong(c: org.apache.spark.sql.Column) =
        when(c.rlike("^-?[0-9]+$"), c.cast(LongType))
      val parsed = spark.read.text(file).select(
        substring(element_at(fields, 1), 1, 10).as("day_str"), // CHAR(10)
        tryLong(element_at(fields, 2)).as("accounts"),
        tryLong(element_at(fields, 3)).as("verified_accounts"),
        (size(fields) =!= 3).as("bad_arity"))
      val flagged = parsed.withColumn("_error",
        col("bad_arity") || col("accounts").isNull ||
          col("verified_accounts").isNull ||
          !col("day_str").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"))
      val errors = flagged.filter(col("_error")).count()
      if (errors > maxError)
        throw new CsvEventSource.MaxErrorExceeded(errors, maxError)
      val typed = flagged.filter(!col("_error"))
        .select(col("day_str").cast("date").as("day"), // F6 day::DATE
          col("accounts"), col("verified_accounts"))
        // B2 analog: a stray line whose embedded date differs from the
        // file's day must not overwrite ANOTHER day's partition (the
        // dynamic overwrite would otherwise clobber it with one row)
        .filter(col("day") === lit(day.toString).cast("date"))
      table.clearDay(spark, day)
      table.writeDays(typed)
    }
    days.map(_._1)
  }
}
