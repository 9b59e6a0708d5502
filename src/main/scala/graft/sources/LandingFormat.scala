package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.EventFamily

/** Landing WIRE FORMAT — which on-disk day-file encoding a pipeline
  * ingests. Both formats produce the same typed staging frame and the
  * same ingest contract (MAXERROR gate, TRUNCATECOLUMNS, the ''-vs-null
  * policy), so everything downstream of `readDay` — tier sampling, the
  * flow cascade, summaries, compaction — is format-blind; only day-file
  * discovery (extension) and the parse lineage differ.
  *
  * The reference is CSV-only (import_events.py:84-97 COPY ... CSV);
  * JSON-lines is this engine's second wire format, held to the same
  * semantics (see [[JsonEventSource]] for the A6/A7 differences that a
  * self-describing format makes deliberate non-ops).
  */
sealed trait LandingFormat {
  def listDays(
      spark: SparkSession, dir: String, prefix: String): Seq[(LocalDate, String)]
  def readDay(
      spark: SparkSession,
      file: String,
      family: EventFamily,
      policy: CsvEventSource.FieldCountPolicy,
      maxError: Int): DataFrame
}

object LandingFormat {

  /** A1 CSV: blocklist sanitizer (A6) + field-count policy (A7) apply. */
  case object Csv extends LandingFormat {
    override def listDays(
        spark: SparkSession, dir: String, prefix: String): Seq[(LocalDate, String)] =
      CsvEventSource.listDays(spark, dir, prefix)
    override def readDay(
        spark: SparkSession, file: String, family: EventFamily,
        policy: CsvEventSource.FieldCountPolicy, maxError: Int): DataFrame =
      CsvEventSource.readDay(spark, file, family, policy, maxError)
  }

  /** JSON-lines: self-describing, so the CSV-era field-count policy is
    * accepted-and-ignored (extra keys drop, missing keys land as '' —
    * the policy argument has no meaningful analog). */
  case object Json extends LandingFormat {
    override def listDays(
        spark: SparkSession, dir: String, prefix: String): Seq[(LocalDate, String)] =
      JsonEventSource.listDays(spark, dir, prefix)
    override def readDay(
        spark: SparkSession, file: String, family: EventFamily,
        policy: CsvEventSource.FieldCountPolicy, maxError: Int): DataFrame =
      JsonEventSource.readDay(spark, file, family, maxError)
  }

  /** Parse a CLI/config name. */
  def apply(name: String): LandingFormat = name.toLowerCase match {
    case "csv" => Csv
    case "json" => Json
    case other => throw new IllegalArgumentException(
      s"unknown landing format '$other' (expected csv or json)")
  }
}
