package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * The `events` table stores `ts` as parquet INT64 TIMESTAMP(NANOS,false),
  * which Spark's parquet reader rejects by default (PARQUET_TYPE_ILLEGAL).
  * We flip `spark.sql.legacy.parquet.nanosAsLong` and convert the raw
  * nanosecond count to a microsecond TimestampType ourselves (integer
  * division, i.e. truncation toward zero — the same thing DuckDB does when
  * it narrows ns → µs), so both engines see identical timestamps.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one test table; `sfDir` is e.g. /root/testdata/sf0.01.
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (GraftSession sets it) — config is session-scoped, not set here. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")
}
