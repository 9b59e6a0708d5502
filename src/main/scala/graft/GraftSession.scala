package graft

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured SparkSession.
  *
  * Session-level settings live here (not inside table loaders — config
  * mutation in a loader is a side effect on shared state). Defaults match
  * the target execution model: AQE on (runtime re-plan + skew-join
  * handling), dynamic partition overwrite (the D1 clear-day-then-insert
  * protocol from SURVEY.md §2), zstd parquet (the reference's ENCODE zstd,
  * import_flow_events.py:10-26), UTC timestamps, and shuffle parallelism
  * sized to the local core count rather than the 200 default.
  */
object GraftSession {

  def builder(appName: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // FAIR keeps concurrent jobs (Verify's query pool) round-robin
      // instead of head-of-line; a strictly sequential caller (Bench)
      // sees identical scheduling either way. The DEFAULT pool's
      // internal mode is FIFO unless an allocation file says otherwise
      // — src/main/resources/fairscheduler.xml (the classpath fallback
      // FairSchedulableBuilder documents) sets it to FAIR.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")

  /** Session for Verify/Bench mains: core count from SPARK_GRAFT_CPUS,
    * defaulting to every core the box has — a harness that forgets to
    * export the override must never silently run the gate at local[4]
    * on a 32-core machine. */
  def forMain(appName: String): SparkSession = {
    val cores = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = builder(appName, cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    spark
  }
}
