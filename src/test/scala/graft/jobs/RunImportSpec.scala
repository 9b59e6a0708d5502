package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.sources.CsvEventSource
import graft.util.TmpDirs

class RunImportSpec extends SparkSpec {
  import spark.implicits._

  test("make-import order end to end: all five pipelines over one landing root") {
    val root = TmpDirs.fresh("spec-runimport-landing")
    val wh = TmpDirs.fresh("spec-runimport-wh")
    CsvEventSource.writeLanding(spark,
      SparkEntry.activityStaging(spark, sfSmoke), s"$root/activity", "activity")
    CsvEventSource.writeLanding(spark,
      SparkEntry.flowStaging(spark, sfSmoke), s"$root/flow", "flow")
    CsvEventSource.writeLanding(spark,
      SparkEntry.emailStaging(spark, sfSmoke), s"$root/email", "email-events")
    Tables.events(spark, sfSmoke)
      .groupBy(to_date($"ts").cast("string").as("day"))
      .agg(countDistinct($"user_id").as("a"), count(lit(1)).as("v"))
      .collect().foreach { r =>
        CsvEventSource.appendLines(spark,
          s"$root/counts/fxa-basic-metrics-${r.getString(0)}.txt",
          Seq(s"${r.getString(0)},${r.getLong(1)},${r.getLong(2)}"))
      }
    val job = new RunImport(wh, root, countsBegin = LocalDate.parse("2024-01-01"))
    val result = job.run(spark)
    result("activity").size shouldBe 30
    result("flow").size shouldBe 30
    result("email").size shouldBe 30
    result("counts").size shouldBe 30
    // every output table exists and is populated
    job.activity.tableBySuffix("").read(spark).count() should be > 0L
    job.flow.metadataTable(job.tiers.find(_.suffix == "").get)
      .read(spark).count() should be > 0L
    job.counts.table.read(spark).count() shouldBe 30
    job.summaries.multiDeviceTable(job.tiers.find(_.suffix == "").get)
      .read(spark).count() should be > 0L
    // a second run with nothing new landed is a complete no-op
    val again = job.run(spark)
    again.values.foreach(_ shouldBe Seq.empty)
  }
}
