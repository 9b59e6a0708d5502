package graft.operators

import java.time.{LocalDate, Period}

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.model.{SampleTier, Schemas}
import graft.sources.CsvEventSource
import graft.util.TmpDirs

class SummariesAndCountsSpec extends SparkSpec {
  import spark.implicits._

  private val oneTier = Seq(SampleTier(100, Period.ofDays(60), ""))

  test("C1/I5: incremental summarize equals one-shot summarize") {
    val staged = SparkEntry.activityStaging(spark, sfSmoke)
    // one-shot
    val l1 = TmpDirs.fresh("spec-sum-oneshot-l")
    CsvEventSource.writeLanding(spark, staged, l1, "activity")
    val imp1 = new EventImporter(TmpDirs.fresh("spec-sum-oneshot-wh"),
      Schemas.activity, oneTier)
    imp1.run(spark, l1, "activity")
    val s1 = new DailySummaries(TmpDirs.fresh("spec-sum-oneshot-s"), imp1, oneTier)
    s1.summarize(spark)
    // incremental: 10 days, then the rest
    val l2 = TmpDirs.fresh("spec-sum-incr-l")
    val imp2 = new EventImporter(TmpDirs.fresh("spec-sum-incr-wh"),
      Schemas.activity, oneTier)
    val s2 = new DailySummaries(TmpDirs.fresh("spec-sum-incr-s"), imp2, oneTier)
    val split = lit("2024-01-10").cast("date")
    CsvEventSource.writeLanding(spark, staged.filter(col("day") <= split), l2, "activity")
    imp2.run(spark, l2, "activity")
    s2.summarize(spark)
    CsvEventSource.writeLanding(spark, staged.filter(col("day") > split), l2, "activity")
    imp2.run(spark, l2, "activity")
    s2.summarize(spark)
    val a = s1.multiDeviceTable(oneTier.head).read(spark)
      .orderBy("day", "uid", "device_now", "device_prev").collect()
    val b = s2.multiDeviceTable(oneTier.head).read(spark)
      .orderBy("day", "uid", "device_now", "device_prev").collect()
    b shouldBe a
    a.length should be > 0
  }

  test("empty source raises (the reference's 'no events in db', :146)") {
    val imp = new EventImporter(TmpDirs.fresh("spec-sum-empty-wh"),
      Schemas.activity, oneTier)
    val sums = new DailySummaries(TmpDirs.fresh("spec-sum-empty-s"), imp, oneTier)
    an[IllegalStateException] should be thrownBy sums.summarize(spark)
  }

  test("counts: COUNTS_BEGIN floor, CHAR(10) day cast, MAXERROR, idempotent rebuild") {
    val landing = TmpDirs.fresh("spec-counts-l")
    CsvEventSource.appendLines(spark, s"$landing/fxa-basic-metrics-2024-01-05.txt",
      Seq("2024-01-05,10,7"))
    CsvEventSource.appendLines(spark, s"$landing/fxa-basic-metrics-2024-01-15.txt",
      Seq("2024-01-15,20,17", "garbage,x", "2024-01-15,bad,1"))
    val imp = new CountsImporter(TmpDirs.fresh("spec-counts-wh"),
      countsBegin = LocalDate.parse("2024-01-10"))
    imp.run(spark, landing, "fxa-basic-metrics") shouldBe Seq(LocalDate.parse("2024-01-15"))
    val rows = imp.table.read(spark)
      .select($"day".cast("string"), $"accounts", $"verified_accounts")
      .as[(String, Long, Long)].collect().toSeq
    rows shouldBe Seq(("2024-01-15", 20L, 17L)) // floor dropped 01-05; junk dropped
    // idempotency: second run is a no-op, force reload is a fixed point
    imp.run(spark, landing, "fxa-basic-metrics") shouldBe Seq.empty
    imp.run(spark, landing, "fxa-basic-metrics", forceReload = true)
      .size shouldBe 1
    imp.table.read(spark).count() shouldBe 1
    // MAXERROR: more garbage than allowed aborts
    val bad = (1 to 12).map(i => s"2024-01-16,x$i,1")
    CsvEventSource.appendLines(spark, s"$landing/fxa-basic-metrics-2024-01-16.txt", bad)
    an[CsvEventSource.MaxErrorExceeded] should be thrownBy
      imp.run(spark, landing, "fxa-basic-metrics")
  }
}
