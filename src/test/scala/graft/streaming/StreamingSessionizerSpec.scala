package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.store.DayPartitionedTable
import graft.util.TmpDirs
import StreamingSessionizer._

class StreamingSessionizerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val day1 = Seq(
    FlowEvent("f1", "flow.begin", ts("2024-01-01 10:00:00"), 0, "", ""),
    FlowEvent("f1", "flow.signin", ts("2024-01-01 10:05:00"), 100, "", ""),
    FlowEvent("f3", "flow.begin", ts("2024-01-01 11:00:00"), 0, "fr", "u3"),
    FlowEvent("f3", "account.created", ts("2024-01-01 11:01:00"), 20, "fr", "u3"),
    FlowEvent("f2", "flow.begin", ts("2024-01-01 12:00:00"), 0, "", ""))

  private val day2 = Seq(
    FlowEvent("f1", "flow.complete", ts("2024-01-02 09:00:00"), 5000, "en", "u1"))

  private def tick(t: String) =
    FlowEvent(s"tick-$t", "tick", ts(t), 0, "", "")

  test("I3 v2: watermarked flatMapGroupsWithState matches the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FlowEvent]
    val q = sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      input.addData(day1: _*)
      q.processAllAvailable()
      input.addData(day2: _*)
      q.processAllAvailable()
      // late-data window: nothing emitted yet (watermark below timeouts)
      spark.table("sessions").count() shouldBe 0
      // two heartbeat batches: first advances the watermark, second fires
      // the event-time timeouts it enabled
      input.addData(tick("2024-02-01 00:00:00"))
      q.processAllAvailable()
      input.addData(tick("2024-02-02 00:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .orderBy("flow_id")
        .as[FlowSession].collect().toSeq
      rows.map(_.flow_id) shouldBe Seq("f1", "f2", "f3")
      val f1 = rows.head
      f1.duration shouldBe 5000L // the d+1 complete folded in (I2)
      f1.completed shouldBe true
      f1.locale shouldBe "en"
      f1.uid shouldBe "u1"
      f1.begin_time shouldBe ts("2024-01-01 10:00:00")
      val f2 = rows(1)
      f2.duration shouldBe 0L
      f2.completed shouldBe false
      Option(f2.locale) shouldBe None // begin-only: defaults, like batch
      val f3 = rows(2)
      f3.new_account shouldBe true
      f3.duration shouldBe 20L
    } finally q.stop()
  }

  test("fileStream tails the engine's own day-partitioned table (AvailableNow)") {
    val root = TmpDirs.fresh("spec-stream-file")
    val t = new DayPartitionedTable(root, "flow_events", sortCol = Some("ts"))
    val df = (day1 ++ day2).toDF()
      .select(col("ts"), col("type"), col("flow_id"), col("flow_time"),
        col("locale"), col("uid"), to_date(col("ts")).as("day"))
    t.writeDays(df)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = fileStream(spark, t.path).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FlowEvent], _: Long) =>
        seen.addAndGet(batch.count()): Unit
      }
      .start()
    q.awaitTermination(60000) shouldBe true
    seen.get() shouldBe (day1.size + day2.size).toLong
  }
}
