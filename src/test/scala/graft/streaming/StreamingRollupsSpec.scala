package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class Ev(ts: Timestamp, user_id: Long, event_type: String)

class StreamingRollupsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup: in-watermark duplicates suppressed, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingRollups.dedupStream(input.toDS().toDF(), "user_id")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(
        Ev(ts("2024-01-01 10:00:00"), 1, "view"),
        Ev(ts("2024-01-01 10:05:00"), 1, "view"), // same-batch duplicate
        Ev(ts("2024-01-01 11:00:00"), 2, "view"))
      q.processAllAvailable()
      input.addData(Ev(ts("2024-01-01 12:00:00"), 1, "click")) // cross-batch dup
      q.processAllAvailable()
      val users = spark.table("dedup").select($"user_id").as[Long].collect().toSeq
      users.sorted shouldBe Seq(1L, 2L)
    } finally q.stop()
  }

  test("streaming dedup equals batch dropDuplicates across multi-batch replay") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic fixture: 120 events over 3 microbatches, user_id
    // repeats every 17 events, all inside the 25h watermark window
    val all = (0 until 120).map { i =>
      Ev(ts(f"2024-01-01 ${6 + i / 20}%02d:${i % 60}%02d:00"), (i % 17).toLong, "view")
    }
    val input = MemoryStream[Ev]
    val q = StreamingRollups.dedupStream(input.toDS().toDF(), "user_id")
      .writeStream.format("memory").queryName("dedup_eq").outputMode("append").start()
    try {
      all.grouped(40).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("dedup_eq")
        .select($"user_id").as[Long].collect().toSeq.sorted
      val batch = all.toDF().dropDuplicates("user_id")
        .select($"user_id").as[Long].collect().toSeq.sorted
      streamed shouldBe batch
      streamed.length shouldBe 17
    } finally q.stop()
  }

  test("windowed DAU: 1-day tumbling windows close after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingRollups.dailyActiveUsers(input.toDS().toDF())
      .writeStream.format("memory").queryName("dau").outputMode("append").start()
    try {
      input.addData(
        Ev(ts("2024-01-01 10:00:00"), 1, "view"),
        Ev(ts("2024-01-01 11:00:00"), 2, "view"),
        Ev(ts("2024-01-01 12:00:00"), 1, "click"),
        Ev(ts("2024-01-02 09:00:00"), 3, "view"))
      q.processAllAvailable()
      // append mode: no window emitted until the watermark passes its end
      spark.table("dau").count() shouldBe 0
      // a late-but-in-window event folds into day 1 (the d+1 analog)
      input.addData(Ev(ts("2024-01-02 01:00:00"), 4, "view"))
      q.processAllAvailable()
      input.addData(Ev(ts("2024-01-10 00:00:00"), 9, "tick"))
      q.processAllAvailable()
      input.addData(Ev(ts("2024-01-11 00:00:00"), 9, "tick"))
      q.processAllAvailable()
      val rows = spark.table("dau").orderBy("day")
        .select($"day".cast("string"), $"dau_approx", $"n_events")
        .as[(String, Long, Long)].collect().toSeq
      rows.map(_._1).take(2) shouldBe Seq("2024-01-01", "2024-01-02")
      val day1 = rows.head
      day1._3 shouldBe 3L // events on day 1
      day1._2 shouldBe 2L // HLL exact at tiny cardinality: users 1,2
      val day2 = rows(1)
      day2._3 shouldBe 2L // the on-time + the late event
    } finally q.stop()
  }
}
