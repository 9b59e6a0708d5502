package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Analytics
import StreamingFunnel.UserEvent

/** Streaming EWMA: late-day re-basing, per-type independence, and
  * replay-equals-batch on a mixed fixture. */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(typ: String, t: String) = UserEvent(1L, ts(t), typ)

  private def run(batches: Seq[Seq[UserEvent]])
      : Seq[(String, String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val name = s"ewma_${System.nanoTime()}"
    val q = StreamingEwma.ewma(input.toDS(), alphaPpm = 500000L)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(UserEvent(-1L, ts("2024-06-01 00:00:00"), "tick"))
      q.processAllAvailable()
      input.addData(UserEvent(-2L, ts("2024-06-09 00:00:00"), "tick"))
      q.processAllAvailable()
      spark.table(name).filter($"event_type" =!= "tick")
        .as[(String, String, Long, Long, Long)].collect().toSeq.sorted
    } finally q.stop()
  }

  test("a late event on a past day re-bases the whole tail") {
    // day1: 4, day2: 2 arrive; then one MORE day1 event arrives late
    // -> the fold must see (5, 2): s1 = 5e6, s2 = 1e6 + 2.5e6 = 3.5e6,
    // dev2 = 2e6 - 5e6 = -3e6.
    val out = run(Seq(
      Seq(ev("a", "2024-01-01 10:00:00"), ev("a", "2024-01-01 11:00:00"),
        ev("a", "2024-01-01 12:00:00"), ev("a", "2024-01-01 13:00:00"),
        ev("a", "2024-01-02 10:00:00"), ev("a", "2024-01-02 11:00:00")),
      Seq(ev("a", "2024-01-01 14:00:00"))))
    out shouldBe Seq(
      ("a", "2024-01-01", 5L, 5000000L, 0L),
      ("a", "2024-01-02", 2L, 3500000L, -3000000L))
  }

  test("types hold independent state") {
    val out = run(Seq(Seq(
      ev("a", "2024-01-01 10:00:00"), ev("a", "2024-01-02 10:00:00"),
      ev("b", "2024-01-01 10:00:00"), ev("b", "2024-01-01 11:00:00"))))
    out shouldBe Seq(
      ("a", "2024-01-01", 1L, 1000000L, 0L),
      ("a", "2024-01-02", 1L, 1000000L, 0L),
      ("b", "2024-01-01", 2L, 2000000L, 0L))
  }

  test("replay equals the batch operator on a mixed fixture") {
    val events = (1 to 17).map { i =>
      ev(if (i % 3 == 0) "x" else "y", f"2024-01-${i % 5 + 1}%02d 0${i % 9}:00:00")
    }
    val streamed = run(Seq(events)).map(t => (t._1, t._2, t._3, t._4, t._5))
    val batch = Analytics.ewmaBaseline(
        events.toDF("user_id", "ts", "event_type"),
        "event_type", "ts", alphaPpm = 500000L)
      .orderBy(col("event_type"), col("day"))
      .as[(String, String, Long, Long, Long)].collect().toSeq
    streamed shouldBe batch
  }
}
