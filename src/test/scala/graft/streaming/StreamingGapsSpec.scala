package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingFunnel.UserEvent

/** StreamingGaps: a late event SPLITS the gap it lands inside (the
  * property no per-key summary short of the event multiset can
  * answer), single-event users emit nothing, and the emitted gap
  * multiset matches the batch lag() pass. */
class StreamingGapsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(u: Long, t: String, typ: String = "e") = UserEvent(u, ts(t), typ)

  private def run(batches: Seq[Seq[UserEvent]]): Seq[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val name = s"gaps_${System.nanoTime()}"
    val q = StreamingGaps.gaps(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(ev(-1L, "2024-03-01 00:00:00", "tick"))
      q.processAllAvailable()
      input.addData(ev(-2L, "2024-03-09 00:00:00", "tick"))
      q.processAllAvailable()
      spark.table(name).filter($"user_id" >= 0)
        .as[(Long, Long)].collect().toSeq.sorted
    } finally q.stop()
  }

  test("a late event splits the gap it lands inside") {
    // 10:00 and 12:00 arrive first (one 7200 s gap); 11:00 arrives
    // late and must replace it with two 3600 s gaps
    val out = run(Seq(
      Seq(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 12:00:00")),
      Seq(ev(1, "2024-01-01 11:00:00"))))
    out shouldBe Seq((1L, 3600L), (1L, 3600L))
  }

  test("single-event users emit nothing; same-second ties yield a zero gap") {
    val out = run(Seq(Seq(
      ev(2, "2024-01-01 10:00:00"),
      ev(3, "2024-01-01 10:00:00", "a"),
      ev(3, "2024-01-01 10:00:00", "b"),
      ev(3, "2024-01-01 10:00:05", "c"))))
    out shouldBe Seq((3L, 0L), (3L, 5L))
  }

  test("multi-batch replay equals the batch lag() pass") {
    val events = Seq(
      ev(4, "2024-01-01 10:00:00"), ev(4, "2024-01-01 10:00:01"),
      ev(4, "2024-01-01 10:01:00"), ev(5, "2024-01-02 09:00:00"),
      ev(5, "2024-01-02 18:00:00"))
    val streamed = run(Seq(events.take(2), events.drop(2)))
    streamed shouldBe Seq((4L, 1L), (4L, 59L), (5L, 32400L))
  }
}
