package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StreamingFunnel.UserEvent

/** Streaming per-key counter: exact counts across batches, timeout
  * drain, and per-key state independence. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(typ: String, t: String) = UserEvent(1L, ts(t), typ)

  private def run(batches: Seq[Seq[UserEvent]]): Seq[(String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val name = s"hh_${System.nanoTime()}"
    val q = StreamingHeavyHitters.keyCounts(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(UserEvent(-1L, ts("2024-06-01 00:00:00"), "tick"))
      q.processAllAvailable()
      input.addData(UserEvent(-2L, ts("2024-06-09 00:00:00"), "tick"))
      q.processAllAvailable()
      spark.table(name).filter($"key" =!= "tick")
        .as[(String, Long)].collect().toSeq.sorted
    } finally q.stop()
  }

  test("counts accumulate across batches and drain once") {
    val out = run(Seq(
      Seq(ev("a", "2024-01-01 10:00:00"), ev("a", "2024-01-01 11:00:00"),
        ev("b", "2024-01-01 10:00:00")),
      Seq(ev("a", "2024-01-02 10:00:00"))))
    out shouldBe Seq(("a", 3L), ("b", 1L))
  }

  test("a key seen only once still drains") {
    val out = run(Seq(Seq(ev("solo", "2024-01-01 10:00:00"))))
    out shouldBe Seq(("solo", 1L))
  }
}
