package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import StreamingFunnel.UserEvent

/** Stream-stream interval-join attribution: in-order pairing, the
  * LATE touch arriving after its conversion was already processed,
  * the strict same-millisecond exclusion, the horizon bound, and the
  * watermark-driven outer null-row for untouched conversions. */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(u: Long, typ: String, t: String) = UserEvent(u, ts(t), typ)

  /** Replay batches through the join; push the watermark with ticks,
    * return (user, channel, touch ts string) pairs. */
  private def run(batches: Seq[Seq[UserEvent]]): Seq[(Long, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val name = s"attr_${System.nanoTime()}"
    val q = StreamingAttribution.touchPairs(input.toDS(),
        convType = "purchase", channels = Seq("signup", "view", "click"),
        horizonDays = 7)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // two ticks push the watermark past every fixture event (the
      // replayedStreamTable discipline) so outer null-rows drain
      input.addData(ev(-1L, "tick", "2024-06-01 00:00:00"))
      q.processAllAvailable()
      input.addData(ev(-2L, "tick", "2024-06-09 00:00:00"))
      q.processAllAvailable()
      spark.table(name)
        .filter(col("c_user") >= 0) // drop tick watermark carriers
        .select(col("c_user"), col("channel"))
        .as[(Long, Option[String])].collect().toSeq
        .map { case (u, c) => (u, c.getOrElse("none")) }.sorted
    } finally q.stop()
  }

  test("in-order touch attributes; same-ms touch does not") {
    val out = run(Seq(Seq(
      ev(1L, "view", "2024-01-02 10:00:00"),
      ev(1L, "purchase", "2024-01-02 11:00:00"),
      // u2: touch in the SAME millisecond as the conversion -> excluded
      ev(2L, "view", "2024-01-02 11:00:00"),
      ev(2L, "purchase", "2024-01-02 11:00:00"))))
    out shouldBe Seq((1L, "view"), (2L, "none"))
  }

  test("a LATE touch (arrives after the conversion batch) still pairs") {
    val out = run(Seq(
      Seq(ev(1L, "purchase", "2024-01-02 11:00:00")),
      // arrives one batch later but with earlier event time, inside
      // the 25h watermark: the join state must still match it
      Seq(ev(1L, "signup", "2024-01-02 10:00:00"))))
    out shouldBe Seq((1L, "signup"))
  }

  test("touch outside the horizon does not attribute") {
    val out = run(Seq(Seq(
      ev(1L, "click", "2024-01-01 10:00:00"),
      ev(1L, "purchase", "2024-01-20 10:00:00")))) // 19 days > 7d horizon
    out shouldBe Seq((1L, "none"))
  }

  test("multiple touches all pair; distillation picks the last") {
    val out = run(Seq(Seq(
      ev(1L, "signup", "2024-01-01 10:00:00"),
      ev(1L, "view", "2024-01-02 10:00:00"),
      ev(1L, "purchase", "2024-01-03 10:00:00"))))
    out shouldBe Seq((1L, "signup"), (1L, "view"))
  }
}
