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

  test("horizon CONTRACT: a beyond-horizon touch is where stream and batch disagree, by design") {
    // The batch operator's attribution window is UNBOUNDED PRECEDING;
    // the stream join must bound it to expire state (the stated q238
    // envelope: corpus span inside the horizon => equality). This
    // fixture plants the one case OUTSIDE the envelope — a touch 19
    // days before the conversion under a 7-day horizon — and pins the
    // documented disagreement: batch attributes, stream does not.
    val fixture = Seq(
      ev(1L, "click", "2024-01-01 10:00:00"),
      ev(1L, "purchase", "2024-01-20 10:00:00"))
    // stream at horizonDays = 7 -> none (asserted above, re-used here)
    run(Seq(fixture)) shouldBe Seq((1L, "none"))
    // batch, unbounded -> the click attributes
    val batch = graft.operators.Analytics.lastTouchAttribution(
        fixture.toDF(), "user_id", "ts", "event_type",
        conversionType = "purchase",
        channelTypes = Seq("signup", "view", "click"))
      .select(col("channel")).as[String].collect().toSeq
    batch shouldBe Seq("click")
    // and INSIDE the envelope (span < horizon) the two agree — the
    // q238 gate's operating point
    val inside = Seq(
      ev(1L, "click", "2024-01-14 10:00:00"),
      ev(1L, "purchase", "2024-01-20 10:00:00"))
    run(Seq(inside)) shouldBe Seq((1L, "click"))
    graft.operators.Analytics.lastTouchAttribution(
        inside.toDF(), "user_id", "ts", "event_type",
        conversionType = "purchase",
        channelTypes = Seq("signup", "view", "click"))
      .select(col("channel")).as[String].collect().toSeq shouldBe Seq("click")
  }
}
