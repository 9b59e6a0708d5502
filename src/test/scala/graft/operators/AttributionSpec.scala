package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** lastTouchAttribution: hand-checked credit assignment, the
  * strictly-earlier rule (a same-millisecond touch gets NO credit),
  * the tie rule at equal touch timestamps, and 'none' for untouched
  * conversions. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val channels = Seq("signup", "view", "click")

  private def run(rows: Seq[(Long, Timestamp, String)]) =
    Analytics.lastTouchAttribution(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "purchase", channels)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("the most recent strictly-earlier touch gets the credit") {
    val out = run(Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"), // -> view
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "purchase"), // -> click
      (3L, ts("2024-01-01 08:00:00"), "purchase"))) // -> none
    out("view") shouldBe ((1L, 333333L))
    out("click") shouldBe ((1L, 333333L))
    out("none") shouldBe ((1L, 333333L))
  }

  test("a touch at the SAME millisecond as the conversion gets no credit") {
    val out = run(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"), // same ms as purchase
      (1L, ts("2024-01-01 10:00:00"), "purchase")))
    out.keySet shouldBe Set("none")
  }

  test("equal-timestamp touches tie to the lexicographically larger channel") {
    val out = run(Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase")))
    out.keySet shouldBe Set("signup") // 'signup' > 'click'
  }
}
