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

  private def runLinear(rows: Seq[(Long, Timestamp, String)]) =
    Analytics.linearAttribution(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "purchase", channels)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("linear: every conversion distributes exactly 10^6, remainder to the last touch") {
    val out = runLinear(Seq(
      // A: signup, view -> purchase: 500000 each
      (1L, ts("2024-01-01 10:00:01"), "signup"),
      (1L, ts("2024-01-01 10:00:02"), "view"),
      (1L, ts("2024-01-01 10:00:03"), "purchase"),
      // B: untouched purchase -> none gets the full 10^6
      (2L, ts("2024-01-01 10:00:01"), "purchase"),
      // C: click, click, view -> purchase: 1e6 div 3 = 333333;
      // click 666666, view 333333 + remainder 1 = 333334
      (3L, ts("2024-01-01 10:00:01"), "click"),
      (3L, ts("2024-01-01 10:00:02"), "click"),
      (3L, ts("2024-01-01 10:00:03"), "view"),
      (3L, ts("2024-01-01 10:00:04"), "purchase"),
      // D: same-millisecond view gets NO credit (strictly-earlier rule)
      (4L, ts("2024-01-01 10:00:05"), "view"),
      (4L, ts("2024-01-01 10:00:05"), "purchase")))
    // t = 4 conversions; shares are credit div 4
    out("signup") shouldBe ((1L, 1L, 500000L, 125000L))
    out("view") shouldBe ((2L, 2L, 833334L, 208333L))
    out("click") shouldBe ((1L, 2L, 666666L, 166666L))
    out("none") shouldBe ((2L, 0L, 2000000L, 500000L))
  }

  test("linear: per-conversion credit conservation on a designed remainder case") {
    // 7 touches: 1e6 div 7 = 142857, remainder 1e6 - 7*142857 = 1
    val touches = (1 to 7).map(i =>
      (9L, ts(f"2024-01-01 10:00:$i%02d"), if (i % 2 == 0) "view" else "click"))
    val out = runLinear(touches :+ ((9L, ts("2024-01-01 10:00:30"), "purchase")))
    // last touch is the 7th (click): clicks 4*142857 + 1, views 3*142857
    out("click")._3 shouldBe (4L * 142857L + 1L)
    out("view")._3 shouldBe (3L * 142857L)
    (out("click")._3 + out("view")._3) shouldBe 1000000L
  }
}
