package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Behavioral diversity and frequency response: hand-entropy users,
  * the single-type exact zero, strict-before tie rule, and caps. */
class DiversityAndFrequencySpec extends SparkSpec {
  import spark.implicits._

  test("single-type users score exactly zero entropy") {
    val rows = Seq.fill(7)(("u1", "a")) ++ Seq.fill(3)(("u2", "b"))
    val out = Analytics.behavioralDiversity(
        rows.toDF("user_id", "event_type"), "user_id", "event_type")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq((0L, 2L, 0L, 0L, 1L))
  }

  test("a uniform two-type user lands in the ln(2) bucket") {
    // H = ln 2 = 0.693147 -> micro 693147 -> bucket 2 (quarter-nats).
    val rows = Seq(("u1", "a"), ("u1", "b"))
    val out = Analytics.behavioralDiversity(
        rows.toDF("user_id", "event_type"), "user_id", "event_type")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    out.map(r => (r._1, r._3)) shouldBe Seq((2L, 693147L))
  }

  private def ev(u: String, t: String, s: String) =
    (u, Timestamp.valueOf(s), t)

  private def freq(rows: Seq[(String, Timestamp, String)]) =
    Analytics.frequencyResponse(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "view", "purchase", cap = 3)
      .orderBy("touch_bucket")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("touches count strictly before the first conversion") {
    val rows = Seq(
      ev("u1", "view", "2024-01-01 10:00:00"),
      ev("u1", "view", "2024-01-01 11:00:00"),
      ev("u1", "purchase", "2024-01-01 12:00:00"),
      ev("u1", "view", "2024-01-01 13:00:00"), // post-conversion: no
      ev("u2", "view", "2024-01-01 10:00:00")) // never converts
    freq(rows) shouldBe Seq(
      (1L, 1L, 0L, 0L),       // u2: one touch, no conversion
      (2L, 1L, 1L, 1000000L)) // u1: two pre-touches, converted
  }

  test("a same-timestamp touch does not count toward its conversion") {
    val rows = Seq(
      ev("u1", "view", "2024-01-01 12:00:00"),
      ev("u1", "purchase", "2024-01-01 12:00:00"))
    freq(rows) shouldBe Seq((0L, 1L, 1L, 1000000L))
  }

  test("the cap folds heavy touchers into one bucket") {
    val rows = (1 to 9).map(i =>
      ev("u1", "view", f"2024-01-01 0$i:00:00")) :+
      ev("u1", "purchase", "2024-01-01 10:00:00")
    freq(rows) shouldBe Seq((3L, 1L, 1L, 1000000L))
  }
}
