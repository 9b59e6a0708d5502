package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Next-event accuracy: hand argmax, tie rule, the overall row, and
  * last-event exclusion. */
class NextEventAccuracySpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, u: Long, t: String, s: String) =
    (id, u, Timestamp.valueOf(s), t)

  private def run(rows: Seq[(Long, Long, Timestamp, String)]) =
    Analytics.nextEventAccuracy(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type")
      .as[(String, Option[String], Long, Long, Long)].collect().toSeq

  test("hand case: majority successor wins, accuracy exact") {
    // a -> b, a -> b, a -> c: predict b; 2 of 3 correct.
    val rows = Seq(
      ev(1, 1, "a", "2024-01-01 10:00:00"),
      ev(2, 1, "b", "2024-01-01 11:00:00"),
      ev(3, 1, "a", "2024-01-01 12:00:00"),
      ev(4, 1, "b", "2024-01-01 13:00:00"),
      ev(5, 1, "a", "2024-01-01 14:00:00"),
      ev(6, 1, "c", "2024-01-01 15:00:00"))
    val a = run(rows).find(_._1 == "a").get
    (a._2, a._3, a._4, a._5) shouldBe
      ((Some("b"), 3L, 2L, 666666L))
  }

  test("tied successors predict the smallest type name") {
    val rows = Seq(
      ev(1, 1, "a", "2024-01-01 10:00:00"),
      ev(2, 1, "z", "2024-01-01 11:00:00"),
      ev(3, 2, "a", "2024-01-01 10:00:00"),
      ev(4, 2, "b", "2024-01-01 11:00:00"))
    run(rows).find(_._1 == "a").get._2 shouldBe Some("b")
  }

  test("the overall row aggregates every from-type") {
    val rows = Seq(
      ev(1, 1, "a", "2024-01-01 10:00:00"),
      ev(2, 1, "b", "2024-01-01 11:00:00"),
      ev(3, 1, "a", "2024-01-01 12:00:00"))
    val all = run(rows).find(_._1 == "__overall__").get
    (all._3, all._4) shouldBe ((2L, 2L)) // a->b predicted b; b->a predicted a
  }

  test("each user's last event generates no transition") {
    val rows = Seq(ev(1, 1, "a", "2024-01-01 10:00:00"),
      ev(2, 2, "a", "2024-01-01 10:00:00"))
    run(rows) shouldBe Seq(("__overall__", None, 0L, 0L, 0L))
  }
}
