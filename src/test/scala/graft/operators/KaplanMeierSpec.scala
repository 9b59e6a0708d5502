package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Kaplan–Meier: hand risk table, censoring vs churn, censored users
  * shrinking the risk set without a survival drop, and truncation. */
class KaplanMeierSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: String, day: Int) =
    (u, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"))

  private def run(rows: Seq[(String, Timestamp)], censorDays: Int) =
    Analytics.kaplanMeier(rows.toDF("user_id", "ts"), "user_id", "ts",
        censorDays)
      .orderBy("offset_days")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("hand curve: three churners at distinct lifetimes") {
    // corpus ends day 20; censor window 0 days -> only users last
    // seen ON day 20 censor. u1 lifetime 2, u2 lifetime 5, u3 10.
    val rows = Seq(ev("u1", 1), ev("u1", 3),
      ev("u2", 1), ev("u2", 6),
      ev("u3", 10), ev("u3", 20))
    // u3 l=20 = md, censor window 0: l > md - 0 is FALSE... md-0=20,
    // 20 > 20 false -> u3 churns at 10.
    // risk: t=2 n=3 d=1 -> S = 666666; t=5 n=2 d=1 -> S=333333;
    // t=10 n=1 d=1 -> S=0.
    run(rows, 0) shouldBe Seq(
      (2L, 3L, 1L, 0L, 666666L),
      (5L, 2L, 1L, 0L, 333333L),
      (10L, 1L, 1L, 0L, 0L))
  }

  test("a censored user leaves the risk set without dropping survival") {
    // corpus ends day 20; window 14: u2 last seen day 10 > 6 ->
    // censored at lifetime 9; u1 churns at 2 (last seen day 3).
    val rows = Seq(ev("u1", 1), ev("u1", 3),
      ev("u2", 1), ev("u2", 10), ev("u3", 20))
    // u3: lifetime 0, censored (l=20 > 6).
    // t=0: n=3, d=0, c=1 -> S stays 1e6; t=2: n=2, d=1 -> 500000;
    // t=9: n=1, d=0, c=1 -> S stays 500000.
    run(rows, 14) shouldBe Seq(
      (0L, 3L, 0L, 1L, 1000000L),
      (2L, 2L, 1L, 0L, 500000L),
      (9L, 1L, 0L, 1L, 500000L))
  }

  test("everyone censored: the curve never drops") {
    val rows = Seq(ev("u1", 19), ev("u2", 20))
    val out = run(rows, 14)
    out.map(_._5).distinct shouldBe Seq(1000000L)
    out.map(_._4).sum shouldBe 2L
  }

  test("per-step truncation is the stated contract (1/3 twice)") {
    // six churners: three at t=1, then... use 3 then 2 at distinct
    // times of a 3-user risk set: t=1 n=3 d=2 -> 333333;
    // t=4 n=1 d=1 -> 0.
    val rows = Seq(ev("a", 1), ev("a", 2), ev("b", 1), ev("b", 2),
      ev("c", 1), ev("c", 5))
    run(rows, 0) shouldBe Seq(
      (1L, 3L, 2L, 0L, 333333L),
      (4L, 1L, 1L, 0L, 0L))
  }
}
