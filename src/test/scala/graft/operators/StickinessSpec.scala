package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** stickiness: hand-checked DAU/WAU/MAU on a designed calendar —
  * window distinct counts each user once, the week boundary excludes
  * day −7, and absent days emit no row. */
class StickinessSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, d: String) =
    (u, Timestamp.valueOf(s"2024-01-$d 12:00:00"))

  test("hand-checked engagement sheet") {
    // u1: Jan 1 (twice) + Jan 2; u2: Jan 1; u3: Jan 9
    val rows = Seq(ev(1, "01"), ev(1, "01"), ev(1, "02"), ev(2, "01"),
      ev(3, "09")).toDF("user_id", "ts")
    val out = Analytics.stickiness(rows, "user_id", "ts")
      .orderBy("day").as[(String, Long, Long, Long, Long)].collect()
    out shouldBe Array(
      ("2024-01-01", 2L, 2L, 2L, 1000000L),
      ("2024-01-02", 1L, 2L, 2L, 500000L), // u2's Jan 1 is in the week
      // Jan 9: the trailing week starts Jan 3 — u1/u2 fall out of WAU
      // but stay in the 28-day MAU
      ("2024-01-09", 1L, 1L, 3L, 1000000L))
  }

  test("weeklyRetention: hand-checked two-cohort triangle") {
    // 2024-01-01 and 2024-01-08 are Mondays. Cohort W1: u1 (returns
    // both weeks), u2 (week 1 only). Cohort W2: u3.
    val rows = Seq(ev(1, "01"), ev(1, "02"), ev(1, "10"), ev(2, "03"),
      ev(3, "09")).toDF("user_id", "ts")
    val out = Analytics.weeklyRetention(rows, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(String, Long, Long, Long, Long)].collect()
    out shouldBe Array(
      ("2024-01-01", 0L, 2L, 2L, 1000000L),
      ("2024-01-01", 1L, 1L, 2L, 500000L), // u1 returned in week 2
      ("2024-01-08", 0L, 1L, 1L, 1000000L))
  }

  test("abTestHarness: arms partition users, z matches the stated op order, degenerate z is NULL") {
    val rows = (1 to 200).map { i =>
      val typ = if (i % 3 == 0) "purchase" else "view"
      (i.toLong, Timestamp.valueOf("2024-01-01 10:00:00"), typ)
    }.toDF("user_id", "ts", "event_type")
      .drop("ts")
    val r = Analytics.abTestHarness(rows, "user_id", "event_type",
        "purchase", "exp1")
      .collect().head
    val (na, xa, nb, xb) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    na + nb shouldBe 200L
    xa + xb shouldBe 66L // i % 3 == 0 converters
    xa should be <= na
    xb should be <= nb
    // the z the operator reports must equal the stated IEEE op chain
    val z = (xa * nb - xb * na).toDouble /
      math.sqrt((xa + xb).toDouble / (na + nb).toDouble *
        (na + nb - xa - xb).toDouble * na.toDouble * nb.toDouble)
    r.getDouble(6) shouldBe (math.rint(z * 1e6) / 1e6 +- 1e-9)
    // all-converted arm pair: pooled variance is 0 -> z NULL, not inf
    val all = (1 to 40).map(i => (i.toLong, "purchase"))
      .toDF("user_id", "event_type")
    val d = Analytics.abTestHarness(all, "user_id", "event_type",
      "purchase", "exp1").collect().head
    d.isNullAt(6) shouldBe true
    d.getBoolean(7) shouldBe false
  }

  test("the week window is exactly 7 days: day -7 is out, day -6 is in") {
    val rows = Seq(ev(1, "01"), ev(2, "02"), ev(9, "08"))
      .toDF("user_id", "ts")
    val out = Analytics.stickiness(rows, "user_id", "ts")
      .orderBy("day").as[(String, Long, Long, Long, Long)].collect()
    val jan8 = out.find(_._1 == "2024-01-08").get
    jan8._3 shouldBe 2L // u2 (Jan 2 = day -6) + u9; u1 (Jan 1 = day -7) out
    jan8._4 shouldBe 3L // all three inside 28 days
  }
}
