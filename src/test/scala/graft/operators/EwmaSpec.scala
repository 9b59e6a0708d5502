package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** EWMA baseline: hand-folded recurrence, first-day semantics, and
  * per-type independence. */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, typ: String, times: Int) =
    Seq.fill(times)((Timestamp.valueOf(f"2024-02-${day}%02d 09:00:00"), typ))

  private def run(rows: Seq[(Timestamp, String)], alpha: Long) =
    Analytics.ewmaBaseline(rows.toDF("ts", "event_type"),
        "event_type", "ts", alpha)
      .orderBy("event_type", "day")
      .as[(String, String, Long, Long, Long)].collect().toSeq

  test("hand fold at alpha = 0.5: counts 4, 2, 8") {
    // s1 = 4e6; s2 = 500000*2 + 500000*4e6/1e6 = 1e6 + 2e6 = 3e6,
    // dev2 = 2e6 - 4e6 = -2e6; s3 = 4e6 + 1.5e6 = 5.5e6,
    // dev3 = 8e6 - 3e6 = 5e6.
    val rows = ev(1, "a", 4) ++ ev(2, "a", 2) ++ ev(3, "a", 8)
    run(rows, 500000L) shouldBe Seq(
      ("a", "2024-02-01", 4L, 4000000L, 0L),
      ("a", "2024-02-02", 2L, 3000000L, -2000000L),
      ("a", "2024-02-03", 8L, 5500000L, 5000000L))
  }

  test("alpha = 1 tracks the series exactly; deviation is the day delta") {
    val rows = ev(1, "a", 3) ++ ev(2, "a", 7)
    run(rows, 1000000L) shouldBe Seq(
      ("a", "2024-02-01", 3L, 3000000L, 0L),
      ("a", "2024-02-02", 7L, 7000000L, 4000000L))
  }

  test("types fold independently") {
    val rows = ev(1, "a", 2) ++ ev(2, "a", 2) ++
      ev(1, "b", 10) ++ ev(2, "b", 10)
    val out = run(rows, 300000L)
    out.filter(_._1 == "a").map(_._4) shouldBe Seq(2000000L, 2000000L)
    out.filter(_._1 == "b").map(_._4) shouldBe Seq(10000000L, 10000000L)
    out.map(_._5).distinct shouldBe Seq(0L)
  }

  test("truncating division floors toward zero on the nonnegative state") {
    // alpha=0.3: s1 = 3e6; s2 = 300000*1 + 700000*3e6/1e6
    //          = 300000 + 2100000 = 2400000 exactly; then day 3 with
    // v=1: s3 = 300000 + 700000*2400000/1e6 = 300000 + 1680000.
    val rows = ev(1, "a", 3) ++ ev(2, "a", 1) ++ ev(3, "a", 1)
    run(rows, 300000L).map(_._4) shouldBe
      Seq(3000000L, 2400000L, 1980000L)
  }
}
