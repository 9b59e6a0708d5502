package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Pettitt changepoint: hand-ranked split, outlier robustness vs the
  * level shift, tie handling, and the short-series edge. */
class PettittSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, typ: String, times: Int) =
    Seq.fill(times)((Timestamp.valueOf(f"2024-03-${day}%02d 08:00:00"), typ))

  private def run(rows: Seq[(Timestamp, String)]) =
    Analytics.pettittChangepoint(rows.toDF("ts", "event_type"),
        "event_type", "ts")
      .orderBy("event_type")
      .as[(String, Long, Long, Option[String])].collect().toSeq

  test("hand case: clean level shift splits at the boundary") {
    // counts 1,2,3 then 10,11,12: ranks 1..6, doubled 2..12 at days
    // 1..6. U_t = cum(2R) - 7t: t=1: 2-7=-5; t=2: 6-14=-8; t=3:
    // 12-21=-9; t=4: 32-28=4; t=5: 54-35=19... wait cum at t=4 =
    // 2+4+6+8? ranks of 10,11,12 are 4,5,6 -> 2R = 8,10,12.
    // cums: 2,6,12,20,30,42. U: -5,-8,-9,-8,-5. K = 9 at day 3.
    val rows = ev(1, "a", 1) ++ ev(2, "a", 2) ++ ev(3, "a", 3) ++
      ev(4, "a", 10) ++ ev(5, "a", 11) ++ ev(6, "a", 12)
    run(rows) shouldBe Seq(("a", 6L, 9L, Some("2024-03-03")))
  }

  test("tied counts contribute exact midrank zeros") {
    // 2,2,2,5,5: doubled midranks 4,4,4,... wait ranks: three 2s ->
    // midrank 2 (2R=4); two 5s -> midrank 4.5 (2R=9).
    // cums: 4,8,12,21; U_t = cum - 6t: -2,-4,-6,-3. K=6 at day 3.
    val rows = ev(1, "a", 2) ++ ev(2, "a", 2) ++ ev(3, "a", 2) ++
      ev(4, "a", 5) ++ ev(5, "a", 5)
    run(rows) shouldBe Seq(("a", 5L, 6L, Some("2024-03-03")))
  }

  test("one wild outlier does not move the split (rank robustness)") {
    // same shift, but day 5 spikes to 500: its RANK is still 6.
    val rows = ev(1, "a", 1) ++ ev(2, "a", 2) ++ ev(3, "a", 3) ++
      ev(4, "a", 10) ++ ev(5, "a", 500) ++ ev(6, "a", 12)
    run(rows).head._4 shouldBe Some("2024-03-03")
  }

  test("single-day series: k2 = 0, null at_day") {
    run(ev(1, "a", 7)) shouldBe Seq(("a", 1L, 0L, None))
  }
}
