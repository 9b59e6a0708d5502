package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Holt smoothing: hand-folded two-state recurrence, the ramp a bare
  * EWMA trails, and signed-trend truncation direction. */
class HoltSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, typ: String, times: Int) =
    Seq.fill(times)((Timestamp.valueOf(f"2024-04-$day%02d 09:00:00"), typ))

  private def run(rows: Seq[(Timestamp, String)], a: Long, b: Long) =
    Analytics.holtSmoothing(rows.toDF("ts", "event_type"),
        "event_type", "ts", a, b)
      .orderBy("event_type", "day")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq

  test("hand fold at alpha = beta = 0.5: counts 2, 4, 8") {
    // l1 = 2e6, b1 = 0.
    // l2 = 5e5*4 + 5e5*(2e6+0)/1e6 = 2e6 + 1e6 = 3e6;
    // b2 = 5e5*(3e6-2e6)/1e6 + 5e5*0/1e6 = 500000.
    // l3 = 5e5*8 + 5e5*(3e6+5e5)/1e6 = 4e6 + 1750000 = 5750000;
    // b3 = 5e5*(5750000-3e6)/1e6 + 5e5*5e5/1e6 = 1375000 + 250000.
    val out = run(ev(1, "a", 2) ++ ev(2, "a", 4) ++ ev(3, "a", 8),
      500000L, 500000L)
    out shouldBe Seq(
      ("a", "2024-04-01", 2L, 2000000L, 0L, 2000000L),
      ("a", "2024-04-02", 4L, 3000000L, 500000L, 3500000L),
      ("a", "2024-04-03", 8L, 5750000L, 1625000L, 7375000L))
  }

  test("on a steady ramp the forecast stops trailing (trend learned)") {
    // counts 1..8: by the end, forecast >= the next true value would
    // be for a converged trend; assert the trend is strictly
    // positive and the forecast beats the bare level.
    val rows = (1 to 8).flatMap(d => ev(d, "a", d))
    val last = run(rows, 500000L, 500000L).last
    assert(last._5 > 0L, s"trend should be positive: $last")
    last._6 shouldBe last._4 + last._5
  }

  test("falling series: the signed trend truncates toward zero") {
    // counts 4, 2 at alpha=beta=0.5:
    // l2 = 1e6 + 2e6 = 3e6; wait: 5e5*2 + 5e5*4e6/1e6 = 1e6+2e6 = 3e6;
    // b2 = 5e5*(3e6-4e6)/1e6 = 5e5*(-1e6)/1e6 = -500000 exactly.
    // Then day 3 with v=1: l3 = 5e5 + 5e5*(3e6-5e5)/1e6 = 5e5+1250000
    // = 1750000; b3 = 5e5*(1750000-3e6)/1e6 + 5e5*(-5e5)/1e6
    //             = trunc(-625000000000/1e6) + trunc(-250000000000/1e6)
    //             = -625000 + -250000 = -875000.
    val out = run(ev(1, "a", 4) ++ ev(2, "a", 2) ++ ev(3, "a", 1),
      500000L, 500000L)
    out.map(_._5) shouldBe Seq(0L, -500000L, -875000L)
  }

  test("types fold independently and flat series keep zero trend") {
    val rows = ev(1, "a", 3) ++ ev(2, "a", 3) ++ ev(3, "a", 3)
    run(rows, 300000L, 200000L).map(_._5).distinct shouldBe Seq(0L)
  }
}
