package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Cross-correlation: hand-computed lead–lag on a planted series,
  * perfect lagged copy, flat-series null, and zero-fill semantics. */
class CrossCorrelationSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, typ: String, times: Int) =
    Seq.fill(times)((Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00"), typ))

  private def run(rows: Seq[(Timestamp, String)], lag: Int) =
    Analytics.crossCorrelation(rows.toDF("ts", "event_type"),
      "event_type", "ts", "a", "b", lag)

  test("a perfectly lag-1-copied series correlates positively") {
    // a: 1,3,1,3,1,3 on days 1-6; b = a shifted one day later:
    // days 2-7 get 1,3,1,3,1,3. Day axis = union (7 days).
    val rows = (1 to 6).flatMap(d =>
      ev(d, "a", if (d % 2 == 1) 1 else 3)) ++
      (2 to 7).flatMap(d => ev(d, "b", if (d % 2 == 0) 1 else 3))
    val r = run(rows, 1).collect().head
    r.getLong(3) shouldBe 7L // n_days
    // dx_i * dy_{i+1} is positive wherever both defined: r > 0.5
    assert(r.getDouble(7) > 0.5, s"expected strong positive r, got $r")
  }

  test("hand case: two days, lag 1") {
    // days 1-2: a = (2, 0), b = (0, 4). n=2.
    // dx = (2*2-2, 0*2-2) = (2,-2); dy = (0*2-4, 4*2-4) = (-4,4).
    // num = dx1*dy2 = 2*4 = 8; den_x = 8, den_y = 32;
    // r = 8 / (sqrt(8)*sqrt(32)) = 8/16 = 0.5.
    val rows = ev(1, "a", 2) ++ ev(2, "b", 4)
    val r = run(rows, 1).collect().head
    (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) shouldBe
      ((2L, 8L, 8L, 32L))
    r.getDouble(7) shouldBe 0.5
  }

  test("flat series reports null r") {
    // b fires identically every day: dy = 0 everywhere -> den_y = 0.
    val rows = (1 to 4).flatMap(d => ev(d, "a", d)) ++
      (1 to 4).flatMap(d => ev(d, "b", 2))
    val r = run(rows, 1).collect().head
    r.isNullAt(7) shouldBe true
    r.getLong(6) shouldBe 0L
  }

  test("days where only one series fires zero-fill the other") {
    // a fires day 1 only, b fires day 3 only: axis has 2 days,
    // both series still mean-center to Σd = 0 exactly.
    val rows = ev(1, "a", 5) ++ ev(3, "b", 5)
    val r = run(rows, 1).collect().head
    r.getLong(3) shouldBe 2L
    // dx = (5*2-5, -5) = (5,-5); dy = (-5,5); num = dx1*dy2 = 25.
    r.getLong(4) shouldBe 25L
  }
}
