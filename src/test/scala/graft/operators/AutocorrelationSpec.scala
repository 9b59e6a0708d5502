package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** autocorrelation: equality with a driver-side reimplementation on a
  * periodic and an alternating series; flat series report null r; a
  * weekly pattern scores positive at lag 7 and an alternating one
  * negative at lag 1. */
class AutocorrelationSpec extends SparkSpec {
  import spark.implicits._

  private def series(typ: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((typ, Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00")))
    }

  private def refR(counts: Seq[Int], lag: Int): (Long, Long) = {
    val n = counts.length.toLong
    val total = counts.map(_.toLong).sum
    val d = counts.map(_ * n - total)
    val num = (0 until counts.length - lag).map(i => d(i) * d(i + lag)).sum
    val den = d.map(x => x * x).sum
    (num, den)
  }

  private def run(rows: Seq[(String, Timestamp)], lag: Int) =
    Analytics.autocorrelation(rows.toDF("event_type", "ts"),
        "event_type", "ts", lag)
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap

  test("weekly pattern: lag-7 r matches the reimplementation and is strongly positive") {
    val weekly = Seq.fill(4)(Seq(9, 2, 2, 2, 2, 2, 5)).flatten // 28 days
    val (num, den) = refR(weekly, 7)
    val out = run(series("w", weekly), 7)("w")
    out._4 shouldBe num
    out._5 shouldBe den
    out._6.get shouldBe math.rint(num.toDouble / den * 1e6) / 1e6 +- 1e-9
    out._6.get should be > 0.5
  }

  test("alternating series: lag-1 r is strongly negative") {
    val alt = Seq.fill(6)(Seq(8, 1)).flatten
    val (num, den) = refR(alt, 1)
    val out = run(series("a", alt), 1)("a")
    out._4 shouldBe num
    out._6.get should be < -0.5
  }

  test("flat series report null r with zero denominator") {
    val out = run(series("f", Seq.fill(10)(4)), 7)("f")
    out._5 shouldBe 0L
    out._6 shouldBe None
  }
}
