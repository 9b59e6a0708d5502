package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** theilSenTrend: hand-checked median slope, robustness to an outlier
  * day that wrecks the least-squares fit, and the <2-days emit-nothing
  * rule. */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  private def series(typ: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((typ, Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00")))
    }

  private def run(rows: Seq[(String, Timestamp)]) =
    Analytics.theilSenTrend(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("a clean linear ramp reports its exact slope") {
    // counts 1,3,5,7: every pairwise slope is exactly 2
    val out = run(series("lin", Seq(1, 3, 5, 7)))
    val (_, nDays, nPairs, dv, dd, slope) = out("lin")
    nDays shouldBe 4L
    nPairs shouldBe 6L
    slope shouldBe 2.0
    dv.toDouble / dd shouldBe 2.0
  }

  test("one outlier day does not move the median slope") {
    // ramp of slope 1 with one huge spike: the median pairwise slope
    // stays 1 while the least-squares slope would be dragged up
    val out = run(series("rob", Seq(1, 2, 3, 50, 5, 6, 7, 8)))
    out("rob")._6 shouldBe 1.0
  }

  test("keys with fewer than 2 days emit nothing") {
    val rows = series("one", Seq(4)) ++ series("two", Seq(2, 5))
    val out = run(rows)
    out.keySet shouldBe Set("two")
    out("two")._6 shouldBe 3.0
  }
}
