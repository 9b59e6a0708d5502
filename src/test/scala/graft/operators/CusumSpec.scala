package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** cusumChangepoint: a planted level shift is found at the last
  * pre-shift day (where |S| peaks for a step change), a flat series
  * has zero CUSUM everywhere (earliest-day tie), and the scaled
  * deviations sum to exactly zero by construction. */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def series(typ: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((typ, Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00")))
    }

  private def run(rows: Seq[(String, Timestamp)]) =
    Analytics.cusumChangepoint(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .as[(String, Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("a planted step shift peaks at the last pre-shift day") {
    // 6 days at 2, then 6 days at 8: mean = 5, S walks down to its
    // extreme at day 6 then back — change detected entering day 7
    val out = run(series("a", Seq(2, 2, 2, 2, 2, 2, 8, 8, 8, 8, 8, 8)))
    val (_, nDays, changeDay, peak, total, ppm) = out("a")
    nDays shouldBe 12L
    changeDay shouldBe "2024-01-06"
    // scaled: dev = v*12 - 60 = -36 per pre-shift day; S_6 = -216
    peak shouldBe -216L
    total shouldBe 60L
    ppm shouldBe (216L * 1000000L / (60L * 12L))
  }

  test("a flat series has zero CUSUM and ties to the earliest day") {
    val out = run(series("f", Seq.fill(10)(3)))
    val (_, _, changeDay, peak, _, ppm) = out("f")
    peak shouldBe 0L
    ppm shouldBe 0L
    changeDay shouldBe "2024-01-01"
  }

  test("scaled deviations telescope: the final cumulative sum is exactly zero") {
    // any series: S_n = sum(v*n) - n*total = 0 — check via a ragged one
    val counts = Seq(5, 1, 7, 2, 9, 4)
    val n = counts.length.toLong
    val total = counts.map(_.toLong).sum
    val devs = counts.map(_ * n - total)
    devs.sum shouldBe 0L
    // and the operator's peak is the first max-|prefix| of these devs
    val prefixes = devs.scanLeft(0L)(_ + _).tail
    val out = run(series("r", counts))
    out("r")._4 shouldBe
      prefixes(prefixes.map(math.abs).indexOf(prefixes.map(math.abs).max))
  }
}
