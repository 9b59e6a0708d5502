package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** weekdaySeasonality + interEventGaps: a planted weekly cycle scores
  * the full 10⁶ ppm with the right peak weekday, a flat series scores
  * zero, and gap buckets land on the hand-computed integer log₂
  * classes with a tie-invariant multiset. */
class SeasonalityAndGapsSpec extends SparkSpec {
  import spark.implicits._

  private def series(typ: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((typ, Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00")))
    }

  test("a pure weekly cycle scores 10^6 ppm and names the peak weekday") {
    // 2024-01-01 is a Monday; 14 days, v = 2 on both Mondays, 1 else:
    // within-weekday counts are constant, so residual variance is 0
    // and SSB = SST exactly (336 = 336 in the scaled integers).
    val rows = series("a", Seq(2, 1, 1, 1, 1, 1, 1, 2, 1, 1, 1, 1, 1, 1))
    val r = Analytics.weekdaySeasonality(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .as[(String, Long, Long, Long)].collect().head
    r shouldBe (("a", 14L, 1000000L, 2L)) // Monday = 2 (Sunday = 1)
  }

  test("a flat series scores 0 with the smallest weekday as the degenerate peak") {
    val rows = series("b", Seq.fill(14)(3))
    val r = Analytics.weekdaySeasonality(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .as[(String, Long, Long, Long)].collect().head
    r shouldBe (("b", 14L, 0L, 1L)) // all dg = 0: smallest weekday wins
  }

  test("weekdayAdjustedZscore: an outlier Monday flags; a uniformly-busy Sunday does not") {
    // 11 Mondays at 5 with one at 50: z = 450/sqrt(20250) ~ 3.162 >= 3.
    // Every Sunday at 20 (busier than Mondays, but NORMAL for Sundays):
    // zero within-weekday variance -> z NULL, anomaly false.
    def day(base: String, weeks: Int) = java.time.LocalDate.parse(base)
      .plusDays(7L * weeks).toString
    val rows =
      (0 until 10).flatMap(k => Seq.fill(5)(("a", day("2024-01-01", k)))) ++
        Seq.fill(50)(("a", day("2024-01-01", 10))) ++
        (0 until 11).flatMap(k => Seq.fill(20)(("a", day("2024-01-07", k))))
    val df = rows.map { case (t, d) =>
      (t, Timestamp.valueOf(s"$d 12:00:00")) }.toDF("event_type", "ts")
    val out = Analytics.weekdayAdjustedZscore(df, "ts", "event_type")
      .as[(String, String, Long, Long, Option[Double], Boolean)].collect()
    val flagged = out.filter(_._6)
    flagged.map(_._2) shouldBe Array(day("2024-01-01", 10))
    out.filter(_._3 == 1L).foreach { r => // Sundays: z NULL, no flag
      r._5 shouldBe None
      r._6 shouldBe false
    }
  }

  test("benfordAudit: hand counts, absent digits emit zero rows, non-positives excluded") {
    val rows = Seq(100L, 150L, 199L, 250L, 900L, 0L, -5L).toDF("cents")
    val out = Analytics.benfordAudit(rows, col("cents"))
      .orderBy("digit")
      .as[(Long, Long, Long, Long, Long)].collect()
    out.length shouldBe 9
    val byDigit = out.map(r => r._1 -> r).toMap
    byDigit(1L)._2 shouldBe 3L // 100, 150, 199
    byDigit(1L)._3 shouldBe 600000L
    byDigit(1L)._4 shouldBe 301030L // round(log10(2) * 1e6)
    byDigit(1L)._5 shouldBe 298970L
    byDigit(2L)._2 shouldBe 1L
    byDigit(9L)._2 shouldBe 1L
    byDigit(3L)._2 shouldBe 0L // absent digit still reported
  }

  test("interEventGaps: hand-computed log2 buckets, same-second bucket 0") {
    val rows = Seq(0L, 0L, 1L, 5L, 100L).map(s => ("u1", new Timestamp(s * 1000L), "e"))
    val out = Analytics.interEventGaps(rows.toDF("u", "ts", "typ"),
        "u", "ts", "typ")
      .orderBy("bucket")
      .as[(Long, Long, Long, Long)].collect()
    // gaps 0, 1, 4, 95 -> buckets 0, 1, 3, 7
    out shouldBe Array(
      (0L, 1L, 0L, 0L), (1L, 1L, 1L, 1L),
      (3L, 1L, 4L, 4L), (7L, 1L, 95L, 95L))
  }

  test("interEventGaps: first event per user yields no gap; users are independent") {
    val rows = Seq(("a", 0L), ("a", 10L), ("b", 1000L))
      .map { case (u, s) => (u, new Timestamp(s * 1000L), "e") }
    val out = Analytics.interEventGaps(rows.toDF("u", "ts", "typ"),
        "u", "ts", "typ")
      .as[(Long, Long, Long, Long)].collect()
    out shouldBe Array((4L, 1L, 10L, 10L)) // only a's 10 s gap: bin(10) has 4 digits
  }
}
