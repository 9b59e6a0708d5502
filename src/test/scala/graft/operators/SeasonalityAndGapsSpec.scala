package graft.operators

import java.sql.Timestamp

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
