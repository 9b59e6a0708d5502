package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cohort LTV: hand curve, fixed cohort denominator, week-boundary
  * alignment, and gap-offset semantics. */
class CohortLtvSpec extends SparkSpec {
  import spark.implicits._

  private def o(e: String, day: String, cents: Long) =
    (e, Timestamp.valueOf(s"$day 12:00:00"), cents)

  private def run(rows: Seq[(String, Timestamp, Long)]) =
    Analytics.cohortLtv(rows.toDF("e", "ts", "v"), "e", "ts", col("v"))
      .orderBy("cohort_week", "offset_weeks")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand curve: two customers, one cohort, revenue accumulates") {
    // 2024-01-01 is a Monday: both first orders in that cohort week.
    val rows = Seq(
      o("c1", "2024-01-01", 100L), o("c2", "2024-01-03", 50L),
      o("c1", "2024-01-09", 40L), // next week: offset 1
      o("c2", "2024-01-17", 10L)) // two weeks later: offset 2
    run(rows) shouldBe Seq(
      ("2024-01-01", 0L, 2L, 150L, 150L, 75L),
      ("2024-01-01", 1L, 2L, 40L, 190L, 95L),
      ("2024-01-01", 2L, 2L, 10L, 200L, 100L))
  }

  test("the denominator is the FIXED cohort size, not active buyers") {
    // only c1 buys in week 1 — cum_per_entity still divides by 2.
    val rows = Seq(o("c1", "2024-01-01", 10L), o("c2", "2024-01-02", 10L),
      o("c1", "2024-01-08", 100L))
    run(rows).last._6 shouldBe 60L // (10+10+100)/2
  }

  test("a Sunday and the following Monday land in different weeks") {
    val rows = Seq(o("c1", "2024-01-07", 1L), o("c2", "2024-01-08", 1L))
    run(rows).map(_._1).distinct.size shouldBe 2
  }

  test("offsets with no revenue emit no row (gaps are explicit absences)") {
    val rows = Seq(o("c1", "2024-01-01", 5L), o("c1", "2024-01-22", 5L))
    run(rows).map(_._2) shouldBe Seq(0L, 3L)
  }
}
