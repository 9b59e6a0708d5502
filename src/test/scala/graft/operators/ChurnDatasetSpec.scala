package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Churn dataset: window boundaries, cold-start exclusion, and
  * horizon-bounded labels. */
class ChurnDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def run(rows: Seq[(Long, Timestamp, String)]) =
    Curation.churnDataset(rows.toDF("u", "ts", "t"), "u", "ts", "t",
        "purchase", cutoffOffsetDays = 9, horizonDays = 5)
      .orderBy(col("user_id"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()

  test("features stop at the cutoff; the label reads only the horizon") {
    // min day Jan 1 -> cutoff Jan 10, horizon through Jan 15
    val rows = Seq(
      (1L, ts(1), "view"), (1L, ts(9), "purchase"), (1L, ts(12), "view"),
      (2L, ts(2), "view"), (2L, ts(2), "view"),
      (3L, ts(13), "view"))
    val out = run(rows)
    // user 3 is cold-start: excluded
    out.map(_._1) shouldBe Seq(1L, 2L)
    val u1 = out(0)
    u1 shouldBe ((1L, 2L, 2L, 1L, 1L, 1L)) // 2 evts, 2 days, 1 buy, rec 9-8=1, active
    val u2 = out(1)
    u2._6 shouldBe 0L // no horizon activity
    u2._5 shouldBe 8L // recency: cutoff offset 9 - day offset 1
  }

  test("activity past the horizon neither labels nor features") {
    val rows = Seq((1L, ts(5), "view"), (1L, ts(20), "view"))
    val out = run(rows)
    out.head._6 shouldBe 0L // Jan 20 is past Jan 15
    out.head._2 shouldBe 1L
  }
}
