package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Activity heatmap: cell assignment, exact ppm conservation, and the
  * weekday-local share. */
class ActivityHeatmapSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[Timestamp]) =
    Analytics.activityHeatmap(rows.map(Tuple1(_)).toDF("ts"), "ts")
      .orderBy(col("weekday"), col("hour"))
      .as[(Long, Long, Long, Long, Long)].collect()

  test("cells count and shares are exact ppm") {
    // 2024-01-01 is a Monday: epoch day 19723, 19723 % 7 = 4
    val rows = Seq(
      Timestamp.valueOf("2024-01-01 10:15:00"),
      Timestamp.valueOf("2024-01-01 10:45:00"),
      Timestamp.valueOf("2024-01-01 23:00:00"),
      Timestamp.valueOf("2024-01-02 10:00:00"))
    val out = run(rows)
    out shouldBe Seq(
      (4L, 10L, 2L, 500000L, 666666L),
      (4L, 23L, 1L, 250000L, 333333L),
      (5L, 10L, 1L, 250000L, 1000000L))
  }

  test("weekday-local shares sum to ~1e6 per weekday") {
    val rows = (0 until 10).map(h =>
      Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"))
    val out = run(rows)
    out.map(_._5).sum should be (1000000L +- 10L)
  }
}
