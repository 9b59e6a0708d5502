package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** madOutliers: hand-checked lower medians, spike detection that a
  * stddev-based gate would miss (the spike inflates its own
  * threshold), and the MAD=0 degenerate rule. */
class MadOutliersSpec extends SparkSpec {
  import spark.implicits._

  private def series(typ: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((typ, Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00")))
    }

  private def run(rows: Seq[(String, Timestamp)]) =
    Analytics.madOutliers(rows.toDF("event_type", "ts"), "event_type", "ts")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("hand-checked medians and the spike flagged as the only outlier") {
    // values 2,3,4,5,60,4,3: sorted 2,3,3,4,4,5,60 -> lower median at
    // pos ceil(7/2)=4 -> 4; |v-4| = 2,1,0,1,56,0,1 -> sorted
    // 0,0,1,1,1,2,56 -> MAD = 1; outliers: ad > 3 -> only the 56
    val out = run(series("a", Seq(2, 3, 4, 5, 60, 4, 3)))
    val (_, n, med, mad, outl) = out("a")
    n shouldBe 7L
    med shouldBe 4L
    mad shouldBe 1L
    outl shouldBe 1L
  }

  test("MAD = 0 degenerates to flagging any deviation") {
    // 5 days of 3 and one day of 9: median 3, deviations 0x5, 6 ->
    // MAD (pos 3 of sorted 0,0,0,0,0,6) = 0; ad > 0 flags the 9
    val out = run(series("z", Seq(3, 3, 3, 9, 3, 3)))
    val (_, _, med, mad, outl) = out("z")
    med shouldBe 3L
    mad shouldBe 0L
    outl shouldBe 1L
  }

  test("a clean series has zero outliers") {
    val out = run(series("c", Seq(4, 5, 6, 5, 4, 5, 6)))
    out("c")._5 shouldBe 0L
  }
}
