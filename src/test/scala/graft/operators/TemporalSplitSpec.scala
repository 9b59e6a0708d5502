package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Temporal embargo split: boundary assignment, the purge gap, and
  * the shared-entity audit. */
class TemporalSplitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  private def run(rows: Seq[(Timestamp, Long)], cutoff: Int, gap: Int) =
    Curation.temporalSplit(rows.toDF("ts", "u"), "ts", "u", cutoff, gap)
      .orderBy(col("split"))
      .as[(String, Long, Long, String, String, Long)].collect()

  test("cutoff inclusive, embargo dropped rows still counted in their split") {
    // min day = Jan 1; cutoff offset 2 -> train ≤ Jan 3; embargo 2 ->
    // Jan 4-5; test from Jan 6.
    val rows = Seq(ts(1) -> 1L, ts(3) -> 2L, ts(4) -> 3L, ts(5) -> 3L,
      ts(6) -> 4L, ts(9) -> 1L)
    val out = run(rows, cutoff = 2, gap = 2)
    out.map(_._1) shouldBe Seq("embargo", "test", "train")
    val bySplit = out.map(r => r._1 -> r).toMap
    bySplit("train")._2 shouldBe 2L
    bySplit("embargo")._2 shouldBe 2L
    bySplit("test")._2 shouldBe 2L
    bySplit("train")._5 shouldBe "2024-01-03"
    bySplit("test")._4 shouldBe "2024-01-06"
  }

  test("shared entities counts train∩test only (embargo excluded)") {
    val rows = Seq(ts(1) -> 1L, ts(3) -> 2L, ts(4) -> 3L, ts(5) -> 3L,
      ts(6) -> 4L, ts(9) -> 1L)
    val out = run(rows, cutoff = 2, gap = 2)
    // user 1 is in train and test; user 3 only in embargo
    all(out.map(_._6)) shouldBe 1L
  }

  test("zero embargo produces no embargo rows") {
    val rows = Seq(ts(1) -> 1L, ts(5) -> 2L)
    val out = run(rows, cutoff = 1, gap = 0)
    out.map(_._1) shouldBe Seq("test", "train")
  }
}
