package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** saxWords: hand-checked PAA means and symbols, the flat-series
  * degenerate case, and the property that makes SAX useful — two
  * series with the same shape at different magnitudes get the SAME
  * word (per-key equi-width binning normalizes scale). */
class SaxWordsSpec extends SparkSpec {
  import spark.implicits._

  /** day i (0-based) gets `counts(i)` events of the given type. */
  private def series(typ: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((typ, Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00")))
    }

  test("hand-checked PAA and symbols (12 days, 6 windows, 4 symbols)") {
    // windows of 2 days; daily counts -> window means:
    // (1,1)=1 (1,1)=1 (5,5)=5 (9,9)=9 (9,9)=9 (5,5)=5
    // mn=1 mx=9 -> sym = (p-1)*4 div 9: 1->0, 5->1, 9->3
    val counts = Seq(1, 1, 1, 1, 5, 5, 9, 9, 9, 9, 5, 5)
    val out = Analytics.saxWords(series("a", counts).toDF("event_type", "ts"),
        "event_type", "ts", windows = 6, alphabet = 4)
      .as[(String, Long, Long, String)].collect()
    out shouldBe Array(("a", 12L, 6L, "001331"))
  }

  test("a flat series is the all-zero word") {
    val out = Analytics.saxWords(
        series("f", Seq.fill(12)(3)).toDF("event_type", "ts"),
        "event_type", "ts", windows = 6, alphabet = 4)
      .as[(String, Long, Long, String)].collect()
    out.head._4 shouldBe "000000"
  }

  test("same shape at different magnitude buckets to the same word") {
    val shape = Seq(1, 1, 2, 2, 8, 8, 8, 8, 2, 2, 1, 1)
    val rows = series("small", shape) ++ series("big", shape.map(_ * 7))
    val out = Analytics.saxWords(rows.toDF("event_type", "ts"),
        "event_type", "ts", windows = 6, alphabet = 4)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    out("small") shouldBe out("big")
  }
}
