package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Peak concurrency: hand sweep, inclusive-end semantics, midnight
  * carry-in across days, and first-second-at-peak ties. */
class PeakConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(iv: Seq[(String, String)]) =
    Analytics.peakConcurrency(
        iv.map { case (a, b) => (ts(a), ts(b)) }.toDF("st", "en"),
        "st", "en")
      .orderBy("day")
      .as[(String, Long, Long, Long)].collect().toSeq

  private def sec(s: String) = ts(s).getTime / 1000L

  test("hand sweep: three overlapping sessions peak at 3") {
    val out = run(Seq(
      ("2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      ("2024-01-01 10:30:00", "2024-01-01 12:00:00"),
      ("2024-01-01 10:45:00", "2024-01-01 10:50:00")))
    out shouldBe Seq(
      ("2024-01-01", 3L, 3L, sec("2024-01-01 10:45:00")))
  }

  test("inclusive end: a session ending at second s still counts at s") {
    // b starts exactly when a ends -> both active at that second.
    val out = run(Seq(
      ("2024-01-01 10:00:00", "2024-01-01 10:59:59"),
      ("2024-01-01 10:59:59", "2024-01-01 11:30:00")))
    out.head._3 shouldBe 2L
    out.head._4 shouldBe sec("2024-01-01 10:59:59")
  }

  test("midnight crossing carries into the next day") {
    val out = run(Seq(
      ("2024-01-01 23:00:00", "2024-01-02 01:00:00"),
      ("2024-01-02 00:30:00", "2024-01-02 02:00:00")))
    out shouldBe Seq(
      ("2024-01-01", 1L, 1L, sec("2024-01-01 23:00:00")),
      // carried-in session + the new one overlap 00:30-01:00
      ("2024-01-02", 2L, 2L, sec("2024-01-02 00:30:00")))
  }

  test("disjoint sessions: peak 1, at the FIRST peak second") {
    val out = run(Seq(
      ("2024-01-01 09:00:00", "2024-01-01 09:10:00"),
      ("2024-01-01 15:00:00", "2024-01-01 15:10:00")))
    out shouldBe Seq(
      ("2024-01-01", 2L, 1L, sec("2024-01-01 09:00:00")))
  }
}
