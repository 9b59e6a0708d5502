package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** stationaryDistribution: a symmetric cycle fixes the uniform point,
  * an absorbing state collects all mass, and a transition-free chain
  * keeps the exactly-10⁶ start vector (remainder on the smallest
  * state). */
class StationarySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def run(rows: Seq[(Long, Timestamp, String, Long)], iters: Int) =
    Analytics.stationaryDistribution(
        rows.toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", "event_id", iters)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("a balanced two-state cycle is already stationary at uniform") {
    val rows = Seq(
      (1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L),
      (1L, ts(3), "a", 3L), (1L, ts(4), "b", 4L))
    val out = run(rows, iters = 8)
    out("a") shouldBe ((2L, 500000L)) // a->b twice
    out("b") shouldBe ((1L, 500000L)) // b->a once
  }

  test("an absorbing state collects all mass and holds it") {
    val rows = Seq((1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L))
    val out = run(rows, iters = 4)
    out("a") shouldBe ((1L, 0L))
    out("b") shouldBe ((0L, 1000000L))
  }

  test("no transitions: the exactly-10^6 start vector survives, remainder on the smallest state") {
    val rows = Seq(
      (1L, ts(1), "a", 1L), (2L, ts(1), "b", 2L), (3L, ts(1), "c", 3L))
    val out = run(rows, iters = 3)
    out("a") shouldBe ((0L, 333334L)) // 1e6 div 3 + remainder 1
    out("b") shouldBe ((0L, 333333L))
    out("c") shouldBe ((0L, 333333L))
  }
}
