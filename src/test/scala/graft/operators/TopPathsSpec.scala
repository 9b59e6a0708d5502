package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** topPaths: hand-checked journeys, the maxSteps cut, the (ts, type)
  * tie rule, the top-k boundary order, and the one-extra-exchange
  * plan shape (window and per-user rollup share a partitioning). */
class TopPathsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hand-checked paths with the maxSteps cut and tie rule") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "click"),
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 11:00:00"), "view"),
      (2L, ts("2024-01-02 12:00:00"), "click"),
      // u3: same-second signup/view — type ASC orders signup first
      (3L, ts("2024-01-03 10:00:00"), "view"),
      (3L, ts("2024-01-03 10:00:00"), "signup"),
      // u4: seven events, only the first five survive
      (4L, ts("2024-01-04 10:00:00"), "a"), (4L, ts("2024-01-04 10:01:00"), "b"),
      (4L, ts("2024-01-04 10:02:00"), "c"), (4L, ts("2024-01-04 10:03:00"), "d"),
      (4L, ts("2024-01-04 10:04:00"), "e"), (4L, ts("2024-01-04 10:05:00"), "f"),
      (4L, ts("2024-01-04 10:06:00"), "g"))
      .toDF("user_id", "ts", "event_type").repartition(5)
    val out = Analytics.topPaths(rows, "user_id", "ts", "event_type",
        maxSteps = 5, topK = 10)
      .as[(String, Long)].collect()
    out shouldBe Array(
      ("signup>view>click", 2L),
      ("a>b>c>d>e", 1L),
      ("signup>view", 1L))
  }

  test("topK boundary: ties rank by path ascending") {
    val rows = (1L to 4L).map(u =>
      (u, ts("2024-01-01 10:00:00"), s"t$u")).toDF("user_id", "ts", "event_type")
    val out = Analytics.topPaths(rows, "user_id", "ts", "event_type", 3, 2)
      .as[(String, Long)].collect()
    out shouldBe Array(("t1", 1L), ("t2", 1L))
  }

  test("window and per-user rollup share one exchange") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val df = Analytics.topPaths(ev, "user_id", "ts", "event_type", 5, 20)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one user-key exchange (window + rollup share it) + one path
    // rollup exchange; the ranking is TakeOrdered, not a sort
    assert(exchanges <= 2, s"expected <= 2 shuffles, found $exchanges:\n$plan")
    assert(plan.contains("TakeOrdered"), s"top-k should be TakeOrdered:\n$plan")
  }
}
