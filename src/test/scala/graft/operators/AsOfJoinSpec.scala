package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades / quotes: the canonical as-of fixture
  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L), // before any quote
    (1L, ts("2024-01-01 10:05:00"), 101L),
    (1L, ts("2024-01-01 10:10:00"), 102L), // exactly at a quote time
    (2L, ts("2024-01-01 09:00:00"), 103L)) // key with no quotes at all
    .toDF("user_id", "ts", "event_id")

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:01:00"), 201L),
    (1L, ts("2024-01-01 10:04:00"), 202L),
    (1L, ts("2024-01-01 10:04:00"), 203L), // same-time tie: larger id wins
    (1L, ts("2024-01-01 10:10:00"), 204L))
    .toDF("user_id", "ts", "event_id")

  private def run(inclusive: Boolean): Map[Long, Option[Long]] =
    AsOfJoin.asOf(trades, quotes, "user_id", "ts", "event_id",
        payload = Seq("event_id"), inclusive = inclusive)
      .select(col("event_id"), col("asof_event_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  test("most recent right row at or before each left row; ties by id") {
    run(inclusive = true) shouldBe Map(
      100L -> None, // no quote yet
      101L -> Some(203L), // 10:04 tie broken toward the larger event_id
      102L -> Some(204L), // inclusive: the 10:10 quote is visible
      103L -> None) // key never quoted
  }

  test("strict mode hides the same-timestamp right row") {
    run(inclusive = false)(102L) shouldBe Some(203L)
  }

  test("plan shape: one exchange on the key, no join") {
    val out = AsOfJoin.asOf(trades, quotes, "user_id", "ts", "event_id",
      payload = Seq("event_id"))
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "Join"
    // one hash exchange for the window; the union sides are planned
    // under it (local exchanges for the tiny test inputs aside)
    plan should include("Window")
  }
}
