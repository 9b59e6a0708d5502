package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Round-9 verdict item: the sequential-recurrence operators must
  * check their driver-fold bound BEFORE materializing on the driver.
  * `boundedCollect` routes every intake through `limit(bound + 1)`,
  * so the plan itself caps what can ever reach the driver — these
  * specs plant over-bound fixtures and assert the contract `require`
  * fires (an unbounded collect would instead OOM long before any
  * message on a genuinely huge key space). */
class DriverFoldGuardSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ewmaBaseline raises on over-bound (type, day) rollup") {
    val rows = (0 until 8).map(i =>
      (s"t$i", ts(s"2024-01-0${i % 7 + 1} 10:00:00")))
    val e = intercept[IllegalArgumentException] {
      Analytics.ewmaBaseline(rows.toDF("event_type", "ts"),
        "event_type", "ts", alphaPpm = 300000L, maxRows = 5).collect()
    }
    e.getMessage should include("ewmaBaseline")
    e.getMessage should include("bound (5 rows)")
  }

  test("holtSmoothing raises on over-bound (type, day) rollup") {
    val rows = (0 until 8).map(i =>
      (s"t$i", ts(s"2024-01-0${i % 7 + 1} 10:00:00")))
    val e = intercept[IllegalArgumentException] {
      Analytics.holtSmoothing(rows.toDF("event_type", "ts"),
        "event_type", "ts", alphaPpm = 300000L, betaPpm = 100000L,
        maxRows = 5).collect()
    }
    e.getMessage should include("holtSmoothing")
  }

  test("stationaryDistribution raises on an over-bound state space") {
    // 10001 distinct types > the 10^4 enum bound; one event each, so
    // the transition rollup is EMPTY — only the state-space guard can
    // fire, and it must fire before the edges collect.
    val rows = (0 to 10000).map(i =>
      (1L, ts("2024-01-01 10:00:00"), s"type_$i", i.toLong))
    val e = intercept[IllegalArgumentException] {
      Analytics.stationaryDistribution(
        rows.toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", "event_id", iters = 4).collect()
    }
    e.getMessage should include("state space")
  }

  test("kaplanMeier raises on over-bound lifetime classes") {
    // 100001 users with 100001 DISTINCT lifetimes (user i lives i
    // days): the (lifetime -> counts) histogram exceeds the 1e5 bound.
    val n = 100001
    val base = java.time.LocalDate.of(2000, 1, 1).toEpochDay
    val df = spark.range(n.toLong)
      .selectExpr("CAST(id AS STRING) AS u", s"$base AS f",
        s"$base + id AS l")
      .selectExpr("u",
        "stack(2, timestamp(date_from_unix_date(CAST(f AS INT))), " +
          "timestamp(date_from_unix_date(CAST(l AS INT)))) AS ts")
    val e = intercept[IllegalArgumentException] {
      Analytics.kaplanMeier(df, "u", "ts", censorDays = 0).collect()
    }
    e.getMessage should include("kaplanMeier")
  }
}
