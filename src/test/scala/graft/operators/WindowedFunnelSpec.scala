package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** windowedFunnel: hand-checked deadlines — in-window chains, the
  * deadline miss, strict-> ties, the first-QUALIFYING occurrence rule
  * — and equivalence with the plain funnel at an unbounded window. */
class WindowedFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("signup", "view", "click")
  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Timestamp, String)], w: Long) =
    Analytics.windowedFunnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps, w)
      .orderBy("step_idx")
      .as[(Long, String, Long, Long)].collect()

  test("deadline binds: a view past the window breaks the chain") {
    val rows = Seq(
      // u1: all within 1 h windows -> reaches 3
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:30:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      // u2: view 2 h after signup -> breaks at step 1 under W=1h
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, ts("2024-01-01 12:00:00"), "view"),
      (2L, ts("2024-01-01 12:10:00"), "click"))
    val out = run(rows, w = 3600L)
    out.map(_._3).toSeq shouldBe Seq(2L, 1L, 1L)
    out.map(_._4).toSeq shouldBe Seq(1000000L, 500000L, 500000L)
  }

  test("strict >: a view in the same second as the signup does not advance") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "view"))
    run(rows, w = 3600L).map(_._3).toSeq shouldBe Seq(1L, 0L, 0L)
  }

  test("first-QUALIFYING occurrence: a pre-signup view is ignored, a later one counts") {
    val rows = Seq(
      (1L, ts("2024-01-01 09:00:00"), "view"), // before signup: not qualifying
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:30:00"), "view"), // the qualifying first view
      (1L, ts("2024-01-01 10:45:00"), "click")) // within 1 h of 10:30
    run(rows, w = 3600L).map(_._3).toSeq shouldBe Seq(1L, 1L, 1L)
    // plain funnel would use the 09:00 view as the first view and fail
    val plain = Analytics.funnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps)
      .orderBy("step_idx").select("n_users").as[Long].collect()
    plain.toSeq shouldBe Seq(1L, 0L, 0L)
  }

  test("empty input: zero counts, NULL ppm (no division by zero)") {
    // ADVICE r9: with n0 = 0 the unguarded `div` diverged from the
    // DuckDB oracle's raising `//` — the guard makes ppm NULL, the
    // same degenerate-input convention as the plain funnel's _base
    val out = Analytics.windowedFunnel(
        Seq.empty[(Long, Timestamp, String)]
          .toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps, 3600L)
      .orderBy("step_idx")
      .select("n_users", "conversion_ppm")
      .collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(0L, 0L, 0L)
    all(out.map(_.isNullAt(1))) shouldBe true
  }

  test("unbounded window reaches at least the plain funnel at every step") {
    val rows = (0 until 120).map { i =>
      (i % 12L, ts(f"2024-01-01 ${8 + i / 15}%02d:${i % 60}%02d:00"),
        Seq("signup", "view", "click", "other")(i % 4))
    }
    val wide = run(rows, w = 10000000L).map(_._3).toSeq
    val plain = Analytics.funnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps)
      .orderBy("step_idx").select("n_users").as[Long].collect().toSeq
    // the windowed form takes the first QUALIFYING occurrence, so with
    // no deadline pressure it can only match or exceed the plain
    // funnel's strict first-occurrence chain
    wide.zip(plain).foreach { case (w, p) => w should be >= p }
    wide.head shouldBe plain.head
  }
}
