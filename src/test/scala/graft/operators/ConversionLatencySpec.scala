package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** conversionLatency: hand-checked seconds and lower median; the
  * strict-order rule (purchase before or at the signup second does
  * not convert); first occurrences only. */
class ConversionLatencySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Timestamp, String)]) =
    Analytics.conversionLatency(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "signup", "purchase")
      .as[(Long, Long, Long, Long)].collect().head

  test("hand-checked latencies with the lower median") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:10"), "purchase"), // 10 s
      (2L, ts("2024-01-01 09:00:00"), "signup"),
      (2L, ts("2024-01-01 09:01:40"), "purchase"), // 100 s
      (3L, ts("2024-01-01 08:00:00"), "signup"),
      (3L, ts("2024-01-01 08:16:40"), "purchase"), // 1000 s
      (4L, ts("2024-01-01 07:00:00"), "purchase"), // purchase first: no
      (4L, ts("2024-01-01 08:00:00"), "signup"),
      (5L, ts("2024-01-01 06:00:00"), "signup")) // never purchases
    val (n, mn, med, mx) = run(rows)
    n shouldBe 3L
    mn shouldBe 10L
    med shouldBe 100L // lower median of 10, 100, 1000
    mx shouldBe 1000L
  }

  test("first occurrences drive the latency, later ones are ignored") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 12:00:00"), "signup"), // later signup ignored
      (1L, ts("2024-01-01 10:00:30"), "purchase"),
      (1L, ts("2024-01-01 13:00:00"), "purchase")) // later purchase ignored
    val (n, mn, _, _) = run(rows)
    n shouldBe 1L
    mn shouldBe 30L
  }

  test("a purchase in the same second as the signup does not convert (zero-row summary)") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "purchase"))
    // no conversions -> ONE summary row with n=0 and null statistics
    // (the SQL-aggregate shape the DuckDB oracle produces)
    val out = Analytics.conversionLatency(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "signup", "purchase").collect()
    out should have length 1
    out.head.getLong(0) shouldBe 0L
    out.head.isNullAt(1) shouldBe true
    out.head.isNullAt(2) shouldBe true
    out.head.isNullAt(3) shouldBe true
  }
}
