package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Aggregate-consistency audit and calendar densification: hand
  * gaps, tolerance edges, childless parents, and span semantics. */
class ConsistencyAndDensifySpec extends SparkSpec {
  import spark.implicits._

  private def audit(parents: Seq[(String, Long)],
      children: Seq[(String, Long)], tol: Long) =
    Analytics.aggregateConsistencyAudit(
      parents.toDF("k", "v"), "k", col("v"),
      children.toDF("k", "v"), "k", col("v"), tol)
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("consistent, violating, and childless parents split three ways") {
    // p1 = 100 vs 100 (ok); p2 = 100 vs 80 (gap 200000 ppm); p3 no
    // children.
    val out = audit(
      Seq(("p1", 100L), ("p2", 100L), ("p3", 50L)),
      Seq(("p1", 60L), ("p1", 40L), ("p2", 80L)), tol = 50000L)
    out shouldBe ((3L, 1L, 1L, 333333L, 200000L))
  }

  test("a gap exactly at tolerance does not violate (strict >)") {
    val out = audit(Seq(("p1", 100L)), Seq(("p1", 95L)), tol = 50000L)
    out._3 shouldBe 0L
    out._5 shouldBe 50000L
  }

  test("zero-valued parent divides by the guarded 1, never by zero") {
    val out = audit(Seq(("p1", 0L)), Seq(("p1", 3L)), tol = 0L)
    out._5 shouldBe 3000000L
  }

  private def ev(day: Int, typ: String) =
    (Timestamp.valueOf(f"2024-05-$day%02d 10:00:00"), typ)

  test("densify fills interior gaps with explicit zeros, per type span") {
    val rows = Seq(ev(1, "a"), ev(1, "a"), ev(4, "a"), ev(2, "b"))
    val out = Analytics.densifyDays(rows.toDF("ts", "event_type"),
        "event_type", "ts")
      .orderBy("event_type", "day")
      .as[(String, String, Long, Boolean)].collect().toSeq
    out shouldBe Seq(
      ("a", "2024-05-01", 2L, false),
      ("a", "2024-05-02", 0L, true),
      ("a", "2024-05-03", 0L, true),
      ("a", "2024-05-04", 1L, false),
      // b's span is its own single day — no borrowed axis from a
      ("b", "2024-05-02", 1L, false))
  }
}
