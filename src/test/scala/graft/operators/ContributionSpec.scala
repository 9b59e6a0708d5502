package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contribution analysis: exact conservation, remainder pinning, tie
  * handling, the zero-movement edge, and the no-window plan shape. */
class ContributionSpec extends SparkSpec {
  import spark.implicits._

  // (segment, period) rows; period "a"/"b" drives the two predicates.
  private def run(rows: Seq[(String, String)]) =
    Analytics.contributionAnalysis(rows.toDF("seg", "p"), "seg",
        col("p") === "a", col("p") === "b")
      .orderBy(col("segment"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  test("hand case: floors + the largest mover absorbs the remainder") {
    // s1: 10 → 7 (Δ −3), s2: 5 → 9 (Δ +4); Σ|Δ| = 7.
    // floor shares 428571 + 571428 = 999999; s2 (largest |Δ|) +1.
    val rows = Seq.fill(10)(("s1", "a")) ++ Seq.fill(7)(("s1", "b")) ++
      Seq.fill(5)(("s2", "a")) ++ Seq.fill(9)(("s2", "b"))
    run(rows) shouldBe Seq(
      ("s1", 10L, 7L, -3L, 428571L),
      ("s2", 5L, 9L, 4L, 571429L))
  }

  test("shares conserve exactly 1e6 whenever anything moved") {
    val rows = (0 until 7).flatMap { i =>
      Seq.fill(3 + i)((s"s$i", "a")) ++ Seq.fill(11 - i)((s"s$i", "b"))
    }
    val out = run(rows)
    out.map(_._5).sum shouldBe 1000000L
  }

  test("tied largest movers: the smallest segment name absorbs") {
    // both move |2|; winner must be s1 (name order), not s2.
    val rows = Seq.fill(2)(("s1", "b")) ++ Seq.fill(2)(("s2", "a"))
    run(rows) shouldBe Seq(
      ("s1", 0L, 2L, 2L, 500000L),
      ("s2", 2L, 0L, -2L, 500000L))
  }

  test("zero total movement emits all-zero shares, no division") {
    val rows = Seq.fill(4)(("s1", "a")) ++ Seq.fill(4)(("s1", "b")) ++
      Seq.fill(2)(("s2", "a")) ++ Seq.fill(2)(("s2", "b"))
    run(rows) shouldBe Seq(
      ("s1", 4L, 4L, 0L, 0L),
      ("s2", 2L, 2L, 0L, 0L))
  }

  test("rows matching neither predicate are ignored") {
    val rows = Seq.fill(3)(("s1", "a")) ++ Seq.fill(5)(("s1", "b")) ++
      Seq.fill(9)(("s1", "junk"))
    run(rows) shouldBe Seq(("s1", 3L, 5L, 2L, 1000000L))
  }

  test("no window operator anywhere in the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = Analytics.contributionAnalysis(
      Seq(("s1", "a")).toDF("seg", "p"), "seg",
      col("p") === "a", col("p") === "b")
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    } shouldBe empty
  }
}
