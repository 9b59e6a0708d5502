package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Chi-square independence: hand-computed statistic, the zero-cell
  * contribution, exact independence, and NULL exclusion. */
class ChiSquareSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Analytics.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("hand case: 2x2 with X^2 = 20/3") {
    // O = [[10,20],[20,10]]: N=60, all marginals 30, E=15 everywhere;
    // each cell's term = (O*60-900)^2/(900*60) = 90000/54000 = 5/3
    // -> 1666667 micro rounded; four cells sum to 6666668.
    val rows =
      Seq.fill(10)(("a1", "b1")) ++ Seq.fill(20)(("a1", "b2")) ++
        Seq.fill(20)(("a2", "b1")) ++ Seq.fill(10)(("a2", "b2"))
    run(rows) shouldBe ((60L, 2L, 2L, 1L, 6666668L))
  }

  test("zero-observed cells still contribute their expected mass") {
    // O = [[4,0],[0,4]]: perfect association. X^2 = N = 8 exactly;
    // a cells-present-only sum would find only half of it.
    val rows = Seq.fill(4)(("a1", "b1")) ++ Seq.fill(4)(("a2", "b2"))
    run(rows) shouldBe ((8L, 2L, 2L, 1L, 8000000L))
  }

  test("exactly proportional table scores zero") {
    // O = [[2,4],[3,6]]: rows proportional -> every d = 0.
    val rows = Seq.fill(2)(("a1", "b1")) ++ Seq.fill(4)(("a1", "b2")) ++
      Seq.fill(3)(("a2", "b1")) ++ Seq.fill(6)(("a2", "b2"))
    run(rows) shouldBe ((15L, 2L, 2L, 1L, 0L))
  }

  test("NULL categories are excluded") {
    val rows = Seq.fill(4)(("a1", "b1")) ++ Seq.fill(4)(("a2", "b2"))
    val df = rows.toDF("a", "b").unionByName(
      Seq((null.asInstanceOf[String], "b1"), ("a1", null.asInstanceOf[String]))
        .toDF("a", "b"))
    val out = Analytics.chiSquareIndependence(df, "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
    out._1 shouldBe 8L
  }

  test("3x2 dof") {
    val rows = Seq(("a1", "b1"), ("a2", "b1"), ("a3", "b2"))
    run(rows)._4 shouldBe 2L
  }
}
