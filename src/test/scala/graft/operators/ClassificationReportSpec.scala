package graft.operators

import graft.SparkSpec

/** Classification report: hand P/R/F1, hallucinated classes, the
  * macro row, and zero-denominator safety. */
class ClassificationReportSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Analytics.classificationReport(rows.toDF("a", "p"), "a", "p")
      .orderBy("cls")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand case: P=2/3, R=2/4, F1 exact") {
    // class x: 4 actual, predicted x three times (2 right, 1 on a y).
    val rows = Seq(("x", "x"), ("x", "x"), ("x", "y"), ("x", "y"),
      ("y", "x"), ("y", "y"))
    val x = run(rows).find(_._1 == "x").get
    (x._2, x._3, x._4) shouldBe ((4L, 3L, 2L))
    x._5 shouldBe 666666L // precision
    x._6 shouldBe 500000L // recall
    // F1 = 2*666666*500000 div 1166666 = 571428
    x._7 shouldBe 571428L
  }

  test("a class only ever predicted still gets its row (recall 0/0)") {
    val rows = Seq(("x", "z"), ("x", "x"))
    val z = run(rows).find(_._1 == "z").get
    (z._2, z._3, z._5, z._6, z._7) shouldBe ((0L, 1L, 0L, 0L, 0L))
  }

  test("the macro row floor-averages per-class ppm") {
    // perfect x (1e6 everywhere), absent-recall z: macro over
    // classes {x, z}: (1e6 + 0) div 2 = 500000.
    val rows = Seq(("x", "x"), ("z", "q"))
    val mac = run(rows).find(_._1 == "__macro__").get
    // classes: q (hallucinated), x (perfect), z (missed) -> k = 3;
    // precision sum = 1e6, recall sum = 1e6 -> 333333 each.
    (mac._5, mac._6) shouldBe ((333333L, 333333L))
  }

  test("perfect prediction scores 1e6 across the board") {
    val rows = Seq(("x", "x"), ("y", "y"), ("y", "y"))
    run(rows).filter(_._1 != "__macro__").foreach { r =>
      (r._5, r._6, r._7) shouldBe ((1000000L, 1000000L, 1000000L))
    }
  }
}
