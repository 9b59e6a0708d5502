package graft.operators

import graft.SparkSpec

/** FD audit: a planted key, a near-held dependency surfaced in ppm
  * (not boolean-rounded), asymmetry, and NULL exclusion. */
class FunctionalDependencySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String, String)]) =
    Analytics.functionalDependencies(rows.toDF("k", "grp", "status"),
        Seq("k", "grp", "status"))
      .orderBy("determinant", "dependent")
      .as[(String, String, Long, Long, Long)].collect().toSeq

  private val rows = Seq(
    ("k1", "g1", "open"), ("k2", "g1", "open"),
    ("k3", "g2", "open"), ("k4", "g2", "closed"))

  test("a key column determines everything with zero violations") {
    val out = run(rows)
    out.filter(_._1 == "k").foreach { r =>
      (r._3, r._4, r._5) shouldBe ((4L, 0L, 0L))
    }
  }

  test("a half-violated dependency reports exact ppm, not a boolean") {
    // grp -> status: g1 consistent, g2 carries two statuses:
    // 1 of 2 groups violating = 500000 ppm.
    run(rows).find(r => r._1 == "grp" && r._2 == "status").get shouldBe
      (("grp", "status", 2L, 1L, 500000L))
  }

  test("direction matters: status -> grp is judged independently") {
    // status=open spans g1 and g2 (violating); closed -> g2 only.
    run(rows).find(r => r._1 == "status" && r._2 == "grp").get shouldBe
      (("status", "grp", 2L, 1L, 500000L))
  }

  test("NULL on either side drops the row for that pair only") {
    val withNull = rows ++ Seq((null.asInstanceOf[String], "g9", "x"),
      ("k9", null.asInstanceOf[String], "open"))
    val out = run(withNull)
    // k -> status ignores the null-k row: still 5 groups (k9 counts).
    out.find(r => r._1 == "k" && r._2 == "status").get._3 shouldBe 5L
    // grp -> status ignores the null-grp row but sees g9.
    out.find(r => r._1 == "grp" && r._2 == "status").get._3 shouldBe 3L
  }
}
