package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Association rules: hand-computed lift/confidence, the minSupport
  * floor, duplicate-line dedup, and the basketCap drop. */
class AssociationRulesSpec extends SparkSpec {
  import spark.implicits._

  private def rules(rows: Seq[(Long, Long)], minSupport: Long = 1L,
      cap: Int = 100) =
    Analytics.associationRules(rows.toDF("bk", "it"), "bk", "it",
        minSupport, cap)
      .orderBy(col("item_a"), col("item_b"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()

  test("hand case: lift/confidence exact ppm") {
    // baskets: 1={a,b}, 2={a,b}, 3={a}, 4={b,c}  (a=1, b=2, c=3)
    // N=4, n_a=3, n_b=3, n_ab=2 -> lift = 2*4/(3*3) = 888888 ppm,
    // conf both ways = 2/3 = 666666 ppm.
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (4L, 2L), (4L, 3L))
    val out = rules(rows)
    out should contain ((1L, 2L, 2L, 3L, 3L, 4L, 888888L, 666666L, 666666L))
    // b,c co-occur once: lift = 1*4/(3*1) = 1333333 ppm
    out should contain ((2L, 3L, 1L, 3L, 1L, 4L, 1333333L, 333333L, 1000000L))
  }

  test("minSupport prunes singleton pairs") {
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (4L, 2L), (4L, 3L))
    val out = rules(rows, minSupport = 2L)
    out.map(r => (r._1, r._2)) shouldBe Seq((1L, 2L))
  }

  test("duplicate basket lines count once") {
    // item repeated within a basket (two lineitems, same part)
    val rows = Seq((1L, 1L), (1L, 1L), (1L, 2L))
    val out = rules(rows)
    out.head._3 shouldBe 1L // n_ab
    out.head._4 shouldBe 1L // n_a
  }

  test("basketCap drops the pathological basket entirely") {
    // basket 1 has 3 items (> cap 2) -> dropped from pairs AND from
    // supports and the basket total.
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L))
    val out = rules(rows, cap = 2)
    out shouldBe Seq((1L, 2L, 1L, 1L, 1L, 1L, 1000000L, 1000000L, 1000000L))
  }
}
