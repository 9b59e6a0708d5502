package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Frequent triples: exact support, the support floor, the ordering
  * invariant a<b<c, and basket-cap inheritance. */
class FrequentTriplesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], minSupport: Long,
      cap: Int = 100) =
    Analytics.frequentTriples(rows.toDF("bk", "it"), "bk", "it",
        minSupport, cap)
      .orderBy(col("item_a"), col("item_b"), col("item_c"))
      .as[(Long, Long, Long, Long)].collect()

  test("hand case: one frequent triple, exact support") {
    // baskets 1,2 = {1,2,3}; basket 3 = {1,2,4}
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (2L, 3L), (3L, 1L), (3L, 2L), (3L, 4L))
    run(rows, minSupport = 2L) shouldBe Seq((1L, 2L, 3L, 2L))
  }

  test("triples ordered a<b<c, each emitted once") {
    val rows = Seq((1L, 3L), (1L, 1L), (1L, 2L))
    val out = run(rows, minSupport = 1L)
    out shouldBe Seq((1L, 2L, 3L, 1L))
  }

  test("pair-frequent but triple-infrequent candidates are recounted away") {
    // pair (1,2) support 2, but {1,2,3} occurs once and {1,2,4} once
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (2L, 4L))
    run(rows, minSupport = 2L) shouldBe empty
  }

  test("basket cap drops the oversized basket") {
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 2L), (2L, 3L))
    run(rows, minSupport = 1L, cap = 3) shouldBe Seq((1L, 2L, 3L, 1L))
  }
}
