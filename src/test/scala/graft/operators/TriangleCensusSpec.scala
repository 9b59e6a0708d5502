package graft.operators

import graft.SparkSpec

/** Triangle census: hand graph, canonicalization (reversals, dups,
  * self-loops), and the empty-graph edge. */
class TriangleCensusSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    Analytics.triangleCensus(edges.toDF("a", "b"))
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("triangle with a pendant: wedges 5, one triangle, clustering 0.6") {
    // edges (1,2)(2,3)(1,3)(3,4): degrees 2,2,3,1 -> wedges 1+1+3 = 5;
    // one triangle; 3*1e6*1 div 5 = 600000.
    census(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) shouldBe
      ((4L, 4L, 5L, 1L, 600000L))
  }

  test("reversed and duplicate edges collapse; self-loops drop") {
    census(Seq((2L, 1L), (1L, 2L), (3L, 2L), (3L, 1L), (4L, 3L),
      (4L, 4L))) shouldBe ((4L, 4L, 5L, 1L, 600000L))
  }

  test("a 4-cycle has 4 wedges and no triangle") {
    census(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) shouldBe
      ((4L, 4L, 4L, 0L, 0L))
  }

  test("K4 closes every wedge") {
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    // degrees all 3: wedges 4*3 = 12; triangles C(4,3) = 4;
    // clustering = 12e6 div 12 = 1e6.
    census(k4) shouldBe ((4L, 6L, 12L, 4L, 1000000L))
  }

  test("edgeless input: zero everything, no division") {
    census(Seq((5L, 5L))) shouldBe ((0L, 0L, 0L, 0L, 0L))
  }

  private def capped(edges: Seq[(Long, Long)], cap: Int) =
    Analytics.triangleCensus(edges.toDF("a", "b"), maxDegree = cap)
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("degree cap: a star keeps only the smallest-id spokes") {
    // hub 1 with spokes 2..6 at cap 2: hub keeps (1,2),(1,3); every
    // spoke keeps its only edge, so survivors = both-endpoint kept.
    capped((2L to 6L).map(s => (1L, s)), cap = 2) shouldBe
      ((3L, 2L, 1L, 0L, 0L))
  }

  test("cap that never binds changes nothing") {
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    capped(k4, cap = 10) shouldBe census(k4)
  }

  test("cap must survive BOTH endpoints: asymmetric keep drops the edge") {
    // path 1-2, 2-3, 3-4 plus hub edges 2-5, 2-6 at cap 2: node 2's
    // neighbors {1,3,5,6} keep {1,3}; 5 and 6 keep their only edge
    // but 2 dropped them -> edges (2,5),(2,6) die.
    capped(Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (2L, 6L)),
      cap = 2) shouldBe ((4L, 3L, 2L, 0L, 0L))
  }
}
