package graft.operators

import graft.SparkSpec

/** Top principal component: a planted dominant axis, sign
  * canonicalization, and the degenerate zero-covariance cloud. */
class TopPcSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[Seq[Float]], dims: Int) =
    Similarity.topPrincipalComponent(
        vecs.map(v => Tuple1(v)).toDF("embedding"), "embedding",
        dims, iters = 12)
      .orderBy("dim")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("a cloud spread along axis 0 yields axis 0, positive lead") {
    // variance 4 on dim 0, ~0.01 on dim 1, zero elsewhere.
    val vecs = Seq(
      Seq(2f, 0.1f, 0f, 0f), Seq(-2f, -0.1f, 0f, 0f),
      Seq(2f, -0.1f, 0f, 0f), Seq(-2f, 0.1f, 0f, 0f))
    val out = run(vecs, 4)
    val comps = out.map(_._2)
    assert(comps.head > 0L, s"lead must be canonicalized positive: $out")
    assert(comps.head == comps.map(math.abs).max,
      s"dim 0 must dominate: $out")
    // near-total variance on one axis: explained close to 1e6
    assert(out.head._5 > 900000L, s"collapse score should be high: $out")
  }

  test("an identical-vector cloud has zero covariance: all zeros out") {
    val vecs = Seq.fill(5)(Seq(1f, 2f, 3f, 4f))
    val out = run(vecs, 4)
    out.map(_._2) shouldBe Seq(0L, 0L, 0L, 0L)
    out.head._3 shouldBe 0L // lambda
    out.head._5 shouldBe 0L // explained
  }

  test("two comparable axes split the explained share") {
    val vecs = Seq(
      Seq(1f, 1f, 0f, 0f), Seq(-1f, -1f, 0f, 0f),
      Seq(1f, -1f, 0f, 0f), Seq(-1f, 1f, 0f, 0f))
    // isotropic in the 2D subspace: explained ≈ 1/2, never > 60%.
    val out = run(vecs, 4)
    assert(out.head._5 < 600000L && out.head._5 > 400000L,
      s"expected ~half share: $out")
  }
}
