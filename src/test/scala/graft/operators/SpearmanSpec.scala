package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spearman: perfect monotone ±1, the hand-computed tie case, the
  * constant-column null, and rank-only sensitivity. */
class SpearmanSpec extends SparkSpec {
  import spark.implicits._

  private def rho(rows: Seq[(Long, Long)]) =
    Analytics.spearmanCorrelation(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head

  test("any strictly increasing map scores exactly 1") {
    // monotone but wildly nonlinear: Spearman sees only ranks.
    val r = rho(Seq((1L, 10L), (2L, 1000L), (3L, 1001L), (4L, 999999L)))
    r.getDouble(4) shouldBe 1.0
  }

  test("strictly decreasing scores exactly -1") {
    rho(Seq((1L, 30L), (2L, 20L), (3L, 10L))).getDouble(4) shouldBe -1.0
  }

  test("hand tie case: x=(1,1,2) vs y=(5,6,7)") {
    // doubled midranks: r2x = (3,3,6), r2y = (2,4,6); n+1 = 4;
    // cx = (-1,-1,2), cy = (-2,0,2): sxy=6, sxx=6, syy=8;
    // rho = 6/sqrt(48) = 0.866025.
    val r = rho(Seq((1L, 5L), (1L, 6L), (2L, 7L)))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((3L, 6L, 6L, 8L))
    r.getDouble(4) shouldBe 0.866025
  }

  test("a constant column has no rank variance: null rho") {
    val r = rho(Seq((7L, 1L), (7L, 2L), (7L, 3L)))
    (r.getLong(2), r.isNullAt(4)) shouldBe ((0L, true))
  }

  test("NULLs in either column drop the row") {
    val df = Seq((Some(1L), Some(10L)), (Some(2L), Some(20L)),
      (None, Some(99L)), (Some(9L), None)).toDF("a", "b")
    Analytics.spearmanCorrelation(df, col("a"), col("b"))
      .collect().head.getLong(0) shouldBe 2L
  }

  test("exact-long envelope: n = 2e6 passes, n = 2e6 + 1 raises, the sampled fallback recovers") {
    // the round-11 boundary rehearsal (VERDICT ask #7): the n³
    // rank-sum envelope guard must fire AT the boundary, not just on
    // absurd sizes — and the documented fallback (the q51
    // deterministic sampler) must bring the same relation back inside
    def series(n: Long) = spark.range(n)
      .select(col("id").as("doc_id"), col("id").as("x"),
        (col("id") * 7 % 1000).as("y"))
    val atBound = Analytics.spearmanCorrelation(
      series(2000000L), col("x"), col("y")).collect().head
    atBound.getLong(0) shouldBe 2000000L
    val ex = intercept[Exception] {
      Analytics.spearmanCorrelation(
        series(2000001L), col("x"), col("y")).collect()
    }
    ex.getMessage should include("exact-long rank-sum envelope")
    // fallback: hash-sample to ~25% (deterministic), then correlate
    val sampled = Curation.hashSample(series(2000001L), col("doc_id"),
      permille = 250)
    val r = Analytics.spearmanCorrelation(sampled, col("x"), col("y"))
      .collect().head
    r.getLong(0) should be < 2000000L
    r.getLong(0) should be > 100000L
  }
}
