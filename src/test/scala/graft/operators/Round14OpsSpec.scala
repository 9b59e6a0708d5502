package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the round-14 preference/agreement
  * family: Cohen's kappa, Bradley–Terry strengths, the Wilson
  * win-rate matrix, and DPO preference-pair assembly. */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa: the textbook 2x2 grid reads exactly 0.4, " +
      "chance-perfect marginals read NULL, null ratings drop") {
    // 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no: po = 35/50 = 0.70,
    // marginals A(25,25) B(30,20), pe = (25*30 + 25*20)/2500 = 0.50,
    // kappa = 0.20/0.50 = 0.40
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
        Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Analytics.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
    out shouldBe ((50L, 35L, 2L, 700000L, 500000L, Some(400000L)))
    // both raters constant on the same label: pe = 1e6, kappa undefined
    val const = Seq.fill(4)(("x", "x")).toDF("a", "b")
    Analytics.cohenKappa(const, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
      ._6 shouldBe None
    // a null rating on either side is not a data point
    val withNull = (rows :+ ((null: String, "y"))).toDF("a", "b")
    Analytics.cohenKappa(withNull, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
      ._1 shouldBe 50L
  }

  test("bradleyTerry: two items hit the exact 3:1 MLE, a win cycle " +
      "stays uniform, a never-winner sits at zero") {
    // A beats B 3:1 -> P(A>B) = 3/4 -> strengths 1.5e6 / 0.5e6 after
    // normalization to sum 2e6 (the exact 2-item MLE, reached in one
    // MM round and stable thereafter)
    val ab = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A"))).toDF("w", "l")
    Analytics.bradleyTerry(ab, "w", "l", iters = 4)
      .orderBy(col("item"))
      .as[(String, Long, Long, Long)].collect().toSeq shouldBe Seq(
      ("A", 3L, 4L, 1500000L), ("B", 1L, 4L, 500000L))
    // rock-paper-scissors: perfectly cyclic evidence, uniform fit
    val rps = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("w", "l")
    Analytics.bradleyTerry(rps, "w", "l", iters = 4)
      .select(col("strength_micro")).as[Long].collect().toSet shouldBe
      Set(1000000L)
    // an item that never wins has MLE 0; the winner soaks the mass
    val sweep = Seq(("A", "B"), ("A", "B")).toDF("w", "l")
    Analytics.bradleyTerry(sweep, "w", "l", iters = 2)
      .orderBy(col("item"))
      .as[(String, Long, Long, Long)].collect().toSeq shouldBe Seq(
      ("A", 2L, 2L, 2000000L), ("B", 0L, 2L, 0L))
  }

  test("winRateMatrix: exact ppm rate, Wilson bounds match the stated " +
      "IEEE chain and bracket the rate") {
    val ab = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A"))).toDF("w", "l")
    val (a, b, n, wins, rate, lo, hi) =
      Analytics.winRateMatrix(ab, "w", "l")
        .as[(String, String, Long, Long, Long, Long, Long)].head()
    (a, b, n, wins, rate) shouldBe (("A", "B", 4L, 3L, 750000L))
    // the same chain, computed directly
    def wilson(w: Double, nn: Double, sign: Double): Long =
      math.round(((w + 3.8416 / 2) / (nn + 3.8416) +
        sign * 1.96 * math.sqrt(w * (nn - w) / nn + 3.8416 / 4) /
          (nn + 3.8416)) * 1e6)
    lo shouldBe wilson(3, 4, -1)
    hi shouldBe wilson(3, 4, 1)
    lo should be < rate
    hi should be > rate
    hi should be <= 1000000L + 1L
  }

  test("preferencePairs: best/worst with smallest-id ties, margin " +
      "filter, single-candidate and all-tied groups never emit") {
    val df = Seq(
      ("g1", 1L, 10L), ("g1", 2L, 30L), ("g1", 3L, 30L), // tie -> id 2
      ("g2", 4L, 7L), // single candidate
      ("g3", 5L, 5L), ("g3", 6L, 5L), // all tied: chosen == margin 0
      ("g4", 7L, 100L), ("g4", 8L, 98L) // margin 2 < minMargin 5
    ).toDF("prompt", "id", "s")
    val out = Curation.preferencePairs(df, "prompt", "id", col("s"),
        minMargin = 5L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(("g1", 3L, 2L, 1L, 30L, 10L, 20L))
    // margin 0 allowed: g4 emits; the all-tied g3 still refuses —
    // chosen (smallest id among score ties = 5) equals rejected
    // (smallest id at the min score = 5), so the pair is vacuous
    val loose = Curation.preferencePairs(df, "prompt", "id", col("s"),
        minMargin = 0L)
      .orderBy(col("prompt"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    loose.map(_._1) shouldBe Seq("g1", "g4")
    loose.find(_._1 == "g4").get._7 shouldBe 2L
  }
}
