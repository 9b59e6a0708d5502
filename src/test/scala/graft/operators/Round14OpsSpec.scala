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

  test("quantileSketchAudit: exact rank interval logic — the sketch's " +
      "element lands within the eps band on a known distribution") {
    // 1..1000 in one group: every percentile's exact element is known,
    // and at accuracy 10000 the allowed rank slack is 100 ppm = 0.1
    // ranks — effectively exact on 1000 rows
    val df = (1L to 1000L).map(v => ("g", v)).toDF("grp", "v")
    val out = Analytics.quantileSketchAudit(df, "grp", col("v"),
        Seq(10000L, 500000L, 990000L), accuracy = 10000)
      .orderBy(col("pctile_ppm"))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    out.map(_._2) shouldBe Seq(10000L, 500000L, 990000L)
    all(out.map(_._3)) shouldBe 1000L
    all(out.map(_._4)) shouldBe true
    // a coarse sketch on a skewed histogram still honors ITS OWN
    // (larger) eps bound
    val skew = ((1L to 990L).map(_ => ("g", 1L)) ++
      (1L to 10L).map(v => ("g", v * 1000L))).toDF("grp", "v")
    val c = Analytics.quantileSketchAudit(skew, "grp", col("v"),
        Seq(995000L), accuracy = 100)
      .as[(String, Long, Long, Boolean)].head()
    c._4 shouldBe true
  }

  test("brierDecomposition: hand-computed terms, perfect forecaster " +
      "reads zero, constant forecaster reads zero resolution") {
    // perfect: p = outcome exactly -> brier 0, reliability 0
    val perfect = Seq((1000000L, true), (0L, false), (1000000L, true),
      (0L, false)).toDF("p", "o")
    val pf = Analytics.brierDecomposition(perfect, col("p"), col("o"), 10)
      .as[(Long, Long, Long, Long, Long)].head()
    pf._2 shouldBe 0L // brier
    pf._3 shouldBe 0L // reliability
    // obar = 500000 -> uncertainty = 0.25 in micro
    pf._5 shouldBe 250000L
    // constant 50% forecaster on a 50/50 outcome: brier = 0.25,
    // reliability 0 (bin mean = outcome rate), resolution 0 (one bin)
    val const = Seq((500000L, true), (500000L, false),
      (500000L, true), (500000L, false)).toDF("p", "o")
    val cf = Analytics.brierDecomposition(const, col("p"), col("o"), 10)
      .as[(Long, Long, Long, Long, Long)].head()
    cf._2 shouldBe 250000L
    cf._3 shouldBe 0L
    cf._4 shouldBe 0L
    cf._5 shouldBe 250000L
  }

  test("rollingOriginFolds: expanding train windows, fixed horizon, " +
      "exact counts, past-the-data test windows report zero") {
    import java.sql.Timestamp
    // 10 days, 1 row per day: span 10, cuts at ceil(10i/5) = 2,4,6,8
    val rows = (0 until 10).map(d =>
      Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00")).toDF("ts")
    val out = Curation.rollingOriginFolds(rows, col("ts"), nFolds = 4,
        horizonDays = 3)
      .orderBy(col("fold"))
      .as[(Long, java.sql.Date, java.sql.Date, java.sql.Date, Long, Long)]
      .collect().toSeq
    out.map(_._1) shouldBe Seq(1L, 2L, 3L, 4L)
    out.map(_._5) shouldBe Seq(2L, 4L, 6L, 8L) // expanding train
    out.map(_._6) shouldBe Seq(3L, 3L, 3L, 2L) // last horizon clipped
    out.head._3.toString shouldBe "2024-03-03"
    // every test day strictly after every train day of its fold
    all(out.map(f => f._3.after(f._2))) shouldBe true
    // horizon falling entirely past the data: n_test 0, fold visible
    val tiny = Seq(Timestamp.valueOf("2024-03-01 00:00:00")).toDF("ts")
    val t = Curation.rollingOriginFolds(tiny, col("ts"), 1, 5)
      .as[(Long, java.sql.Date, java.sql.Date, java.sql.Date, Long, Long)]
      .head()
    t._5 shouldBe 1L
    t._6 shouldBe 0L
  }

  test("propensityMatch: nearest-class match with lower-side ties, " +
      "class-mean control outcome, caliper refusal reported") {
    // treated at scores 100/200; controls at 90 (y 10,20 -> mean 15),
    // 110 (y 100), 350 (y 7). caliper 50:
    //  s=100: 90 and 110 both at distance 10 -> LOWER side wins (90),
    //         matched outcome = class mean 15e6 micro
    //  s=200: nearest control 110 is 90 away > caliper -> unmatched
    val df = Seq(
      (true, 100L, 40L), (true, 200L, 50L),
      (false, 90L, 10L), (false, 90L, 20L),
      (false, 110L, 100L), (false, 350L, 7L)
    ).toDF("t", "s", "y")
    val out = Analytics.propensityMatch(df, col("t"), col("s"), col("y"),
        caliperPpm = 50L)
      .as[(Long, Long, Long, Option[Long])].head()
    out._1 shouldBe 2L
    out._2 shouldBe 1L
    out._3 shouldBe 500000L
    // ATT over the matched unit: 40e6 - 15e6 = 25e6
    out._4 shouldBe Some(25000000L)
    // no control inside any caliper: n_matched 0, ATT null
    val none = Analytics.propensityMatch(df.filter(col("s") =!= 90L &&
        col("s") =!= 110L && col("s") =!= 350L || col("t")),
        col("t"), col("s"), col("y"), caliperPpm = 5L)
      .as[(Long, Long, Long, Option[Long])].head()
    none._2 shouldBe 0L
    none._4 shouldBe None
  }

  test("diffInDiff: hand 2x2, incomplete design fails fast") {
    // T: pre mean 10, post mean 30 (+20); C: pre 5, post 15 (+10)
    // -> DiD = +10 in micro
    val df = Seq(
      (true, false, 10L), (true, true, 30L),
      (false, false, 5L), (false, true, 15L)
    ).toDF("t", "p", "v")
    val out = Analytics.diffInDiff(df, col("t"), col("p"), col("v"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    out._9 shouldBe 10000000L
    val ex = intercept[Exception] {
      Analytics.diffInDiff(df.filter(col("p") || !col("t")),
        col("t"), col("p"), col("v")).collect()
    }
    ex.getMessage should include("2x2 design is incomplete")
  }

  test("cupedAdjust: a metric that IS the covariate adjusts to the " +
      "global mean everywhere; zero-variance covariate fails fast") {
    // y = x: theta = 1e6 ppm, rho2 = 1e6, adjusted mean = global mean
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L))
      .toDF("g", "x").withColumn("y", col("x"))
    val out = Analytics.cupedAdjust(df, "g", col("x"), col("y"))
      .orderBy(col("g"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    all(out.map(_._5)) shouldBe 1000000L // theta
    all(out.map(_._6)) shouldBe 1000000L // rho2
    // global mean 4e6; both arms adjust to it exactly
    all(out.map(_._4)) shouldBe 4000000L
    out.map(_._3) shouldBe Seq(2000000L, 6000000L) // raw means differ
    val flat = Seq(("a", 2L, 9L), ("b", 2L, 4L)).toDF("g", "x", "y")
    val ex = intercept[Exception] {
      Analytics.cupedAdjust(flat, "g", col("x"), col("y")).collect()
    }
    ex.getMessage should include("zero variance")
  }

  test("cupedAdjust / minDetectableEffect: the n-scaled moments past " +
      "the exact-long envelope fail fast instead of wrapping") {
    // |sx| past sqrt(Long.MAX): (sx)^2 would wrap silently (the
    // per-row sums themselves stay exact: 3 * 2.56e18 < Long.MAX)
    val big = Seq(("a", 1600000000L, 1L), ("a", 1600000000L, 2L),
      ("b", 1600000000L, 3L)).toDF("g", "x", "y")
    intercept[Exception] {
      Analytics.cupedAdjust(big, "g", col("x"), col("y")).collect()
    }.getMessage should include("exact-long envelope")
    // svv past Long.MAX/n: n*svv would wrap silently (svv = 8.82e18
    // is itself still exact)
    val bigv = Seq(("a", 2100000000L), ("a", -2100000000L),
      ("b", 1L), ("b", 2L)).toDF("g", "v")
    intercept[Exception] {
      Analytics.minDetectableEffect(bigv, "g", col("v")).collect()
    }.getMessage should include("exact-long envelope")
  }

  test("mcnemarTest: only discordant cells enter; zero discordance is " +
      "NULL, textbook counts hand-checked") {
    // truth always 'x'; A correct on 8, B correct on 5; overlap 4:
    // b = A-only = 4, c = B-only = 1, chi2 = (|4-1|-1)^2/5 = 0.8
    def row(ca: Boolean, cb: Boolean) =
      (if (ca) "x" else "w", if (cb) "x" else "w", "x")
    val rows = Seq.fill(4)(row(true, true)) ++ Seq.fill(4)(row(true, false)) ++
      Seq.fill(1)(row(false, true)) ++ Seq.fill(2)(row(false, false))
    val out = Analytics.mcnemarTest(rows.toDF("a", "b", "t"),
        col("a"), col("b"), col("t"))
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
    out shouldBe ((11L, 4L, 4L, 1L, 2L, Some(800000L)))
    // perfect agreement: the test is undefined
    val agree = Seq.fill(3)(row(true, true)).toDF("a", "b", "t")
    Analytics.mcnemarTest(agree, col("a"), col("b"), col("t"))
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
      ._6 shouldBe None
  }

  test("minDetectableEffect: matches the direct two-arm formula; " +
      "wrong arm count and tiny arms fail fast") {
    val df = (Seq.fill(50)(("a", 10L)) ++ Seq.fill(50)(("a", 20L)) ++
      Seq.fill(50)(("b", 12L)) ++ Seq.fill(50)(("b", 22L))).toDF("g", "v")
    val out = Analytics.minDetectableEffect(df, "g", col("v"))
      .as[(String, String, Long, Long, Long, Long, Long, Option[Long])]
      .head()
    out._1 shouldBe "a"
    out._5 shouldBe 15000000L
    // s2 per arm = (100*25000 - 1500^2)/(100*99) = 25.2525...
    val s2a = (100.0 * 25000 - 1500.0 * 1500) / (100.0 * 99)
    val s2b = (100.0 * 31400 - 1700.0 * 1700) / (100.0 * 99)
    out._7 shouldBe math.round(2.8016 * math.sqrt(s2a / 100 + s2b / 100) * 1e6)
    out._8.get shouldBe out._7 * 1000000L / 15000000L
    intercept[Exception] {
      Analytics.minDetectableEffect(
        df.withColumn("g", lit("one")), "g", col("v")).collect()
    }.getMessage should include("exactly two arms")
    intercept[Exception] {
      Analytics.minDetectableEffect(
        Seq(("a", 1L), ("b", 2L), ("b", 3L)).toDF("g", "v"),
        "g", col("v")).collect()
    }.getMessage should include(">= 2 rows")
  }

  test("temperatureMixture: sqrt-share targets lift the tail, the " +
      "bottleneck source keeps 100%, expected keeps never exceed rows") {
    // 90/9/1 split: raw shares 900k/90k/10k ppm; sqrt lifts c hard
    val df = (Seq.fill(900)("a") ++ Seq.fill(90)("b") ++ Seq.fill(10)("c"))
      .toDF("source")
    val out = Curation.temperatureMixture(df, "source")
      .orderBy(col("source"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    out.map(_._3) shouldBe Seq(900000L, 90000L, 10000L)
    // tempered targets: sqrt(0.9):sqrt(0.09):sqrt(0.01) ~ .9487:.3:.1
    val t = out.map(_._4)
    t.sum should be <= 1000000L
    t.sum should be > 999990L
    (t(2).toDouble / out(2)._3) should be > (t(0).toDouble / out(0)._3)
    // the binding source keeps everything; all keeps bounded by rows
    out.map(_._5).max shouldBe 1000000L
    all(out.map(r => r._6 <= r._2)) shouldBe true
    // achieved mixture matches targets: keep_i/total_keep ~ target_i
    val keeps = out.map(_._6.toDouble)
    val tot = keeps.sum
    out.indices.foreach { i =>
      math.abs(keeps(i) / tot - t(i) / 1e6) should be < 0.01
    }
  }
}
