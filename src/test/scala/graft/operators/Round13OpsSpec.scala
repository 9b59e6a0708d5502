package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the round-13 widening operators: label
  * propagation, blocklist gate, reliability diagram, U-shaped
  * attribution, conformal threshold. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("labelPropagation: seeds clamp, majority ties break to smaller label, " +
      "unreached stay null, reach grows per round") {
    // path 1-2-3-4-5; 6 isolated; seeds: 1->x, 5->y, and 3 has
    // neighbors 2,4 (unlabeled round 1)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val nodes = (1L to 6L).toDF("id")
    val seeds = Seq((1L, "x"), (5L, "y")).toDF("id", "label")
    def run(iters: Int) =
      Analytics.labelPropagation(edges, nodes, "id", seeds, iters)
        .orderBy(col("id"))
        .as[(Long, Option[String], Boolean)].collect().toSeq
    // 1 round: only direct neighbors of seeds labeled
    run(1) shouldBe Seq((1L, Some("x"), true), (2L, Some("x"), false),
      (3L, None, false), (4L, Some("y"), false), (5L, Some("y"), true),
      (6L, None, false))
    // 2 rounds: node 3 sees x (via 2) and y (via 4) — tie, count 1 vs 1,
    // smaller label wins
    run(2).find(_._1 == 3L).get._2 shouldBe Some("x")
    // 6 never reached
    run(3).find(_._1 == 6L).get._2 shouldBe None
    // seeds never overwritten even when neighbors disagree
    run(3).find(_._1 == 5L).get._2 shouldBe Some("y")
  }

  test("blocklistGate: exact density, gate, empty doc passes") {
    val docs = Seq(
      (1L, "Bad word here bad again"), // 'bad' x2 of 5 tokens
      (2L, "all clean tokens"),
      (3L, "")).toDF("doc_id", "text")
    val out = Curation.blocklistGate(docs, "doc_id", "text",
        Seq("BAD"), maxHitPpm = 300000L)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long, Boolean)].collect()
    out(0) shouldBe ((1L, 5L, 2L, 400000L, true))
    out(1) shouldBe ((2L, 3L, 0L, 0L, false))
    out(2) shouldBe ((3L, 0L, 0L, 0L, false))
  }

  test("reliabilityDiagram: q137 binning, exact mean + pos rate") {
    // scores 0..9 with label = score >= 5; 2 bins over [0,9]:
    // bin = s*2 div 10 -> 0..4 bin0, 5..9 bin1
    val df = (0L to 9L).map(s => (s, s >= 5L)).toDF("s", "y")
    val out = Analytics.reliabilityDiagram(df, col("s"), col("y"), nBins = 2)
      .orderBy(col("bin")).as[(Long, Long, Long, Long)].collect()
    out(0) shouldBe ((0L, 5L, 2L, 0L))       // mean 10/5=2, 0% positive
    out(1) shouldBe ((1L, 5L, 7L, 1000000L)) // mean 35/5=7, 100%
    // degenerate: all-equal scores land in bin 0
    val eq = Seq((7L, true), (7L, false)).toDF("s", "y")
    Analytics.reliabilityDiagram(eq, col("s"), col("y"), nBins = 4)
      .select(col("bin")).as[Long].collect() shouldBe Array(0L)
  }

  test("U-shaped attribution: hand-computed credits sum to 1e6 per conversion") {
    def ev(u: Long, t: Long, typ: String) =
      (u, new java.sql.Timestamp(t * 1000L), typ)
    // user 1: a b b a purchase -> k=4: first a 400000+rem(0), last a
    //   400000, middles: b x2 at 100000 each
    // user 2: a purchase -> k=1: a 1000000
    // user 3: purchase -> none 1000000
    // user 4: b a purchase -> k=2: b 500000, a 500000
    val events = Seq(
      ev(1, 10, "signup"), ev(1, 20, "view"), ev(1, 30, "view"),
      ev(1, 40, "signup"), ev(1, 50, "purchase"),
      ev(2, 10, "signup"), ev(2, 20, "purchase"),
      ev(3, 10, "purchase"),
      ev(4, 10, "view"), ev(4, 20, "signup"), ev(4, 30, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.positionAttribution(events, "user_id", "ts",
        "event_type", "purchase", Seq("signup", "view", "click"))
      .orderBy(col("channel"))
      .as[(String, Long, Long, Long)].collect()
    // signup: u1 800000 + u2 1000000 + u4 500000; touches 2+1+1
    // view:   u1 200000 + u4 500000; touches 2+1
    // none:   u3 1000000
    out.toSeq shouldBe Seq(
      ("none", 1L, 0L, 1000000L),
      ("signup", 3L, 4L, 2300000L),
      ("view", 2L, 3L, 700000L))
    // total mass = 4 conversions x 1e6
    out.map(_._4).sum shouldBe 4000000L
  }

  test("U-shaped attribution: middle remainder pins to the first touch") {
    // k=5 with 3 middles: m = 200000 div 3 = 66666, rem = 2
    def ev(u: Long, t: Long, typ: String) =
      (u, new java.sql.Timestamp(t * 1000L), typ)
    val events = Seq(
      ev(1, 10, "signup"), ev(1, 20, "view"), ev(1, 30, "view"),
      ev(1, 40, "view"), ev(1, 50, "click"), ev(1, 60, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.positionAttribution(events, "user_id", "ts",
        "event_type", "purchase", Seq("signup", "view", "click"))
      .orderBy(col("channel")).as[(String, Long, Long, Long)].collect()
    out.toSeq shouldBe Seq(
      ("click", 1L, 1L, 400000L),
      ("signup", 1L, 1L, 400002L), // 400000 + rem 2
      ("view", 1L, 3L, 199998L))   // 3 x 66666
    out.map(_._4).sum shouldBe 1000000L
  }

  test("psiDrift: identical slices read zero, shifts read positive, " +
      "out-of-range scores clamp to edge bins") {
    val same = (1L to 100L).flatMap(s => Seq(("base", s), ("cur", s)))
      .toDF("snap", "s")
    val zero = Analytics.psiDrift(same, "snap", col("s"), "base", "cur", 5)
      .agg(sum(col("term_micro"))).as[Long].head()
    zero shouldBe 0L
    // current shifted up by 60: mass moves to upper bins, PSI > 0,
    // and scores past the baseline max land in the LAST bin
    val shifted = (1L to 100L).map(s => ("base", s)) ++
      (1L to 100L).map(s => ("cur", s + 60L))
    val out = Analytics.psiDrift(shifted.toDF("snap", "s"), "snap",
        col("s"), "base", "cur", 5)
      .orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    out.map(_._6).sum should be > 0L
    out.map(_._1) shouldBe Array(0L, 1L, 2L, 3L, 4L)
    // bins cover 1..100 in fives of 20; cur = 61..160: bin 3 takes
    // 61..80 (20 rows), bin 4 takes 81..100 native (20) plus 101..160
    // CLAMPED (60) = 80 rows
    out(3)._3 shouldBe 20L
    out.last._3 shouldBe 80L
  }

  test("psiDrift: full bin space emitted (empty-in-both bins included, " +
      "smoothed shares sum to ~1e6) and an empty baseline fails fast") {
    // base mass only at the extremes: bins 1..3 are empty in BOTH
    // slices but must still appear, so the ppm columns cover the grid
    val sparse = Seq(("base", 1L), ("base", 100L), ("cur", 1L), ("cur", 100L))
      .toDF("snap", "s")
    val rows = Analytics.psiDrift(sparse, "snap", col("s"), "base", "cur", 5)
      .orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    rows.map(_._1) shouldBe Array(0L, 1L, 2L, 3L, 4L)
    rows.map(_._2) shouldBe Array(1L, 0L, 0L, 0L, 1L)
    // add-one smoothing over the FULL grid: shares sum to 1e6 up to
    // the per-bin floor division (< nBins ppm short)
    val pbSum = rows.map(_._4).sum
    pbSum should be <= 1000000L
    pbSum should be > (1000000L - 5L)
    // baseline key matches no rows -> in-plan fail-fast, not null bins
    val ex = intercept[Exception] {
      Analytics.psiDrift(sparse, "snap", col("s"), "nope", "cur", 5)
        .collect()
    }
    ex.getMessage should include("baseline slice has no rows")
  }

  test("trimmedMean: exact row-trim semantics incl. partial boundary class") {
    val df = (1L to 10L).map(v => ("g", v)).toDF("grp", "v")
    val out = Analytics.trimmedMean(df, "grp", col("v"), trimPpm = 200000L)
      .as[(String, Long, Long, Long, Long)].head()
    // k = 2: drop {1,2} and {9,10}; mean(3..8) = 33 div 6 = 5; plain 5
    out shouldBe (("g", 10L, 2L, 5L, 5L))
    // partial boundary: [1, 5, 5, 5, 5], 20% -> k = 1: drop the 1 and
    // ONE of the 5s; kept 3 x 5
    val part = Seq(1L, 5L, 5L, 5L, 5L).map(v => ("g", v)).toDF("grp", "v")
    Analytics.trimmedMean(part, "grp", col("v"), 200000L)
      .as[(String, Long, Long, Long, Long)].head() shouldBe
      (("g", 5L, 1L, 5L, 4L))
  }

  test("conformalThreshold: k-th largest calibration score, eval coverage") {
    // one group, scores = id so the order statistic is transparent
    val df = (1L to 40L).map(i => ("g", i, i)).toDF("grp", "id", "s")
    val out = Curation.conformalThreshold(df, "grp", "id", col("s"),
        keepPpm = 250000L)
      .as[(String, Long, Long, Long, Long, Long)].head()
    val (_, nCalib, threshold, nEval, nKept, keptPpm) = out
    nCalib + nEval shouldBe 40L
    // threshold = the k-th largest calibration score, k = n*0.25 (>=1)
    val k = math.max(1L, nCalib * 250000L / 1000000L)
    threshold should be >= 1L
    // kept = eval scores >= threshold; audit consistent
    keptPpm shouldBe nKept * 1000000L / math.max(nEval, 1L)
    // roughly a quarter of eval rows pass (scores uniform over ids)
    nKept should be <= (nEval / 2)
    k should be >= 1L
  }
}
