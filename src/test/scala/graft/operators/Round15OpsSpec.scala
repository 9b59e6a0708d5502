package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 operators: the mSPRT sequential monitor hand-checked
  * against the closed-form mixture likelihood ratio, the always-valid
  * monotonicity contract, and the degenerate-day semantics. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def units(rows: (String, Int, Int)*) =
    rows.toDF("d", "arm", "conv").select(col("d").cast("date").as("d"),
      col("arm").cast("long").as("arm"), col("conv").cast("long").as("conv"))

  /** The operator's stated IEEE chain, replicated literally. */
  private def llrMicro(na: Long, xa: Long, nb: Long, xb: Long,
      t2: Double): Long = {
    val pp = (xa + xb).toDouble / (na + nb).toDouble
    val v = pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble)
    val d = xa.toDouble / na.toDouble - xb.toDouble / nb.toDouble
    math.round((0.5 * math.log(v / (v + t2)) +
      d * d * t2 / (2.0 * v * (v + t2))) * 1000000.0)
  }

  test("mSPRT: cumulative counts, the mixture log-LR, and the " +
      "always-valid p match the hand formula day by day") {
    // day 1: A 4/10 vs B 1/10; day 2 adds A 5/10 vs B 1/10 -> the
    // evidence grows and the always-valid p falls monotonically
    val day1 = (1 to 10).map(i => ("2024-03-01", 0, if (i <= 4) 1 else 0)) ++
      (1 to 10).map(i => ("2024-03-01", 1, if (i <= 1) 1 else 0))
    val day2 = (1 to 10).map(i => ("2024-03-02", 0, if (i <= 5) 1 else 0)) ++
      (1 to 10).map(i => ("2024-03-02", 1, if (i <= 1) 1 else 0))
    val out = Analytics.msprtMonitor(units((day1 ++ day2): _*),
        col("d"), col("arm"), col("conv"), tau2Micro = 10000L)
      .orderBy(col("day"))
      .as[(java.sql.Date, Long, Long, Long, Long, Option[Long],
        Option[Long], Long, Boolean)]
      .collect().toSeq
    out.map(r => (r._2, r._3, r._4, r._5)) shouldBe
      Seq((10L, 4L, 10L, 1L), (20L, 9L, 20L, 2L))
    val t2 = 10000.0 / 1000000.0
    out(0)._6.get shouldBe llrMicro(10, 4, 10, 1, t2)
    out(1)._6.get shouldBe llrMicro(20, 9, 20, 2, t2)
    // running max + p = exp(-max/1e6), clamped to 1
    out.foreach { r =>
      r._7.get should be >= r._6.get
      val want = math.min(1000000L,
        math.round(math.exp(-r._7.get / 1000000.0) * 1000000.0))
      r._8 shouldBe want
    }
    // the whole point: p never increases as days accumulate
    out.map(_._8).sliding(2).foreach { case Seq(a, b) => b should be <= a }
    out(1)._9 shouldBe (out(1)._8 <= 50000L)
  }

  test("mSPRT: days with an undefined statistic (empty arm, zero or " +
      "total pooled conversions) carry NULL and p = 1") {
    // day 1 has only arm 0; day 2 has both arms but zero conversions
    val out = Analytics.msprtMonitor(
        units(("2024-03-01", 0, 0), ("2024-03-01", 0, 0),
          ("2024-03-02", 1, 0), ("2024-03-02", 0, 0)),
        col("d"), col("arm"), col("conv"))
      .orderBy(col("day"))
      .as[(java.sql.Date, Long, Long, Long, Long, Option[Long],
        Option[Long], Long, Boolean)]
      .collect().toSeq
    out.map(_._6) shouldBe Seq(None, None)
    out.map(_._8) shouldBe Seq(1000000L, 1000000L)
    out.map(_._9) shouldBe Seq(false, false)
    intercept[IllegalArgumentException] {
      Analytics.msprtMonitor(units(("2024-03-01", 0, 0)),
        col("d"), col("arm"), col("conv"), tau2Micro = 0L)
    }.getMessage should include("mixture variance")
  }

  test("ratioMetricCi: hand-checked delta-method se, exact ratio, " +
      "degenerate arms fail fast") {
    // arm a: (x,y) = (2,1),(4,1),(4,2) -> R = 4/10; hand moments:
    // n=3, sx=10, sy=4, sxx=36, sxy=14, syy=6
    val df = Seq(("a", 2L, 1L), ("a", 4L, 1L), ("a", 4L, 2L),
      ("b", 5L, 0L), ("b", 5L, 0L)).toDF("g", "x", "y")
    val out = Analytics.ratioMetricCi(df, "g", col("x"), col("y"))
      .orderBy(col("arm"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    out(0)._5 shouldBe 400000L // 4*1e6 div 10
    val r = 4.0 / 10.0
    val sxx = (3.0 * 36 - 100) / (3 * 2)
    val sxy = (3.0 * 14 - 40) / (3 * 2)
    val syy = (3.0 * 6 - 16) / (3 * 2)
    val se = math.sqrt((syy - 2 * r * sxy + r * r * sxx) /
      (3.0 * (10.0 / 3) * (10.0 / 3)))
    out(0)._6 shouldBe math.round(se * 1e6)
    out(0)._7 shouldBe math.round(400000.0 - 1.96 * out(0)._6)
    out(0)._8 shouldBe math.round(400000.0 + 1.96 * out(0)._6)
    // zero-conversion arm: ratio 0, se 0 (y constant 0 given x const)
    out(1)._5 shouldBe 0L
    intercept[Exception] {
      Analytics.ratioMetricCi(Seq(("a", 0L, 0L), ("a", 0L, 1L))
        .toDF("g", "x", "y"), "g", col("x"), col("y")).collect()
    }.getMessage should include("positive denominator")
  }

  test("srmCheck: a clean 50/50 split passes, a broken assignment " +
      "trips the flag, the chi-square matches the hand value") {
    val clean = (1 to 500).map(_ => 0L) ++ (1 to 520).map(_ => 1L)
    val c = Analytics.srmCheck(clean.toDF("arm"), col("arm"))
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    c._1 shouldBe 500L
    c._2 shouldBe 520L
    // chi2 = (500 - 510)^2 / (1020 * 0.25) = 100/255 = 0.392156...
    c._5 shouldBe math.round(
      (500.0 - 1020 * 0.5) * (500.0 - 1020 * 0.5) /
        (1020 * 0.5 * 0.5) * 1e6)
    c._6 shouldBe false
    // 600/400: chi2 = 100^2/250 = 40 >> 3.84 -> SRM
    val broken = (1 to 600).map(_ => 0L) ++ (1 to 400).map(_ => 1L)
    val b = Analytics.srmCheck(broken.toDF("arm"), col("arm"))
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    b._5 shouldBe 40000000L
    b._6 shouldBe true
    intercept[IllegalArgumentException] {
      Analytics.srmCheck(clean.toDF("arm"), col("arm"), expectedAPpm = 0L)
    }.getMessage should include("expected share")
  }

  test("mSPRT: a null effect keeps p high while a planted lift " +
      "drives it to rejection (the peeking guarantee is usable)") {
    // 20 days x 200 units/arm with a 15-point lift: p must cross 5%
    val lifted = (1 to 20).flatMap { d =>
      val day = f"2024-03-$d%02d"
      (1 to 200).map(i => (day, 0, if (i <= 60) 1 else 0)) ++
        (1 to 200).map(i => (day, 1, if (i <= 30) 1 else 0))
    }
    val rej = Analytics.msprtMonitor(units(lifted: _*),
        col("d"), col("arm"), col("conv"))
      .orderBy(col("day")).select(col("reject_at_5pct"))
      .as[Boolean].collect()
    rej.last shouldBe true
    // identical arms: the monitor never rejects on 20 peeks
    val nullEff = (1 to 20).flatMap { d =>
      val day = f"2024-03-$d%02d"
      (1 to 200).map(i => (day, 0, if (i <= 40) 1 else 0)) ++
        (1 to 200).map(i => (day, 1, if (i <= 40) 1 else 0))
    }
    Analytics.msprtMonitor(units(nullEff: _*),
        col("d"), col("arm"), col("conv"))
      .select(max(when(col("reject_at_5pct"), 1L)).as("any"))
      .as[Option[Long]].head() shouldBe None
  }
}
