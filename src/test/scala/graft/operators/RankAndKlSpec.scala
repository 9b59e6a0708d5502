package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mann–Whitney U and KL divergence: hand-ranked and hand-summed
  * cases, tie midranks, disjoint-support NULL, and edges. */
class RankAndKlSpec extends SparkSpec {
  import spark.implicits._

  private def u(rows: Seq[(String, Long)]) =
    Analytics.mannWhitneyU(rows.toDF("g", "v"), "g", col("v"), "A", "B")
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("complete separation: A below B gives U_A = 0, AUC 0") {
    u(Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))) shouldBe
      ((2L, 2L, 0L, 8L, 0L))
  }

  test("tie midranks: A={1,1}, B={1} gives 2U_A = 2, AUC exactly 1/2") {
    // one class m=3, midrank 2: 2R_A = 2*4 = 8; 2U_A = 8 - 6 = 2;
    // AUC = 2e6/(2*2*1) = 500000.
    u(Seq(("A", 1L), ("A", 1L), ("B", 1L))) shouldBe
      ((2L, 1L, 2L, 2L, 500000L))
  }

  test("U_A + U_B = 2 * n_a * n_b always (here with mixed ties)") {
    val r = u(Seq(("A", 5L), ("A", 7L), ("A", 7L), ("B", 7L), ("B", 9L)))
    r._3 + r._4 shouldBe 2L * r._1 * r._2
  }

  test("empty B slice: U_A = 0 against nothing, AUC 0") {
    u(Seq(("A", 1L), ("A", 9L))) shouldBe ((2L, 0L, 0L, 0L, 0L))
  }

  private def kl(rows: Seq[(String, String)]) =
    Analytics.klDivergence(rows.toDF("cat", "g"), "cat", "g", "P", "Q")
      .select(col("n_categories"), col("n_a_only"), col("n_rows_a"),
        col("n_rows_b"), col("kl_micro"))
      .collect().head

  test("identical mixes diverge by exactly zero") {
    val rows = Seq.fill(6)(("x", "P")) ++ Seq.fill(2)(("y", "P")) ++
      Seq.fill(3)(("x", "Q")) ++ Seq.fill(1)(("y", "Q"))
    val r = kl(rows)
    (r.getLong(0), r.getLong(1), r.getLong(4)) shouldBe ((2L, 0L, 0L))
  }

  test("hand case: P=(3/4,1/4) vs Q=(1/4,3/4)") {
    // KL = 0.75*ln(3) + 0.25*ln(1/3) = 0.5*ln(3) = 0.549306...
    // per-category micro: round(0.75*ln(3)*1e6)=823959,
    // round(0.25*ln(1/3)*1e6)=-274653; sum 549306.
    val rows = Seq.fill(3)(("x", "P")) ++ Seq.fill(1)(("y", "P")) ++
      Seq.fill(1)(("x", "Q")) ++ Seq.fill(3)(("y", "Q"))
    kl(rows).getLong(4) shouldBe 549306L
  }

  test("P mass on a category Q never saw: NULL, counted, not smoothed") {
    val rows = Seq.fill(2)(("x", "P")) ++ Seq.fill(2)(("z", "P")) ++
      Seq.fill(4)(("x", "Q"))
    val r = kl(rows)
    (r.getLong(1), r.isNullAt(4)) shouldBe ((1L, true))
  }

  test("Q-only categories cost nothing (p = 0 terms vanish)") {
    val rows = Seq.fill(4)(("x", "P")) ++
      Seq.fill(2)(("x", "Q")) ++ Seq.fill(2)(("z", "Q"))
    // P=(1.0) on x; q_x = 1/2: KL = ln(2) -> 693147 micro.
    kl(rows).getLong(4) shouldBe 693147L
  }
}
