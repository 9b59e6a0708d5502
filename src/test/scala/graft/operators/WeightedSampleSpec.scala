package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** weightedSample: deterministic A-ES — heavy weights dominate the
  * draw, zero weights never appear, repeated runs agree bit-for-bit,
  * and the plan is a bounded top-n (TakeOrdered), never a global
  * sort. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("heavy weights dominate; zero weights never sampled; deterministic") {
    // 100 heavy rows (weight 10^6) vs 100 light rows (weight 1): a
    // light row only beats the 20th heaviest cost when its u lands
    // within ~3e-6 of the top — with this fixed hash, effectively
    // never. The draw is fully deterministic, so assert the outcome.
    val rows = ((0 until 100).map(i => (s"h$i", 1000000L)) ++
      (0 until 100).map(i => (s"l$i", 1L)) ++
      Seq(("z1", 0L), ("z2", -5L))).toDF("id", "w")
    val out = Curation.weightedSample(rows, "id", col("w"), n = 20)
      .as[(String, Long, Long)].collect()
    out.length shouldBe 20
    out.map(_._1).count(_.startsWith("h")) should be >= 18
    out.map(_._1).intersect(Seq("z1", "z2")) shouldBe empty
    val again = Curation.weightedSample(rows, "id", col("w"), n = 20)
      .as[(String, Long, Long)].collect()
    again shouldBe out
  }

  test("n past the population returns every positive-weight row") {
    val rows = Seq(("a", 3L), ("b", 1L), ("c", 0L)).toDF("id", "w")
    val out = Curation.weightedSample(rows, "id", col("w"), n = 10)
      .as[(String, Long, Long)].collect()
    out.map(_._1).sorted shouldBe Array("a", "b")
  }

  test("plan: bounded TakeOrdered, no global Sort") {
    val d = graft.Tables.documents(spark, sfSmoke)
    val plan = Curation.weightedSample(d, "doc_id", col("n_chars"), 50)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }
}
