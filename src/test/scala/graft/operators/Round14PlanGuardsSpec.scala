package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape locks for the round-14 operators — the properties that
  * make them 100 TB-shaped, asserted on the optimized plan so a
  * refactor can't silently regress them. */
class Round14PlanGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("propensityMatch matches via an EQUI hash join on the bucket key " +
      "— never a nested-loop over controls") {
    val df = (1L to 40L).map(i => (i % 2 == 0, i * 1000L, i)).toDF("t", "s", "y")
    val plan = planOf(Analytics.propensityMatch(df, col("t"), col("s"),
      col("y"), caliperPpm = 5000L))
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    (plan.contains("SortMergeJoin") || plan.contains("HashJoin")) shouldBe true
  }

  test("preferencePairs is ONE groupBy carrying struct extrema: no " +
      "window, no per-group sort, no candidate list") {
    val df = Seq(("p", 1L, 5L)).toDF("prompt", "id", "s")
    val plan = planOf(Curation.preferencePairs(df, "prompt", "id", col("s")))
    plan should not include "Window"
    plan should not include "collect_list"
  }

  test("bradleyTerry rounds read the CHECKPOINTED pair relation, not a " +
      "re-planned corpus rollup per round") {
    // a marker aggregate that would appear once per round if the
    // lineage were unbroken
    val m = Seq(("A", "B"), ("B", "A")).toDF("w", "l")
      .groupBy(col("w"), col("l")).agg(count(lit(1)))
      .select(col("w"), col("l"))
    val plan = planOf(Analytics.bradleyTerry(m, "w", "l", iters = 4))
    plan should include("ExistingRDD")
  }

  test("cohenKappa: the chance term rides a broadcast; the corpus " +
      "shuffles once to the cell rollup") {
    val df = Seq(("x", "y")).toDF("a", "b")
    val plan = planOf(Analytics.cohenKappa(df, col("a"), col("b")))
    plan should include("BroadcastExchange")
    plan should not include "Window"
  }

  test("brierDecomposition groups on the derived bin only — no window, " +
      "no sort, totals broadcast") {
    val df = Seq((500000L, true)).toDF("p", "o")
    val plan = planOf(Analytics.brierDecomposition(df, col("p"), col("o"), 10))
    plan should include("BroadcastExchange")
    plan should not include "Window"
    plan.linesIterator.count(_.contains("Sort ")) shouldBe 0
  }

  test("temperatureMixture never touches corpus rows after the one " +
      "source rollup: everything downstream is sources-sized " +
      "broadcast arithmetic") {
    val df = Seq(("a"), ("b")).toDF("source")
    val plan = planOf(Curation.temperatureMixture(df, "source"))
    plan should include("BroadcastExchange")
    plan should not include "Window"
    plan should not include "CartesianProduct"
  }
}
