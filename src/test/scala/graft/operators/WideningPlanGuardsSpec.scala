package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape guards for the q250+ widening operators — the
  * properties that make them 100 TB-shaped, locked against refactors. */
class WideningPlanGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("associationRules: pairs come from a keyed join, never a cartesian") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("bk", "it")
    val plan = planOf(Analytics.associationRules(df, "bk", "it", 1L))
    plan should not include "CartesianProduct"
  }

  test("rfmSegments scores via histogram prefix sums — no ntile, no row_number") {
    val df = Seq((1L, java.sql.Date.valueOf("2024-01-02"), 10.0))
      .toDF("c", "d", "p")
    val plan = planOf(Analytics.rfmSegments(df, "c", "d",
      round(col("p") * 100)))
    plan should not include "ntile"
    plan should not include "row_number"
  }

  test("bloomPrefilteredJoin: the bloom probe filters BELOW the join") {
    // parquet-backed input so ConvertToLocalRelation can't pre-evaluate
    // the probe away (the kmeans-guard lesson)
    val fact = graft.Tables.lineitem(spark, sfSmoke)
      .select(col("l_orderkey").as("fk"), col("l_quantity").as("v"))
    val dim = graft.Tables.orders(spark, sfSmoke)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("dk"))
    val plan = planOf(
      SkewJoin.bloomPrefilteredJoin(fact, dim, "fk", "dk"))
    plan should include("graft_bloom_contains")
    // the probe must appear on the scan side of the final join: the
    // join node prints before (above) the filter in the top-down plan
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("graft_bloom_contains")
    joinIdx should be >= 0
    probeIdx should be > joinIdx
  }

  test("bootstrapCi: the explode feeds partial aggregation (one exchange of partials)") {
    val df = (1L to 50L).map(i => ("g", i, 1.0)).toDF("g", "id", "v")
    val plan = planOf(Analytics.bootstrapCi(df, "g", "id", col("v")))
    plan should include("Generate") // the B-way fan-out exists...
    // ...but partial aggregation combines it map-side before the
    // exchange: a partial_sum must print for the replicate sums
    plan should include("partial_sum")
  }
}
