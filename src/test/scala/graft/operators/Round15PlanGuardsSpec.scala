package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape locks for the round-15 operators — the properties that
  * make them 100 TB-shaped, asserted on the optimized plan so a
  * refactor can't silently regress them. */
class Round15PlanGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("msprtMonitor: ONE shuffle to the day rollup, then windows " +
      "over the days-sized relation — no join, no cartesian") {
    val df = Seq(("2024-03-01", 0L, 1L)).toDF("d", "arm", "conv")
      .select(col("d").cast("date").as("d"), col("arm"), col("conv"))
    val plan = planOf(Analytics.msprtMonitor(df, col("d"), col("arm"),
      col("conv")))
    plan should not include "Join"
    plan should not include "CartesianProduct"
    // the cumulative sums and the running max ride windows over the
    // post-aggregate relation, never over the unit-level input
    plan should include("Window")
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) should
      be <= 1
  }

  test("ratioMetricCi is one arm rollup with map-only math after — " +
      "no window, no join, no second shuffle") {
    val df = Seq(("a", 2L, 1L), ("a", 3L, 1L)).toDF("g", "x", "y")
    val plan = planOf(Analytics.ratioMetricCi(df, "g", col("x"), col("y")))
    plan should not include "Join"
    plan should not include "Window"
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) should
      be <= 1
  }

  test("srmCheck collapses to a single global aggregate — no shuffle " +
      "beyond the final single-partition exchange, no window") {
    val df = Seq(0L, 1L).toDF("arm")
    val plan = planOf(Analytics.srmCheck(df, col("arm")))
    plan should not include "Join"
    plan should not include "Window"
    plan should not include "Exchange hashpartitioning"
  }

  test("JPEG extraction stays partition-local: no shuffle anywhere — " +
      "media bytes never cross the wire") {
    val docs = Seq((1L, "a jpeg is worth a thousand huffman codes"))
      .toDF("doc_id", "text")
    val plan = planOf(Multimodal.extractJpegFeatures(spark,
      Multimodal.attachJpeg(spark, docs)).toDF())
    plan should not include "Exchange"
    plan should not include "Join"
  }
}
