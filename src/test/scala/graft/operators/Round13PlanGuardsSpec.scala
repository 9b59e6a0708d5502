package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape locks for the round-13 operators — the properties that
  * make them 100 TB-shaped, asserted on the optimized plan so a
  * refactor can't silently regress them. */
class Round13PlanGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("blocklistGate is map-only: zero exchanges, blocklist folded as a literal") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = planOf(Curation.blocklistGate(docs, "doc_id", "text",
      Seq("bad"), 1000L))
    plan should not include "Exchange"
  }

  test("labelPropagation prices the edge relation ONCE: rounds scan the " +
      "checkpointed edges, not the producing plan") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
      // a marker aggregation that would explode the plan if re-derived
      // per round
      .groupBy(col("a"), col("b")).agg(count(lit(1))).select(col("a"), col("b"))
    val nodes = (1L to 3L).toDF("id")
    val seeds = Seq((1L, "x")).toDF("id", "label")
    val plan = planOf(Analytics.labelPropagation(edges, nodes, "id", seeds,
      iters = 3))
    // the checkpoint shows up as an RDD scan; the edge-producing
    // aggregate must NOT be re-planned per round (3 rounds -> it would
    // appear >= 3 times)
    plan should include("ExistingRDD")
    "HashAggregate".r.findAllIn(plan).size should be < 30
  }

  test("reliabilityDiagram: min/max rides a broadcast, one rollup keyed by bin") {
    val df = (0L to 9L).map(s => (s, s >= 5L)).toDF("s", "y")
    val plan = planOf(Analytics.reliabilityDiagram(df, col("s"), col("y"), 4))
    plan should include("BroadcastExchange")
    // grouping happens on the derived bin only — no global window/sort
    plan should not include "Window"
    plan.linesIterator.count(_.contains("Sort ")) shouldBe 0
  }

  test("positionAttribution materializes no per-conversion touch list: " +
      "running windows only, partitioned by user") {
    val events = Seq((1L, new java.sql.Timestamp(1000L), "signup"))
      .toDF("user_id", "ts", "event_type")
    val plan = planOf(Analytics.positionAttribution(events, "user_id", "ts",
      "event_type", "purchase", Seq("signup", "view")))
    plan should include("Window")
    plan should not include "collect_list"
  }

  test("conformalThreshold windows partition by group (no single-partition " +
      "global sort)") {
    val df = (1L to 10L).map(i => ("g", i, i)).toDF("grp", "id", "s")
    val out = Curation.conformalThreshold(df, "grp", "id", col("s"), 500000L)
    val plan = planOf(out)
    plan should include("Window")
    // every window spec carries the group key in its partition spec
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach {
      l => l should include("g#")
    }
  }

  test("snapshot-table read plans a plain parquet scan over manifest paths") {
    val t = new graft.store.SnapshotTable(
      graft.util.TmpDirs.fresh("snaptab_plan"))
    t.commitDays(spark, Seq(("2024-02-01", 1L)).toDF("day", "event_id"))
    val plan = planOf(t.read(spark))
    plan should include("FileScan parquet")
    plan should not include "Exchange"
  }
}
