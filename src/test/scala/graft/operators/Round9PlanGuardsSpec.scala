package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape guards for the round-9 close operators — the properties
  * that make them 100 TB-shaped, locked so a refactor can't silently
  * reintroduce the slow encoding. */
class Round9PlanGuardsSpec extends SparkSpec {
  import spark.implicits._

  import org.apache.spark.sql.catalyst.plans.logical.{
    Aggregate, Filter, LogicalPlan, Project, Window => LWindow}

  @annotation.tailrec
  private def strip(n: LogicalPlan): LogicalPlan = n match {
    case Project(_, c) => strip(c)
    case Filter(_, c)  => strip(c)
    case w: LWindow    => strip(w.child)
    case other         => other
  }

  private def unpartitionedOnlyOverAggregates(
      df: org.apache.spark.sql.DataFrame): Unit = {
    val unpartitioned = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    unpartitioned.foreach { w =>
      assert(w.windowExpressions.forall(!_.sql.contains("row_number")),
        s"unpartitioned row_number (global sort funnel):\n$w")
      assert(strip(w.child).isInstanceOf[Aggregate],
        s"unpartitioned window not over an aggregate (histogram) child:\n$w")
    }
  }

  test("linearAttribution: every window is per-user (hash-partitioned)") {
    val e = graft.Tables.events(spark, sfSmoke)
    val df = Analytics.linearAttribution(e, "user_id", "ts", "event_type",
      "purchase", Seq("signup", "view", "click"))
    val unpartitioned = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    unpartitioned shouldBe empty
  }

  test("interEventGaps + weekdayAdjustedZscore: no unpartitioned windows") {
    val e = graft.Tables.events(spark, sfSmoke)
    Seq(
      Analytics.interEventGaps(e, "user_id", "ts", "event_type"),
      Analytics.weekdayAdjustedZscore(e, "ts", "event_type")
    ).foreach { df =>
      val unpartitioned = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      unpartitioned shouldBe empty
    }
  }

  test("equiDepth/Lorenz/keyGini: unpartitioned windows run only over histogram aggregates") {
    val e = graft.Tables.events(spark, sfSmoke)
    unpartitionedOnlyOverAggregates(
      Analytics.equiDepthHistogram(e, round(col("value") * 100), 8))
    unpartitionedOnlyOverAggregates(
      Analytics.lorenzCurve(e.select((col("user_id") % 1000).as("v")),
        col("v"), 10))
    unpartitionedOnlyOverAggregates(Analytics.keyGini(e, "user_id"))
  }

  test("editDistanceJoin: banded equi-join, never a nested-loop product") {
    val c = graft.Tables.customer(spark, sfSmoke)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val plan = TextDedup.editDistanceJoin(c, c, "id", "name")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("fkIntegrityAudit: the orphan check is an anti-join over key counts") {
    val li = graft.Tables.lineitem(spark, sfSmoke)
    val o = graft.Tables.orders(spark, sfSmoke)
    val plan = Analytics.fkIntegrityAudit(li, "l_orderkey", o, "o_orderkey",
      "t").queryExecution.executedPlan.toString
    plan should include("LeftAnti")
    plan should not include "CartesianProduct"
  }

  test("stickiness: the 28x fan-out applies to the user-day rollup, not raw events") {
    val e = graft.Tables.events(spark, sfSmoke)
    val plan = Analytics.stickiness(e, "user_id", "ts")
      .queryExecution.optimizedPlan.toString
    // the Generate (explode) must sit ABOVE a distinct Aggregate of
    // (u, day) — i.e. appear before the scan in the top-down print,
    // with an Aggregate between it and the relation
    val gen = plan.indexOf("Generate")
    val agg = plan.indexOf("Aggregate", gen)
    gen should be >= 0
    agg should be > gen
  }
}
