package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape guards for the q199–q220 statistical/diagnostic family
  * — the properties that make them 100 TB-shaped, locked so a
  * refactor can't silently reintroduce a global funnel. */
class StatOpsPlanGuardsSpec extends SparkSpec {
  import spark.implicits._

  import org.apache.spark.sql.catalyst.plans.logical.{
    Aggregate, Filter, Join, LogicalPlan, Project, Window => LWindow}

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

  test("mannWhitneyU / spearman / ksDrift-style histogram windows only") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val li = graft.Tables.lineitem(spark, sfSmoke)
    Seq(
      Analytics.mannWhitneyU(docs, "lang", col("n_chars"), "en", "de"),
      Analytics.spearmanCorrelation(li, col("l_quantity"),
        round(col("l_extendedprice") * 100))
    ).foreach(unpartitionedOnlyOverAggregates)
  }

  test("pettitt / peakConcurrency: every window hash-partitions on its key") {
    val e = graft.Tables.events(spark, sfSmoke)
    val sess = e.groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    Seq(
      Analytics.pettittChangepoint(e, "event_type", "ts"),
      Analytics.peakConcurrency(sess, "st", "en")
    ).foreach { df =>
      df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      } shouldBe empty
    }
  }

  test("contributionAnalysis / klDivergence / chiSquare: no window at all") {
    val e = graft.Tables.events(spark, sfSmoke)
      .withColumn("slice",
        when(dayofweek(to_date(col("ts"))).between(2, 6), "wd")
          .otherwise("we"))
    Seq(
      Analytics.contributionAnalysis(e, "event_type",
        col("slice") === "wd", col("slice") === "we"),
      Analytics.klDivergence(e, "event_type", "slice", "wd", "we"),
      Analytics.chiSquareIndependence(e, "event_type", "slice")
    ).foreach { df =>
      df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      } shouldBe empty
    }
  }

  test("audienceOverlap: the self-join joins on the user key") {
    val e = graft.Tables.events(spark, sfSmoke)
    val joins = Analytics.audienceOverlap(e, "event_type", "user_id")
      .queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    // at least one join carries the user-key equality (the
    // intersection self-join); none is a pure cartesian of data rows
    // (the grid cross is marginal-sized and allowed).
    assert(joins.exists(_.condition.exists(_.sql.contains("u"))),
      s"no user-keyed join found:\n${joins.mkString("\n")}")
  }
}
