package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape guards for the round-8 operators — the properties that
  * make them 100 TB-shaped, locked so a refactor can't silently
  * reintroduce the slow encoding. */
class NewOpPlanGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("covarianceStats has NO row-generating explode — the d² fan-out stays in the graft_gram buffer") {
    val e = graft.Tables.embeddings(spark, sfSmoke)
    val plan = planOf(Similarity.covarianceStats(e, "embedding", dims = 64))
    plan should include("graft_gram")
    // one Generate exists ABOVE the aggregate, unpacking the single
    // result row into 2,080 pair rows; what must NOT exist is a
    // Generate on the scan side BELOW the aggregate (pre-agg d²
    // fan-out). The plan prints top-down, so everything after the
    // LAST aggregate node is the scan side.
    plan.substring(plan.lastIndexOf("Aggregate")) should not include "Generate"
  }

  test("kmeans update stage: literal-centroid codegen argmin into a vecsum buffer — no Generate, no join") {
    // parquet-backed input so ConvertToLocalRelation can't pre-evaluate
    val e = graft.Tables.embeddings(spark, sfSmoke)
    val q = Similarity.kmeansQuantize(e, "vec_id", "embedding")
    val cents = Seq(0L -> Array.fill(64)(1000000L), 1L -> Array.fill(64)(1100000L))
    val upd = Similarity.kmeansAssign(q, cents)
      .groupBy(col("_b").getField("cell").as("cell"))
      .agg(call_function("graft_vecsum", col("qv"), lit(64)).as("b"))
    val plan = planOf(upd)
    plan should include("graft_sqdist_long")
    plan should include("graft_vecsum")
    // the d× per-row fan-out must stay inside the aggregate buffer:
    // no posexplode Generate anywhere in the update stage
    plan should not include "Generate"
    // centroids are plan literals, not a joined relation
    plan should not include "Join"
  }

  test("kmeansFit releases its cached quantized corpus (no lingering RDD blocks)") {
    val pts = (0L until 40L).map(i => (i, Array.tabulate(8)(d => (d + i % 4).toFloat / 10f)))
      .toDF("id", "vec")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Similarity.kmeansFit(pts, "id", "vec", k = 3, iters = 2).count()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    (after -- before) shouldBe empty
  }

  test("vocabCoverage's windows run over the count-class histogram, not the vocabulary") {
    val d = graft.Tables.documents(spark, sfSmoke)
    val plan = planOf(TextAnalysis.vocabCoverage(d, "text", Seq(16L, 256L)))
    // no rank/row_number window anywhere: coverage derives from the
    // histogram prefix (running sum over the tiny class relation)
    plan should not include "row_number"
    // every Generate in the plan is the token explode feeding the
    // vocab rollup (the subtree prints once per consumer); no
    // positional/posexplode pair encoding anywhere
    plan should not include "posexplode"
  }

  test("jlProject is map-only: no exchange introduced by the projection") {
    val e = graft.Tables.embeddings(spark, sfSmoke)
    val plan = planOf(Similarity.jlProject(e, "embedding", 64, 16, "p"))
    plan should not include "Exchange"
    plan should include("graft_array_dot")
  }

  // Order-statistic de-globalization: the value at a global position
  // depends only on its histogram class, so the exact p99/median come
  // from exclusive-prefix lookups over the bounded distinct-value
  // relation. The guard: every UNPARTITIONED window must run directly
  // over an Aggregate (histogram-sized state, the budgetSelect bound),
  // never over the raw key-count / converted-user relation — and
  // row_number never appears unpartitioned.
  import org.apache.spark.sql.catalyst.plans.logical.{
    Aggregate, Filter, LogicalPlan, Project, Window => LWindow}

  private def overHistogramOnly(df: org.apache.spark.sql.DataFrame): Unit = {
    @annotation.tailrec
    def strip(n: LogicalPlan): LogicalPlan = n match {
      case Project(_, c)    => strip(c)
      case Filter(_, c)     => strip(c)
      case w: LWindow       => strip(w.child) // stacked specs over the same base
      case other            => other
    }
    val unpartitioned = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    unpartitioned.foreach { w =>
      assert(w.windowExpressions.forall(!_.sql.contains("row_number")),
        s"unpartitioned row_number (global sort funnel):\n$w")
      assert(strip(w.child).isInstanceOf[Aggregate],
        s"unpartitioned window not over an aggregate (histogram) relation:\n$w")
    }
  }

  test("keySkewAudit: no single-partition window over the key-count relation") {
    val e = graft.Tables.events(spark, sfSmoke)
    overHistogramOnly(Analytics.keySkewAudit(e, "user_id", topK = 15))
  }

  test("conversionLatency: no single-partition window over the converted-user relation") {
    val e = graft.Tables.events(spark, sfSmoke)
    overHistogramOnly(Analytics.conversionLatency(
      e, "user_id", "ts", "event_type", "login", "purchase"))
  }
}
