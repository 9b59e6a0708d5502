package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Project, RepartitionByExpression}

import graft.SparkSpec

/** Plan-shape guards for the round-10 additions (q236–q241), locked
  * the way StatOpsPlanGuardsSpec locked q199–q220: the unigram
  * encoder's Viterbi lattice must price DISTINCT WORDS (never one
  * lattice per occurrence — the 79.9 s → 4.0 s round-10 fix),
  * pivot/unpivot must stay a single data shuffle, and the HLL audit
  * must partial-aggregate map-side. */
class Round10PlanGuardsSpec extends SparkSpec {

  private def exec(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOf(plan: String, needle: String): Int =
    plan.sliding(needle.length).count(_ == needle)

  test("q237 encode: the Viterbi lattice prices the DISTINCT-WORDS relation, never per occurrence") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    // 2 EM rounds: the encode PLAN is independent of table content
    val table = UnigramLm.train(docs, "text", rounds = 2)
    val enc = UnigramLm.encode(docs, "doc_id", "text", table)
    // the lattice is the aggregate-over-sequence(1, length(word)) DP;
    // CollapseProject folds it into the distinct-words Aggregate, so
    // match ANY node carrying it and pin where it's allowed to live
    val latticeNodes = enc.queryExecution.optimizedPlan.collect {
      case n: LogicalPlan if n.expressions.exists { e =>
        val s = e.toString
        s.contains("sequence(1, length(") && s.contains("aggregate(")
      } => n
    }
    latticeNodes should not be empty
    latticeNodes.foreach { n =>
      // every node computing the DP outputs word-keyed columns only —
      // a doc_id in scope would mean one lattice per OCCURRENCE (the
      // 79.9 s shape), not one per distinct word
      assert(!n.output.map(_.name).contains("doc_id"),
        s"Viterbi lattice over a doc-sized relation:\n$n")
      // and it computes directly at/over the distinct-words Aggregate
      @annotation.tailrec
      def strip(p: LogicalPlan): LogicalPlan = p match {
        case Project(_, c) => strip(c)
        case Filter(_, c)  => strip(c)
        // the round-15 width spread (util.Spread) sits between the
        // lattice and the distinct-words aggregate; it is word-keyed
        // (no doc_id in scope — the output check above still binds),
        // so the lattice still prices distinct words
        case r: RepartitionByExpression => strip(r.child)
        case other         => other
      }
      assert(strip(n).isInstanceOf[Aggregate],
        s"Viterbi lattice not anchored at the distinct-words aggregate:\n$n")
    }
  }

  test("q239 pivot: the only DATA-sized shuffle is the (day, type) rollup; the pivot re-key moves rollup rows") {
    // Spark's canonical two-phase pivot: partial-agg(day, type) →
    // Exchange → final agg → pivot re-key Exchange on (day) — the
    // second exchange carries ≤ days×types rows, rollup-sized at any
    // corpus scale. Locked so a refactor can't reintroduce a
    // data-sized second pass.
    val plan = exec(graft.SparkEntry.queries("q239_pivot_daily")(
      spark, sfSmoke))
    countOf(plan, "Exchange hashpartitioning") shouldBe 2
    countOf(plan, "Exchange rangepartitioning") shouldBe 1 // orderBy(day)
  }

  test("q240 unpivot: map-only over the pivoted rollup — no shuffle beyond q239's") {
    val p239 = exec(graft.SparkEntry.queries("q239_pivot_daily")(
      spark, sfSmoke))
    val p240 = exec(graft.SparkEntry.queries("q240_unpivot_daily")(
      spark, sfSmoke))
    countOf(p240, "Exchange hashpartitioning") shouldBe
      countOf(p239, "Exchange hashpartitioning")
    // unpivot (Expand) itself adds no exchange of any kind
    countOf(p240, "Exchange") shouldBe countOf(p239, "Exchange")
  }

  test("q241 HLL: the sketch partial-aggregates map-side (mergeable state crosses the exchange)") {
    val plan = exec(graft.SparkEntry.queries("q241_hll_distinct")(
      spark, sfSmoke))
    plan should include("partial_approx_count_distinct")
  }

  test("q219 FD audit: one rollup per DETERMINANT, not per ordered pair") {
    // 4 columns = 12 ordered pairs; the per-pair shape re-scanned the
    // table 24 times (measured, sf0.1) and ReuseExchange cannot
    // collapse different grouping keys. The per-determinant shape
    // scans once per determinant (multi-distinct Expand may print the
    // scan twice per rollup in the formatted tree — cap at 2k, far
    // under the 2·k·(k−1) of the pairwise shape).
    val plan = exec(graft.SparkEntry.queries("q219_fd_audit")(
      spark, sfSmoke))
    countOf(plan, "Scan parquet") should be <= 8
  }
}
