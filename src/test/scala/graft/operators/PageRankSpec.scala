package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank: hand-iterated 3-node path, isolated-node base mass,
  * parallel-edge dedup, and determinism. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int) =
    Analytics.pageRank(edges.toDF("a", "b"), nodes.toDF("id"), "id", iters)
      .orderBy(col("id"))
      .as[(Long, Long, Long)].collect()

  test("hand-iterated path a-b-c plus isolated d, 2 rounds") {
    // r0 = 1e6 each. round 1: a<-425000, b<-1700000, c<-425000;
    // round 2: a = 150000 + 85*1850000 div 200 = 936250,
    //          b = 150000 + 2*(85*575000 div 100) = 1127500.
    val out = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L, 4L), iters = 2)
    out shouldBe Seq(
      (1L, 1L, 936250L), (2L, 2L, 1127500L), (3L, 1L, 936250L),
      (4L, 0L, 150000L))
  }

  test("parallel and reversed duplicate edges collapse") {
    val out = run(Seq((1L, 2L), (2L, 1L), (1L, 2L)), Seq(1L, 2L), iters = 1)
    // one undirected edge: each sends 850000, r = 150000 + 850000
    out shouldBe Seq((1L, 1L, 1000000L), (2L, 1L, 1000000L))
  }

  test("self-loops are dropped") {
    val out = run(Seq((1L, 1L), (1L, 2L)), Seq(1L, 2L), iters = 1)
    out.map(_._2) shouldBe Seq(1L, 1L)
  }

  test("deterministic across runs at depth 10 (checkpointed lineage)") {
    val edges = (1L to 40L).map(i => (i, i % 20 + 1))
    val nodes = (1L to 41L)
    run(edges, nodes, 10).toSeq shouldBe run(edges, nodes, 10).toSeq
  }
}
