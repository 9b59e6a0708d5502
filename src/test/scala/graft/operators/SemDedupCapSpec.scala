package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The semDedup cell-cap guard: a planted hot cell (every vector in
  * one cell, 12× over cap) must produce bounded sub-cells with an
  * explicit audit row, and capping must only ever UNDER-dedup (capped
  * survivors ⊇ uncapped survivors; with no cell over cap the two are
  * identical) — the semantic mirror of lshCandidatePairs' bucketCap
  * REFINES-never-drops contract. */
class SemDedupCapSpec extends SparkSpec {
  import spark.implicits._

  private def seeds(e: org.apache.spark.sql.DataFrame) =
    e.filter($"vec_id" >= 20 && $"vec_id" < 36)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)

  test("planted hot cell: split is bounded and audited; min-id per sub-cell survives") {
    // 120 identical vectors, one centroid -> one cell 12x over cap=10.
    val hot = (0L until 120L).map(i => (i, Array(1.0f, 0.0f, 0.0f)))
      .toDF("id", "vec")
    val cen = Seq((7L, Array(1.0f, 0.0f, 0.0f)))

    val audit = Similarity.semDedupCellAudit(hot, cen, cellCap = 10)
      .as[(Long, Long, Long, Boolean)].collect()
    audit shouldBe Array((7L, 120L, 12L, true))

    // id % 12 partitions 0..119 into 12 sub-cells of exactly 10; all
    // pairs within a sub-cell are cos=1 dups, so exactly the min id of
    // each residue class (0..11) survives — 12 survivors instead of
    // the uncapped 1, never more than cap rows per join task.
    val kept = Similarity.semDedup(hot, cen, minCos = 0.9, cellCap = 10)
      .select($"id").as[Long].collect().toSet
    kept shouldBe (0L until 12L).toSet

    val keptUncapped = Similarity.semDedup(hot, cen, minCos = 0.9)
      .select($"id").as[Long].collect().toSet
    keptUncapped shouldBe Set(0L)
    kept should contain allElementsOf keptUncapped
  }

  test("no cell over cap: capped result is exactly the uncapped result") {
    val e = graft.Tables.embeddings(spark, sfSmoke)
    val corpus = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val s = seeds(e)
    val uncapped = Similarity.semDedup(corpus, s, minCos = 0.4)
      .select($"id").as[Long].collect().toSet
    val capped = Similarity.semDedup(corpus, s, minCos = 0.4, cellCap = 100000)
      .select($"id").as[Long].collect().toSet
    capped shouldBe uncapped
  }

  test("vector-index maintenance: one tick equals a pinned-model rebuild; no-change is identity") {
    val e = graft.Tables.embeddings(spark, sfSmoke)
    val cen = seeds(e)
    val oldV = e.filter($"vec_id" % 10 =!= 3)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val newV = e.filter($"vec_id" % 10 =!= 7)
      .select($"vec_id".as("id"),
        when($"vec_id" % 10 === 5,
          concat(array(-element_at($"embedding", 1)),
            slice($"embedding", 2, 63)))
          .otherwise($"embedding").as("vec"))
    val scales = Similarity.sqTrain(oldV, "vec", dims = 64)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"cell", concat_ws(",", $"code").as("c"))
      .as[(Long, Long, String)].collect().toSet
    val index0 = Similarity.ivfSqIndexBuild(oldV, "id", "vec", cen, scales)
    val ticked = Similarity
      .ivfSqIndexMaintain(index0, oldV, newV, "id", "vec", cen, scales)
    rows(ticked) shouldBe
      rows(Similarity.ivfSqIndexBuild(newV, "id", "vec", cen, scales))
    // no-change tick: identical snapshots leave the index untouched
    rows(Similarity.ivfSqIndexMaintain(index0, oldV, oldV, "id", "vec",
      cen, scales)) shouldBe rows(index0)
  }

  test("capping only under-dedups: capped survivors are a superset") {
    val e = graft.Tables.embeddings(spark, sfSmoke)
    val corpus = e.select($"vec_id".as("id"), $"embedding".as("vec"))
    val s = seeds(e)
    val audit = Similarity.semDedupCellAudit(corpus, s, cellCap = 12)
    audit.filter($"capped").count() should be > 0L // splits actually occur
    val uncapped = Similarity.semDedup(corpus, s, minCos = 0.4)
      .select($"id").as[Long].collect().toSet
    val capped = Similarity.semDedup(corpus, s, minCos = 0.4, cellCap = 12)
      .select($"id").as[Long].collect().toSet
    capped should contain allElementsOf uncapped
  }
}
