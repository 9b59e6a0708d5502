package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The label-reuse overloads: the realistic pipeline computes the
  * LSH cascade ONCE (nearDupLabels) and feeds keep-best dedup and the
  * leakage-safe split from the same labels — results must be
  * identical to the self-contained forms that re-derive the cascade
  * internally. */
class LabelReuseSpec extends SparkSpec {
  import spark.implicits._

  test("dedup once: keep-best and split from shared labels match self-contained") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val labels = TextDedup.nearDupLabels(docs, "doc_id", "text")
    labels.count() should be > 0L // the corpus actually has near-dups

    val keepViaLabels = TextDedup
      .nearDupDedupKeepBest(docs, "doc_id", "text", expr("length(text)"), labels)
      .select($"doc_id").as[Long].collect().toSet
    val keepSelf = TextDedup
      .nearDupDedupKeepBest(docs, "doc_id", "text", expr("length(text)"))
      .select($"doc_id").as[Long].collect().toSet
    keepViaLabels shouldBe keepSelf

    val splitViaLabels = TextDedup
      .leakageSafeSplit(docs, "doc_id", "text", 100000L, 100000L, labels)
      .select($"doc_id", $"root", $"split")
      .as[(Long, Long, String)].collect().toSet
    val splitSelf = TextDedup
      .leakageSafeSplit(docs, "doc_id", "text")
      .select($"doc_id", $"root", $"split")
      .as[(Long, Long, String)].collect().toSet
    splitViaLabels shouldBe splitSelf

    // and min-id dedup from the same labels (nearDupDedup's rule)
    val dedupSelf = TextDedup.nearDupDedup(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    val losers = labels.filter($"id" =!= $"label")
      .select($"id").as[Long].collect().toSet
    val viaLabels = TextDedup.exactDedup(docs, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet -- losers
    viaLabels shouldBe dedupSelf
  }

  test("export manifest: row-order invariant; any altered doc flips exactly its shard's digest") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    def rows(df: org.apache.spark.sql.DataFrame) = Curation
      .exportManifest(df, "doc_id", "text", nShards = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val base = rows(docs)
    // dense positions: max_pos == n_docs - 1 on every shard
    base.foreach { case (_, n, _, _, maxPos) => maxPos shouldBe n - 1 }
    // reordering/partitioning the input must not move the manifest
    rows(docs.repartition(13).orderBy($"text")) shouldBe base
    // tamper with ONE doc: its shard's digest flips, all others hold
    val tampered = rows(docs.withColumn("text",
      when($"doc_id" === 123L, concat($"text", lit(" tampered")))
        .otherwise($"text")))
    val changed = base.diff(tampered).map(_._1)
    changed.size shouldBe 1
    tampered.diff(base).map(_._1) shouldBe changed
  }
}
