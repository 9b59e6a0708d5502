package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TokenizerMaintenance: the persist-and-PIN contract (round-11 ask
  * #4) — ticks never retrain the merge table, the maintained fertility
  * counters equal a from-scratch rebuild under the pinned table, and a
  * no-change tick is a no-op. */
class TokenizerMaintenanceSpec extends SparkSpec {

  private def docsAt(dropMod: Long, patch: Boolean): DataFrame =
    graft.Tables.documents(spark, sfSmoke)
      .filter(col("doc_id") % 10 =!= dropMod)
      .select(col("doc_id"),
        (if (patch)
          when(col("doc_id") % 10 === 3, concat(col("text"), lit(" vN")))
            .otherwise(col("text"))
        else col("text")).as("text"),
        col("lang"), col("source"))

  test("two ticks: merges byte-identical to bootstrap; counters equal rebuild under the pinned table") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "tokmaint")
      .toString
    val d0 = docsAt(3L, patch = false)
    val d1 = docsAt(7L, patch = false)
    val d2 = docsAt(7L, patch = true)

    val boot = TokenizerMaintenance.rebuild(d0, "doc_id", "text")
    TokenizerMaintenance.save(boot, dir)
    val bootMerges = TokenizerMaintenance.mergesOf(
      TokenizerMaintenance.load(spark, dir).get)

    // tick 1: d0 -> d1; tick 2: d1 -> d2 (membership stable, text patch)
    TokenizerMaintenance.save(TokenizerMaintenance.nightly(
      TokenizerMaintenance.load(spark, dir).get, d0, d1, "doc_id", "text"), dir)
    TokenizerMaintenance.save(TokenizerMaintenance.nightly(
      TokenizerMaintenance.load(spark, dir).get, d1, d2, "doc_id", "text"), dir)

    val fin = TokenizerMaintenance.load(spark, dir).get
    // PINNED: the merge table never retrains across ticks
    TokenizerMaintenance.mergesOf(fin) shouldBe bootMerges

    // maintained counters == rebuild(d2) under the PINNED table
    val want = TokenizerMaintenance.card(TokenizerMaintenance.TokState(
        fin.merges,
        TokenizerMaintenance.rebuildCountersUnder(d2, "doc_id", "text", bootMerges)))
      .orderBy("lang").collect()
    TokenizerMaintenance.card(fin).orderBy("lang").collect() shouldBe want
  }

  test("a no-change tick leaves the counters untouched") {
    val d = docsAt(3L, patch = false)
    val st = TokenizerMaintenance.rebuild(d, "doc_id", "text")
    val next = TokenizerMaintenance.nightly(st, d, d, "doc_id", "text")
    TokenizerMaintenance.card(next).orderBy("lang").collect() shouldBe
      TokenizerMaintenance.card(st).orderBy("lang").collect()
  }
}
