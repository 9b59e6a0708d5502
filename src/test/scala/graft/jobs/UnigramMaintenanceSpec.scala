package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** UnigramMaintenance: the K209 persist-and-PIN contract extended to
  * the probability-carrying tokenizer (round-12 ask #5) — ticks never
  * retrain the piece table, maintained fertility counters equal a
  * from-scratch rebuild under the pinned pieces, and a no-change tick
  * is a no-op. Pinning is what makes the signed counters sound: a
  * retrain moves probabilities, so unchanged docs would re-segment
  * and the subtractions would not cancel. */
class UnigramMaintenanceSpec extends SparkSpec {

  private def docsAt(dropMod: Long, patch: Boolean): DataFrame =
    graft.Tables.documents(spark, sfSmoke)
      .filter(col("doc_id") % 10 =!= dropMod)
      .select(col("doc_id"),
        (if (patch)
          when(col("doc_id") % 10 === 3, concat(col("text"), lit(" vN")))
            .otherwise(col("text"))
        else col("text")).as("text"),
        col("lang"), col("source"))

  test("two ticks: pieces byte-identical to bootstrap; counters equal rebuild under the pinned table") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "unimaint")
      .toString
    val d0 = docsAt(3L, patch = false)
    val d1 = docsAt(7L, patch = false)
    val d2 = docsAt(7L, patch = true)

    val boot = UnigramMaintenance.rebuild(d0, "doc_id", "text")
    UnigramMaintenance.save(boot, dir)
    val bootPieces = UnigramMaintenance.piecesOf(
      UnigramMaintenance.load(spark, dir).get)

    UnigramMaintenance.save(UnigramMaintenance.nightly(
      UnigramMaintenance.load(spark, dir).get, d0, d1, "doc_id", "text"), dir)
    UnigramMaintenance.save(UnigramMaintenance.nightly(
      UnigramMaintenance.load(spark, dir).get, d1, d2, "doc_id", "text"), dir)

    val fin = UnigramMaintenance.load(spark, dir).get
    // PINNED: the piece table (probabilities included) never retrains
    UnigramMaintenance.piecesOf(fin) shouldBe bootPieces

    // maintained counters == rebuild(d2) under the PINNED pieces
    val want = UnigramMaintenance.card(UnigramMaintenance.UniState(
        fin.pieces,
        UnigramMaintenance.rebuildCountersUnder(d2, "doc_id", "text",
          bootPieces)))
      .orderBy("lang").collect()
    UnigramMaintenance.card(fin).orderBy("lang").collect() shouldBe want
  }

  test("a no-change tick leaves the counters untouched") {
    val d = docsAt(3L, patch = false)
    val st = UnigramMaintenance.rebuild(d, "doc_id", "text")
    val next = UnigramMaintenance.nightly(st, d, d, "doc_id", "text")
    UnigramMaintenance.card(next).orderBy("lang").collect() shouldBe
      UnigramMaintenance.card(st).orderBy("lang").collect()
  }
}
