package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The nightly index-maintenance job: one O(changed) tick over a
  * two-snapshot fixture must land the EXACT state a full rebuild of
  * the new snapshot produces — band-key index, counted hash index,
  * and the sharded Bloom prefilter bit-for-bit. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val d = graft.Tables.documents(spark, sfSmoke)
    val oldSnap = d.filter($"doc_id" % 10 =!= 3).select($"doc_id", $"text")
    val newSnap = d.filter($"doc_id" % 10 =!= 7)
      .select($"doc_id",
        when($"doc_id" % 10 === 5, concat($"text", lit(" v2")))
          .otherwise($"text").as("text"))
    (oldSnap, newSnap)
  }

  private def bandSet(st: IndexMaintenance.IndexState) =
    st.bandIndex.as[(Long, Long, String)].collect().toSet
  private def hashSet(st: IndexMaintenance.IndexState) =
    st.hashIndex.as[(Long, Long)].collect().toSet
  private def bloomSet(st: IndexMaintenance.IndexState) =
    st.bloomShards.collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1).toSeq)).toSet

  test("one tick equals a full rebuild — bands, hash counts, bloom bits") {
    val (oldSnap, newSnap) = fixture()
    val st0 = IndexMaintenance.rebuild(oldSnap, "doc_id", "text", shards = 8)
    val tick = IndexMaintenance
      .nightly(st0, oldSnap, newSnap, "doc_id", "text", shards = 8)
    val full = IndexMaintenance.rebuild(newSnap, "doc_id", "text", shards = 8)

    bandSet(tick) shouldBe bandSet(full)
    hashSet(tick) shouldBe hashSet(full)
    bloomSet(tick) shouldBe bloomSet(full) // byte-identical sketches
  }

  test("no-change tick is an identity (and touches no shard)") {
    val (_, newSnap) = fixture()
    val st = IndexMaintenance.rebuild(newSnap, "doc_id", "text", shards = 8)
    val tick = IndexMaintenance
      .nightly(st, newSnap, newSnap, "doc_id", "text", shards = 8)
    bandSet(tick) shouldBe bandSet(st)
    hashSet(tick) shouldBe hashSet(st)
    bloomSet(tick) shouldBe bloomSet(st)
  }

  test("persisted job round-trip: save → load → tick → save ≡ rebuild of new snapshot") {
    import graft.util.TmpDirs
    val stateDir = TmpDirs.fresh("index_maint_state")
    val (oldSnap, newSnap) = fixture()
    IndexMaintenance.save(
      IndexMaintenance.rebuild(oldSnap, "doc_id", "text", shards = 8), stateDir)
    val loaded = IndexMaintenance.load(spark, stateDir)
    loaded.isDefined shouldBe true
    IndexMaintenance.save(
      IndexMaintenance.nightly(loaded.get, oldSnap, newSnap, "doc_id", "text",
        shards = 8),
      stateDir)
    val after = IndexMaintenance.load(spark, stateDir).get
    val full = IndexMaintenance.rebuild(newSnap, "doc_id", "text", shards = 8)
    bandSet(after) shouldBe bandSet(full)
    hashSet(after) shouldBe hashSet(full)
    bloomSet(after) shouldBe bloomSet(full)
  }

  test("maintained hash set drives the q71 bloom dedup identically to a rebuilt one") {
    val (oldSnap, newSnap) = fixture()
    val st0 = IndexMaintenance.rebuild(oldSnap, "doc_id", "text", shards = 8)
    val tick = IndexMaintenance
      .nightly(st0, oldSnap, newSnap, "doc_id", "text", shards = 8)
    val batch = graft.Tables.documents(spark, sfSmoke)
      .filter($"doc_id" % 10 === 7).select($"doc_id", $"text")
    val seen = tick.hashIndex.select($"h")
    val (survivors, _) = graft.operators.TextDedup
      .dedupAgainstIndexBloomSharded(batch, "text", "doc_id", seen, shards = 8)
    val seenFull = IndexMaintenance.rebuild(newSnap, "doc_id", "text",
      shards = 8).hashIndex.select($"h")
    val (survivorsFull, _) = graft.operators.TextDedup
      .dedupAgainstIndexBloomSharded(batch, "text", "doc_id", seenFull, shards = 8)
    survivors.select($"doc_id").as[Long].collect().toSet shouldBe
      survivorsFull.select($"doc_id").as[Long].collect().toSet
  }
}
