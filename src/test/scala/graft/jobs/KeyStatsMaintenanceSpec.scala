package graft.jobs

import graft.SparkSpec

/** KeyStatsMaintenance: a tick equals the rebuild of its target
  * snapshot (all three relations), two chained ticks equal a fresh
  * rebuild of the final snapshot, and a no-change tick is the
  * identity. */
class KeyStatsMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: Seq[(Long, String)]) = rows.toDF("id", "k")

  private def allOf(st: KeyStatsMaintenance.KeyStatsState) = (
    st.counts.as[(String, Long)].collect().sorted.toSeq,
    st.cc.as[(Long, Long)].collect().sorted.toSeq,
    st.scalars.as[(Long, Long, Long)].collect().head)

  test("tick == rebuild across deletes, inserts, and key reassignment") {
    val s0 = snap(Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "c")))
    val s1 = snap(Seq((1L, "a"), (3L, "d"), (4L, "c"), (5L, "c"),
      (6L, "a"), (7L, "a"))) // 2 deleted, 3 reassigned b->d, 6/7 inserted
    val ticked = KeyStatsMaintenance.tick(
      KeyStatsMaintenance.rebuild(s0, "k"), s0, s1, "id", "k")
    allOf(ticked) shouldBe allOf(KeyStatsMaintenance.rebuild(s1, "k"))
    KeyStatsMaintenance.stats(ticked).collect() shouldBe
      KeyStatsMaintenance.stats(KeyStatsMaintenance.rebuild(s1, "k")).collect()
  }

  test("two chained ticks equal a fresh rebuild of the final snapshot") {
    val s0 = snap(Seq((1L, "a"), (2L, "b"), (3L, "b")))
    val s1 = snap(Seq((1L, "a"), (2L, "b"), (4L, "c")))
    val s2 = snap(Seq((1L, "c"), (4L, "c"), (5L, "c"), (6L, "a")))
    val st2 = KeyStatsMaintenance.tick(
      KeyStatsMaintenance.tick(
        KeyStatsMaintenance.rebuild(s0, "k"), s0, s1, "id", "k"),
      s1, s2, "id", "k")
    allOf(st2) shouldBe allOf(KeyStatsMaintenance.rebuild(s2, "k"))
  }

  test("a no-change tick is the identity") {
    val s0 = snap(Seq((1L, "a"), (2L, "b")))
    val st = KeyStatsMaintenance.rebuild(s0, "k")
    allOf(KeyStatsMaintenance.tick(st, s0, s0, "id", "k")) shouldBe allOf(st)
  }
}
