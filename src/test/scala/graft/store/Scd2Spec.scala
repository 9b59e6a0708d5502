package graft.store

import graft.SparkSpec

/** Scd2.merge: all five cases hand-checked — version, equal no-op,
  * late-update no-op, untouched key, insert — plus history
  * passthrough and the multi-update collapse tie rule. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("hand-checked merge over every case") {
    val dim = Seq(
      (1L, 5L, 50L, Some(100L)), // history row, untouched
      (1L, 10L, 100L, None), // current, will version
      (2L, 20L, 100L, None), // current, equal update -> no-op
      (3L, 30L, 100L, None), // current, LATE update -> no-op
      (4L, 40L, 100L, None)) // current, no update
      .toDF("k", "a", "valid_from", "valid_to")
    val updates = Seq(
      (1L, 11L, 200L), // the winner for key 1
      (1L, 99L, 150L), // superseded by the (ts, attrs) collapse
      (2L, 20L, 200L), // equal attrs
      (3L, 31L, 90L), // ts <= valid_from: rejected
      (5L, 50L, 200L)) // new key: insert
      .toDF("k", "a", "ts")
    val out = Scd2.merge(dim, updates, "k", Seq("a"), "ts")
      .as[(Long, Long, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._3))
    out shouldBe Array(
      (1L, 5L, 50L, Some(100L)), // history passthrough
      (1L, 10L, 100L, Some(200L)), // closed at the update ts
      (1L, 11L, 200L, None), // new current version
      (2L, 20L, 100L, None),
      (3L, 30L, 100L, None),
      (4L, 40L, 100L, None),
      (5L, 50L, 200L, None))
  }

  test("collapse tie rule: equal ts picks the greatest attrs") {
    val dim = Seq((1L, 10L, 100L, Option.empty[Long]))
      .toDF("k", "a", "valid_from", "valid_to")
    val updates = Seq((1L, 11L, 200L), (1L, 12L, 200L)).toDF("k", "a", "ts")
    val out = Scd2.merge(dim, updates, "k", Seq("a"), "ts")
      .as[(Long, Long, Long, Option[Long])].collect()
      .sortBy(_._3)
    out.last shouldBe ((1L, 12L, 200L, None))
  }

  test("null-safe change detection: null -> value versions, null -> null does not") {
    val dim = Seq((1L, Option.empty[Long], 100L, Option.empty[Long]),
        (2L, Option.empty[Long], 100L, Option.empty[Long]))
      .toDF("k", "a", "valid_from", "valid_to")
    val updates = Seq((1L, Some(7L), 200L), (2L, Option.empty[Long], 200L))
      .toDF("k", "a", "ts")
    val out = Scd2.merge(dim, updates, "k", Seq("a"), "ts")
    out.count() shouldBe 3L // key 1 versions (2 rows), key 2 no-ops (1 row)
  }
}
