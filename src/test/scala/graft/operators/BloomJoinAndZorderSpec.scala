package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions.zValue

/** Bloom-prefiltered join: output identity vs the plain join.
  * Z-order: interleave algebra + the locality claim itself. */
class BloomJoinAndZorderSpec extends SparkSpec {
  import spark.implicits._

  test("bloom join output-identical to the plain join") {
    val fact = (1L to 500L).map(i => (i % 50, i)).toDF("fk", "payload")
    val dim = Seq((3L, "x"), (7L, "y"), (11L, "z")).toDF("dk", "name")
    val got = SkewJoin.bloomPrefilteredJoin(fact, dim, "fk", "dk")
      .select(col("fk"), col("payload"), col("name"))
      .orderBy(col("fk"), col("payload"))
      .as[(Long, Long, String)].collect()
    val want = fact.join(dim, col("fk") === col("dk"))
      .select(col("fk"), col("payload"), col("name"))
      .orderBy(col("fk"), col("payload"))
      .as[(Long, Long, String)].collect()
    got shouldBe want
    got.length shouldBe 30 // 10 fact rows per matching key
  }

  test("bloom join works when fact and dim SHARE the key column name") {
    // the common shared-join-key case: unqualified col(key) === col(key)
    // would throw ambiguous-reference (round-13 ADVICE item #5)
    val fact = (1L to 100L).map(i => (i % 10, i)).toDF("k", "payload")
    val dim = Seq((3L, "x"), (7L, "y")).toDF("k", "name")
    val got = SkewJoin.bloomPrefilteredJoin(fact, dim, "k", "k")
      .select(col("payload"), col("name"))
      .orderBy(col("payload")).as[(Long, String)].collect()
    got.length shouldBe 20
    got.map(_._2).distinct.sorted shouldBe Array("x", "y")
  }

  test("bloom join: empty dim short-circuits to the empty join") {
    val fact = (1L to 10L).map(i => (i, i)).toDF("fk", "payload")
    val dim = Seq.empty[(Long, String)].toDF("dk", "name")
    val out = SkewJoin.bloomPrefilteredJoin(fact, dim, "fk", "dk")
    out.count() shouldBe 0L
    out.columns.toSeq shouldBe Seq("fk", "payload", "dk", "name")
  }

  test("bloom join: an oversized dim fails fast, not a saturated sketch") {
    val fact = Seq((1L, 1L)).toDF("fk", "payload")
    val dim = (1L to 40L).map(i => (i, s"n$i")).toDF("dk", "name")
    val e = intercept[IllegalArgumentException] {
      // 64-bit sketch -> default budget 64/8 = 8 keys, dim has 40
      SkewJoin.bloomPrefilteredJoin(fact, dim, "fk", "dk", numBits = 64)
    }
    e.getMessage should include("40 rows, over the 8-key budget")
  }

  test("zValue interleaves bits exactly") {
    // a=0b101 (bits 0,2 -> even positions 0,4), b=0b011 (odd 1,3)
    // z = 1 + 16 + 2 + 8 = 27
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].collect()
    out shouldBe Array(27L)
  }

  test("z-order buckets bound BOTH extents; a-sort leaves b full-range") {
    // full 64x64 grid, 16 buckets
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val out = Analytics.zOrderAudit(grid.toDF("a", "b"), "a", "b",
        bits = 6, bucketBits = 4)
      .orderBy(col("layout"))
      .as[(String, Long, Long, Long)].collect()
    val sortA = out(0); val zo = out(1)
    sortA._1 shouldBe "sort_a"
    zo._1 shouldBe "zorder"
    // a-sorted: each bucket spans 4 a-values but ALL 64 b-values
    sortA._3 shouldBe 3L
    sortA._4 shouldBe 63L
    // z-order: 16 buckets = 4x4 z-tiles of a 64x64 grid -> each tile
    // spans 16 values in BOTH dimensions
    zo._3 shouldBe 15L
    zo._4 shouldBe 15L
  }
}
