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
