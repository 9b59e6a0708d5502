package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(hashes: Seq[Long], bits: Int = 1 << 12, k: Int = 5): Array[Byte] =
    hashes.toDF("h")
      .agg(call_function("graft_bloom", col("h"), lit(bits), lit(k)).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  test("no false negatives: every inserted hash probes true") {
    val hs = (1L to 500L).map(i => i * 2654435761L)
    val bf = sketchOf(hs)
    val misses = hs.toDF("h")
      .filter(!call_function("graft_bloom_contains", lit(bf), col("h")))
      .count()
    misses shouldBe 0L
  }

  test("prunes: disjoint probes are mostly rejected") {
    // 200 entries in 2^14 bits → fp rate well under 1%; 5000 disjoint
    // probes should see at most a handful of false positives.
    val bf = sketchOf((1L to 200L).map(i => i * 2654435761L), bits = 1 << 14)
    val fp = (1000001L to 1005000L).toDF("h")
      .filter(call_function("graft_bloom_contains", lit(bf), col("h")))
      .count()
    fp should be < 50L
  }

  test("merge across partitions is a bitwise OR: partitioning-invariant sketch") {
    val hs = (1L to 2000L).map(i => i * 1099511628211L)
    val one = hs.toDF("h").repartition(1)
      .agg(call_function("graft_bloom", col("h"), lit(1 << 12), lit(5)))
      .head().getAs[Array[Byte]](0)
    val many = hs.toDF("h").repartition(32)
      .agg(call_function("graft_bloom", col("h"), lit(1 << 12), lit(5)))
      .head().getAs[Array[Byte]](0)
    one.toSeq shouldBe many.toSeq
  }

  test("empty input yields an all-zero sketch that rejects everything") {
    val bf = sketchOf(Nil)
    BloomUtil.mightContain(bf, 42L) shouldBe false
    BloomUtil.mightContain(bf, 0L) shouldBe false
  }

  test("nulls are skipped; callable from SQL") {
    Seq(Some(7L), None, Some(9L)).toDF("h").createOrReplaceTempView("bloom_in")
    val bf = spark.sql("SELECT graft_bloom(h, 256, 3) AS bf FROM bloom_in")
      .head().getAs[Array[Byte]]("bf")
    BloomUtil.mightContain(bf, 7L) shouldBe true
    BloomUtil.mightContain(bf, 9L) shouldBe true
  }

  test("sketch is self-describing: k byte + bit bytes, length from numBits") {
    val bf = sketchOf(Seq(1L), bits = 1 << 12, k = 5)
    bf.length shouldBe 1 + (1 << 12) / 8
    (bf(0) & 0xff) shouldBe 5
  }
}
