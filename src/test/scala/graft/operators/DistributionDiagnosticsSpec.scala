package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** exactPercentiles + keyEntropy: hand-checked order statistics on
  * designed histograms, the uniform-keys entropy identity, and the
  * degenerate single-key case. */
class DistributionDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("exactPercentiles: hand-checked bands, duplicates included") {
    val rows = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 5L), ("b", 5L), ("b", 5L), ("b", 9L)).toDF("k", "v")
    val out = Analytics.exactPercentiles(rows, "k", col("v"),
        Seq(25, 50, 75, 100))
      .orderBy("key", "pct")
      .as[(String, Long, Long)].collect()
    out shouldBe Array(
      ("a", 25L, 1L), ("a", 50L, 2L), ("a", 75L, 3L), ("a", 100L, 4L),
      ("b", 25L, 5L), ("b", 50L, 5L), ("b", 75L, 5L), ("b", 100L, 9L))
  }

  test("exactPercentiles plan: the only windows are per-key (hash-partitioned)") {
    val e = graft.Tables.events(spark, sfSmoke)
    val df = Analytics.exactPercentiles(e, "event_type",
      round(col("value") * 100), Seq(50))
    val unpartitioned = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    unpartitioned shouldBe empty
  }

  test("keyEntropy: uniform keys hit the ln(K) maximum exactly") {
    val rows = (0 until 20).map(i => s"k${i % 4}").toDF("k")
    val r = Analytics.keyEntropy(rows, "k").collect().head
    r.getLong(0) shouldBe 20L
    r.getLong(1) shouldBe 4L
    // H = ln(20) - ln(5) = ln(4) in micro-nats (exact at this fixture)
    r.getLong(2) shouldBe 1386294L
    r.getLong(3) shouldBe 1386294L
    r.getLong(4) shouldBe 1000000L
  }

  test("keyEntropy: a hot key scores low; a single key degenerates to 10^6") {
    val hot = (Seq.fill(96)("hot") ++ Seq("a", "b", "c", "d")).toDF("k")
    val r = Analytics.keyEntropy(hot, "k").collect().head
    r.getLong(4) should be < 200000L // far from balanced
    val one = Seq.fill(5)("only").toDF("k")
    Analytics.keyEntropy(one, "k").collect().head.getLong(4) shouldBe 1000000L
  }
}
