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

  test("fkIntegrityAudit: hand-checked orphans, nulls counted separately") {
    val child = Seq(Some("1"), Some("1"), Some("1"), Some("2"), Some("2"),
      None, Some("9"), Some("9"), Some("9"), Some("9")).toDF("fk")
    val parent = Seq("1", "2").toDF("pk")
    val r = Analytics.fkIntegrityAudit(child, "fk", parent, "pk", "c->p")
      .collect().head
    r.getString(0) shouldBe "c->p"
    r.getLong(1) shouldBe 9L // non-null child rows
    r.getLong(2) shouldBe 3L // distinct non-null child keys
    r.getLong(3) shouldBe 1L // null FKs, NOT orphans
    r.getLong(4) shouldBe 4L // orphan rows (key 9)
    r.getLong(5) shouldBe 1L // orphan keys
    r.getLong(6) shouldBe (4L * 1000000L) / 9L
  }

  test("fkIntegrityAudit: a clean edge reports zero orphans") {
    val child = Seq("1", "2", "2").toDF("fk")
    val parent = Seq("1", "2", "3").toDF("pk")
    val r = Analytics.fkIntegrityAudit(child, "fk", parent, "pk", "ok")
      .collect().head
    r.getLong(4) shouldBe 0L
    r.getLong(5) shouldBe 0L
    r.getLong(6) shouldBe 0L
  }

  test("keyGini: hand-checked concentration; uniform and single-key degenerate to 0") {
    // ascending counts [1,1,2,4]: S = 1+2+6+16 = 25,
    // G = (2*25 - 5*8)/(4*8) = 10/32 -> 312500 ppm
    val skewed = (Seq("a") ++ Seq("b") ++ Seq.fill(2)("c") ++
      Seq.fill(4)("d")).toDF("k")
    val r = Analytics.keyGini(skewed, "k").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((8L, 4L, 312500L))
    val uniform = (0 until 20).map(i => s"k${i % 4}").toDF("k")
    Analytics.keyGini(uniform, "k").collect().head.getLong(2) shouldBe 0L
    val one = Seq.fill(5)("only").toDF("k")
    Analytics.keyGini(one, "k").collect().head.getLong(2) shouldBe 0L
  }

  test("equiDepthHistogram: hand-checked buckets, sizes differ by at most one") {
    val rows = (1L to 10L).toDF("v")
    val out = Analytics.equiDepthHistogram(rows, col("v"), buckets = 3)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect()
    out shouldBe Array(
      (0L, 4L, 1L, 4L), (1L, 3L, 5L, 7L), (2L, 3L, 8L, 10L))
  }

  test("equiDepthHistogram: a single value class spans every bucket with exact overlap counts") {
    val rows = Seq.fill(10)(7L).toDF("v")
    val out = Analytics.equiDepthHistogram(rows, col("v"), buckets = 3)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect()
    out shouldBe Array(
      (0L, 4L, 7L, 7L), (1L, 3L, 7L, 7L), (2L, 3L, 7L, 7L))
  }

  test("equiDepthHistogram: tied classes land whole in their bucket when counts align") {
    val rows = (Seq.fill(5)(1L) ++ Seq.fill(5)(2L)).toDF("v")
    val out = Analytics.equiDepthHistogram(rows, col("v"), buckets = 2)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect()
    out shouldBe Array((0L, 5L, 1L, 1L), (1L, 5L, 2L, 2L))
  }

  test("ksDrift: hand-checked supremum, identical groups score zero") {
    // A = {1,2,3,4}, B = {3,4,5,6}: D = 0.5 at v = 2 (F_A = .5, F_B = 0)
    val rows = (Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("B", _))).toDF("g", "v")
    val r = Analytics.ksDrift(rows, "g", col("v"), "A", "B")
      .as[(Long, Long, Long, Long)].collect().head
    r shouldBe ((4L, 4L, 500000L, 2L))
    val same = (Seq(1L, 2L).map(("A", _)) ++ Seq(1L, 2L).map(("B", _)))
      .toDF("g", "v")
    val z = Analytics.ksDrift(same, "g", col("v"), "A", "B")
      .as[(Long, Long, Long, Long)].collect().head
    (z._3, z._4) shouldBe ((0L, 1L))
  }

  test("keyGini plan: the only unpartitioned window runs over the counts-of-counts aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Filter, LogicalPlan, Project, Window => LWindow}
    @annotation.tailrec
    def strip(n: LogicalPlan): LogicalPlan = n match {
      case Project(_, c) => strip(c)
      case Filter(_, c)  => strip(c)
      case w: LWindow    => strip(w.child)
      case other         => other
    }
    val e = graft.Tables.events(spark, sfSmoke)
    val df = Analytics.keyGini(e, "user_id")
    val unpartitioned = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    unpartitioned should not be empty // the histogram prefix itself
    unpartitioned.foreach { w =>
      assert(w.windowExpressions.forall(!_.sql.contains("row_number")),
        s"unpartitioned row_number (global sort funnel):\n$w")
      assert(strip(w.child).isInstanceOf[Aggregate],
        s"unpartitioned window not over the counts-of-counts aggregate:\n$w")
    }
  }
}
