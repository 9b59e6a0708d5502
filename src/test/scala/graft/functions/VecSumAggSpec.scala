package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** graft_vecsum: buffer layout [n, s_0..s_{d-1}], null semantics, the
  * dimension fail-fast, and partitioning-invariance of the merge. */
class VecSumAggSpec extends SparkSpec {
  import spark.implicits._

  test("sums element-wise with a leading row count") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(10L, 20L, 30L), Seq(100L, 200L, 300L))
      .toDF("qv")
    val out = df.agg(call_function("graft_vecsum", col("qv"), lit(3)))
      .as[Seq[Long]].head()
    out shouldBe Seq(3L, 111L, 222L, 333L)
  }

  test("NULL rows are ignored; NULL elements contribute 0") {
    val df = Seq(Some(Seq(Some(1L), None, Some(3L))), None)
      .toDF("qv")
    val out = df.agg(call_function("graft_vecsum", col("qv"), lit(3)))
      .as[Seq[Long]].head()
    out shouldBe Seq(1L, 1L, 0L, 3L)
  }

  test("empty input evaluates to the zero buffer") {
    val out = Seq(Seq(1L, 2L)).toDF("qv").filter(lit(false))
      .agg(call_function("graft_vecsum", col("qv"), lit(2)))
      .as[Seq[Long]].head()
    out shouldBe Seq(0L, 0L, 0L)
  }

  test("dimension drift throws (fail-fast, not silent truncation)") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(1L, 2L)).toDF("qv")
    val e = intercept[Exception] {
      df.agg(call_function("graft_vecsum", col("qv"), lit(3))).collect()
    }
    e.getMessage should include("graft_vecsum")
  }

  test("merge is partitioning-invariant") {
    val rows = (1L to 100L).map(i => Seq(i, i * 2))
    val a = rows.toDF("qv").repartition(13)
      .agg(call_function("graft_vecsum", col("qv"), lit(2))).as[Seq[Long]].head()
    val b = rows.toDF("qv").coalesce(1)
      .agg(call_function("graft_vecsum", col("qv"), lit(2))).as[Seq[Long]].head()
    a shouldBe b
    a shouldBe Seq(100L, 5050L, 10100L)
  }
}
