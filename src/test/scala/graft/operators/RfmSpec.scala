package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFM segmentation: a 5-customer ladder hitting every quintile, and
  * the ties-share-a-score convention. */
class RfmSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Date, Double)]) =
    Analytics.rfmSegments(rows.toDF("cust", "d", "price"), "cust", "d",
        round(col("price") * 100))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()

  test("5-customer ladder lands one customer per diagonal segment") {
    // cust k: k orders on day 10+k of k*10.0 each -> recency 5-k,
    // frequency k, dollars 10k^2; every metric has 5 distinct values,
    // so quintiles = ranks and the segment grid is the diagonal.
    val rows = for {
      k <- 1L to 5L
      _ <- 1L to k
    } yield (k, Date.valueOf(f"2024-01-${10 + k}%02d"), k * 10.0)
    val out = run(rows)
    out shouldBe (1L to 5L).map(k =>
      (k, k, k, 1L, 1000L * k * k, 1000L * k * k))
  }

  test("ties share a quintile score") {
    // all four customers identical -> below = 0 everywhere -> scores
    // (5, 1, 1) for everyone, one segment row of 4.
    val rows = (1L to 4L).map(k => (k, Date.valueOf("2024-02-01"), 7.0))
    val out = run(rows)
    out shouldBe Seq((5L, 1L, 1L, 4L, 2800L, 700L))
  }
}
