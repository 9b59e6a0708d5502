package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** graft_gram / Similarity.covarianceStats: one-pass covariance
  * sufficient statistics — checked against a driver-side naive
  * computation, partitioning-invariant, fail-fast on dimension drift,
  * and usable: the integer covariance numerator derived from the stats
  * must reproduce the sign structure of a planted correlation. */
class CovarianceStatsSpec extends SparkSpec {
  import spark.implicits._

  // 30 deterministic 3-dim points: dim0 and dim1 strongly positively
  // correlated, dim2 anti-correlated with dim0
  private val pts: Seq[Array[Float]] = (0 until 30).map { i =>
    val t = (i % 10 - 5).toFloat / 10f
    val wob = ((i * 7 % 5).toFloat - 2f) / 50f
    Array(t, t + wob, -t + wob)
  }

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.round(x.toDouble * 1e3))

  test("matches a naive driver-side computation, any partitioning") {
    val out = Similarity.covarianceStats(
        pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "vec").repartition(7),
        "vec", dims = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    out should have length 6 // 3*(3+1)/2 pairs
    val q = pts.map(quant)
    out.foreach { case (d1, d2, n, s1, s2, s12) =>
      n shouldBe 30L
      s1 shouldBe q.map(_(d1.toInt)).sum
      s2 shouldBe q.map(_(d2.toInt)).sum
      s12 shouldBe q.map(v => v(d1.toInt) * v(d2.toInt)).sum
    }
    // derived covariance numerator n*s12 - s1*s2 has the planted signs
    def covNum(d1: Int, d2: Int): Long = {
      val r = out.find(r => r._1 == d1 && r._2 == d2).get
      r._3 * r._6 - r._4 * r._5
    }
    covNum(0, 1) should be > 0L
    covNum(0, 2) should be < 0L
    covNum(0, 0) should be > 0L
  }

  test("null vector rows are ignored; null elements contribute 0") {
    val df = Seq(
      (1L, Seq[java.lang.Long](2L, 3L)),
      (2L, null),
      (3L, Seq[java.lang.Long](null, 5L))).toDF("id", "qv")
    val g = df.agg(call_function("graft_gram", $"qv", lit(2)).as("g"))
      .as[Seq[Long]].head()
    // layout: [n, s0, s1, p00, p01, p11]
    g shouldBe Seq(2L, 2L, 8L, 4L, 6L + 0L, 9L + 25L)
  }

  test("dimension drift fails fast") {
    val df = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("qv")
    val ex = intercept[Exception] {
      df.agg(call_function("graft_gram", $"qv", lit(2))).collect()
    }
    ex.getMessage should include("graft_gram")
  }
}
