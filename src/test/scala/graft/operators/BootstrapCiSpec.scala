package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Poisson-bootstrap CI: exact point estimate, constant-column
  * degeneracy, order-statistic ordering, and determinism. */
class BootstrapCiSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 200L).map(i => ("g", i, (i % 7).toDouble))

  private def run(data: Seq[(String, Long, Double)], reps: Int = 32) =
    Analytics.bootstrapCi(data.toDF("g", "id", "v"), "g", "id", col("v"),
        reps)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()

  test("point estimate is the exact integer micro mean") {
    val out = run(rows).head
    out._2 shouldBe 200L
    out._3 shouldBe rows.map(r => math.round(r._3 * 1e6)).sum / 200L
  }

  test("constant column collapses every replicate mean to the constant") {
    val out = run((1L to 50L).map(i => ("g", i, 3.5))).head
    out._4 shouldBe 32L // n_reps
    Seq(out._5, out._6, out._7, out._8, out._9).distinct shouldBe
      Seq(3500000L)
  }

  test("five-number summary is ordered and within the value range") {
    val out = run(rows).head
    val q = Seq(out._5, out._6, out._7, out._8, out._9)
    q shouldBe q.sorted
    all(q) should be >= 0L
    all(q) should be <= 6000000L
  }

  test("deterministic across runs") {
    run(rows).toSeq shouldBe run(rows).toSeq
  }

  test("reps bound enforced") {
    an[IllegalArgumentException] should be thrownBy
      Analytics.bootstrapCi(rows.toDF("g", "id", "v"), "g", "id",
        col("v"), reps = 2)
  }
}
