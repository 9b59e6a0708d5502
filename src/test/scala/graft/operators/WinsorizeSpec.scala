package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winsorize: hand band on 10 values, tails-only clamping, per-group
  * independence, and row-count preservation. */
class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  // values 10..100 in one group: p10 picks position ceil(10*10/100)=1
  // (value 10), p90 position 9 (value 90).
  private val ten = (1 to 10).map(i => (i.toLong, "g", i * 10L))

  private def run(rows: Seq[(Long, String, Long)]) =
    Curation.winsorize(rows.toDF("id", "k", "v"), "id", "k", col("v"),
        10, 90)
      .orderBy("id")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq

  test("hand band: only the top value clips at [10, 90]") {
    val out = run(ten)
    out.map(_._5).distinct shouldBe Seq(10L)
    out.map(_._6).distinct shouldBe Seq(90L)
    out.filter(r => r._3 != r._4) shouldBe
      Seq((10L, "g", 100L, 90L, 10L, 90L))
  }

  test("interior values pass through untouched") {
    run(ten).filter(r => r._3 > 10L && r._3 < 90L)
      .foreach(r => r._4 shouldBe r._3)
  }

  test("groups clamp against their own bands") {
    val rows = ten ++ (1 to 10).map(i => (100L + i, "h", i * 1000L))
    val out = run(rows)
    out.filter(_._2 == "h").map(_._6).distinct shouldBe Seq(9000L)
    // g's 100 clips to 90; h's 10000 clips to 9000
    out.find(_._1 == 110L).get._4 shouldBe 9000L
  }

  test("row count is preserved (winsorize never drops)") {
    run(ten).size shouldBe 10
  }
}
