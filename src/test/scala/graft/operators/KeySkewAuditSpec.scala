package graft.operators

import graft.SparkSpec

/** keySkewAudit: planted skew surfaces with exact integer stats —
  * hand-computed shares, order-statistic p99, and the 4×-mean hot
  * flag. */
class KeySkewAuditSpec extends SparkSpec {
  import spark.implicits._

  test("planted hot key: exact counts, share, p99 and hot flag") {
    // "a"×50, "b"×10, "c".."l"×2 → 12 keys, 80 rows, mean = 6
    val rows = Seq.fill(50)("a") ++ Seq.fill(10)("b") ++
      ('c' to 'l').flatMap(k => Seq.fill(2)(k.toString))
    val out = Analytics.keySkewAudit(rows.toDF("k").repartition(5), "k", topK = 3)
      .as[(Int, String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    out.map(_._2) shouldBe Array("a", "b", "c")
    val (_, _, n, share, total, keys, mx, p99, hot) = out(0)
    n shouldBe 50L
    share shouldBe 625000L // 50e6 div 80
    total shouldBe 80L
    keys shouldBe 12L
    mx shouldBe 50L
    // p99 position = ceil(0.99 * 12) = 12 -> the largest bucket
    p99 shouldBe 50L
    hot shouldBe true // 50 > 4 * (80 div 12) = 24
    out(1)._9 shouldBe false // b: 10 <= 24
    out(2)._3 shouldBe 2L
  }

  test("uniform keys: nothing hot, p99 equals the common bucket size") {
    val rows = (0 until 100).map(i => s"k${i % 20}")
    val out = Analytics.keySkewAudit(rows.toDF("k"), "k", topK = 5)
      .as[(Int, String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect()
    out should have length 5
    all(out.map(_._3)) shouldBe 5L
    all(out.map(_._9)) shouldBe false
    all(out.map(_._8)) shouldBe 5L
  }
}
