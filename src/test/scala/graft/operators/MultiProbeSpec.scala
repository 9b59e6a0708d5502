package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** multiProbeTopK: recall against brute force is monotone in the
  * probe count (the candidate-superset theorem), an exact duplicate is
  * always found (same bucket), and the full-flip probe set is legal. */
class MultiProbeSpec extends SparkSpec {
  import spark.implicits._

  private def qc = {
    val e = graft.Tables.embeddings(spark, sfSmoke)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val c = e.filter($"vec_id" >= 10)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    (q, c)
  }

  private def hits(df: org.apache.spark.sql.DataFrame): Long =
    df.filter($"in_full_topk" === 1L).count()

  test("recall is monotone in nprobe (candidate superset)") {
    val (q, c) = qc
    val h1 = hits(Similarity.multiProbeTopK(q, c, 64, 6, nprobe = 1, k = 5))
    val h3 = hits(Similarity.multiProbeTopK(q, c, 64, 6, nprobe = 3, k = 5))
    val h6 = hits(Similarity.multiProbeTopK(q, c, 64, 6, nprobe = 6, k = 5))
    h3 should be >= h1
    h6 should be >= h3
    h6 should be > 0L
  }

  test("an exact duplicate of the query is rank 1 (same bucket, cos 1)") {
    val v = Array.tabulate(64)(d => ((d * 5) % 11 - 5) / 10f)
    val q = Seq((100L, v)).toDF("qid", "qvec")
    val c = Seq((1L, v), (2L, v.map(x => -x)),
      (3L, Array.tabulate(64)(d => ((d * 3) % 7 - 3) / 10f))).toDF("id", "vec")
    val out = Similarity.multiProbeTopK(q, c, 64, 6, nprobe = 2, k = 2)
      .as[(Long, Long, Long, Double, Long)].collect()
    val r1 = out.find(_._2 == 1L).get
    r1._3 shouldBe 1L
    r1._4 shouldBe 1.0
    r1._5 shouldBe 1L
  }
}
