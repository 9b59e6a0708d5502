package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** jlProject / jlTopK: the projection must match an independent
  * driver-side computation bit-for-bit, preserve equality of vectors,
  * and the reduced-space top-k must carry a correct full-dim audit
  * flag. */
class JlProjectSpec extends SparkSpec {
  import spark.implicits._

  private def md5Sign(seed: String): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(seed.getBytes("UTF-8")).map(x => f"$x%02x").mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 1) 1.0f else -1.0f
  }

  private def refProject(v: Array[Float], outDims: Int): Array[Float] =
    Array.tabulate(outDims) { j =>
      var acc = 0.0
      var d = 0
      while (d < v.length) {
        acc += md5Sign(s"jl-$j-$d").toDouble * v(d).toDouble
        d += 1
      }
      acc.toFloat
    }

  test("projection matches the driver-side reimplementation bit-for-bit") {
    val e = graft.Tables.embeddings(spark, sfSmoke)
      .select($"vec_id", $"embedding").limit(20)
    val rows = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val out = Similarity.jlProject(e, "embedding", dims = 64, outDims = 8, as = "p")
      .select($"vec_id", $"p").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.keySet shouldBe rows.keySet
    out.foreach { case (id, p) =>
      p.toSeq shouldBe refProject(rows(id), 8).toSeq
    }
  }

  test("equal vectors project equally (dup structure survives)") {
    val v = Array.tabulate(64)(d => (d % 7 - 3) / 10f)
    val df = Seq((1L, v), (2L, v)).toDF("id", "vec")
    val p = Similarity.jlProject(df, "vec", 64, 16, "p")
      .select($"p").collect().map(_.getSeq[Float](0))
    p(0) shouldBe p(1)
  }

  test("jlTopK flags exactly the full-dim top-k hits") {
    val e = graft.Tables.embeddings(spark, sfSmoke)
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val c = e.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val out = Similarity.jlTopK(q, c, dims = 64, outDims = 16, k = 5)
      .as[(Long, Long, Long, Double, Long)].collect()
    out.groupBy(_._1).values.foreach(_.length shouldBe 5)
    // the flag must agree with an independently computed full top-5
    val full = Similarity.bruteForceTopKAgg(q, c, 5)
      .select($"qid", $"id").as[(Long, Long)].collect().toSet
    out.foreach { case (qid, _, id, _, flag) =>
      flag shouldBe (if (full.contains((qid, id))) 1L else 0L)
    }
  }

  test("a planted exact duplicate is rank 1 in the reduced space") {
    // equal vectors project equally, so the dup's projected cosine is
    // exactly 1 — JL can distort neighborhoods (the audit flag exists
    // to measure that; ~12% recall@5 on the weakly-separated smoke
    // blobs) but can NEVER lose an exact duplicate
    def mk(seed: Int) = Array.tabulate(64)(d => ((d * seed) % 13 - 6) / 10f)
    val q = Seq((100L, mk(3)), (101L, mk(5))).toDF("qid", "qvec")
    val c = Seq((1L, mk(3)), (2L, mk(5)), (3L, mk(7)), (4L, mk(11)),
      (5L, mk(2)), (6L, mk(4))).toDF("id", "vec")
    val out = Similarity.jlTopK(q, c, dims = 64, outDims = 16, k = 3)
      .as[(Long, Long, Long, Double, Long)].collect()
    out.filter(r => r._1 == 100L && r._2 == 1L).map(_._3) shouldBe Array(1L)
    out.filter(r => r._1 == 101L && r._2 == 1L).map(_._3) shouldBe Array(2L)
    // and the dup is in the full-dim top-k too, so it's flagged
    all(out.filter(_._2 == 1L).map(_._5)) shouldBe 1L
  }
}
