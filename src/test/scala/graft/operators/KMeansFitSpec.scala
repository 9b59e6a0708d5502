package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-scale k-means fit (Similarity.kmeansFit): checked against an
  * INDEPENDENT plain-Scala reimplementation of the exact-integer Lloyd
  * contract (offset-micro quantization, bottom-k-by-md5 seeding,
  * smaller-cell argmin ties, `sum div n` update, empty-cell carry) on
  * a fixed point set; plus partitioning-invariance, the empty-cell
  * carry rule, and the graft_sqdist_long kernel's edge semantics. */
class KMeansFitSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference implementation — same contract, different
    * code path (plain collections, no Spark). */
  private def refKmeans(
      pts: Seq[(Long, Array[Float])],
      k: Int,
      iters: Int): (Map[Long, Array[Long]], Map[Long, (Long, Long)]) = {
    def md5h(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val q = pts.map { case (id, v) =>
      id -> v.map(x => math.round((x.toDouble + 1.0) * 1e6))
    }
    val seeds = q.sortBy { case (id, _) => (md5h(s"kmseed:$id"), id) }.take(k)
    var cents: Seq[(Long, Array[Long])] = seeds.zipWithIndex.map {
      case ((_, qv), i) => i.toLong -> qv.clone()
    }
    def bestCell(qv: Array[Long]): (Long, Long) = // (d2, cell)
      cents.map { case (cid, cv) =>
        (cv.zip(qv).map { case (c, x) => val d = x - c; d * d }.sum, cid)
      }.min
    for (_ <- 1 to iters) {
      val groups = q.groupBy { case (_, qv) => bestCell(qv)._2 }
      cents = cents.map { case (cid, prev) =>
        groups.get(cid) match {
          case Some(ms) =>
            cid -> prev.indices.map(d => ms.map(_._2(d)).sum / ms.size).toArray
          case None => cid -> prev
        }
      }
    }
    val fin = q.map { case (_, qv) => bestCell(qv) }
    val stats = fin.groupBy(_._2).map { case (cid, xs) =>
      cid -> (xs.size.toLong, xs.map(_._1).sum)
    }
    (cents.toMap, stats)
  }

  private val pts: Seq[(Long, Array[Float])] = (0L until 24L).map { i =>
    // three loose blobs around (-0.4,-0.4), (0,0.45), (0.4,-0.1) with
    // deterministic per-point jitter — nothing degenerate, no RNG
    val blob = (i % 3).toInt
    val (cx, cy) = Seq((-0.4f, -0.4f), (0.0f, 0.45f), (0.4f, -0.1f))(blob)
    val jx = ((i * 7 % 11).toFloat - 5f) / 100f
    val jy = ((i * 13 % 11).toFloat - 5f) / 100f
    i -> Array(cx + jx, cy + jy)
  }

  test("matches an independent driver-side reimplementation (k=3, iters=3)") {
    val (refC, refS) = refKmeans(pts, k = 3, iters = 3)
    val out = Similarity.kmeansFit(pts.toDF("id", "vec"), "id", "vec",
        k = 3, iters = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    out should have length (3 * 2)
    out.foreach { case (cell, d, c, n, sd2) =>
      c shouldBe refC(cell)(d.toInt)
      val (rn, rsd2) = refS.getOrElse(cell, (0L, 0L))
      n shouldBe rn
      sd2 shouldBe rsd2
    }
  }

  test("output is invariant to input partitioning") {
    val a = Similarity.kmeansFit(pts.toDF("id", "vec").repartition(7),
      "id", "vec", k = 3, iters = 2).collect().toSet
    val b = Similarity.kmeansFit(pts.toDF("id", "vec").repartition(1),
      "id", "vec", k = 3, iters = 2).collect().toSet
    a shouldBe b
  }

  test("empty cell keeps its seed centroid and reports n_vectors = 0") {
    // two distinct points, many copies each, k=3: two seeds share
    // identical coordinates, so the higher-numbered duplicate cell
    // never wins an argmin tie -> stays empty forever and must carry
    // its seed centroid with zero final members.
    val dup = (0L until 12L).map { i =>
      i -> (if (i % 2 == 0) Array(-0.3f, 0.2f) else Array(0.4f, -0.25f))
    }
    val out = Similarity.kmeansFit(dup.toDF("id", "vec"), "id", "vec",
        k = 3, iters = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    val byCell = out.groupBy(_._1)
    byCell.keySet shouldBe Set(0L, 1L, 2L)
    val empties = byCell.filter(_._2.forall(_._4 == 0L))
    empties should have size 1
    // the empty cell's centroid must equal one of the two quantized
    // input points (its seed), untouched by any update
    val quant = dup.map(_._2.map(x => math.round((x.toDouble + 1.0) * 1e6)).toSeq).distinct
    val emptyCent = empties.head._2.sortBy(_._2).map(_._3).toSeq
    quant should contain(emptyCent)
    // the two live cells hold all 12 points between them
    out.filter(_._4 > 0).map(r => (r._1, r._4)).distinct.map(_._2).sum shouldBe 12L
  }

  test("graft_sqdist_long: exact value, length truncation, null elements") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 0L, 5L))).toDF("a", "b")
    df.select(call_function("graft_sqdist_long", $"a", $"b"))
      .as[Long].head() shouldBe (9L + 4L + 4L)
    // shorter right side truncates
    df.select(call_function("graft_sqdist_long", $"a", typedLit(Seq(1L, 1L))))
      .as[Long].head() shouldBe (0L + 1L)
    // null element contributes 0
    val withNull = Seq((Seq(1L, 2L), Seq[java.lang.Long](null, 5L))).toDF("a", "b")
    withNull.select(call_function("graft_sqdist_long", $"a", $"b"))
      .as[Long].head() shouldBe 9L
  }
}
