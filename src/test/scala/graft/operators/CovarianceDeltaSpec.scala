package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** covarianceDelta: the maintained Gram/covariance state must equal a
  * full rebuild after membership churn and vector edits, an unchanged
  * snapshot must be a no-op, and ticks must chain. */
class CovarianceDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("id", "vec")

  private def mk(seed: Int) = Array.tabulate(8)(d => ((d * seed) % 9 - 4) / 10f)

  private val base = (1L to 6L).map(i => i -> mk(i.toInt * 3 + 1))

  private def collectStats(df: DataFrame) =
    df.orderBy("d1", "d2")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("tick == rebuild under add / remove / vector edit") {
    val oldSnap = vecs(base)
    val newSnap = vecs(
      base.filterNot(_._1 == 2L) // remove 2
        .map { case (id, v) => if (id == 4L) id -> v.map(-_) else id -> v } // edit 4
        :+ (9L -> mk(23))) // add 9
    val st = Similarity.covarianceStats(oldSnap, "vec", dims = 8)
    val ticked = Similarity.covarianceDelta(st, oldSnap, newSnap, "id", "vec", 8)
    collectStats(ticked) shouldBe
      collectStats(Similarity.covarianceStats(newSnap, "vec", dims = 8))
  }

  test("unchanged snapshot is a no-op") {
    val snap = vecs(base)
    val st = Similarity.covarianceStats(snap, "vec", dims = 8)
    val ticked = Similarity.covarianceDelta(st, snap, snap, "id", "vec", 8)
    collectStats(ticked) shouldBe collectStats(st)
  }

  test("ticks chain across two snapshots") {
    val s0 = vecs(base)
    val s1 = vecs(base :+ (7L -> mk(11)))
    val s2 = vecs((base :+ (7L -> mk(17))).filterNot(_._1 == 1L))
    val st0 = Similarity.covarianceStats(s0, "vec", dims = 8)
    val st1 = Similarity.covarianceDelta(st0, s0, s1, "id", "vec", 8)
      .localCheckpoint()
    val st2 = Similarity.covarianceDelta(st1, s1, s2, "id", "vec", 8)
    collectStats(st2) shouldBe
      collectStats(Similarity.covarianceStats(s2, "vec", dims = 8))
  }
}
