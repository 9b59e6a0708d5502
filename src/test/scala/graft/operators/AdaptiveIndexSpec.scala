package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drift-triggered adaptive re-bucketing: the branch decision, the
  * branch results, and the fail-fast contract. */
class AdaptiveIndexSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around (+1,0,0,0) and (0,+1,0,0)
  private def cluster(base: Array[Float], ids: Range) =
    ids.map { i =>
      (i.toLong, base.zipWithIndex.map { case (v, d) =>
        v + (if (d == i % 4) 0.01f else 0.0f)
      })
    }
  private val oldRows =
    cluster(Array(1f, 0f, 0f, 0f), 0 until 20) ++
      cluster(Array(0f, 1f, 0f, 0f), 20 until 40)
  private val cents: Seq[(Long, Array[Float])] = Seq(
    0L -> Array(1f, 0f, 0f, 0f), 1L -> Array(0f, 1f, 0f, 0f))

  test("stable snapshot -> maintained, equal to the maintain tick") {
    val oldV = oldRows.toDF("id", "vec")
    val newV = oldRows.filter(_._1 != 3L).toDF("id", "vec") // one removal
    val scales = Similarity.sqTrain(oldV, "vec", dims = 4)
    val idx = Similarity.ivfSqIndexBuild(oldV, "id", "vec", cents, scales)
    val out = Similarity.adaptiveIndexTick(idx, oldV, newV, "id", "vec",
      cents, scales, dims = 4, maxMeanD2Micro = 100000L)
    out.select(col("decision")).distinct().as[String].collect() shouldBe
      Array("maintained")
    val want = Similarity.ivfSqIndexMaintain(idx, oldV, newV, "id", "vec",
        cents, scales)
      .orderBy(col("id")).collect()
    out.select(col("id"), col("cell"), col("code"))
      .orderBy(col("id")).collect() shouldBe want
  }

  test("re-scaled snapshot -> rebuilt under retrained centroids") {
    val oldV = oldRows.toDF("id", "vec")
    val newV = oldRows.map { case (id, v) => (id, v.map(_ * 5f)) }
      .toDF("id", "vec")
    val scales = Similarity.sqTrain(oldV, "vec", dims = 4)
    val idx = Similarity.ivfSqIndexBuild(oldV, "id", "vec", cents, scales)
    val out = Similarity.adaptiveIndexTick(idx, oldV, newV, "id", "vec",
      cents, scales, dims = 4, maxMeanD2Micro = 100000L)
    out.select(col("decision")).distinct().as[String].collect() shouldBe
      Array("rebuilt")
    // the rebuilt index covers the full new snapshot, k cells survive
    out.count() shouldBe 40L
    out.select(col("cell")).distinct().count() shouldBe 2L
    // measured trigger is on the relation and above the ceiling
    out.select(col("mean_d2_micro")).as[Long].head() should be > 100000L
  }

  test("empty new snapshot fails fast") {
    val oldV = oldRows.toDF("id", "vec")
    val newV = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    val scales = Similarity.sqTrain(oldV, "vec", dims = 4)
    val idx = Similarity.ivfSqIndexBuild(oldV, "id", "vec", cents, scales)
    intercept[IllegalArgumentException] {
      Similarity.adaptiveIndexTick(idx, oldV, newV, "id", "vec",
        cents, scales, dims = 4, maxMeanD2Micro = 100000L)
    }.getMessage should include("empty new snapshot")
  }
}
