package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Training-pair builder: role assignment off a hand ranking, the
  * seen-exclusion of random negatives, and pool determinism. */
class TrainingPairsSpec extends SparkSpec {
  import spark.implicits._

  private val ranking = Seq(
    (1L, 101L, 1L), (1L, 102L, 2L), (1L, 103L, 3L), (1L, 104L, 4L),
    (2L, 102L, 1L), (2L, 105L, 2L))
  private val corpus = (101L to 130L)

  private def run(kHard: Int = 2, kRand: Int = 3) =
    HybridSearch.trainingPairs(ranking.toDF("qid", "id", "r"),
        corpus.toDF("id"), kHard, kRand, poolSize = 16)
      .orderBy(col("qid"), col("role"), col("pair_rank"))
      .as[(Long, Long, String, Long)].collect()

  test("positives are rank 1, hard negatives the next kHard ranks") {
    val out = run()
    out.filter(_._3 == "pos").map(r => (r._1, r._2)) shouldBe
      Seq((1L, 101L), (2L, 102L))
    out.filter(r => r._3 == "hard_neg" && r._1 == 1L).map(_._2) shouldBe
      Seq(102L, 103L)
    // query 2 has only one doc past rank 1
    out.filter(r => r._3 == "hard_neg" && r._1 == 2L).map(_._2) shouldBe
      Seq(105L)
  }

  test("random negatives exclude everything the retriever surfaced") {
    val out = run()
    val rand = out.filter(_._3 == "rand_neg")
    rand.count(_._1 == 1L) shouldBe 3
    rand.count(_._1 == 2L) shouldBe 3
    // q1 saw 101,102,103 within kHard+1; none may reappear
    rand.filter(_._1 == 1L).map(_._2).toSet
      .intersect(Set(101L, 102L, 103L)) shouldBe Set.empty
  }

  test("deterministic across runs") {
    run().toSeq shouldBe run().toSeq
  }

  test("poolSize must cover kRand") {
    an[IllegalArgumentException] should be thrownBy
      HybridSearch.trainingPairs(ranking.toDF("qid", "id", "r"),
        corpus.toDF("id"), 2, 10, poolSize = 5)
  }
}
