package graft.operators

import graft.SparkSpec

/** editDistanceJoin: all four ED ≤ 1 cases match (equal, substitute,
  * insert, delete), ED = 2 strings produce no candidate at all, and
  * same-id pairs are excluded. */
class EditDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  test("equal/substitute/insert/delete all match; distant strings do not") {
    val left = Seq((1L, "abc")).toDF("id", "name")
    val right = Seq((2L, "abc"), (3L, "abX"), (4L, "abcd"),
      (5L, "ab"), (6L, "xyz"), (7L, "aXY")).toDF("id", "name")
    val out = TextDedup.editDistanceJoin(left, right, "id", "name")
      .orderBy("right_id")
      .as[(Long, Long, String, String, Long)].collect()
    out shouldBe Array(
      (1L, 2L, "abc", "abc", 0L),
      (1L, 3L, "abc", "abX", 1L),
      (1L, 4L, "abc", "abcd", 1L),
      (1L, 5L, "abc", "ab", 1L))
  }

  test("same-id pairs are excluded; duplicate shared variants emit one pair") {
    val side = Seq((1L, "aa"), (2L, "ab")).toDF("id", "name")
    val out = TextDedup.editDistanceJoin(side, side, "id", "name")
      .as[(Long, Long, String, String, Long)].collect().sortBy(r => (r._1, r._2))
    // "aa" vs "ab": substitution, shares variant "a" from BOTH delete
    // positions of "aa" — still exactly one (1,2) and one (2,1) pair
    out shouldBe Array(
      (1L, 2L, "aa", "ab", 1L), (2L, 1L, "ab", "aa", 1L))
  }
}
