package graft.operators

import graft.SparkSpec

/** Audience overlap: hand-counted Jaccard, zero-overlap rows kept,
  * repeat events collapse, NULL exclusion. */
class AudienceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Analytics.audienceOverlap(rows.toDF("user_id", "event_type"),
        "event_type", "user_id")
      .orderBy("type_a", "type_b")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq

  test("hand case: three types, one shared user each way") {
    // view: {u1,u2,u3}; buy: {u2,u4}; err: {u5}.
    val rows = Seq(("u1", "view"), ("u2", "view"), ("u3", "view"),
      ("u2", "buy"), ("u4", "buy"), ("u5", "err"))
    run(rows) shouldBe Seq(
      // buy∩err = 0 of 3; buy∩view = {u2}: 1 of 4; err∩view = 0 of 4.
      ("buy", "err", 2L, 1L, 0L, 0L),
      ("buy", "view", 2L, 3L, 1L, 250000L),
      ("err", "view", 1L, 3L, 0L, 0L))
  }

  test("repeat events do not inflate the audience") {
    val rows = Seq.fill(10)(("u1", "view")) ++ Seq.fill(3)(("u1", "buy"))
    run(rows) shouldBe Seq(("buy", "view", 1L, 1L, 1L, 1000000L))
  }

  test("identical audiences score exactly 1e6") {
    val rows = Seq(("u1", "a"), ("u2", "a"), ("u1", "b"), ("u2", "b"))
    run(rows) shouldBe Seq(("a", "b", 2L, 2L, 2L, 1000000L))
  }

  test("NULL users and types are excluded") {
    val rows = Seq(("u1", "a"), ("u1", "b"))
    val df = rows.toDF("user_id", "event_type").unionByName(
      Seq((null.asInstanceOf[String], "a"), ("u9", null.asInstanceOf[String]))
        .toDF("user_id", "event_type"))
    Analytics.audienceOverlap(df, "event_type", "user_id")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq shouldBe
      Seq(("a", "b", 1L, 1L, 1L, 1000000L))
  }
}
