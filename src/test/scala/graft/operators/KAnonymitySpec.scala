package graft.operators

import graft.SparkSpec

/** kAnonymityAudit: hand-checked violating mass, the all-anonymous
  * case, and NULL quasi-values forming their own class. */
class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked: classes below k contribute rows and groups") {
    // classes: (a,1)x3, (a,2)x1, (b,1)x2 — at k=3 the last two violate
    val rows = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1),
      ("b", 1)).toDF("x", "y")
    val r = Curation.kAnonymityAudit(rows, Seq("x", "y"), k = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    r shouldBe ((6L, 3L, 3L, 2L, 3L, 1L, 500000L))
  }

  test("an all-anonymous dataset reports zero violations") {
    val rows = Seq.fill(4)(("a", 1)).toDF("x", "y")
    val r = Curation.kAnonymityAudit(rows, Seq("x", "y"), k = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    r shouldBe ((4L, 1L, 4L, 0L, 0L, 4L, 0L))
  }

  test("NULL quasi-values form their own equivalence class") {
    val rows = Seq(Some("a"), None, None).toDF("x")
    val r = Curation.kAnonymityAudit(rows, Seq("x"), k = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // class 'a' (1 row) violates; class NULL (2 rows) does not
    r shouldBe ((3L, 2L, 2L, 1L, 1L, 1L, 333333L))
  }
}
