package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** schemaDriftAudit: all four statuses, null-rate movement on kept
  * columns, and NULL ppms on the side a column doesn't exist. */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("statuses and null ppms, hand-checked") {
    val oldDf = Seq((1L, Some("a"), 1.0), (2L, None, 2.0),
      (3L, Some("c"), 3.0), (4L, Some("d"), 4.0))
      .toDF("id", "name", "score")
    val newDf = Seq((1L, "a", "1"), (2L, "b", "2"))
      .toDF("id", "name", "score")
      .select(col("id"), col("name"), col("score"),
        lit(null).cast("string").as("tag"))
    val out = Curation.schemaDriftAudit(oldDf, newDf)
      .orderBy("column")
      .as[(String, String, Option[String], Option[String],
        Option[Long], Option[Long])].collect()
    out shouldBe Array(
      ("id", "kept", Some("bigint"), Some("bigint"), Some(0L), Some(0L)),
      ("name", "kept", Some("string"), Some("string"),
        Some(250000L), Some(0L)), // 1-in-4 null healed
      ("score", "type_changed", Some("double"), Some("string"),
        Some(0L), Some(0L)),
      ("tag", "added", None, Some("string"), None, Some(1000000L)))
  }

  test("a removed column reports its old null rate and a NULL new side") {
    val oldDf = Seq((1L, Some("x")), (2L, None)).toDF("id", "gone")
    val newDf = Seq(Tuple1(1L)).toDF("id")
    val row = Curation.schemaDriftAudit(oldDf, newDf)
      .filter(col("column") === "gone")
      .as[(String, String, Option[String], Option[String],
        Option[Long], Option[Long])].collect().head
    row shouldBe (("gone", "removed", Some("string"), None,
      Some(500000L), None))
  }
}
