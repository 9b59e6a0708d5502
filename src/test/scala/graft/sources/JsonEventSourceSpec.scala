package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas
import graft.util.TmpDirs

class JsonEventSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(name: String, lines: Seq[String]): String = {
    val dir = TmpDirs.fresh(s"spec-json-$name")
    val file = s"$dir/activity-2024-01-01.json"
    CsvEventSource.appendLines(spark, file, lines)
    file
  }

  test("missing and null string fields normalize to '', never null") {
    val file = writeFixture("nulls", Seq(
      """{"timestamp":1704100000,"ua_browser":"firefox","uid":"u1","type":"login"}""",
      """{"timestamp":1704100001,"ua_browser":"chrome","uid":"u2","type":"login","service":null}"""))
    val out = JsonEventSource.readDay(spark, file, Schemas.activity, persist = false)
    out.count() shouldBe 2
    out.filter(col("service").isNull).count() shouldBe 0
    out.filter(col("service") === "").count() shouldBe 2
    out.filter(col("device_id") === "").count() shouldBe 2
  }

  test("MAXERROR: corrupt JSON and unparseable timestamps count; exceeding aborts") {
    val lines = Seq(
      """{"timestamp":1704100000,"ua_browser":"b","uid":"u","type":"t"}""",
      """this is not json""",
      """{"timestamp":"not_a_number","uid":"u","type":"t"}""",
      """{"ua_browser":"no ts at all"}""")
    val ok = JsonEventSource.readDay(spark,
      writeFixture("maxerr-ok", lines), Schemas.activity,
      maxError = 3, persist = false)
    ok.count() shouldBe 1
    an[CsvEventSource.MaxErrorExceeded] should be thrownBy
      JsonEventSource.readDay(spark,
        writeFixture("maxerr-bad", lines), Schemas.activity,
        maxError = 2, persist = false).count()
  }

  test("TRUNCATECOLUMNS: strings clip to declared width; number tokens type as strings") {
    val file = writeFixture("trunc", Seq(
      s"""{"timestamp":"1704100000","ua_browser":"${"x" * 60}","uid":"u","type":"t","service":123}"""))
    val row = JsonEventSource.readDay(spark, file, Schemas.activity, persist = false)
      .select(col("timestamp"),
        org.apache.spark.sql.functions.length(col("ua_browser")),
        col("service")).head()
    row.getLong(0) shouldBe 1704100000L
    row.getInt(1) shouldBe 40 // activity ua_browser width
    row.getString(2) shouldBe "123" // JSON number coerces to its string form
  }

  test("day discovery lists .json files with the shared prefix-day parsing") {
    val dir = TmpDirs.fresh("spec-json-days")
    CsvEventSource.appendLines(spark, s"$dir/activity-2024-01-02.json", Seq("{}"))
    CsvEventSource.appendLines(spark, s"$dir/activity-2024-01-01.json", Seq("{}"))
    CsvEventSource.appendLines(spark, s"$dir/other-2024-01-03.json", Seq("{}"))
    JsonEventSource.listDays(spark, dir, "activity").map(_._1.toString) shouldBe
      Seq("2024-01-01", "2024-01-02")
  }

  test("round trip: writeLanding then readDay reproduces the staging frame") {
    val staged = Seq(
      (1704100000L, "b0", "v1", "os0", "aabbccdd", "login", "", "d1", "2024-01-01"),
      (1704186400L, "b1", "v2", "os1", "ddccbbaa", "logout", "svc", "", "2024-01-02"))
      .toDF("timestamp", "ua_browser", "ua_version", "ua_os", "uid", "type",
        "service", "device_id", "day")
    val dir = TmpDirs.fresh("spec-json-roundtrip")
    val days = JsonEventSource.writeLanding(spark, staged, dir, "activity")
    days.map(_.toString) shouldBe Seq("2024-01-01", "2024-01-02")
    val back = JsonEventSource.listDays(spark, dir, "activity")
      .map { case (_, f) =>
        JsonEventSource.readDay(spark, f, Schemas.activity, persist = false)
      }
      .reduce(_ unionAll _)
    back.orderBy("timestamp").collect().map(_.toSeq) shouldBe
      staged.drop("day").orderBy("timestamp").collect().map(_.toSeq)
  }
}
