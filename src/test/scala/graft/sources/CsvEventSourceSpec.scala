package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas
import graft.util.TmpDirs

class CsvEventSourceSpec extends SparkSpec {
  import spark.implicits._
  import CsvEventSource._

  // activity CSV layout: ts,ua_browser,ua_version,ua_os,uid,type,service,device_id
  private val good = Seq(
    "1704100000,firefox,1.0,linux,abcdef0123456789,login,sync,dev1",
    "1704100001,chrome,2.0,mac,fedcba9876543210,login,,dev2", // empty service
    "1704100002,firefox,1.0,linux,abcdef0123456789,logout,sync,dev1")

  private def writeFixture(name: String, lines: Seq[String]): String = {
    val dir = TmpDirs.fresh(s"spec-csv-$name")
    val file = s"$dir/activity-2024-01-01.csv"
    appendLines(spark, file, lines)
    file
  }

  test("A6: blocklist drops injection-looking lines, case-insensitively") {
    val junk = Seq(
      """1704100003,"quoted",1.0,linux,aa,login,s,d""",
      "1704100004,it's,1.0,linux,aa,login,s,d",
      "1704100005,x`y,1.0,linux,aa,login,s,d",
      "1704100006,a;b,1.0,linux,aa,login,s,d",
      "1704100007,<tag>,1.0,linux,aa,login,s,d",
      "1704100008,back\\slash,1.0,linux,aa,login,s,d",
      "1704100009,././etc,1.0,linux,aa,login,s,d",
      "1704100010,SeLeCt 1,1.0,linux,aa,login,s,d",
      "1704100011,DECLARE x,1.0,linux,aa,login,s,d",
      "1704100012,x.burpcollaborator.net,1.0,linux,aa,login,s,d",
      "1704100013,nslookup evil,1.0,linux,aa,login,s,d",
      "1704100014,file:///etc/passwd,1.0,linux,aa,login,s,d")
    val file = writeFixture("blocklist", good ++ junk)
    val df = readDay(spark, file, Schemas.activity, Strict, maxError = 100, persist = false)
    df.count() shouldBe good.size
  }

  test("A7 Strict: wrong field count is dropped (clean-flow-data.sh:48)") {
    val file = writeFixture("strict",
      good ++ Seq("1704100003,only,three", "1704100004,a,b,c,d,e,f,g,EXTRA"))
    val df = readDay(spark, file, Schemas.activity, Strict, persist = false)
    df.count() shouldBe good.size
  }

  test("A7 Pad: short lines are padded with empty strings; long lines become error rows") {
    val file = writeFixture("pad",
      good ++ Seq("1704100003,firefox", "1704100004,a,b,c,d,e,f,g,EXTRA"))
    val df = readDay(spark, file, Schemas.activity, Pad, maxError = 100, persist = false)
    df.count() shouldBe good.size + 1 // padded line survives, over-long doesn't
    val padded = df.filter($"timestamp" === 1704100003L)
    padded.select($"ua_version", $"uid", $"device_id").as[(String, String, String)]
      .head() shouldBe (("", "", ""))
  }

  test("A1 MAXERROR: too many unparseable rows aborts the load") {
    val bad = (1 to 5).map(i => s"not_a_timestamp_$i,b,v,o,u,t,s,d")
    val file = writeFixture("maxerror", good ++ bad)
    val ok = readDay(spark, file, Schemas.activity, Strict, maxError = 5, persist = false)
    ok.count() shouldBe good.size // 5 errors <= MAXERROR 5: load succeeds
    val e = intercept[MaxErrorExceeded] {
      readDay(spark, writeFixture("maxerror2", good ++ bad), Schemas.activity,
        Strict, maxError = 4, persist = false)
    }
    e.errors shouldBe 5
  }

  test("A1 TRUNCATECOLUMNS: over-width strings are silently truncated") {
    val longBrowser = "x" * 55
    val file = writeFixture("trunc",
      Seq(s"1704100000,$longBrowser,1.0,linux,abc,login,s,d"))
    val df = readDay(spark, file, Schemas.activity, Strict, persist = false)
    df.select(org.apache.spark.sql.functions.length($"ua_browser"))
      .as[Int].head() shouldBe 40
  }

  test("''-vs-null policy: empty CSV fields are empty strings, never null") {
    val file = writeFixture("empty", good)
    val df = readDay(spark, file, Schemas.activity, Strict, persist = false)
    val row = df.filter($"service" === "").select($"ua_browser", $"service")
    row.count() shouldBe 1 // the `= ''` predicate works (B7/B8 depend on it)
    df.filter($"service".isNull).count() shouldBe 0
  }

  test("A2: listDays parses YYYY-MM-DD from the filename tail") {
    val dir = TmpDirs.fresh("spec-csv-listing")
    appendLines(spark, s"$dir/events-2024-01-03.csv", Seq("x"))
    appendLines(spark, s"$dir/events-2024-01-01.csv", Seq("x"))
    appendLines(spark, s"$dir/other-2024-01-02.csv", Seq("x"))
    appendLines(spark, s"$dir/events-garbage.csv", Seq("x"))
    val days = listDays(spark, dir, "events").map(_._1.toString)
    days shouldBe Seq("2024-01-01", "2024-01-03")
  }

  test("round trip: writeLanding then readDay reproduces the rows") {
    val dir = TmpDirs.fresh("spec-csv-roundtrip")
    val df = Seq(
      (1704100000L, "firefox", "1.0", "linux", "aa", "login", "", "d1", "2024-01-01"),
      (1704186400L, "chrome", "2.0", "mac", "bb", "login", "svc", "d2", "2024-01-02"))
      .toDF("timestamp", "ua_browser", "ua_version", "ua_os", "uid", "type",
        "service", "device_id", "day")
    writeLanding(spark, df, dir, "activity").map(_.toString) shouldBe
      Seq("2024-01-01", "2024-01-02")
    val day1 = readDay(spark, s"$dir/activity-2024-01-01.csv", Schemas.activity,
      Strict, persist = false)
    day1.select($"timestamp", $"ua_browser", $"service")
      .as[(Long, String, String)].head() shouldBe ((1704100000L, "firefox", ""))
  }
}
