package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def cohortOf(ids: String*): Seq[Option[Long]] =
    ids.toDF("id").select(hexPrefixCohort($"id")).as[Option[Long]].collect().toSeq

  test("F2: cohort uses the FIRST 7 hex chars (the FROM 0 FOR 8 quirk), not 8") {
    // 0xfffffff = 268435455; % 100 = 55. If 8 chars were used this would
    // be 0xffffffff % 100 = 95 — the regression SURVEY §7.4 ranks #4.
    cohortOf("ffffffff") shouldBe Seq(Some(55L))
    cohortOf("0000000a") shouldBe Seq(Some(0L)) // 0x0000000 = 0
    cohortOf("00000010") shouldBe Seq(Some(1L)) // 0x0000001 = 1
  }

  test("F2: the 8th character never affects the cohort (property, 100 seeded cases)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(100) {
      val prefix = f"${rnd.nextInt() & 0xfffffff}%07x"
      (prefix, prefix + "0123456789abcdef".charAt(rnd.nextInt(16)))
    }
    val pairs = cases.flatMap { case (a, b) => Seq(a, b) }
    val cohorts = cohortOf(pairs: _*)
    cohorts.grouped(2).foreach { case Seq(a, b) => a shouldBe b }
  }

  test("F2: tier membership is nested — cohort<10 implies cohort<50 (property, 200 seeded cases)") {
    val rnd = new scala.util.Random(7)
    val ids = Seq.fill(200)(f"${rnd.nextLong() & 0xffffffffL}%08x")
    cohortOf(ids: _*).foreach { c =>
      val v = c.get
      if (v < 10) assert(v < 50 && v < 100)
      assert(v >= 0 && v < 100)
    }
  }

  test("F2: null, empty and non-hex ids get a NULL cohort (no tier)") {
    cohortOf("", "zzz", "not-hex!") shouldBe Seq(None, None, None)
    Seq[Option[String]](None).toDF("id").select(hexPrefixCohort($"id"))
      .as[Option[Long]].head() shouldBe None
  }

  test("F3: continuedFrom extracts the 64 chars after the 15-char prefix") {
    val flowId = "a" * 32
    Seq(s"flow.continued.$flowId").toDF("type")
      .select(continuedFrom($"type")).as[String].head() shouldBe flowId
  }

  test("F4: splitPart is 1-based and returns '' when out of range") {
    val df = Seq("flow.experiment.exp3.c1").toDF("s")
    df.select(
      splitPart($"s", ".", 3), splitPart($"s", ".", 4), splitPart($"s", ".", 9))
      .as[(String, String, String)].head() shouldBe (("exp3", "c1", ""))
  }

  test("B8: emptyBackfill fills only blank strings, not nulls-only semantics") {
    val df = Seq(("", "fb"), ("kept", "fb")).toDF("primary", "fallback")
    df.select(emptyBackfill($"primary", $"fallback")).as[String]
      .collect().toSeq shouldBe Seq("fb", "kept")
  }

  test("F1: epochSecondsToTs matches 'epoch'::TIMESTAMP + n seconds") {
    Seq(1704100000L).toDF("secs").select(epochSecondsToTs($"secs").cast("string"))
      .as[String].head() shouldBe "2024-01-01 09:06:40"
  }
}
