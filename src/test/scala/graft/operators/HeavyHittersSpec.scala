package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count–Min heavy hitters: exactness, width-independence (the sketch
  * only buys selectivity, never changes the answer), null exclusion,
  * and the broadcast shape of the probe. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // One 62.5%-share key over 60 four-row background keys (640 rows):
  // at 10% the threshold resolves to 64, so only "hot" qualifies.
  private def fixture = {
    val hot = Seq.fill(400)("hot")
    val cold = (0 until 60).flatMap(i => Seq.fill(4)(f"k$i%02d"))
    (hot ++ cold).toDF("k")
  }

  test("exact counts for the planted heavy key, nothing else") {
    val out = Analytics.heavyHitters(fixture, "k", minSharePpm = 100000L)
      .collect()
    out.map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("hot", 400L))
  }

  test("width-independent: width=1 (all collide) equals width=4096 equals the plain rollup") {
    val exact = fixture.groupBy($"k").agg(count(lit(1)).as("n"))
      .filter($"n" >= 64L)
      .as[(String, Long)].collect().toSet
    Seq(1, 4096).foreach { w =>
      val got = Analytics.heavyHitters(fixture, "k", 100000L, width = w)
        .as[(String, Long)].collect().toSet
      got shouldBe exact
    }
  }

  test("NULL keys are excluded from rows and from the threshold base") {
    // 400 hot + 240 cold + 360 nulls; with nulls excluded the base is
    // 640 and hot still clears 10%; were nulls counted the base would
    // be 1000 and the answer unchanged here, so pin the count instead:
    // n_rows must be the non-null 400, and no NULL row appears.
    val df = fixture.unionByName(
      Seq.fill(360)(Option.empty[String]).toDF("k"))
    val out = Analytics.heavyHitters(df, "k", 100000L).collect()
    out.map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("hot", 400L))
  }

  test("a key at exactly the threshold is kept (>=, not >)") {
    // 64 of 640 rows = exactly 10%.
    val df = (Seq.fill(64)("edge") ++
      (0 until 144).flatMap(i => Seq.fill(4)(f"k$i%03d"))).toDF("k")
    val out = Analytics.heavyHitters(df, "k", 100000L)
      .as[(String, Long)].collect().toSet
    out should contain(("edge", 64L))
  }

  test("probe joins broadcast the sketches; no sort-merge join in the plan") {
    val plan = Analytics.heavyHitters(fixture, "k", 100000L)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    (plan should not).include("SortMergeJoin")
  }
}
