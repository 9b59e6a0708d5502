package graft

/** Contract checks for the concurrent Verify (round-12 verdict ask #1):
  * the stateful/pure partition, the heavy-first ordering hints, and the
  * Tables memo — the three pieces that let 264 queries share one
  * session safely.
  */
class VerifyContractSpec extends SparkSpec {

  test("statefulQueries is a subset of the query registry") {
    val unknown = SparkEntry.statefulQueries.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"stateful names not in queries: $unknown")
  }

  test("every streaming gate is classified stateful (checkpoint dirs)") {
    val gates = SparkEntry.streamingGates.map(_._1).toSet
    val missing = gates.diff(SparkEntry.statefulQueries)
    assert(missing.isEmpty, s"streaming gates missing from stateful: $missing")
  }

  test("stateful groups only name stateful queries") {
    val unknown = SparkEntry.statefulGroups.keySet
      .diff(SparkEntry.statefulQueries)
    assert(unknown.isEmpty, s"grouped names not stateful: $unknown")
    // the two memoized pipelines each keep their callers in ONE group
    SparkEntry.statefulGroupOf("q12_flow_metadata_cascade") shouldBe
      SparkEntry.statefulGroupOf("q14_flow_events_absorbed")
    SparkEntry.statefulGroupOf("q11_activity_import_tiers") shouldBe
      SparkEntry.statefulGroupOf("q15_daily_devices_rollup")
    // an unlisted stateful query is its own singleton group
    SparkEntry.statefulGroupOf("q41_run_import_e2e") shouldBe
      "q41_run_import_e2e"
  }

  test("heavy-first hints name real PURE queries") {
    val unknown = Verify.heavyFirst.toSet.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"heavyFirst names not in queries: $unknown")
    val misplaced = Verify.heavyFirst.toSet.intersect(SparkEntry.statefulQueries)
    assert(misplaced.isEmpty,
      s"heavyFirst entries that are stateful (run sequentially anyway): $misplaced")
  }

  test("Tables memo returns one cached DataFrame per (dir, table)") {
    try {
      Tables.enableMemo()
      val a = Tables.load(spark, sfSmoke, "nation")
      val b = Tables.load(spark, sfSmoke, "nation")
      assert(a eq b, "memoized load must return the same DataFrame object")
      assert(a.storageLevel.useMemory, "memoized table must be cache-marked")
    } finally {
      Tables.disableMemoForTests()
      spark.catalog.clearCache()
    }
    // and OFF by default again: two plain loads are distinct objects
    val c = Tables.load(spark, sfSmoke, "nation")
    val d = Tables.load(spark, sfSmoke, "nation")
    assert(!(c eq d), "memo must stay opt-in (Bench measures real scans)")
  }
}
