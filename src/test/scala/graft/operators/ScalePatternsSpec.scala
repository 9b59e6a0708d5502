package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 100 TB join patterns: salting for skew bombs, bucketing for
  * shuffle-free co-located joins, hash-index incremental dedup. */
class ScalePatternsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed fixture") {
    // one hot key (90% of probe rows) + a long tail
    val probe = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val build = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("k", "w")
    val plain = probe.join(build, "k").orderBy("k", "v", "w").collect()
    val salted = SkewJoin.saltedInner(probe, build, Seq("k"), salt = 8)
      .select("k", "v", "w").orderBy("k", "v", "w").collect()
    salted shouldBe plain
    plain.length shouldBe 1000
  }

  test("salted two-stage aggregation equals the plain GROUP BY on a skewed fixture") {
    // one hot key (90% of rows) + a tail; integer measure
    val rows = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val plain = rows.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .orderBy("k").collect()
    val salted = SkewJoin.saltedAgg(rows, "k", Seq("v"), salt = 8)
      .orderBy("k").collect()
    salted shouldBe plain
    // stage 1 genuinely spreads the hot key over multiple reducers
    val spread = rows
      .withColumn("_salt", pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
      .filter(col("k") === "hot").select("_salt").distinct().count()
    spread should be > 1L
  }

  test("joinCardinalityAudit: exact product sum and worst key, hand-checked") {
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("zA")).toDF("k")
    val b = (Seq.fill(4)("x") ++ Seq("y") ++ Seq("zB")).toDF("k")
    val r = Analytics.joinCardinalityAudit(a, "k", b, "k").collect().head
    r.getLong(0) shouldBe 6L // n_rows_a
    r.getLong(1) shouldBe 3L // n_keys_a
    r.getLong(2) shouldBe 6L // n_rows_b
    r.getLong(3) shouldBe 3L // n_keys_b
    r.getLong(4) shouldBe 2L // shared: x, y
    r.getLong(5) shouldBe 14L // 3*4 + 2*1
    r.getString(6) shouldBe "x"
    r.getLong(7) shouldBe 12L
    // disjoint keys: zero cardinality, null top
    val d = Analytics.joinCardinalityAudit(
      Seq("p").toDF("k"), "k", Seq("q").toDF("k"), "k").collect().head
    d.getLong(5) shouldBe 0L
    d.isNullAt(6) shouldBe true
  }

  test("bucketed tables sort-merge join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    // the in-memory catalog forgets tables between JVMs but their dirs
    // persist under the warehouse — clear the locations too
    Seq("bk_orders", "bk_lineitem").foreach { t =>
      graft.util.TmpDirs.deleteRecursively(s"target/spark-warehouse/$t")
    }
    graft.Tables.orders(spark, sfSmoke)
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bk_orders")
    graft.Tables.lineitem(spark, sfSmoke)
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bk_lineitem")
    val j = spark.table("bk_lineitem").hint("merge")
      .join(spark.table("bk_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.sparkPlan.toString
    // bucket-aligned scan feeds the SMJ directly: no hash repartitioning
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    j.count() shouldBe graft.Tables.lineitem(spark, sfSmoke).count()
  }

  test("q05 carries no broadcast hint, yet AQE still broadcasts at fixture scale") {
    val df = graft.SparkEntry.queries("q05_session_metadata")(spark, sfSmoke)
    // no literal hint anywhere in the analyzed plan — AQE must be free
    // to degrade to a shuffle join when the build side outgrows it
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "q05 should not force a join strategy with a literal hint")
    df.collect() // run so AQE finalizes its runtime strategy choice
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE should pick broadcast for the small build sides at sf0.001:\n$plan")
  }

  test("incremental dedup: batch 2 drops docs already in the hash index") {
    val b1 = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "ALPHA BETA  "), // seen (normalized) in batch 1
      (11L, "epsilon zeta"), // new
      (12L, "epsilon zeta"), // dup within batch 2
      (13L, "gamma delta")) // seen
      .toDF("doc_id", "text")
    val emptyIndex = Seq.empty[Long].toDF("h")
    val (s1, idx1) = TextDedup.dedupAgainstIndex(b1, "text", "doc_id", emptyIndex)
    s1.count() shouldBe 2
    idx1.count() shouldBe 2
    val (s2, idx2) = TextDedup.dedupAgainstIndex(b2, "text", "doc_id", idx1)
    s2.select($"doc_id").as[Long].collect().toSet shouldBe Set(11L)
    idx2.count() shouldBe 3 // alpha-beta, gamma-delta, epsilon-zeta
  }

  test("bloom-prefiltered incremental dedup is plan-different, answer-identical") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val index = docs.filter($"doc_id" % 10 < 8)
      .select(TextDedup.md5Hash60(TextDedup.norm($"text")).as("h"))
      .distinct()
    val batch = docs.filter($"doc_id" % 10 >= 8)
    val (plain, _) = TextDedup.dedupAgainstIndex(batch, "text", "doc_id", index)
    val (bloom, bloomIdx) = TextDedup.dedupAgainstIndexBloom(
      batch, "text", "doc_id", index, numBits = 1 << 16, numHashes = 7)
    bloom.select($"doc_id").as[Long].collect().sorted.toSeq shouldBe
      plain.select($"doc_id").as[Long].collect().sorted.toSeq
    bloomIdx.count() shouldBe
      TextDedup.dedupAgainstIndex(batch, "text", "doc_id", index)._2.count()
    // the sketch must actually prune: the definitely-new path bypasses
    // the anti-join, so the join input is a small fraction of the batch
    val sketch = index
      .agg(call_function("graft_bloom", $"h", lit(1 << 16), lit(7)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val fresh = TextDedup.exactDedup(batch, "text", "doc_id")
      .withColumn("_h", TextDedup.md5Hash60(TextDedup.norm($"text")))
    val nFresh = fresh.count()
    val nMaybe = fresh
      .filter(call_function("graft_bloom_contains", lit(sketch), $"_h")).count()
    // true dupes exist in the fixture, but the maybe-seen sliver must
    // stay well under the full batch (fp rate ~0 at 2^16 bits here)
    assert(nMaybe < nFresh,
      s"bloom prefilter pruned nothing: $nMaybe of $nFresh rows hit the join")
  }

  test("sharded bloom dedup ≡ monolithic ≡ plain, and never broadcasts the index") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val index = docs.filter($"doc_id" % 10 < 8)
      .select(TextDedup.md5Hash60(TextDedup.norm($"text")).as("h"))
      .distinct()
    val batch = docs.filter($"doc_id" % 10 >= 8)
    val (plain, plainIdx) =
      TextDedup.dedupAgainstIndex(batch, "text", "doc_id", index)
    // shard count deliberately not a power of two, bits/shard sized so
    // total bits match the monolithic spec's 2^16 budget
    val (sharded, shardedIdx) = TextDedup.dedupAgainstIndexBloomSharded(
      batch, "text", "doc_id", index,
      shards = 5, numBitsPerShard = 1 << 14, numHashes = 7)
    sharded.select($"doc_id").as[Long].collect().sorted.toSeq shouldBe
      plain.select($"doc_id").as[Long].collect().sorted.toSeq
    shardedIdx.count() shouldBe plainIdx.count()
    // no false negatives shard-wise: every indexed hash must flag
    // maybe-seen when probed through its own shard's sketch
    val sketches = index
      .groupBy(pmod($"h", lit(5L)).cast("int").as("_shard"))
      .agg(call_function("graft_bloom", $"h", lit(1 << 14), lit(7)).as("_bf"))
    val missed = index
      .withColumn("_shard", pmod($"h", lit(5L)).cast("int"))
      .join(sketches, Seq("_shard"))
      .filter(!call_function("graft_bloom_contains", $"_bf", $"h"))
      .count()
    missed shouldBe 0L
    // the scale property: the index itself is never collected — only
    // the 5-row (shard, sketch) relation exists outside the index scan.
    // A degenerate single shard must also equal the monolithic form.
    val (one, _) = TextDedup.dedupAgainstIndexBloomSharded(
      batch, "text", "doc_id", index,
      shards = 1, numBitsPerShard = 1 << 16, numHashes = 7)
    one.select($"doc_id").as[Long].collect().sorted.toSeq shouldBe
      plain.select($"doc_id").as[Long].collect().sorted.toSeq
  }

  test("lineDedup: no cartesian, no forced hint; AQE broadcasts the boiler set") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val df = TextDedup.lineDedup(docs, "doc_id", "text", sep = " ", minDocs = 3)
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "lineDedup must not force a join strategy — AQE decides")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"lineDedup planned a product join:\n$plan")
    // the Zipf-bounded boilerplate set is the build side at fixture scale
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE should broadcast the corpus-frequent line set:\n$plan")
  }

  test("shuffleAssign plans exactly one exchange (the by-shard partition)") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val df = Curation.shuffleAssign(docs, "doc_id", nShards = 4)
    df.collect()
    // the AQE toString prints the Initial Plan below the Final one —
    // count exchanges in the final plan only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 shuffle (by shard), found $exchanges:\n$plan")
  }

  test("hashedQualityScore: map-side column math, single by-doc aggregation") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val df = TextAnalysis.hashedQualityScore(docs, "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // no join anywhere: the weight table is a closed form, not a lookup
    assert(!plan.contains("Join"), s"scorer should not join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 shuffle (the doc rollup), found $exchanges:\n$plan")
  }
}
