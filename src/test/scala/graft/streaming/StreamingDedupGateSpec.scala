package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextDedup

case class Doc(doc_id: Long, text: String)

/** The streaming Bloom membership gate: per-arrival dedup against a
  * static index, stateless on the stream side — multi-batch replay
  * must equal the batch anti-join, and cross-batch behavior must be
  * pure membership (no stream-side state). */
class StreamingDedupGateSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch streamed gate equals the batch anti-join") {
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.documents(spark, sfSmoke)
    val seen = d.filter($"doc_id" < 400)
      .select(TextDedup.md5Hash60(TextDedup.norm($"text")).as("h")).distinct()
    val arriving = d.filter($"doc_id" >= 400)
      .select($"doc_id", $"text").as[Doc].collect().toSeq

    val input = MemoryStream[Doc]
    val q = TextDedup.streamingDedupGate(input.toDS().toDF(), "text", "doc_id",
        seen, shards = 8)
      .select($"doc_id")
      .writeStream.format("memory").queryName("bloom_gate")
      .outputMode("append").start()
    val streamed = try {
      arriving.grouped(40).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      spark.table("bloom_gate").select($"doc_id").as[Long].collect().toSet
    } finally q.stop()

    val batchExpected = TextDedup.streamingDedupGate(
        d.filter($"doc_id" >= 400).select($"doc_id", $"text"),
        "text", "doc_id", seen, shards = 8)
      .select($"doc_id").as[Long].collect().toSet
    streamed shouldBe batchExpected

    // and the batch form is the plain membership anti-join
    val antiJoin = d.filter($"doc_id" >= 400)
      .select($"doc_id", TextDedup.md5Hash60(TextDedup.norm($"text")).as("h"))
      .join(seen, Seq("h"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    streamed shouldBe antiJoin
  }

  test("gate is pure membership: an arrival never blocks a later identical arrival") {
    implicit val sqlCtx = spark.sqlContext
    val seen = Seq(0L).toDF("x")
      .select(TextDedup.md5Hash60(TextDedup.norm(lit("indexed text"))).as("h"))
    val input = MemoryStream[Doc]
    val q = TextDedup.streamingDedupGate(input.toDS().toDF(), "text", "doc_id",
        seen, shards = 2)
      .select($"doc_id")
      .writeStream.format("memory").queryName("bloom_gate2")
      .outputMode("append").start()
    try {
      input.addData(Doc(1L, "fresh text"), Doc(2L, "indexed text"))
      q.processAllAvailable()
      input.addData(Doc(3L, "fresh text")) // same text, later batch
      q.processAllAvailable()
      val ids = spark.table("bloom_gate2").select($"doc_id").as[Long]
        .collect().toSet
      // 2 dropped (in index); 1 AND 3 both pass — the gate holds no
      // stream-side state, per-arrival membership only
      ids shouldBe Set(1L, 3L)
    } finally q.stop()
  }
}
