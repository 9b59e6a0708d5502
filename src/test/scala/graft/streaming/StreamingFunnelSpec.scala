package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Analytics
import graft.streaming.StreamingFunnel.UserEvent

/** StreamingFunnel: the order-proof property (a LATE first-step
  * arrival re-evaluates the chain), strict-< tie semantics, and
  * multi-batch replay equality with the batch funnel evaluation. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("signup", "view", "click")
  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(u: Long, t: String, typ: String) = UserEvent(u, ts(t), typ)

  /** Run events through reach() in the given batches; a final far-
    * future tick batch (user −1) advances the watermark past every
    * timeout, then one more fires them. */
  private def run(batches: Seq[Seq[UserEvent]]): Map[Long, Int] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val name = s"funnel_${System.nanoTime()}"
    val q = StreamingFunnel.reach(steps)(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(ev(-1L, "2024-03-01 00:00:00", "tick"))
      q.processAllAvailable()
      input.addData(ev(-2L, "2024-03-09 00:00:00", "tick"))
      q.processAllAvailable()
      spark.table(name).filter($"user_id" >= 0)
        .as[(Long, Int)].collect().toMap
    } finally q.stop()
  }

  test("late-arriving first step retroactively completes the chain") {
    // view and click arrive FIRST (processing order), the earlier
    // signup arrives in a later batch — the funnel must still read
    // signup < view < click in EVENT time and report 3
    val out = run(Seq(
      Seq(ev(1, "2024-01-01 11:00:00", "view"),
        ev(1, "2024-01-01 12:00:00", "click")),
      Seq(ev(1, "2024-01-01 10:00:00", "signup"))))
    out(1L) shouldBe 3
  }

  test("equal first-touch timestamps do NOT advance (strict <)") {
    val out = run(Seq(Seq(
      ev(2, "2024-01-01 10:00:00", "signup"),
      ev(2, "2024-01-01 10:00:00", "view"), // tie with signup
      ev(2, "2024-01-01 11:00:00", "click"))))
    out(2L) shouldBe 1
  }

  test("stop does not flush state; checkpointed state drains after restart") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val ckpt = graft.util.TmpDirs.fresh("funnel_drain_ckpt")
    val got = scala.collection.mutable.Set[(Long, Int)]()
    def start() = StreamingFunnel.reach(steps)(input.toDS())
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingFunnel.UserReach], _: Long) =>
          val rows = b.collect().map(r => (r.user_id, r.steps_reached))
          got.synchronized { got ++= rows }: Unit
      }
      .outputMode("append").start()
    val q1 = start()
    try {
      // user 5 completes the chain in event time, but the watermark
      // never passes its 25 h lateness window in this run
      input.addData(
        ev(5, "2024-01-01 10:00:00", "signup"),
        ev(5, "2024-01-01 11:00:00", "view"),
        ev(5, "2024-01-01 12:00:00", "click"))
      q1.processAllAvailable()
      // stop ≠ flush: NO row may emit for the still-open user
      got.synchronized(got.toSet) shouldBe Set.empty
    } finally q1.stop()
    // restart from the checkpoint; far-future ticks advance the
    // watermark past user 5's timeout and the held state drains
    val q2 = start()
    try {
      input.addData(ev(-1L, "2024-03-01 00:00:00", "tick"))
      q2.processAllAvailable()
      input.addData(ev(-2L, "2024-03-09 00:00:00", "tick"))
      q2.processAllAvailable()
      got.synchronized(got.toSet).filter(_._1 >= 0) shouldBe Set((5L, 3))
    } finally q2.stop()
  }

  test("windowedReach: buffered state survives deadline re-basing by a late first step") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val name = s"wfunnel_${System.nanoTime()}"
    val q = StreamingFunnel.windowedReach(Seq("signup", "view"), 3600L)(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // two views arrive BEFORE the signup; the early one (10:30) is
      // the per-step MINIMUM but does not qualify once the late signup
      // (12:00) lands — only buffered state can still find 12:30
      input.addData(
        ev(1, "2024-01-01 10:30:00", "view"),
        ev(1, "2024-01-01 12:30:00", "view"))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 12:00:00", "signup"))
      q.processAllAvailable()
      input.addData(ev(-1L, "2024-03-01 00:00:00", "tick"))
      q.processAllAvailable()
      input.addData(ev(-2L, "2024-03-09 00:00:00", "tick"))
      q.processAllAvailable()
      spark.table(name).filter($"user_id" === 1L)
        .as[(Long, Int)].collect().toSeq shouldBe Seq((1L, 2))
    } finally q.stop()
  }

  test("windowedReach replay equals the batch windowedFunnel counts") {
    implicit val sqlCtx = spark.sqlContext
    val all = (0 until 120).map { i =>
      val u = (i % 10).toLong
      val typ = Seq("signup", "view", "click", "other")(i % 4)
      ev(u, f"2024-01-01 ${8 + i / 12}%02d:${i % 60}%02d:00", typ)
    }
    val w = 1800L // 30 min deadline binds at this event spacing
    val input = MemoryStream[UserEvent]
    val name = s"wfunnel_par_${System.nanoTime()}"
    val q = StreamingFunnel.windowedReach(steps, w)(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val streamed = try {
      all.grouped(40).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(ev(-1L, "2024-03-01 00:00:00", "tick"))
      q.processAllAvailable()
      input.addData(ev(-2L, "2024-03-09 00:00:00", "tick"))
      q.processAllAvailable()
      val reach = spark.table(name).filter($"user_id" >= 0)
        .as[(Long, Int)].collect().toMap
      steps.indices.map(k => reach.values.count(_ >= k + 1).toLong)
    } finally q.stop()
    val batch = Analytics.windowedFunnel(
        all.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps, w)
      .orderBy("step_idx").select("n_users")
      .as[Long].collect().toSeq
    streamed shouldBe batch
  }

  test("multi-batch replay equals the batch evaluation over many users") {
    val all = (0 until 90).map { i =>
      val u = (i % 9).toLong
      val typ = Seq("signup", "view", "click", "other")(i % 4)
      ev(u, f"2024-01-01 ${8 + i / 10}%02d:${i % 60}%02d:00", typ)
    }
    val out = run(all.grouped(30).toSeq.map(_.toSeq))
    // independent batch evaluation of the same contract
    val expected = all.groupBy(_.user_id).map { case (u, es) =>
      val mins = steps.map(st =>
        es.filter(_.event_type == st).map(_.ts.getTime).minOption)
      var r = 0
      if (mins.head.isDefined) {
        r = 1
        var i = 1
        while (i < mins.length && mins(i).isDefined &&
          mins(i - 1).get < mins(i).get) { r += 1; i += 1 }
      }
      u -> r
    }
    out shouldBe expected
  }
}
