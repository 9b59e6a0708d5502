package graft.util

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bounded parallel execution for independent Spark jobs (e.g. the
  * three sample tiers of one import day — separate output tables, no
  * shared state). The Spark scheduler interleaves concurrently
  * submitted jobs across executor slots, which a serial per-tier loop
  * leaves idle.
  *
  * Nested calls run INLINE: the fixed pool blocks its callers with
  * Await, so a Par call from inside a Par task would deadlock once
  * all pool threads block awaiting inner futures. Re-entry is detected
  * by thread name and degrades to the sequential loop — same results,
  * no extra parallelism, no deadlock.
  */
object Par {
  private val threadName = "graft-par"

  /** Pool width: cores/4, floored at the historical 4 (round-15
    * measurement: the per-day ingest pipelines submit ~30 tiny
    * single-task jobs; at width 4 they drain in ~8 serialized waves
    * of ~200 ms scheduling latency each on a 32-core box). Each
    * submitted job is day/tier-sized and independent, so the width
    * scales with the machine rather than pinning to either a laptop
    * or this box. */
  private val pool = ExecutionContext.fromExecutorService(
    Executors.newFixedThreadPool(
      math.max(4, Runtime.getRuntime.availableProcessors / 4), r => {
      val t = new Thread(r, threadName)
      t.setDaemon(true)
      t
    }))

  private def onParThread: Boolean =
    Thread.currentThread().getName == threadName

  def foreach[A](items: Seq[A])(f: A => Unit): Unit =
    if (items.sizeIs <= 1 || onParThread) items.foreach(f)
    else {
      implicit val ec: ExecutionContext = pool
      Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf): Unit
    }

  def map[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.sizeIs <= 1 || onParThread) items.map(f)
    else {
      implicit val ec: ExecutionContext = pool
      Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
    }
}
