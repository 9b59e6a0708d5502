package graft.util

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bounded parallel execution for independent Spark jobs (e.g. the
  * three sample tiers of one import day — separate output tables, no
  * shared state). The Spark scheduler interleaves concurrently
  * submitted jobs across executor slots, which a serial per-tier loop
  * leaves idle. */
object Par {
  private val pool = ExecutionContext.fromExecutorService(
    Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    }))

  def foreach[A](items: Seq[A])(f: A => Unit): Unit =
    if (items.sizeIs <= 1) items.foreach(f)
    else {
      implicit val ec: ExecutionContext = pool
      Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf): Unit
    }

  def map[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.sizeIs <= 1) items.map(f)
    else {
      implicit val ec: ExecutionContext = pool
      Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
    }
}
