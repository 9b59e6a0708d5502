package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Where does a query's wall time actually go? Runs ONE SparkEntry
  * query with a listener counting jobs / stages / tasks and summing
  * task time, then prints the split between cluster work and
  * driver-side orchestration (job count x scheduling latency, commit
  * protocol, planning). `wall >> task_time/cores` with a large job
  * count means the bottleneck is the DRIVER, and no executor tuning
  * will move it. Usage: ProfileQuery <sfDir> <queryName>. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val spark = GraftSession.forMain("graft-profile")
    // A/B the Verify stateful-phase tuning (tiny-slice orchestration)
    if (sys.env.get("SPARK_GRAFT_PROFILE_TUNED").contains("1")) {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    }
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val byCallSite =
      new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val name = s.stageInfo.name.takeWhile(_ != ':')
        byCallSite.computeIfAbsent(name, _ => new AtomicLong)
          .addAndGet(
            s.stageInfo.completionTime.getOrElse(0L) -
              s.stageInfo.submissionTime.getOrElse(0L))
        stages.incrementAndGet(): Unit
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        taskMs.addAndGet(t.taskInfo.duration): Unit
      }
    })
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wallSec = (System.nanoTime() - t0) / 1e9
    // listener bus is async; let the counters drain
    Thread.sleep(2000)
    println(f"""{"q":"$name","rows":$n,"wall_sec":$wallSec%.1f,""" +
      s""""jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},""" +
      f""""task_time_sec":${taskMs.get / 1e3}%.1f,""" +
      f""""ms_per_job":${if (jobs.get == 0) 0 else wallSec * 1000 / jobs.get}%.1f}""")
    import scala.jdk.CollectionConverters._
    byCallSite.asScala.toSeq.sortBy(-_._2.get).take(25).foreach {
      case (cs, ms) => println(f"[profile] ${ms.get / 1000.0}%8.1f s  $cs")
    }
    spark.stop()
    System.exit(0)
  }
}
