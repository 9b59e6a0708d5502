package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.forMain("graft-bench")
    // Warm the JVM/codegen/IO paths once so the first measured query
    // doesn't absorb session startup (measures queries, not JIT).
    Tables.lineitem(spark, sfDir).limit(1).collect()
    val results = SparkEntry.benchQueries.map(n => n -> SparkEntry.queries(n)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full plan executes (a bare .count() can let Spark skip
      // evaluating projected expressions under column pruning).
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // no cross-query cache accumulation
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
