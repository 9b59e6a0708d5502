package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotProduct, BloomFilterAgg, BloomMightContain, KMinValues, TopKByScore}

/** Engine extensions. Deployable two ways:
  *  - cluster: `spark.sql.extensions=graft.GraftExtensions`
  *  - embedded: `GraftExtensions.register(spark)` (what GraftSession
  *    and the test harness do).
  */
object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      new FunctionIdentifier("graft_array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_array_dot"),
      (children: Seq[Expression]) => ArrayDotProduct(children(0), children(1))),
    (
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KMinValues].getName, "graft_kmv"),
      (children: Seq[Expression]) => KMinValues(children(0), children(1))),
    (
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      (children: Seq[Expression]) =>
        TopKByScore(children(0), children(1), children(2))),
    (
      new FunctionIdentifier("graft_bloom"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "graft_bloom"),
      (children: Seq[Expression]) =>
        BloomFilterAgg(children(0), children(1), children(2))),
    (
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}
