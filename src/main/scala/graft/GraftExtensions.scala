package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotProduct, ArraySqDistLong, BloomFilterAgg, BloomMightContain, CharEntropy, GramAgg, KMinValues, TopKByScore, VecSumAgg}

/** Engine extensions. Deployable two ways:
  *  - cluster: `spark.sql.extensions=graft.GraftExtensions`
  *  - embedded: `GraftExtensions.register(spark)` (what GraftSession
  *    and the test harness do).
  */
object GraftExtensions {
  /** Wraps a builder with an arity check so a wrong argument count is
    * an AnalysisException naming the expected signature, not an
    * IndexOutOfBoundsException from `children(i)`. */
  private def arity(name: String, n: Int, signature: String)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children =>
      if (children.size == n) build(children)
      else throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name` (expected: $signature)",
          "expectedNum" -> n.toString,
          "actualNum" -> children.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      new FunctionIdentifier("graft_array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_array_dot"),
      arity("graft_array_dot", 2, "graft_array_dot(a, b)")(
        children => ArrayDotProduct(children(0), children(1)))),
    (
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KMinValues].getName, "graft_kmv"),
      arity("graft_kmv", 2, "graft_kmv(value, k)")(
        children => KMinValues(children(0), children(1)))),
    (
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      arity("graft_topk", 3, "graft_topk(score, payload, k)")(
        children => TopKByScore(children(0), children(1), children(2)))),
    (
      new FunctionIdentifier("graft_bloom"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "graft_bloom"),
      arity("graft_bloom", 3, "graft_bloom(hash, numBits, numHashes)")(
        children => BloomFilterAgg(children(0), children(1), children(2)))),
    (
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      arity("graft_bloom_contains", 2, "graft_bloom_contains(sketch, value)")(
        children => BloomMightContain(children(0), children(1)))),
    (
      new FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_char_entropy"),
      arity("graft_char_entropy", 1, "graft_char_entropy(text)")(
        children => CharEntropy(children(0)))),
    (
      new FunctionIdentifier("graft_sqdist_long"),
      new ExpressionInfo(classOf[ArraySqDistLong].getName, "graft_sqdist_long"),
      arity("graft_sqdist_long", 2, "graft_sqdist_long(a, b)")(
        children => ArraySqDistLong(children(0), children(1)))),
    (
      new FunctionIdentifier("graft_gram"),
      new ExpressionInfo(classOf[GramAgg].getName, "graft_gram"),
      arity("graft_gram", 2, "graft_gram(qvec, dims)")(
        children => GramAgg(children(0), children(1)))),
    (
      new FunctionIdentifier("graft_vecsum"),
      new ExpressionInfo(classOf[VecSumAgg].getName, "graft_vecsum"),
      arity("graft_vecsum", 2, "graft_vecsum(qvec, dims)")(
        children => VecSumAgg(children(0), children(1)))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}
