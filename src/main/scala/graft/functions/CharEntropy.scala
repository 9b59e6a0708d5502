package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document character-distribution
  * Shannon entropy in one compiled pass — returns
  * `struct(n_chars, n_distinct, entropy_micro)` for a STRING input
  * (null for an empty string; callers filter those rows).
  *
  * Exists because the composable forms are CPU-bound at scale:
  * the original `explode(sequence…substr(i,1))` materialized one row
  * per corpus character with O(i) substr cost, and the HOF rewrite
  * (`aggregate` fold per distinct char) evaluates len×alphabet
  * interpreted lambdas — measured SLOWER at sf0.1 (6.1 s vs 4.6 s).
  * Here the histogram is a primitive-int code-point sort + one run
  * scan: no boxing, no per-char rows, one eval call per document.
  *
  * Contract (identical to the previous implementations and the DuckDB
  * oracle): per distinct code point, `term = round(−ln(cnt/n)·1e6)`
  * quantizes to an integer micro-nat BEFORE the weighted sum, and the
  * result is the exact integer `Σ cnt·term div n`. Rounding uses
  * BigDecimal HALF_UP on the double's shortest decimal representation
  * — bit-for-bit what Spark's `round()` does — so swapping the
  * expression in cannot move any value. Characters are Unicode code
  * points, matching `length()`/`substr()` semantics. */
case class CharEntropy(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy expects a STRING argument, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy_micro", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return null
    java.util.Arrays.sort(cps)
    var i = 0
    var distinct = 0L
    var wsum = 0L
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      val cnt = (j - i).toLong
      // Spark round() semantics exactly: HALF_UP on the shortest
      // decimal representation (BigDecimal.valueOf = Double.toString)
      val term = JBigDecimal.valueOf(
          -Math.log(cnt.toDouble / n.toDouble) * 1e6)
        .setScale(0, RoundingMode.HALF_UP).longValue()
      wsum += cnt * term
      distinct += 1
      i = j
    }
    new GenericInternalRow(Array[Any](n.toLong, distinct, wsum / n))
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
