package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_gram(qvec, dims)` — one-pass covariance/PCA sufficient
  * statistics over an integer-quantized ARRAY<BIGINT> vector column:
  * row count, per-dim sums, and the upper-triangle cross-product sums,
  * all in one flat long buffer.
  *
  * Why this exists: the obvious plan — posexplode × posexplode into
  * (d1, d2, x1·x2) rows — generates d(d+1)/2 ≈ 2k rows PER INPUT ROW
  * before the aggregate (the per-char-explode hazard, squared). This
  * aggregate keeps the fan-out inside the buffer: each partition
  * accumulates ONE `1 + d + d(d+1)/2` long array, `merge` is
  * element-wise addition (commutative + associative → identical under
  * any partitioning), and the exchange carries exactly that buffer per
  * partition — the corpus itself never shuffles. The consumer derives
  * covariance `n·s12 − s1·s2` / correlation / the PCA Gramian from the
  * sums driver-side (d×d is model-sized).
  *
  * Exactness bound: with KILO-unit quantization (round(v·1e3), |q| ≤
  * ~2.5e3 for unit-scale embeddings) a cross-product term is ≤ ~6e6,
  * so long sums hold to ~10¹² rows — the 100 TB envelope. Micro-unit
  * inputs would overflow at ~3e7 rows; quantization scale is the
  * caller's contract, this aggregate just adds longs.
  *
  * Buffer layout: [n, s_0..s_{d-1}, p(0,0), p(0,1)…p(0,d-1),
  * p(1,1)…] — upper triangle row-major; p(i,j) at
  * `1 + d + i·d − i(i−1)/2 + (j−i)`.
  *
  * Edge semantics: a NULL vector row is ignored; a NULL element
  * contributes 0 (the graft_array_dot convention); a row whose length
  * differs from `dims` throws — dimension drift in an embedding
  * column is corruption, not data (the Tables.load fail-fast rule).
  */
case class GramAgg(
    child: Expression,
    dimsExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, dimsExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    val elemOk = child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!elemOk)
      TypeCheckResult.TypeCheckFailure(
        s"graft_gram expects an ARRAY<BIGINT> column, got ${child.dataType.sql}")
    else if (dimsExpr.dataType != IntegerType || !dimsExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_gram expects a literal INT dims")
    else if (dims < 1 || dims > 4096)
      TypeCheckResult.TypeCheckFailure(s"graft_gram dims must be in [1, 4096], got $dims")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val dims: Int = dimsExpr.eval().asInstanceOf[Int]
  private lazy val bufLen: Int = 1 + dims + dims * (dims + 1) / 2

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dims)
      throw new IllegalStateException(
        s"graft_gram: expected $dims-dim vector, got ${arr.numElements()} elements")
    val x = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      x(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      i += 1
    }
    buffer(0) += 1L
    i = 0
    var p = 1 + dims
    while (i < dims) {
      buffer(1 + i) += x(i)
      var j = i
      while (j < dims) {
        buffer(p) += x(i) * x(j)
        p += 1
        j += 1
      }
      i += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren(0), dimsExpr = newChildren(1))
}
