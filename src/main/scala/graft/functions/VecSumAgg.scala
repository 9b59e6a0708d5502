package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_vecsum(qvec, dims)` — element-wise long vector sum plus row
  * count over an integer-quantized ARRAY<BIGINT> column, in one flat
  * `[n, s_0..s_{d-1}]` buffer: [[GramAgg]]'s layout minus the
  * cross-product triangle.
  *
  * Why this exists: the Lloyd centroid update needs per-cell
  * `(Σ qv, n)`; the posexplode encoding generates d rows PER corpus
  * row before the aggregate (64× row materialization per iteration at
  * d=64, the per-char-explode hazard again). This aggregate keeps the
  * fan-out in the buffer: each partition folds into one d+1-long
  * array per group, `merge` is element-wise addition (commutative +
  * associative → identical under any partitioning), and the exchange
  * carries k buffers of d+1 longs — the model, never the corpus.
  *
  * Exactness bound: offset-micro quantization (|q| ≤ ~2e6 for
  * unit-scale coordinates) holds long per-dim sums to ~4·10¹² rows
  * per cell — the 100 TB envelope; quantization scale is the caller's
  * contract, this aggregate just adds longs.
  *
  * Edge semantics match graft_gram: NULL vector rows are ignored,
  * NULL elements contribute 0, and a row whose length differs from
  * `dims` throws (dimension drift is corruption, not data). */
case class VecSumAgg(
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
        s"graft_vecsum expects an ARRAY<BIGINT> column, got ${child.dataType.sql}")
    else if (dimsExpr.dataType != IntegerType || !dimsExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_vecsum expects a literal INT dims")
    else if (dims < 1 || dims > 65536)
      TypeCheckResult.TypeCheckFailure(
        s"graft_vecsum dims must be in [1, 65536], got $dims")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val dims: Int = dimsExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_vecsum"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1 + dims)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dims)
      throw new IllegalStateException(
        s"graft_vecsum: expected $dims-dim vector, got ${arr.numElements()} elements")
    buffer(0) += 1L
    var i = 0
    while (i < dims) {
      if (!arr.isNullAt(i)) buffer(1 + i) += arr.getLong(i)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren(0), dimsExpr = newChildren(1))
}
