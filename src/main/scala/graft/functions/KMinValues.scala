package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate: `graft_kmv(hash, k)` keeps the k smallest DISTINCT hash
  * values per group and returns them as a sorted ARRAY<BIGINT>.
  *
  * Why this exists: exact `COUNT(DISTINCT x)` over a 100 TB corpus
  * shuffles every distinct value; a sketch shuffles O(k) longs per
  * group. Unlike HLL (whose register layout is engine-specific, so no
  * cross-engine oracle can check it), the KMV sketch is a pure
  * function of the input set — the k smallest distinct hashes — so a
  * DuckDB oracle reproduces it bit-for-bit, and the estimator
  * `(k-1) / (kth_min / 2^60)` is deterministic double math on both
  * sides. The buffer is bounded (a ≤k-element sorted set), partial
  * aggregation applies (map-side combine), and `merge` is the sketch
  * union — the mergeability that makes sketches work on a cluster.
  *
  * Estimation quality is the textbook KMV bound (relative error
  * ~1/sqrt(k-2)); with fewer than k distinct inputs the sketch IS the
  * distinct set and the estimate is exact.
  */
case class KMinValues(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv expects a BIGINT hash column, got ${child.dataType.sql}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_kmv expects a literal INT k")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"graft_kmv k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  private def add(buffer: java.util.TreeSet[java.lang.Long], v: java.lang.Long): Unit = {
    // skip values that cannot enter a full sketch — keeps the common
    // path allocation-free once the buffer saturates
    if (buffer.size() < k) { buffer.add(v); () }
    else if (v < buffer.last() && buffer.add(v)) { buffer.pollLast(); () }
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 } // ascending: TreeSet order
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinValues =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
