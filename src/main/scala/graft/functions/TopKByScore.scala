package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: `graft_topk(score, id, k)` keeps the k
  * best (score DESC, id ASC) entries per group and returns them as a
  * sorted ARRAY<STRUCT<ord: DOUBLE, id: BIGINT>>.
  *
  * Why this exists: the idiomatic per-group top-k —
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC)` + filter —
  * shuffles and SORTS every scored row (at 100 TB, the ANN verify
  * stage scores billions of candidate pairs to keep 5 per query). This
  * aggregate holds a ≤k in-memory heap per group, combines map-side,
  * and ships at most k entries per partition per group through the
  * exchange — the sort never happens and the shuffle shrinks by the
  * candidate-to-k ratio.
  *
  * Ties are broken by id ascending, so results are deterministic and a
  * DuckDB `row_number() OVER (ORDER BY score DESC, id)` oracle matches
  * exactly (round the score BEFORE aggregating if it is computed
  * float math).
  */
case class TopKByScore(
    ord: Expression,
    id: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(ord, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects a DOUBLE score, got ${ord.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects a BIGINT id, got ${id.dataType.sql}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_topk expects a literal INT k")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"graft_topk k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  // best-first: higher score wins, then smaller id
  private object BestFirst extends java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](BestFirst)

  override def update(
      buffer: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      add(buffer, (o.asInstanceOf[Double], i.asInstanceOf[Long]))
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  private def add(
      buffer: java.util.TreeSet[(Double, Long)], e: (Double, Long)): Unit = {
    if (buffer.size() < k) { buffer.add(e); () }
    else if (BestFirst.compare(e, buffer.last()) < 0 && buffer.add(e)) {
      buffer.pollLast(); ()
    }
  }

  override def eval(buffer: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { // best-first: TreeSet comparator order
      val (o, d) = it.next()
      out(i) = new GenericInternalRow(Array[Any](o, d))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) { val (o, d) = it.next(); bb.putDouble(o); bb.putLong(d) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[(Double, Long)](BestFirst)
    var i = 0
    while (i < n) { s.add((bb.getDouble, bb.getLong)); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(ord = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
