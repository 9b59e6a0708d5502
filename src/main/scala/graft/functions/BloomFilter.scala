package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** Shared bit math for the Bloom sketch — one definition used by the
  * aggregate's `update`, the scalar probe's interpreted `eval`, AND its
  * generated code (a standalone Scala object gets Java static
  * forwarders, so Janino can call `BloomUtil.mightContain` directly).
  *
  * Layout of a serialized sketch: byte 0 = number of probe hashes k;
  * bytes 1.. = the bit array, longs packed little-endian, so global
  * bit `i` lives at `bytes[1 + i/8] & (1 << (i%8))`. The bit count is
  * implied by the length (always a multiple of 64), which makes a
  * sketch self-describing — a probe can never be run with mismatched
  * (bits, k) parameters.
  *
  * Probes use standard double hashing (Kirsch–Mitzenmacher):
  * `pos_i = (h + i*mix(h)) mod bits` with a murmur3-style finalizer —
  * deterministic, engine-portable integer math.
  */
object BloomUtil {

  def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Set the k probe bits of `v` in a long-word buffer (agg side). */
  def set(words: Array[Long], k: Int, v: Long): Unit = {
    val nbits = words.length.toLong * 64
    val h2 = mix(v)
    var i = 0
    while (i < k) {
      val idx = ((v + i * h2) & Long.MaxValue) % nbits
      words((idx >>> 6).toInt) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Probe a serialized sketch. False only when v was NEVER added
    * (no false negatives); true may be a false positive. */
  def mightContain(sketch: Array[Byte], v: Long): Boolean = {
    val k = sketch(0) & 0xff
    val nbits = (sketch.length - 1).toLong * 8
    if (nbits == 0) return false
    val h2 = mix(v)
    var i = 0
    while (i < k) {
      val idx = ((v + i * h2) & Long.MaxValue) % nbits
      if ((sketch(1 + (idx >>> 3).toInt) & (1 << (idx & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }
}

/** `graft_bloom(hash, numBits, numHashes)` — builds a Bloom filter over
  * a BIGINT hash column and returns it as a self-describing BINARY
  * sketch (see [[BloomUtil]] for the layout).
  *
  * Why this exists: the incremental-dedup anti-join
  * (`TextDedup.dedupAgainstIndex`) shuffles the ENTIRE new batch
  * against the historical index. At 100 TB/day against a multi-PB
  * index, almost every new document is NOT a duplicate — the shuffle
  * moves billions of rows to discover nothing. A Bloom sketch of the
  * index (~10 bits per entry at 1% fp — 120 MB per 100M entries,
  * against an index whose own footprint is TBs) broadcasts to every
  * executor and prunes the definitely-new rows with a map-only
  * filter; only the ~fp-rate sliver joins. Past a few hundred million
  * entries, raise the fp target or shard the sketch by hash prefix —
  * the anti-join still only sees the sliver. No false negatives means
  * the composed operator stays EXACT — the sketch changes the plan,
  * never the answer.
  *
  * The buffer is a fixed-size long array: partial aggregation applies,
  * `merge` is a bitwise OR (commutative + associative, so the sketch
  * is identical regardless of partitioning), and the exchange carries
  * exactly numBits/8 bytes per partition.
  */
case class BloomFilterAgg(
    child: Expression,
    numBitsExpr: Expression,
    numHashesExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, numBitsExpr, numHashesExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom expects a BIGINT hash column, got ${child.dataType.sql}")
    else if (numBitsExpr.dataType != IntegerType || !numBitsExpr.foldable ||
             numHashesExpr.dataType != IntegerType || !numHashesExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom expects literal INT numBits and numHashes")
    else if (numBits < 64)
      TypeCheckResult.TypeCheckFailure(s"graft_bloom numBits must be >= 64, got $numBits")
    else if (numHashes < 1 || numHashes > 255)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom numHashes must be in [1, 255], got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val numBits: Int = numBitsExpr.eval().asInstanceOf[Int]
  private lazy val numHashes: Int = numHashesExpr.eval().asInstanceOf[Int]
  private lazy val numWords: Int = (numBits + 63) / 64

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buffer, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(1 + 8 * buffer.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(numHashes.toByte)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0), numBitsExpr = newChildren(1),
      numHashesExpr = newChildren(2))
}

/** `graft_bloom_contains(sketch, hash)` — membership probe against a
  * [[BloomFilterAgg]] sketch. Stays inside whole-stage codegen (the
  * generated code is a static call into [[BloomUtil]]), so a
  * broadcast-literal sketch filter runs at scan speed — the property
  * the 100 TB dedup prefilter depends on.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects (BINARY sketch, BIGINT hash), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(sketch: Any, v: Any): Any =
    BloomUtil.mightContain(sketch.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sketch, v) =>
      s"graft.functions.BloomUtil.mightContain($sketch, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
