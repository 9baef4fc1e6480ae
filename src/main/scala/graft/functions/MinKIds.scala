package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The k SMALLEST ids of a group, ascending — the partial-agg form of
  * `row_number() OVER (PARTITION BY bucket ORDER BY id) <= k`
  * (NearDupIndex's per-bucket cap). Unlike the window spelling, which
  * shuffles and sorts EVERY member of a hot bucket onto one task just
  * to drop all but k (a boilerplate LSH band shared by 10^8 docs at
  * 100 TB is one straggler task), this is a bounded max-heap per
  * buffer: O(k) state, map-side partial aggregation collapses the hot
  * bucket BEFORE the shuffle, and the aggregate's output partitioning
  * (the groupBy key) is exactly the partitioning the banded-index
  * cache wants — so the explicit repartition (a second full Exchange)
  * disappears too. Guide §2.3/§2.4/§2.5. Ids unique per caller, so
  * "k smallest" ≡ the window's first-k-by-id exactly.
  */
case class MinKIds(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuf] {

  require(k >= 1, s"min_k_ids k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_k_ids"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_k_ids expects a BIGINT id, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): MinKBuf = new MinKBuf(k)

  override def update(buf: MinKBuf, input: InternalRow): MinKBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: MinKBuf, b: MinKBuf): MinKBuf = { a.mergeWith(b); a }

  override def eval(buf: MinKBuf): Any = new GenericArrayData(buf.sortedIds)

  override def serialize(buf: MinKBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MinKBuf =
    MinKBuf.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): MinKIds =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKIds =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKIds =
    copy(child = newChildren.head)
}

/** Bounded max-heap of the k smallest longs seen. Below capacity it
  * appends; at capacity a new value replaces the current max only if
  * strictly smaller. O(log k) per update, O(k) state always. */
final class MinKBuf(k: Int) {
  private var heap = new Array[Long](math.min(k, 8))
  var size = 0

  private def grow(): Unit =
    if (size == heap.length && size < k)
      heap = java.util.Arrays.copyOf(heap, math.min(k, heap.length * 2))

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (heap(p) < heap(i)) {
        val t = heap(p); heap(p) = heap(i); heap(i) = t; i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && heap(l) > heap(m)) m = l
      if (r < size && heap(r) > heap(m)) m = r
      if (m == i) return
      val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m
    }
  }

  def add(v: Long): Unit = {
    if (size < k) {
      grow()
      heap(size) = v
      size += 1
      siftUp(size - 1)
    } else if (v < heap(0)) {
      heap(0) = v
      siftDown()
    }
  }

  def mergeWith(o: MinKBuf): Unit = {
    var i = 0
    while (i < o.size) { add(o.heap(i)); i += 1 }
  }

  def sortedIds: Array[Long] = {
    val s = java.util.Arrays.copyOf(heap, size)
    java.util.Arrays.sort(s)
    s
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(size)
    var i = 0
    while (i < size) { bb.putLong(heap(i)); i += 1 }
    bb.array()
  }
}

object MinKBuf {
  def fromBytes(bytes: Array[Byte], k: Int): MinKBuf = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val buf = new MinKBuf(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}
