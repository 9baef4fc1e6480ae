package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped id collection for LSH bucket pairing (Dedup.bucketPairs
  * / Ann's embedding near-dup): collect a bucket's member ids ONLY
  * while the bucket could still survive the size filter.
  *
  * `sort_array(collect_list(id))` + `filter(size BETWEEN 2 AND cap)`
  * is semantically identical but materializes the FULL bucket array
  * before the filter — bounded in time, unbounded in one task's
  * memory: an adversarial boilerplate band shared by 10^8 docs at
  * 100 TB is a single ~800 MB aggregation buffer
  * (dev/dedup_skew_probe_r15.txt). This aggregate stores at most
  * cap+1 elements — one past the cap proves the bucket is over-sized,
  * after which updates and merges only pass through — and eval
  * returns NULL for buckets outside [2, cap], so the downstream
  * filter is `isNotNull`. O(cap) state per bucket at ANY bucket
  * cardinality, same single-shuffle plan.
  *
  * eval returns the ids SORTED ascending (what pairsOf's id1 < id2
  * ordering needs). Long ids only — every bucketPairs caller keys on
  * a long doc id. */
case class CappedIdList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedIdBuf] {

  require(cap >= 2, s"capped_id_list cap must be >= 2, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "capped_id_list"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"capped_id_list expects a BIGINT id, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): CappedIdBuf = new CappedIdBuf(cap)

  override def update(buf: CappedIdBuf, input: InternalRow): CappedIdBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: CappedIdBuf, b: CappedIdBuf): CappedIdBuf = {
    a.mergeWith(b); a
  }

  override def eval(buf: CappedIdBuf): Any = {
    if (buf.size < 2 || buf.size > cap) null
    else {
      val out = buf.sortedIds
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: CappedIdBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CappedIdBuf =
    CappedIdBuf.fromBytes(bytes, cap)

  override def withNewMutableAggBufferOffset(o: Int): CappedIdList =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedIdList =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedIdList =
    copy(child = newChildren.head)
}

/** ≤ cap+1 stored ids; `size` saturates at cap+1 (enough to decide
  * the [2, cap] filter — the true cardinality past that is
  * irrelevant, so over-cap updates are free). */
final class CappedIdBuf(cap: Int) {
  private var ids = new Array[Long](4)
  var size = 0

  def add(v: Long): Unit = {
    if (size > cap) return // already disqualified: pass through
    if (size == ids.length)
      ids = java.util.Arrays.copyOf(ids,
        math.min(cap + 1, math.max(8, ids.length * 2)))
    ids(size) = v
    size += 1
  }

  def mergeWith(o: CappedIdBuf): Unit = {
    var i = 0
    while (i < o.size && size <= cap) { add(o.ids(i)); i += 1 }
    // if the other side already overflowed but we copied all its
    // stored ids without overflowing, its saturation must carry over
    if (o.size > cap && size <= cap) size = cap + 1
  }

  def sortedIds: Array[Long] = {
    val s = java.util.Arrays.copyOf(ids, size)
    java.util.Arrays.sort(s)
    s
  }

  def toBytes: Array[Byte] = {
    val n = math.min(size, cap + 1)
    val bb = ByteBuffer.allocate(4 + 8 * n).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(size)
    var i = 0
    while (i < n) { bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object CappedIdBuf {
  def fromBytes(bytes: Array[Byte], cap: Int): CappedIdBuf = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val buf = new CappedIdBuf(cap)
    val size = bb.getInt
    val n = math.min(size, cap + 1)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf.size = size
    buf
  }
}
