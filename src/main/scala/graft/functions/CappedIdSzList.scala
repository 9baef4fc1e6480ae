package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped (id, set-size) collection per gram bucket — the
  * aggregate behind the sparse set-similarity core
  * (Dedup.setJaccardPairs / ngramContainment): collect a gram's
  * (doc id, doc set size) members only while the gram could survive
  * the document-frequency cap.
  *
  * Same saturation contract as [[CappedIdList]]: at most cap+1 stored
  * entries (one past the cap proves the gram is over-df, after which
  * updates/merges pass through), eval NULL outside [2, cap] — df > cap
  * grams are the boilerplate the cap exists to drop, df < 2 grams
  * contribute no pairs. O(cap) state per gram at ANY df, partial-agg
  * friendly, eval sorted by id ascending (what the id1 < id2 pair
  * explode needs). The sz tags along so the pair stage never joins
  * back to a per-doc table. */
case class CappedIdSzList(
    idChild: Expression,
    szChild: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedIdSzBuf] {

  require(cap >= 2, s"capped_id_sz_list cap must be >= 2, got $cap")

  override def children: Seq[Expression] = Seq(idChild, szChild)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sz", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "capped_id_sz_list"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (idChild.dataType, szChild.dataType) match {
      case (LongType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"capped_id_sz_list expects (BIGINT id, INT sz), got $other")
    }

  override def createAggregationBuffer(): CappedIdSzBuf = new CappedIdSzBuf(cap)

  override def update(buf: CappedIdSzBuf, input: InternalRow): CappedIdSzBuf = {
    val id = idChild.eval(input)
    if (id != null) {
      val sz = szChild.eval(input)
      buf.add(id.asInstanceOf[Long],
        if (sz == null) 0 else sz.asInstanceOf[Int])
    }
    buf
  }

  override def merge(a: CappedIdSzBuf, b: CappedIdSzBuf): CappedIdSzBuf = {
    a.mergeWith(b); a
  }

  override def eval(buf: CappedIdSzBuf): Any = {
    if (buf.size < 2 || buf.size > cap) null
    else {
      val (ids, szs) = buf.sortedByIds
      val out = new Array[Any](ids.length)
      var i = 0
      while (i < ids.length) { out(i) = InternalRow(ids(i), szs(i)); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: CappedIdSzBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CappedIdSzBuf =
    CappedIdSzBuf.fromBytes(bytes, cap)

  override def withNewMutableAggBufferOffset(o: Int): CappedIdSzList =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedIdSzList =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedIdSzList =
    copy(idChild = newChildren(0), szChild = newChildren(1))
}

/** ≤ cap+1 stored (id, sz) pairs; `size` saturates at cap+1 (enough to
  * decide the [2, cap] filter — over-cap updates are free). */
final class CappedIdSzBuf(cap: Int) {
  private var ids = new Array[Long](4)
  private var szs = new Array[Int](4)
  var size = 0

  def add(id: Long, sz: Int): Unit = {
    if (size > cap) return // already disqualified: pass through
    if (size == ids.length) {
      val n = math.min(cap + 1, math.max(8, ids.length * 2))
      ids = java.util.Arrays.copyOf(ids, n)
      szs = java.util.Arrays.copyOf(szs, n)
    }
    ids(size) = id
    szs(size) = sz
    size += 1
  }

  def mergeWith(o: CappedIdSzBuf): Unit = {
    var i = 0
    while (i < o.size && size <= cap) { add(o.ids(i), o.szs(i)); i += 1 }
    if (o.size > cap && size <= cap) size = cap + 1
  }

  def sortedByIds: (Array[Long], Array[Int]) = {
    val idx = (0 until size).toArray
      .map(i => (ids(i), szs(i))).sortBy(_._1)
    (idx.map(_._1), idx.map(_._2))
  }

  def toBytes: Array[Byte] = {
    val n = math.min(size, cap + 1)
    val bb = ByteBuffer.allocate(4 + 12 * n).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(size)
    var i = 0
    while (i < n) { bb.putLong(ids(i)); bb.putInt(szs(i)); i += 1 }
    bb.array()
  }
}

object CappedIdSzBuf {
  def fromBytes(bytes: Array[Byte], cap: Int): CappedIdSzBuf = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val buf = new CappedIdSzBuf(cap)
    val size = bb.getInt
    val n = math.min(size, cap + 1)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getInt); i += 1 }
    buf.size = size
    buf
  }
}
