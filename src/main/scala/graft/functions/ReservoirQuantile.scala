package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** CH's bare quantile/median/quantiles contract, realized faithfully:
  * a RESERVOIR of at most `cap` samples per group (the reference's
  * AggregateFunctionQuantile over ReservoirSampler, default 8192) —
  * hard-bounded state at any corpus size, O(1) per row.
  *
  *  - n ≤ cap: EXACT and deterministic — the INTERPOLATED statistic
  *    at index q·(n−1), linear between the two neighboring sorted
  *    values with weights (right−idx, idx−left): the reference's own
  *    ReservoirSampler::quantileInterpolated convention (median of
  *    {1,2,3,4} is 2.5). This equals DuckDB's quantile_cont up to
  *    final-combination rounding ulps, so oracles guard with
  *    round(…, 6). This is the regime of both verification SFs.
  *  - n > cap: Algorithm-R reservoir over a per-buffer xorshift PRNG
  *    (seeded deterministically, but sampling depends on arrival
  *    order — the reference's bare quantile is nondeterministic above
  *    the reservoir too; its deterministic spelling is the
  *    quantileDeterministic family, whose determinator we do NOT use:
  *    above the cap it stays arrival-order dependent here, a
  *    documented divergence). The answer is the interpolated
  *    statistic of the sample.
  *
  * Why not approx_percentile: the GK sketch at an accuracy high
  * enough to stay exact at verification scale (50000) degrades to
  * O(n·S) compression churn — measured 23x slower than the exact
  * percentile on a 50k-value group (bench r14, c08 46 s). A reservoir
  * is what the reference actually runs, and it is append-speed. */
case class ReservoirQuantile(
    child: Expression,
    levels: Seq[Double],
    returnArray: Boolean,
    cap: Int = 8192,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirBuf] {

  require(levels.nonEmpty && levels.forall(l => l >= 0.0 && l <= 1.0),
    s"quantile level(s) must be in [0, 1], got ${levels.mkString(", ")}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false) else DoubleType
  override def prettyName: String = "reservoir_quantile"

  override def createAggregationBuffer(): ReservoirBuf = new ReservoirBuf(cap)

  override def update(buf: ReservoirBuf, input: InternalRow): ReservoirBuf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"quantile: numeric input expected, got ${other.getClass.getSimpleName}")
    })
    buf
  }

  override def merge(a: ReservoirBuf, b: ReservoirBuf): ReservoirBuf = {
    a.mergeWith(b); a
  }

  override def eval(buf: ReservoirBuf): Any = {
    if (buf.count == 0L) return null
    val sorted = buf.sortedValues
    def at(q: Double): Double = {
      // index q·(n−1), linear between neighbors with weights
      // (right−idx, idx−left) — ReservoirSampler::quantileInterpolated
      val n = sorted.length
      val index = math.max(0.0, math.min((n - 1).toDouble, q * (n - 1)))
      val left = index.toInt
      val right = left + 1
      if (right >= n) sorted(n - 1)
      else sorted(left) * (right - index) + sorted(right) * (index - left)
    }
    if (returnArray) new GenericArrayData(levels.map(at).toArray)
    else at(levels.head)
  }

  override def serialize(buf: ReservoirBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): ReservoirBuf =
    ReservoirBuf.fromBytes(bytes, cap)

  override def withNewMutableAggBufferOffset(o: Int): ReservoirQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReservoirQuantile =
    copy(child = newChildren.head)
}

/** Reservoir state: kept values (≤ cap) + total seen count. The PRNG
  * is xorshift64*, seeded from a fixed constant so a given arrival
  * order reproduces. */
final class ReservoirBuf(cap: Int) {
  // start tiny: under a count(distinct) Expand plan the partial stage
  // keys on (group, distinct-col) — one buffer per PAIR, most holding
  // a single value
  private var values = new Array[Double](math.min(cap, 4))
  private var kept = 0
  var count = 0L
  private var rng = 0x9e3779b97f4a7c15L

  private def nextLong(): Long = {
    var x = rng
    x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
    rng = x
    x * 0x2545f4914f6cdd1dL
  }
  /** uniform in [0, bound) */
  private def nextBelow(bound: Long): Long = {
    val r = nextLong() >>> 1
    r % bound
  }

  def insert(v: Double): Unit = {
    count += 1
    if (kept < cap) {
      if (kept == values.length)
        values = java.util.Arrays.copyOf(values,
          math.min(cap, math.max(8, values.length * 2)))
      values(kept) = v
      kept += 1
    } else {
      // Algorithm R: replace slot j with prob cap/count
      val j = nextBelow(count)
      if (j < cap) values(j.toInt) = v
    }
  }

  def mergeWith(o: ReservoirBuf): Unit = {
    if (o.count == 0L) return
    if (count == 0L) {
      values = java.util.Arrays.copyOf(o.values, o.values.length)
      kept = o.kept; count = o.count; rng = o.rng
      return
    }
    // An EXACT side (count == kept: nothing ever dropped) is just a
    // batch of arrivals — replay it through insert(), which is the
    // true Algorithm-R continuation and costs O(o.kept) with no array
    // copies. This covers every merge in a typical plan (partials are
    // per-partition, usually under the cap), including merging exact
    // partials into an already-sampled accumulator. The copying
    // weighted merge below only runs when BOTH sides have already
    // subsampled — at most once per upstream sampled partial, never
    // per row (the first cut copied ≤64 KB per merge CALL and
    // measured 3.3x slower than the exact percentile under a
    // count(distinct) Expand plan's ~100k merges).
    if (o.count == o.kept) {
      var i = 0
      while (i < o.kept) { insert(o.values(i)); i += 1 }
    } else if (count == kept) {
      // this side exact, other sampled: adopt o as the base (it has
      // the longer history) and replay this side's values into it
      val mine = values; val myKept = kept
      values = java.util.Arrays.copyOf(o.values, o.values.length)
      kept = o.kept; count = o.count; rng = rng ^ o.rng
      var i = 0
      while (i < myKept) { insert(mine(i)); i += 1 }
    } else {
      // both sampled: slot sources drawn by weight count/total
      // (k_mine ~ Binomial(slots, count/total)), then WITHOUT
      // replacement within each side via partial Fisher–Yates — a
      // with-replacement draw lets one original sample occupy several
      // slots and biases multi-stage merges (r14 advice #3)
      val total = count + o.count
      val mine = java.util.Arrays.copyOf(values, kept)
      val theirs = java.util.Arrays.copyOf(o.values, o.kept)
      val outLen = math.min(cap.toLong, total).toInt
      var kMine = 0
      var i = 0
      while (i < outLen) { if (nextBelow(total) < count) kMine += 1; i += 1 }
      if (kMine > mine.length) kMine = mine.length
      if (outLen - kMine > theirs.length) kMine = outLen - theirs.length
      val out = new Array[Double](outLen)
      // the first k slots of a Fisher–Yates shuffle are a uniform
      // without-replacement k-sample
      var j = 0
      while (j < kMine) {
        val pick = j + nextBelow((mine.length - j).toLong).toInt
        val t = mine(j); mine(j) = mine(pick); mine(pick) = t
        out(j) = mine(j)
        j += 1
      }
      var k = 0
      while (k < outLen - kMine) {
        val pick = k + nextBelow((theirs.length - k).toLong).toInt
        val t = theirs(k); theirs(k) = theirs(pick); theirs(pick) = t
        out(kMine + k) = theirs(k)
        k += 1
      }
      values = out; kept = outLen; count = total
    }
  }

  def sortedValues: Array[Double] = {
    val s = java.util.Arrays.copyOf(values, kept)
    java.util.Arrays.sort(s)
    s
  }

  private[functions] def restore(c: Long, r: Long, vs: Array[Double]): Unit = {
    count = c; rng = r; values = vs; kept = vs.length
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 + 4 + 8 * kept)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(count); bb.putLong(rng); bb.putInt(kept)
    var i = 0
    while (i < kept) { bb.putDouble(values(i)); i += 1 }
    bb.array()
  }
}

object ReservoirBuf {
  def fromBytes(bytes: Array[Byte], cap: Int): ReservoirBuf = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val buf = new ReservoirBuf(cap)
    val count = bb.getLong
    val rng = bb.getLong
    val kept = bb.getInt
    val vs = new Array[Double](kept)
    var i = 0
    while (i < kept) { vs(i) = bb.getDouble; i += 1 }
    buf.restore(count, rng, vs)
    buf
  }
}

/** quantileDeterministic(x, determinator): the reference's
  * determinator-keyed reservoir contract — the SAMPLE is a pure
  * function of the (value, determinator) multiset, independent of
  * arrival order, partitioning, and merge schedule
  * (ReservoirSamplerDeterministic.h's purpose). Realized as a
  * bottom-k sketch: keep the `cap` rows with the smallest
  * (splitmix64(determinator), value) pairs — a uniform sample when
  * the determinator is well-distributed, EXACT below the cap (all
  * rows kept; same interpolated statistic as ReservoirQuantile), and
  * trivially mergeable (union, re-take bottom-k), which is what makes
  * it layout-independent where Algorithm R is not. Per-group state is
  * a size-cap binary max-heap of (hash, value). */
case class DeterministicReservoirQuantile(
    child: Expression,
    det: Expression,
    levels: Seq[Double],
    returnArray: Boolean,
    cap: Int = 8192,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DetReservoirBuf] {

  require(levels.nonEmpty && levels.forall(l => l >= 0.0 && l <= 1.0),
    s"quantile level(s) must be in [0, 1], got ${levels.mkString(", ")}")

  override def children: Seq[Expression] = Seq(child, det)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false) else DoubleType
  override def prettyName: String = "deterministic_reservoir_quantile"

  // analysis-time type errors, not execution-time ClassCastExceptions:
  // the dialect path always Casts the determinator to Long, but direct
  // API construction can pass anything (r15 advice; CappedIdList's
  // checkInputDataTypes is the template)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: value must be numeric, got ${child.dataType.simpleString}")
    else if (det.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: determinator must be BIGINT (cast it), got " +
          det.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): DetReservoirBuf =
    new DetReservoirBuf(cap)

  override def update(buf: DetReservoirBuf, input: InternalRow): DetReservoirBuf = {
    val v = child.eval(input)
    val d = det.eval(input)
    if (v != null && d != null) {
      val dv = v match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Long => x.toDouble
        case x: Int => x.toDouble
        case x: Short => x.toDouble
        case x: Byte => x.toDouble
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
        case other => throw new IllegalArgumentException(
          s"quantileDeterministic: numeric input expected, got ${other.getClass.getSimpleName}")
      }
      buf.insert(DetReservoirBuf.mix(d.asInstanceOf[Long]), dv)
    }
    buf
  }

  override def merge(a: DetReservoirBuf, b: DetReservoirBuf): DetReservoirBuf = {
    a.mergeWith(b); a
  }

  override def eval(buf: DetReservoirBuf): Any = {
    if (buf.count == 0L) return null
    val sorted = buf.sortedValues
    def at(q: Double): Double = {
      val n = sorted.length
      val index = math.max(0.0, math.min((n - 1).toDouble, q * (n - 1)))
      val left = index.toInt
      val right = left + 1
      if (right >= n) sorted(n - 1)
      else sorted(left) * (right - index) + sorted(right) * (index - left)
    }
    if (returnArray) new GenericArrayData(levels.map(at).toArray)
    else at(levels.head)
  }

  override def serialize(buf: DetReservoirBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): DetReservoirBuf =
    DetReservoirBuf.fromBytes(bytes, cap)

  override def withNewMutableAggBufferOffset(o: Int): DeterministicReservoirQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DeterministicReservoirQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DeterministicReservoirQuantile =
    copy(child = newChildren(0), det = newChildren(1))
}

/** Bottom-k of (hash, value) pairs as a binary max-heap: the root is
  * the LARGEST kept pair, evicted when a smaller one arrives. The
  * kept multiset equals "the k lexicographically-smallest pairs of
  * everything inserted" regardless of order — the determinism
  * contract. */
final class DetReservoirBuf(cap: Int) {
  private var hs = new Array[Long](math.min(cap, 4))
  private var vs = new Array[Double](math.min(cap, 4))
  private[functions] var size = 0
  var count = 0L

  private def less(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    h1 < h2 || (h1 == h2 && v1 < v2)

  private def swap(i: Int, j: Int): Unit = {
    val th = hs(i); hs(i) = hs(j); hs(j) = th
    val tv = vs(i); vs(i) = vs(j); vs(j) = tv
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && less(hs((i - 1) / 2), vs((i - 1) / 2), hs(i), vs(i))) {
      swap(i, (i - 1) / 2)
      i = (i - 1) / 2
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < size && less(hs(m), vs(m), hs(l), vs(l))) m = l
      if (r < size && less(hs(m), vs(m), hs(r), vs(r))) m = r
      if (m == i) done = true
      else { swap(i, m); i = m }
    }
  }

  private def put(h: Long, v: Double): Unit = {
    if (size < cap) {
      if (size == hs.length) {
        val n = math.min(cap, math.max(8, hs.length * 2))
        hs = java.util.Arrays.copyOf(hs, n)
        vs = java.util.Arrays.copyOf(vs, n)
      }
      hs(size) = h; vs(size) = v
      size += 1
      siftUp(size - 1)
    } else if (less(h, v, hs(0), vs(0))) {
      hs(0) = h; vs(0) = v
      siftDown(0)
    }
  }

  def insert(h: Long, v: Double): Unit = { count += 1; put(h, v) }

  def mergeWith(o: DetReservoirBuf): Unit = {
    var i = 0
    while (i < o.size) { put(o.hs(i), o.vs(i)); i += 1 }
    count += o.count
  }

  def sortedValues: Array[Double] = {
    val s = java.util.Arrays.copyOf(vs, size)
    java.util.Arrays.sort(s)
    s
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 16 * size)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(count)
    bb.putInt(size)
    var i = 0
    while (i < size) { bb.putLong(hs(i)); bb.putDouble(vs(i)); i += 1 }
    bb.array()
  }
}

object DetReservoirBuf {
  /** splitmix64 — well-mixed 64-bit hash of the determinator. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def fromBytes(bytes: Array[Byte], cap: Int): DetReservoirBuf = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val buf = new DetReservoirBuf(cap)
    val count = bb.getLong
    val size = bb.getInt
    var i = 0
    while (i < size) {
      val h = bb.getLong
      val v = bb.getDouble
      buf.insert(h, v)
      i += 1
    }
    buf.count = count
    buf
  }
}
