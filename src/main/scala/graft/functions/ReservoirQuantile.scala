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
  *  - n ≤ cap: EXACT and deterministic — the value at rank ceil(q·n)
  *    over the sorted kept values (DuckDB's quantile_disc; the same
  *    convention Spark's GK sketch answers in its exact mode, probed
  *    in dev/qprobe_check.py). This is the regime of both
  *    verification SFs, so the oracle is hash-exact.
  *  - n > cap: Algorithm-R reservoir over a per-buffer xorshift PRNG
  *    (seeded deterministically, but sampling depends on arrival
  *    order — the reference's bare quantile is nondeterministic above
  *    the reservoir too; its deterministic spelling is the
  *    quantileDeterministic family). The answer is the rank statistic
  *    of the sample, scaled.
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
      // rank ceil(q·n), 1-based, clamped — quantile_disc's convention
      val n = sorted.length
      val r = math.max(1, math.min(n, math.ceil(q * n).toInt))
      sorted(r - 1)
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
      // both sampled: weighted draw, each slot from this side with
      // probability count/(count+o.count)
      val total = count + o.count
      val mine = java.util.Arrays.copyOf(values, kept)
      val theirs = java.util.Arrays.copyOf(o.values, o.kept)
      val out = new Array[Double](math.min(cap.toLong, total).toInt)
      var i = 0
      while (i < out.length) {
        val fromMine = nextBelow(total) < count
        val src = if (fromMine) mine else theirs
        out(i) = src(nextBelow(src.length.toLong).toInt)
        i += 1
      }
      values = out; kept = out.length; count = total
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
