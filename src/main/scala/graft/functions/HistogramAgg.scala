package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** histogram(nbins)(x) — ClickHouse's adaptive histogram (reference
  * name registry src/Parsers/ASTFunction.h; public CH semantics):
  * returns nbins (lower, upper, height) triples whose bin boundaries
  * ADAPT to the data (a streaming 1-D agglomerative clustering), not
  * fixed-width buckets.
  *
  * State is a capped centroid list — (Σx, weight, lo, hi) per
  * centroid, at most 16×nbins entries; on overflow the two centroids
  * with the closest means merge (CH's own compaction rule). update()
  * inserts single points map-side, merge() concatenates + compacts,
  * eval() compacts to exactly nbins and emits the triples sorted by
  * lower bound. Like CH, the result depends on arrival order across
  * partitions (the docs call the error "dependent on the order of
  * data flowing into the block"), so the contract is structural —
  * HistogramSpec pins: bin count, total height = row count, coverage
  * of [min, max], sorted non-overlapping ranges, and exactness when
  * distinct values ≤ nbins. */
case class HistogramAgg(
    child: Expression,
    nbins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Array[Double]]] {

  require(nbins >= 1, s"histogram needs >= 1 bins, got $nbins")
  private val cap = nbins * 16

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", DoubleType, nullable = false),
    StructField("_3", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case _: NumericType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"histogram expects a numeric column, got ${other.simpleString}")
    }
  }

  private def toD(v: Any): Double = child.dataType match {
    case ByteType    => v.asInstanceOf[Byte].toDouble
    case ShortType   => v.asInstanceOf[Short].toDouble
    case IntegerType => v.asInstanceOf[Int].toDouble
    case LongType    => v.asInstanceOf[Long].toDouble
    case FloatType   => v.asInstanceOf[Float].toDouble
    case DoubleType  => v.asInstanceOf[Double]
    case _: DecimalType => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalArgumentException(other.simpleString)
  }

  // centroid = Array(sumX, weight, lo, hi)
  override def createAggregationBuffer(): mutable.ArrayBuffer[Array[Double]] =
    mutable.ArrayBuffer.empty

  /** Merge closest-mean adjacent centroids until `target` remain.
    * Sorts once; each round folds ONE closest pair — O(k²) on a
    * capped k, never on the data. */
  private def compact(buf: mutable.ArrayBuffer[Array[Double]],
      target: Int): mutable.ArrayBuffer[Array[Double]] = {
    val sorted = buf.sortBy(c => c(0) / c(1))
    // always coalesce equal-mean centroids (duplicate values must
    // land in ONE bin even under the bin budget)
    var i = sorted.length - 2
    while (i >= 0) {
      if (i + 1 < sorted.length &&
          sorted(i)(0) / sorted(i)(1) == sorted(i + 1)(0) / sorted(i + 1)(1)) {
        val a = sorted(i); val b = sorted(i + 1)
        sorted(i) = Array(a(0) + b(0), a(1) + b(1),
          math.min(a(2), b(2)), math.max(a(3), b(3)))
        sorted.remove(i + 1)
      }
      i -= 1
    }
    var n = sorted.length
    while (n > target) {
      var best = 0
      var bestGap = Double.PositiveInfinity
      var i = 0
      while (i < n - 1) {
        val gap = sorted(i + 1)(0) / sorted(i + 1)(1) -
          sorted(i)(0) / sorted(i)(1)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val a = sorted(best); val b = sorted(best + 1)
      sorted(best) = Array(a(0) + b(0), a(1) + b(1),
        math.min(a(2), b(2)), math.max(a(3), b(3)))
      sorted.remove(best + 1)
      n -= 1
    }
    sorted
  }

  override def update(
      buffer: mutable.ArrayBuffer[Array[Double]],
      input: InternalRow): mutable.ArrayBuffer[Array[Double]] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val x = toD(v)
    buffer += Array(x, 1.0, x, x)
    if (buffer.length > cap) compact(buffer, cap / 2) else buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[Array[Double]],
      other: mutable.ArrayBuffer[Array[Double]])
      : mutable.ArrayBuffer[Array[Double]] = {
    buffer ++= other
    if (buffer.length > cap) compact(buffer, cap) else buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Array[Double]]): Any = {
    val bins = compact(buffer, nbins).sortBy(c => c(0) / c(1))
    if (bins.isEmpty) return new GenericArrayData(Array.empty[Any])
    // CH derives bin bounds from NEIGHBORING means: lower_0 = global
    // min, bound between bins = midpoint of adjacent means, upper_last
    // = global max — adjacent and non-overlapping by construction
    val means = bins.map(c => c(0) / c(1))
    val gmin = bins.map(_(2)).min
    val gmax = bins.map(_(3)).max
    val bounds = gmin +: means.sliding(2).collect {
      case mutable.ArrayBuffer(a, b) => (a + b) / 2.0
    }.toSeq :+ gmax
    new GenericArrayData(bins.indices.map { i =>
      InternalRow(bounds(i), bounds(i + 1), bins(i)(1))
    }.toArray[Any])
  }

  override def serialize(
      buffer: mutable.ArrayBuffer[Array[Double]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { c =>
      out.writeDouble(c(0)); out.writeDouble(c(1))
      out.writeDouble(c(2)); out.writeDouble(c(3))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.ArrayBuffer[Array[Double]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.ArrayBuffer.empty[Array[Double]]
    var i = 0
    while (i < n) {
      b += Array(in.readDouble(), in.readDouble(),
        in.readDouble(), in.readDouble())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): HistogramAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistogramAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "histogram"
}
