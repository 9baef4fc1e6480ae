package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** rankCorr(x, y) — Spearman's ρ with average-rank ties (reference
  * name registry src/Parsers/ASTFunction.h; public CH semantics).
  *
  * A rank statistic needs the group's sample: the buffer holds the
  * (x, y) pairs — exactly the state CH's own implementation keeps —
  * and eval() ranks each margin once (sort + linear tie-run pass,
  * O(n log n)) before the closed-form Pearson over rank pairs. A
  * Catalyst higher-order-function spelling was rejected: `aggregate`
  * lambdas append to accumulator arrays by copy, which makes
  * per-element rank assignment O(n²) per group — this kernel is the
  * scale-correct realization. */
case class RankCorrAgg(
    x: Expression,
    y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]] {

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.forall(_.dataType.isInstanceOf[NumericType])) TypeCheckSuccess
    else TypeCheckFailure("rankCorr expects two numeric columns")
  }

  private def toD(e: Expression, v: Any): Double = e.dataType match {
    case ByteType    => v.asInstanceOf[Byte].toDouble
    case ShortType   => v.asInstanceOf[Short].toDouble
    case IntegerType => v.asInstanceOf[Int].toDouble
    case LongType    => v.asInstanceOf[Long].toDouble
    case FloatType   => v.asInstanceOf[Float].toDouble
    case DoubleType  => v.asInstanceOf[Double]
    case _: DecimalType => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalArgumentException(
      s"non-numeric rankCorr input ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[(Double, Double)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Double)] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) buffer += ((toD(x, xv), toD(y, yv)))
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[(Double, Double)],
      other: mutable.ArrayBuffer[(Double, Double)])
      : mutable.ArrayBuffer[(Double, Double)] = { buffer ++= other; buffer }

  /** Average ranks of `vs` (1-based positions, tie runs share the
    * mean of their positions). */
  private def ranksOf(vs: Array[Double]): Array[Double] = {
    val n = vs.length
    val idx = Array.range(0, n).sortBy(vs(_))
    val r = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && vs(idx(j + 1)) == vs(idx(i))) j += 1
      val avg = (i + j + 2) / 2.0 // mean of 1-based positions i+1 … j+1
      var k = i
      while (k <= j) { r(idx(k)) = avg; k += 1 }
      i = j + 1
    }
    r
  }

  override def eval(buffer: mutable.ArrayBuffer[(Double, Double)]): Any = {
    val n = buffer.length
    if (n < 2) return null
    val rx = ranksOf(buffer.map(_._1).toArray)
    val ry = ranksOf(buffer.map(_._2).toArray)
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var syy = 0.0; var sxy = 0.0
    var i = 0
    while (i < n) {
      sx += rx(i); sy += ry(i)
      sxx += rx(i) * rx(i); syy += ry(i) * ry(i); sxy += rx(i) * ry(i)
      i += 1
    }
    val cov = sxy - sx * sy / n
    val vx = sxx - sx * sx / n
    val vy = syy - sy * sy / n
    if (vx <= 0.0 || vy <= 0.0) null else cov / math.sqrt(vx * vy)
  }

  override def serialize(
      buffer: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { case (a, b) => out.writeDouble(a); out.writeDouble(b) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < n) { b += ((in.readDouble(), in.readDouble())); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): RankCorrAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): RankCorrAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RankCorrAgg =
    copy(x = newChildren(0), y = newChildren(1))
  override def prettyName: String = "rankcorr"
}
