package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared-L2 distances from a vector to every row of a centroid
  * matrix, one tight loop: `cell_distances(vec, centroids)` →
  * array<double> (length k).
  *
  * The composed form (k separate aggregate(zip_with(vec,
  * literal-centroid)) trees) plants k·dim literals and re-runs
  * whole-stage codegen on a megabyte of generated source every time
  * the centroids change — measured minutes per k-means run. This
  * expression takes the centroid matrix as ONE literal child.
  *
  * Distances are rounded to 1e-9 so centroid drift from float
  * summation order can never flip a cell assignment between runs.
  */
case class CellDistances(left: Expression, right: Expression)
    extends BinaryExpression {

  private val isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
          ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_distances requires (array<float|double>, array<array<double>>), got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cell_distances"

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    CellDistImpl.dists(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.CellDistImpl.dists($v, $c, $isFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellDistances =
    copy(left = newLeft, right = newRight)
}

object CellDistImpl {
  def dists(vec: ArrayData, cents: ArrayData, isFloat: Boolean): ArrayData = {
    val k = cents.numElements()
    val n = vec.numElements()
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents.getArray(c)
      var s = 0.0
      var d = 0
      while (d < n) {
        val x = (if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)) -
          cent.getDouble(d)
        s += x * x
        d += 1
      }
      out(c) = math.round(s * 1e9).toDouble / 1e9
      c += 1
    }
    new GenericArrayData(out)
  }
}
