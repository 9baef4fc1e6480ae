package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native single-pass kernels for the reference's running-array
  * functions (reference: src/Functions/array/arrayCumSum.cpp,
  * arrayDifference.cpp — compiled per-element loops there too).
  *
  * Why native instead of Spark HOFs: `transform`/`aggregate` lambdas
  * are CodegenFallback, so a lambda-built cumsum runs at interpreter
  * speed AND the slice-per-index realization is O(n²) in the element
  * count. These are O(n) compiled loops that keep the enclosing
  * whole-stage codegen span intact (the SimHash64 pattern: doGenCode
  * emits one static call; the tight loop lives in compiled Scala).
  *
  * Both take array<double> — the dialect builder inserts a
  * Cast(arr, array<double>) which is itself codegen'd — and return
  * array<double> with the same null semantics the lambda realization
  * had: cumsum poisons every prefix that contains a null (Add
  * propagation); difference yields null where either operand is null
  * and 0.0 at index 0.
  */
case class ArrayCumSumExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arrayCumSum kernel requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "array_cum_sum_native"

  override protected def nullSafeEval(input: Any): Any =
    ArrayNativeImpl.cumSum(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayNativeImpl.cumSum($c);")

  override protected def withNewChildInternal(newChild: Expression): ArrayCumSumExpr =
    copy(child = newChild)
}

case class ArrayDifferenceExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arrayDifference kernel requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "array_difference_native"

  override protected def nullSafeEval(input: Any): Any =
    ArrayNativeImpl.difference(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayNativeImpl.difference($c);")

  override protected def withNewChildInternal(newChild: Expression): ArrayDifferenceExpr =
    copy(child = newChild)
}

case class ArrayProductExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arrayProduct kernel requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null input OR null element
  override def prettyName: String = "array_product_native"

  override protected def nullSafeEval(input: Any): Any =
    ArrayNativeImpl.product(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val tmp = ctx.freshName("prodBoxed")
      s"""
         |java.lang.Double $tmp = graft.functions.ArrayNativeImpl.product($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayProductExpr =
    copy(child = newChild)
}

/** arrayCompact: drop CONSECUTIVE duplicates (keep the first of each
  * run), any orderable element type. Generic equality comes from the
  * interpreted ordering for the element type, carried as a reference
  * object into generated code (one kernel instance per expression —
  * the ordering is resolved once, not per row). */
case class ArrayCompactExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.RowOrdering

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if RowOrdering.isOrderable(et) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arrayCompact kernel requires an array of an orderable type, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "array_compact_native"

  @transient private lazy val kernel =
    new ArrayCompactKernel(child.dataType.asInstanceOf[ArrayType].elementType)

  override protected def nullSafeEval(input: Any): Any =
    kernel.compact(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("compactKernel", kernel,
      classOf[ArrayCompactKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compact($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayCompactExpr =
    copy(child = newChild)
}

final class ArrayCompactKernel(et: DataType) extends Serializable {
  @transient private lazy val ord =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(et)

  // null-safe-equal, CH/EqualNullSafe semantics: (null, null) collapse
  private def eq(a: Any, b: Any): Boolean =
    if (a == null || b == null) a == null && b == null else ord.equiv(a, b)

  def compact(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val kept = new java.util.ArrayList[Any](n)
    var prev: Any = null
    var i = 0
    while (i < n) {
      val x = if (arr.isNullAt(i)) null else arr.get(i, et)
      if (i == 0 || !eq(x, prev)) kept.add(x)
      prev = x
      i += 1
    }
    new GenericArrayData(kept.toArray)
  }
}

/** Static implementation target for eval AND Janino-generated code
  * (top-level object → static forwarders). */
object ArrayNativeImpl {

  /** prod(a) in double; init 1.0 (empty → 1.0); any null element →
    * null (Multiply propagation, matching the lambda fold). */
  def product(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var acc = 1.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc *= arr.getDouble(i)
      i += 1
    }
    acc
  }

  /** out(i) = sum(a(0..i)); any null element makes out(i..) null. */
  def cumSum(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var acc = 0.0
    var poisoned = false
    var i = 0
    while (i < n) {
      if (poisoned || arr.isNullAt(i)) {
        poisoned = true
        out(i) = null
      } else {
        acc += arr.getDouble(i)
        out(i) = acc
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** out(0) = 0.0; out(i) = a(i) - a(i-1), null if either is null. */
  def difference(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i == 0) out(0) = 0.0
      else if (arr.isNullAt(i) || arr.isNullAt(i - 1)) out(i) = null
      else out(i) = arr.getDouble(i) - arr.getDouble(i - 1)
      i += 1
    }
    new GenericArrayData(out)
  }
}
