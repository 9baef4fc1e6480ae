package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native random-hyperplane LSH encoder: `tables` independent
  * `bits`-bit bucket codes for an embedding vector, one tight loop.
  *
  * The composed-builtins form (one aggregate(zip_with(vec, plane)) per
  * table×bit) is semantically identical but plants tables·bits
  * expression trees with dim-sized literal arrays into the plan —
  * 4096 literals at 8×8×64, which bloats analysis/codegen and walks
  * the vector 64 times per row. This expression walks it once per
  * bit with zero literals.
  *
  * Hyperplanes are a deterministic ±1 family:
  * sign(t,b,d) = +1 iff splitmix64(((t·64+b) << 32) + d) is even —
  * fixed across runs and cluster sizes. The plane index (t·64+b) and
  * the dimension d live in disjoint bit ranges of the seed, so seeds
  * are collision-free for any dim < 2^32 (a plain (t·64+b)·D+d seed
  * would alias adjacent planes past dim D and silently correlate
  * them, degrading recall).
  */
case class HyperplaneCode(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  private val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if tables > 0 && bits > 0 && bits <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_lsh requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_lsh"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneImpl.codes(input.asInstanceOf[ArrayData], tables, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneImpl.codes($c, $tables, $bits, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCode =
    copy(child = newChild)
}

object HyperplaneImpl {
  def codes(vec: ArrayData, tables: Int, bits: Int, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var b = 0
      while (b < bits) {
        var s = 0.0
        var d = 0
        while (d < n) {
          val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          // +x for even splitmix64(((t*64+b)<<32)+d), else -x — exactly
          // x * (±1.0); plane id and dim in disjoint seed bit ranges
          if ((MinHashImpl.mix(((t * 64 + b).toLong << 32) + d) & 1L) == 0L) s += x
          else s -= x
          d += 1
        }
        if (s > 0) code |= (1L << b)
        b += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }
}
