package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled pair-explode kernel for the set-similarity core
  * (Dedup.setJaccardPairs / ngramContainment): all unordered
  * (id1, s1, id2, s2) pairs of a capped_id_sz_list array (sorted by
  * id, so i < j gives id1 < id2), with the Jaccard size-ratio prune
  * applied INLINE when `minRatio` > 0 — J >= t implies min(|A|,|B|)
  * >= t·max(|A|,|B|), so rows failing the ratio can never reach the
  * threshold and dropping them changes no results.
  *
  * Replaces the interpreted nested transform+slice composition
  * (szPairsOf): that shape allocated a sliced copy of the tail per
  * outer element (O(df²) copying) plus one lambda-eval'd struct per
  * pair; this is one JVM loop into one pre-sized array. Arithmetic of
  * the prune is IDENTICAL to the former Column filter
  * (least(s1,s2) >= lit(t) * greatest(s1,s2), evaluated in doubles).
  * DedupSpec pins kernel ≡ composed form.
  */
case class SzPairsExpr(child: Expression, minRatio: Double)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s.fields(0).dataType == LongType &&
        s.fields(1).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sz_pairs expects array<struct<id: bigint, sz: int>>, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id1", LongType, nullable = false),
      StructField("s1", IntegerType, nullable = false),
      StructField("id2", LongType, nullable = false),
      StructField("s2", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "sz_pairs"

  override protected def nullSafeEval(input: Any): Any =
    SzPairsImpl.pairs(input.asInstanceOf[ArrayData], minRatio)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SzPairsImpl.pairs($c, $minRatio);")

  override protected def withNewChildInternal(newChild: Expression): SzPairsExpr =
    copy(child = newChild)
}

object SzPairsImpl {
  def pairs(arr: ArrayData, minRatio: Double): GenericArrayData = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val szs = new Array[Int](n)
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, 2)
      ids(i) = e.getLong(0)
      szs(i) = e.getInt(1)
      i += 1
    }
    // pre-size in long arithmetic: int n*(n-1)/2 overflows negative
    // past n ~ 65536 (callers cap at 1000 today, but maxDf is
    // caller-controlled) — clamp instead of throwing at construction
    val preSize = math.min(1 << 20, n.toLong * (n - 1) / 2).toInt
    val out = new java.util.ArrayList[Any](preSize)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val lo = math.min(szs(i), szs(j)).toDouble
        val hi = math.max(szs(i), szs(j)).toDouble
        if (minRatio <= 0.0 || lo >= minRatio * hi) {
          out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](ids(i), szs(i), ids(j), szs(j))))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
