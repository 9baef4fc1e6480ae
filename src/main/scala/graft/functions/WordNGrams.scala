package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional word n-grams over a token array: one space-joined gram
  * per span start, size max(0, len-n+1) — the shingle builder behind
  * ngram-Jaccard dedup, span dedup, decontamination and repetition
  * signals (reference: ClickHouse's ngram family in
  * src/Functions/FunctionsStringSimilarity.cpp is likewise a compiled
  * kernel).
  *
  * Why native: the composed form (transform over arrays_zip of n
  * shifted slices) is a CodegenFallback lambda — interpreted per row,
  * and it materializes n shifted copies of the token array. This is
  * one compiled pass, no copies, inside whole-stage codegen.
  *
  * Parity with the composed form (pinned by WordNGramsSpec):
  * grams joined with single spaces via concat_ws semantics (null
  * tokens skipped, empty tokens kept), trailing null-padded spans
  * dropped — i.e. exactly `slice(transform(arrays_zip(...)), 1,
  * greatest(size - n + 1, 0))`.
  */
case class WordNGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNGramsImpl.grams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGramsImpl.grams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGramsExpr =
    copy(child = newChild)
}

object WordNGramsImpl {
  private val SPACE = UTF8String.fromString(" ")

  def grams(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val out = new Array[Any](math.max(0, len - n + 1))
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < out.length) {
      var j = 0
      while (j < n) {
        // concat_ws semantics: null tokens skipped (concatWs ignores
        // null inputs), empty tokens kept
        window(j) =
          if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
