package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text signals for the curation funnel (t01/t02/t03 and the
  * d09/d13 signal projection): whitespace token count, char count,
  * punctuation count, and per-language stopword hit counts, all from
  * a SINGLE compiled walk of the string.
  *
  * Why native: the composed realization — `filter(split(text,' '),_)`
  * plus one `filter(ws, isin(dict))` per language — is 6+ interpreted
  * lambda passes per row (HOFs are CodegenFallback, and fallback
  * projections get no subexpression elimination, so `words(text)`
  * re-splits per consumer). This kernel is one call per row; identical
  * instances of it in one projection DO dedupe, because the project
  * stays whole-stage-codegen'd and codegen CSE applies.
  *
  * Field semantics mirror the composed forms EXACTLY (pinned by
  * TextSignalsSpec and the t01/t02/t03 oracles):
  *  - tokens: maximal runs of non-space bytes (split on single 0x20,
  *    empties dropped);
  *  - hits(i): occurrences (with repeats) of stopword-list i's words
  *    among the tokens, list order = `stopwords` below;
  *  - punct: chars in ".,!?;:" (ASCII bytes can't occur inside UTF-8
  *    continuation sequences, so the byte scan is exact);
  *  - n_chars: code points, = Spark `length()`.
  */
case class TextSignalsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_signals requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = TextSignalsImpl.schema
  override def prettyName: String = "text_signals"

  override protected def nullSafeEval(input: Any): Any =
    TextSignalsImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSignalsImpl.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TextSignalsExpr =
    copy(child = newChild)
}

object TextSignalsImpl {

  /** Minimal public stopword lists per language (frequency heuristics,
    * not linguistics). Canonical copy — operators.Text re-exports it. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "los", "y", "es", "en", "un", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "un", "que"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "ren", "you", "ta"))

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  private val nLangs = stopwords.size

  /** token → indexes of the stopword lists containing it (a word can
    * sit in several lists — "de"/"le" do). */
  private val dict: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    for (((_, words), li) <- stopwords.zipWithIndex; w <- words) {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(li) else prev :+ li)
    }
    m
  }

  private def isPunct(b: Byte): Boolean =
    b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':'

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    val hits = new Array[Int](nLangs)
    var nWords = 0
    var punct = 0
    var i = 0
    var tokStart = -1
    def endToken(end: Int): Unit = if (tokStart >= 0) {
      nWords += 1
      val langs = dict.get(UTF8String.fromBytes(bytes, tokStart, end - tokStart))
      if (langs != null) {
        var j = 0
        while (j < langs.length) { hits(langs(j)) += 1; j += 1 }
      }
      tokStart = -1
    }
    while (i < n) {
      val b = bytes(i)
      if (b == ' ') endToken(i)
      else {
        if (tokStart < 0) tokStart = i
        if (isPunct(b)) punct += 1
      }
      i += 1
    }
    endToken(n)
    new GenericInternalRow(Array[Any](nWords, s.numChars(), punct,
      new GenericArrayData(hits.map(x => x: Any))))
  }
}
