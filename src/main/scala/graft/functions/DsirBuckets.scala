package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashed-unigram bucket histogram for DSIR (t16): per row,
  * tokenize on single spaces (Text.words semantics — empties dropped),
  * bucket each token by the first 3 hex digits of md5(token) mod
  * `buckets`, and return the non-zero (bucket, count) pairs sorted by
  * bucket.
  *
  * Why native (the char_entropy/text_signals policy — guide §2.3/§4):
  * the composed spelling explodes the corpus to TOKEN-scale rows
  * (3 md5 calls per token through the string expression tree) and
  * pays a corpus-scale shuffle in `groupBy(doc, tgt, bucket)` just to
  * rebuild the per-doc histogram this kernel emits at scan speed.
  * The histogram is a function of ONE row's text, so the explode and
  * the first shuffle are pure overhead at any corpus size — at 100 TB
  * that shuffle is the operator's dominant cost. Bit-parity with the
  * composed form is pinned by TextSignalsSpec (t16 kernel cases) and
  * the t16 DuckDB oracle, which still spells the per-token md5.
  */
case class DsirBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0 && buckets <= 4096,
    s"dsir_buckets: buckets must be in (0, 4096], got $buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_buckets requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("b", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "dsir_buckets"

  override protected def nullSafeEval(input: Any): Any =
    DsirBucketsImpl.histogram(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirBucketsImpl.histogram($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): DsirBucketsExpr =
    copy(child = newChild)
}

object DsirBucketsImpl {
  // MessageDigest is stateful — one per task thread, reset per token
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // per-thread scratch: counts indexed by bucket + the touched list,
  // cleared after each row so a row's cost is O(tokens + distinct
  // buckets), not O(bucket universe)
  private final class Scratch {
    var counts = new Array[Long](0)
    var touched = new Array[Int](64)
    var nTouched = 0
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** First 3 hex digits of md5(bytes) as an int in [0, 4096). */
  private def bucketOf(d: java.security.MessageDigest,
      bytes: Array[Byte], off: Int, len: Int): Int = {
    d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    ((dig(0) & 0xff) << 4) | ((dig(1) & 0xff) >>> 4)
  }

  def histogram(text: UTF8String, buckets: Int): ArrayData = {
    val bytes = text.getBytes // UTF-8; ' ' (0x20) never occurs inside a
    // multi-byte sequence, so byte-level splitting is exact
    val d = md5.get()
    val s = scratch.get()
    if (s.counts.length < buckets) s.counts = new Array[Long](buckets)
    var i = 0
    val n = bytes.length
    while (i <= n) {
      var j = i
      while (j < n && bytes(j) != ' ') j += 1
      if (j > i) { // non-empty token (Text.words drops empties)
        val b = bucketOf(d, bytes, i, j - i) % buckets
        if (s.counts(b) == 0L) {
          if (s.nTouched == s.touched.length)
            s.touched = java.util.Arrays.copyOf(s.touched, s.touched.length * 2)
          s.touched(s.nTouched) = b
          s.nTouched += 1
        }
        s.counts(b) += 1L
      }
      i = j + 1
    }
    val touched = java.util.Arrays.copyOf(s.touched, s.nTouched)
    java.util.Arrays.sort(touched)
    val out = new Array[Any](touched.length)
    var k = 0
    while (k < touched.length) {
      val b = touched(k)
      out(k) = InternalRow(b, s.counts(b))
      s.counts(b) = 0L
      k += 1
    }
    s.nTouched = 0
    new GenericArrayData(out)
  }
}
