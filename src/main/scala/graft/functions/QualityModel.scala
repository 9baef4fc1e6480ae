package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashed-feature linear scorer for t10 (the fasttext-style
  * document-quality shape): per whitespace token, bucket = first 12
  * bits of md5(token) mod `buckets`, weight = the exact Knuth-ramp
  * (bucket·2654435761 mod 2^20)/2^20 − 0.5; returns
  * struct(sum double, n int) — the weight sum in token order and the
  * token count.
  *
  * Replaces an interpreted aggregate-lambda fold that ran
  * md5+conv+substring per token per row at interpreter speed. The
  * kernel keeps the EXACT same arithmetic: md5 prefix bits equal
  * conv(substring(md5hex,1,3),16,10); the sum adds left-to-right in
  * token order, so the DuckDB list-fold oracle's IEEE sequence is
  * reproduced bit-for-bit. Tokenization = TextSignals' contract
  * (split on single space, empties dropped).
  */
case class QualityModelExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, s"quality_model buckets must be > 0, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quality_model requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = QualityModelImpl.schema
  override def prettyName: String = "quality_model"

  override protected def nullSafeEval(input: Any): Any =
    QualityModelImpl.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityModelImpl.compute($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): QualityModelExpr =
    copy(child = newChild)
}

object QualityModelImpl {
  val schema: StructType = StructType(Seq(
    StructField("sum", DoubleType, nullable = false),
    StructField("n", IntegerType, nullable = false)))

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** weight of one token: first 12 bits of md5 (== the 3-hex-digit
    * prefix) mod buckets, through the exact integer Knuth ramp. */
  def weight(tokenBytes: Array[Byte], off: Int, len: Int, buckets: Int): Double = {
    val md = digest.get()
    md.reset()
    md.update(tokenBytes, off, len)
    val d = md.digest()
    val prefix12 = ((d(0) & 0xff) << 4) | ((d(1) >> 4) & 0x0f)
    val b = (prefix12 % buckets).toLong
    (b * 2654435761L % 1048576L).toDouble / 1048576.0 - 0.5
  }

  def compute(s: UTF8String, buckets: Int): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var sum = 0.0
    var count = 0
    var i = 0
    var tokStart = -1
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (tokStart >= 0) {
          sum += weight(bytes, tokStart, i - tokStart, buckets)
          count += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    new GenericInternalRow(Array[Any](sum, count))
  }
}
