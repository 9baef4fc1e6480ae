package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature (Broder 1997, "On the resemblance and
  * containment of documents"): k 64-bit minima over a token set under
  * k independent hash permutations. Signature agreement rate is an
  * unbiased estimate of Jaccard similarity; banding the signature
  * gives LSH buckets so near-dup candidate generation is linear, not
  * O(n²) — the scale path for 100 TB dedup (SURVEY §2 d02).
  *
  * Hash family: base = first 8 bytes of md5(token) (same convention as
  * SimHash64), then permutation j applies splitmix64(base + j) — full
  * avalanche, plain wrapping Java arithmetic, zero dependencies. One
  * md5 per token, k cheap mixes per token.
  *
  * eval + doGenCode: the per-token/per-permutation loops run in
  * compiled Scala; whole-stage codegen survives.
  */
case class MinHash64(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash64 requires array<string> and k>0, got ${other.simpleString}, k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.MinHashImpl.signature($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHashImpl {
  /** splitmix64 finalizer — standard public-domain mixing constants. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signature(tokens: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // null/empty tokens skipped, same contract as SimHashImpl.hash
      if (!tokens.isNullAt(i) && tokens.getUTF8String(i).numBytes > 0) {
        val base = SimHashImpl.md5First8(tokens.getUTF8String(i).getBytes)
        var j = 0
        while (j < k) {
          val h = mix(base + j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
