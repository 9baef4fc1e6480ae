package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled kernel for the gap-constrained sequenceMatch DP
  * (reference: the '(?1)(?t<=g)(?2)…' time-conditioned pattern of
  * AggregateFunctionSequenceMatch.h) — one JVM loop over the packed
  * per-user event list instead of the interpreted per-event
  * higher-order-function fold that allocated an n-struct array per
  * event (the a18 cost mode adjudicated in dev/a18_adjudicate_r14.txt;
  * the t21 char_entropy discipline applied to the behavioral layer).
  *
  * Semantics are EXACTLY Behavior.sequenceMatch's Column fold
  * (Behavior.scala gap branch), which BehaviorSpec's planted fixtures
  * and a parity test pin against this kernel:
  *  - per level k the state is the two latest completion times
  *    (l1 > l2); events arrive in (t, ord) sorted order so stored
  *    times are ≤ the current t;
  *  - an event extends level k when its condition k holds and the
  *    latest level-(k−1) completion STRICTLY before t is within
  *    `gap` of t (level 0 always extends);
  *  - matched ⇔ every level has completed.
  *
  * Input: array<struct<t: long, ord: _, ms: array<boolean>>> — the
  * packed(…) layout (field 0 = t, field 2 = ms). Long.MinValue is the
  * internal null sentinel (timestamps are unix micros, far above it).
  */
case class SeqMatchGapExpr(child: Expression, n: Int, gap: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length >= 3 &&
        s.fields(0).dataType == LongType &&
        (s.fields(2).dataType == ArrayType(BooleanType, true) ||
         s.fields(2).dataType == ArrayType(BooleanType, false)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"seq_match_gap expects array<struct<t: long, _, ms: array<boolean>>>, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "seq_match_gap"

  override protected def nullSafeEval(input: Any): Any =
    SeqMatchImpl.matchGap(input.asInstanceOf[ArrayData], n, gap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SeqMatchImpl.matchGap($c, $n, ${gap}L);")

  override protected def withNewChildInternal(newChild: Expression): SeqMatchGapExpr =
    copy(child = newChild)
}

object SeqMatchImpl {
  private final val Nil_ = Long.MinValue

  def matchGap(evs: ArrayData, n: Int, gap: Long): Boolean = {
    val l1 = Array.fill(n)(Nil_)
    val l2 = Array.fill(n)(Nil_)
    val m = evs.numElements()
    var i = 0
    while (i < m) {
      val e = evs.getStruct(i, 3)
      val t = e.getLong(0)
      val ms = e.getArray(2)
      val width = math.min(n, ms.numElements())
      // descending k: level k reads level k−1's PRE-event state, so
      // the in-place update preserves the fold's snapshot semantics
      var k = width - 1
      while (k >= 0) {
        val hit = !ms.isNullAt(k) && ms.getBoolean(k)
        if (hit) {
          val extend =
            if (k == 0) true
            else {
              val p1 = l1(k - 1)
              // latest level-(k−1) completion strictly before t
              val usable = if (p1 != Nil_ && p1 < t) p1 else l2(k - 1)
              usable != Nil_ && t - usable <= gap
            }
          if (extend) {
            // mirror the fold exactly: l1' = greatest(l1, t);
            // l2' = l1 when t strictly advances it, else unchanged
            val cl1 = l1(k)
            if (cl1 == Nil_) l1(k) = t
            else if (t > cl1) { l2(k) = cl1; l1(k) = t }
            // t ≤ cl1 (a tie under sorted input): state unchanged
          }
        }
        k -= 1
      }
      i += 1
    }
    var k = 0
    while (k < n) { if (l1(k) == Nil_) return false; k += 1 }
    true
  }
}
