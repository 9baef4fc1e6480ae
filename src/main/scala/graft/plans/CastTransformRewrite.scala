package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Cast, Expression, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Collapse `transform(arr, x -> cast(...cast(x)...))` into nested
  * ARRAY-LEVEL Casts.
  *
  * Why: lambda higher-order functions are CodegenFallback — every row
  * pays an interpreted-closure walk — while Cast of an array applies
  * the IDENTICAL per-element cast inside whole-stage codegen. The
  * pattern is the dialect's pervasive rendering idiom
  * (`arrayMap(x -> toString(x), a)` from arrayStringConcat chains), so
  * collapsing it moves hot projections from interpreter speed to
  * codegen (reference: src/Functions/array/arrayMap.h — the reference
  * compiles lambda kernels; this recovers the same property where the
  * lambda is a pure conversion).
  *
  * Each step keeps its own evalMode/timezone, so ANSI/TRY casts keep
  * their semantics. Element nullability is widened to `true` — a
  * superset claim, safe for every consumer — because the per-step
  * force-nullability accounting lives in private Cast internals; the
  * `resolved` guard rejects any rebuild the cast rules won't accept.
  */
case class CastTransformRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  /** Unwind body as casts over exactly the lambda variable; innermost
    * first in the result. */
  private def castChain(body: Expression, v: NamedLambdaVariable,
                        acc: List[Cast]): Option[List[Cast]] = body match {
    case c @ Cast(inner, _, _, _) => castChain(inner, v, c :: acc)
    case nv: NamedLambdaVariable if nv.exprId == v.exprId => Some(acc)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case t @ ArrayTransform(arr, LambdaFunction(body, Seq(v: NamedLambdaVariable), _)) =>
        castChain(body, v, Nil) match {
          case Some(casts) if casts.nonEmpty =>
            val rebuilt = casts.foldLeft(arr) { (a, c) =>
              Cast(a, ArrayType(c.dataType, containsNull = true),
                c.timeZoneId, c.evalMode)
            }
            if (rebuilt.resolved) rebuilt else t
          case _ => t
        }
    }
}
