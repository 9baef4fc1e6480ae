package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, UnresolvedExtractValue}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, Average, CollectList, CollectSet, Count, Max, Min, Sum}
import org.apache.spark.sql.types._

/** The -State / -Merge / -MergeState / -SimpleState aggregate
  * combinators — ClickHouse's two-level aggregation contract
  * (AggregateFunctionCombinatorFactory suffix peeling, resolved by
  * the reference's ASTFunction name lookup like every other
  * combinator chain; the `AggregateFunction(...)` column type these
  * produce is the storage type behind AggregatingMergeTree and every
  * pre-aggregating materialized view).
  *
  *   aggState(x)   per-group PARTIAL aggregate, storable in a column;
  *   aggMerge(st)  combine stored partials to the final value;
  *   aggMergeState(st)  combine partials to a combined PARTIAL
  *                 (re-aggregation to a coarser key keeps the column
  *                 mergeable — the MV-over-MV idiom);
  *   aggSimpleState(x)  the plain value, typed as a mergeable column
  *                 (SimpleAggregateFunction: merge == re-apply).
  *
  * Spark-first realization: the state IS Spark's own partial-agg
  * shape, spelled as portable columns rather than an opaque binary —
  * sum/min/max states are the scalar itself, avg is the (sum, count)
  * pair, uniq is Spark's Datasketches HLL sketch binary
  * (hll_sketch_agg / hll_union_agg — mergeable exactly like CH's
  * uniqState), uniqExact/groupArray are the exact element sets CH
  * also keeps. Every Merge is itself an ordinary Catalyst aggregate,
  * so map-side combine applies at BOTH levels, and a 100 TB
  * MV-partials table re-aggregates with one shuffle on the coarse
  * key. DECIMAL sums stay decimal through the state (exact,
  * order-independent) — the c33 oracle relies on it.
  */
object ChStateMerge {

  private type Builder = Seq[Expression] => Expression

  private def builtin(name: String): Builder = {
    val b = FunctionRegistry.builtin
      .lookupFunctionBuilder(FunctionIdentifier(name))
      .getOrElse(throw new IllegalStateException(s"no builtin '$name'"))
    exprs => b(exprs)
  }

  private val nullL = Literal(null, NullType)

  /** Explicitly wrap any AggregateFunction — these trees nest
    * aggregates under scalar expressions, where the analyzer's
    * root-level auto-wrap does not reach. */
  private def wrap(e: Expression): Expression = e match {
    case af: AggregateFunction => af.toAggregateExpression()
    case other => other
  }

  private def fld(e: Expression, f: String): Expression =
    UnresolvedExtractValue(e, Literal(f))

  /** -If wrapping: off-predicate rows feed NULL into the (null-
    * skipping) state aggregate — identical to ChCombinators. */
  private def iff(cond: Option[Expression], x: Expression): Expression =
    cond.fold(x)(p => If(p, x, nullL))

  // ---- per-base State builders -------------------------------------

  private def state(base: String, cond: Option[Expression],
      vals: Seq[Expression]): Expression = {
    val x = iff(cond, if (vals.isEmpty) Literal(1) else vals.head)
    base match {
      case "sum"   => wrap(Sum(x))
      case "count" => wrap(Count(Seq(x)))
      case "min"   => wrap(Min(x))
      case "max"   => wrap(Max(x))
      // (sum, count) pair; sum keeps the input's exact type (decimal
      // sums stay exact — addition-order independent)
      case "avg" => CreateNamedStruct(Seq(
        Literal("s"), wrap(Sum(x)),
        Literal("c"), wrap(Count(Seq(x)))))
      // Datasketches HLL binary — mergeable across groups
      case "uniq" => wrap2(builtin("hll_sketch_agg")(Seq(x)))
      case "uniqExact"      => wrap(CollectSet(x))
      case "groupArray"     => wrap(CollectList(x))
      case "groupUniqArray" => wrap(CollectSet(x))
    }
  }

  private def wrap2(e: Expression): Expression = wrap(e)

  // ---- per-base Merge / MergeState builders ------------------------

  /** finalize=false keeps the result a STATE (-MergeState). */
  private def merge(base: String, st: Expression,
      finalize: Boolean): Expression = base match {
    case "sum" => wrap(Sum(st))
    // merged count is a sum of partial counts; 0 (not NULL) over an
    // empty merge input, as CH
    case "count" =>
      Coalesce(Seq(wrap(Sum(st)), Literal(0L)))
    case "min" => wrap(Min(st))
    case "max" => wrap(Max(st))
    case "avg" =>
      val s = wrap(Sum(fld(st, "s")))
      val c = wrap(Sum(fld(st, "c")))
      if (!finalize) CreateNamedStruct(Seq(Literal("s"), s, Literal("c"), c))
      // one double division over exactly-merged sums — CH avg is Float64
      else Divide(Cast(s, DoubleType), Cast(c, DoubleType))
    case "uniq" =>
      val u = wrap2(builtin("hll_union_agg")(Seq(st)))
      if (!finalize) u else builtin("hll_sketch_estimate")(Seq(u))
    case "uniqExact" =>
      val els = builtin("array_distinct")(
        Seq(builtin("flatten")(Seq(wrap(CollectList(st))))))
      if (!finalize) els else Cast(builtin("size")(Seq(els)), LongType)
    case "groupArray" =>
      builtin("flatten")(Seq(wrap(CollectList(st))))
    case "groupUniqArray" =>
      builtin("array_distinct")(
        Seq(builtin("flatten")(Seq(wrap(CollectList(st))))))
  }

  private val bases = Seq("sum", "count", "min", "max", "avg", "uniq",
    "uniqExact", "groupArray", "groupUniqArray")
  /** -SimpleState only where merge == re-apply on plain values. */
  private val simple = Set("sum", "min", "max")

  private[graft] lazy val generated: Seq[(String, Builder)] = {
    val entries = bases.flatMap { b =>
      val plainState: Builder = es => state(b, None, es)
      val ifState: Builder = es => state(b, Some(es.last), es.init)
      val m: Builder = es => merge(b, es.head, finalize = true)
      val ms: Builder = es => merge(b, es.head, finalize = false)
      Seq(
        s"${b}State" -> plainState,
        s"${b}IfState" -> ifState,
        s"${b}Merge" -> m,
        s"${b}MergeState" -> ms) ++
        (if (simple(b)) Seq[(String, Builder)](
          s"${b}SimpleState" -> (es => state(b, None, es)),
          s"${b}SimpleStateIf" -> ifState)
        else Nil)
    }
    entries
  }

  lazy val descriptors: Seq[GraftFunctions.Descriptor] =
    generated.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[ChStateMerge.type].getName, name), builder)
    }
}
