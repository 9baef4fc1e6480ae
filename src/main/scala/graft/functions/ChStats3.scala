package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.types._

/** Round-9 aggregate-surface extras (reference ASTFunction.h name
  * registry; public CH semantics):
  *
  *  - analysisOfVariance / anova(value, group_idx) → (F, p): one-way
  *    ANOVA. Per-cohort (n, Σv, Σv²) ride the native keyed-map
  *    aggregate (state = O(cohorts), map-side combining — cohort
  *    count is data-dependent, so scalar FILTER sums can't express
  *    it); F from the classic SSB/SSW decomposition; the upper-tail
  *    p-value via the Paulson–Wilson–Hilferty cube-root normal
  *    approximation of F, then the A&S 7.1.26 erfc — the same
  *    closed forms the DuckDB oracle spells.
  *  - singleValueOrNull(x): the group's value when exactly one
  *    distinct value, else NULL.
  *  - groupConcat[(sep[, limit])](x): concatenation with separator;
  *    realized over the SORTED group (CH's arrival order is
  *    block-order-dependent — non-deterministic distributed;
  *    documented deviation, the t05 md5-order discipline).
  *  - skewSamp / kurtSamp: sample central moments over power sums
  *    (pure partial agg, no buffering).
  *  - sumMapFiltered(keys)(k, v): sumMap restricted to a literal key
  *    list — entries drop per row BEFORE the aggregate.
  *  - quantileGK(accuracy, level)(x): CH's Greenwald-Khanna sketch →
  *    Spark's approx_percentile (the same GK-family sketch).
  *  - quantileBFloat16(level)(x): exact percentile over values
  *    rounded to bfloat16 (top 16 bits of the float32 pattern — a
  *    ChNumHelpers kernel).
  */
private[graft] object ChStats3 {
  import ChDialect.builtin

  private def lit(x: Double): Expression = Literal(x)
  private def fld(e: Expression, f: String): Expression =
    UnresolvedExtractValue(e, Literal(f))

  private implicit final class Ops(private val e: Expression) {
    def +(o: Expression): Expression = Add(e, o)
    def -(o: Expression): Expression = Subtract(e, o)
    def *(o: Expression): Expression = Multiply(e, o)
    def /(o: Expression): Expression = Divide(e, o)
  }

  private def wrapAgg(e: Expression): Expression = e match {
    case af: aggregate.AggregateFunction => af.toAggregateExpression()
    case other => other
  }

  private def sumOf(e: Expression): Expression =
    wrapAgg(builtin("sum")(Seq(Cast(e, DoubleType))))

  /** A&S 7.1.26 erfc (the ChStats polynomial, restated — each stats
    * file keeps its closed forms self-contained). */
  private def erfcOf(x: Expression): Expression = {
    val u = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    u * (lit(0.254829592) + u * (lit(-0.284496736) + u * (lit(1.421413741) +
      u * (lit(-1.453152027) + u * lit(1.061405429))))) *
      builtin("exp")(Seq(UnaryMinus(x * x)))
  }

  private def cbrt(e: Expression): Expression =
    builtin("power")(Seq(e, lit(1.0 / 3.0)))

  /** One-way ANOVA: value `v`, cohort index `g`. */
  def anova(v: Expression, g: Expression): Expression = {
    val vd = Cast(v, DoubleType)
    val one = CreateArray(Seq(Cast(g, StringType)))
    def kv(value: Expression, op: String): Expression =
      MapCombineAgg(one, CreateArray(Seq(value)), op)
        .toAggregateExpression()
    val nMap = kv(lit(1.0), "count")
    val sMap = kv(vd, "sum")
    val qMap = kv(vd * vd, "sum")
    // keys sort ascending in every map → positionally zippable
    val ns = builtin("map_values")(Seq(nMap))
    val ss = builtin("map_values")(Seq(sMap))
    val qs = builtin("map_values")(Seq(qMap))
    def total(arr: Expression): Expression = {
      val a = UnresolvedNamedLambdaVariable(Seq("__an_a"))
      val x = UnresolvedNamedLambdaVariable(Seq("__an_x"))
      builtin("aggregate")(Seq(arr, lit(0.0),
        LambdaFunction(a + Cast(x, DoubleType), Seq(a, x))))
    }
    val k = Cast(builtin("size")(Seq(ns)), DoubleType)
    val bigN = total(ns)
    val bigS = total(ss)
    val bigQ = total(qs)
    // Σ s_g²/n_g via an index fold over the zipped value arrays
    val i = UnresolvedNamedLambdaVariable(Seq("__an_i"))
    val acc = UnresolvedNamedLambdaVariable(Seq("__an_acc"))
    val sAt = builtin("element_at")(Seq(ss, Cast(i, IntegerType)))
    val nAt = Cast(builtin("element_at")(Seq(ns, Cast(i, IntegerType))),
      DoubleType)
    val ssbPart = builtin("aggregate")(Seq(
      builtin("sequence")(Seq(Literal(1), builtin("size")(Seq(ns)))),
      lit(0.0),
      LambdaFunction(acc + sAt * sAt / nAt, Seq(acc, i))))
    val ssb = ssbPart - bigS * bigS / bigN
    val ssw = bigQ - ssbPart
    val d1 = k - lit(1.0)
    val d2 = bigN - k
    val f = (ssb / d1) / (ssw / d2)
    // Paulson (1942) normal approximation of the F upper tail
    val a1 = lit(2.0) / (lit(9.0) * d1)
    val a2 = lit(2.0) / (lit(9.0) * d2)
    val z = ((lit(1.0) - a2) * cbrt(f) - (lit(1.0) - a1)) /
      builtin("sqrt")(Seq(a1 + cbrt(f) * cbrt(f) * a2))
    val p = builtin("least")(Seq(lit(1.0), builtin("greatest")(Seq(
      lit(0.0), lit(0.5) * erfcOf(z / lit(math.sqrt(2.0)))))))
    CreateNamedStruct(Seq(Literal("_1"), f, Literal("_2"), p))
  }

  /** singleValueOrNull(x): the value iff one distinct value. */
  def singleValueOrNull(x: Expression): Expression = {
    val distinct = aggregate.Count(Seq(x))
      .toAggregateExpression(isDistinct = true)
    If(EqualTo(distinct, Literal(1L)),
      wrapAgg(builtin("min")(Seq(x))), Literal.create(null, NullType))
  }

  /** groupConcat([sep[, limit]])(x) — sorted order (see Scaladoc). */
  def groupConcat(es: Seq[Expression]): Expression = {
    val lead = es.dropRight(1).takeWhile(_.isInstanceOf[Literal])
    val x = es.last
    val sep = lead.headOption.getOrElse(Literal(""))
    val sorted = builtin("sort_array")(Seq(wrapAgg(
      builtin("collect_list")(Seq(Cast(x, StringType))))))
    val limited = lead.lift(1) match {
      case Some(n) => builtin("slice")(Seq(sorted, Literal(1),
        Cast(n, IntegerType)))
      case None => sorted
    }
    builtin("array_join")(Seq(limited, sep))
  }

  /** Sample skewness / kurtosis from power sums (CH skewSamp /
    * kurtSamp: third/fourth central sums over (n−1), scaled by the
    * sample variance). */
  def skewSamp(x: Expression): Expression = momentSamp(x, 3)
  def kurtSamp(x: Expression): Expression = momentSamp(x, 4)

  private def momentSamp(x: Expression, ord: Int): Expression = {
    val v = Cast(x, DoubleType)
    val n = sumOf(lit(1.0))
    val s1 = sumOf(v)
    val s2 = sumOf(v * v)
    val s3 = sumOf(v * v * v)
    val s4 = if (ord == 4) sumOf(v * v * v * v) else lit(0.0)
    val mu = s1 / n
    val varSamp = (s2 - s1 * mu) / (n - lit(1.0))
    if (ord == 3) {
      // Σ(x−μ)³ = S3 − 3μS2 + 2nμ³
      val m3 = (s3 - lit(3.0) * mu * s2 + lit(2.0) * n * mu * mu * mu) /
        (n - lit(1.0))
      m3 / builtin("power")(Seq(varSamp, lit(1.5)))
    } else {
      // Σ(x−μ)⁴ = S4 − 4μS3 + 6μ²S2 − 3nμ⁴
      val m4 = (s4 - lit(4.0) * mu * s3 + lit(6.0) * mu * mu * s2 -
        lit(3.0) * n * mu * mu * mu * mu) / (n - lit(1.0))
      m4 / (varSamp * varSamp)
    }
  }

  /** sumMapFiltered(keepKeys)(keys, values): entries outside the
    * literal keep list drop per row BEFORE the keyed aggregate. */
  def sumMapFiltered(es: Seq[Expression]): Expression = {
    require(es.size == 3,
      "sumMapFiltered(keep_keys)(keys, values)")
    val (keep, keys, values) = (es(0), es(1), es(2))
    // positional filter (arrays_zip field names depend on the input
    // column names — index arithmetic doesn't)
    val i = UnresolvedNamedLambdaVariable(Seq("__smf_i"))
    val j = UnresolvedNamedLambdaVariable(Seq("__smf_j"))
    val keptIdx = builtin("filter")(Seq(
      builtin("sequence")(Seq(Literal(1), builtin("size")(Seq(keys)))),
      LambdaFunction(builtin("array_contains")(Seq(keep,
        builtin("element_at")(Seq(keys, Cast(i, IntegerType))))), Seq(i))))
    val fk = builtin("transform")(Seq(keptIdx, LambdaFunction(
      builtin("element_at")(Seq(keys, Cast(j, IntegerType))), Seq(j))))
    val fv = builtin("transform")(Seq(keptIdx, LambdaFunction(
      builtin("element_at")(Seq(values, Cast(j, IntegerType))), Seq(j))))
    MapCombineAgg(fk, fv, "sum").toAggregateExpression()
  }

  /** The -Resample combinator (CH AggregateFunctionResample):
    * `aggResample(start, end, step)(x, key)` → array of the
    * aggregate over each key bucket [start+i·step, start+(i+1)·step)
    * clipped at end. Bucket count is literal-known, so the array is a
    * fixed battery of FILTER-clause aggregates — every bucket stays a
    * partial agg (map-side combining), no buffering, one pass.
    * Empty buckets: sum/count finalize to 0 (CH's default-value
    * contract); avg/min/max/uniq stay NULL (documented deviation —
    * CH renders its type default there). */
  def resample(op: String, es: Seq[Expression]): Expression = {
    require(es.size == 5,
      s"${op}Resample(start, end, step)(x, resample_key)")
    def litLong(e: Expression, what: String): Long = e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"${op}Resample needs a literal $what, got $other")
    }
    val start = litLong(es(0), "start")
    val end = litLong(es(1), "end")
    val step = litLong(es(2), "step")
    require(step > 0 && end > start,
      s"${op}Resample: need step > 0 and end > start")
    val nb = ((end - start) + step - 1) / step
    require(nb <= 1024, s"${op}Resample: ${nb} buckets — cap is 1024")
    val x = es(3)
    val key = Cast(es(4), LongType)
    val buckets = (0L until nb).map { b =>
      val lo = start + b * step
      val hi = math.min(lo + step, end)
      val cond = And(GreaterThanOrEqual(key, Literal(lo)),
        LessThan(key, Literal(hi)))
      val agg: Expression = op match {
        case "uniq" => aggregate.Count(Seq(x))
            .toAggregateExpression(isDistinct = true, filter = Some(cond))
        case _ => builtin(if (op == "uniqExact") "count" else op)(
          Seq(x)) match {
          case af: aggregate.AggregateFunction =>
            af.toAggregateExpression(isDistinct = false,
              filter = Some(cond))
          case other => other
        }
      }
      op match {
        case "sum" | "count" =>
          Coalesce(Seq(agg, Cast(Literal(0L), LongType)))
        case _ => agg
      }
    }
    CreateArray(buckets)
  }

  /** quantileGK(accuracy, level)(x) → approx_percentile (Spark's
    * sketch is the same Greenwald-Khanna family CH names). */
  def quantileGK(es: Seq[Expression]): Expression = {
    require(es.size == 3, "quantileGK(accuracy, level)(x)")
    builtin("approx_percentile")(Seq(es(2), es(1), es(0)))
  }

  /** quantileBFloat16(x, level): exact percentile over
    * bfloat16-rounded values. */
  def quantileBFloat16(es: Seq[Expression]): Expression = {
    val level = if (es.size > 1) es(1) else Literal(0.5)
    val rounded = org.apache.spark.sql.catalyst.expressions.objects
      .StaticInvoke(ChNumHelpers.getClass, DoubleType, "bfloat16Round",
        Seq(Cast(es(0), DoubleType)), inputTypes = Seq(DoubleType))
    wrapAgg(builtin("percentile")(Seq(rounded, level)))
  }
}
