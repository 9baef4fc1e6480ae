package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.types._

/** ClickHouse's statistical-test aggregates (reference
  * src/Parsers/ASTFunction.h name registry; public ClickHouse
  * semantics) — the A/B-testing family: studentTTest / welchTTest /
  * mannWhitneyUTest(sample_data, sample_index), each returning the CH
  * tuple shape (statistic, two-sided p-value) as a `_1`/`_2` struct.
  *
  * Statistics are EXACT distributed arithmetic:
  *  - both t-tests are pure compositions of partial-agg sums
  *    (n/Σv/Σv² per cohort, FILTER-style) — no buffering, map-side
  *    combining, scale-free;
  *  - the U test is rank-based, so it folds the group's sorted
  *    (value, cohort) pairs with average-rank tie handling — per-group
  *    state is O(sample), the same shape ClickHouse's own
  *    implementation buffers (a rank test is inherently so).
  *
  * p-values use closed-form published approximations (no incomplete
  * beta in either engine): the t→z transform z = |t|(1-1/(4df)) /
  * √(1+t²/(2df)) (Johnson & Kotz) followed by the Abramowitz-Stegun
  * 7.1.26 erfc polynomial; the U test uses the tie-corrected,
  * continuity-corrected normal approximation. Accuracy ~1e-2 for
  * df ≥ 5 and better as df grows; the DuckDB oracle spells the SAME
  * formulas, so the cross-engine compare is exact, and ChDialectSpec
  * pins the statistics against closed-form hand computations.
  */
private[graft] object ChStats {
  import ChDialect.builtin

  private def d(e: Expression): Expression = Cast(e, DoubleType)
  private def lit(x: Double): Expression = Literal(x)

  private implicit final class Ops(private val e: Expression) {
    def +(o: Expression): Expression = Add(e, o)
    def -(o: Expression): Expression = Subtract(e, o)
    def *(o: Expression): Expression = Multiply(e, o)
    def /(o: Expression): Expression = Divide(e, o)
  }

  private def sqrt(e: Expression) = builtin("sqrt")(Seq(e))
  private def exp(e: Expression) = builtin("exp")(Seq(e))
  private def abs(e: Expression) = builtin("abs")(Seq(e))

  private def fresh(n: String): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq(
      UnresolvedNamedLambdaVariable.freshVarName(n)))
  private def fld(e: Expression, f: String): Expression =
    UnresolvedExtractValue(e, Literal(f))

  private def wrapAgg(e: Expression): Expression = e match {
    case af: aggregate.AggregateFunction => af.toAggregateExpression()
    case other => other
  }

  /** Per-cohort partial-agg sums: (n, Σv, Σv²) for cohort `c`. */
  private def cohortSums(v: Expression, c: Expression)
      : (Expression, Expression, Expression) = {
    def sumIf(x: Expression): Expression =
      wrapAgg(aggregate.Sum(If(c, x, Literal(null, DoubleType))))
    val n = d(wrapAgg(aggregate.Count(Seq(If(c, Literal(1), Literal(null, IntegerType))))))
    (n, sumIf(v), sumIf(v * v))
  }

  /** A&S 7.1.26: erfc(x) for x ≥ 0, |ε| < 1.5e-7. Horner form —
    * the oracle SQL must spell the identical Horner chain. */
  private def erfc(x: Expression): Expression = {
    val u = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = u * (lit(0.254829592) + u * (lit(-0.284496736) +
      u * (lit(1.421413741) + u * (lit(-1.453152027) + u * lit(1.061405429)))))
    poly * exp(lit(0.0) - x * x)
  }

  /** Two-sided p from a t statistic and (possibly fractional) df,
    * via the t→z transform + normal tail. */
  private def pFromT(t: Expression, df: Expression): Expression = {
    val z = (abs(t) * (lit(1.0) - lit(1.0) / (lit(4.0) * df))) /
      sqrt(lit(1.0) + t * t / (lit(2.0) * df))
    erfc(z / lit(math.sqrt(2.0)))
  }

  private def tuple2(a: Expression, b: Expression): Expression =
    CreateNamedStruct(Seq(Literal("_1"), a, Literal("_2"), b))

  /** studentTTest(v, idx): equal-variance two-sample t test; cohorts
    * are idx = 0 (first sample) vs anything else. */
  def studentTTest(es: Seq[Expression]): Expression = {
    val v = d(es(0))
    val c0 = EqualTo(Cast(es(1), IntegerType), Literal(0))
    val (n1, s1, q1) = cohortSums(v, c0)
    val (n2, s2, q2) = cohortSums(v, Not(c0))
    val df = n1 + n2 - lit(2.0)
    val ssq = (q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2)
    val sp2 = ssq / df
    val t = (s1 / n1 - s2 / n2) / sqrt(sp2 * (lit(1.0) / n1 + lit(1.0) / n2))
    tuple2(t, pFromT(t, df))
  }

  /** welchTTest(v, idx): unequal-variance t test, Welch–Satterthwaite
    * df. */
  def welchTTest(es: Seq[Expression]): Expression = {
    val v = d(es(0))
    val c0 = EqualTo(Cast(es(1), IntegerType), Literal(0))
    val (n1, s1, q1) = cohortSums(v, c0)
    val (n2, s2, q2) = cohortSums(v, Not(c0))
    val va1 = (q1 - s1 * s1 / n1) / (n1 - lit(1.0))
    val va2 = (q2 - s2 * s2 / n2) / (n2 - lit(1.0))
    val se1 = va1 / n1
    val se2 = va2 / n2
    val se = se1 + se2
    val t = (s1 / n1 - s2 / n2) / sqrt(se)
    val df = (se * se) /
      (se1 * se1 / (n1 - lit(1.0)) + se2 * se2 / (n2 - lit(1.0)))
    tuple2(t, pFromT(t, df))
  }

  /** mannWhitneyUTest(v, idx): U statistic of the FIRST sample
    * (idx = 0), average-rank ties, tie-corrected variance, continuity
    * correction 0.5, two-sided normal p. Rank sums come from ONE fold
    * over the group's sorted (value, cohort) pairs: runs of equal
    * values flush as count × average-rank, so ties cost O(1) state.
    */
  def mannWhitneyUTest(es: Seq[Expression]): Expression = {
    val v = d(es(0))
    val c0 = EqualTo(Cast(es(1), IntegerType), Literal(0))
    val entry = CreateNamedStruct(Seq(
      Literal("v"), v,
      Literal("o"), If(c0, Literal(1L), Literal(0L))))
    val arr = builtin("sort_array")(
      Seq(wrapAgg(builtin("collect_list")(Seq(entry)))))
    // the rank fold is a compiled kernel since r19 (MwFoldExpr — the
    // SweepMaxExpr treatment: the interpreted ArrayAggregate fold
    // allocated a 6-field struct per element); the composed fold below
    // stays as the kernel's parity oracle (mwRankFoldComposed,
    // ChDialectSpec), never on a hot path
    val foldedRaw = MwFoldExpr(arr)
    val (n1e, _, _) = cohortSums(v, c0)
    val (n2e, _, _) = cohortSums(v, Not(c0))
    // bind the fold ONCE (no CSE in interpreted projections); the
    // cohort counts are agg-buffer references, already O(1)
    bind(foldedRaw) { folded =>
      val r1 = fld(folded, "r1")
      val ties = fld(folded, "ties")
      val n1 = n1e
      val n2 = n2e
      val n = n1 + n2
      val u1 = r1 - n1 * (n1 + lit(1.0)) / lit(2.0)
      val mu = n1 * n2 / lit(2.0)
      val variance = (n1 * n2 / lit(12.0)) *
        ((n + lit(1.0)) - ties / (n * (n - lit(1.0))))
      val zNum = abs(u1 - mu) - lit(0.5)
      val z = If(GreaterThan(zNum, lit(0.0)), zNum, lit(0.0)) / sqrt(variance)
      val p = If(LessThanOrEqual(variance, lit(0.0)), lit(1.0),
        erfc(z / lit(math.sqrt(2.0))))
      tuple2(u1, p)
    }
  }

  /** The pre-r19 interpreted rank fold — kept as MwFoldExpr's parity
    * oracle (ChDialectSpec), never on a hot path. */
  private[graft] def mwRankFoldComposed(arr: Expression): Expression = {
    def accOf(pos: Expression, run: Expression, ones: Expression,
        lastV: Expression, r1: Expression, ties: Expression): Expression =
      CreateNamedStruct(Seq(
        Literal("pos"), pos, Literal("run"), run, Literal("ones"), ones,
        Literal("lastV"), lastV, Literal("r1"), r1, Literal("ties"), ties))
    val init = accOf(lit(0.0), lit(0.0), lit(0.0), lit(0.0), lit(0.0), lit(0.0))
    val accV = fresh("acc")
    val eV = fresh("e")
    // flush of the open run (contributes 0 when run == 0: ones = 0
    // and ties term run³-run = 0)
    def flushedR1(a: Expression): Expression =
      fld(a, "r1") + fld(a, "ones") *
        (fld(a, "pos") + (fld(a, "run") + lit(1.0)) / lit(2.0))
    def flushedTies(a: Expression): Expression =
      fld(a, "ties") +
        fld(a, "run") * fld(a, "run") * fld(a, "run") - fld(a, "run")
    val same = And(GreaterThan(fld(accV, "run"), lit(0.0)),
      EqualTo(fld(eV, "v"), fld(accV, "lastV")))
    val extended = accOf(fld(accV, "pos"),
      fld(accV, "run") + lit(1.0),
      fld(accV, "ones") + d(fld(eV, "o")),
      fld(accV, "lastV"), fld(accV, "r1"), fld(accV, "ties"))
    val restarted = accOf(
      fld(accV, "pos") + fld(accV, "run"),
      lit(1.0), d(fld(eV, "o")), fld(eV, "v"),
      flushedR1(accV), flushedTies(accV))
    val merge = LambdaFunction(If(same, extended, restarted), Seq(accV, eV))
    val finV = fresh("a")
    val finish = LambdaFunction(
      CreateNamedStruct(Seq(
        Literal("r1"), flushedR1(finV),
        Literal("ties"), flushedTies(finV))), Seq(finV))
    builtin("aggregate")(Seq(arr, init, merge, finish))
  }

  /** boundingRatio(x, y): slope of the segment between the group's
    * (min x, its y) and (max x, its y) points — pure partial-agg
    * composition (max_by/min_by/max/min), no buffering. Deterministic
    * when x is unique per group (ties on the extreme x pick an
    * arbitrary y in CH too). */
  def boundingRatio(es: Seq[Expression]): Expression = {
    val x = d(es(0)); val y = d(es(1))
    def agg(f: aggregate.AggregateFunction) = wrapAgg(f)
    (agg(aggregate.MaxBy(y, x)) - agg(aggregate.MinBy(y, x))) /
      (agg(aggregate.Max(x)) - agg(aggregate.Min(x)))
  }

  /** Shared sweep for maxIntersections[Position](start, end): each
    * interval contributes (+1 at start, -1 at end), the sorted
    * boundary array is swept once, tracking the running count, its
    * max, and the point where the max was FIRST reached. Half-open
    * [s, e): at equal points the -1 sorts before the +1, so touching
    * intervals don't intersect. Per-group state is the group's
    * boundary points — the shape ClickHouse's own array-state
    * implementation of this aggregate buffers.
    *
    * The sweep itself is a compiled kernel (SweepMaxExpr) — the
    * interpreted ArrayAggregate fold allocated one accumulator struct
    * per boundary and was the ONE super-linear key in the r15 sf1
    * scale probe (c31 at 21.9x wall for 10x data,
    * dev/scale_probe_r15.txt); identical trees for both callers also
    * let the two aggregates CSE where the old fresh-lambda folds
    * could not. ChDialectSpec pins kernel ≡ composed fold. */
  private def sweep(es: Seq[Expression]): Expression = {
    val entries = CreateArray(Seq(
      CreateNamedStruct(Seq(Literal("p"), d(es(0)), Literal("d"), Literal(1L))),
      CreateNamedStruct(Seq(Literal("p"), d(es(1)), Literal("d"), Literal(-1L)))))
    val arr = builtin("sort_array")(Seq(
      builtin("flatten")(Seq(wrapAgg(builtin("collect_list")(Seq(entries)))))))
    SweepMaxExpr(arr)
  }

  /** The pre-r15 composed fold — kept as the kernel's parity oracle
    * (ChDialectSpec), never on a hot path. */
  private[graft] def sweepComposed(es: Seq[Expression]): Expression = {
    val entries = CreateArray(Seq(
      CreateNamedStruct(Seq(Literal("p"), d(es(0)), Literal("d"), Literal(1L))),
      CreateNamedStruct(Seq(Literal("p"), d(es(1)), Literal("d"), Literal(-1L)))))
    val arr = builtin("sort_array")(Seq(
      builtin("flatten")(Seq(wrapAgg(builtin("collect_list")(Seq(entries)))))))
    def accOf(cur: Expression, best: Expression, at: Expression): Expression =
      CreateNamedStruct(Seq(
        Literal("cur"), cur, Literal("best"), best, Literal("at"), at))
    val init = accOf(Literal(0L), Literal(0L), Literal(null, DoubleType))
    val accV = fresh("acc")
    val eV = fresh("e")
    val cur2 = fld(accV, "cur") + fld(eV, "d")
    val merge = LambdaFunction(
      If(GreaterThan(cur2, fld(accV, "best")),
        accOf(cur2, cur2, fld(eV, "p")),
        accOf(cur2, fld(accV, "best"), fld(accV, "at"))),
      Seq(accV, eV))
    builtin("aggregate")(Seq(arr, init, merge))
  }

  def maxIntersections(es: Seq[Expression]): Expression =
    fld(sweep(es), "best")

  def maxIntersectionsPosition(es: Seq[Expression]): Expression =
    fld(sweep(es), "at")

  private[graft] def maxIntersectionsComposed(es: Seq[Expression]): Expression =
    fld(sweepComposed(es), "best")
  private[graft] def maxIntersectionsPositionComposed(es: Seq[Expression]): Expression =
    fld(sweepComposed(es), "at")

  /** kolmogorovSmirnovTest(v, idx): two-sample KS — D = sup|F1 − F2|
    * over the pooled sorted values (evaluated at each distinct-value
    * boundary, ties pooled), asymptotic p via the Stephens (1970)
    * effective-n correction and the first three terms of the
    * Kolmogorov series Q(λ) = 2Σ(−1)^{k−1}e^{−2k²λ²} — both published
    * closed forms, spelled identically in the oracle. Same sorted-pair
    * fold state as the U test (CH's own shape for a rank test). */
  def kolmogorovSmirnovTest(es: Seq[Expression]): Expression = {
    val v = d(es(0))
    val c0 = EqualTo(Cast(es(1), IntegerType), Literal(0))
    val (n1, _, _) = cohortSums(v, c0)
    val (n2, _, _) = cohortSums(v, Not(c0))
    val entry = CreateNamedStruct(Seq(
      Literal("v"), v,
      Literal("o"), If(c0, Literal(1L), Literal(0L))))
    val arr = builtin("sort_array")(
      Seq(wrapAgg(builtin("collect_list")(Seq(entry)))))
    def accOf(c1: Expression, c2: Expression, lastV: Expression,
        dm: Expression, any: Expression): Expression =
      CreateNamedStruct(Seq(
        Literal("c1"), c1, Literal("c2"), c2, Literal("lastV"), lastV,
        Literal("dm"), dm, Literal("any"), any))
    val init = accOf(lit(0.0), lit(0.0), lit(0.0), lit(0.0), Literal(false))
    val accV = fresh("acc")
    val eV = fresh("e")
    val gap = abs(fld(accV, "c1") / n1 - fld(accV, "c2") / n2)
    val boundary = And(fld(accV, "any"),
      Not(EqualTo(fld(eV, "v"), fld(accV, "lastV"))))
    val dmNext = If(boundary,
      If(GreaterThan(gap, fld(accV, "dm")), gap, fld(accV, "dm")),
      fld(accV, "dm"))
    val isG1 = EqualTo(fld(eV, "o"), Literal(1L))
    val merge = LambdaFunction(
      accOf(
        fld(accV, "c1") + If(isG1, lit(1.0), lit(0.0)),
        fld(accV, "c2") + If(isG1, lit(0.0), lit(1.0)),
        fld(eV, "v"), dmNext, Literal(true)),
      Seq(accV, eV))
    val fin = fresh("f")
    val lastGap = abs(fld(fin, "c1") / n1 - fld(fin, "c2") / n2)
    val finish = LambdaFunction(
      If(GreaterThan(lastGap, fld(fin, "dm")), lastGap, fld(fin, "dm")),
      Seq(fin))
    val dStatRaw = builtin("aggregate")(Seq(arr, init, merge, finish))
    // p: λ = (√ne + 0.12 + 0.11/√ne)·D, ne = n1·n2/(n1+n2);
    // Q(λ) ≈ 2(e^{−2λ²} − e^{−8λ²} + e^{−18λ²}), clamped to [0, 1].
    // dStat is bound ONCE: the λ²-series splices it ~19 times and an
    // interpreted projection would re-run the whole sorted fold at
    // each splice (the c44 discipline, r13)
    bind(dStatRaw) { dStat =>
      val ne = n1 * n2 / (n1 + n2)
      val lam = (sqrt(ne) + lit(0.12) + lit(0.11) / sqrt(ne)) * dStat
      val l2 = lam * lam
      val q = lit(2.0) *
        (exp(lit(-2.0) * l2) - exp(lit(-8.0) * l2) + exp(lit(-18.0) * l2))
      val p = If(GreaterThan(q, lit(1.0)), lit(1.0),
        If(LessThan(q, lit(0.0)), lit(0.0), q))
      tuple2(dStat, p)
    }
  }

  /** simpleLinearRegression(x, y) → (k, b): least-squares slope and
    * intercept from four partial-agg sums — no buffering. */
  def simpleLinearRegression(es: Seq[Expression]): Expression = {
    val x = d(es(0)); val y = d(es(1))
    def s(e: Expression): Expression = wrapAgg(aggregate.Sum(e))
    val n = d(wrapAgg(aggregate.Count(Seq(Literal(1)))))
    val k = (n * s(x * y) - s(x) * s(y)) / (n * s(x * x) - s(x) * s(x))
    val b = (s(y) - k * s(x)) / n
    tuple2(k, b)
  }

  /** Bind a subexpression once as a lambda variable. Interpreted
    * projections (every higher-order-function plan) do NO common-
    * subexpression elimination, so an O(n) fold/sort subtree spliced
    * at k use sites runs k times per row — bind(x)(body) evaluates x
    * ONCE via transform(array(x), v -> body(v))[1]. Shared by the
    * whole functions package (the c44/c30 discipline, r13). */
  private[functions] def bind(e: Expression)(body: Expression => Expression): Expression = {
    val v = fresh("bound")
    elemAt(ChDialect.builtin("transform")(
      Seq(CreateArray(Seq(e)), LambdaFunction(body(v), Seq(v)))), Literal(1))
  }

  private def elemAt(a: Expression, i: Expression): Expression =
    ChDialect.builtin("element_at")(Seq(a, i))

  /** largestTriangleThreeBuckets(n)(x, y) — LTTB downsampling
    * (Steinarsson 2013; ClickHouse ≥ 23.10 registry name, alias
    * `lttb`): keep first and last points, split the middle into n-2
    * even buckets, and from each bucket keep the point forming the
    * largest triangle with the PREVIOUSLY kept point and the next
    * bucket's average — the standard "what a human would see on the
    * chart" time-series reduction. One fold over the group's sorted
    * (x, y) pairs (per-group state O(sample) — a shape-preserving
    * downsample is inherently so, as is CH's own array-state
    * implementation); output keeps the ORIGINAL coordinate values
    * (selection only, no computed floats in the result). */
  def lttb(es: Seq[Expression]): Expression = {
    val n = es.last match {
      case Literal(i: Int, IntegerType) => i
      case Literal(l: Long, LongType) => l.toInt
      case other => throw new IllegalArgumentException(
        s"largestTriangleThreeBuckets needs a literal bucket count, got $other")
    }
    require(n >= 2, s"largestTriangleThreeBuckets needs >= 2 buckets, got $n")
    val pt = CreateNamedStruct(Seq(
      Literal("_1"), d(es(0)), Literal("_2"), d(es(1))))
    val collected = ChDialect.builtin("sort_array")(
      Seq(wrapAgg(ChDialect.builtin("collect_list")(Seq(pt)))))
    bind(collected) { arr =>
      val nPts = ChDialect.builtin("size")(Seq(arr))
      val first = elemAt(arr, Literal(1))
      val last = elemAt(arr, nPts)
      def avgOf(seg: Expression): Expression = {
        val ac = fresh("ac"); val p = fresh("p"); val f = fresh("f")
        ChDialect.builtin("aggregate")(Seq(seg,
          CreateNamedStruct(Seq(Literal("sx"), lit(0.0),
            Literal("sy"), lit(0.0), Literal("c"), lit(0.0))),
          LambdaFunction(CreateNamedStruct(Seq(
            Literal("sx"), fld(ac, "sx") + fld(p, "_1"),
            Literal("sy"), fld(ac, "sy") + fld(p, "_2"),
            Literal("c"), fld(ac, "c") + lit(1.0))), Seq(ac, p)),
          LambdaFunction(CreateNamedStruct(Seq(
            Literal("_1"), fld(f, "sx") / fld(f, "c"),
            Literal("_2"), fld(f, "sy") / fld(f, "c"))), Seq(f))))
      }
      val picked: Expression =
        if (n == 2)  // no middle buckets: first + last only
          ChDialect.builtin("slice")(Seq(arr, Literal(1), Literal(0)))
        else {
          val base = Cast(nPts - Literal(2), LongType)
          val den = Literal((n - 2).toLong)
          // 1-based middle-bucket bounds: bucket i (0-based) covers
          // indices 2 + floor(i·base/den) … 1 + floor((i+1)·base/den)
          def lo(i: Expression) = Cast(
            Literal(2L) + Divide2(Multiply(Cast(i, LongType), base), den),
            IntegerType)
          def hi(i: Expression) = Cast(
            Literal(1L) + Divide2(Multiply(Cast(i, LongType) + Literal(1L), base), den),
            IntegerType)
          val iv = fresh("i"); val acc = fresh("acc")
          val stepBody = {
            val prev = fld(acc, "prev")
            val bLo = lo(iv)
            val bLen = Greatest(Seq(hi(iv) - bLo + Literal(1), Literal(0)))
            val bucket = ChDialect.builtin("slice")(Seq(arr, bLo, bLen))
            val nLo = lo(iv + Literal(1))
            val nLen = Greatest(Seq(hi(iv + Literal(1)) - nLo + Literal(1), Literal(0)))
            val nxt = If(LessThan(iv, Literal(n - 3)),
              avgOf(ChDialect.builtin("slice")(Seq(arr, nLo, nLen))), last)
            val bestInit = CreateNamedStruct(Seq(
              Literal("p"), first, Literal("a"), lit(-1.0)))
            val ba = fresh("ba"); val bp = fresh("bp")
            val area = abs(
              (fld(prev, "_1") - fld(nxt, "_1")) * (fld(bp, "_2") - fld(prev, "_2")) -
              (fld(prev, "_1") - fld(bp, "_1")) * (fld(nxt, "_2") - fld(prev, "_2")))
            val best = ChDialect.builtin("aggregate")(Seq(bucket, bestInit,
              LambdaFunction(
                If(GreaterThan(area, fld(ba, "a")),
                  CreateNamedStruct(Seq(Literal("p"), bp, Literal("a"), area)),
                  ba),
                Seq(ba, bp))))
            val bestP = fld(best, "p")
            CreateNamedStruct(Seq(
              Literal("sel"), Concat(Seq(fld(acc, "sel"), CreateArray(Seq(bestP)))),
              Literal("prev"), bestP))
          }
          val folded = ChDialect.builtin("aggregate")(Seq(
            ChDialect.builtin("sequence")(Seq(Literal(0), Literal(n - 3))),
            CreateNamedStruct(Seq(
              Literal("sel"), ChDialect.builtin("slice")(Seq(arr, Literal(1), Literal(0))),
              Literal("prev"), first)),
            LambdaFunction(stepBody, Seq(acc, iv))))
          fld(folded, "sel")
        }
      If(LessThanOrEqual(nPts, Literal(n)), arr,
        Concat(Seq(CreateArray(Seq(first)), picked, CreateArray(Seq(last)))))
    }
  }

  /** Long integer division that truncates toward zero (both operands
    * non-negative here) — Catalyst's IntegralDivide. */
  private def Divide2(a: Expression, b: Expression): Expression =
    IntegralDivide(a, b)

  // ---- round-9 additions: weighted top-k, exact quantile bounds, ----
  // ---- interval union length, time-decayed aggregates            ----

  /** topKWeighted(k, x, w) — the k values with the largest total
    * weight. State is the native keyed map aggregate (MapAggNative):
    * O(distinct values) per group, folded map-side — never a
    * per-group collect of rows. Ties break on the value ascending,
    * fully deterministic (CH's own topK is frequency-ordered with
    * unspecified tie order; the deterministic refinement is what the
    * oracle needs). */
  def topKWeighted(es: Seq[Expression]): Expression = {
    val k = Cast(es(0), IntegerType)
    val x = es(1)
    val w = if (es.size > 2) es(2) else Literal(1L)
    val m = MapCombineAgg(CreateArray(Seq(x)), CreateArray(Seq(w)), "sum")
      .toAggregateExpression()
    val entries = ChDialect.builtin("map_entries")(Seq(m))
    val e = fresh("e")
    val keyed = ChDialect.builtin("transform")(Seq(entries,
      LambdaFunction(CreateNamedStruct(Seq(
        Literal("nw"), lit(0.0) - d(fld(e, "value")),
        Literal("k"), fld(e, "key"))), Seq(e))))
    val top = ChDialect.builtin("slice")(
      Seq(ChDialect.builtin("sort_array")(Seq(keyed)), Literal(1), k))
    val e2 = fresh("e")
    ChDialect.builtin("transform")(Seq(top, LambdaFunction(fld(e2, "k"), Seq(e2))))
  }

  /** quantileExactLow/High(x, q): the exact element at
    * floor/ceil(q·(n−1)) of the sorted group — CH's non-interpolating
    * exact quantile pair. */
  def quantileExactBound(low: Boolean)(es: Seq[Expression]): Expression = {
    val x = es(0)
    val q = if (es.size > 1) d(es(1)) else Literal(0.5)
    val arrRaw = ChDialect.builtin("sort_array")(
      Seq(wrapAgg(ChDialect.builtin("collect_list")(Seq(x)))))
    bind(arrRaw) { arr => // one sort, not one per splice (r13)
      val n = ChDialect.builtin("size")(Seq(arr))
      val pos = q * d(n - Literal(1))
      // floor/ceil spelled as trunc arithmetic: their registry
      // builders ASSERT resolved arguments, and inside the bind
      // lambda the bound variable resolves later (the hfQuantile
      // precedent). pos >= 0, so trunc == floor and
      // ceil = trunc + (pos > trunc).
      val t = Cast(pos, LongType)
      val idx = if (low) t
        else t + Cast(GreaterThan(pos, Cast(t, DoubleType)), LongType)
      ChDialect.builtin("element_at")(
        Seq(arr, Cast(idx, IntegerType) + Literal(1)))
    }
  }

  /** groupArrayLast(x, n): the last n elements in collection order
    * (deterministic only under a declared order — the groupArray
    * caveat CH documents too). */
  def groupArrayLast(es: Seq[Expression]): Expression = {
    val x = es(0)
    val n = Cast(es(1), IntegerType)
    val arr = wrapAgg(ChDialect.builtin("collect_list")(Seq(x)))
    val sz = ChDialect.builtin("size")(Seq(arr))
    ChDialect.builtin("slice")(Seq(arr,
      Greatest(Seq(sz - n + Literal(1), Literal(1))), n))
  }

  /** intervalLengthSum(s, e): total length of the UNION of the
    * group's [s, e) intervals (overlaps counted once, inverted
    * intervals contribute 0). Sorted start-order fold tracking the
    * covered frontier — the same boundary-sweep state family as
    * maxIntersections. */
  def intervalLengthSum(es: Seq[Expression]): Expression = {
    val entry = CreateNamedStruct(Seq(
      Literal("s"), d(es(0)), Literal("e"), d(es(1))))
    val arr = ChDialect.builtin("sort_array")(
      Seq(wrapAgg(ChDialect.builtin("collect_list")(Seq(entry)))))
    def accOf(cov: Expression, tot: Expression): Expression =
      CreateNamedStruct(Seq(Literal("cov"), cov, Literal("tot"), tot))
    val a = fresh("acc"); val e = fresh("e")
    val lo = Greatest(Seq(fld(e, "s"), fld(a, "cov")))
    val add = Greatest(Seq(lit(0.0), fld(e, "e") - lo))
    val merge = LambdaFunction(
      accOf(Greatest(Seq(fld(a, "cov"), fld(e, "e"))), fld(a, "tot") + add),
      Seq(a, e))
    fld(ChDialect.builtin("aggregate")(
      Seq(arr, accOf(lit(Double.NegativeInfinity), lit(0.0)), merge)), "tot")
  }

  /** exponentialTimeDecayed{Sum,Max,Count,Avg}: each event decays by
    * exp(−Δt/x) to the group's LATEST time. One time-sorted fold with
    * running renormalization (acc·exp((t_prev−t_cur)/x) at each step)
    * — numerically stable where the closed form exp(t/x) overflows
    * for epoch-scale t. Merged arg orders from the parametric
    * rewrite: Sum/Max (v, t, x); Count (t, x). */
  def timeDecayed(kind: String)(es: Seq[Expression]): Expression = {
    val (v, t, x) =
      if (kind == "count") (Literal(1.0): Expression, d(es(0)), d(es(1)))
      else (d(es(0)), d(es(1)), d(es(2)))
    val entry = CreateNamedStruct(Seq(Literal("t"), t, Literal("v"), v))
    val arr = ChDialect.builtin("sort_array")(
      Seq(wrapAgg(ChDialect.builtin("collect_list")(Seq(entry)))))
    def accOf(lt: Expression, s: Expression, c: Expression,
        m: Expression): Expression =
      CreateNamedStruct(Seq(Literal("lt"), lt, Literal("s"), s,
        Literal("c"), c, Literal("m"), m))
    val a = fresh("acc"); val e = fresh("e")
    val et = fld(e, "t"); val ev = fld(e, "v")
    val dec = exp((fld(a, "lt") - et) / x)
    val stepped = accOf(et,
      fld(a, "s") * dec + ev,
      fld(a, "c") * dec + lit(1.0),
      Greatest(Seq(fld(a, "m") * dec, ev)))
    val merge = LambdaFunction(
      If(IsNull(fld(a, "lt")), accOf(et, ev, lit(1.0), ev), stepped),
      Seq(a, e))
    val folded = ChDialect.builtin("aggregate")(Seq(arr,
      accOf(Literal(null, DoubleType), lit(0.0), lit(0.0), lit(0.0)), merge))
    kind match {
      case "sum"   => fld(folded, "s")
      case "count" => fld(folded, "c")
      case "max"   => fld(folded, "m")
      // avg splices the fold twice — bind it once (r13)
      case "avg"   => bind(folded)(f => fld(f, "s") / fld(f, "c"))
    }
  }
}
