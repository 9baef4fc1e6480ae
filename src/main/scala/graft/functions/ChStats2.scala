package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.types._

/** Categorical-association and rank statistics (reference name
  * registry src/Parsers/ASTFunction.h; public ClickHouse semantics):
  * cramersV / contingency / theilsU / categoricalInformationValue,
  * rankCorr, meanZTest, corrMatrix / covarSampMatrix, arrayAUC.
  *
  * The contingency family rides the native keyed count-map aggregate
  * (MapAggNative): per-group state is the CONTINGENCY TABLE itself —
  * O(distinct (a,b) pairs), folded map-side, never a row collect.
  * χ² uses the identity Σ(n−e)²/e = Σ_nonempty n²/e − N, so empty
  * cells need no enumeration. rankCorr lives in RankAggNative (a
  * rank statistic needs the sample; the native kernel ranks in
  * O(n log n) where a Catalyst fold would copy-append at O(n²)).
  * meanZTest is a pure partial-agg composition; the CI bound uses the
  * Winitzki erfinv approximation (|ε| < 2e-3), spelled identically in
  * the oracle. Matrices are compositions of Spark's own corr /
  * covar_samp — n² codegen'd aggregates, no buffering.
  */
private[graft] object ChStats2 {
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
  private def ln(e: Expression) = builtin("ln")(Seq(e))
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

  private val SEP = "\u0001"

  /** Keyed count map (value → occurrences) as a single aggregate;
    * null keys are skipped by the kernel. */
  private def countMapOf(key: Expression): Expression =
    MapCombineAgg(CreateArray(Seq(key)), CreateArray(Seq(Literal(1L))),
      "count").toAggregateExpression()

  private def foldEntries(m: Expression, init: Expression)(
      body: (Expression, Expression) => Expression): Expression = {
    val acc = fresh("acc"); val e = fresh("e")
    builtin("aggregate")(Seq(builtin("map_entries")(Seq(m)), init,
      LambdaFunction(body(acc, e), Seq(acc, e))))
  }

  /** χ² over the (a, b) contingency map: Σ_nonempty n_ij²/e_ij − N. */
  private def chi2Of(jm: Expression, am: Expression, bm: Expression,
      n: Expression): Expression = {
    foldEntries(jm, lit(0.0)) { (acc, e) =>
      val k = fld(e, "key")
      val nij = d(fld(e, "value"))
      val ka = builtin("substring_index")(Seq(k, Literal(SEP), Literal(1)))
      val kb = builtin("substring_index")(Seq(k, Literal(SEP), Literal(-1)))
      val ea = d(builtin("element_at")(Seq(am, ka)))
      val eb = d(builtin("element_at")(Seq(bm, kb)))
      acc + nij * nij / (ea * eb / n)
    } - n
  }

  private def withMaps(es: Seq[Expression])(
      body: (Expression, Expression, Expression, Expression) => Expression)
      : Expression = {
    val ka = Cast(es(0), StringType)
    val kb = Cast(es(1), StringType)
    val jm = countMapOf(Concat(Seq(ka, Literal(SEP), kb)))
    val am = countMapOf(ka)
    val bm = countMapOf(kb)
    val n = d(wrapAgg(aggregate.Count(Seq(Literal(1)))))
    body(jm, am, bm, n)
  }

  /** cramersV(a, b) = √(χ² / (N·(min(r,c)−1))); 0 when either margin
    * is constant (min(r,c) = 1 — no association is measurable).
    * The bias-corrected variant applies the Bergsma-Wicher
    * correction: φ̃² = max(0, χ²/N − (r−1)(c−1)/(N−1)), with the
    * shrunk margins r̃ = r − (r−1)²/(N−1), c̃ likewise. */
  def cramersV(es: Seq[Expression], corrected: Boolean = false): Expression =
    withMaps(es) { (jm, am, bm, n) =>
      val r = d(builtin("size")(Seq(am)))
      val c = d(builtin("size")(Seq(bm)))
      val minRc = d(Least(Seq(r, c)))
      val chi2 = chi2Of(jm, am, bm, n)
      val plain = sqrt(chi2 / (n * (minRc - lit(1.0))))
      if (!corrected)
        If(LessThanOrEqual(minRc, lit(1.0)), lit(0.0), plain)
      else {
        val nm1 = n - lit(1.0)
        val phi2 = Greatest(Seq(lit(0.0),
          chi2 / n - (r - lit(1.0)) * (c - lit(1.0)) / nm1))
        val rt = r - (r - lit(1.0)) * (r - lit(1.0)) / nm1
        val ct = c - (c - lit(1.0)) * (c - lit(1.0)) / nm1
        val den = Least(Seq(rt, ct)) - lit(1.0)
        If(LessThanOrEqual(minRc, lit(1.0)), lit(0.0),
          sqrt(phi2 / den))
      }
    }

  /** contingency(a, b) — Pearson's contingency coefficient
    * √(χ²/(χ²+N)). */
  def contingency(es: Seq[Expression]): Expression =
    withMaps(es) { (jm, am, bm, n) =>
      val c2 = chi2Of(jm, am, bm, n)
      sqrt(c2 / (c2 + n))
    }

  /** theilsU(x, y) — the uncertainty coefficient U(x|y) =
    * (H(x) − H(x|y)) / H(x); 0 when H(x) = 0 (x constant). */
  def theilsU(es: Seq[Expression]): Expression =
    withMaps(es) { (jm, am, bm, n) =>
      val hx = foldEntries(am, lit(0.0)) { (acc, e) =>
        val p = d(fld(e, "value")) / n
        acc - p * ln(p)
      }
      // H(x|y) = −Σ_ij (n_ij/N)·ln(n_ij/n_j)
      val hxy = foldEntries(jm, lit(0.0)) { (acc, e) =>
        val k = fld(e, "key")
        val nij = d(fld(e, "value"))
        val kb = builtin("substring_index")(Seq(k, Literal(SEP), Literal(-1)))
        val nj = d(builtin("element_at")(Seq(bm, kb)))
        acc - (nij / n) * ln(nij / nj)
      }
      If(LessThanOrEqual(hx, lit(0.0)), lit(0.0), (hx - hxy) / hx)
    }

  /** categoricalInformationValue(cat, tag): Σ over category values v
    * present in BOTH cohorts of (n1_v/N1 − n0_v/N0)·ln((n1_v/N1)/
    * (n0_v/N0)) — the scorecard IV. CH returns one element per
    * category argument; the single-category form returns [iv]. */
  def categoricalIV(es: Seq[Expression]): Expression = {
    val ka = Cast(es(0), StringType)
    val tag = Cast(es(1), BooleanType)
    val m1 = countMapOf(If(tag, ka, Literal(null, StringType)))
    val m0 = countMapOf(If(tag, Literal(null, StringType), ka))
    def cnt(c: Expression): Expression =
      d(wrapAgg(aggregate.Count(Seq(If(c, Literal(1),
        Literal(null, IntegerType))))))
    val n1 = cnt(tag)
    val n0 = cnt(Not(tag))
    val iv = foldEntries(m1, lit(0.0)) { (acc, e) =>
      val v1 = d(fld(e, "value")) / n1
      val c0 = builtin("element_at")(Seq(m0, fld(e, "key")))
      val v0 = d(c0) / n0
      If(IsNull(c0), acc, acc + (v1 - v0) * ln(v1 / v0))
    }
    CreateArray(Seq(iv))
  }

  /** Average-rank assignment fold: `arr` is sorted by the rank key
    * (field `k`); emits array<struct<p: payload, r: rank>> where tied
    * runs share the mean of their positions. One linear pass; the run
    * buffer flushes on key change. */
  private def avgRanks(arr: Expression, payload: String): Expression = {
    def accOf(out: Expression, run: Expression, pos: Expression,
        rv: Expression): Expression =
      CreateNamedStruct(Seq(Literal("out"), out, Literal("run"), run,
        Literal("pos"), pos, Literal("rv"), rv))
    val acc = fresh("acc"); val e = fresh("e"); val x = fresh("x")
    val f = fresh("f")
    def flushed(a: Expression): Expression = {
      val m = d(builtin("size")(Seq(fld(a, "run"))))
      val avgR = fld(a, "pos") - (m - lit(1.0)) / lit(2.0)
      Concat(Seq(fld(a, "out"), builtin("transform")(Seq(fld(a, "run"),
        LambdaFunction(CreateNamedStruct(Seq(
          Literal("p"), x, Literal("r"), avgR)), Seq(x))))))
    }
    val emptyRun = builtin("slice")(Seq(
      CreateArray(Seq(fld(e, payload))), Literal(1), Literal(0)))
    val step = If(
      Or(EqualTo(fld(acc, "pos"), lit(0.0)),
        EqualTo(fld(acc, "rv"), fld(e, "k"))),
      // extend the current run
      accOf(fld(acc, "out"),
        Concat(Seq(fld(acc, "run"), CreateArray(Seq(fld(e, payload))))),
        fld(acc, "pos") + lit(1.0), fld(e, "k")),
      // new key: flush, start fresh run
      accOf(flushed(acc), CreateArray(Seq(fld(e, payload))),
        fld(acc, "pos") + lit(1.0), fld(e, "k")))
    val init = accOf(
      builtin("slice")(Seq(CreateArray(Seq(
        CreateNamedStruct(Seq(Literal("p"), lit(0.0), Literal("r"), lit(0.0))))),
        Literal(1), Literal(0))),
      builtin("slice")(Seq(CreateArray(Seq(lit(0.0))), Literal(1), Literal(0))),
      lit(0.0), lit(0.0))
    val folded = builtin("aggregate")(Seq(arr, init,
      LambdaFunction(step, Seq(acc, e)),
      LambdaFunction(If(EqualTo(fld(f, "pos"), lit(0.0)), fld(f, "out"),
        flushed(f)), Seq(f))))
    folded
  }

  /** Winitzki's erfinv approximation (|ε| < 2e-3) — the z-quantile
    * for the meanZTest confidence bound; the oracle spells the same
    * polynomial. */
  private def erfinv(x: Expression): Expression = {
    val a = lit(0.147)
    val l = ln(lit(1.0) - x * x)
    val t = lit(2.0) / (lit(Math.PI) * a) + l / lit(2.0)
    sqrt(sqrt(t * t - l / a) - t)
  }

  /** meanZTest(var_x, var_y, conf)(v, idx) → (z, p, ci_low, ci_high)
    * for the mean difference, with KNOWN population variances (the
    * textbook z-test CH exposes). Merged parametric order:
    * (v, idx, var_x, var_y, conf). */
  def meanZTest(es: Seq[Expression]): Expression = {
    val v = d(es(0))
    val c0 = EqualTo(Cast(es(1), IntegerType), Literal(0))
    val vx = d(es(2)); val vy = d(es(3)); val conf = d(es(4))
    def sumIf(c: Expression, x: Expression): Expression =
      d(wrapAgg(aggregate.Sum(If(c, x, Literal(null, DoubleType)))))
    def cnt(c: Expression): Expression =
      d(wrapAgg(aggregate.Count(Seq(If(c, Literal(1),
        Literal(null, IntegerType))))))
    val n1 = cnt(c0); val n2 = cnt(Not(c0))
    val m1 = sumIf(c0, v) / n1
    val m2 = sumIf(Not(c0), v) / n2
    val se = sqrt(vx / n1 + vy / n2)
    val z = (m1 - m2) / se
    val p = ChDialect.builtin("greatest")(Seq(lit(0.0), erfcOf(abs(z) / lit(math.sqrt(2.0)))))
    val zc = lit(math.sqrt(2.0)) * erfinv(conf)
    CreateNamedStruct(Seq(
      Literal("_1"), z, Literal("_2"), p,
      Literal("_3"), (m1 - m2) - zc * se,
      Literal("_4"), (m1 - m2) + zc * se))
  }

  /** A&S 7.1.26 erfc (same polynomial ChStats uses; restated here to
    * keep the object self-contained). */
  private def erfcOf(x: Expression): Expression = {
    val u = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = u * (lit(0.254829592) + u * (lit(-0.284496736) +
      u * (lit(1.421413741) + u * (lit(-1.453152027) + u * lit(1.061405429)))))
    poly * exp(lit(0.0) - x * x)
  }

  /** corrMatrix / covarSampMatrix / covarPopMatrix (x1…xn) — n×n
    * matrices as array<array<double>>, each cell one codegen'd Spark
    * aggregate (f = corr | covar_samp | covar_pop). */
  def matrixOf(f: String)(es: Seq[Expression]): Expression =
    CreateArray(es.map { row =>
      CreateArray(es.map { colE =>
        // nested under CreateArray — outside the analyzer's root-level
        // auto-wrap, so wrap the AggregateFunction explicitly
        wrapAgg(builtin(f)(Seq(d(row), d(colE))))
      })
    })

  /** arrayAUC(scores, labels): ROC AUC via the rank-sum identity
    * (Σ ranks of positives − nPos(nPos+1)/2) / (nPos·nNeg), average
    * ranks for score ties — a SCALAR over two arrays. */
  def arrayAUC(es: Seq[Expression]): Expression = {
    val z = fresh("z")
    val pairs = builtin("sort_array")(Seq(builtin("transform")(Seq(
      builtin("arrays_zip")(Seq(es(0), es(1))),
      LambdaFunction(CreateNamedStruct(Seq(
        Literal("k"), d(fld(z, "0")),
        Literal("p"), d(Cast(fld(z, "1"), DoubleType)))), Seq(z))))))
    val ranked = avgRanks(pairs, "p") // struct<p: label, r: rank>
    def accOf(rp: Expression, np: Expression, nn: Expression): Expression =
      CreateNamedStruct(Seq(Literal("rp"), rp, Literal("np"), np,
        Literal("nn"), nn))
    val acc = fresh("acc"); val e = fresh("e")
    val isPos = GreaterThan(fld(e, "p"), lit(0.0))
    val sums = builtin("aggregate")(Seq(ranked,
      accOf(lit(0.0), lit(0.0), lit(0.0)),
      LambdaFunction(accOf(
        fld(acc, "rp") + If(isPos, fld(e, "r"), lit(0.0)),
        fld(acc, "np") + If(isPos, lit(1.0), lit(0.0)),
        fld(acc, "nn") + If(isPos, lit(0.0), lit(1.0))), Seq(acc, e))))
    // the AUC formula splices the rank fold five times — bind (r13)
    ChStats.bind(sums) { su =>
      val np = fld(su, "np"); val nn = fld(su, "nn")
      (fld(su, "rp") - np * (np + lit(1.0)) / lit(2.0)) / (np * nn)
    }
  }

  /** quantileInterpolatedWeighted(x, w, q): weighted quantile with
    * linear interpolation between the cumulative-weight midpoints
    * p_i = (cum_i − w_i/2)/W of the x-sorted sample (public CH
    * semantics). One sorted fold; below the first midpoint → min x,
    * above the last → max x. */
  def quantileInterpolatedWeighted(es: Seq[Expression]): Expression = {
    val x = d(es(0)); val w = d(es(1)); val q = d(es(2))
    val entry = CreateNamedStruct(Seq(Literal("x"), x, Literal("w"), w))
    val arr = builtin("sort_array")(
      Seq(wrapAgg(builtin("collect_list")(Seq(entry)))))
    // totW MUST be a separate native aggregate, not a fold over `arr`:
    // it is referenced inside the main fold's lambda below, and
    // Catalyst SUBSTITUTES lambda-bound expressions per element (no
    // let-binding), so a fold-shaped totW would re-run O(n) work at
    // every step — O(n²) interpreted on a 20k-row group locked one
    // CPU for ~30 min at sf0.1 (r9 driver-bench timeout). As its own
    // AggregateExpression it is computed once by the agg framework
    // and reaches the lambda as an O(1) buffer reference.
    val totW = d(wrapAgg(aggregate.Sum(w)))
    def accOf(cum: Expression, px: Expression, pp: Expression,
        res: Expression): Expression =
      CreateNamedStruct(Seq(Literal("cum"), cum, Literal("px"), px,
        Literal("pp"), pp, Literal("res"), res))
    val acc = fresh("acc"); val e = fresh("e")
    val xi = fld(e, "x"); val wi = fld(e, "w")
    val cum2 = fld(acc, "cum") + wi
    val pi = (cum2 - wi / lit(2.0)) / totW
    val pp = fld(acc, "pp"); val px = fld(acc, "px")
    val interp = If(IsNull(pp), xi,
      If(GreaterThanOrEqual(pp, pi), xi,
        px + (xi - px) * (q - pp) / (pi - pp)))
    val res2 = If(IsNotNull(fld(acc, "res")), fld(acc, "res"),
      If(LessThanOrEqual(q, pi), interp, Literal(null, DoubleType)))
    val folded = builtin("aggregate")(Seq(arr,
      accOf(lit(0.0), Literal(null, DoubleType), Literal(null, DoubleType),
        Literal(null, DoubleType)),
      LambdaFunction(accOf(cum2, xi, pi, res2), Seq(acc, e))))
    // the Coalesce splices the fold twice — bind it once (r13)
    ChStats.bind(folded)(f => Coalesce(Seq(fld(f, "res"), fld(f, "px"))))
  }

  /** deltaSumTimestamp(v, t): Σ of POSITIVE deltas between
    * t-consecutive values (the first row contributes nothing) — the
    * declared-order cousin of the refused block-order deltaSum. One
    * time-sorted fold, state O(group). */
  def deltaSumTimestamp(es: Seq[Expression]): Expression = {
    val v = d(es(0)); val t = d(es(1))
    val arr = builtin("sort_array")(Seq(wrapAgg(builtin("collect_list")(Seq(
      CreateNamedStruct(Seq(Literal("t"), t, Literal("v"), v)))))))
    def accOf(last: Expression, s: Expression): Expression =
      CreateNamedStruct(Seq(Literal("last"), last, Literal("s"), s))
    val acc = fresh("acc"); val e = fresh("e")
    val ev = fld(e, "v")
    val step = If(IsNull(fld(acc, "last")), accOf(ev, lit(0.0)),
      accOf(ev, fld(acc, "s") +
        Greatest(Seq(lit(0.0), ev - fld(acc, "last")))))
    fld(builtin("aggregate")(Seq(arr,
      accOf(Literal(null, DoubleType), lit(0.0)),
      LambdaFunction(step, Seq(acc, e)))), "s")
  }

  /** groupArrayInsertAt(x, pos): the array whose slot `pos` (0-based)
    * holds an inserted value; empty slots are NULL (the Nullable
    * realization of CH's type-default padding) and colliding inserts
    * resolve to the MINIMUM (a deterministic refinement of CH's
    * "any of them"). State = the native keyed min-map, O(slots). */
  def groupArrayInsertAt(es: Seq[Expression]): Expression = {
    val x = Cast(es(0), StringType)
    val pos = Cast(es(1), LongType)
    val m = MapCombineAgg(CreateArray(Seq(pos)), CreateArray(Seq(Literal(1L))),
      "count").toAggregateExpression()
    // value per slot: min-by over (pos → value) — a second keyed map
    // with string values is out of the kernel's numeric domain, so
    // pair (pos, value) into a sortable struct set and first-per-pos
    val pairs = builtin("sort_array")(Seq(wrapAgg(builtin("collect_set")(Seq(
      CreateNamedStruct(Seq(Literal("p"), pos, Literal("x"), x)))))))
    val maxPos = builtin("array_max")(Seq(builtin("map_keys")(Seq(m))))
    val i = fresh("i"); val pr = fresh("pr")
    val slotVal = { (idx: Expression) =>
      val hits = builtin("filter")(Seq(pairs,
        LambdaFunction(EqualTo(fld(pr, "p"), idx), Seq(pr))))
      If(EqualTo(builtin("size")(Seq(hits)), Literal(0)),
        Literal(null, StringType),
        fld(builtin("element_at")(Seq(hits, Literal(1))), "x"))
    }
    builtin("transform")(Seq(
      builtin("sequence")(Seq(Literal(0L), maxPos)),
      LambdaFunction(slotVal(i), Seq(i))))
  }

  /** sparkbar(width[, min_x, max_x])(x, y): the 8-level Unicode bar
    * chart of per-bucket y sums. State = the native keyed sum-map on
    * the INTEGRAL x (CH's own state is the x→sum map too; bucketing
    * happens at finalize). Merged parametric order:
    * (width, [min, max,] x, y). Levels: ceil(8·s/max_s), empty
    * buckets render a space. */
  def sparkbar(es: Seq[Expression]): Expression = {
    val (w, mnE, mxE, x, y) = es.size match {
      case 3 => (es(0), Option.empty[Expression], Option.empty[Expression],
        es(1), es(2))
      case 5 => (es(0), Some(es(1)), Some(es(2)), es(3), es(4))
      case n => throw new IllegalArgumentException(
        s"sparkbar(width[, min, max])(x, y) expected, got $n arguments")
    }
    val m = MapCombineAgg(CreateArray(Seq(Cast(x, LongType))),
      CreateArray(Seq(d(y))), "sum").toAggregateExpression()
    val keys = builtin("map_keys")(Seq(m))
    val mn = d(mnE.getOrElse(builtin("array_min")(Seq(keys))))
    val mx = d(mxE.getOrElse(builtin("array_max")(Seq(keys))))
    val wl = Cast(w, IntegerType)
    // bucket index of key k: min(w−1, floor((k−mn)·w/(mx−mn+1)))
    def idxOf(k: Expression): Expression =
      Least(Seq(Cast(wl, LongType) - Literal(1L),
        Cast(Floor((d(k) - mn) * d(wl) / (mx - mn + lit(1.0))), LongType)))
    val b = fresh("b")
    val bucketSums = builtin("transform")(Seq(
      builtin("sequence")(Seq(Literal(0L),
        Cast(wl, LongType) - Literal(1L))),
      LambdaFunction({
        val acc = fresh("acc"); val en = fresh("en")
        builtin("aggregate")(Seq(builtin("map_entries")(Seq(m)), lit(0.0),
          LambdaFunction(
            If(And(And(EqualTo(idxOf(fld(en, "key")), b),
                GreaterThanOrEqual(d(fld(en, "key")), mn)),
                LessThanOrEqual(d(fld(en, "key")), mx)),
              acc + d(fld(en, "value")), acc),
            Seq(acc, en))))
      }, Seq(b))))
    val maxS = builtin("array_max")(Seq(bucketSums))
    val s = fresh("s")
    val bar = builtin("transform")(Seq(bucketSums, LambdaFunction(
      If(LessThanOrEqual(s, lit(0.0)), Literal(" "),
        // direct Substring node: the registry's expressionBuilder
        // asserts resolved arguments, which lambda variables aren't
        Substring(Literal("▁▂▃▄▅▆▇█"),
          Cast(Ceil(s * lit(8.0) / maxS), IntegerType),
          Literal(1))),
      Seq(s))))
    builtin("array_join")(Seq(bar, Literal("")))
  }
}
