package graft.functions

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 sweep 2 of the ClickHouse-name surface (reference:
  * src/Parsers/ASTFunction.h registry; public CH docs semantics):
  * lambda-first array search HOFs, the ngram/word-shingle hash
  * fingerprint family, reinterpret/FixedString casts, the UUID/ULID
  * family, WKT geometry, proportion z-tests and sample sizing, and
  * host/system introspection. Same contract as ChDialect/ChDialect2.
  */
object ChDialect3 {

  private type Builder = Seq[Expression] => Expression
  private def builtin(name: String) = ChDialect.builtin(name)

  private def fld(e: Expression, n: String): Expression =
    UnresolvedExtractValue(e, Literal(n))
  private def lam1(body: Expression => Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("__g3_x"))
    LambdaFunction(body(x), Seq(x))
  }
  private def lam2(body: (Expression, Expression) => Expression): Expression = {
    val a = UnresolvedNamedLambdaVariable(Seq("__g3_a"))
    val b = UnresolvedNamedLambdaVariable(Seq("__g3_b"))
    LambdaFunction(body(a, b), Seq(a, b))
  }

  /** The user lambda's single variable substituted by `ref` inside its
    * body (pre-analysis, so both the parsed UnresolvedAttribute form
    * and an already-bound lambda variable are matched). */
  private def subst1(f: Expression, ref: Expression): Expression = f match {
    case LambdaFunction(body, Seq(v: UnresolvedNamedLambdaVariable), _) =>
      body.transformUp {
        case a: UnresolvedAttribute if a.nameParts == v.nameParts => ref
        case lv: UnresolvedNamedLambdaVariable
            if lv.nameParts == v.nameParts => ref
      }
    case _ => throw new IllegalArgumentException(
      "expected a one-argument lambda as the first argument")
  }

  // ---- lambda-first array search HOFs. Spark validates that a
  // function receiving a lambda RESOLVES to a HigherOrderFunction, so
  // each is built with ArrayAggregate at the root and the user body
  // substituted into the fold. ----

  private def arrayAggregate(arr: Expression, zero: Expression,
      step: (Expression, Expression) => Expression,
      fin: Expression => Expression): Expression =
    builtin("aggregate")(Seq(arr, zero, lam2(step), lam1(fin)))

  /** no-match value is NULL (the reference returns the element type's
    * default; a Spark column has no non-null default to synthesize). */
  private def arrayFirstLast(last: Boolean): Builder = { es =>
    val arr = es(1)
    val zero = CreateNamedStruct(Seq(
      Literal("f"), Literal(false),
      Literal("v"), builtin("get")(Seq(arr, Literal(0)))))
    arrayAggregate(arr, zero,
      (acc, x) => {
        val hit = Cast(subst1(es.head, x), BooleanType)
        val take = if (last) hit else And(Not(fld(acc, "f")), hit)
        If(take,
          CreateNamedStruct(Seq(Literal("f"), Literal(true),
            Literal("v"), x)),
          acc)
      },
      a => If(fld(a, "f"), fld(a, "v"),
        If(Literal(true), Literal(null), fld(a, "v"))))
  }

  private def arrayFirstLastIndex(last: Boolean): Builder = { es =>
    val arr = es(1)
    val zero = CreateNamedStruct(Seq(
      Literal("i"), Literal(0), Literal("idx"), Literal(0)))
    arrayAggregate(arr, zero,
      (acc, x) => {
        val i1 = Add(fld(acc, "i"), Literal(1))
        val hit = Cast(subst1(es.head, x), BooleanType)
        val take =
          if (last) hit else And(EqualTo(fld(acc, "idx"), Literal(0)), hit)
        CreateNamedStruct(Seq(
          Literal("i"), i1,
          Literal("idx"), If(take, i1, fld(acc, "idx"))))
      },
      a => fld(a, "idx"))
  }

  /** arrayFill(f, arr): scan left→right; where f(x) is false the
    * element is replaced by its (possibly already replaced) left
    * neighbor — the first element is never replaced (CH doc
    * semantics). Reverse form = reverse → fill → reverse. */
  private def arrayFillB(f: Expression, arr0: Expression,
      rev: Boolean): Expression = {
    // the reverse form runs the same fold over the reversed array and
    // un-reverses in the FINISH lambda — keeping ArrayAggregate at the
    // root (Spark requires a function receiving a lambda to resolve
    // to a HigherOrderFunction)
    val arr = if (rev) builtin("reverse")(Seq(arr0)) else arr0
    arrayAggregate(arr,
      builtin("slice")(Seq(arr, Literal(1), Literal(0))), // typed empty
      (acc, x) => {
        val keep = Or(Cast(subst1(f, x), BooleanType),
          EqualTo(builtin("size")(Seq(acc)), Literal(0)))
        val v = If(keep, x, builtin("element_at")(Seq(acc, Literal(-1))))
        builtin("concat")(Seq(acc, builtin("array")(Seq(v))))
      },
      a => if (rev) builtin("reverse")(Seq(a)) else a)
  }

  private def arraySearchAliases: Seq[(String, Builder)] = Seq(
    "arrayFill" -> { es => arrayFillB(es.head, es(1), rev = false) },
    "arrayReverseFill" -> { es => arrayFillB(es.head, es(1), rev = true) },
    "arrayFirst" -> arrayFirstLast(last = false),
    "arrayLast"  -> arrayFirstLast(last = true),
    "arrayFirstIndex" -> arrayFirstLastIndex(last = false),
    "arrayLastIndex"  -> arrayFirstLastIndex(last = true),
    // arrayCount([f,] arr): matching elements (truthy without lambda)
    "arrayCount" -> { es =>
      val (f, arr) =
        if (es.size == 1) (None, es.head) else (Some(es.head), es(1))
      arrayAggregate(arr, Literal(0),
        (acc, x) => {
          val hit = f match {
            case Some(l) => Cast(subst1(l, x), BooleanType)
            case None => Not(EqualTo(Cast(x, DoubleType), Literal(0.0)))
          }
          Add(acc, If(hit, Literal(1), Literal(0)))
        },
        a => a) },
    // split BEFORE each element the lambda flags (first group always
    // starts at element 1); empty input → empty result
    "arraySplit" -> arraySplitB(right = false),
    // split AFTER each flagged element
    "arrayReverseSplit" -> arraySplitB(right = true)
  )

  private def arraySplitB(right: Boolean): Builder = { es =>
    val arr = es(1)
    val emptyElem = builtin("slice")(Seq(arr, Literal(1), Literal(0)))
    val emptyOut = builtin("array_repeat")(Seq(arr, Literal(0)))
    val zero = CreateNamedStruct(Seq(
      Literal("out"), emptyOut,
      Literal("cur"), emptyElem,
      Literal("n"), Literal(0)))
    arrayAggregate(arr, zero,
      (acc, x) => {
        val hit = Cast(subst1(es.head, x), BooleanType)
        val out = fld(acc, "out"); val cur = fld(acc, "cur")
        val n = Add(fld(acc, "n"), Literal(1))
        if (!right) {
          // cut on the LEFT of a flagged element (not before the first)
          val cut = And(hit, GreaterThan(builtin("size")(Seq(cur)),
            Literal(0)))
          CreateNamedStruct(Seq(
            Literal("out"), If(cut,
              Concat(Seq(out, CreateArray(Seq(cur)))), out),
            Literal("cur"), If(cut, CreateArray(Seq(x)),
              Concat(Seq(cur, CreateArray(Seq(x))))),
            Literal("n"), n))
        } else {
          // cut on the RIGHT of a flagged element
          val cur1 = Concat(Seq(cur, CreateArray(Seq(x))))
          CreateNamedStruct(Seq(
            Literal("out"), If(hit,
              Concat(Seq(out, CreateArray(Seq(cur1)))), out),
            Literal("cur"), If(hit, emptyElem, cur1),
            Literal("n"), n))
        }
      },
      a => If(GreaterThan(builtin("size")(Seq(fld(a, "cur"))), Literal(0)),
        Concat(Seq(fld(a, "out"), CreateArray(Seq(fld(a, "cur"))))),
        fld(a, "out")))
  }

  // ---- ngram / word-shingle fingerprints (the near-dup primitives;
  // reference pairs them with tupleHammingDistance) ----

  /** character n-grams of a string as an array (empty when shorter
    * than n). */
  private def charGrams(s: Expression, n: Int): Expression = {
    val len = Length(s)
    If(GreaterThanOrEqual(len, Literal(n)),
      builtin("transform")(Seq(
        builtin("sequence")(Seq(Literal(1),
          Subtract(len, Literal(n - 1)))),
        lam1(i => Substring(s, i, Literal(n))))),
      builtin("array_repeat")(Seq(Literal(""), Literal(0))))
  }

  private def intLit(e: Expression, default: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => default
  }

  /** (min, max) of the gram hashes — the role contract of the
    * reference's (minhash, maxhash) tuple (not byte-compatible, the
    * cityHash64 policy); feeds tupleHammingDistance as CH does. */
  private def minMaxHash(grams: Expression): Expression = {
    val hashes = builtin("transform")(Seq(grams,
      lam1(g => XxHash64(Seq(g), 42L))))
    CreateNamedStruct(Seq(
      Literal("_1"), builtin("array_min")(Seq(hashes)),
      Literal("_2"), builtin("array_max")(Seq(hashes))))
  }

  private def shingles(s: Expression, k: Int): Expression = {
    val toks = builtin("filter")(Seq(
      builtin("split")(Seq(s, Literal("\\s+"))),
      lam1(t => GreaterThan(Length(t), Literal(0)))))
    WordNGramsExpr(toks, k)
  }

  private def fingerprintAliases: Seq[(String, Builder)] = Seq(
    "ngramMinHash" -> { es =>
      minMaxHash(charGrams(es.head,
        if (es.size > 1) intLit(es(1), 3) else 3)) },
    "ngramMinHashCaseInsensitive" -> { es =>
      minMaxHash(charGrams(Lower(es.head),
        if (es.size > 1) intLit(es(1), 3) else 3)) },
    "wordShingleMinHash" -> { es =>
      minMaxHash(shingles(es.head,
        if (es.size > 1) intLit(es(1), 3) else 3)) },
    "ngramSimHash" -> { es =>
      SimHash64(charGrams(es.head,
        if (es.size > 1) intLit(es(1), 3) else 3)) },
    "ngramSimHashCaseInsensitive" -> { es =>
      SimHash64(charGrams(Lower(es.head),
        if (es.size > 1) intLit(es(1), 3) else 3)) },
    "wordShingleSimHash" -> { es =>
      SimHash64(shingles(es.head,
        if (es.size > 1) intLit(es(1), 3) else 3)) },
    // differing positions between two same-shape tuples; the struct
    // shape is taken from a literal struct argument when present,
    // else the fingerprint pair's (_1, _2)
    "tupleHammingDistance" -> { es =>
      val names: Seq[String] = es.collectFirst {
        case s: CreateNamedStruct => s.names.map(_.toString)
      }.getOrElse(Seq("_1", "_2"))
      names.map { f =>
        If(Not(EqualNullSafe(fld(es(0), f), fld(es(1), f))),
          Literal(1), Literal(0)): Expression
      }.reduce(Add(_, _)) },
    "splitByNonAlpha" -> { es =>
      builtin("filter")(Seq(
        builtin("split")(Seq(es.head, Literal("[^a-zA-Z0-9]+"))),
        lam1(t => GreaterThan(Length(t), Literal(0))))) },
    "toLastDayOfMonth" -> builtin("last_day"),
    // 64-bit byte reversal (java.lang.Long.reverseBytes, exact for
    // the UInt64 lane; narrower lanes widen first)
    "byteSwap" -> { es =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[java.lang.Long], LongType, "reverseBytes",
        Seq(Cast(es.head, LongType)), inputTypes = Seq(LongType)) },
    "subBitmap" -> { es =>
      builtin("slice")(Seq(es(0),
        Add(Cast(es(1), IntegerType), Literal(1)),
        Cast(es(2), IntegerType))) },
    "toTypeName" -> builtin("typeof"),
    "toColumnTypeName" -> builtin("typeof")
  )

  // ---- reinterpret / FixedString (ChStrHelpers kernels) ----

  private def si(ret: DataType, method: String,
      ins: Seq[DataType]): Builder = { es =>
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      ChStrHelpers.getClass, ret, method, es, inputTypes = ins)
  }

  private def reinterpretAliases: Seq[(String, Builder)] = Seq(
    "reinterpretAsUInt64" -> si(DecimalType(20, 0),
      "reinterpretAsUInt64", Seq(StringType)),
    "reinterpretAsUInt32" -> si(LongType,
      "reinterpretAsUInt32", Seq(StringType)),
    "reinterpretAsString" -> { es =>
      si(StringType, "reinterpretAsString",
        Seq(LongType))(Seq(Cast(es.head, LongType))) },
    "toFixedString" -> { es =>
      si(StringType, "toFixedString", Seq(StringType, IntegerType))(
        Seq(es(0), Cast(es(1), IntegerType))) },
    "toStringCutToZero" -> si(StringType, "toStringCutToZero",
      Seq(StringType))
  )

  // ---- UUID / ULID family ----

  /** per-process stable id, the reference's per-server contract */
  private lazy val serverUuid = java.util.UUID.randomUUID().toString

  private def uuidAliases: Seq[(String, Builder)] = Seq(
    "toUUID" -> { es => Lower(es.head) },
    "UUIDStringToNum" -> { es =>
      builtin("unhex")(Seq(builtin("replace")(Seq(es.head,
        Literal("-"), Literal(""))))) },
    "UUIDNumToString" -> { es =>
      val h = Lower(builtin("hex")(Seq(es.head)))
      Concat(Seq(
        Substring(h, Literal(1), Literal(8)), Literal("-"),
        Substring(h, Literal(9), Literal(4)), Literal("-"),
        Substring(h, Literal(13), Literal(4)), Literal("-"),
        Substring(h, Literal(17), Literal(4)), Literal("-"),
        Substring(h, Literal(21), Literal(12)))) },
    "serverUUID" -> { _ => Literal(serverUuid) },
    // v7 layout: 48-bit unix-millis prefix (query-constant now(), the
    // engine's statement clock), version/variant nibbles, random tail
    // from uuid()'s entropy
    "generateUUIDv7" -> { _ =>
      val ts = builtin("lpad")(Seq(
        builtin("hex")(Seq(builtin("unix_millis")(Seq(
          builtin("now")(Seq.empty))))),
        Literal(12), Literal("0")))
      val r = builtin("replace")(Seq(Cast(Uuid(), StringType),
        Literal("-"), Literal("")))
      Lower(Concat(Seq(
        Substring(ts, Literal(1), Literal(8)), Literal("-"),
        Substring(ts, Literal(9), Literal(4)), Literal("-7"),
        Substring(r, Literal(2), Literal(3)), Literal("-"),
        Substring(r, Literal(5), Literal(4)), Literal("-"),
        Substring(r, Literal(9), Literal(12))))) },
    "generateULID" -> { _ =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        ChStrHelpers.getClass, StringType, "generateULID",
        Seq.empty, inputTypes = Seq.empty, isDeterministic = false) },
    "ULIDStringToDateTime" -> { es =>
      builtin("timestamp_millis")(Seq(
        si(LongType, "ulidMillis", Seq(StringType))(es))) }
  )

  // ---- WKT geometry (DataTypeCustomGeo domains; Cartesian math) ----

  private def geoAliases: Seq[(String, Builder)] = Seq(
    "readWKTPoint" -> { es =>
      def part(i: Int) = Cast(builtin("regexp_extract")(Seq(es.head,
        Literal("POINT\\s*\\(\\s*(-?[\\d.eE+]+)\\s+(-?[\\d.eE+]+)\\s*\\)"),
        Literal(i))), DoubleType)
      CreateNamedStruct(Seq(
        Literal("_1"), part(1), Literal("_2"), part(2))) },
    // single-ring polygons (the Ring/Polygon common case; nested
    // hole rings are out of scope for the textual reader)
    "readWKTRing" -> readWktRing,
    "readWKTPolygon" -> { es => CreateArray(Seq(readWktRing(es))) },
    "wkt" -> { es =>
      Concat(Seq(Literal("POINT("),
        Cast(fld(es.head, "_1"), StringType), Literal(" "),
        Cast(fld(es.head, "_2"), StringType), Literal(")"))) },
    // shoelace over the ring (closed or open — the wrap term closes)
    "polygonAreaCartesian" -> { es =>
      val ring = flattenRing(es.head)
      val n = builtin("size")(Seq(ring))
      val cross = builtin("aggregate")(Seq(
        builtin("sequence")(Seq(Literal(1), n)),
        Literal(0.0),
        lam2 { (acc, i) =>
          val p = builtin("element_at")(Seq(ring, i))
          val q = builtin("element_at")(Seq(ring,
            Add(Pmod(i, n), Literal(1))))
          Add(acc, Subtract(
            Multiply(Cast(fld(p, "_1"), DoubleType),
              Cast(fld(q, "_2"), DoubleType)),
            Multiply(Cast(fld(q, "_1"), DoubleType),
              Cast(fld(p, "_2"), DoubleType))))
        }))
      Divide(Abs(cross), Literal(2.0)) },
    "polygonPerimeterCartesian" -> { es =>
      val ring = flattenRing(es.head)
      val n = builtin("size")(Seq(ring))
      builtin("aggregate")(Seq(
        builtin("sequence")(Seq(Literal(1), n)),
        Literal(0.0),
        lam2 { (acc, i) =>
          val p = builtin("element_at")(Seq(ring, i))
          val q = builtin("element_at")(Seq(ring,
            Add(Pmod(i, n), Literal(1))))
          val dx = Subtract(Cast(fld(p, "_1"), DoubleType),
            Cast(fld(q, "_1"), DoubleType))
          val dy = Subtract(Cast(fld(p, "_2"), DoubleType),
            Cast(fld(q, "_2"), DoubleType))
          Add(acc, builtin("sqrt")(Seq(
            Add(Multiply(dx, dx), Multiply(dy, dy)))))
        })) },
    // pointInEllipses(x, y, x0, y0, a0, b0[, x1, y1, a1, b1, …])
    "pointInEllipses" -> { es =>
      require(es.length >= 6 && (es.length - 2) % 4 == 0,
        "pointInEllipses(x, y, x0, y0, a0, b0, …)")
      val x = Cast(es(0), DoubleType); val y = Cast(es(1), DoubleType)
      val hits = es.drop(2).grouped(4).map { g =>
        val dx = Divide(Subtract(x, Cast(g(0), DoubleType)),
          Cast(g(2), DoubleType))
        val dy = Divide(Subtract(y, Cast(g(1), DoubleType)),
          Cast(g(3), DoubleType))
        LessThanOrEqual(Add(Multiply(dx, dx), Multiply(dy, dy)),
          Literal(1.0)): Expression
      }.toSeq
      If(hits.reduce(Or(_, _)), Literal(1), Literal(0)) },
    // minimal SVG rendering of a ring
    "svg" -> { es =>
      val ring = flattenRing(es.head)
      Concat(Seq(Literal("<polygon points=\""),
        builtin("array_join")(Seq(
          builtin("transform")(Seq(ring, lam1(p =>
            Concat(Seq(Cast(fld(p, "_1"), StringType), Literal(","),
              Cast(fld(p, "_2"), StringType)))))),
          Literal(" "))),
        Literal("\"/>"))) }
  )

  /** accepts a Ring directly or a single-ring Polygon (array-of-ring);
    * build-time unwrap when the literal shape is visible, else Ring. */
  private def flattenRing(e: Expression): Expression = e match {
    case CreateArray(Seq(inner: CreateArray), _)
        if inner.children.nonEmpty => inner
    case other => other
  }

  private def readWktRing: Builder = { es =>
    val inner = builtin("regexp_extract")(Seq(es.head,
      Literal("\\(\\(\\s*([^()]*?)\\s*\\)\\)"), Literal(1)))
    val parts = builtin("split")(Seq(inner, Literal("\\s*,\\s*")))
    builtin("transform")(Seq(parts, lam1 { p =>
      val xy = builtin("split")(Seq(builtin("trim")(Seq(p)),
        Literal("\\s+")))
      CreateNamedStruct(Seq(
        Literal("_1"), Cast(builtin("element_at")(Seq(xy, Literal(1))),
          DoubleType),
        Literal("_2"), Cast(builtin("element_at")(Seq(xy, Literal(2))),
          DoubleType)))
    }))
  }

  // ---- proportion z-test & sample sizing (public closed forms;
  // Winitzki erfinv / A&S 7.1.26 erfc — the ChStats2 polynomials) ----

  private def d(e: Expression): Expression = Cast(e, DoubleType)

  private[functions] def erfinvE(x: Expression): Expression = {
    val a = Literal(0.147)
    val l = builtin("ln")(Seq(Subtract(Literal(1.0), Multiply(x, x))))
    val t = Add(Literal(2.0 / (math.Pi * 0.147)), Divide(l, Literal(2.0)))
    builtin("sqrt")(Seq(Subtract(
      builtin("sqrt")(Seq(Subtract(Multiply(t, t), Divide(l, a)))), t)))
  }

  private def erfcE(x: Expression): Expression = {
    // A&S 7.1.26: erfc(x) = poly(t)·exp(-x²), t = 1/(1+0.3275911·x)
    val t = Divide(Literal(1.0),
      Add(Literal(1.0), Multiply(Literal(0.3275911), x)))
    val poly = Seq(1.061405429, -1.453152027, 1.421413741,
      -0.284496736, 0.254829592).foldLeft(Literal(0.0): Expression) {
      (acc, c) => Add(Multiply(acc, t), Literal(c))
    }
    Multiply(Multiply(poly, t),
      builtin("exp")(Seq(UnaryMinus(Multiply(x, x)))))
  }

  private def statAliases: Seq[(String, Builder)] = Seq(
    // proportionsZTest(sx, sy, nx, ny, conf, 'pooled'|'unpooled') →
    // (z, p, ci_lo, ci_hi) on the success-rate difference
    "proportionsZTest" -> { es =>
      val sx = d(es(0)); val sy = d(es(1))
      val nx = d(es(2)); val ny = d(es(3)); val conf = d(es(4))
      val pooled = es.lift(5).flatMap {
        case Literal(s: UTF8String, StringType) => Some(s.toString)
        case _ => None
      }.forall(_ != "unpooled")
      val p1 = Divide(sx, nx); val p2 = Divide(sy, ny)
      val pPool = Divide(Add(sx, sy), Add(nx, ny))
      val sePooled = builtin("sqrt")(Seq(Multiply(
        Multiply(pPool, Subtract(Literal(1.0), pPool)),
        Add(Divide(Literal(1.0), nx), Divide(Literal(1.0), ny)))))
      val seUnpooled = builtin("sqrt")(Seq(Add(
        Divide(Multiply(p1, Subtract(Literal(1.0), p1)), nx),
        Divide(Multiply(p2, Subtract(Literal(1.0), p2)), ny))))
      val se = if (pooled) sePooled else seUnpooled
      val z = Divide(Subtract(p1, p2), se)
      val p = erfcE(Divide(Abs(z), Literal(math.sqrt(2.0))))
      val zc = Multiply(Literal(math.sqrt(2.0)), erfinvE(conf))
      CreateNamedStruct(Seq(
        Literal("_1"), z, Literal("_2"), p,
        Literal("_3"), Subtract(Subtract(p1, p2),
          Multiply(zc, seUnpooled)),
        Literal("_4"), Add(Subtract(p1, p2),
          Multiply(zc, seUnpooled)))) },
    // minSampleSizeContinous(baseline, sigma, mde, power, alpha) →
    // (n, lo, hi); mde is relative to baseline (the CH contract)
    "minSampleSizeContinous" -> { es =>
      val base = d(es(0)); val sigma = d(es(1)); val mde = d(es(2))
      val power = d(es(3)); val alpha = d(es(4))
      val zA = Multiply(Literal(math.sqrt(2.0)),
        erfinvE(Subtract(Literal(1.0), alpha)))
      val zB = Multiply(Literal(math.sqrt(2.0)),
        erfinvE(Subtract(Multiply(Literal(2.0), power), Literal(1.0))))
      val delta = Multiply(base, mde)
      val n = Multiply(Literal(2.0), Divide(
        Multiply(Multiply(Add(zA, zB), Add(zA, zB)),
          Multiply(sigma, sigma)),
        Multiply(delta, delta)))
      CreateNamedStruct(Seq(
        Literal("_1"), n,
        Literal("_2"), Subtract(base, delta),
        Literal("_3"), Add(base, delta))) },
    // minSampleSizeConversion(p1, mde, power, alpha) — mde absolute
    "minSampleSizeConversion" -> { es =>
      val p1 = d(es(0)); val mde = d(es(1))
      val power = d(es(2)); val alpha = d(es(3))
      val zA = Multiply(Literal(math.sqrt(2.0)),
        erfinvE(Subtract(Literal(1.0), alpha)))
      val zB = Multiply(Literal(math.sqrt(2.0)),
        erfinvE(Subtract(Multiply(Literal(2.0), power), Literal(1.0))))
      val p2 = Add(p1, mde)
      val varSum = Add(
        Multiply(p1, Subtract(Literal(1.0), p1)),
        Multiply(p2, Subtract(Literal(1.0), p2)))
      val n = Divide(Multiply(Multiply(Add(zA, zB), Add(zA, zB)), varSum),
        Multiply(mde, mde))
      CreateNamedStruct(Seq(
        Literal("_1"), n,
        Literal("_2"), Subtract(p1, mde),
        Literal("_3"), Add(p1, mde))) }
  )

  // ---- host / system introspection ----

  private def sysAliases: Seq[(String, Builder)] = Seq(
    "hostName" -> si(StringType, "hostName", Seq.empty),
    "fullHostName" -> si(StringType, "fullHostName", Seq.empty),
    "getOSKernelVersion" -> { _ =>
      Literal(System.getProperty("os.name") + " " +
        System.getProperty("os.version")) },
    "uptime" -> { _ =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        ChStrHelpers.getClass, LongType, "uptimeSeconds",
        Seq.empty, inputTypes = Seq.empty, isDeterministic = false) }
  )

  private def refusals: Seq[(String, Builder)] = {
    def refuse(name: String, why: String): (String, Builder) =
      name -> { _ => throw new UnsupportedOperationException(
        s"$name() $why") }
    Seq(
      refuse("stem", "needs the reference's language stemmer " +
        "dictionaries; use lower()/splitByNonAlpha() pipelines"),
      refuse("lemmatize", "needs the reference's lemma dictionaries"),
      refuse("synonyms", "needs the reference's synonym extensions"),
      refuse("h3ToGeo", "needs the H3 indexing library; use " +
        "geohashEncode/geohashDecode for cell indexing"),
      refuse("geoToH3", "needs the H3 indexing library; use " +
        "geohashEncode for cell indexing"),
      refuse("h3kRing", "needs the H3 indexing library"),
      refuse("polygonsIntersectionCartesian",
        "full polygon clipping is out of scope; compose " +
          "pointInPolygon/polygonAreaCartesian"),
      refuse("transactionID",
        "reads the reference server's transaction state"),
      refuse("transactionLatestSnapshot",
        "reads the reference server's transaction state"))
  }

  /** The in-engine ML family (ChMl): deterministic closed-form fits
    * behind CH's stochastic* names, plus the model-application
    * scalar. */
  private def mlAliases: Seq[(String, Builder)] = Seq(
    "stochasticLinearRegression" -> { es => ChMl.fit(logistic = false, es) },
    "stochasticLogisticRegression" -> { es => ChMl.fit(logistic = true, es) },
    "evalMLMethod" -> { es => ChMl.evalMLMethod(es) }
  )

  def aliases: Seq[(String, Seq[Expression] => Expression)] =
    arraySearchAliases ++ fingerprintAliases ++ reinterpretAliases ++
      uuidAliases ++ geoAliases ++ statAliases ++ sysAliases ++
      mlAliases ++ refusals
}
