package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Round-13 registry tail: the gaps a NameProbe sweep of the public
  * registry surfaced after the r11 batches — array shingles, the
  * IPv4/IPv6/MAC conversion tails, UUIDv7, Joda-token datetime
  * spellings, base32/36, H3 introspection, Cartesian polygon area,
  * the continuous A/B sample-size planner, and language detection
  * over the shared one-pass text-signal kernel.
  *
  * Reference surface: src/Parsers/ASTFunction.h (names accepted by
  * the parser); semantics per public CH docs. Same contract as
  * ChDialect/2/3/4/5: every name is a Catalyst composition or a
  * compiled StaticInvoke kernel — never a UDF. Geobase-backed names
  * (regionToName/…) refuse with guidance: a library engine loads no
  * server-side geobase; that lookup is a dictGet/dimension join.
  */
object ChDialect6 {

  private type Builder = Seq[Expression] => Expression
  private def builtin(name: String) = ChDialect.builtin(name)
  private def lit(d: Double): Expression = Literal(d)
  private def fresh(n: String): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq(
      UnresolvedNamedLambdaVariable.freshVarName(n)))
  private def fld(e: Expression, f: String): Expression =
    UnresolvedExtractValue(e, Literal(f))

  private def refuse(name: String, hint: String): Builder = { _ =>
    throw new UnsupportedOperationException(s"$name: $hint")
  }

  // ---- array tail ----

  /** arrayShingles(arr, n): consecutive length-n windows, in order;
    * fewer than n elements → empty; NULL array → NULL; n ≤ 0 raises
    * (the reference errors on a non-positive shingle length). The
    * empty case reuses a slice of the one-window transform so its
    * element type matches without naming the unresolved element
    * type; the raise rides assert_true inside the guard branch so it
    * only fires when that branch is reached. */
  private def arrayShingles(es: Seq[Expression]): Expression = {
    val arr = es(0)
    val n = Cast(es(1), IntegerType)
    val i = fresh("i")
    def windows(count: Expression): Expression =
      builtin("transform")(Seq(
        builtin("sequence")(Seq(Literal(1), count)),
        LambdaFunction(builtin("slice")(Seq(arr, i, n)), Seq(i))))
    val sz = builtin("size")(Seq(arr))
    val empty = builtin("slice")(Seq(windows(Literal(1)), Literal(1), Literal(0)))
    val raise = builtin("assert_true")(Seq(GreaterThan(n, Literal(0)),
      Literal("arrayShingles: shingle length must be a positive integer")))
    If(IsNull(arr), Literal(null),
      If(IsNotNull(raise), empty,
        If(GreaterThanOrEqual(sz, n),
          windows(Add(Subtract(sz, n), Literal(1))),
          empty)))
  }

  // ---- language detection over the shared signal kernel ----

  /** detectLanguage(text): the t01 lang-ID argmax (stopword-hit
    * scores from the one-pass TextSignalsExpr kernel; ties break to
    * the lexicographically LARGER code, Text.predictedLang's order).
    * 'un' (unknown) when no stopword hits at all — the reference
    * returns 'un' for undetectable input. */
  private def detectLanguage(es: Seq[Expression]): Expression = {
    // the one-pass kernel's hit vector is read ~20x by the argmax
    // If-chain below — bind it ONCE (the c44/c30 interpreted-
    // projection discipline; without it an interpreted projection
    // re-runs the whole kernel per splice)
    ChStats.bind(fld(TextSignalsExpr(es.head), "hits")) { hits =>
    val langs = graft.functions.TextSignalsImpl.stopwords.map(_._1)
    val score: Map[String, Expression] = langs.zipWithIndex.map {
      case (l, i) =>
        l -> builtin("element_at")(Seq(hits, Literal(i + 1)))
    }.toMap
    val desc = langs.sorted.reverse
    val best = desc.foldRight(Literal(desc.last): Expression) {
      case (lang, acc) =>
        val ge = desc.filter(_ != lang)
          .map(o => GreaterThanOrEqual(score(lang), score(o)))
          .reduceOption(And.apply).getOrElse(Literal(true))
        If(ge, Literal(lang), acc)
    }
    val anyHit = langs.map(l => GreaterThan(score(l), Literal(0)))
      .reduce(Or.apply)
    If(anyHit, best, Literal("un"))
    }
  }

  // ---- datetime tail ----

  private def dtAliases: Seq[(String, Builder)] = Seq(
    // our TimestampType carries the session zone — timezoneOf is the
    // session timezone for every value, exactly current_timezone
    "timezoneOf" -> { _ => builtin("current_timezone")(Seq.empty) },
    // Joda tokens ARE java.time tokens for the shared set —
    // from_unixtime / to_timestamp speak them natively
    "fromUnixTimestampInJodaSyntax" -> builtin("from_unixtime"),
    "parseDateTimeInJodaSyntax" -> { es =>
      Cast(builtin("to_timestamp")(es.take(2)), TimestampType) },
    "parseDateTimeInJodaSyntaxOrNull" -> { es =>
      Cast(builtin("try_to_timestamp")(es.take(2)), TimestampType) },
    // best-effort family: micros is the native resolution, so the
    // 64-bit spellings share the existing coalesce chain. Documented
    // divergence (as for parseReadableSize): unparseable input is
    // NULL in all four spellings where the reference's non-OrNull
    // forms throw — a library column op can't abort the query.
    "parseDateTimeBestEffortOrNull" -> { es =>
      ChDialect.builderOf("parseDateTimeBestEffort")(es) },
    "parseDateTime64BestEffort" -> { es =>
      ChDialect.builderOf("parseDateTimeBestEffort")(Seq(es.head)) },
    "parseDateTime64BestEffortOrNull" -> { es =>
      ChDialect.builderOf("parseDateTimeBestEffort")(Seq(es.head)) },
    // UUIDv7: first 48 bits are unix millis (RFC 9562)
    "UUIDv7ToDateTime" -> { es =>
      val hexHead = builtin("substring")(Seq(
        builtin("translate")(Seq(Cast(es.head, StringType),
          Literal("-"), Literal(""))),
        Literal(1), Literal(12)))
      builtin("timestamp_millis")(Seq(
        Cast(builtin("conv")(Seq(hexHead, Literal(16), Literal(10))),
          LongType)) ) },
    "UUIDToNum" -> { es => ChDialect.builderOf("UUIDStringToNum")(es) })

  // ---- IPv4 / IPv6 / MAC conversion tails ----

  private val ipv4Valid =
    "^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$"

  private def ipAliases: Seq[(String, Builder)] = {
    def v4valid(e: Expression) = RLike(e, Literal(ipv4Valid))
    def v4num(e: Expression) = ChDialect.builderOf("IPv4StringToNum")(Seq(e))
    def v6valid(e: Expression) =
      ChDialect2.si1s(BooleanType, "isIPv6String")(Seq(e))
    def v6num(e: Expression) = ChDialect2.si1s(BinaryType, "toIPv6")(Seq(e))
    Seq(
      // toIPv4* keep the STRING presentation (our DDL maps the IPv4
      // type to STRING); invalid input → NULL / 0.0.0.0 — the OrNull
      // contract; plain toIPv4 also NULLs instead of throwing (the
      // parseReadableSize divergence note)
      "toIPv4" -> { es =>
        If(v4valid(es.head), Cast(es.head, StringType),
          Cast(Literal(null), StringType)) },
      "toIPv4OrNull" -> { es =>
        If(v4valid(es.head), Cast(es.head, StringType),
          Cast(Literal(null), StringType)) },
      "toIPv4OrZero" -> { es =>
        If(v4valid(es.head), Cast(es.head, StringType),
          Literal("0.0.0.0")) },
      "toIPv6OrNull" -> { es =>
        If(v6valid(es.head), v6num(es.head),
          Cast(Literal(null), BinaryType)) },
      "toIPv6OrZero" -> { es =>
        If(v6valid(es.head), v6num(es.head),
          builtin("unhex")(Seq(Literal("0" * 32)))) },
      "IPv4StringToNumOrNull" -> { es =>
        If(v4valid(es.head), v4num(es.head),
          Cast(Literal(null), LongType)) },
      "IPv4StringToNumOrZero" -> { es =>
        If(v4valid(es.head), v4num(es.head), Literal(0L)) },
      "IPv6StringToNumOrNull" -> { es =>
        If(v6valid(es.head),
          ChDialect2.si1s(BinaryType, "ipv6StringToNum")(Seq(es.head)),
          Cast(Literal(null), BinaryType)) },
      // ::ffff:a.b.c.d — the 16-byte v4-mapped form. toIPv4 here
      // returns the dotted STRING presentation, so the reference-
      // legal composition IPv4ToIPv6(toIPv4(s)) must work: dotted
      // strings route through IPv4StringToNum, anything else is the
      // numeric carrier.
      "IPv4ToIPv6" -> { es =>
        // explicit casts keep the If RESOLVED at build time — the
        // downstream builtin() builders assert resolved arguments
        val s = Cast(es.head, StringType)
        val n = If(v4valid(s), Cast(v4num(s), LongType),
          Cast(es.head, LongType))
        builtin("unhex")(Seq(Concat(Seq(
          Literal("00000000000000000000FFFF"),
          builtin("lpad")(Seq(
            builtin("hex")(Seq(n)),
            Literal(8), Literal("0"))))))) },
      "cutIPv6" -> { es =>
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          ChStrHelpers.getClass, StringType, "cutIPv6",
          Seq(es(0), Cast(es(1), IntegerType), Cast(es(2), IntegerType)),
          inputTypes = Seq(BinaryType, IntegerType, IntegerType)) },
      // MAC: 6-byte UInt48 ↔ colon-hex (uppercase, the canonical
      // IEEE rendering); invalid strings → 0 like the reference
      "MACNumToString" -> { es =>
        val n = Cast(es.head, LongType)
        val parts = (5 to 0 by -1).map { b =>
          builtin("lpad")(Seq(
            builtin("hex")(Seq(
              BitwiseAnd(ShiftRight(n, Literal(b * 8)), Literal(255L)))),
            Literal(2), Literal("0")))
        }
        builtin("concat_ws")(Literal(":") +: parts) },
      "MACStringToNum" -> { es =>
        val s = Cast(es.head, StringType)
        If(RLike(s, Literal("^([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}$")),
          Cast(builtin("conv")(Seq(
            builtin("translate")(Seq(s, Literal(":"), Literal(""))),
            Literal(16), Literal(10))), LongType),
          Literal(0L)) },
      "MACStringToOUI" -> { es =>
        val s = Cast(es.head, StringType)
        If(RLike(s, Literal("^([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}$")),
          Cast(builtin("conv")(Seq(
            builtin("translate")(Seq(
              builtin("substring")(Seq(s, Literal(1), Literal(8))),
              Literal(":"), Literal(""))),
            Literal(16), Literal(10))), LongType),
          Literal(0L)) })
  }

  // ---- misc ----

  private def miscAliases: Seq[(String, Builder)] = Seq(
    "arrayShingles" -> arrayShingles _,
    "detectLanguage" -> detectLanguage _,
    // H3 cell index layout (public spec): resolution = bits 52-55
    "h3GetResolution" -> { es =>
      Cast(BitwiseAnd(ShiftRight(Cast(es.head, LongType), Literal(52)),
        Literal(15L)), IntegerType) },
    // base32: the RFC 4648 string codec — compiled kernels
    "base32Encode" -> { es =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        ChStrHelpers.getClass, StringType, "base32Encode", Seq(es.head),
        inputTypes = Seq(StringType)) },
    "base32Decode" -> { es =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        ChStrHelpers.getClass, StringType, "base32Decode", Seq(es.head),
        inputTypes = Seq(StringType)) },
    // the correctly-spelled ALIAS of ChDialect3's planner (the
    // reference registers the typo'd minSampleSizeContinous as
    // canonical and this spelling as its alias)
    "minSampleSizeContinuous" -> { es =>
      ChDialect.builderOf("minSampleSizeContinous")(es) },

    // -If combinator spellings of the arg-extremum pair: MinBy/MaxBy
    // skip NULL ordering keys, so the predicate nulls the key
    "argMinIf" -> { es =>
      aggregate.MinBy(es(0), If(es(2), es(1), Literal(null)))
        .toAggregateExpression() },
    "argMaxIf" -> { es =>
      aggregate.MaxBy(es(0), If(es(2), es(1), Literal(null)))
        .toAggregateExpression() },
    // bitmap-state aggregates over the sorted-distinct-array bitmap
    // realization (the bitmapBuild contract): AND = cardinality of
    // the running intersect, OR = cardinality of the union
    "groupBitmapAnd" -> { es =>
      val lst = aggregate.CollectList(es.head).toAggregateExpression()
      val acc = fresh("acc"); val a = fresh("a")
      // try_element_at: a group whose bitmaps are all NULL collects
      // an empty list — the reference answers 0 there, not an
      // INVALID_ARRAY_INDEX error (the two identical agg expressions
      // dedup in the physical aggregate)
      val inter = builtin("aggregate")(Seq(lst,
        builtin("try_element_at")(Seq(lst, Literal(1))),
        LambdaFunction(builtin("array_intersect")(Seq(acc, a)),
          Seq(acc, a))))
      If(EqualTo(builtin("size")(Seq(lst)), Literal(0)),
        Literal(0), builtin("size")(Seq(inter))) },
    "groupBitmapOr" -> { es =>
      builtin("size")(Seq(builtin("array_distinct")(Seq(
        builtin("flatten")(Seq(
          aggregate.CollectList(es.head).toAggregateExpression())))))) },
    // plural sibling of the registered quantileTiming sketch
    "quantilesTiming" -> { es =>
      builtin("percentile_approx")(Seq(es.head,
        CreateArray(es.tail.map(Cast(_, DoubleType))), Literal(10000))) },
    // nothing(x): the reference's placeholder aggregate — always NULL
    "nothing" -> { _ =>
      aggregate.Max(Literal(null, IntegerType)).toAggregateExpression() },
    // two-array spellings of the keyed-map aggregates (the reference
    // registers these as sumMap-family aliases)
    "sumMappedArrays" -> { es => MapCombineAgg(es(0), es(1), "sum") },
    "minMappedArrays" -> { es => MapCombineAgg(es(0), es(1), "min") },
    "maxMappedArrays" -> { es => MapCombineAgg(es(0), es(1), "max") },
    // distinct leaf paths across a JSON document column (the JSON
    // type introspection aggregate): per-row Jackson walk, then a
    // sorted distinct union — partial-agg friendly
    "distinctJSONPaths" -> { es =>
      val paths = org.apache.spark.sql.catalyst.expressions.objects
        .StaticInvoke(ChStrHelpers.getClass, ArrayType(StringType),
          "jsonPaths", Seq(es.head), inputTypes = Seq(StringType))
      builtin("sort_array")(Seq(builtin("array_distinct")(Seq(
        builtin("flatten")(Seq(
          aggregate.CollectList(paths).toAggregateExpression())))))) },
    // codepoint-aware left/right spellings (Spark's count codepoints)
    "leftUTF8" -> builtin("left"),
    "rightUTF8" -> builtin("right"),
    // null-safe equality — Spark's <=> as a named function
    "isNotDistinctFrom" -> { es => EqualNullSafe(es(0), es(1)) },
    // nanosecond interval: micros is the native resolution — the
    // nanos floor to whole microseconds (documented narrowing, the
    // DateTime64(9) story repo-wide)
    "toIntervalNanosecond" -> { es =>
      ChDialect.builderOf("toIntervalMicrosecond")(
        Seq(Cast(Divide(Cast(es.head, DoubleType), Literal(1000.0)),
          LongType))) },
    // bitmap subset ops over the sorted-array bitmap realization
    "bitmapSubsetInRange" -> { es =>
      val x = fresh("x")
      builtin("filter")(Seq(es(0), LambdaFunction(
        And(GreaterThanOrEqual(x, es(1)), LessThan(x, es(2))), Seq(x)))) },
    "bitmapSubsetLimit" -> { es =>
      val x = fresh("x")
      builtin("slice")(Seq(
        builtin("filter")(Seq(es(0), LambdaFunction(
          GreaterThanOrEqual(x, es(1)), Seq(x)))),
        Literal(1), Cast(es(2), IntegerType))) },
    // value remapping: x → to[pos(from, x)] where present, else x;
    // re-sort-normalized so equal bitmaps stay comparable
    "bitmapTransform" -> { es =>
      val x = fresh("x")
      val pos = builtin("array_position")(Seq(es(1), x))
      builtin("sort_array")(Seq(builtin("array_distinct")(Seq(
        builtin("transform")(Seq(es(0), LambdaFunction(
          If(GreaterThan(pos, Literal(0L)),
            builtin("element_at")(Seq(es(2), Cast(pos, IntegerType))), x),
          Seq(x)))))))) },
    // indexHint(expr): the reference evaluates expr ONLY for index
    // selection and yields 1 — parquet pushdown plays that role here,
    // so the value contract (constant 1) is the whole surface
    "indexHint" -> { _ => Literal(1) },
    "replicate" -> refuse("replicate",
      "an internal block-replication helper of the reference's " +
        "arrayJoin machinery — use explode/transform directly"),
    "dumpColumnStructure" -> refuse("dumpColumnStructure",
      "inspect types with toTypeName/toColumnTypeName or df.schema"),
    "flameGraph" -> refuse("flameGraph",
      "renders the server's query-profiler stacks — a library engine " +
        "has none; use your Spark UI / event-log profiler"),
    "distinctDynamicTypes" -> refuse("distinctDynamicTypes",
      "the Dynamic column type has no mapping here — columns carry " +
        "one Spark type; for JSON payloads use distinctJSONPaths"),

    // geobase-backed names: the reference resolves these against a
    // server-loaded region hierarchy; a library engine loads none —
    // the same lookup is a dictGet / broadcast dimension join
    "regionToName" -> refuse("regionToName",
      "needs the server geobase; load your region table and use " +
        "dictGetString(dict, 'name', id) or a broadcast join"),
    "regionToCountry" -> refuse("regionToCountry",
      "needs the server geobase; use dictGet over your region table"),
    "regionToArea" -> refuse("regionToArea",
      "needs the server geobase; use dictGet over your region table"),
    "regionIn" -> refuse("regionIn",
      "needs the server geobase; join the region closure table"),
    "detectCharset" -> refuse("detectCharset",
      "strings in this engine are UTF-8 by construction — decode " +
        "foreign charsets at ingestion (file()/reader options)"),
    "detectLanguageUnknown" -> refuse("detectLanguageUnknown",
      "use detectLanguage (returns 'un' when no signal)"))

  def aliases: Seq[(String, Builder)] =
    dtAliases ++ ipAliases ++ miscAliases
}
