package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 widening of the ClickHouse-name surface (reference:
  * src/Parsers/ASTFunction.h resolves every call against its registry;
  * semantics per the public ClickHouse documentation of each name).
  * Same contract as ChDialect: every name delegates to Spark builtins /
  * Catalyst nodes (codegen'd, never a UDF); where byte-compatibility
  * with a native hash is impossible the alias is role-equivalent and
  * documented so, matching the existing cityHash64 → xxhash64 policy.
  */
object ChDialect2 {

  private type Builder = Seq[Expression] => Expression
  private def builtin(name: String) = ChDialect.builtin(name)

  private def lam1(body: Expression => Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("__g2_x"))
    LambdaFunction(body(x), Seq(x))
  }
  private def fld(e: Expression, n: String): Expression =
    UnresolvedExtractValue(e, Literal(n))
  private def litStr(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) => Some(s.toString)
    case _ => None
  }

  /** 64-bit hash-family role-equivalents: distinct seeds keep the
    * names mutually distinct (as the native functions are) while
    * staying on Spark's codegen'd XxHash64 kernel. Not byte-compatible
    * with the native algorithms — the cityHash64 policy. */
  private def h64(seed: Long): Builder = es => XxHash64(es, seed)
  private def h32(seed: Int): Builder = es => Murmur3Hash(es, seed)

  /** md5-derived 128-bit role stand-in (FixedString(16) in CH). */
  private def h128(salt: String): Builder = es =>
    builtin("unhex")(Seq(builtin("md5")(Seq(
      Concat(Literal(salt) +: es.map(e => Cast(e, StringType)))))))

  // ---- date & time ----

  private def tsAdd(unit: String, negate: Boolean): Builder = { es =>
    val n = Cast(es(1), LongType)
    TimestampAdd(unit, if (negate) UnaryMinus(n) else n,
      Cast(es(0), TimestampType))
  }

  private def minuteBucket(seconds: Int): Builder = { es =>
    val m = builtin("unix_micros")(Seq(Cast(es.head, TimestampType)))
    builtin("timestamp_micros")(Seq(
      Subtract(m, Pmod(m, Literal(seconds * 1000000L)))))
  }

  private def dateTimeAliases: Seq[(String, Builder)] = Seq(
    // same wall-clock time moved to the reference's fixed date
    // 1970-01-02 (DataTypeDateTime.h family helper)
    "toTime" -> { es =>
      val m = builtin("unix_micros")(Seq(Cast(es.head, TimestampType)))
      builtin("timestamp_micros")(Seq(Add(
        Pmod(m, Literal(86400000000L)), Literal(86400000000L)))) },
    // timeSlots(t, duration[, size=1800]): every size-second slot
    // start the closed range [t, t+duration] touches
    "timeSlots" -> { es =>
      val size = if (es.size > 2) Cast(es(2), LongType) else Literal(1800L)
      val sizeM = Multiply(size, Literal(1000000L))
      val m = builtin("unix_micros")(Seq(Cast(es(0), TimestampType)))
      val lo = Subtract(m, Pmod(m, sizeM))
      val hiM = Add(m, Multiply(Cast(es(1), LongType), Literal(1000000L)))
      val hi = Subtract(hiM, Pmod(hiM, sizeM))
      builtin("transform")(Seq(
        builtin("sequence")(Seq(lo, hi, sizeM)),
        lam1(x => builtin("timestamp_micros")(Seq(x))))) },
    "toRelativeYearNum"  -> builtin("year"),
    "toRelativeMonthNum" -> { es =>
      Add(Multiply(builtin("year")(es), Literal(12)), builtin("month")(es)) },
    "toRelativeDayNum" -> { es =>
      builtin("datediff")(Seq(Cast(es.head, DateType),
        Cast(Literal("1970-01-01"), DateType))) },
    "toRelativeHourNum" -> { es =>
      Cast(builtin("floor")(Seq(Divide(
        Cast(builtin("unix_micros")(Seq(Cast(es.head, TimestampType))),
          DoubleType), Literal(3600000000.0)))), LongType) },
    "toRelativeMinuteNum" -> { es =>
      Cast(builtin("floor")(Seq(Divide(
        Cast(builtin("unix_micros")(Seq(Cast(es.head, TimestampType))),
          DoubleType), Literal(60000000.0)))), LongType) },
    "toRelativeSecondNum" -> { es =>
      builtin("unix_timestamp")(Seq(Cast(es.head, TimestampType))) },
    // dateName(part, datetime) → the named component as a string
    "dateName" -> { es =>
      val d = es(1)
      val lower = Lower(es(0))
      def s(b: Expression) = Cast(b, StringType)
      CaseWhen(Seq(
        (EqualTo(lower, Literal("year")), s(builtin("year")(Seq(d)))),
        (EqualTo(lower, Literal("quarter")), s(builtin("quarter")(Seq(d)))),
        (EqualTo(lower, Literal("month")),
          builtin("date_format")(Seq(d, Literal("MMMM")))),
        (EqualTo(lower, Literal("week")), s(builtin("weekofyear")(Seq(d)))),
        (EqualTo(lower, Literal("dayofyear")),
          s(builtin("dayofyear")(Seq(d)))),
        (EqualTo(lower, Literal("day")), s(builtin("dayofmonth")(Seq(d)))),
        (EqualTo(lower, Literal("weekday")),
          builtin("date_format")(Seq(d, Literal("EEEE")))),
        (EqualTo(lower, Literal("hour")), s(builtin("hour")(Seq(d)))),
        (EqualTo(lower, Literal("minute")), s(builtin("minute")(Seq(d)))),
        (EqualTo(lower, Literal("second")), s(builtin("second")(Seq(d))))),
        None) },
    // date-unit adds keep DATE; time-unit adds go through timestampadd
    "addWeeks" -> { es =>
      builtin("date_add")(Seq(es(0),
        Multiply(Cast(es(1), IntegerType), Literal(7)))) },
    "subtractWeeks" -> { es =>
      builtin("date_add")(Seq(es(0),
        Multiply(Cast(es(1), IntegerType), Literal(-7)))) },
    "addHours"        -> tsAdd("HOUR", negate = false),
    "subtractHours"   -> tsAdd("HOUR", negate = true),
    "addMinutes"      -> tsAdd("MINUTE", negate = false),
    "subtractMinutes" -> tsAdd("MINUTE", negate = true),
    "addSeconds"      -> tsAdd("SECOND", negate = false),
    "subtractSeconds" -> tsAdd("SECOND", negate = true),
    "subtractMonths" -> { es =>
      builtin("add_months")(Seq(es(0),
        UnaryMinus(Cast(es(1), IntegerType)))) },
    "subtractYears" -> { es =>
      builtin("add_months")(Seq(es(0),
        Multiply(Cast(es(1), IntegerType), Literal(-12)))) },
    "toStartOfTenMinutes"  -> minuteBucket(600),
    "toStartOfFiveMinutes" -> minuteBucket(300)
  )

  // ---- URL family ----

  /** The reference's firstSignificantSubdomain heuristic: the label
    * left of the registrable domain, where second-level registries
    * (com/net/org/co/…) push the cut one label deeper. */
  private val secondLevelRegistries =
    Seq("com", "net", "org", "co", "gov", "edu", "mil", "biz", "info", "ac")

  private def firstSigSub(es: Seq[Expression], cut: Boolean): Expression = {
    val host = builtin("regexp_replace")(Seq(
      builtin("parse_url")(es :+ Literal("HOST")),
      Literal("^www\\."), Literal("")))
    val labels = builtin("split")(Seq(host, Literal("\\.")))
    val n = builtin("size")(Seq(labels))
    val tldMinus1 = builtin("element_at")(Seq(labels,
      Subtract(n, Literal(1))))
    val deep = In(tldMinus1, secondLevelRegistries.map(Literal(_)))
    val depth = If(And(deep, GreaterThan(n, Literal(2))),
      Literal(3), Literal(2))
    val sig = builtin("element_at")(Seq(labels,
      Subtract(n, Subtract(depth, Literal(1)))))
    if (!cut) If(LessThan(n, Literal(2)), host, sig)
    else If(LessThan(n, Literal(2)), host,
      builtin("array_join")(Seq(
        builtin("slice")(Seq(labels,
          Add(Subtract(n, depth), Literal(1)), depth)),
        Literal("."))))
  }

  /** scheme://host prefix and the cleaned path segments of a URL. */
  private def pathSegments(u: Expression): (Expression, Expression) = {
    val root = builtin("regexp_extract")(Seq(u,
      Literal("^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"), Literal(1)))
    val rest = builtin("regexp_replace")(Seq(
      builtin("substring_index")(Seq(
        builtin("substring_index")(Seq(u, Literal("#"), Literal(1))),
        Literal("?"), Literal(1))),
      Literal("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*/?"), Literal("")))
    val segs = builtin("filter")(Seq(
      builtin("split")(Seq(rest, Literal("/"))),
      lam1(x => GreaterThan(Length(x), Literal(0)))))
    (root, segs)
  }

  private def urlAliases: Seq[(String, Builder)] = Seq(
    "domainWithoutWWW" -> { es =>
      builtin("regexp_replace")(Seq(
        builtin("parse_url")(es :+ Literal("HOST")),
        Literal("^www\\."), Literal(""))) },
    // host's last label; '' when the host has no dot (CH contract)
    "topLevelDomain" -> { es =>
      val host = builtin("parse_url")(es :+ Literal("HOST"))
      If(Contains(host, Literal(".")),
        builtin("substring_index")(Seq(host, Literal("."), Literal(-1))),
        Literal("")) },
    "pathFull" -> { es =>
      val p = builtin("parse_url")(es :+ Literal("PATH"))
      val q = builtin("parse_url")(es :+ Literal("QUERY"))
      Concat(Seq(Coalesce(Seq(p, Literal(""))),
        If(IsNull(q), Literal(""), Concat(Seq(Literal("?"), q))))) },
    "fragment" -> { es =>
      Coalesce(Seq(builtin("parse_url")(es :+ Literal("REF")),
        Literal(""))) },
    "cutQueryString" -> { es =>
      builtin("substring_index")(Seq(es.head, Literal("?"), Literal(1))) },
    "cutFragment" -> { es =>
      builtin("substring_index")(Seq(es.head, Literal("#"), Literal(1))) },
    "cutQueryStringAndFragment" -> { es =>
      builtin("substring_index")(Seq(
        builtin("substring_index")(Seq(es.head, Literal("#"), Literal(1))),
        Literal("?"), Literal(1))) },
    // drop one leading www. right after the scheme (or at the start)
    "cutWWW" -> { es =>
      builtin("regexp_replace")(Seq(es.head,
        Literal("^([a-zA-Z][a-zA-Z0-9+.-]*://)?www\\."), Literal("$1"))) },
    "decodeURLComponent" -> builtin("url_decode"),
    // url_encode form-encodes space as '+'; the reference uses %20
    "encodeURLComponent" -> { es =>
      builtin("replace")(Seq(builtin("url_encode")(es),
        Literal("+"), Literal("%20"))) },
    // authority part: user:pass@host:port (no scheme, path, query)
    "netloc" -> { es =>
      builtin("regexp_extract")(Seq(es.head,
        Literal("^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//([^/?#]*)"),
        Literal(1))) },
    "firstSignificantSubdomain" -> { es => firstSigSub(es, cut = false) },
    "cutToFirstSignificantSubdomain" -> { es => firstSigSub(es, cut = true) },
    // progressively longer URL prefixes cut at path-segment bounds
    "URLHierarchy" -> { es =>
      val (root, segs) = pathSegments(es.head)
      val n = builtin("size")(Seq(segs))
      val rootSlash = Concat(Seq(root, Literal("/")))
      val prefixes = builtin("transform")(Seq(
        builtin("sequence")(Seq(Literal(1), n)),
        lam1(i => Concat(Seq(rootSlash, builtin("array_join")(Seq(
          builtin("slice")(Seq(segs, Literal(1), i)), Literal("/"))),
          If(LessThan(i, n), Literal("/"), Literal("")))))))
      CaseWhen(Seq(
        (GreaterThan(n, Literal(0)),
          Concat(Seq(CreateArray(Seq(rootSlash)), prefixes))),
        (GreaterThan(Length(root), Literal(0)),
          CreateArray(Seq(rootSlash)))),
        Some(CreateArray(Seq.empty, useStringTypeWhenEmpty = true))) },
    "URLPathHierarchy" -> { es =>
      val (_, segs) = pathSegments(es.head)
      val n = builtin("size")(Seq(segs))
      builtin("transform")(Seq(
        builtin("sequence")(Seq(Literal(1), n)),
        lam1(i => Concat(Seq(Literal("/"), builtin("array_join")(Seq(
          builtin("slice")(Seq(segs, Literal(1), i)), Literal("/"))),
          If(LessThan(i, n), Literal("/"), Literal(""))))))) },
    "extractURLParameters" -> { es =>
      val q = builtin("parse_url")(es :+ Literal("QUERY"))
      builtin("filter")(Seq(
        builtin("split")(Seq(Coalesce(Seq(q, Literal(""))), Literal("&"))),
        lam1(x => GreaterThan(Length(x), Literal(0))))) },
    "extractURLParameterNames" -> { es =>
      val q = builtin("parse_url")(es :+ Literal("QUERY"))
      builtin("transform")(Seq(
        builtin("filter")(Seq(
          builtin("split")(Seq(Coalesce(Seq(q, Literal(""))),
            Literal("&"))),
          lam1(x => GreaterThan(Length(x), Literal(0))))),
        lam1(x =>
          builtin("substring_index")(Seq(x, Literal("="), Literal(1)))))) }
  )

  // ---- strings ----

  private def hasTokenB(caseInsensitive: Boolean): Builder = { es =>
    litStr(es(1)) match {
      case Some(tok) =>
        val t = java.util.regex.Pattern.quote(tok)
        val flags = if (caseInsensitive) "(?i)" else ""
        RLike(es(0),
          Literal(s"$flags(^|[^A-Za-z0-9_])$t([^A-Za-z0-9_]|$$)"))
      case None => throw new IllegalArgumentException(
        "hasToken(haystack, needle-literal)")
    }
  }

  private def stringAliases: Seq[(String, Builder)] = Seq(
    // lpad/rpad are char-counted (= the UTF8 variants); the plain CH
    // names count bytes — char-counted here, documented divergence
    "leftPad"      -> builtin("lpad"),
    "rightPad"     -> builtin("rpad"),
    "leftPadUTF8"  -> builtin("lpad"),
    "rightPadUTF8" -> builtin("rpad"),
    "initcapUTF8"  -> builtin("initcap"),
    "countMatches" -> { es =>
      builtin("size")(Seq(
        builtin("regexp_extract_all")(Seq(es(0), es(1), Literal(0))))) },
    // splits into maximal [a-zA-Z] runs (the reference's alphaTokens)
    "alphaTokens" -> { es =>
      builtin("regexp_extract_all")(Seq(es.head,
        Literal("[a-zA-Z]+"), Literal(0))) },
    "editDistance" -> builtin("levenshtein"),
    // character-set Jaccard between the two strings
    "stringJaccardIndex" -> { es =>
      val ca = builtin("array_distinct")(Seq(
        builtin("split")(Seq(es(0), Literal("")))))
      val cb = builtin("array_distinct")(Seq(
        builtin("split")(Seq(es(1), Literal("")))))
      val inter = builtin("size")(Seq(
        builtin("array_intersect")(Seq(ca, cb))))
      val uni = builtin("size")(Seq(builtin("array_union")(Seq(ca, cb))))
      If(EqualTo(uni, Literal(0)), Literal(0.0),
        Divide(Cast(inter, DoubleType), Cast(uni, DoubleType))) },
    // token = maximal [A-Za-z0-9_] run; matches whole tokens only
    "hasToken" -> hasTokenB(caseInsensitive = false),
    "hasTokenCaseInsensitive" -> hasTokenB(caseInsensitive = true),
    // escape every regexp metacharacter (reference regexpQuoteMeta)
    "regexpQuoteMeta" -> { es =>
      "^$.[]|()?*+{}:-".foldLeft(
        builtin("replace")(Seq(es.head, Literal("\\"), Literal("\\\\")))) {
        (acc, ch) =>
          builtin("replace")(Seq(acc, Literal(ch.toString),
            Literal("\\" + ch)))
      } },
    // replace only the FIRST match; pattern+replacement literals only
    // (the rewrite renumbers the replacement's \N backrefs around the
    // wrapper groups, which needs both strings at build time)
    "replaceRegexpOne" -> { es =>
      (litStr(es(1)), litStr(es(2))) match {
        case (Some(re), Some(rep)) =>
          val innerGroups =
            java.util.regex.Pattern.compile(re).matcher("").groupCount()
          // wrapped groups: 1 = prefix, 2 = the whole original match,
          // 3..2+k = the pattern's own groups, 3+k = tail
          var r = rep.replace("$", "\\$")
          for (k <- innerGroups to 0 by -1)
            r = r.replace("\\" + k, "$" + (if (k == 0) 2 else k + 2))
          builtin("regexp_replace")(Seq(es(0),
            Literal("(?s)^(.*?)(" + re + ")(.*)$"),
            Literal("$1" + r + "$" + (innerGroups + 3))))
        case _ => throw new IllegalArgumentException(
          "replaceRegexpOne(haystack, pattern-literal, replacement-literal)")
      } },
    // extractGroups(s, re-literal) → array of the first match's groups
    "extractGroups" -> { es =>
      litStr(es(1)) match {
        case Some(re) =>
          val n = java.util.regex.Pattern.compile(re).matcher("").groupCount()
          CreateArray((1 to n).map(i =>
            builtin("regexp_extract")(Seq(es(0), es(1), Literal(i)))))
        case None => throw new IllegalArgumentException(
          "extractGroups(haystack, pattern-literal)")
      } },
    // decimal digits needed for an integer value
    "countDigits" -> { es =>
      Length(Cast(Abs(Cast(es.head, LongType)), StringType)) },
    // fixed-scale decimal rendering (no thousands separators)
    "toDecimalString" -> { es =>
      es(1) match {
        case Literal(s: Int, IntegerType) =>
          Cast(Cast(es(0), DecimalType(38, math.min(s, 37))), StringType)
        case _ => throw new IllegalArgumentException(
          "toDecimalString(value, scale-literal)")
      } },
    // a string column is UTF-8 by construction; for binary input a
    // decode/encode round-trip detects invalid sequences (ANSI decode
    // throws on them — TryEval maps that to null → 0)
    "isValidUTF8" -> { es =>
      val roundtrip = TryEval(builtin("encode")(Seq(
        builtin("decode")(Seq(Cast(es.head, BinaryType),
          Literal("UTF-8"))), Literal("UTF-8"))))
      If(And(IsNotNull(roundtrip),
        EqualTo(roundtrip, Cast(es.head, BinaryType))),
        Literal(1), Literal(0)) },
    "widthBucket" -> builtin("width_bucket"),
    "tryBase64Decode" -> { es =>
      Coalesce(Seq(TryEval(Cast(builtin("unbase64")(es), StringType)),
        Literal(""))) },
    // inverse of bin(): 8-bit groups (right-aligned) back into bytes
    "unbin" -> { es =>
      val s = es.head
      val len = Length(s)
      val pad = Pmod(Subtract(Literal(8), Pmod(len, Literal(8))),
        Literal(8))
      val padded = Concat(Seq(
        builtin("repeat")(Seq(Literal("0"), pad)), s))
      val nBytes = Cast(Divide(Add(len, pad), Literal(8)), IntegerType)
      val byteChar = lam1 { i =>
        val group = Substring(padded,
          Add(Multiply(Subtract(i, Literal(1)), Literal(8)), Literal(1)),
          Literal(8))
        builtin("char")(Seq(
          Cast(builtin("conv")(Seq(group, Literal(2), Literal(10))),
            LongType)))
      }
      builtin("array_join")(Seq(
        builtin("transform")(Seq(
          builtin("sequence")(Seq(Literal(1), nBytes)), byteChar)),
        Literal(""))) }
  )

  // ---- hashes ----

  private def hashAliases: Seq[(String, Builder)] = Seq(
    // exact: first 8 bytes of MD5, big-endian, as the unsigned value
    "halfMD5" -> { es =>
      val hex16 = Substring(builtin("md5")(Seq(Concat(es.map(e =>
        Cast(e, StringType))))), Literal(1), Literal(16))
      Cast(builtin("conv")(Seq(hex16, Literal(16), Literal(10))),
        DecimalType(20, 0)) },
    "sipHash64"         -> h64(0x5150),
    "farmHash64"        -> h64(0xFA23),
    "farmFingerprint64" -> h64(0xFA24),
    "murmurHash2_64"    -> h64(0x3212),
    "murmurHash3_64"    -> h64(0x3312),
    "murmurHash2_32"    -> h32(0x3202),
    "murmurHash3_32"    -> h32(0x3302),
    "xxHash32"          -> h32(0x8812),
    "sipHash128"        -> h128("sip128:"),
    "murmurHash3_128"   -> h128("mmh3-128:"),
    // exact: Spark's HiveHash IS the Hive/Java polynomial hash the
    // reference's hiveHash mirrors
    "hiveHash" -> { es => HiveHash(es) },
    // exact for BMP strings: Java String.hashCode — 31·h+c folded in
    // unsigned-mod-2^64 space, sign restored at the end
    "javaHash" -> { es =>
      val chars = builtin("split")(Seq(Cast(es.head, StringType),
        Literal("")))
      val acc = UnresolvedNamedLambdaVariable(Seq("__jh_acc"))
      val ch = UnresolvedNamedLambdaVariable(Seq("__jh_c"))
      val step = Pmod(Add(Multiply(acc, Literal(31L)),
        Cast(builtin("ascii")(Seq(ch)), LongType)), Literal(4294967296L))
      val unsigned = builtin("aggregate")(Seq(chars, Literal(0L),
        LambdaFunction(step, Seq(acc, ch))))
      Cast(If(GreaterThanOrEqual(unsigned, Literal(2147483648L)),
        Subtract(unsigned, Literal(4294967296L)), unsigned),
        IntegerType) }
  )

  // ---- JSON ----

  private def jsonPath(es: Seq[Expression]): Expression =
    if (es.size == 1) es.head
    else builtin("get_json_object")(Seq(es(0),
      Concat(Seq(Literal("$."), es(1)))))

  private def simpleJson(valueRe: String, unescape: Boolean): Builder = {
    es =>
      litStr(es(1)) match {
        case Some(k) =>
          val re = "\"" + java.util.regex.Pattern.quote(k) +
            "\"\\s*:\\s*" + valueRe
          val raw = builtin("regexp_extract")(Seq(es(0), Literal(re),
            Literal(1)))
          if (!unescape) raw
          else builtin("replace")(Seq(
            builtin("replace")(Seq(raw, Literal("\\\""), Literal("\""))),
            Literal("\\\\"), Literal("\\")))
        case None => throw new IllegalArgumentException(
          "simpleJSONExtract*(json, name-literal)")
      }
  }

  private def simpleJsonHas: Builder = { es =>
    litStr(es(1)) match {
      case Some(k) =>
        RLike(es(0), Literal(
          "\"" + java.util.regex.Pattern.quote(k) + "\"\\s*:"))
      case None => throw new IllegalArgumentException(
        "simpleJSONHas(json, name-literal)")
    }
  }

  private def jsonAliases: Seq[(String, Builder)] = Seq(
    "JSONExtractFloat" -> { es => Cast(jsonPath(es), DoubleType) },
    "JSONExtractBool"  -> { es => Cast(jsonPath(es), BooleanType) },
    "JSONExtractRaw"   -> { es => jsonPath(es) },
    "JSONExtractArrayRaw" -> { es =>
      val j = jsonPath(es)
      val n = builtin("json_array_length")(Seq(j))
      If(Or(IsNull(n), EqualTo(n, Literal(0))),
        CreateArray(Seq.empty, useStringTypeWhenEmpty = true),
        builtin("transform")(Seq(
          builtin("sequence")(Seq(Literal(0), Subtract(n, Literal(1)))),
          lam1(i => builtin("get_json_object")(Seq(j, Concat(Seq(
            Literal("$["), Cast(i, StringType), Literal("]"))))))))) },
    "JSONExtractKeys" -> { es =>
      builtin("json_object_keys")(Seq(jsonPath(es))) },
    "JSONType" -> { es =>
      val t = builtin("trim")(Seq(jsonPath(es)))
      CaseWhen(Seq(
        (IsNull(t), Literal("Null")),
        (StartsWith(t, Literal("{")), Literal("Object")),
        (StartsWith(t, Literal("[")), Literal("Array")),
        (StartsWith(t, Literal("\"")), Literal("String")),
        (In(t, Seq(Literal("true"), Literal("false"))), Literal("Bool")),
        (EqualTo(t, Literal("null")), Literal("Null")),
        (RLike(t, Literal("^-?\\d+$")), Literal("Int64"))),
        Some(Literal("Double"))) },
    // the visitParam/simpleJSON family scans for "name": anywhere in
    // the document (nesting-blind — the reference's fast path)
    "simpleJSONExtractString" ->
      simpleJson("\"((?:[^\"\\\\]|\\\\.)*)\"", unescape = true),
    "simpleJSONExtractInt" -> { es =>
      Cast(simpleJson("(-?\\d+)", unescape = false)(es), LongType) },
    "simpleJSONExtractFloat" -> { es =>
      Cast(simpleJson("(-?\\d+(?:\\.\\d+)?(?:[eE][-+]?\\d+)?)",
        unescape = false)(es), DoubleType) },
    "simpleJSONExtractBool" -> { es =>
      EqualTo(simpleJson("(true|false)", unescape = false)(es),
        Literal("true")) },
    "simpleJSONHas" -> simpleJsonHas,
    "visitParamExtractString" ->
      simpleJson("\"((?:[^\"\\\\]|\\\\.)*)\"", unescape = true),
    "visitParamExtractInt" -> { es =>
      Cast(simpleJson("(-?\\d+)", unescape = false)(es), LongType) },
    "visitParamHas" -> simpleJsonHas
  )

  // ---- bit / misc ----

  private def bitMask(bits: Seq[Expression]): Expression =
    bits.map(b => ShiftLeft(Literal(1L), Cast(b, IntegerType)))
      .reduce[Expression]((a, b) => BitwiseOr(a, b))

  private def bitMiscAliases: Seq[(String, Builder)] = Seq(
    "bitRotateLeft" -> { es =>
      val x = Cast(es(0), LongType)
      val n = Pmod(Cast(es(1), IntegerType), Literal(64))
      BitwiseOr(ShiftLeft(x, n),
        ShiftRightUnsigned(x, Subtract(Literal(64), n))) },
    "bitRotateRight" -> { es =>
      val x = Cast(es(0), LongType)
      val n = Pmod(Cast(es(1), IntegerType), Literal(64))
      BitwiseOr(ShiftRightUnsigned(x, n),
        ShiftLeft(x, Subtract(Literal(64), n))) },
    "bitTestAll" -> { es =>
      val mask = bitMask(es.tail)
      EqualTo(BitwiseAnd(Cast(es.head, LongType), mask), mask) },
    "bitTestAny" -> { es =>
      GreaterThan(BitwiseAnd(Cast(es.head, LongType), bitMask(es.tail)),
        Literal(0L)) },
    "bitHammingDistance" -> { es =>
      BitwiseCount(BitwiseXor(Cast(es(0), LongType),
        Cast(es(1), LongType))) },
    // CIDR → (first, last) address of the block, as UInt32 values
    "IPv4CIDRToRange" -> { es =>
      val ip = Cast(es(0), LongType)
      val bits = Cast(es(1), IntegerType)
      val mask = If(EqualTo(bits, Literal(0)), Literal(0L),
        BitwiseAnd(ShiftLeft(Literal(-1L), Subtract(Literal(32), bits)),
          Literal(0xFFFFFFFFL)))
      val lo = BitwiseAnd(ip, mask)
      val hi = BitwiseOr(lo,
        BitwiseAnd(BitwiseNot(mask), Literal(0xFFFFFFFFL)))
      CreateNamedStruct(Seq(Literal("_1"), lo, Literal("_2"), hi)) },
    "LpNorm" -> { es =>
      val p = Cast(es(1), DoubleType)
      val acc = UnresolvedNamedLambdaVariable(Seq("__lp_acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("__lp_x"))
      builtin("power")(Seq(
        builtin("aggregate")(Seq(es(0), Literal(0.0),
          LambdaFunction(Add(acc, builtin("power")(Seq(
            Abs(Cast(x, DoubleType)), p))), Seq(acc, x)))),
        Divide(Literal(1.0), p))) },
    // same literal scrubbing as normalizeQuery; identifier-list
    // folding is the only part of the native pair not realized, so
    // KeepNames and the hash both ride the one scrubber
    "normalizeQueryKeepNames" -> normalizeQueryB,
    "normalizedQueryHash" -> { es =>
      XxHash64(Seq(normalizeQueryB(es)), 42L) },
    "currentDatabase" -> { _ => builtin("current_database")(Seq.empty) },
    "currentUser"     -> { _ => builtin("current_user")(Seq.empty) },
    // the reference's processing block ≈ the executing partition
    "blockNumber" -> { _ => SparkPartitionID() },
    // monotonically_increasing_id's low 33 bits ARE the row index
    // within the executing partition
    "rowNumberInBlock" -> { _ =>
      BitwiseAnd(MonotonicallyIncreasingID(), Literal((1L << 33) - 1)) },
    // unique and block-monotone (not globally consecutive — the
    // reference's value is block-order-dependent too)
    "rowNumberInAllBlocks" -> { _ => MonotonicallyIncreasingID() },
    // nondeterministic family, built on Spark's own rand()/uuid()
    "rand64" -> { _ =>
      XxHash64(Seq(builtin("rand")(Seq.empty)), 7L) },
    "randCanonical" -> { _ => builtin("rand")(Seq.empty) },
    "randomString" -> randomBytes(asPrintable = false),
    "randomPrintableASCII" -> randomBytes(asPrintable = true)
  )

  private def normalizeQueryB: Builder = { es =>
    builtin("regexp_replace")(Seq(
      builtin("regexp_replace")(Seq(es.head,
        Literal("('([^'\\\\]|\\\\.)*')"), Literal("?"))),
      Literal("(?<![a-zA-Z0-9_])-?\\d+(\\.\\d+)?"), Literal("?")))
  }

  /** n random bytes via concatenated uuid-seeded md5 blocks; the
    * printable variant rides base64 (whose alphabet is printable). */
  private def randomBytes(asPrintable: Boolean): Builder = { es =>
    es.head match {
      case Literal(n: Int, IntegerType) =>
        val blocks = math.max(1, (n + 11) / 12)
        val hexChain = Concat((1 to blocks).map(_ =>
          builtin("md5")(Seq(Uuid()))))
        if (asPrintable)
          Substring(builtin("base64")(Seq(
            builtin("unhex")(Seq(hexChain)))), Literal(1), Literal(n))
        else
          builtin("unhex")(Seq(Substring(hexChain, Literal(1),
            Literal(2 * n))))
      case _ => throw new IllegalArgumentException(
        "randomString(length-literal)")
    }
  }

  // ---- map / array ----

  private def mapMergeRightWins(a: Expression, b: Expression): Expression = {
    val kept = builtin("filter")(Seq(
      builtin("map_entries")(Seq(a)),
      lam1(e => Not(builtin("array_contains")(Seq(
        builtin("map_keys")(Seq(b)), fld(e, "key")))))))
    builtin("map_from_entries")(Seq(
      Concat(Seq(kept, builtin("map_entries")(Seq(b))))))
  }

  private def mapArrayAliases: Seq[(String, Builder)] = Seq(
    // the reference's map HOFs take the lambda FIRST
    "mapFilter" -> { es => builtin("map_filter")(Seq(es(1), es(0))) },
    // mapApply((k,v) -> tuple(k', v'), m). Spark validates that a
    // function receiving a lambda RESOLVES to a HigherOrderFunction,
    // so the tuple body is split at build time into a key expression
    // and a value expression and rebuilt as a transform_values →
    // transform_keys → transform_values chain (original value carried
    // alongside so the key lambda still sees it).
    "mapApply" -> { es =>
      val (kName, vName, body) = es.head match {
        case LambdaFunction(b,
            Seq(k: UnresolvedNamedLambdaVariable,
                v: UnresolvedNamedLambdaVariable), _) =>
          (k.nameParts, v.nameParts, b)
        case _ => throw new IllegalArgumentException(
          "mapApply((k, v) -> tuple(k2, v2), map)")
      }
      val (fk, fv) = body match {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.arguments.size == 2 &&
              Seq("tuple", "struct").contains(
                f.nameParts.last.toLowerCase) =>
          (f.arguments(0), f.arguments(1))
        case s: CreateNamedStruct if s.valExprs.size == 2 =>
          (s.valExprs(0), s.valExprs(1))
        case _ => throw new IllegalArgumentException(
          "mapApply's lambda must return tuple(key, value)")
      }
      def subst(e: Expression, kRef: Expression,
          vRef: Expression): Expression = e.transformUp {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == kName => kRef
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == vName => vRef
        case lv: UnresolvedNamedLambdaVariable
            if lv.nameParts == kName => kRef
        case lv: UnresolvedNamedLambdaVariable
            if lv.nameParts == vName => vRef
      }
      def lamKV(f: (Expression, Expression) => Expression): Expression = {
        val a = UnresolvedNamedLambdaVariable(Seq("__ma_k"))
        val b = UnresolvedNamedLambdaVariable(Seq("__ma_v"))
        LambdaFunction(f(a, b), Seq(a, b))
      }
      val paired = builtin("transform_values")(Seq(es(1),
        lamKV((k, v) => CreateNamedStruct(Seq(
          Literal("orig"), v,
          Literal("newv"), subst(fv, k, v))))))
      val keyed = builtin("transform_keys")(Seq(paired,
        lamKV((k, vs) => subst(fk, k, fld(vs, "orig")))))
      builtin("transform_values")(Seq(keyed,
        lamKV((_, vs) => fld(vs, "newv")))) },
    // right map's keys win (the reference's mapUpdate contract)
    "mapUpdate" -> { es => mapMergeRightWins(es(0), es(1)) },
    "mapConcat" -> { es => es.reduce(mapMergeRightWins) },
    // dense enumeration: index of each value in the distinct list
    "arrayEnumerateDense" -> { es =>
      val d = builtin("array_distinct")(Seq(es.head))
      builtin("transform")(Seq(es.head,
        lam1(x => builtin("array_position")(Seq(d, x))))) },
    // cumulative sum clamped at zero whenever it would go negative
    "arrayCumSumNonNegative" -> { es =>
      val accV = UnresolvedNamedLambdaVariable(Seq("__ccn_acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("__ccn_x"))
      val fin = UnresolvedNamedLambdaVariable(Seq("__ccn_fin"))
      val run = fld(accV, "run"); val out = fld(accV, "out")
      val next = Greatest(Seq(Add(run, Cast(x, DoubleType)),
        Literal(0.0)))
      builtin("aggregate")(Seq(es.head,
        CreateNamedStruct(Seq(
          Literal("run"), Literal(0.0),
          Literal("out"),
          builtin("array_repeat")(Seq(Literal(0.0), Literal(0))))),
        LambdaFunction(CreateNamedStruct(Seq(
          Literal("run"), next,
          Literal("out"), Concat(Seq(out, CreateArray(Seq(next)))))),
          Seq(accV, x)),
        LambdaFunction(fld(fin, "out"), Seq(fin)))) },
    "arrayRotateLeft" -> { es =>
      val len = builtin("size")(Seq(es.head))
      val n = If(GreaterThan(len, Literal(0)),
        Pmod(Cast(es(1), IntegerType), len), Literal(0))
      Concat(Seq(
        builtin("slice")(Seq(es.head, Add(n, Literal(1)),
          Subtract(len, n))),
        builtin("slice")(Seq(es.head, Literal(1), n)))) },
    "arrayRotateRight" -> { es =>
      val len = builtin("size")(Seq(es.head))
      val n = If(GreaterThan(len, Literal(0)),
        Pmod(UnaryMinus(Cast(es(1), IntegerType)), len), Literal(0))
      Concat(Seq(
        builtin("slice")(Seq(es.head, Add(n, Literal(1)),
          Subtract(len, n))),
        builtin("slice")(Seq(es.head, Literal(1), n)))) },
    "arrayShiftLeft" -> { es =>
      val len = builtin("size")(Seq(es.head))
      val n = Least(Seq(
        Greatest(Seq(Cast(es(1), IntegerType), Literal(0))), len))
      val fill = if (es.size > 2) es(2) else Literal(0)
      Concat(Seq(
        builtin("slice")(Seq(es.head, Add(n, Literal(1)),
          Subtract(len, n))),
        builtin("array_repeat")(Seq(fill, n)))) },
    "arrayShiftRight" -> { es =>
      val len = builtin("size")(Seq(es.head))
      val n = Least(Seq(
        Greatest(Seq(Cast(es(1), IntegerType), Literal(0))), len))
      val fill = if (es.size > 2) es(2) else Literal(0)
      Concat(Seq(
        builtin("array_repeat")(Seq(fill, n)),
        builtin("slice")(Seq(es.head, Literal(1), Subtract(len, n))))) }
  )

  // ---- readable formatting ----

  private def readableAliases: Seq[(String, Builder)] = Seq(
    // decimal (SI) units, 2 dp — the base-1000 twin of
    // formatReadableSize's binary units
    "formatReadableDecimalSize" -> { es =>
      val b = Cast(es.head, DoubleType)
      def fmt(scaled: Expression, unit: String): Expression =
        Concat(Seq(builtin("format_number")(Seq(scaled, Literal(2))),
          Literal(" " + unit)))
      CaseWhen(Seq(
        (LessThan(b, Literal(1000.0)), fmt(b, "B")),
        (LessThan(b, Literal(1e6)), fmt(Divide(b, Literal(1000.0)), "KB")),
        (LessThan(b, Literal(1e9)), fmt(Divide(b, Literal(1e6)), "MB")),
        (LessThan(b, Literal(1e12)), fmt(Divide(b, Literal(1e9)), "GB"))),
        Some(fmt(Divide(b, Literal(1e12)), "TB"))) },
    // "1 hour, 5 minutes, 30 seconds" — days/hours/minutes/seconds,
    // zero components skipped, "0 seconds" for a zero delta
    "formatReadableTimeDelta" -> { es =>
      val total = Cast(builtin("floor")(Seq(Cast(es.head, DoubleType))),
        LongType)
      val days = Cast(Divide(total, Literal(86400L)), LongType)
      val hours = Cast(Divide(Pmod(total, Literal(86400L)),
        Literal(3600L)), LongType)
      val minutes = Cast(Divide(Pmod(total, Literal(3600L)),
        Literal(60L)), LongType)
      val seconds = Pmod(total, Literal(60L))
      def unit(n: Expression, name: String): Expression =
        If(EqualTo(n, Literal(0L)), Literal(null, StringType),
          Concat(Seq(Cast(n, StringType),
            If(EqualTo(n, Literal(1L)), Literal(" " + name),
              Literal(" " + name + "s")))))
      val parts = builtin("concat_ws")(Seq(Literal(", "),
        unit(days, "day"), unit(hours, "hour"), unit(minutes, "minute"),
        unit(seconds, "second")))
      If(EqualTo(Length(parts), Literal(0)), Literal("0 seconds"),
        parts) }
  )

  private def refusals: Seq[(String, Builder)] = Seq(
    "multiFuzzyMatchAny" -> { _ =>
      throw new UnsupportedOperationException(
        "multiFuzzyMatchAny() needs the reference's hyperscan build; " +
          "compose editDistance()/match() instead") },
    "untuple" -> { _ =>
      throw new UnsupportedOperationException(
        "untuple(t) expands to multiple columns — use t.* in Spark SQL") },
    "blockSize" -> { _ =>
      throw new UnsupportedOperationException(
        "blockSize() reads the reference's current processing block; " +
          "use count(*) OVER () for a per-result-set count") }
  )

  // ---- imperative kernels (ChStrHelpers via StaticInvoke:
  //      codegen'd static call, null-propagating, never a UDF) ----

  private def si(ret: DataType, method: String,
      ins: Seq[DataType]): Builder = { es =>
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      ChStrHelpers.getClass, ret, method, es, inputTypes = ins)
  }
  private def si2s(ret: DataType, method: String): Builder =
    si(ret, method, Seq(StringType, StringType))
  private[functions] def si1s(ret: DataType, method: String): Builder =
    si(ret, method, Seq(StringType))

  private def helperAliases: Seq[(String, Builder)] = Seq(
    "jaroSimilarity" -> si2s(DoubleType, "jaroSimilarity"),
    "jaroWinklerSimilarity" -> si2s(DoubleType, "jaroWinklerSimilarity"),
    "base58Encode" -> si1s(StringType, "base58Encode"),
    "base58Decode" -> si1s(StringType, "base58Decode"),
    "punycodeEncode" -> si1s(StringType, "punycodeEncode"),
    "punycodeDecode" -> si1s(StringType, "punycodeDecode"),
    "idnaEncode" -> si1s(StringType, "idnaEncode"),
    "idnaDecode" -> si1s(StringType, "idnaDecode"),
    "normalizeUTF8NFC" -> si1s(StringType, "normalizeNFC"),
    "normalizeUTF8NFD" -> si1s(StringType, "normalizeNFD"),
    "normalizeUTF8NFKC" -> si1s(StringType, "normalizeNFKC"),
    "normalizeUTF8NFKD" -> si1s(StringType, "normalizeNFKD"),
    "IPv6StringToNum" -> si1s(BinaryType, "ipv6StringToNum"),
    "IPv6NumToString" -> si(StringType, "ipv6NumToString",
      Seq(BinaryType)),
    "toIPv6" -> si1s(BinaryType, "toIPv6"),
    // UInt8 contract like the reference's validators
    "isIPv6String" -> { es =>
      If(si1s(BooleanType, "isIPv6String")(es), Literal(1), Literal(0)) },
    "IPv6CIDRToRange" -> { es =>
      val addr = es.head
      val pref = Cast(es(1), IntegerType)
      CreateNamedStruct(Seq(
        Literal("_1"), si(BinaryType, "ipv6CidrLow",
          Seq(BinaryType, IntegerType))(Seq(addr, pref)),
        Literal("_2"), si(BinaryType, "ipv6CidrHigh",
          Seq(BinaryType, IntegerType))(Seq(addr, pref)))) },
    "ngramDistance" -> si2s(DoubleType, "ngramDistance"),
    "ngramSearch" -> si2s(DoubleType, "ngramSearch"),
    "ngramDistanceCaseInsensitive" -> { es =>
      si2s(DoubleType, "ngramDistance")(es.map(Lower(_))) },
    "ngramSearchCaseInsensitive" -> { es =>
      si2s(DoubleType, "ngramSearch")(es.map(Lower(_))) }
  )

  def aliases: Seq[(String, Seq[Expression] => Expression)] =
    dateTimeAliases ++ urlAliases ++ stringAliases ++ hashAliases ++
      jsonAliases ++ bitMiscAliases ++ mapArrayAliases ++
      readableAliases ++ helperAliases ++ refusals
}
