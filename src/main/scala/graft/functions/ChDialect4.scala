package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-9 sweep 3 of the ClickHouse-name surface (reference:
  * src/Parsers/ASTFunction.h registry; public CH docs semantics):
  * date constructors and Interval makers, MySQL-format datetime
  * parsing, regex group extraction, tuple arithmetic, partial/seeded
  * array reorderings, the random-distribution family, AES
  * encrypt/decrypt, space-filling-curve codes, consistent hashing,
  * and CIDR membership. Same contract as ChDialect/2/3: every name
  * is a Catalyst composition or a StaticInvoke kernel — never a UDF.
  */
object ChDialect4 {

  private type Builder = Seq[Expression] => Expression
  private def builtin(name: String) = ChDialect.builtin(name)

  private def litStr(e: Expression, fn: String, what: String): String =
    e match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn needs a literal $what, got $other")
    }

  private def litInt(e: Expression, fn: String, what: String): Int =
    e match {
      case Literal(i: Int, IntegerType) => i
      case Literal(i: Long, LongType) => i.toInt
      case other => throw new IllegalArgumentException(
        s"$fn needs a literal $what, got $other")
    }

  // ---- date/time constructors ----

  private def dtInterval(days: Expression, hours: Expression,
      mins: Expression, secs: Expression): Expression =
    builtin("make_dt_interval")(Seq(days, hours, mins, secs))
  private def ymInterval(years: Expression, months: Expression): Expression =
    builtin("make_ym_interval")(Seq(years, months))
  private val zero = Literal(0)

  /** CH's MySQL-syntax format tokens → Java time pattern (the common
    * set; unknown tokens refuse loudly rather than mis-parse). */
  private def mysqlToJava(fmt: String, fn: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        out.append(fmt.charAt(i + 1) match {
          case 'Y' => "yyyy"
          case 'y' => "yy"
          case 'm' => "MM"
          case 'c' => "M"
          case 'd' => "dd"
          case 'e' => "d"
          case 'H' => "HH"
          case 'k' => "H"
          case 'h' | 'I' => "hh"
          case 'l' => "h"
          case 'i' => "mm"
          case 's' | 'S' => "ss"
          case 'p' => "a"
          case 'M' => "MMMM"
          case 'b' => "MMM"
          case 'j' => "DDD"
          case 'a' => "EEE"
          case 'W' => "EEEE"
          case 'F' => "yyyy-MM-dd"
          case 'T' => "HH:mm:ss"
          case '%' => "%"
          case u => throw new UnsupportedOperationException(
            s"$fn: unsupported MySQL format token '%$u'")
        })
        i += 2
      } else {
        // literal run — quote anything that could be a pattern letter
        if (c.isLetter) out.append('\'').append(c).append('\'')
        else out.append(c)
        i += 1
      }
    }
    out.toString
  }

  private def dateTimeAliases: Seq[(String, Builder)] = Seq(
    "makeDate" -> { es => builtin("make_date")(es) },
    "makeDate32" -> { es => builtin("make_date")(es) },
    "makeDateTime" -> { es => builtin("make_timestamp")(es.take(6)) },
    "makeDateTime64" -> { es => builtin("make_timestamp")(es.take(6)) },
    // chMonthName: ChSql renames CH monthName() here — Spark 4 owns
    // a monthname() builtin with ABBREVIATED output, CH's is the
    // full name; spelled as a literal lookup for locale independence
    "chMonthName" -> { es =>
      builtin("element_at")(Seq(
        CreateArray(Seq("January", "February", "March", "April", "May",
          "June", "July", "August", "September", "October", "November",
          "December").map(Literal(_))),
        builtin("month")(Seq(Cast(es.head, DateType))))) },
    // proleptic-Gregorian days since 0000-01-01 (epoch day + 719528,
    // CH's documented anchor — Spark dates can't reach year 0, so the
    // constant bridges from the epoch)
    "toDaysSinceYearZero" -> { es =>
      Add(builtin("datediff")(Seq(Cast(es.head, DateType),
        Cast(Literal("1970-01-01"), DateType))), Literal(719528)) },
    "toModifiedJulianDay" -> { es =>
      builtin("datediff")(Seq(Cast(es.head, DateType),
        Cast(Literal("1858-11-17"), DateType))) },
    "fromModifiedJulianDay" -> { es =>
      builtin("date_add")(Seq(Cast(Literal("1858-11-17"), DateType),
        Cast(es.head, IntegerType))) },
    "parseDateTime" -> { es =>
      require(es.size == 2, "parseDateTime(str, format) — the " +
        "timezone argument is not supported (session timezone applies)")
      val fmt = mysqlToJava(litStr(es(1), "parseDateTime", "format"),
        "parseDateTime")
      builtin("to_timestamp")(Seq(es.head, Literal(fmt))) },
    "toIntervalSecond" -> { es => dtInterval(zero, zero, zero, es.head) },
    "toIntervalMinute" -> { es => dtInterval(zero, zero, es.head, zero) },
    "toIntervalHour" -> { es => dtInterval(zero, es.head, zero, zero) },
    "toIntervalDay" -> { es => dtInterval(es.head, zero, zero, zero) },
    "toIntervalWeek" -> { es =>
      dtInterval(Multiply(es.head, Literal(7)), zero, zero, zero) },
    "toIntervalMonth" -> { es => ymInterval(zero, es.head) },
    "toIntervalQuarter" -> { es =>
      ymInterval(zero, Multiply(es.head, Literal(3))) },
    "toIntervalYear" -> { es => ymInterval(es.head, zero) },
    "toIntervalMillisecond" -> { es => dtInterval(zero, zero, zero,
      Divide(Cast(es.head, DoubleType), Literal(1000.0))) },
    "toIntervalMicrosecond" -> { es => dtInterval(zero, zero, zero,
      Divide(Cast(es.head, DoubleType), Literal(1000000.0))) },
    // toWeek(d[, mode]) / toYearWeek(d[, mode]) — CH inherits MySQL's
    // WEEK() mode table and adds modes 8/9 (all 10 public modes; CH
    // docs). Each mode decomposes into three independent axes — see
    // weekModeTable: week first day (Sunday/Monday), the week-1 rule
    // (year's first <first-day> / the week with ≥4 days of the year,
    // i.e. the week containing Jan 4 / the week containing Jan 1),
    // and the range (0–53: days before week 1 are week 0; 1–53: those
    // days take the previous year's last week number instead).
    "toWeek" -> { es =>
      val d = Cast(es.head, DateType)
      val m = weekMode(es, "toWeek")
      if (m == 3) builtin("weekofyear")(Seq(d)) // ISO 8601 = Spark's
      else {
        val (mon, rule, zeroRange) = weekModeTable(m)
        if (zeroRange) {
          // numbered within d's own calendar year (a late-Dec week
          // reaching into next year counts as 53, MySQL's contract)
          val w1 = week1StartInYearOf(d, mon, rule)
          If(LessThan(d, w1), Literal(0), weekFrom(w1, d))
        } else {
          // numbered within the week's OWNING year (the anchor day's)
          val anchor = weekOwnerAnchor(d, mon, rule)
          weekFrom(week1StartInYearOf(anchor, mon, rule), d)
        }
      } },
    // toYearWeek is MySQL YEARWEEK: always owner-year numbering
    // (the 0-53/1-53 range axis is moot — week 0 never appears)
    "toYearWeek" -> { es =>
      val d = Cast(es.head, DateType)
      val m = weekMode(es, "toYearWeek")
      val (mon, rule, _) = weekModeTable(m)
      val anchor = weekOwnerAnchor(d, mon, rule)
      val wk = if (m == 3) builtin("weekofyear")(Seq(d))
        else weekFrom(week1StartInYearOf(anchor, mon, rule), d)
      Add(Multiply(builtin("year")(Seq(anchor)), Literal(100)), wk) }
  )

  /** CH type name literal → Spark DataType (via ChDdl's type map). */
  private def chTypeOf(e: Expression, fn: String): DataType = {
    val chName = litStr(e, fn, "type name")
    val (sparkSql, _) = ChDdl.parseType(ChSql.retok(chName))
    CatalystSqlParser.parseDataType(sparkSql)
  }

  private def weekMode(es: Seq[Expression], fn: String): Int = {
    val m = if (es.size >= 2) litInt(es(1), fn, "mode") else 0
    require(m >= 0 && m <= 9, s"$fn mode $m not supported (0-9 are)")
    m
  }

  // week-1 rules (the second axis of the MySQL/CH mode table)
  private val RuleFirstWeekday = 0 // week 1 starts at the year's first <first-day>
  private val RuleGe4Days = 1      // week 1 = the week containing Jan 4 (≥4 days of the year)
  private val RuleHasJan1 = 2      // week 1 = the week containing Jan 1

  /** mode → (Monday-first?, week-1 rule, 0–53 range?) — the public
    * CH/MySQL WEEK() mode table, decomposed. */
  private val weekModeTable: Map[Int, (Boolean, Int, Boolean)] = Map(
    0 -> ((false, RuleFirstWeekday, true)),
    1 -> ((true, RuleGe4Days, true)),
    2 -> ((false, RuleFirstWeekday, false)),
    3 -> ((true, RuleGe4Days, false)),
    4 -> ((false, RuleGe4Days, true)),
    5 -> ((true, RuleFirstWeekday, true)),
    6 -> ((false, RuleGe4Days, false)),
    7 -> ((true, RuleFirstWeekday, false)),
    8 -> ((false, RuleHasJan1, false)),
    9 -> ((true, RuleHasJan1, false)))

  /** Start of d's week under the mode's first day. */
  private def weekStartOf(d: Expression, mondayFirst: Boolean): Expression =
    if (mondayFirst) mondayOf(d)
    else builtin("date_sub")(Seq(d,
      Subtract(builtin("dayofweek")(Seq(d)), Literal(1)))) // Sunday of

  /** Start of week 1 in the calendar year of `ref`. */
  private def week1StartInYearOf(ref: Expression, mondayFirst: Boolean,
      rule: Int): Expression = {
    val jan1 = builtin("trunc")(Seq(ref, Literal("YEAR")))
    rule match {
      case RuleFirstWeekday =>
        // first Sunday/Monday on-or-after Jan 1 (dayofweek: Sun=1)
        val target = if (mondayFirst) 2 else 1
        builtin("date_add")(Seq(jan1, Pmod(
          Subtract(Literal(target + 7), builtin("dayofweek")(Seq(jan1))),
          Literal(7))))
      case RuleGe4Days =>
        weekStartOf(builtin("date_add")(Seq(jan1, Literal(3))), mondayFirst)
      case RuleHasJan1 => weekStartOf(jan1, mondayFirst)
    }
  }

  /** The day whose calendar year OWNS d's week: the week's start for
    * the first-<day> rule, its 4th day for the ≥4-days rule, its last
    * day for the contains-Jan-1 rule (a week containing Jan 1 belongs
    * to the NEW year). Numbering from this anchor's week-1 start is
    * always ≥ 1 — MySQL YEARWEEK's contract. */
  private def weekOwnerAnchor(d: Expression, mondayFirst: Boolean,
      rule: Int): Expression = {
    val ws = weekStartOf(d, mondayFirst)
    rule match {
      case RuleFirstWeekday => ws
      case RuleGe4Days => builtin("date_add")(Seq(ws, Literal(3)))
      case RuleHasJan1 => builtin("date_add")(Seq(ws, Literal(6)))
    }
  }

  /** Week index counted from `start` (week 1 = [start, start+7)). */
  private def weekFrom(start: Expression, d: Expression): Expression =
    Cast(Add(IntegralDivide(
      Cast(builtin("datediff")(Seq(d, start)), LongType), Literal(7L)),
      Literal(1L)), IntegerType)

  /** Monday of d's Monday-first week. */
  private def mondayOf(d: Expression): Expression =
    builtin("date_sub")(Seq(d,
      Pmod(Add(builtin("dayofweek")(Seq(d)), Literal(5)), Literal(7))))

  // ---- regex group extraction ----

  /** Does the literal pattern declare a capturing group? (the
    * ChSql/extract rule: '(' not followed by '?', not escaped) */
  private def hasCapture(p: String): Boolean = {
    var i = 0
    var esc = false
    while (i < p.length) {
      val c = p.charAt(i)
      if (esc) esc = false
      else if (c == '\\') esc = true
      else if (c == '(' &&
        (i + 1 >= p.length || p.charAt(i + 1) != '?')) return true
      i += 1
    }
    false
  }

  private def captureCount(p: String): Int = {
    var i = 0
    var esc = false
    var n = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (esc) esc = false
      else if (c == '\\') esc = true
      else if (c == '(' &&
        (i + 1 >= p.length || p.charAt(i + 1) != '?')) n += 1
      i += 1
    }
    n
  }

  private def lam1(body: Expression => Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("__g4_x"))
    LambdaFunction(body(x), Seq(x))
  }

  private def regexAliases: Seq[(String, Builder)] = Seq(
    "regexpExtract" -> { es =>
      val idx = if (es.size >= 3) es(2) else es(1) match {
        case Literal(p: UTF8String, StringType) =>
          Literal(if (hasCapture(p.toString)) 1 else 0)
        case _ => Literal(1)
      }
      builtin("regexp_extract")(Seq(es(0), es(1), idx)) },
    // array per GROUP, one entry per match
    "extractAllGroupsHorizontal" -> { es =>
      val g = captureCount(litStr(es(1),
        "extractAllGroupsHorizontal", "pattern"))
      require(g > 0, "extractAllGroupsHorizontal: pattern has no " +
        "capturing groups")
      CreateArray((1 to g).map(k =>
        builtin("regexp_extract_all")(Seq(es(0), es(1), Literal(k))))) },
    // array per MATCH, one entry per group
    "extractAllGroupsVertical" -> { es =>
      val g = captureCount(litStr(es(1),
        "extractAllGroupsVertical", "pattern"))
      require(g > 0, "extractAllGroupsVertical: pattern has no " +
        "capturing groups")
      val per = (1 to g).map(k =>
        builtin("regexp_extract_all")(Seq(es(0), es(1), Literal(k))))
      builtin("transform")(Seq(
        builtin("sequence")(Seq(Literal(1),
          builtin("size")(Seq(per.head)))),
        lam1(m => CreateArray(per.map(p =>
          builtin("element_at")(Seq(p, m))))))) }
  )

  // ---- tuple arithmetic (element-wise over CH tuples = structs).
  //      Arity must be knowable at build time, so operands must be
  //      written as tuple(...) literals-in-place; anything else
  //      refuses with guidance. ----

  private def structFields(e: Expression, fn: String): Seq[Expression] =
    e match {
      case CreateNamedStruct(kids) =>
        kids.grouped(2).map(_.last).toSeq
      case other => throw new UnsupportedOperationException(
        s"$fn needs its tuple operands written in place — " +
          s"$fn(tuple(a, b), tuple(c, d)) — got $other")
    }

  private def tupleOf(vals: Seq[Expression]): Expression =
    CreateNamedStruct(vals.zipWithIndex.flatMap { case (v, i) =>
      Seq(Literal(s"_${i + 1}"), v)
    })

  private def tupleWise(fn: String,
      op: (Expression, Expression) => Expression): Builder = { es =>
    val a = structFields(es(0), fn)
    val b = structFields(es(1), fn)
    require(a.size == b.size, s"$fn: tuple sizes differ " +
      s"(${a.size} vs ${b.size})")
    tupleOf(a.zip(b).map { case (x, y) => op(x, y) })
  }

  private def tupleAliases: Seq[(String, Builder)] = Seq(
    "tuplePlus" -> tupleWise("tuplePlus", Add(_, _)),
    "tupleMinus" -> tupleWise("tupleMinus", Subtract(_, _)),
    "tupleMultiply" -> tupleWise("tupleMultiply", Multiply(_, _)),
    "tupleDivide" -> tupleWise("tupleDivide", Divide(_, _)),
    "tupleNegate" -> { es =>
      tupleOf(structFields(es(0), "tupleNegate").map(UnaryMinus(_))) },
    "tupleMultiplyByNumber" -> { es =>
      tupleOf(structFields(es(0), "tupleMultiplyByNumber")
        .map(Multiply(_, es(1)))) },
    "tupleDivideByNumber" -> { es =>
      tupleOf(structFields(es(0), "tupleDivideByNumber")
        .map(Divide(_, es(1)))) },
    "mapFromArrays" -> { es => builtin("map_from_arrays")(es) }
  )

  // ---- array reorderings ----

  private def arrayAliases: Seq[(String, Builder)] = Seq(
    // CH contract: first `limit` positions sorted, the rest
    // unspecified — a fully sorted array satisfies it and is the
    // only deterministic spelling
    "arrayPartialSort" -> { es =>
      builtin("sort_array")(Seq(es.last)) },
    "arrayPartialReverseSort" -> { es =>
      builtin("sort_array")(Seq(es.last, Literal(false))) },
    "arrayShuffle" -> { es => builtin("shuffle")(es) },
    "arrayRandomSample" -> { es =>
      builtin("slice")(Seq(builtin("shuffle")(Seq(es(0))),
        Literal(1), es(1))) }
  )

  // ---- random distributions (rand/randn transforms; naturally
  //      nondeterministic, like CH's own) ----

  private def rnd: Expression = builtin("rand")(Seq.empty)
  private def randAliases: Seq[(String, Builder)] = Seq(
    "randUniform" -> { es =>
      Add(Cast(es(0), DoubleType),
        Multiply(rnd, Subtract(Cast(es(1), DoubleType),
          Cast(es(0), DoubleType)))) },
    "randNormal" -> { es =>
      Add(Cast(es(0), DoubleType),
        Multiply(builtin("randn")(Seq.empty), Cast(es(1), DoubleType))) },
    "randExponential" -> { es =>
      Divide(UnaryMinus(builtin("ln")(Seq(Subtract(Literal(1.0), rnd)))),
        Cast(es(0), DoubleType)) },
    "randBernoulli" -> { es =>
      Cast(LessThan(rnd, Cast(es(0), DoubleType)), IntegerType) }
  )

  // ---- AES (Spark's aes_encrypt/aes_decrypt; CH mode strings like
  //      'aes-256-gcm' map to the Spark mode, with CH's iv/aad
  //      argument order preserved) ----

  private def aesMode(mode: String, fn: String): (String, String) = {
    val m = mode.toLowerCase
    val parts = m.split("-")
    require(parts.length == 3 && parts(0) == "aes",
      s"$fn: unsupported mode '$mode' (want aes-<len>-<ecb|cbc|gcm>)")
    parts(2) match {
      case "ecb" => ("ECB", "PKCS")
      case "cbc" => ("CBC", "PKCS")
      case "gcm" => ("GCM", "NONE")
      case other => throw new UnsupportedOperationException(
        s"$fn: unsupported AES chaining mode '$other'")
    }
  }

  private def cryptoAliases: Seq[(String, Builder)] = Seq(
    "encrypt" -> { es =>
      val (mode, pad) = aesMode(litStr(es(0), "encrypt", "mode"), "encrypt")
      val base = Seq(es(1), es(2), Literal(mode), Literal(pad))
      builtin("aes_encrypt")(
        if (es.size >= 4) base ++ es.drop(3) else base) },
    "decrypt" -> { es =>
      val (mode, pad) = aesMode(litStr(es(0), "decrypt", "mode"), "decrypt")
      val base = Seq(es(1), es(2), Literal(mode), Literal(pad))
      // aes_decrypt takes (input, key, mode, padding, aad) — no iv
      // argument (CBC/GCM ivs are read from the ciphertext prefix)
      builtin("aes_decrypt")(
        if (es.size >= 5) base :+ es(4) else base) }
  )

  // ---- kernels: consistent hashing, space-filling curves, CIDR ----

  private def si(ret: DataType, method: String, args: Seq[Expression],
      ins: Seq[DataType]): Expression =
    StaticInvoke(ChNumHelpers.getClass, ret, method, args,
      inputTypes = ins)

  private def kernelAliases: Seq[(String, Builder)] = Seq(
    "jumpConsistentHash" -> { es =>
      si(IntegerType, "jumpConsistentHash",
        Seq(Cast(es(0), LongType), Cast(es(1), IntegerType)),
        Seq(LongType, IntegerType)) },
    "mortonEncode" -> { es =>
      require(es.size == 2, "mortonEncode(x, y): the 2-D form")
      si(LongType, "mortonEncode",
        es.map(Cast(_, LongType)), Seq(LongType, LongType)) },
    "mortonDecode" -> { es =>
      require(litInt(es(0), "mortonDecode", "tuple size") == 2,
        "mortonDecode(2, code): the 2-D form")
      val c = Cast(es(1), LongType)
      tupleOf(Seq(
        si(LongType, "mortonDecodeX", Seq(c), Seq(LongType)),
        si(LongType, "mortonDecodeY", Seq(c), Seq(LongType)))) },
    "hilbertEncode" -> { es =>
      require(es.size == 2, "hilbertEncode(x, y): the 2-D form")
      si(LongType, "hilbertEncode",
        es.map(Cast(_, LongType)), Seq(LongType, LongType)) },
    "hilbertDecode" -> { es =>
      require(litInt(es(0), "hilbertDecode", "tuple size") == 2,
        "hilbertDecode(2, code): the 2-D form")
      val c = Cast(es(1), LongType)
      tupleOf(Seq(
        si(LongType, "hilbertDecodeX", Seq(c), Seq(LongType)),
        si(LongType, "hilbertDecodeY", Seq(c), Seq(LongType)))) },
    "isIPAddressInRange" -> { es =>
      si(BooleanType, "isIPAddressInRange",
        Seq(Cast(es(0), StringType), Cast(es(1), StringType)),
        Seq(StringType, StringType)) },
    // internal name behind Text.compressionRatio (t19) — deflate
    // byte count as a codegen'd static call
    "graftCompressedSize" -> { es =>
      StaticInvoke(ChStrHelpers.getClass, IntegerType, "deflateSize",
        Seq(Cast(es.head, StringType)), inputTypes = Seq(StringType)) },
    // internal name behind FORMAT Template/TSV input unescaping — a
    // single-pass scanner (replace chains are order-sensitive on \\n)
    "graftUnescapeEscaped" -> { es =>
      StaticInvoke(ChStrHelpers.getClass, StringType, "unescapeEscaped",
        Seq(Cast(es.head, StringType)), inputTypes = Seq(StringType)) },
    "kostikConsistentHash" -> { _ =>
      throw new UnsupportedOperationException(
        "kostikConsistentHash() is specified only by its C++ " +
          "implementation; use jumpConsistentHash(key, buckets)") },
    // ---- time-series family (CH series*, public docs) ----
    "seriesOutliersDetectTukey" -> { es =>
      require(es.size == 1 || es.size == 4,
        "seriesOutliersDetectTukey(series[, min_percentile, max_percentile, k])")
      val quantArgs =
        if (es.size == 4) es.tail.map(Cast(_, DoubleType))
        else Seq[Expression](Literal(0.25d), Literal(0.75d), Literal(1.5d))
      StaticInvoke(ChNumHelpers.getClass, ArrayType(DoubleType),
        "seriesOutliersTukey",
        Cast(es.head, ArrayType(DoubleType)) +: quantArgs,
        inputTypes = Seq(ArrayType(DoubleType), DoubleType, DoubleType,
          DoubleType)) },
    "seriesPeriodDetectFFT" -> { es =>
      StaticInvoke(ChNumHelpers.getClass, DoubleType, "seriesPeriodDetect",
        Seq(Cast(es.head, ArrayType(DoubleType))),
        inputTypes = Seq(ArrayType(DoubleType))) },
    // seriesDecomposeSTL(series, period) → [seasonal, trend, residue,
    // baseline]: deterministic classical decomposition standing in
    // for LOESS-STL (kernel doc: ChNumHelpers.seriesDecomposeSTL)
    "seriesDecomposeSTL" -> { es =>
      require(es.size == 2, "seriesDecomposeSTL(series, period)")
      StaticInvoke(ChNumHelpers.getClass, ArrayType(ArrayType(DoubleType)),
        "seriesDecomposeSTL",
        Seq(Cast(es.head, ArrayType(DoubleType)), Cast(es(1), IntegerType)),
        inputTypes = Seq(ArrayType(DoubleType), IntegerType)) }
  )

  // ---- CH's value-mapping transform(x, from, to[, default]).
  //      The name collides with Spark's transform HOF, so ChSql
  //      rewrites lambda-less transform() calls to this internal
  //      name. ----

  private def transformValue: Builder = { es =>
    require(es.size == 3 || es.size == 4,
      "transform(x, array_from, array_to[, default])")
    val idx = builtin("array_position")(Seq(es(1), es(0)))
    val hit = builtin("element_at")(
      Seq(es(2), Cast(idx, IntegerType)))
    val miss = if (es.size == 4) es(3) else es(0)
    If(GreaterThan(idx, Literal(0L)), hit, miss)
  }

  /** Aggregate-surface extras (ChStats3) + stable-spelling aliases
    * (the *Stable names promise an implementation detail — summation
    * order — that Spark's own aggregates already meet). */
  private def aggAliases: Seq[(String, Builder)] = Seq(
    "analysisOfVariance" -> { es => ChStats3.anova(es(0), es(1)) },
    "anova" -> { es => ChStats3.anova(es(0), es(1)) },
    "singleValueOrNull" -> { es => ChStats3.singleValueOrNull(es.head) },
    "groupConcat" -> { es => ChStats3.groupConcat(es) },
    "skewSamp" -> { es => ChStats3.skewSamp(es.head) },
    "kurtSamp" -> { es => ChStats3.kurtSamp(es.head) },
    "sumMapFiltered" -> { es => ChStats3.sumMapFiltered(es) },
    "quantileGK" -> { es => ChStats3.quantileGK(es) },
    "quantileBFloat16" -> { es => ChStats3.quantileBFloat16(es) },
    "sumResample" -> { es => ChStats3.resample("sum", es) },
    "countResample" -> { es => ChStats3.resample("count", es) },
    "avgResample" -> { es => ChStats3.resample("avg", es) },
    "minResample" -> { es => ChStats3.resample("min", es) },
    "maxResample" -> { es => ChStats3.resample("max", es) },
    "uniqResample" -> { es => ChStats3.resample("uniq", es) },
    "uniqExactResample" -> { es => ChStats3.resample("uniq", es) },
    "corrStable" -> { es => builtin("corr")(es) },
    "covarPopStable" -> { es => builtin("covar_pop")(es) },
    "covarSampStable" -> { es => builtin("covar_samp")(es) }
  )

  /** CH's `format('{} and {}', a, b)` (also positional `{0}`) → Spark
    * format_string; the literal format converts at build time. */
  private def chFormat(es: Seq[Expression]): Expression = {
    val fmt = litStr(es.head, "format", "format string")
    val out = new StringBuilder
    var i = 0
    var auto = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '{') {
        val close = fmt.indexOf('}', i)
        require(close > 0, s"format: unbalanced '{' in '$fmt'")
        val body = fmt.substring(i + 1, close)
        if (body.isEmpty) { out.append("%s"); auto += 1 }
        else out.append(s"%${body.toInt + 1}$$s")
        i = close + 1
      } else if (c == '%') { out.append("%%"); i += 1 }
      else { out.append(c); i += 1 }
    }
    builtin("format_string")(
      Literal(out.toString) +: es.tail.map(e => Cast(e, StringType)))
  }

  /** Closed-form scalar extras: erf/erfc (A&S 7.1.26, the ChStats
    * polynomial, odd-extended), Lanczos lgamma/tgamma kernels, exact
    * integer powers, engine introspection, typed-default lookup. */
  private def miscAliases: Seq[(String, Builder)] = {
    def erfcPos(x: Expression): Expression = {
      val u = Divide(Literal(1.0),
        Add(Literal(1.0), Multiply(Literal(0.3275911), x)))
      Multiply(
        Multiply(u, Add(Literal(0.254829592), Multiply(u,
          Add(Literal(-0.284496736), Multiply(u, Add(Literal(1.421413741),
            Multiply(u, Add(Literal(-1.453152027),
              Multiply(u, Literal(1.061405429)))))))))),
        builtin("exp")(Seq(UnaryMinus(Multiply(x, x)))))
    }
    def erfcOf(e: Expression): Expression = {
      val x = Cast(e, DoubleType)
      val ax = builtin("abs")(Seq(x))
      // erfc(-x) = 2 − erfc(x)
      If(GreaterThanOrEqual(x, Literal(0.0)), erfcPos(ax),
        Subtract(Literal(2.0), erfcPos(ax)))
    }
    def gammaKernel(method: String): Builder = { es =>
      StaticInvoke(ChNumHelpers.getClass, DoubleType, method,
        Seq(Cast(es.head, DoubleType)), inputTypes = Seq(DoubleType))
    }
    Seq(
      "format" -> (chFormat _),
      "erf" -> { es => Subtract(Literal(1.0), erfcOf(es.head)) },
      "erfc" -> { es => erfcOf(es.head) },
      "lgamma" -> gammaKernel("lgammaOf"),
      "tgamma" -> gammaKernel("tgammaOf"),
      "intExp2" -> { es =>
        builtin("shiftleft")(Seq(Literal(1L), Cast(es.head, IntegerType))) },
      "intExp10" -> { es =>
        Cast(builtin("power")(Seq(Literal(10.0),
          Cast(es.head, DoubleType))), LongType) },
      "identity" -> { es => es.head },
      "ignore" -> { _ => Literal(0) },
      "concatAssumeInjective" -> { es => builtin("concat")(es) },
      // accurateCast(x, 'T'): CH throws when the value doesn't fit the
      // target exactly (vs CAST's wrap/saturate); realized as a TRY
      // cast that raises when it nulls a non-null input, PLUS a
      // round-trip check for numeric sources — a lossy-but-castable
      // narrowing (3.5 → Int32, 16777217 → Float32) nulls nothing but
      // CH still throws on it. Both sides compare under decimal(38,10)
      // (exact for every in-range integral and all float/double
      // values down to 10 dp — beyond that a double's excess digits
      // are below any integral/decimal target's resolution anyway).
      // OrNull form = the TRY cast itself.
      "accurateCast" -> { es =>
        val dt = chTypeOf(es(1), "accurateCast")
        val tryC = Cast(es.head, dt, None, EvalMode.TRY)
        val lossless = es.head.dataType match {
          case _: NumericType if dt.isInstanceOf[NumericType] =>
            def dec(e: Expression) =
              Cast(e, DecimalType(38, 10), None, EvalMode.TRY)
            EqualNullSafe(dec(tryC), dec(es.head))
          case _ => Literal(true)
        }
        If(And(IsNotNull(es.head), Or(IsNull(tryC), Not(lossless))),
          Cast(builtin("raise_error")(Seq(
            Literal("accurateCast: value does not fit the target type exactly"))), dt),
          tryC) },
      "accurateCastOrNull" -> { es =>
        Cast(es.head, chTypeOf(es(1), "accurateCastOrNull"), None,
          EvalMode.TRY) },
      "toBool" -> { es => Cast(es.head, BooleanType) },
      // ("hostname" needs no alias: the registry is case-insensitive,
      // so ChDialect3's hostName already resolves it — a second entry
      // here collides and wins/loses by registration order)
      "FQDN" -> { es => ChDialect3.aliases.toMap.apply("fullHostName")(es) },
      // path basename: the segment after the last separator (CH doc
      // semantics; both separators, like the reference's splitter)
      "basename" -> { es =>
        builtin("regexp_extract")(Seq(es.head,
          Literal("([^/\\\\]*)$"), Literal(1))) },
      "visibleWidth" -> { es =>
        Cast(builtin("length")(Seq(Cast(es.head, StringType))), LongType) },
      "sumMapWithOverflow" -> { es => es match {
        case Seq(m) => MapCombineAgg(builtin("map_keys")(Seq(m)),
          builtin("map_values")(Seq(m)), "sum")
        case Seq(k, v) => MapCombineAgg(k, v, "sum")
        case other => throw new IllegalArgumentException(
          s"sumMapWithOverflow(map) or (keys, values), got ${other.size}")
      } },
      "timezone" -> { _ => builtin("current_timezone")(Seq.empty) },
      "serverTimeZone" -> { _ => builtin("current_timezone")(Seq.empty) },
      // CH's toTimeZone re-annotates the SAME instant with a display
      // zone; Spark timestamps are instants without a per-value zone,
      // so the instant-preserving realization is identity
      "toTimeZone" -> { es => es.head },
      "defaultValueOfTypeName" -> { es =>
        litStr(es.head, "defaultValueOfTypeName", "type name")
          .toLowerCase match {
          case t if t.startsWith("int") || t.startsWith("uint") =>
            Literal(0L)
          case t if t.startsWith("float") || t.startsWith("decimal") =>
            Literal(0.0)
          case "string" | "fixedstring" => Literal("")
          case t if t.startsWith("date") => Cast(Literal(0L), DateType)
          case t if t.startsWith("array") =>
            builtin("array_remove")(Seq(CreateArray(Seq(Literal(0))),
              Literal(0)))
          case other => throw new UnsupportedOperationException(
            s"defaultValueOfTypeName: unmapped type '$other'")
        } },
      "toDateTime64" -> { es =>
        // sub-second precision is the y07 truncation ladder's concern;
        // the constructor itself is the timestamp cast (Spark carries
        // microseconds natively — DateTime64(≤6) is lossless)
        Cast(es.head, TimestampType) },
      "now64" -> { _ => builtin("current_timestamp")(Seq.empty) },
      "nowInBlock" -> { _ => builtin("current_timestamp")(Seq.empty) },
      "toStartOfSecond" -> { es =>
        builtin("date_trunc")(Seq(Literal("SECOND"), es.head)) },
      // version() answers the ENGINE's version — here the Spark
      // runtime this library executes on
      "version" -> { _ => Literal(org.apache.spark.SPARK_VERSION) },
      "mid" -> { es => builtin("substring")(es) },
      "countSubstringsCaseInsensitive" -> { es =>
        val h = builtin("lower")(Seq(es.head))
        val n = builtin("lower")(Seq(es(1)))
        Cast(IntegralDivide(
          Subtract(builtin("length")(Seq(h)),
            builtin("length")(Seq(builtin("replace")(Seq(h, n, Literal("")))))),
          builtin("length")(Seq(n))), LongType) },
      "queryID" -> { _ =>
        throw new UnsupportedOperationException(
          "queryID() reads the server's query registry — a library " +
            "engine has none; tag queries with your own literal") },
      "initialQueryID" -> { _ =>
        throw new UnsupportedOperationException(
          "initialQueryID() reads the server's query registry — a " +
            "library engine has none") },
      "runningConcurrency" -> { _ =>
        throw new UnsupportedOperationException(
          "runningConcurrency depends on block arrival order " +
            "(non-deterministic distributed); count overlaps with the " +
            "intervalLengthSum/maxIntersections aggregates instead") },
      "fromUnixTimestamp64Milli" -> { es =>
        builtin("timestamp_millis")(Seq(Cast(es.head, LongType))) },
      "fromUnixTimestamp64Micro" -> { es =>
        builtin("timestamp_micros")(Seq(Cast(es.head, LongType))) },
      "fromUnixTimestamp64Nano" -> { es =>
        builtin("timestamp_micros")(Seq(
          IntegralDivide(Cast(es.head, LongType), Literal(1000L)))) },
      "byteSize" -> { _ =>
        throw new UnsupportedOperationException(
          "byteSize() reports the reference engine's in-memory layout " +
            "— engine-specific; use octet_length() for string bytes") },
      "getSizeOfEnumType" -> { _ =>
        throw new UnsupportedOperationException(
          "getSizeOfEnumType() reads Enum DDL metadata; use " +
            "system.columns / SHOW CREATE TABLE") },
      "sleep" -> { _ =>
        throw new UnsupportedOperationException(
          "sleep() stalls the reference server's pipeline — " +
            "meaningless inside a library engine") },
      "sleepEachRow" -> { _ =>
        throw new UnsupportedOperationException(
          "sleepEachRow() stalls the reference server's pipeline — " +
            "meaningless inside a library engine") },
      "sequenceMatchEvents" -> { es =>
        es.head match {
          case Literal(p: UTF8String, StringType) =>
            ChBehavioral.sequenceMatchEvents(p.toString, es(1), es.drop(2))
          case other => throw new IllegalArgumentException(
            s"sequenceMatchEvents needs a literal pattern first, got $other")
        } }
    )
  }

  def aliases: Seq[(String, Builder)] =
    dateTimeAliases ++ regexAliases ++ tupleAliases ++ arrayAliases ++
      randAliases ++ cryptoAliases ++ kernelAliases ++ aggAliases ++
      miscAliases ++ Seq("chTransformValue" -> transformValue)
}
