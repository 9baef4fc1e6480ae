package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse-compatible function surface, mapped to Spark's
  * codegen'd built-ins (never UDFs). Names follow the reference's
  * function registry (reference: src/Functions/IFunction.h — the
  * factory the parser resolves ASTFunction names against).
  *
  * Only thin aliases live here; anything needing real logic gets its
  * own operator or a native Catalyst Expression (see SimHash64).
  */
object Ch {
  // ---- conditional (ClickHouse if/multiIf) ----
  def chIf(cond: Column, t: Column, f: Column): Column = when(cond, t).otherwise(f)
  def multiIf(pairs: (Column, Column)*)(default: Column): Column =
    pairs.foldRight(default) { case ((c, v), acc) => when(c, v).otherwise(acc) }
  def ifNull(x: Column, alt: Column): Column  = coalesce(x, alt)
  def nullIf(x: Column, y: Column): Column    = when(x === y, lit(null)).otherwise(x)

  // ---- arithmetic ----
  /** Exact integer division (CH intDiv = C++ `/` on integers). Goes
    * through Catalyst's IntegralDivide — no double round-trip, so it
    * is correct for |values| > 2^53 where `(a / b).cast("long")` is not. */
  def intDiv(a: Column, b: Column): Column  =
    call_function("div", a.cast("long"), b.cast("long"))
  def modulo(a: Column, b: Column): Column  = a % b
  def plus(a: Column, b: Column): Column    = a + b
  def minus(a: Column, b: Column): Column   = a - b
  def negate(a: Column): Column             = -a

  // ---- strings ----
  def lengthUTF8(s: Column): Column               = length(s)
  def lowerUTF8(s: Column): Column                = lower(s)
  def upperUTF8(s: Column): Column                = upper(s)
  def substringUTF8(s: Column, p: Int, l: Int): Column = substring(s, p, l)
  def position(h: Column, n: String): Column      = instr(h, n) // 1-based, 0 if absent
  def replaceAll(s: Column, f: String, t: String): Column = regexp_replace(s, java.util.regex.Pattern.quote(f), t)
  def startsWith(s: Column, p: String): Column    = s.startsWith(p)
  def endsWith(s: Column, p: String): Column      = s.endsWith(p)
  def trimBoth(s: Column): Column                 = trim(s)
  def reverseStr(s: Column): Column               = reverse(s)
  def concatStr(cs: Column*): Column              = concat(cs: _*)
  def splitByChar(sep: String, s: Column): Column = split(s, java.util.regex.Pattern.quote(sep))
  def chLike(s: Column, pat: String): Column      = s.like(pat)
  def chMatch(s: Column, re: String): Column      = s.rlike(re)

  // ---- dates & times (reference: src/DataTypes/DataTypeDateTime.h) ----
  def toYear(d: Column): Column         = year(d)
  def toMonth(d: Column): Column        = month(d)
  def toDayOfMonth(d: Column): Column   = dayofmonth(d)
  /** ClickHouse toDayOfWeek is ISO: 1=Monday..7=Sunday (Spark's
    * dayofweek is 1=Sunday). weekday() is 0=Monday, so +1. */
  def toDayOfWeek(d: Column): Column    = weekday(d) + lit(1)
  def toHour(d: Column): Column         = hour(d)
  def toStartOfMonth(d: Column): Column = date_trunc("month", d)
  def toStartOfDay(d: Column): Column   = date_trunc("day", d)
  def toDate(d: Column): Column         = to_date(d)
  def addDays(d: Column, n: Int): Column = date_add(d, n)
  def dateDiffDays(a: Column, b: Column): Column = datediff(a, b)

  // ---- type conversion (reference: src/DataTypes/DataTypeFactory.cpp) ----
  // DECIMAL(20,0): the one carrier holding the full UInt64 range
  def toUInt64(c: Column): Column  = c.cast("decimal(20,0)")
  def toInt32(c: Column): Column   = c.cast("int")
  def toFloat64(c: Column): Column = c.cast("double")
  def toStringCh(c: Column): Column = c.cast("string")
  def toDecimal(c: Column, p: Int, s: Int): Column = c.cast(s"decimal($p,$s)")

  // ---- hashing ----
  def md5Hex(c: Column): Column    = md5(c)
  def sha256Hex(c: Column): Column = sha2(c, 256)
  def xxHash(cs: Column*): Column  = xxhash64(cs: _*) // CH cityHash64 analog (not byte-compatible)

  // ---- JSON (reference ClickHouse JSONExtract*) ----
  def jsonExtractString(j: Column, path: String): Column = get_json_object(j, s"$$.$path")
  def jsonExtractInt(j: Column, path: String): Column    = get_json_object(j, s"$$.$path").cast("long")
  def jsonExtractFloat(j: Column, path: String): Column  = get_json_object(j, s"$$.$path").cast("double")

  // ---- arrays (reference: src/DataTypes/DataTypeArray.h); all higher-order
  //      forms stay inside codegen ----
  def has(arr: Column, v: Column): Column        = array_contains(arr, v)
  def indexOf(arr: Column, v: Column): Column    = array_position(arr, v)
  def arrayMap(arr: Column, f: Column => Column): Column    = transform(arr, f)
  def arrayFilter(arr: Column, f: Column => Column): Column = filter(arr, f)
  def arraySum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))
  def arrayAvg(arr: Column): Column = arraySum(arr) / size(arr)
  def arrayDistinct(arr: Column): Column = array_distinct(arr)
  def arraySort(arr: Column): Column     = sort_array(arr)

  // ---- aggregate-function analogs (used via .agg) ----
  def argMax(value: Column, by: Column): Column = max_by(value, by)
  def argMin(value: Column, by: Column): Column = min_by(value, by)
  def uniqExact(c: Column): Column  = countDistinct(c)
  def uniq(c: Column): Column       = approx_count_distinct(c, 0.01)
  /** CH quantile (interpolated, like quantile_cont). */
  def quantile(c: Column, q: Double): Column = percentile(c, lit(q))
  /** CH quantileExact returns an ACTUAL element of the input (not an
    * interpolation); percentile_approx at max accuracy does exactly
    * that — the smallest element at/after rank q·n. */
  def quantileExact(c: Column, q: Double): Column =
    percentile_approx(c, lit(q), lit(Int.MaxValue))
  def groupArraySorted(c: Column): Column = sort_array(collect_list(c))
  def countIf(cond: Column): Column = count(when(cond, 1))
  def sumIf(c: Column, cond: Column): Column = sum(when(cond, c).otherwise(lit(0)))

  // ---- URL functions (ClickHouse URL family) ----
  def domain(url: Column): Column      = parse_url(url, lit("HOST"))
  def pathOnly(url: Column): Column    = parse_url(url, lit("PATH"))
  def queryString(url: Column): Column = parse_url(url, lit("QUERY"))
  def protocol(url: Column): Column    = regexp_extract(url, "^([a-z]+)://", 1)

  // ---- geo (ClickHouse greatCircleDistance) ----
  /** Haversine distance in meters, ClickHouse's mean-Earth radius. */
  def greatCircleDistance(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val r = lit(6372797.560856)
    val dlat = radians(lat2) - radians(lat1)
    val dlon = radians(lon2) - radians(lon1)
    val a = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    lit(2) * r * asin(sqrt(a))
  }

  // ---- embeddings / vectors ----
  /** Dot product of two float arrays — zip_with + aggregate keeps this
    * in whole-stage codegen; no UDF. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
