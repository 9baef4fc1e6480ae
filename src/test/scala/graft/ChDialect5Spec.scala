package graft

import org.apache.spark.sql.functions._
import graft.functions.{ChDictionaries, ChSql, GraftFunctions}

/** Round-11 registry tail (ChDialect5): typed dictGet spellings, the
  * to*OrNull / to*OrZero conversion family, groupArraySample,
  * translateUTF8 and bitmaskToList/Array. */
class ChDialect5Spec extends SparkSpec {
  import spark.implicits._

  private def sql1(q: String): org.apache.spark.sql.Row = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(q).collect().head
  }

  test("to*OrNull: unparseable → NULL, parseable → value, typed") {
    val r = sql1(
      """SELECT
        |  toInt64OrNull('42') AS a, toInt64OrNull('nope') AS b,
        |  toUInt32OrNull('7') AS c, toInt32OrNull('3.5') AS d,
        |  toFloat64OrNull('2.5') AS e, toFloat64OrNull('x') AS f,
        |  toDateOrNull('2024-03-15') AS g, toDateOrNull('nope') AS h,
        |  toInt8OrNull('120') AS i, toInt8OrNull('999') AS j
        |""".stripMargin)
    assert(r.getAs[Long]("a") == 42L && r.isNullAt(r.fieldIndex("b")))
    assert(r.getAs[Long]("c") == 7L) // UInt32 carrier is BIGINT
    assert(r.isNullAt(r.fieldIndex("d"))) // strict integer parse, like CH
    assert(r.getAs[Double]("e") == 2.5 && r.isNullAt(r.fieldIndex("f")))
    assert(r.getAs[java.sql.Date]("g").toString == "2024-03-15")
    assert(r.isNullAt(r.fieldIndex("h")))
    assert(r.getAs[Byte]("i") == 120.toByte)
    assert(r.isNullAt(r.fieldIndex("j"))) // out of Int8 range → NULL
  }

  test("unsigned Or* edges: above-signed-max parses, out-of-range → NULL") {
    val r = sql1(
      """SELECT
        |  toUInt32OrNull('3000000000') AS a,
        |  toUInt32OrNull('4294967296') AS b,
        |  toUInt64OrNull('-1') AS c,
        |  toUInt64OrNull('18446744073709551615') AS u64max,
        |  toUInt64OrNull('18446744073709551616') AS u64over,
        |  toUInt64OrZero('nope') AS u64z,
        |  toUInt64('9223372036854775808') AS u64plain,
        |  toUInt8OrNull('256') AS d,
        |  toUInt8OrNull('255') AS e,
        |  toUInt16OrNull('65535') AS f,
        |  toUInt8OrZero('300') AS g,
        |  parseReadableSize('1.1 KiB') AS prs,
        |  parseReadableSize('10 EiB') AS prs_over
        |""".stripMargin)
    assert(r.getAs[Long]("a") == 3000000000L) // > Int.MaxValue, in UInt32 range
    assert(r.isNullAt(r.fieldIndex("b")))     // 2^32 out of range
    assert(r.isNullAt(r.fieldIndex("c")))     // negative → NULL
    // DECIMAL(20,0) carrier: the FULL UInt64 range survives
    assert(r.getAs[java.math.BigDecimal]("u64max").toBigInteger.toString
      == "18446744073709551615")
    assert(r.isNullAt(r.fieldIndex("u64over"))) // 2^64 out of range
    assert(r.getAs[java.math.BigDecimal]("u64z").signum == 0)
    assert(r.getAs[java.math.BigDecimal]("u64plain").toBigInteger.toString
      == "9223372036854775808") // 2^63, above Long.MaxValue
    assert(r.isNullAt(r.fieldIndex("d")))     // 256 out of UInt8 range
    assert(r.getAs[Short]("e") == 255)
    assert(r.getAs[Int]("f") == 65535)
    assert(r.getAs[Short]("g") == 0)          // OrZero on out-of-range
    assert(r.getAs[Long]("prs") == 1127L)     // ceil(1.1 * 1024) = 1127
    assert(r.isNullAt(r.fieldIndex("prs_over"))) // > 2^63−1 degrades to NULL
  }

  test("JSON_QUERY wraps matches in a JSON array, strings re-quoted") {
    val r = sql1(
      """SELECT
        |  JSON_QUERY('{"a": {"b": 7}}', '$.a.b') AS num,
        |  JSON_QUERY('{"a": "hello"}', '$.a') AS str,
        |  JSON_QUERY('{"a": {"b": 7}}', '$.a') AS obj,
        |  JSON_QUERY('{"a": [1, 2]}', '$.a') AS arr,
        |  JSON_QUERY('{"a": [10, 20, 30]}', '$.a[1]') AS idx,
        |  JSON_QUERY('{"a": [10, 20]}', '$.a[*]') AS wild,
        |  JSON_QUERY('{"a": 1}', '$.z') AS miss,
        |  JSON_QUERY('not json', '$.a') AS bad
        |""".stripMargin)
    assert(r.getAs[String]("num") == "[7]")
    assert(r.getAs[String]("str") == "[\"hello\"]") // re-quoted, unlike JSON_VALUE
    assert(r.getAs[String]("obj") == "[{\"b\":7}]")
    assert(r.getAs[String]("arr") == "[[1,2]]")
    assert(r.getAs[String]("idx") == "[20]")
    assert(r.getAs[String]("wild") == "[10,20]")
    assert(r.isNullAt(r.fieldIndex("miss")))
    assert(r.isNullAt(r.fieldIndex("bad")))
  }

  test("to*OrZero: unparseable → type default (0 / epoch)") {
    val r = sql1(
      """SELECT
        |  toInt64OrZero('42') AS a, toInt64OrZero('nope') AS b,
        |  toUInt32OrZero('') AS c, toFloat32OrZero('1.5') AS d,
        |  toDateOrZero('nope') AS e, toDateTimeOrZero('nope') AS f
        |""".stripMargin)
    assert(r.getAs[Long]("a") == 42L && r.getAs[Long]("b") == 0L)
    assert(r.getAs[Long]("c") == 0L) // UInt32 carrier is BIGINT
    assert(r.getAs[Float]("d") == 1.5f)
    assert(r.getAs[java.sql.Date]("e").toString == "1970-01-01")
    assert(r.getAs[java.sql.Timestamp]("f").getTime == 0L)
  }

  test("toDecimal*/toUUID/toDate32 OrNull/OrZero variants") {
    val r = sql1(
      """SELECT
        |  toDecimal64OrNull('12.345', 3) AS a, toDecimal64OrNull('x', 3) AS b,
        |  toDecimal32OrZero('nope', 2) AS c, toDecimal128OrZero('1.5', 10) AS d,
        |  toUUIDOrNull('123E4567-e89b-12d3-A456-426614174000') AS u,
        |  toUUIDOrNull('not-a-uuid') AS un,
        |  toUUIDOrZero('nope') AS uz,
        |  toDate32OrNull('2024-02-29') AS g, toDate32OrZero('nope') AS h
        |""".stripMargin)
    assert(r.getAs[java.math.BigDecimal]("a").toPlainString == "12.345")
    assert(r.isNullAt(r.fieldIndex("b")))
    assert(r.getAs[java.math.BigDecimal]("c").toPlainString == "0.00")
    assert(r.getAs[java.math.BigDecimal]("d").toPlainString == "1.5000000000")
    assert(r.getAs[String]("u") == "123e4567-e89b-12d3-a456-426614174000")
    assert(r.isNullAt(r.fieldIndex("un")))
    assert(r.getAs[String]("uz") == "00000000-0000-0000-0000-000000000000")
    assert(r.getAs[java.sql.Date]("g").toString == "2024-02-29")
    assert(r.getAs[java.sql.Date]("h").toString == "1970-01-01")
  }

  test("typed dictGet spellings: cast to the spelled type; OrDefault on miss") {
    GraftFunctions.ensureRegistered(spark)
    val dim = Seq((1L, "one", 10L), (2L, "two", 20L))
      .toDF("k", "name", "weight")
    ChDictionaries.register("d5dim", dim, "k", Seq("name", "weight"))
    val r = sql1(
      """SELECT
        |  dictGetString('d5dim', 'name', 1) AS s,
        |  dictGetInt64('d5dim', 'weight', 2) AS w,
        |  dictGetInt32('d5dim', 'weight', 2) AS w32,
        |  dictGetStringOrDefault('d5dim', 'name', 99, 'none') AS miss,
        |  dictGetInt64OrDefault('d5dim', 'weight', 99, -1) AS missw,
        |  dictGetFloat64('d5dim', 'weight', 1) AS f
        |""".stripMargin)
    assert(r.getAs[String]("s") == "one")
    assert(r.getAs[Long]("w") == 20L)
    assert(r.getAs[Int]("w32") == 20) // Int32 spelling narrows
    assert(r.getAs[String]("miss") == "none")
    assert(r.getAs[Long]("missw") == -1L)
    assert(r.getAs[Double]("f") == 10.0)
  }

  test("bitmaskToList/Array: ascending powers of two; 0 → empty") {
    val r = sql1(
      """SELECT bitmaskToList(50) AS l, bitmaskToArray(50) AS a,
        |  bitmaskToList(0) AS z, bitmaskToList(1) AS one
        |""".stripMargin)
    assert(r.getAs[String]("l") == "2,16,32")
    assert(r.getAs[scala.collection.Seq[Long]]("a").toSeq == Seq(2L, 16L, 32L))
    assert(r.getAs[String]("z") == "")
    assert(r.getAs[String]("one") == "1")
  }

  test("translateUTF8 maps codepoints like translate") {
    val r = sql1("SELECT translateUTF8('HELLO', 'EL', 'ip') AS t")
    assert(r.getAs[String]("t") == "HippO")
  }

  test("r11 probe-tail: datetime, array, string, map names") {
    val r = sql1(
      """SELECT
        |  addQuarters(DATE '2024-01-15', 2) AS aq,
        |  subtractQuarters(DATE '2024-01-15', 1) AS sq,
        |  dateTrunc('month', TIMESTAMP '2024-03-15 13:45:00') AS dt,
        |  dateSub('hour', 2, TIMESTAMP '2024-03-15 13:45:00') AS ds,
        |  age('year', TIMESTAMP '2021-06-01 00:00:00',
        |      TIMESTAMP '2024-03-15 00:00:00') AS ag,
        |  age('day', TIMESTAMP '2024-03-14 23:00:00',
        |      TIMESTAMP '2024-03-15 22:59:00') AS agd,
        |  arrayUnion(array(1, 2), array(2, 3), array(4)) AS au,
        |  arraySymmetricDifference(array(1, 2, 3), array(2, 3, 4)) AS asd,
        |  substringIndex('a.b.c', '.', 2) AS sidx,
        |  firstLine('line one
        |rest') AS fl,
        |  levenshteinDistance('kitten', 'sitting') AS lev,
        |  damerauLevenshteinDistance('ab', 'ba') AS dl,
        |  damerauLevenshteinDistance('ca', 'abc') AS dl2,
        |  byteHammingDistance('karolin', 'kathrin') AS bh,
        |  byteHammingDistance('abc', 'abcde') AS bh2,
        |  mapExists((k, v) -> v > 1, map('a', 1, 'b', 2)) AS me,
        |  mapAll((k, v) -> v > 0, map('a', 1, 'b', 2)) AS ma,
        |  map_keys(mapSort(map('b', 2, 'a', 1))) AS ms
        |""".stripMargin)
    assert(r.getAs[java.sql.Date]("aq").toString == "2024-07-15")
    assert(r.getAs[java.sql.Date]("sq").toString == "2023-10-15")
    assert(r.getAs[java.sql.Timestamp]("dt").toString.startsWith("2024-03-01"))
    assert(r.getAs[java.sql.Timestamp]("ds").toString.startsWith("2024-03-15 11:45"))
    assert(r.getAs[Long]("ag") == 2L)   // complete years only
    assert(r.getAs[Long]("agd") == 0L)  // 23h59m < a complete day
    assert(r.getAs[scala.collection.Seq[Int]]("au").toSet == Set(1, 2, 3, 4))
    assert(r.getAs[scala.collection.Seq[Int]]("asd").toSet == Set(1, 4))
    assert(r.getAs[String]("sidx") == "a.b")
    assert(r.getAs[String]("fl") == "line one")
    assert(r.getAs[Int]("lev") == 3)
    assert(r.getAs[Int]("dl") == 1)  // one transposition
    assert(r.getAs[Int]("dl2") == 3) // OSA's classic ca→abc case
    assert(r.getAs[Int]("bh") == 3)
    assert(r.getAs[Int]("bh2") == 2) // length difference counts
    assert(r.getAs[Boolean]("me") && r.getAs[Boolean]("ma"))
    assert(r.getAs[scala.collection.Seq[String]]("ms").toSeq == Seq("a", "b"))
  }

  test("r11 probe-tail 2: exact-quantile variants, groupArrayIntersect, misc") {
    GraftFunctions.ensureRegistered(spark)
    (1 to 10).map(i => (1, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("d5q")
    val q = spark.sql(ChSql.translate(
      """SELECT
        |  quantileExactInclusive(0.25)(v) AS qi,
        |  quantileExactExclusive(0.25)(v) AS qe,
        |  quantilesExactExclusive(0.25, 0.5)(v) AS qs
        |FROM d5q GROUP BY g""".stripMargin)).collect().head
    // Hyndman-Fan on 1..10: type 7 at .25 → 3.25; type 6 → 2.75
    assert(math.abs(q.getDouble(0) - 3.25) < 1e-12)
    assert(math.abs(q.getDouble(1) - 2.75) < 1e-12)
    val qs = q.getAs[scala.collection.Seq[Double]]("qs")
    assert(math.abs(qs(0) - 2.75) < 1e-12 && math.abs(qs(1) - 5.5) < 1e-12)

    Seq((1, Seq(1, 2, 3)), (1, Seq(2, 3, 4)), (1, Seq(3, 2, 9)))
      .toDF("g", "a").createOrReplaceTempView("d5i")
    val gi = sql1("SELECT groupArrayIntersect(a) AS i FROM d5i GROUP BY g")
    assert(gi.getAs[scala.collection.Seq[Int]]("i").toSeq == Seq(2, 3))

    val r = sql1(
      """SELECT
        |  JSONArrayLength('[1, 2, 3]') AS jal,
        |  parseReadableSize('1.5 MiB') AS prs,
        |  parseReadableSize('2 KB') AS prs2,
        |  formatDateTimeInJodaSyntax(TIMESTAMP '2024-03-15 13:45:00',
        |    'yyyy-MM-dd HH:mm') AS joda,
        |  snowflakeToDateTime(dateTimeToSnowflakeID(
        |    TIMESTAMP '2024-03-15 13:45:00')) AS snow_rt,
        |  isZeroOrNull(0) AS z1, isZeroOrNull(NULL) AS z2,
        |  isZeroOrNull(7) AS z3,
        |  throwIf(false, 'nope') AS ti
        |""".stripMargin)
    assert(r.getAs[Number]("jal").intValue == 3)
    assert(r.getAs[Long]("prs") == 1572864L)
    assert(r.getAs[Long]("prs2") == 2000L)
    assert(r.getAs[String]("joda") == "2024-03-15 13:45")
    assert(r.getAs[java.sql.Timestamp]("snow_rt").toString
      .startsWith("2024-03-15 13:45:00"))
    assert(r.getAs[Boolean]("z1") && r.getAs[Boolean]("z2") && !r.getAs[Boolean]("z3"))
    assert(r.getAs[Int]("ti") == 0)
    val err = intercept[Exception] {
      sql1("SELECT throwIf(true, 'boom') AS x")
    }
    assert(err.getMessage.contains("boom"))
  }

  test("r11 probe-tail 3: window respect-nulls, URL tail, math one-liners") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    Seq((1, 1, Option.empty[Int]), (1, 2, Some(5)), (1, 3, Option.empty[Int]))
      .toDF("g", "k", "v").createOrReplaceTempView("d5w")
    val w = spark.sql(
      """SELECT firstValueRespectNulls(v) OVER (ORDER BY k) AS f,
        |  lastValueRespectNulls(v) OVER
        |    (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
        |     AND UNBOUNDED FOLLOWING) AS l
        |FROM d5w ORDER BY k""".stripMargin).collect()
    assert(w.head.isNullAt(0) && w.head.isNullAt(1)) // NULLs respected
    val r = sql1(
      """SELECT
        |  cutURLParameter('http://x.com/p?a=1&b=2&c=3', 'b') AS c1,
        |  cutURLParameter('http://x.com/p?a=1&b=2', 'a') AS c2,
        |  cutURLParameter('http://x.com/p?a=1', 'a') AS c3,
        |  decodeURLFormComponent('a+b%21') AS dec,
        |  port('http://x.com:8123/path') AS p1,
        |  port('http://x.com/path') AS p2,
        |  port('http://x.com/path', 80) AS p3,
        |  queryStringAndFragment('http://x.com/p?a=1#frag') AS qf,
        |  ROUND(sigmoid(0.0), 6) AS sg,
        |  ROUND(logit(0.5), 6) AS lg,
        |  positiveModulo(-7, 3) AS pm,
        |  negativeModulo(-7, 3) AS nm,
        |  nanToNull(CAST('nan' AS DOUBLE)) AS nn,
        |  nanToNull(2.5) AS nn2
        |""".stripMargin)
    assert(r.getAs[String]("c1") == "http://x.com/p?a=1&c=3")
    assert(r.getAs[String]("c2") == "http://x.com/p?b=2")
    assert(r.getAs[String]("c3") == "http://x.com/p")
    assert(r.getAs[String]("dec") == "a b!")
    assert(r.getAs[Int]("p1") == 8123 && r.getAs[Int]("p2") == 0 &&
      r.getAs[Int]("p3") == 80)
    assert(r.getAs[String]("qf") == "a=1#frag")
    assert(r.getAs[Double]("sg") == 0.5)
    assert(r.getAs[Double]("lg") == 0.0)
    assert(r.getAs[Int]("pm") == 2)
    assert(r.getAs[Int]("nm") == -1)
    assert(r.isNullAt(r.fieldIndex("nn")) && r.getAs[Double]("nn2") == 2.5)
  }

  test("r11 probe-tail 4: URL-safe base64, SQL/JSON trio, misc") {
    val r = sql1(
      """SELECT
        |  base64URLEncode('ab?cd>e') AS b64u,
        |  CAST(base64URLDecode(base64URLEncode('ab?cd>e')) AS STRING) AS rt,
        |  notILike('Hello', '%WORLD%') AS nil,
        |  startsWithUTF8('héllo', 'hé') AS sw,
        |  endsWithUTF8('héllo', 'lo') AS ew,
        |  isValidJSON('{"a": 1}') AS vj, isValidJSON('nope') AS ivj,
        |  JSON_VALUE('{"a": {"b": 7}}', '$.a.b') AS jv,
        |  JSON_EXISTS('{"a": 1}', '$.a') AS je,
        |  JSON_EXISTS('{"a": 1}', '$.z') AS jne,
        |  multiMatchAny('abcdef', array('x{2}', 'cd.f')) AS mma,
        |  multiMatchAny('abcdef', array('x{2}', 'zz')) AS mmn,
        |  toMillisecond(TIMESTAMP '2024-03-15 13:45:00.123') AS tms,
        |  timeDiff(TIMESTAMP '2024-03-15 13:45:00',
        |           TIMESTAMP '2024-03-15 13:46:30') AS td
        |""".stripMargin)
    assert(!r.getAs[String]("b64u").exists(c => c == '+' || c == '/' || c == '='))
    assert(r.getAs[String]("rt") == "ab?cd>e")
    assert(r.getAs[Boolean]("nil")) // Hello ILIKE %WORLD% is false → notILike true
    assert(r.getAs[Boolean]("sw") && r.getAs[Boolean]("ew"))
    assert(r.getAs[Boolean]("vj") && !r.getAs[Boolean]("ivj"))
    assert(r.getAs[String]("jv") == "7")
    assert(r.getAs[Boolean]("je") && !r.getAs[Boolean]("jne"))
    assert(r.getAs[Int]("mma") == 1 && r.getAs[Int]("mmn") == 0)
    assert(r.getAs[Int]("tms") == 123)
    assert(r.getAs[Long]("td") == 90L)
  }

  test("groupArraySample: deterministic, ≤ max_size, subset; seed changes pick") {
    GraftFunctions.ensureRegistered(spark)
    val df = (1 to 50).map(i => (i % 3, i.toLong)).toDF("g", "v")
    df.createOrReplaceTempView("d5s")
    def run(seed: Int): Map[Int, Seq[Long]] =
      spark.sql(ChSql.translate(
        s"SELECT g, groupArraySample(4, $seed)(v) AS s FROM d5s GROUP BY g"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val a = run(7)
    val b = run(7)
    assert(a == b, "same seed must reproduce the same sample")
    a.foreach { case (g, s) =>
      assert(s.size == 4)
      assert(s.forall(v => v % 3 == g), "sample must come from the group")
      assert(s.distinct.size == s.size)
    }
    val c = run(8)
    assert(a != c, "a different seed should (here) pick differently")
    // max_size larger than the group → the whole group, hash-ordered
    val all = spark.sql(ChSql.translate(
      "SELECT g, groupArraySample(100, 7)(v) AS s FROM d5s GROUP BY g"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(all.values.map(_.size).toSet == Set(17, 16))
  }
}
