package graft

import graft.functions.GraftFunctions

/** Round-10 dialect widening (ChDialect2): every new name resolves
  * through spark.sql and produces the documented semantics. */
class ChDialect2Spec extends SparkSpec {

  private def row(q: String): org.apache.spark.sql.Row = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT " + q).collect().head
  }
  private def one[T](q: String): T = row(q + " AS v").getAs[T]("v")

  test("date/time: toTime, timeSlots, relative nums, dateName, add/subtract") {
    val r = row(
      """toTime(TIMESTAMP '2024-03-15 13:45:10') AS tt,
        |size(timeSlots(TIMESTAMP '2024-01-01 00:10:00', 1800)) AS ts,
        |toRelativeDayNum(DATE '1970-01-11') AS rd,
        |toRelativeMonthNum(DATE '1970-03-01') AS rm,
        |dateName('month', DATE '2024-03-15') AS dn,
        |dateName('weekday', DATE '2024-03-15') AS dw,
        |addHours(TIMESTAMP '2024-03-15 10:00:00', 3) AS ah,
        |subtractMonths(DATE '2024-03-15', 1) AS sm,
        |addWeeks(DATE '2024-03-01', 2) AS aw,
        |toStartOfFiveMinutes(TIMESTAMP '2024-03-15 13:42:10') AS s5
        |""".stripMargin)
    assert(r.getAs[java.sql.Timestamp]("tt").toString
      .startsWith("1970-01-02 13:45:10"))
    assert(r.getAs[Int]("ts") == 2) // [00:10, 00:40] touches 00:00 and 00:30
    assert(r.getAs[Int]("rd") == 10)
    assert(r.getAs[Int]("rm") == 1970 * 12 + 3)
    assert(r.getAs[String]("dn") == "March")
    assert(r.getAs[String]("dw") == "Friday")
    assert(r.getAs[java.sql.Timestamp]("ah").toString
      .startsWith("2024-03-15 13:00:00"))
    assert(r.getAs[java.sql.Date]("sm").toString == "2024-02-15")
    assert(r.getAs[java.sql.Date]("aw").toString == "2024-03-15")
    assert(r.getAs[java.sql.Timestamp]("s5").toString
      .startsWith("2024-03-15 13:40:00"))
  }

  test("URL family: cuts, hierarchy, significant subdomain, params") {
    val u = "'https://user:pw@news.yandex.com.tr:443/sport/f1?q=1&lang=tr#frag'"
    val r = row(
      s"""topLevelDomain($u) AS tld,
         |domainWithoutWWW('https://www.example.com/x') AS dw,
         |cutQueryString($u) AS cq,
         |cutFragment($u) AS cf,
         |cutQueryStringAndFragment($u) AS cqf,
         |cutWWW('https://www.example.com/x') AS cw,
         |pathFull($u) AS pf,
         |fragment($u) AS fr,
         |netloc($u) AS nl,
         |firstSignificantSubdomain($u) AS fss,
         |cutToFirstSignificantSubdomain($u) AS cfss,
         |URLHierarchy('https://example.com/browse/conf/math') AS uh,
         |URLPathHierarchy('https://example.com/browse/conf/math') AS uph,
         |extractURLParameters($u) AS ps,
         |extractURLParameterNames($u) AS pn,
         |encodeURLComponent('a b') AS enc,
         |decodeURLComponent('a%20b') AS dec
         |""".stripMargin)
    assert(r.getAs[String]("tld") == "tr")
    assert(r.getAs[String]("dw") == "example.com")
    assert(r.getAs[String]("cq")
      == "https://user:pw@news.yandex.com.tr:443/sport/f1")
    assert(r.getAs[String]("cf").endsWith("?q=1&lang=tr"))
    assert(r.getAs[String]("cqf")
      == "https://user:pw@news.yandex.com.tr:443/sport/f1")
    assert(r.getAs[String]("cw") == "https://example.com/x")
    assert(r.getAs[String]("pf") == "/sport/f1?q=1&lang=tr")
    assert(r.getAs[String]("fr") == "frag")
    assert(r.getAs[String]("nl") == "user:pw@news.yandex.com.tr:443")
    assert(r.getAs[String]("fss") == "yandex")
    assert(r.getAs[String]("cfss") == "yandex.com.tr")
    assert(r.getSeq[String](r.fieldIndex("uh")) == Seq(
      "https://example.com/", "https://example.com/browse/",
      "https://example.com/browse/conf/",
      "https://example.com/browse/conf/math"))
    assert(r.getSeq[String](r.fieldIndex("uph")) == Seq(
      "/browse/", "/browse/conf/", "/browse/conf/math"))
    assert(r.getSeq[String](r.fieldIndex("ps")) == Seq("q=1", "lang=tr"))
    assert(r.getSeq[String](r.fieldIndex("pn")) == Seq("q", "lang"))
    assert(r.getAs[String]("enc") == "a%20b")
    assert(r.getAs[String]("dec") == "a b")
  }

  test("strings: tokens, matches, jaccard, quote-meta, first-only replace") {
    val r = row(
      """countMatches('a1b22c333', '[0-9]+') AS cm,
        |alphaTokens('ab.cd, ef') AS at,
        |hasToken('the quick fox', 'quick') AS ht,
        |hasToken('the quickest fox', 'quick') AS ht2,
        |hasTokenCaseInsensitive('The QUICK fox', 'quick') AS ht3,
        |stringJaccardIndex('abc', 'bcd') AS sj,
        |editDistance('kitten', 'sitting') AS ed,
        |regexpQuoteMeta('a.b*c') AS qm,
        |replaceRegexpOne('Hello World', 'o', '0') AS r1,
        |replaceRegexpOne('2024-03-15', '(\\d+)-(\\d+)', '\\2/\\1') AS r2,
        |extractGroups('2024-03', '(\\d+)-(\\d+)') AS eg,
        |countDigits(12345) AS cd,
        |toDecimalString(3.14159, 3) AS tds,
        |leftPadUTF8('7', 3, '0') AS lp,
        |initcapUTF8('hello world') AS ic,
        |widthBucket(5.35, 0.0, 10.0, 5) AS wb,
        |isValidUTF8('hello') AS iv,
        |isValidUTF8(X'FF') AS iv2,
        |tryBase64Decode('YWJj') AS b1,
        |tryBase64Decode('%%%') AS b2,
        |unbin('0100100001101001') AS ub
        |""".stripMargin)
    assert(r.getAs[Int]("cm") == 3)
    assert(r.getSeq[String](r.fieldIndex("at")) == Seq("ab", "cd", "ef"))
    assert(r.getAs[Boolean]("ht"))
    assert(!r.getAs[Boolean]("ht2"))
    assert(r.getAs[Boolean]("ht3"))
    assert(math.abs(r.getAs[Double]("sj") - 0.5) < 1e-12)
    assert(r.getAs[Int]("ed") == 3)
    assert(r.getAs[String]("qm") == "a\\.b\\*c")
    assert(r.getAs[String]("r1") == "Hell0 World")
    assert(r.getAs[String]("r2") == "03/2024-15")
    assert(r.getSeq[String](r.fieldIndex("eg")) == Seq("2024", "03"))
    assert(r.getAs[Int]("cd") == 5)
    assert(r.getAs[String]("tds") == "3.142")
    assert(r.getAs[String]("lp") == "007")
    assert(r.getAs[String]("ic") == "Hello World")
    assert(r.getAs[Long]("wb") == 3L)
    assert(r.getAs[Int]("iv") == 1 && r.getAs[Int]("iv2") == 0)
    assert(r.getAs[String]("b1") == "abc")
    assert(r.getAs[String]("b2") == "")
    assert(r.getAs[String]("ub") == "Hi")
  }

  test("hashes: exact halfMD5/javaHash/hiveHash, distinct role aliases") {
    val r = row(
      """halfMD5('x') AS hm,
        |javaHash('abc') AS jh,
        |hiveHash('abc') AS hh,
        |sipHash64('x') AS s64,
        |cityHash64('x') AS c64,
        |farmHash64('x') AS f64,
        |murmurHash3_64('x') AS m64,
        |xxHash32('x') AS x32,
        |length(sipHash128('x')) AS l128,
        |length(murmurHash3_128('x')) AS l128b,
        |bitHammingDistance(291, 0) AS bh
        |""".stripMargin)
    // md5('x') = 9dd4e461268c8034…; first 8 bytes big-endian
    assert(r.getAs[java.math.BigDecimal]("hm").toBigInteger
      == new java.math.BigInteger("9dd4e461268c8034", 16))
    assert(r.getAs[Int]("jh") == "abc".hashCode)
    assert(r.getAs[Int]("hh") == "abc".hashCode) // Hive string hash = Java's
    val hs = Set(r.getAs[Long]("s64"), r.getAs[Long]("c64"),
      r.getAs[Long]("f64"), r.getAs[Long]("m64"))
    assert(hs.size == 4) // distinct seeds ⇒ mutually distinct names
    assert(r.getAs[Int]("l128") == 16 && r.getAs[Int]("l128b") == 16)
    assert(r.getAs[Int]("bh") == 4)
  }

  test("javaHash folds long strings exactly") {
    val s = "The quick brown fox jumps over the lazy dog - 0123456789" * 3
    assert(one[Int](s"javaHash('$s')") == s.hashCode)
    assert(one[Int]("javaHash('')") == 0)
  }

  test("JSON: typed extracts, raw, keys, type, simpleJSON scan") {
    val j = """'{"a": 1.5, "b": true, "o": {"x": 2}, "arr": [1, {"y": 3}]}'"""
    val r = row(
      s"""JSONExtractFloat($j, 'a') AS jf,
         |JSONExtractBool($j, 'b') AS jb,
         |JSONExtractRaw($j, 'o') AS jr,
         |JSONExtractArrayRaw($j, 'arr') AS ja,
         |JSONExtractKeys($j) AS jk,
         |JSONType($j) AS jt,
         |JSONType('[1]') AS jt2,
         |JSONType('"s"') AS jt3,
         |JSONType('42') AS jt4,
         |simpleJSONExtractInt('{"nested": {"k": 7}}', 'k') AS si,
         |simpleJSONExtractFloat('{"p": -2.5e1}', 'p') AS sf,
         |simpleJSONExtractBool('{"f": false}', 'f') AS sb,
         |simpleJSONExtractString('{"s": "he\\\\"y"}', 's') AS ss,
         |simpleJSONHas('{"q": 1}', 'q') AS sh,
         |visitParamExtractInt('{"v": 11}', 'v') AS vp
         |""".stripMargin)
    assert(r.getAs[Double]("jf") == 1.5)
    assert(r.getAs[Boolean]("jb"))
    assert(r.getAs[String]("jr").replaceAll("\\s", "") == """{"x":2}""")
    assert(r.getSeq[String](r.fieldIndex("ja")).map(_.replaceAll("\\s", ""))
      == Seq("1", """{"y":3}"""))
    assert(r.getSeq[String](r.fieldIndex("jk")) == Seq("a", "b", "o", "arr"))
    assert(r.getAs[String]("jt") == "Object")
    assert(r.getAs[String]("jt2") == "Array")
    assert(r.getAs[String]("jt3") == "String")
    assert(r.getAs[String]("jt4") == "Int64")
    assert(r.getAs[Long]("si") == 7L) // nesting-blind scan, the CH fast path
    assert(r.getAs[Double]("sf") == -25.0)
    assert(!r.getAs[Boolean]("sb"))
    assert(r.getAs[String]("ss") == "he\"y")
    assert(r.getAs[Boolean]("sh"))
    assert(r.getAs[Long]("vp") == 11L)
  }

  test("bit/misc: rotates, tests, CIDR, LpNorm, block identity") {
    val r = row(
      """bitRotateLeft(1, 1) AS rl,
        |bitRotateLeft(1, 0) AS rl0,
        |bitRotateRight(2, 1) AS rr,
        |bitTestAll(7, 0, 1, 2) AS ba,
        |bitTestAll(5, 0, 1) AS ba2,
        |bitTestAny(8, 0, 1) AS bn,
        |bitTestAny(9, 0, 1) AS bn2,
        |IPv4CIDRToRange(3232235777, 24) AS cr,
        |LpNorm(array(3.0D, 4.0D), 2) AS lp,
        |normalizedQueryHash('SELECT 1') = normalizedQueryHash('SELECT 2') AS nq,
        |normalizeQueryKeepNames('SELECT a, 42') AS nk,
        |blockNumber() >= 0 AS bnum,
        |rowNumberInBlock() >= 0 AS rnb,
        |currentDatabase() AS cdb
        |""".stripMargin)
    assert(r.getAs[Long]("rl") == 2L && r.getAs[Long]("rl0") == 1L)
    assert(r.getAs[Long]("rr") == 1L)
    assert(r.getAs[Boolean]("ba") && !r.getAs[Boolean]("ba2"))
    assert(!r.getAs[Boolean]("bn") && r.getAs[Boolean]("bn2"))
    val cr = r.getStruct(r.fieldIndex("cr"))
    assert(cr.getLong(0) == 3232235776L && cr.getLong(1) == 3232236031L)
    assert(math.abs(r.getAs[Double]("lp") - 5.0) < 1e-12)
    assert(r.getAs[Boolean]("nq")) // both normalize to SELECT ?
    assert(r.getAs[String]("nk") == "SELECT a, ?")
    assert(r.getAs[Boolean]("bnum") && r.getAs[Boolean]("rnb"))
    assert(r.getAs[String]("cdb").nonEmpty)
  }

  test("random family: shapes only (nondeterministic)") {
    val r = row(
      """randCanonical() AS rc,
        |rand64() AS r64,
        |octet_length(randomString(20)) AS rs,
        |length(randomPrintableASCII(15)) AS rp
        |""".stripMargin)
    val rc = r.getAs[Double]("rc")
    assert(rc >= 0.0 && rc < 1.0)
    r.getAs[Long]("r64") // resolves and evaluates
    assert(r.getAs[Int]("rs") == 20)
    assert(r.getAs[Int]("rp") == 15)
  }

  test("map/array: HOFs (lambda-first), dense enum, rotate/shift") {
    val r = row(
      """mapFilter((k, v) -> v > 1, map(1, 1, 2, 2)) AS mf,
        |mapApply((k, v) -> tuple(k, v + 1), map(1, 10, 2, 20)) AS ma,
        |mapUpdate(map(1, 10, 2, 20), map(2, 99, 3, 30)) AS mu,
        |mapConcat(map(1, 10), map(1, 11, 2, 20)) AS mc,
        |arrayEnumerateDense(array(10, 20, 10, 30)) AS aed,
        |arrayCumSumNonNegative(array(1.0D, -5.0D, 3.0D)) AS acs,
        |arrayRotateLeft(array(1, 2, 3, 4, 5), 2) AS arl,
        |arrayRotateRight(array(1, 2, 3, 4, 5), 1) AS arr,
        |arrayShiftLeft(array(1, 2, 3), 1) AS asl,
        |arrayShiftRight(array(1, 2, 3), 1, 9) AS asr
        |""".stripMargin)
    assert(r.getMap[Int, Int](r.fieldIndex("mf")) == Map(2 -> 2))
    assert(r.getMap[Int, Int](r.fieldIndex("ma")) == Map(1 -> 11, 2 -> 21))
    assert(r.getMap[Int, Int](r.fieldIndex("mu"))
      == Map(1 -> 10, 2 -> 99, 3 -> 30))
    assert(r.getMap[Int, Int](r.fieldIndex("mc")) == Map(1 -> 11, 2 -> 20))
    assert(r.getSeq[Long](r.fieldIndex("aed")) == Seq(1L, 2L, 1L, 3L))
    assert(r.getSeq[Double](r.fieldIndex("acs")) == Seq(1.0, 0.0, 3.0))
    assert(r.getSeq[Int](r.fieldIndex("arl")) == Seq(3, 4, 5, 1, 2))
    assert(r.getSeq[Int](r.fieldIndex("arr")) == Seq(5, 1, 2, 3, 4))
    assert(r.getSeq[Int](r.fieldIndex("asl")) == Seq(2, 3, 0))
    assert(r.getSeq[Int](r.fieldIndex("asr")) == Seq(9, 1, 2))
  }

  test("readable formatting") {
    assert(one[String]("formatReadableDecimalSize(1500000)") == "1.50 MB")
    assert(one[String]("formatReadableDecimalSize(999)") == "999.00 B")
    assert(one[String]("formatReadableTimeDelta(3665)")
      == "1 hour, 1 minute, 5 seconds")
    assert(one[String]("formatReadableTimeDelta(0)") == "0 seconds")
    assert(one[String]("formatReadableTimeDelta(90061)")
      == "1 day, 1 hour, 1 minute, 1 second")
  }

  test("helper kernels: jaro, base58, punycode/IDNA, NFC/NFD, ngram") {
    val r = row(
      """jaroSimilarity('MARTHA', 'MARHTA') AS js,
        |jaroWinklerSimilarity('MARTHA', 'MARHTA') AS jw,
        |jaroWinklerSimilarity('DWAYNE', 'DUANE') AS jw2,
        |jaroSimilarity('', '') AS jse,
        |base58Encode('hello') AS b58,
        |base58Decode(base58Encode('hello world!')) AS b58rt,
        |punycodeEncode('München') AS pe,
        |punycodeDecode('Mnchen-3ya') AS pd,
        |idnaEncode('münchen.example.com') AS ie,
        |idnaDecode('xn--mnchen-3ya.example.com') AS id,
        |normalizeUTF8NFD('é') AS nfd,
        |normalizeUTF8NFC(normalizeUTF8NFD('é')) AS nfc,
        |ngramDistance('abcde', 'abcde') AS nd0,
        |ngramDistance('abcde', 'vwxyz') AS nd1,
        |ngramSearch('the quick brown fox', 'quick') AS ns,
        |ngramSearch('the quick brown fox', 'zzzz') AS ns0
        |""".stripMargin)
    assert(math.abs(r.getAs[Double]("js") - 0.9444444444444445) < 1e-12)
    assert(math.abs(r.getAs[Double]("jw") - 0.9611111111111111) < 1e-12)
    assert(math.abs(r.getAs[Double]("jw2") - 0.84) < 1e-12)
    assert(r.getAs[Double]("jse") == 1.0)
    assert(r.getAs[String]("b58") == "Cn8eVZg") // public base58 vector
    assert(r.getAs[String]("b58rt") == "hello world!")
    assert(r.getAs[String]("pe") == "Mnchen-3ya")
    assert(r.getAs[String]("pd").equalsIgnoreCase("münchen"))
    assert(r.getAs[String]("ie") == "xn--mnchen-3ya.example.com")
    assert(r.getAs[String]("id") == "münchen.example.com")
    assert(r.getAs[String]("nfd").length == 2) // e + combining accent
    assert(r.getAs[String]("nfc") == "é" && r.getAs[String]("nfc").length == 1)
    assert(r.getAs[Double]("nd0") == 0.0)
    assert(r.getAs[Double]("nd1") == 1.0)
    assert(r.getAs[Double]("ns") == 1.0) // every needle 4-gram present
    assert(r.getAs[Double]("ns0") == 0.0)
  }

  test("IPv6 textual forms round-trip and canonicalize") {
    val r = row(
      """IPv6NumToString(IPv6StringToNum('2001:db8::8a2e:370:7334')) AS c1,
        |IPv6NumToString(IPv6StringToNum(
        |  '2001:0db8:0000:0000:0000:8a2e:0370:7334')) AS c2,
        |IPv6NumToString(toIPv6('192.168.0.1')) AS v4m,
        |isIPv6String('::1') AS ok1,
        |isIPv6String('2001:db8::1::2') AS bad1,
        |isIPv6String('not an ip') AS bad2,
        |IPv6NumToString(IPv6CIDRToRange(
        |  IPv6StringToNum('2001:db8::'), 32)._1) AS lo,
        |IPv6NumToString(IPv6CIDRToRange(
        |  IPv6StringToNum('2001:db8::'), 32)._2) AS hi
        |""".stripMargin)
    assert(r.getAs[String]("c1") == "2001:db8::8a2e:370:7334")
    assert(r.getAs[String]("c2") == "2001:db8::8a2e:370:7334")
    assert(r.getAs[String]("v4m") == "::ffff:192.168.0.1")
    assert(r.getAs[Int]("ok1") == 1)
    assert(r.getAs[Int]("bad1") == 0 && r.getAs[Int]("bad2") == 0)
    assert(r.getAs[String]("lo") == "2001:db8::")
    assert(r.getAs[String]("hi")
      == "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff")
  }

  test("refusals name the replacement") {
    GraftFunctions.ensureRegistered(spark)
    for (q <- Seq("untuple(tuple(1,2))", "blockSize()",
        "multiFuzzyMatchAny('a', 1, array('b'))")) {
      val e = intercept[Exception] { spark.sql(s"SELECT $q").collect() }
      assert(e.getMessage != null)
    }
  }
}
