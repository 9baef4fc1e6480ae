package graft

import graft.functions.GraftFunctions

/** Round-13 registry tail (ChDialect6): array shingles, language
  * detection, the IPv4/IPv6/MAC conversion tails, UUIDv7, Joda-token
  * datetime spellings, base32, H3 introspection, Cartesian polygon
  * area, the continuous sample-size planner, and the geobase
  * refusals. */
class ChDialect6Spec extends SparkSpec {
  import spark.implicits._

  private def sql1(q: String): org.apache.spark.sql.Row = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(q).collect().head
  }

  test("arrayShingles: consecutive windows; short input → empty") {
    val r = sql1(
      """SELECT arrayShingles(array(1, 2, 3, 4), 2) AS s,
        |  arrayShingles(array(1), 2) AS e,
        |  arrayShingles(array('a', 'b', 'c'), 3) AS w
        |""".stripMargin)
    assert(r.getAs[scala.collection.Seq[scala.collection.Seq[Int]]]("s")
      .map(_.toSeq).toSeq == Seq(Seq(1, 2), Seq(2, 3), Seq(3, 4)))
    assert(r.getAs[scala.collection.Seq[_]]("e").isEmpty)
    assert(r.getAs[scala.collection.Seq[scala.collection.Seq[String]]]("w")
      .map(_.toSeq).toSeq == Seq(Seq("a", "b", "c")))
  }

  test("arrayShingles edges: NULL array → NULL; n ≤ 0 raises") {
    val r = sql1("SELECT arrayShingles(CAST(NULL AS ARRAY<INT>), 2) AS n")
    assert(r.isNullAt(r.fieldIndex("n")))
    val e = intercept[Exception] {
      sql1("SELECT arrayShingles(array(1, 2, 3), 0) AS bad")
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
  }

  test("detectLanguage: stopword argmax; no signal → 'un'") {
    val r = sql1(
      """SELECT detectLanguage('the cat and the dog is here') AS en,
        |  detectLanguage('le chat et la maison les rues') AS fr,
        |  detectLanguage('qqq zzz xxx') AS un
        |""".stripMargin)
    assert(r.getAs[String]("en") == "en")
    assert(r.getAs[String]("fr") == "fr")
    assert(r.getAs[String]("un") == "un")
  }

  test("datetime tail: timezoneOf, Joda spellings, best-effort, UUIDv7") {
    val r = sql1(
      """SELECT timezoneOf(now()) AS tz,
        |  fromUnixTimestampInJodaSyntax(0, 'yyyy-MM-dd HH:mm') AS fu,
        |  toString(parseDateTimeInJodaSyntax('2024-03-15 13:45',
        |    'yyyy-MM-dd HH:mm')) AS pj,
        |  parseDateTimeInJodaSyntaxOrNull('x', 'yyyy-MM-dd') AS pjn,
        |  parseDateTimeBestEffortOrNull('nope') AS ben,
        |  toString(parseDateTime64BestEffort('2024-03-15 10:00:00')) AS b64,
        |  toString(UUIDv7ToDateTime('017f22e2-79b0-7cc3-98c4-dc0c0c07398f')) AS u7
        |""".stripMargin)
    assert(r.getAs[String]("tz") == "UTC")
    assert(r.getAs[String]("fu") == "1970-01-01 00:00")
    assert(r.getAs[String]("pj").startsWith("2024-03-15 13:45"))
    assert(r.isNullAt(r.fieldIndex("pjn")))
    assert(r.isNullAt(r.fieldIndex("ben")))
    assert(r.getAs[String]("b64").startsWith("2024-03-15 10:00:00"))
    // RFC 9562's example v7 UUID: first 48 bits = 2022-02-22 19:22:22 UTC
    assert(r.getAs[String]("u7").startsWith("2022-02-22 19:22:22"))
  }

  test("IPv4/IPv6/MAC tails: Or* forms, mapped v6, cuts, MAC hex") {
    val r = sql1(
      """SELECT toIPv4('1.2.3.4') AS v4,
        |  toIPv4('999.1.1.1') AS v4bad,
        |  toIPv4OrZero('x') AS v4z,
        |  IPv4StringToNumOrNull('1.2.3.4') AS n4,
        |  IPv4StringToNumOrNull('nope') AS n4n,
        |  IPv4StringToNumOrZero('nope') AS n4z,
        |  hex(IPv4ToIPv6(16909060)) AS m6,
        |  hex(IPv4ToIPv6(toIPv4('1.2.3.4'))) AS m6str,
        |  IPv6NumToString(IPv4ToIPv6(16909060)) AS m6s,
        |  hex(toIPv6OrZero('junk')) AS z6,
        |  toIPv6OrNull('junk') AS n6,
        |  cutIPv6(toIPv6('2001:db8:85a3::8a2e:370:7334'), 2, 0) AS cut6,
        |  cutIPv6(IPv4ToIPv6(16909060), 2, 1) AS cut4,
        |  MACNumToString(1108152157446) AS mac,
        |  MACStringToNum('01:02:03:04:05:06') AS macn,
        |  MACStringToNum('zz') AS macbad,
        |  MACStringToOUI('01:02:03:04:05:06') AS oui
        |""".stripMargin)
    assert(r.getAs[String]("v4") == "1.2.3.4")
    assert(r.isNullAt(r.fieldIndex("v4bad")))
    assert(r.getAs[String]("v4z") == "0.0.0.0")
    assert(r.getAs[Long]("n4") == 16909060L)
    assert(r.isNullAt(r.fieldIndex("n4n")))
    assert(r.getAs[Long]("n4z") == 0L)
    assert(r.getAs[String]("m6") == "00000000000000000000FFFF01020304")
    // the composition IPv4ToIPv6(toIPv4(s)) takes the dotted string
    assert(r.getAs[String]("m6str") == "00000000000000000000FFFF01020304")
    assert(r.getAs[String]("m6s") == "::ffff:1.2.3.4")
    assert(r.getAs[String]("z6") == "0" * 32)
    assert(r.isNullAt(r.fieldIndex("n6")))
    assert(r.getAs[String]("cut6") ==
      sql1("SELECT IPv6NumToString(unhex('20010DB885A3000000008A2E03700000')) AS x")
        .getAs[String]("x"))
    assert(r.getAs[String]("cut4") ==
      sql1("SELECT IPv6NumToString(unhex('00000000000000000000FFFF01020300')) AS x")
        .getAs[String]("x"))
    assert(r.getAs[String]("mac") == "01:02:03:04:05:06")
    assert(r.getAs[Long]("macn") == 1108152157446L)
    assert(r.getAs[Long]("macbad") == 0L)
    assert(r.getAs[Long]("oui") == 66051L)
  }

  test("base32 round-trip (RFC 4648), H3 resolution, planner alias") {
    val r = sql1(
      """SELECT base32Encode('foobar') AS e,
        |  CAST(base32Decode(base32Encode('foobar')) AS STRING) AS rt,
        |  base32Decode('!!!') AS bad,
        |  h3GetResolution(617700169958293503) AS res,
        |  minSampleSizeContinuous(100.0, 10.0, 0.05, 0.8, 0.05) AS pl
        |""".stripMargin)
    assert(r.getAs[String]("e") == "MZXW6YTBOI======") // RFC 4648 test vector
    assert(r.getAs[String]("rt") == "foobar")
    assert(r.isNullAt(r.fieldIndex("bad")))
    assert(r.getAs[Int]("res") == 9) // 0x8928308280fffff, the res-9 example
    val pl = r.getAs[org.apache.spark.sql.Row]("pl")
    // the correctly-spelled alias resolves to ChDialect3's planner —
    // assert it matches the typo-spelled canonical name exactly
    val canon = sql1(
      "SELECT minSampleSizeContinous(100.0, 10.0, 0.05, 0.8, 0.05) AS pl")
      .getAs[org.apache.spark.sql.Row]("pl")
    assert(pl == canon)
  }

  test("groupBitmapAnd: all-NULL group → 0, not an array-index error") {
    GraftFunctions.ensureRegistered(spark)
    Seq((1, None: Option[Seq[Long]]), (1, None))
      .toDF("g", "bm").createOrReplaceTempView("d6bm_null")
    val r = spark.sql(graft.functions.ChSql.translate(
      "SELECT groupBitmapAnd(bm) AS band FROM d6bm_null GROUP BY g"))
      .collect().head
    assert(r.getAs[Int]("band") == 0)
  }

  test("batch 2: argMin/MaxIf, bitmap-state aggs, quantilesTiming, maps, JSON paths") {
    GraftFunctions.ensureRegistered(spark)
    Seq((1, 10, "a", Seq(1L, 2L, 3L), """{"a": 1, "b": {"c": 2}}"""),
        (1, 20, "b", Seq(2L, 3L, 4L), """{"a": 5, "d": [1, 2]}"""),
        (1, 30, "c", Seq(2L, 5L), """not json"""))
      .toDF("g", "v", "s", "bm", "js").createOrReplaceTempView("d6b")
    val r = spark.sql(graft.functions.ChSql.translate(
      """SELECT
        |  argMinIf(s, v, v > 10) AS amn,
        |  argMaxIf(s, v, v < 30) AS amx,
        |  groupBitmapAnd(bm) AS band,
        |  groupBitmapOr(bm) AS bor,
        |  quantilesTiming(0.5, 0.9)(v) AS qt,
        |  nothing(v) AS nth,
        |  sumMappedArrays(array('x', 'y'), array(v, 1)) AS sm,
        |  minMappedArrays(array('x', 'y'), array(v, 1)) AS mm,
        |  distinctJSONPaths(js) AS jp
        |FROM d6b GROUP BY g""".stripMargin)).collect().head
    assert(r.getAs[String]("amn") == "b")   // min v among v>10 is 20 -> 'b'
    assert(r.getAs[String]("amx") == "b")   // max v among v<30 is 20 -> 'b'
    assert(r.getAs[Int]("band") == 1)       // only 2 is in every bitmap
    assert(r.getAs[Int]("bor") == 5)        // {1,2,3,4,5}
    assert(r.getAs[scala.collection.Seq[Double]]("qt").size == 2)
    assert(r.isNullAt(r.fieldIndex("nth")))
    val sm = r.getAs[Map[String, Long]]("sm")
    assert(sm("x") == 60L && sm("y") == 3L)
    val mm = r.getAs[Map[String, Long]]("mm")
    assert(mm("x") == 10L && mm("y") == 1L)
    assert(r.getAs[scala.collection.Seq[String]]("jp").toSeq ==
      Seq("a", "b.c", "d")) // sorted distinct leaf paths; bad json: none
    // covarPopMatrix next to the Samp form: pop = samp * (n-1)/n
    val m = spark.sql(graft.functions.ChSql.translate(
      """SELECT covarPopMatrix(v, v * 2) AS p, covarSampMatrix(v, v * 2) AS sa
        |FROM d6b""".stripMargin)).collect().head
    val p = m.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("p")
    val sa = m.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("sa")
    assert(math.abs(p(0)(0) - sa(0)(0) * 2.0 / 3.0) < 1e-9)
    // flameGraph / distinctDynamicTypes refuse with guidance
    Seq("flameGraph(v)", "distinctDynamicTypes(v)").foreach { call =>
      val e = intercept[Exception] {
        spark.sql(s"SELECT $call FROM d6b").collect()
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("profiler") || msg.contains("distinctJSONPaths"), msg)
    }
  }

  test("batch 3: UTF8 left/right, null-safe eq, bitmap subsets, intervals, tumble/hop") {
    GraftFunctions.ensureRegistered(spark)
    val r = sql1(
      """SELECT leftUTF8('héllo', 2) AS l, rightUTF8('héllo', 2) AS rr,
        |  isNotDistinctFrom(NULL, NULL) AS nn,
        |  isNotDistinctFrom(1, NULL) AS n1,
        |  bitmapSubsetInRange(array(1L, 3L, 5L, 7L), 3L, 7L) AS br,
        |  bitmapSubsetLimit(array(1L, 3L, 5L, 7L), 3L, 2) AS bl,
        |  bitmapTransform(array(1L, 2L, 3L), array(2L), array(9L)) AS bt,
        |  CAST(TIMESTAMP '2024-01-01 00:00:00'
        |    + toIntervalNanosecond(1500000000) AS STRING) AS ns,
        |  indexHint(1 > 0) AS ih
        |""".stripMargin)
    assert(r.getAs[String]("l") == "hé" && r.getAs[String]("rr") == "lo")
    assert(r.getAs[Boolean]("nn") && !r.getAs[Boolean]("n1"))
    assert(r.getAs[scala.collection.Seq[Long]]("br").toSeq == Seq(3L, 5L))
    assert(r.getAs[scala.collection.Seq[Long]]("bl").toSeq == Seq(3L, 5L))
    assert(r.getAs[scala.collection.Seq[Long]]("bt").toSeq == Seq(1L, 3L, 9L))
    assert(r.getAs[String]("ns").startsWith("2024-01-01 00:00:01.5"))
    assert(r.getAs[Int]("ih") == 1)
    // standalone tumble/hop windowed aggregation through translate —
    // the WINDOW VIEW mapping now serves the batch front door too
    spark.sql("SELECT timestamp_micros(CAST(id * 600000000 AS BIGINT)) AS ts, id AS v FROM range(12)")
      .createOrReplaceTempView("d6w")
    val w = spark.sql(graft.functions.ChSql.translate(
      """SELECT tumbleStart(ts, INTERVAL 1 HOUR) AS ws, count() AS n
        |FROM d6w GROUP BY tumble(ts, INTERVAL 1 HOUR) ORDER BY ws""".stripMargin))
      .collect()
    assert(w.length == 2 && w.map(_.getLong(1)).toSeq == Seq(6L, 6L))
  }

  test("geobase names refuse with dictGet guidance; detectCharset guides") {
    GraftFunctions.ensureRegistered(spark)
    Seq("regionToName(1)", "regionToCountry(1)", "detectCharset('x')")
      .foreach { call =>
        val e = intercept[Exception] {
          spark.sql(s"SELECT $call").collect()
        }
        val m = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
        assert(m.contains("dictGet") || m.contains("UTF-8"),
          s"$call refusal must guide, got: $m")
      }
  }
}
