package graft

import graft.functions.GraftFunctions

/** Round-10 sweep 2 (ChDialect3): array search HOFs, fingerprint
  * tuple family, reinterpret casts, UUID/ULID, WKT geometry,
  * proportion tests, host introspection. */
class ChDialect3Spec extends SparkSpec {

  private def row(q: String): org.apache.spark.sql.Row = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT " + q).collect().head
  }
  private def one[T](q: String): T = row(q + " AS v").getAs[T]("v")

  test("array search HOFs (lambda-first, aggregate-rooted)") {
    val r = row(
      """arrayFirst(x -> x > 2, array(1, 2, 3, 4)) AS af,
        |arrayLast(x -> x > 2, array(1, 2, 3, 4)) AS al,
        |arrayFirst(x -> x > 9, array(1, 2, 3)) AS afn,
        |arrayFirstIndex(x -> x > 2, array(1, 2, 3, 4)) AS afi,
        |arrayLastIndex(x -> x > 2, array(1, 2, 3, 4)) AS ali,
        |arrayFirstIndex(x -> x > 9, array(1, 2, 3)) AS afi0,
        |arrayCount(x -> x % 2 = 0, array(1, 2, 3, 4, 6)) AS ac,
        |arrayCount(array(0, 1, 2, 0)) AS ac1,
        |arraySplit(x -> x = 1, array(1, 2, 3, 1, 4)) AS asp,
        |arrayReverseSplit(x -> x = 9, array(1, 9, 2, 9, 3)) AS ars
        |""".stripMargin)
    assert(r.getAs[Int]("af") == 3)
    assert(r.getAs[Int]("al") == 4)
    assert(r.isNullAt(r.fieldIndex("afn")))
    assert(r.getAs[Int]("afi") == 3)
    assert(r.getAs[Int]("ali") == 4)
    assert(r.getAs[Int]("afi0") == 0)
    assert(r.getAs[Int]("ac") == 3)
    assert(r.getAs[Int]("ac1") == 2)
    assert(r.getSeq[Seq[Int]](r.fieldIndex("asp"))
      == Seq(Seq(1, 2, 3), Seq(1, 4)))
    assert(r.getSeq[Seq[Int]](r.fieldIndex("ars"))
      == Seq(Seq(1, 9), Seq(2, 9), Seq(3)))
  }

  test("arrayFill carries the last passing value; reverse form mirrors") {
    val r = row(
      """arrayFill(x -> x != 0, array(1, 0, 0, 5, 0)) AS ff,
        |arrayReverseFill(x -> x != 0, array(1, 0, 0, 5, 0)) AS rf,
        |arrayFill(x -> x != 0, array(0, 0, 3)) AS lead0""".stripMargin)
    assert(r.getSeq[Int](0) == Seq(1, 1, 1, 5, 5))
    assert(r.getSeq[Int](1) == Seq(1, 5, 5, 5, 0))
    // leading failures have no left neighbor — kept as-is (CH contract)
    assert(r.getSeq[Int](2) == Seq(0, 0, 3))
  }

  test("fingerprints: ngram/shingle hashes feed tupleHammingDistance") {
    val r = row(
      """ngramMinHash('the quick brown fox') AS nm,
        |ngramMinHash('the quick brown fox') = ngramMinHash('the quick brown fox') AS stable,
        |tupleHammingDistance(ngramMinHash('abcdef'), ngramMinHash('abcdef')) AS d0,
        |tupleHammingDistance(ngramMinHash('abcdefgh'), ngramMinHash('zyxwvuts')) AS d2,
        |ngramSimHash('the quick brown fox') AS nsh,
        |wordShingleSimHash('one two three four five') AS wsh,
        |wordShingleMinHash('one two three four five') AS wm,
        |tupleHammingDistance(tuple(1, 2, 3), tuple(1, 9, 3)) AS td,
        |splitByNonAlpha('ab,cd 12;ef') AS sna,
        |toLastDayOfMonth(DATE '2024-02-10') AS ld,
        |byteSwap(CAST(1 AS BIGINT)) AS bs,
        |subBitmap(array(1, 2, 3, 4, 5), 1, 3) AS sb,
        |toTypeName(1) AS tn
        |""".stripMargin)
    val nm = r.getStruct(r.fieldIndex("nm"))
    assert(nm.getLong(0) <= nm.getLong(1))
    assert(r.getAs[Boolean]("stable"))
    assert(r.getAs[Int]("d0") == 0)
    assert(r.getAs[Int]("d2") == 2)
    r.getAs[Long]("nsh"); r.getAs[Long]("wsh")
    val wm = r.getStruct(r.fieldIndex("wm"))
    assert(wm.getLong(0) <= wm.getLong(1))
    assert(r.getAs[Int]("td") == 1)
    assert(r.getSeq[String](r.fieldIndex("sna")) == Seq("ab", "cd", "12", "ef"))
    assert(r.getAs[java.sql.Date]("ld").toString == "2024-02-29")
    assert(r.getAs[Long]("bs") == (1L << 56))
    assert(r.getSeq[Int](r.fieldIndex("sb")) == Seq(2, 3, 4))
    assert(r.getAs[String]("tn") == "int")
  }

  test("reinterpret casts and FixedString") {
    val r = row(
      """reinterpretAsUInt32('a') AS r32,
        |reinterpretAsUInt64('ab') AS r64,
        |reinterpretAsString(97) AS rs,
        |reinterpretAsString(reinterpretAsUInt32('abc')) AS rt,
        |toFixedString('ab', 4) AS fs,
        |toStringCutToZero(toFixedString('ab', 4)) AS cz,
        |length(toFixedString('ab', 4)) AS fl
        |""".stripMargin)
    assert(r.getAs[Long]("r32") == 97L)
    // 'ab' little-endian = 0x6261
    assert(r.getAs[java.math.BigDecimal]("r64").longValue == 0x6261L)
    assert(r.getAs[String]("rs") == "a")
    assert(r.getAs[String]("rt") == "abc")
    assert(r.getAs[String]("cz") == "ab")
    assert(r.getAs[Int]("fl") == 4)
  }

  test("UUID / ULID family") {
    val r = row(
      """UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS un,
        |UUIDNumToString(UUIDStringToNum(
        |  '61f0c404-5cb3-11e7-907b-a6006ad3dba0')) AS rt,
        |serverUUID() AS su,
        |generateUUIDv7() AS u7,
        |generateULID() AS ul,
        |ULIDStringToDateTime('01GNB2S2FGN2P93QPXDNB4EN2R') AS ut
        |""".stripMargin)
    assert(r.getAs[Array[Byte]]("un").length == 16)
    assert(r.getAs[String]("rt") == "61f0c404-5cb3-11e7-907b-a6006ad3dba0")
    assert(r.getAs[String]("su").length == 36)
    val u7 = r.getAs[String]("u7")
    assert(u7.length == 36 && u7(14) == '7')
    assert(r.getAs[String]("ul").length == 26)
    // 01GNB2S2FG = 2022-12-28 ~ 1672200000000 ms
    val ts = r.getAs[java.sql.Timestamp]("ut")
    assert(ts.toString.startsWith("2022-12-2"))
  }

  test("WKT geometry and Cartesian measures") {
    val r = row(
      """readWKTPoint('POINT (10 20)') AS p,
        |wkt(tuple(10.0, 20.0)) AS w,
        |readWKTRing('POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))') AS ring,
        |polygonAreaCartesian(
        |  readWKTRing('POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))')) AS area,
        |polygonPerimeterCartesian(
        |  readWKTRing('POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))')) AS per,
        |pointInEllipses(1.0, 0.0, 0.0, 0.0, 2.0, 2.0) AS pe,
        |pointInEllipses(5.0, 0.0, 0.0, 0.0, 2.0, 2.0) AS pe0,
        |svg(readWKTRing('POLYGON ((0 0, 1 0, 1 1, 0 0))')) AS sv
        |""".stripMargin)
    val p = r.getStruct(r.fieldIndex("p"))
    assert(p.getDouble(0) == 10.0 && p.getDouble(1) == 20.0)
    assert(r.getAs[String]("w") == "POINT(10.0 20.0)")
    assert(r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("ring")).length == 5)
    assert(math.abs(r.getAs[Double]("area") - 12.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("per") - 14.0) < 1e-9)
    assert(r.getAs[Int]("pe") == 1 && r.getAs[Int]("pe0") == 0)
    assert(r.getAs[String]("sv").startsWith("<polygon points=\"0.0,0.0 "))
  }

  test("proportion z-test and minimum sample sizes") {
    val r = row(
      """proportionsZTest(90, 80, 1000, 1000, 0.95, 'unpooled') AS zt,
        |minSampleSizeContinous(100.0, 20.0, 0.05, 0.8, 0.05) AS mc,
        |minSampleSizeConversion(0.1, 0.02, 0.8, 0.05) AS mv
        |""".stripMargin)
    val zt = r.getStruct(r.fieldIndex("zt"))
    // p1=0.09, p2=0.08: z ≈ 0.8078 (unpooled se)
    assert(math.abs(zt.getDouble(0) - 0.8078) < 0.01)
    assert(zt.getDouble(1) > 0.3 && zt.getDouble(1) < 0.5) // p ≈ 0.419
    assert(zt.getDouble(2) < 0.01 && zt.getDouble(3) > 0.01)
    val mc = r.getStruct(r.fieldIndex("mc"))
    // 2*(z975+z80)^2*sigma^2/delta^2 ≈ 2*(1.96+0.8416)^2*400/25 ≈ 251
    assert(mc.getDouble(0) > 230 && mc.getDouble(0) < 270)
    assert(mc.getDouble(1) == 95.0 && mc.getDouble(2) == 105.0)
    val mv = r.getStruct(r.fieldIndex("mv"))
    // (z975+z80)^2*(0.09+0.1056)/0.0004 ≈ 3841
    assert(mv.getDouble(0) > 3500 && mv.getDouble(0) < 4200)
  }

  test("host introspection resolves and refusals guide") {
    val r = row(
      """hostName() AS hn, fullHostName() AS fhn,
        |getOSKernelVersion() AS kv, uptime() AS up""".stripMargin)
    assert(r.getAs[String]("hn").nonEmpty)
    assert(r.getAs[String]("fhn").nonEmpty)
    assert(r.getAs[String]("kv").toLowerCase.contains("linux"))
    assert(r.getAs[Long]("up") >= 0L)
    for (q <- Seq("stem('en', 'running')", "h3ToGeo(0)",
        "transactionID()")) {
      intercept[Exception] { spark.sql(s"SELECT $q").collect() }
    }
  }
}
