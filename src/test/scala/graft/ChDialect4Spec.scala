package graft

import org.apache.spark.sql.Row
import graft.functions.ChSql

/** ChDialect4: sweep 3 of the CH-name surface — date constructors,
  * Interval makers, MySQL-format parsing, regex groups, tuple
  * arithmetic, array reorderings, AES, curve codes, consistent
  * hashing, CIDR membership, value-mapping transform. */
class ChDialect4Spec extends SparkSpec {
  import spark.implicits._

  private def row1(q: String): Row =
    spark.sql(ChSql.translate(q)).collect().head

  test("date constructors and Julian/epoch anchors") {
    val r = row1(
      """SELECT toString(makeDate(2024, 2, 29)) AS d,
        |  toString(makeDateTime(2024, 2, 29, 12, 30, 5)) AS dt,
        |  monthName(toDate('2024-02-29')) AS mn,
        |  toDaysSinceYearZero(toDate('1970-01-01')) AS dz,
        |  toModifiedJulianDay('1858-11-17') AS mj0,
        |  toModifiedJulianDay('2020-01-01') AS mj,
        |  toString(fromModifiedJulianDay(58849)) AS fmj""".stripMargin)
    assert(r.getString(0) == "2024-02-29")
    assert(r.getString(1) == "2024-02-29 12:30:05")
    assert(r.getString(2) == "February")
    assert(r.getInt(3) == 719528)
    assert(r.getInt(4) == 0)
    assert(r.getInt(5) == 58849)
    assert(r.getString(6) == "2020-01-01")
  }

  test("parseDateTime handles the MySQL token set") {
    val r = row1(
      """SELECT toString(parseDateTime('2021-01-04 23:12:59', '%Y-%m-%d %H:%i:%s')) AS a,
        |  toString(parseDateTime('02/28/2023', '%m/%d/%Y')) AS b""".stripMargin)
    assert(r.getString(0) == "2021-01-04 23:12:59")
    assert(r.getString(1) == "2023-02-28 00:00:00")
    val e = intercept[Exception] {
      spark.sql(ChSql.translate("SELECT parseDateTime('x', '%Q')"))
    }
    assert(e.getMessage.contains("%Q") || e.getCause != null)
  }

  test("toWeek/toYearWeek speak MySQL's mode table (0, 1, 3)") {
    // fixtures verified against MySQL WEEK()/YEARWEEK() documentation
    // examples: 2000-01-01 = Saturday (week 0 in modes 0/1, ISO
    // 1999-W52), 2000-01-02 = the year's first Sunday, 2024-01-01 =
    // Monday of an ISO week 1, 2024-12-31 = ISO 2025-W01
    val r = row1(
      """SELECT toWeek(toDate('2000-01-01')) AS w0_sat,
        |  toWeek(toDate('2000-01-02')) AS w0_sun,
        |  toWeek(toDate('2000-01-01'), 1) AS w1_sat,
        |  toWeek(toDate('2024-01-01'), 1) AS w1_mon,
        |  toWeek(toDate('2000-01-01'), 3) AS w3_sat,
        |  toWeek(toDate('2024-12-31')) AS w0_nye,
        |  toYearWeek(toDate('2000-01-01')) AS yw0,
        |  toYearWeek(toDate('2024-01-01')) AS yw0b,
        |  toYearWeek(toDate('2000-01-01'), 1) AS yw1,
        |  toYearWeek(toDate('2024-01-01'), 1) AS yw1b,
        |  toYearWeek(toDate('2024-12-31'), 3) AS yw3""".stripMargin)
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) == 1)
    assert(r.getInt(2) == 0)
    assert(r.getInt(3) == 1)
    assert(r.getInt(4) == 52)
    assert(r.getInt(5) == 52)
    assert(r.getInt(6) == 199952)
    assert(r.getInt(7) == 202353)
    assert(r.getInt(8) == 199952)
    assert(r.getInt(9) == 202401)
    assert(r.getInt(10) == 202501)
    val e = intercept[Exception] {
      spark.sql(ChSql.translate("SELECT toWeek(toDate('2024-01-01'), 11)"))
    }
    assert(e.getMessage.contains("mode") || e.getCause != null)
  }

  test("toWeek/toYearWeek: the full 10-mode table (public doc pins)") {
    // pins from the public CH toWeek doc (2016-12-27: week 52 under
    // modes 0/1 but week 1 of 2017 under mode 9 — its Monday-first
    // week contains Jan 1) and MySQL's WEEK()/YEARWEEK() examples
    val r = row1(
      """SELECT toWeek(toDate('2016-12-27')) AS w0,
        |  toWeek(toDate('2016-12-27'), 1) AS w1,
        |  toWeek(toDate('2016-12-27'), 9) AS w9,
        |  toYearWeek(toDate('2016-12-27')) AS yw0,
        |  toYearWeek(toDate('2016-12-27'), 1) AS yw1,
        |  toYearWeek(toDate('2016-12-27'), 9) AS yw9,
        |  toWeek(toDate('2008-02-20')) AS f0,
        |  toWeek(toDate('2008-02-20'), 1) AS f1,
        |  toWeek(toDate('2008-12-31'), 1) AS f53,
        |  toWeek(toDate('2000-01-01'), 2) AS w2,
        |  toYearWeek(toDate('1987-01-01')) AS ywm""".stripMargin)
    assert(r.getInt(0) == 52 && r.getInt(1) == 52 && r.getInt(2) == 1)
    assert(r.getInt(3) == 201652 && r.getInt(4) == 201652 && r.getInt(5) == 201701)
    assert(r.getInt(6) == 7 && r.getInt(7) == 8 && r.getInt(8) == 53)
    assert(r.getInt(9) == 52)
    assert(r.getInt(10) == 198652)
  }

  test("toWeek/toYearWeek: all modes match a LocalDate reference across year boundaries") {
    import java.time.{DayOfWeek, LocalDate}
    import java.time.temporal.{ChronoUnit, WeekFields}
    // independent model of the documented mode table, over LocalDate
    val table = Map( // mode -> (mondayFirst, week-1 rule, zero range)
      0 -> ((false, 0, true)), 1 -> ((true, 1, true)),
      2 -> ((false, 0, false)), 3 -> ((true, 1, false)),
      4 -> ((false, 1, true)), 5 -> ((true, 0, true)),
      6 -> ((false, 1, false)), 7 -> ((true, 0, false)),
      8 -> ((false, 2, false)), 9 -> ((true, 2, false)))
    def wsOf(d: LocalDate, mon: Boolean): LocalDate =
      d.minusDays(if (mon) (d.getDayOfWeek.getValue - 1).toLong
        else (d.getDayOfWeek.getValue % 7).toLong)
    def w1Of(year: Int, mon: Boolean, rule: Int): LocalDate = {
      val jan1 = LocalDate.of(year, 1, 1)
      rule match {
        case 0 =>
          val t = if (mon) DayOfWeek.MONDAY else DayOfWeek.SUNDAY
          var x = jan1; while (x.getDayOfWeek != t) x = x.plusDays(1); x
        case 1 => wsOf(jan1.plusDays(3), mon)
        case 2 => wsOf(jan1, mon)
      }
    }
    def anchorOf(d: LocalDate, mon: Boolean, rule: Int): LocalDate = {
      val ws = wsOf(d, mon)
      rule match { case 0 => ws; case 1 => ws.plusDays(3); case 2 => ws.plusDays(6) }
    }
    def wkFrom(w1: LocalDate, d: LocalDate): Int =
      (ChronoUnit.DAYS.between(w1, d) / 7 + 1).toInt
    def refWeek(d: LocalDate, mode: Int): Int = {
      val (mon, rule, zero) = table(mode)
      if (zero) {
        val w1 = w1Of(d.getYear, mon, rule)
        if (d.isBefore(w1)) 0 else wkFrom(w1, d)
      } else {
        val a = anchorOf(d, mon, rule)
        wkFrom(w1Of(a.getYear, mon, rule), d)
      }
    }
    def refYearWeek(d: LocalDate, mode: Int): Int = {
      val (mon, rule, _) = table(mode)
      val a = anchorOf(d, mon, rule)
      a.getYear * 100 + wkFrom(w1Of(a.getYear, mon, rule), d)
    }
    // the model itself is validated against java.time's independent
    // ISO week fields for mode 3 (= ISO 8601) before it judges Spark
    val days = (0 until 366 * 6).map(LocalDate.of(2015, 1, 1).plusDays(_))
    days.foreach { d =>
      assert(refWeek(d, 3) == d.get(WeekFields.ISO.weekOfWeekBasedYear()),
        s"model mode-3 disagrees with java.time ISO at $d")
      assert(refYearWeek(d, 3) ==
        d.get(WeekFields.ISO.weekBasedYear()) * 100 +
          d.get(WeekFields.ISO.weekOfWeekBasedYear()),
        s"model yearweek-3 disagrees with java.time ISO at $d")
    }
    val wCols = (0 to 9).map(m => s"toWeek(d, $m) AS w$m")
    val ywCols = (0 to 9).map(m => s"toYearWeek(d, $m) AS yw$m")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val got = days.map(_.toString).toDF("s")
      .selectExpr("CAST(s AS DATE) AS d")
      .selectExpr(("d" +: (wCols ++ ywCols)): _*)
      .collect()
    got.foreach { row =>
      val d = row.getDate(0).toLocalDate
      (0 to 9).foreach { m =>
        assert(row.getInt(1 + m) == refWeek(d, m), s"toWeek($d, $m)")
        assert(row.getInt(11 + m) == refYearWeek(d, m), s"toYearWeek($d, $m)")
      }
    }
  }

  test("seriesDecomposeSTL: classical decomposition invariants on a planted cycle") {
    // planted series: linear trend 0.5·i + zero-sum period-4 cycle
    val cycle = Seq(2.0, -1.0, -1.0, 0.0)
    val xs = (0 until 24).map(i => 0.5 * i + cycle(i % 4))
    val arr = xs.mkString("array(", ", ", ")")
    val r = spark.sql(ChSql.translate(
      s"SELECT seriesDecomposeSTL($arr, 4) AS d")).collect().head
    val d = r.getSeq[scala.collection.Seq[Double]](0)
    assert(d.length == 4, "CH shape: [seasonal, trend, residue, baseline]")
    val Seq(se, tr, res, base) = d.map(_.toIndexedSeq)
    // exact reconstruction and baseline identities
    xs.indices.foreach { i =>
      assert(math.abs(se(i) + tr(i) + res(i) - xs(i)) < 1e-9, s"recon@$i")
      assert(math.abs(base(i) - (se(i) + tr(i))) < 1e-9, s"baseline@$i")
    }
    // one full period of the seasonal component sums to 0 (centered)
    assert(math.abs(se.take(4).sum) < 1e-9)
    // interior: the 2×4 moving average spans exactly one full period,
    // so the zero-sum cycle cancels and the linear trend is recovered
    // exactly; the planted cycle survives in the seasonal component
    (2 until 22).foreach { i =>
      assert(math.abs(tr(i) - 0.5 * i) < 1e-9, s"trend@$i: ${tr(i)}")
    }
    // phase means absorb some edge-window distortion (4 of 24 rows
    // have shrunken trend windows) — the cycle survives within it
    (8 until 16).foreach { i =>
      assert(math.abs(se(i) - cycle(i % 4)) < 0.35, s"seasonal@$i: ${se(i)}")
    }
    // refusals: bad period, series shorter than two periods
    val e1 = intercept[Exception] {
      spark.sql(ChSql.translate(
        "SELECT seriesDecomposeSTL(array(1.0, 2.0, 3.0, 4.0), 4)")).collect()
    }
    assert(e1.getMessage.contains("2 * period") || e1.getCause != null)
  }

  test("accurateCast throws out-of-range, OrNull nulls; misc tail aliases") {
    val r = row1(
      """SELECT accurateCast(300, 'Int32') AS ok,
        |  accurateCastOrNull(99999999999, 'Int32') AS oob,
        |  accurateCastOrNull('4x', 'Int32') AS bad,
        |  toBool(1) AS b,
        |  basename('/a/b/c.txt') AS bn,
        |  basename('win\\path\\f.bin') AS bw,
        |  visibleWidth(12345) AS vw""".stripMargin)
    assert(r.getInt(0) == 300)
    assert(r.isNullAt(1) && r.isNullAt(2))
    assert(r.getBoolean(3))
    assert(r.getString(4) == "c.txt" && r.getString(5) == "f.bin")
    assert(r.getLong(6) == 5L)
    val e = intercept[Exception] {
      spark.sql(ChSql.translate(
        "SELECT accurateCast(99999999999, 'Int32')")).collect()
    }
    assert(e.getMessage.contains("does not fit") ||
      e.getCause != null, e.getMessage)
    // lossy-but-castable narrowings throw too (CH's contract): a
    // fractional double into an integer, an odd 2^24+1 into Float32
    Seq("SELECT accurateCast(3.5, 'Int32')",
        "SELECT accurateCast(16777217, 'Float32')").foreach { q =>
      val le = intercept[Exception] {
        spark.sql(ChSql.translate(q)).collect()
      }
      assert(le.getMessage.contains("does not fit") || le.getCause != null,
        s"$q should throw, got: ${le.getMessage}")
    }
    // exact narrowings still pass
    val ok = row1("SELECT accurateCast(3.0, 'Int32') AS i, " +
      "accurateCast(16777216, 'Float32') AS f")
    assert(ok.getInt(0) == 3 && ok.getFloat(1) == 16777216.0f)
  }

  test("datetime/misc tail: toDateTime64, toStartOfSecond, version, mid, CI count") {
    val r = row1(
      """SELECT toString(toDateTime64('2024-01-02 03:04:05.250', 3)) AS dt,
        |  toString(toStartOfSecond(toDateTime64('2024-01-02 03:04:05.250', 3))) AS ss,
        |  version() AS v,
        |  mid('abcdef', 2, 3) AS m,
        |  countSubstringsCaseInsensitive('aBrAcadAbra', 'a') AS ci""".stripMargin)
    assert(r.getString(0) == "2024-01-02 03:04:05.25")
    assert(r.getString(1) == "2024-01-02 03:04:05")
    assert(r.getString(2).startsWith("4."))
    assert(r.getString(3) == "bcd")
    assert(r.getLong(4) == 5L)
    val e = intercept[Exception] {
      spark.sql(ChSql.translate("SELECT queryID()"))
    }
    assert(e.getMessage.contains("query registry") || e.getCause != null)
  }

  test("series family: Tukey outlier scores and period detection") {
    val r = row1(
      """SELECT
        |  seriesOutliersDetectTukey([2.0, 3.0, 2.0, 100.0, 3.0, 2.0, 3.0, 2.0]) AS sc,
        |  seriesPeriodDetectFFT([1.0,2.0,3.0,1.0,2.0,3.0,1.0,2.0,3.0,1.0,2.0,3.0]) AS p,
        |  seriesPeriodDetectFFT([5.0,5.0,5.0,5.0,5.0,5.0]) AS flat""".stripMargin)
    val sc = r.getSeq[Double](0)
    // only the planted spike scores; everything else is exactly 0
    assert(sc.count(_ != 0.0) == 1 && sc(3) > 90, sc)
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 0.0) // constant series has no period
    // (seriesDecomposeSTL is implemented — see its dedicated spec above;
    // the too-short-series refusal is asserted there with a collect())
  }

  test("toInterval family composes with date arithmetic") {
    val r = row1(
      """SELECT toString(toDateTime('2024-01-01 00:00:00') + toIntervalHour(25)) AS h,
        |  toString(toDate('2024-01-31') + toIntervalMonth(1)) AS m,
        |  toString(toDateTime('2024-01-01 00:00:00') + toIntervalWeek(2)) AS w""".stripMargin)
    assert(r.getString(0) == "2024-01-02 01:00:00")
    assert(r.getString(1) == "2024-02-29")
    assert(r.getString(2) == "2024-01-15 00:00:00")
  }

  test("regexpExtract group default and extractAllGroups") {
    val r = row1(
      """SELECT regexpExtract('v=42 k=7', 'v=(\\d+)') AS g1,
        |  regexpExtract('abc123', '\\d+') AS g0,
        |  regexpExtract('a1b2', '([a-z])(\\d)', 2) AS gi,
        |  extractAllGroupsHorizontal('v=1,w=2', '([a-z])=(\\d)') AS h,
        |  extractAllGroupsVertical('v=1,w=2', '([a-z])=(\\d)') AS v""".stripMargin)
    assert(r.getString(0) == "42")
    assert(r.getString(1) == "123")
    assert(r.getString(2) == "1")
    assert(r.getSeq[Seq[String]](3) == Seq(Seq("v", "w"), Seq("1", "2")))
    assert(r.getSeq[Seq[String]](4) == Seq(Seq("v", "1"), Seq("w", "2")))
  }

  test("tuple arithmetic over in-place tuples") {
    val r = row1(
      """SELECT tuplePlus(tuple(1, 2.5), tuple(10, 0.5)) AS p,
        |  tupleMinus(tuple(5, 5), tuple(2, 7)) AS m,
        |  tupleNegate(tuple(3, -4)) AS n,
        |  tupleMultiplyByNumber(tuple(2, 3), 10) AS s,
        |  mapFromArrays(array('a', 'b'), array(1, 2)) AS mp""".stripMargin)
    assert(r.getStruct(0) == Row(11, new java.math.BigDecimal("3.0")))
    assert(r.getStruct(1) == Row(3, -2))
    assert(r.getStruct(2) == Row(-3, 4))
    assert(r.getStruct(3) == Row(20, 30))
    assert(r.getMap[String, Int](4) == Map("a" -> 1, "b" -> 2))
  }

  test("value-mapping transform rewrites; the lambda HOF is untouched") {
    val r = row1(
      """SELECT transform(2, [1, 2, 3], ['a', 'b', 'c'], '?') AS hit,
        |  transform(9, [1, 2, 3], ['a', 'b', 'c'], '?') AS miss,
        |  transform(9, [1, 2], [10, 20]) AS keep,
        |  transform(array(1, 2, 3), x -> x * 10) AS hof""".stripMargin)
    assert(r.getString(0) == "b")
    assert(r.getString(1) == "?")
    assert(r.getInt(2) == 9)
    assert(r.getSeq[Int](3) == Seq(10, 20, 30))
  }

  test("array reorderings: partial sorts are sorted, shuffle permutes") {
    val r = row1(
      """SELECT arrayPartialSort(2, [5, 1, 4, 2]) AS ps,
        |  arrayPartialReverseSort(2, [5, 1, 4, 2]) AS prs,
        |  arraySort(arrayShuffle([3, 1, 2])) AS sh,
        |  size(arrayRandomSample([1, 2, 3, 4, 5], 3)) AS k""".stripMargin)
    assert(r.getSeq[Int](0) == Seq(1, 2, 4, 5))
    assert(r.getSeq[Int](1) == Seq(5, 4, 2, 1))
    assert(r.getSeq[Int](2) == Seq(1, 2, 3))
    assert(r.getInt(3) == 3)
  }

  test("random distributions stay in range") {
    val r = row1(
      """SELECT randUniform(5.0, 6.0) AS u, randNormal(0.0, 0.0) AS n,
        |  randExponential(2.0) AS e, randBernoulli(0.5) AS b""".stripMargin)
    assert(r.getDouble(0) >= 5.0 && r.getDouble(0) < 6.0)
    assert(r.getDouble(1) == 0.0) // sd 0 pins the mean
    assert(r.getDouble(2) >= 0.0)
    assert(r.getInt(3) == 0 || r.getInt(3) == 1)
  }

  test("AES encrypt/decrypt round-trips") {
    val r = row1(
      """SELECT toString(decrypt('aes-128-ecb',
        |    encrypt('aes-128-ecb', 'secret text', '0123456789abcdef'),
        |    '0123456789abcdef')) AS ecb,
        |  toString(decrypt('aes-256-gcm',
        |    encrypt('aes-256-gcm', 'gcm payload',
        |      '0123456789abcdef0123456789abcdef'),
        |    '0123456789abcdef0123456789abcdef')) AS gcm""".stripMargin)
    assert(r.getString(0) == "secret text")
    assert(r.getString(1) == "gcm payload")
  }

  test("jumpConsistentHash matches an independent implementation") {
    def ref(key: Long, buckets: Int): Int = {
      var k = key; var b = -1L; var j = 0L
      while (j < buckets) {
        b = j
        k = k * 2862933555777941757L + 1
        j = (((b + 1).toDouble * (1L << 31).toDouble) /
          (((k >>> 33) + 1).toDouble)).toLong
      }
      b.toInt
    }
    val r = row1(
      """SELECT jumpConsistentHash(42, 57) AS a,
        |  jumpConsistentHash(10863919174838991, 11) AS b,
        |  jumpConsistentHash(7, 1) AS c""".stripMargin)
    assert(r.getInt(0) == ref(42, 57))
    assert(r.getInt(1) == ref(10863919174838991L, 11))
    assert(r.getInt(2) == 0)
    // bucket movement property: growing buckets only ever moves keys
    // INTO the new bucket
    for (k <- 0 until 50)
      assert(ref(k, 10) == ref(k, 11) || ref(k, 11) == 10)
  }

  test("morton and hilbert codes round-trip") {
    val r = row1(
      """SELECT mortonEncode(3, 1) AS me,
        |  mortonDecode(2, mortonEncode(12345, 67890)) AS md,
        |  hilbertEncode(0, 0) AS h0,
        |  hilbertDecode(2, hilbertEncode(12345, 67890)) AS hd""".stripMargin)
    assert(r.getLong(0) == 7L) // interleave(11, 01) = 111
    assert(r.getStruct(1) == Row(12345L, 67890L))
    assert(r.getLong(2) == 0L)
    assert(r.getStruct(3) == Row(12345L, 67890L))
  }

  test("compression ratio orders repetitive < prose < random (t19)") {
    val rep = "ab " * 200
    val prose = (1 to 60).map(i => s"word$i of ordinary varied text")
      .mkString(" ")
    val rand = new scala.util.Random(7)
    val noise = Seq.fill(600)(rand.nextPrintableChar()).mkString
    val df = Seq((1L, rep), (2L, prose), (3L, noise)).toDF("id", "t")
    val got = df.select($"id",
        graft.operators.Text.compressionRatio($"t").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) < got(2L) && got(2L) < got(3L), got)
    assert(got(1L) < 0.15 && got(3L) > 0.7)
    // deterministic across evaluations
    val again = df.select($"id",
        graft.operators.Text.compressionRatio($"t").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }

  test("format, special functions, integer powers, typed defaults") {
    val r = row1(
      """SELECT format('{} has {} items', 'cart', 3) AS f,
        |  format('{1} then {0}', 'a', 'b') AS fp,
        |  round(erf(1.0), 5) AS e1, round(erfc(-0.5), 5) AS e2,
        |  round(lgamma(7.0), 8) AS lg,
        |  round(tgamma(5.0), 8) AS tg,
        |  intExp2(10) AS p2, intExp10(6) AS p10,
        |  identity(42) AS idn, ignore('x', 1) AS ign,
        |  concatAssumeInjective('a', 'b') AS ci,
        |  defaultValueOfTypeName('UInt32') AS dv,
        |  toString(fromUnixTimestamp64Milli(1609459200123)) AS ms,
        |  toString(fromUnixTimestamp64Nano(1609459200123456789)) AS ns""".stripMargin)
    assert(r.getString(0) == "cart has 3 items")
    assert(r.getString(1) == "b then a")
    assert(math.abs(r.getDouble(2) - 0.8427) < 1e-3)   // erf(1)
    assert(math.abs(r.getDouble(3) - 1.5205) < 1e-3)   // erfc(-0.5)
    assert(math.abs(r.getDouble(4) - math.log(720.0)) < 1e-7) // ln 6!
    assert(math.abs(r.getDouble(5) - 24.0) < 1e-7)     // 4!
    assert(r.getLong(6) == 1024L && r.getLong(7) == 1000000L)
    assert(r.getInt(8) == 42 && r.getInt(9) == 0)
    assert(r.getString(10) == "ab")
    assert(r.getLong(11) == 0L)
    assert(r.getString(12) == "2021-01-01 00:00:00.123")
    assert(r.getString(13) == "2021-01-01 00:00:00.123456")
    intercept[Exception] {
      spark.sql(ChSql.translate("SELECT byteSize(1)")).collect()
    }
  }

  test("sequenceMatchEvents returns the first matched chain's times") {
    Seq(
      (1L, 10, "a"), (1L, 20, "b"), (1L, 30, "a"), (1L, 40, "c"),
      (2L, 10, "b"), (2L, 20, "b")
    ).toDF("u", "k", "ev")
      .selectExpr("u", "timestamp_micros(k * 1000000) AS ts", "ev")
      .createOrReplaceTempView("sme")
    val rs = spark.sql(ChSql.translate(
      """SELECT u, sequenceMatchEvents('(?1).*(?2)')(
        |  ts, ev = 'a', ev = 'c') AS m
        |FROM sme GROUP BY u ORDER BY u""".stripMargin)).collect()
    val t1 = rs(0).getSeq[java.sql.Timestamp](1)
    assert(t1.map(_.getTime) == Seq(10000L, 40000L)) // first a, then c
    assert(rs(1).getSeq[java.sql.Timestamp](1).isEmpty)
  }

  test("isIPAddressInRange covers both families") {
    val r = row1(
      """SELECT isIPAddressInRange('127.0.0.1', '127.0.0.0/8') AS a,
        |  isIPAddressInRange('128.0.0.1', '127.0.0.0/8') AS b,
        |  isIPAddressInRange('ffff::1', 'ffff::/16') AS c,
        |  isIPAddressInRange('fffe::1', 'ffff::/16') AS d,
        |  isIPAddressInRange('127.0.0.1', 'ffff::/16') AS e""".stripMargin)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(!r.getBoolean(4))
  }
}
