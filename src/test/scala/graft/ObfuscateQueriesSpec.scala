package graft

import graft.functions.ObfuscateQueries

/** obfuscateQueries (reference: src/Parsers/obfuscateQueries.cpp —
  * the clickhouse-format --obfuscate feature). The reference ships no
  * pinned outputs, so the contract under test is the documented
  * STRUCTURAL one: keywords/known functions survive, identifiers
  * rename consistently and collision-free with case style preserved,
  * literals keep their shape (power-of-two magnitude, date ranges,
  * string length/punctuation), comments drop, and everything is
  * deterministic in the seed. */
class ObfuscateQueriesSpec extends SparkSpec {

  private def ob(q: String, seed: String = "s",
      known: String => Boolean = Set("count", "sum", "toDate").contains) =
    ObfuscateQueries.obfuscate(q, seed, known)

  test("keywords and known function names survive; identifiers do not") {
    val got = ob("SELECT count(secret_metric) FROM hidden_table WHERE flag AND x")
    assert(got.startsWith("SELECT count("))
    assert(got.contains(" FROM "))
    assert(got.contains(" WHERE "))
    assert(got.contains(" AND "))
    assert(!got.contains("secret"))
    assert(!got.contains("metric"))
    assert(!got.contains("hidden"))
    assert(!got.contains("hidden_table"))
    // shape: the underscore survives, both words renamed
    assert("""FROM ([a-z]+)_([a-z]+) WHERE""".r.findFirstIn(got).isDefined, got)
  }

  test("renames are consistent within and across calls, and collision-free") {
    val maps = new ObfuscateQueries.Maps
    val a = ObfuscateQueries.obfuscate(
      "SELECT foo, bar, foo FROM baz", "s", Set.empty[String].contains, maps)
    val words = a.stripPrefix("SELECT ").replace(" FROM ", ", ")
      .split(", ").toSeq
    assert(words.size == 4, a)
    assert(words(0) == words(2), s"same identifier diverged: $a")
    assert(Set(words(0), words(1), words(3)).size == 3,
      s"distinct identifiers collided: $a")
    // a later query through the SAME map keeps the mapping
    val b = ObfuscateQueries.obfuscate(
      "SELECT foo FROM other", "s", Set.empty[String].contains, maps)
    assert(b.contains(words(0)), s"$b vs ${words(0)}")
    // determinism: fresh maps, same seed -> identical output
    assert(ob("SELECT foo, bar, foo FROM baz", "s", Set.empty[String].contains)
      == ob("SELECT foo, bar, foo FROM baz", "s", Set.empty[String].contains))
    // a different seed moves the mapping
    assert(ob("SELECT longish_identifier_name FROM t2", "s")
      != ob("SELECT longish_identifier_name FROM t2", "other_seed"))
  }

  test("capitalization style and keep-words are preserved") {
    val got = ob("SELECT UserName, USER_ID, id, value FROM T")
    val cols = got.stripPrefix("SELECT ").split(" FROM ")(0).split(", ")
    // CamelCase -> two First-cap words glued
    assert(cols(0).head.isUpper && cols(0).exists(_.isUpper), got)
    assert("""^([A-Z][a-z]+){2}$""".r.findFirstIn(cols(0)).isDefined, got)
    // ALL_CAPS word + kept ID
    assert(cols(1).matches("""[A-Z]+_ID"""), got)
    assert(cols(2) == "id" && cols(3) == "value", got)
  }

  test("numbers keep zero/one and their power-of-two magnitude") {
    val got = ob("SELECT x + 0, y + 1, z + 100, w + 7 FROM t")
    val nums = """\+ (\d+)""".r.findAllMatchIn(got).map(_.group(1)).toSeq
    assert(nums(0) == "0" && nums(1) == "1", got)
    assert(nums(2).toLong >= 64 && nums(2).toLong <= 127, got)
    assert(nums(3).toLong >= 4 && nums(3).toLong <= 7, got)
    // deterministic per (seed, literal)
    assert(ob("SELECT x + 100 FROM t") == ob("SELECT x + 100 FROM t"))
  }

  test("dates shift within 255 days, epoch stays, times stay valid clock values") {
    val got = ob("SELECT toDate('2024-03-15'), toDate('1970-01-01'), d('2024-03-15 23:59:58')")
    val dates = """'([^']+)'""".r.findAllMatchIn(got).map(_.group(1)).toSeq
    val base = java.time.LocalDate.parse("2024-03-15").toEpochDay
    val d0 = java.time.LocalDate.parse(dates(0)).toEpochDay
    assert(d0 >= base && d0 < base + 256, got)
    assert(dates(1) == "1970-01-01", got)
    val dt = """^(\d{4}-\d{2}-\d{2}) (\d{2}):(\d{2}):(\d{2})$""".r
    dates(2) match {
      case dt(d, hh, mm, ss) =>
        assert(java.time.LocalDate.parse(d).toEpochDay == d0, got)
        assert(hh.toInt < 24 && mm.toInt < 60 && ss.toInt < 60, got)
      case _ => fail(s"datetime shape lost: $got")
    }
    // the same date literal obfuscates identically everywhere
    assert(dates(0) == dates(2).split(" ")(0) ||
      java.time.LocalDate.parse(dates(2).split(" ")(0)).toEpochDay == d0, got)
  }

  test("string literals keep length and punctuation, scramble letters case-preserving") {
    val got = ob("SELECT 'Hello, World! 42' FROM t")
    val lit = """'([^']*)'""".r.findFirstMatchIn(got).get.group(1)
    assert(lit.length == "Hello, World! 42".length, got)
    assert(lit.charAt(5) == ',' && lit.charAt(6) == ' ', got)
    assert(lit.charAt(12) == '!' && lit.charAt(13) == ' ', got)
    assert(lit.charAt(0).isUpper && lit.charAt(1).isLower, got)
    assert(!lit.contains("Hello") && !lit.contains("World"), got)
    // the 42 keeps magnitude: two digits? 42 -> [32, 63] - 2 digits
    val tail = lit.split("! ")(1)
    assert(tail.forall(_.isDigit) && tail.toInt >= 32 && tail.toInt <= 63, got)
  }

  test("comments drop; long quoted identifiers hash; backquotes survive") {
    val got = ob("SELECT a /* secret note */ FROM t -- another secret\n LIMIT 1")
    assert(!got.contains("secret"), got)
    assert(got.contains("LIMIT 1"), got)
    val longId = "`" + ("x" * 40) + "`"
    val got2 = ob(s"SELECT $longId FROM t")
    val inner = """`([^`]*)`""".r.findFirstMatchIn(got2).get.group(1)
    assert(inner.forall(_.isDigit), s"expected hash digits, got $got2")
    val got3 = ob("SELECT `short_col` FROM t")
    assert("""`[a-z]+_[a-z]+`""".r.findFirstIn(got3).isDefined, got3)
  }

  test("too many unique identifiers fails loudly instead of colliding") {
    val maps = new ObfuscateQueries.Maps
    val e = intercept[IllegalArgumentException] {
      (0 until 100000).foreach(i => ObfuscateQueries.obfuscate(
        s"SELECT qq$i FROM t", "s", Set.empty[String].contains, maps))
    }
    assert(e.getMessage.contains("too many unique identifiers"))
  }

  test("an obfuscated query still parses and executes (structure preserved end-to-end)") {
    // the whole point of the feature: share a query's SHAPE without
    // its content — so the obfuscated text must remain a runnable
    // query of the same statement structure
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT id AS user_key, id % 3 AS revenue_band, " +
        "CAST(id AS DOUBLE) AS monthly_spend FROM range(100)")
      .createOrReplaceTempView("secret_accounts")
    val known = ObfuscateQueries.withRegistry(spark)
    val src = "SELECT revenue_band, count(*) AS n, " +
      "round(avg(monthly_spend), 2) AS avg_spend " +
      "FROM secret_accounts WHERE monthly_spend > 10 " +
      "GROUP BY revenue_band ORDER BY revenue_band LIMIT 10"
    val maps = new ObfuscateQueries.Maps
    val ob = ObfuscateQueries.obfuscate(src, "e2e", known, maps)
    assert(!ob.contains("secret") && !ob.contains("revenue") &&
      !ob.contains("monthly"), ob)
    // register the renamed view so the obfuscated query can run; the
    // consistent map tells us what each identifier became
    def renamed(word: String): String =
      ObfuscateQueries.obfuscate(word, "e2e", known, maps)
    spark.sql(s"SELECT id AS ${renamed("user_key")}, " +
        s"id % 3 AS ${renamed("revenue_band")}, " +
        s"CAST(id AS DOUBLE) AS ${renamed("monthly_spend")} FROM range(100)")
      .createOrReplaceTempView(renamed("secret_accounts"))
    val got = graft.functions.ChDdl.execute(spark, ob).collect()
    // same shape: 3 bands, counts — and the LITERALS changed, so the
    // values differ from the original's (the threshold moved within
    // the same power of two, [8, 15]); what matters is it RUNS and
    // groups the same way
    assert(got.length == 3, got.mkString(", "))
    val total = got.map(_.getLong(1)).sum
    assert(total >= 84 && total <= 91, s"total $total")
  }

  test("withRegistry keeps graft dialect and builtin names intact") {
    val known = ObfuscateQueries.withRegistry(spark)
    val got = ObfuscateQueries.obfuscate(
      "SELECT uniqExact(x), sumIf(y, z > 1), toStartOfDay(d) FROM t", "s", known)
    assert(got.contains("uniqExact("), got)
    assert(got.contains("sumIf("), got)
    assert(got.contains("toStartOfDay("), got)
    assert(!got.contains("FROM t "), got) // the table still renames
  }
}
