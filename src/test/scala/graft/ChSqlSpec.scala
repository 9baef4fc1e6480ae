package graft

import graft.functions.{ChSql, GraftFunctions}
import graft.sources.Tables

/** The clause translator, end-to-end: ClickHouse-only SQL through
  * ChSql.translate + spark.sql, compared against the equivalent
  * DataFrame plans. */
class ChSqlSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def run(chSql: String): org.apache.spark.sql.DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    Tables(spark, sfDir).orders.createOrReplaceTempView("orders")
    spark.sql(ChSql.translate(chSql))
  }

  test("PREWHERE alone becomes WHERE") {
    val got = run(
      "SELECT o_orderkey FROM orders PREWHERE o_orderstatus = 'F' ORDER BY o_orderkey")
      .as[Long].collect().toSeq
    val expect = Tables(spark, sfDir).orders
      .filter($"o_orderstatus" === "F").select("o_orderkey")
      .orderBy("o_orderkey").as[Long].collect().toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("PREWHERE merges with WHERE under AND") {
    val got = run(
      """SELECT o_orderkey FROM orders
        |PREWHERE o_orderstatus = 'F' WHERE o_totalprice > 100000
        |ORDER BY o_orderkey""".stripMargin).as[Long].collect().toSeq
    val expect = Tables(spark, sfDir).orders
      .filter($"o_orderstatus" === "F" && $"o_totalprice" > 100000)
      .select("o_orderkey").orderBy("o_orderkey").as[Long].collect().toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("LIMIT n BY keeps the first n rows per group in query order") {
    val got = run(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 2 BY o_custkey""".stripMargin)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val expect = graft.operators.LimitBy(
        Tables(spark, sfDir).orders, 2,
        by = Seq(col("o_custkey")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey").asc))
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("LIMIT n BY honours a final LIMIT") {
    val got = run(
      """SELECT o_custkey, o_orderkey FROM orders
        |ORDER BY o_orderkey LIMIT 1 BY o_custkey LIMIT 10""".stripMargin).count()
    assert(got == 10)
  }

  test("SAMPLE f BY key becomes the deterministic hash-range predicate") {
    val got = run(
      """SELECT o_orderkey FROM orders SAMPLE 0.1 BY o_orderkey
        |ORDER BY o_orderkey""".stripMargin).as[Long].collect().toSeq
    val expect = graft.operators.Sample.byHashRange(
        Tables(spark, sfDir).orders, "o_orderkey", 0.1)
      .select("o_orderkey").orderBy("o_orderkey").as[Long].collect().toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("SAMPLE rational, OFFSET window, and absolute row-count forms") {
    // rational 1/10 is the same cut as decimal 0.1
    val dec = run(
      "SELECT o_orderkey FROM orders SAMPLE 0.1 BY o_orderkey ORDER BY o_orderkey")
      .as[Long].collect().toSeq
    val rat = run(
      "SELECT o_orderkey FROM orders SAMPLE 1/10 BY o_orderkey ORDER BY o_orderkey")
      .as[Long].collect().toSeq
    assert(rat == dec && rat.nonEmpty)
    // OFFSET windows tile: [0,0.5) ∪ [0.5..1] = everything, disjoint
    val lo = run(
      "SELECT o_orderkey FROM orders SAMPLE 0.5 BY o_orderkey ORDER BY o_orderkey")
      .as[Long].collect().toSet
    val hi = run(
      "SELECT o_orderkey FROM orders SAMPLE 0.5 OFFSET 0.5 BY o_orderkey ORDER BY o_orderkey")
      .as[Long].collect().toSet
    val all = Tables(spark, sfDir).orders.select("o_orderkey").as[Long].collect().toSet
    assert((lo & hi).isEmpty, "offset windows must be disjoint")
    assert(lo ++ hi == all, "offset windows must tile the table")
    // absolute row count: approximately n rows survive (hash-uniform)
    val n = 300
    val abs = run(
      s"SELECT o_orderkey FROM orders SAMPLE $n BY o_orderkey").count()
    assert(abs > n * 0.7 && abs < n * 1.3, s"SAMPLE $n returned $abs rows")
    // SAMPLE 1 is ratio 1 — the whole table
    val one = run("SELECT o_orderkey FROM orders SAMPLE 1 BY o_orderkey").count()
    assert(one == all.size)
    // absolute + OFFSET is not in the reference's grammar — refuse
    val e = intercept[IllegalArgumentException] {
      graft.functions.ChSql.translate(
        "SELECT o_orderkey FROM orders SAMPLE 300 OFFSET 0.5 BY o_orderkey")
    }
    assert(e.getMessage.contains("OFFSET"))
  }

  test("double-quoted identifiers and JSON data stay atomic through the lexer") {
    import graft.functions.ChSql
    // a keyword inside a double-quoted identifier never triggers a rewrite
    assert(ChSql.translate("""SELECT "final col" FROM t""")
      == """SELECT "final col" FROM t""")
    // a ';' inside double quotes must not split a multi-statement script
    graft.functions.GraftFunctions.ensureRegistered(spark)
    graft.functions.ChDdl.execute(spark,
      """CREATE TABLE graft_dq (k Int64, s String) ENGINE = MergeTree() ORDER BY (k);
        |INSERT INTO graft_dq FORMAT JSONEachRow
        |{"k": 1, "s": "a;b"}""".stripMargin)
    val got = spark.table("graft_dq").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a;b")), got)
  }

  test("string literals containing keywords survive untouched") {
    val t = ChSql.translate("SELECT 'PREWHERE LIMIT 3 BY x SAMPLE' AS s FROM orders")
    assert(t.contains("'PREWHERE LIMIT 3 BY x SAMPLE'"))
    assert(run("SELECT 'PREWHERE LIMIT 3 BY x SAMPLE' AS s FROM orders").count() > 0)
  }

  test("GLOBAL hint and FORMAT clause are stripped; numbers() becomes range()") {
    GraftFunctions.ensureRegistered(spark)
    Tables(spark, sfDir).orders.createOrReplaceTempView("orders")
    val got = spark.sql(ChSql.translate(
      """SELECT o_orderkey FROM orders
        |WHERE o_custkey GLOBAL IN (SELECT number FROM numbers(50))
        |ORDER BY o_orderkey FORMAT TabSeparated""".stripMargin))
      .as[Long].collect().toSeq
    val expect = Tables(spark, sfDir).orders
      .filter($"o_custkey" < 50).select("o_orderkey")
      .orderBy("o_orderkey").as[Long].collect().toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("generateRandom supplies deterministic typed rows") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.sql(ChSql.translate(
      """SELECT * FROM generateRandom(
        |  'a Int32, b String, c Float64, d Date, e Array(Int64), f FixedString(8)',
        |  42, 12, 4) LIMIT 100""".stripMargin))
    assert(df.columns.toSeq == Seq("a", "b", "c", "d", "e", "f"))
    val rows = df.collect()
    assert(rows.length == 100)
    val schema = df.schema.map(_.dataType.simpleString)
    assert(schema == Seq("int", "string", "double", "date",
      "array<bigint>", "string"), schema)
    // value contracts: doubles in [0,1), strings within maxStrLen,
    // arrays within maxArrLen, FixedString exactly n chars
    assert(rows.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) < 1))
    assert(rows.forall(r => r.getString(1).length <= 12))
    assert(rows.forall(r => r.getSeq[Long](4).length <= 4))
    assert(rows.forall(r => r.getString(5).length == 8))
    // same seed → same stream; different seed → different stream
    val again = spark.sql(ChSql.translate(
      "SELECT a FROM generateRandom('a Int32', 42) LIMIT 50")).collect().map(_.getInt(0)).toSeq
    val again2 = spark.sql(ChSql.translate(
      "SELECT a FROM generateRandom('a Int32', 42) LIMIT 50")).collect().map(_.getInt(0)).toSeq
    val other = spark.sql(ChSql.translate(
      "SELECT a FROM generateRandom('a Int32', 7) LIMIT 50")).collect().map(_.getInt(0)).toSeq
    assert(again == again2 && again != other)
    // non-literal schema refuses with the translator's message
    val e = intercept[Exception] {
      ChSql.translate("SELECT * FROM generateRandom(x)")
    }
    assert(e.getMessage.contains("generateRandom"))
    // a LIMIT above the 2^20 default row supply scales the supply
    // (used to silently return fewer rows than asked)
    val big = spark.sql(ChSql.translate(
      "SELECT count() AS n FROM (SELECT * FROM generateRandom('a Int64', 1) LIMIT 1200000)"))
      .collect().head.getLong(0)
    assert(big == 1200000L, s"LIMIT above the default cap must be honored, got $big")
    // LIMIT offset, n form needs offset + n rows of supply
    val offs = spark.sql(ChSql.translate(
      "SELECT count() AS n FROM (SELECT * FROM generateRandom('a Int64', 1) LIMIT 1100000, 200000)"))
      .collect().head.getLong(0)
    assert(offs == 200000L, s"LIMIT offset, n above the cap must be honored, got $offs")
  }

  test("ORDER BY COLLATE sorts locale-aware; binary spellings sort by bytes") {
    GraftFunctions.ensureRegistered(spark)
    Seq("b", "A", "a", "B").toDF("s").createOrReplaceTempView("graft_coll")
    // UNICODE root collation interleaves case (a, A, b, B); binary
    // sorts uppercase first (A, B, a, b)
    val uni = spark.sql(ChSql.translate(
      "SELECT s FROM graft_coll ORDER BY s COLLATE 'en'"))
      .as[String].collect().toSeq
    assert(uni == Seq("a", "A", "b", "B") || uni == Seq("A", "a", "B", "b"), uni)
    val bin = spark.sql(ChSql.translate(
      "SELECT s FROM graft_coll ORDER BY s COLLATE 'binary'"))
      .as[String].collect().toSeq
    assert(bin == Seq("A", "B", "a", "b"), bin)
    // direction tokens stay outside the collated expression
    val desc = spark.sql(ChSql.translate(
      "SELECT s FROM graft_coll ORDER BY s DESC COLLATE 'binary'"))
      .as[String].collect().toSeq
    assert(desc == Seq("b", "a", "B", "A"), desc)
    // function expressions wrap whole
    val fn = spark.sql(ChSql.translate(
      "SELECT s FROM graft_coll ORDER BY concat(s, 'x') COLLATE 'binary', s"))
      .as[String].collect().toSeq
    assert(fn == Seq("A", "B", "a", "b"), fn)
  }

  test("plain Spark SQL passes through unchanged") {
    val q = "SELECT o_orderkey FROM orders WHERE o_totalprice > 1 ORDER BY o_orderkey LIMIT 5"
    assert(ChSql.translate(q) == q)
  }

  private def runDocs(chSql: String): org.apache.spark.sql.DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    Tables(spark, sfDir).documents.createOrReplaceTempView("documents")
    spark.sql(ChSql.translate(chSql))
  }

  test("ARRAY JOIN expr AS alias becomes LATERAL VIEW explode") {
    val got = runDocs(
      """SELECT doc_id, w FROM documents
        |ARRAY JOIN splitByChar(' ', text) AS w
        |WHERE lengthUTF8(w) > 6 ORDER BY doc_id, w""".stripMargin)
      .as[(Long, String)].collect().toSeq
    val expect = Tables(spark, sfDir).documents
      .select(col("doc_id"), explode(split(col("text"), "\\Q \\E", -1)).as("w"))
      .filter(length($"w") > 6).orderBy("doc_id", "w")
      .as[(Long, String)].collect().toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("LEFT ARRAY JOIN keeps rows whose array is empty") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, array(10, 20)), (2, array()) AS t(id, xs)")
      .createOrReplaceTempView("aj_t")
    val got = spark.sql(ChSql.translate(
      "SELECT id, x FROM aj_t LEFT ARRAY JOIN xs AS x ORDER BY id, x"))
      .as[(Int, Option[Int])].collect().toSeq
    assert(got == Seq((1, Some(10)), (1, Some(20)), (2, None)))
  }

  test("bare-column ARRAY JOIN shadows the array with its elements") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, array(3, 1)), (2, array(5)) AS t(id, xs)")
      .createOrReplaceTempView("aj_b")
    val got = spark.sql(ChSql.translate(
      "SELECT id, xs FROM aj_b ARRAY JOIN xs ORDER BY id, xs"))
      .as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 1), (1, 3), (2, 5)))
  }

  test("multi-array ARRAY JOIN zips in lockstep, not cross product") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, array(1, 2), array('a', 'b')) AS t(id, xs, ys)")
      .createOrReplaceTempView("aj_z")
    val got = spark.sql(ChSql.translate(
      "SELECT id, x, y FROM aj_z ARRAY JOIN xs AS x, ys AS y ORDER BY x"))
      .select("id", "x", "y").as[(Int, Int, String)].collect().toSeq
    assert(got == Seq((1, 1, "a"), (1, 2, "b")))
  }

  test("FROM t FINAL strips the FINAL keyword") {
    val got = run(
      "SELECT o_orderkey FROM orders FINAL PREWHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 5")
    assert(got.count() == 5)
  }

  test("WITH FILL FROM/TO/STEP densifies the key, TO exclusive") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, 10), (3, 30), (8, 80) AS t(k, v)")
      .createOrReplaceTempView("wf_t")
    val got = spark.sql(ChSql.translate(
      "SELECT k, v FROM wf_t ORDER BY k WITH FILL FROM 1 TO 7 STEP 2"))
      .as[(Int, Option[Int])].collect().toSeq
    // spine 1,3,5 (7 exclusive) ∪ original 1,3,8 → 1,3,5,8
    assert(got == Seq((1, Some(10)), (3, Some(30)), (5, None), (8, Some(80))))
  }

  test("WITH FILL preserves a trailing LIMIT instead of dropping it") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, 10), (8, 80) AS t(k, v)")
      .createOrReplaceTempView("wf_l")
    val got = spark.sql(ChSql.translate(
      "SELECT k, v FROM wf_l ORDER BY k WITH FILL FROM 1 TO 9 LIMIT 3"))
      .as[(Int, Option[Int])].collect().toSeq
    assert(got == Seq((1, Some(10)), (2, None), (3, None)), got)
  }

  test("WITH FILL on multiple sort keys cross-joins the per-key spines") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, 1, 11), (2, 3, 23) AS t(a, b, v)")
      .createOrReplaceTempView("wf_m")
    val got = spark.sql(ChSql.translate(
      """SELECT a, b, v FROM wf_m
        |ORDER BY a WITH FILL FROM 1 TO 3, b WITH FILL FROM 1 TO 4 STEP 2""".stripMargin))
      .as[(Int, Int, Option[Int])].collect().toSeq
    // grid {1,2}×{1,3} plus the original rows (both on-grid here)
    assert(got == Seq(
      (1, 1, Some(11)), (1, 3, None),
      (2, 1, None), (2, 3, Some(23))), got)
  }

  test("a non-fill second sort key rides along instead of being dropped") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, 5, 10), (1, 2, 20), (3, 9, 30) AS t(k, s, v)")
      .createOrReplaceTempView("wf_n")
    val got = spark.sql(ChSql.translate(
      "SELECT k, s, v FROM wf_n ORDER BY k WITH FILL FROM 1 TO 4, s DESC"))
      .as[(Int, Option[Int], Option[Int])].collect().toSeq
    // k densified to 1,2,3; within k=1 the two rows order by s DESC
    assert(got == Seq(
      (1, Some(5), Some(10)), (1, Some(2), Some(20)),
      (2, None, None), (3, Some(9), Some(30))), got)
  }

  test("WITH FILL without bounds spans min..max of the result") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (2, 20), (5, 50) AS t(k, v)")
      .createOrReplaceTempView("wf_u")
    val got = spark.sql(ChSql.translate(
      "SELECT k, v FROM wf_u ORDER BY k WITH FILL"))
      .as[(Int, Option[Int])].collect().toSeq
    assert(got == Seq((2, Some(20)), (3, None), (4, None), (5, Some(50))))
  }

  test("query parameters substitute with typed literal rendering") {
    import graft.functions.ChSql.substituteParams
    assert(substituteParams(
      "SELECT * FROM t WHERE k = {k:Int64} AND f < {f:Float64}",
      Map("k" -> "42", "f" -> "1.5"))
      == "SELECT * FROM t WHERE k = 42 AND f < 1.5")
    // strings quote, embedded quotes escape
    assert(substituteParams(
      "SELECT * FROM t WHERE name = {n:String}", Map("n" -> "o'brien"))
      == "SELECT * FROM t WHERE name = 'o''brien'")
    // date/timestamp render as typed literals; Identifier inlines
    assert(substituteParams(
      "SELECT * FROM {t:Identifier} WHERE d = {d:Date}",
      Map("t" -> "orders", "d" -> "2024-01-05"))
      == "SELECT * FROM orders WHERE d = DATE '2024-01-05'")
    // arrays: the client's [..] syntax becomes array(…), inner type applies
    assert(substituteParams(
      "SELECT * FROM t WHERE k IN {ks:Array(Int64)} AND s IN {ss:Array(String)}",
      Map("ks" -> "[1, 2, 3]", "ss" -> "['a', 'it''s']"))
      == "SELECT * FROM t WHERE k IN array(1, 2, 3) AND s IN array('a', 'it''s')")
    // a non-numeric value against a numeric type is a translator error
    intercept[IllegalArgumentException] {
      substituteParams("SELECT {k:Int64}", Map("k" -> "1; DROP TABLE t"))
    }
    // end-to-end through execute()
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Tables(spark, sfDir).orders.createOrReplaceTempView("orders")
    val n = graft.functions.ChDdl.execute(spark,
      "SELECT count() AS n FROM orders WHERE o_orderpriority = {p:String} AND o_totalprice > {cut:Float64}",
      Map("p" -> "1-URGENT", "cut" -> "100000"))
      .as[Long].head()
    val expect = Tables(spark, sfDir).orders
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 100000).count()
    assert(n == expect && n > 0)
  }

  test("parametric aggregates fold into single-call dialect forms") {
    val got = run(
      """SELECT count() AS n, quantile(0.5)(o_totalprice) AS med,
        |  topK(3)(o_orderpriority) AS top3, uniqCombined(12)(o_custkey) AS u
        |FROM orders""".stripMargin)
    val row = got.collect().head
    assert(row.getAs[Long]("n") > 0)
    assert(row.getAs[Double]("med") > 0)
    assert(row.getAs[scala.collection.Seq[_]]("top3").size == 3)
    assert(row.getAs[Long]("u") > 0)
  }

  test("EXPLAIN with CH modes maps to Spark EXPLAIN of the translated query") {
    val df = run(
      "EXPLAIN PIPELINE SELECT o_orderkey FROM orders PREWHERE o_orderstatus = 'F' SETTINGS max_threads = 8")
    val plan = df.as[String].collect().mkString("\n")
    assert(plan.contains("Physical Plan") || plan.contains("FileScan"), plan)
    // EXPLAIN SYNTAX answers the rewritten (translated) query itself,
    // like the reference's parsed-AST print-back
    val syn = graft.functions.ChDdl.execute(spark,
      "EXPLAIN SYNTAX SELECT o_orderkey FROM orders PREWHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 2 BY o_custkey")
      .collect().head.getString(0)
    assert(syn.toLowerCase.contains("row_number") &&
      syn.toLowerCase.contains("where"), syn)
  }

  test("ternary ?: rewrites to if() — loosest binding, right-associative") {
    val one = run(
      """SELECT o_orderkey, o_totalprice > 150000 ? 'big' : 'small' AS b,
        |  o_orderkey % 2 = 0 AND o_orderkey % 3 = 0 ? 'six' :
        |    o_orderkey % 2 = 0 ? 'two' : 'odd' AS nested,
        |  concat(o_orderkey % 2 = 0 ? 'e' : 'o', '!') AS inner
        |FROM orders ORDER BY o_orderkey LIMIT 6""".stripMargin)
      .collect()
    assert(one.map(_.getString(1)).toSet.subsetOf(Set("big", "small")))
    val nested = one.map(r => (r.getLong(0), r.getString(2)))
    nested.foreach { case (k, v) =>
      val expect = if (k % 6 == 0) "six" else if (k % 2 == 0) "two" else "odd"
      assert(v == expect, s"key $k: $v != $expect")
    }
    assert(one.forall(r => Set("e!", "o!")(r.getString(3))))
  }

  test("SETTINGS clause is stripped") {
    val got = run(
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3 SETTINGS max_threads = 4, join_algorithm = 'hash'")
    assert(got.count() == 3)
  }

  test("kitchen sink: FINAL + ARRAY JOIN + PREWHERE + LIMIT BY + SETTINGS + count() compose") {
    val got = runDocs(
      """SELECT doc_id, word, count() AS n FROM documents FINAL
        |ARRAY JOIN splitByChar(' ', text) AS word
        |PREWHERE lang = 'en'
        |GROUP BY doc_id, word
        |ORDER BY doc_id LIMIT 3 BY doc_id
        |SETTINGS max_threads = 8""".stripMargin)
    assert(got.count() > 0)
    // ≤ 3 rows per doc_id survived the LIMIT BY
    val perDoc = got.groupBy("doc_id").count()
      .agg(max("count")).as[Long].head()
    assert(perDoc <= 3)
  }

  test("WITH FILL INTERPOLATE carries the last value across filled rows") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, 10), (4, 40), (2500, 77) AS t(k, v)")
      .createOrReplaceTempView("wf_i")
    val got = spark.sql(ChSql.translate(
      "SELECT k, v FROM wf_i ORDER BY k WITH FILL FROM 1 TO 7 INTERPOLATE (v)"))
      .select("k", "v").as[(Int, Option[Int])].collect().sortBy(_._1).toSeq
    // filled rows 3,5,6 carry the last seen v; 2500 sits in a LATER
    // bucket and carries across the bucket boundary; row 2 carries 10
    assert(got == Seq(
      (1, Some(10)), (2, Some(10)), (3, Some(10)), (4, Some(40)),
      (5, Some(40)), (6, Some(40)), (2500, Some(77))), got)
  }

  test("ANY JOIN keeps at most one right match per key, both keyword orders") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1), (2), (3) AS t(k)").createOrReplaceTempView("aj_l")
    spark.sql(
      "SELECT * FROM VALUES (1, 'a'), (1, 'b'), (2, 'c') AS t(k2, v)")
      .createOrReplaceTempView("aj_r")
    for (form <- Seq(
        "SELECT l.k, r.v FROM aj_l l ANY LEFT JOIN aj_r r ON l.k = r.k2 ORDER BY l.k",
        "SELECT l.k, r.v FROM aj_l l LEFT ANY JOIN aj_r r ON l.k = r.k2 ORDER BY l.k")) {
      val got = spark.sql(ChSql.translate(form))
        .as[(Int, Option[String])].collect().toSeq
      // k=1 has TWO right rows — ANY keeps exactly one; k=3 unmatched
      assert(got.map(_._1) == Seq(1, 2, 3), s"$form -> $got")
      assert(got(0)._2.exists(Set("a", "b")) && got(1)._2.contains("c") && got(2)._2.isEmpty)
    }
  }

  test("scalar WITH substitutes names; CTE items pass through; forms mix") {
    val got = run(
      """WITH 100000 AS floor_price,
        |     big AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > floor_price)
        |SELECT COUNT(*) AS n FROM big WHERE o_totalprice > floor_price""".stripMargin)
      .as[Long].collect().head
    val expect = Tables(spark, sfDir).orders
      .filter($"o_totalprice" > 100000).count()
    assert(got == expect && got > 0)
  }

  test("LIMIT offset, count becomes LIMIT count OFFSET offset") {
    val got = run(
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5, 3")
      .as[Long].collect().toSeq
    val expect = Tables(spark, sfDir).orders.select("o_orderkey")
      .orderBy("o_orderkey").offset(5).limit(3).as[Long].collect().toSeq
    assert(got == expect && got.size == 3)
  }

  test("GROUP BY WITH TOTALS adds exactly one all-null totals row") {
    val got = run(
      """SELECT o_orderstatus AS st, count() AS n FROM orders
        |GROUP BY o_orderstatus WITH TOTALS
        |ORDER BY st ASC NULLS FIRST""".stripMargin)
      .as[(Option[String], Long)].collect().toSeq
    val totalRow = got.filter(_._1.isEmpty)
    assert(totalRow.size == 1)
    assert(totalRow.head._2 == got.filter(_._1.nonEmpty).map(_._2).sum)
  }

  test("UNION branches each get their own PREWHERE/FINAL rewrite") {
    val got = run(
      """SELECT o_orderkey FROM orders FINAL PREWHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey FROM orders FINAL PREWHERE o_orderstatus = 'P'""".stripMargin)
      .count()
    val expect = Tables(spark, sfDir).orders
      .filter($"o_orderstatus".isin("F", "P")).count()
    assert(got == expect && got > 0)
  }

  test("CH-only clauses inside a derived table are translated recursively") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, 10), (4, 40) AS t(k, v)")
      .createOrReplaceTempView("wf_s")
    val got = spark.sql(ChSql.translate(
      """SELECT k, ifNull(v, 0) AS v FROM (
        |  SELECT k, v FROM wf_s ORDER BY k WITH FILL
        |) ORDER BY k""".stripMargin))
      .as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 10), (2, 0), (3, 0), (4, 40)))
  }

  test("CH 2-arg extract rewrites to regexp_extract; SQL EXTRACT FROM survives") {
    // no capturing group → whole match (idx 0)
    assert(ChSql.translate("SELECT extract(s, '[a-z]+') FROM t")
      == "SELECT regexp_extract(s, '[a-z]+', 0) FROM t")
    // capturing group in the PATTERN → group 1
    assert(ChSql.translate("SELECT extract(s, 'x([a-z]+)') FROM t")
      == "SELECT regexp_extract(s, 'x([a-z]+)', 1) FROM t")
    // parens in the HAYSTACK argument must not trip the group rule
    assert(ChSql.translate("SELECT extract(upper(s), '[A-Z]+') FROM t")
      == "SELECT regexp_extract(upper(s), '[A-Z]+', 0) FROM t")
    // the datetime form is Spark's own — untouched
    assert(ChSql.translate("SELECT EXTRACT(YEAR FROM ts) FROM t")
      == "SELECT EXTRACT(YEAR FROM ts) FROM t")
    // escaped and non-capturing parens are NOT capturing groups
    assert(ChSql.translate("SELECT extract(s, 'a\\(b') FROM t")
      == "SELECT regexp_extract(s, 'a\\(b', 0) FROM t")
    assert(ChSql.translate("SELECT extract(s, '(?:ab)+') FROM t")
      == "SELECT regexp_extract(s, '(?:ab)+', 0) FROM t")
    // end to end against real data
    val df = Seq((1L, "ab12cd")).toDF("id", "s")
    df.createOrReplaceTempView("xt_t")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val got = spark.sql(ChSql.translate(
      "SELECT extract(s, '[0-9]+') AS d, extract(s, '([a-z]+)[0-9]') AS g FROM xt_t"))
      .as[(String, String)].collect().head
    assert(got == ("12", "ab"))
  }

  test("LIMIT o, n BY takes rows o+1..o+n per group") {
    Seq((1, 10), (1, 20), (1, 30), (1, 40), (2, 1), (2, 2)).toDF("k", "v")
      .createOrReplaceTempView("lb_t")
    val got = spark.sql(ChSql.translate(
      "SELECT k, v FROM lb_t ORDER BY k, v LIMIT 1, 2 BY k"))
      .as[(Int, Int)].collect().toSeq
    // group 1: skip v=10, keep 20,30; group 2: skip v=1, keep 2
    assert(got == Seq((1, 20), (1, 30), (2, 2)), got)
    // the plain form still works and a trailing LIMIT survives
    val plain = spark.sql(ChSql.translate(
      "SELECT k, v FROM lb_t ORDER BY k, v LIMIT 2 BY k LIMIT 3"))
      .as[(Int, Int)].collect().toSeq
    assert(plain == Seq((1, 10), (1, 20), (2, 1)), plain)
  }

  test("OFFSET/FETCH forms: ONLY and bare OFFSET map to LIMIT/OFFSET") {
    assert(ChSql.translate(
      "SELECT a FROM t ORDER BY a OFFSET 10 ROWS FETCH NEXT 5 ROWS ONLY")
      == "SELECT a FROM t ORDER BY a LIMIT 5 OFFSET 10")
    assert(ChSql.translate("SELECT a FROM t ORDER BY a OFFSET 10 ROWS")
      == "SELECT a FROM t ORDER BY a OFFSET 10")
    assert(ChSql.translate("SELECT a FROM t ORDER BY a FETCH FIRST ROW ONLY")
      == "SELECT a FROM t ORDER BY a LIMIT 1")
  }

  test("FETCH FIRST m ROWS WITH TIES keeps the boundary ties; refusals are loud") {
    Seq(1, 2, 2, 3, 4).toDF("a").createOrReplaceTempView("ft_t")
    // top-2 ascending is {1, 2}; the second 2 ties the boundary
    val got = spark.sql(ChSql.translate(
      "SELECT a FROM ft_t ORDER BY a FETCH FIRST 2 ROWS WITH TIES"))
      .as[Int].collect().toSeq
    assert(got == Seq(1, 2, 2), got)
    // DESC: top-2 is {4, 3}, no tie at the boundary
    val gd = spark.sql(ChSql.translate(
      "SELECT a FROM ft_t ORDER BY a DESC FETCH FIRST 2 ROWS WITH TIES"))
      .as[Int].collect().toSeq
    assert(gd == Seq(4, 3), gd)
    // inexpressible forms refuse with a clear message, never mis-parse
    intercept[IllegalArgumentException] {
      ChSql.translate(
        "SELECT a FROM t ORDER BY a OFFSET 1 ROWS FETCH FIRST 2 ROWS WITH TIES")
    }
    intercept[IllegalArgumentException] {
      ChSql.translate(
        "SELECT a, b FROM t ORDER BY a, b FETCH FIRST 2 ROWS WITH TIES")
    }
  }

  test("CH 3-arg dateDiff counts boundary crossings; 2-arg datediff survives") {
    assert(ChSql.translate("SELECT dateDiff('day', a, b) FROM t")
      == "SELECT timestampdiff(DAY, date_trunc('DAY', a), date_trunc('DAY', b)) FROM t")
    assert(ChSql.translate("SELECT datediff(b, a) FROM t")
      == "SELECT datediff(b, a) FROM t")
    // end to end: CH units against real timestamps (boundary-aligned
    // start, so crossings == complete units — the pre-fix behavior)
    Seq(("2024-01-01 00:00:00", "2024-03-01 12:30:00"))
      .toDF("s", "e")
      .select(col("s").cast("timestamp").as("s"), col("e").cast("timestamp").as("e"))
      .createOrReplaceTempView("dd_t")
    val got = spark.sql(ChSql.translate(
      "SELECT dateDiff('day', s, e) AS d, dateDiff('month', s, e) AS m, " +
        "dateDiff('hour', s, e) AS h FROM dd_t"))
      .as[(Long, Long, Long)].collect().head
    assert(got == ((60L, 2L, 1452L)), got)
    // NON-aligned operands: CH counts unit-BOUNDARY crossings, so two
    // minutes straddling midnight are 1 day / 1 hour / 2 minutes apart
    // even though zero complete units elapsed (timestampdiff alone
    // would return 0 for all three)
    Seq(("2024-01-01 23:59:00", "2024-01-02 00:01:00"))
      .toDF("s", "e")
      .select(col("s").cast("timestamp").as("s"), col("e").cast("timestamp").as("e"))
      .createOrReplaceTempView("dd_t2")
    val cross = spark.sql(ChSql.translate(
      "SELECT dateDiff('day', s, e) AS d, dateDiff('hour', s, e) AS h, " +
        "dateDiff('minute', s, e) AS mi, dateDiff('month', s, e) AS mo FROM dd_t2"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(cross == ((1L, 1L, 2L, 0L)), cross)
  }
  test("remote-source table functions refuse at translate time with guidance") {
    // s3/url/hdfs/gcs are REAL readers on the execute path
    // (ChDdl.rewriteFileFn, CreateFormsSpec); a bare translate() has
    // no session to bind a reader, so the guidance names the front
    // door. remote/remoteSecure/cluster stay refusals everywhere.
    Seq(
      "SELECT * FROM s3('https://x/y.parquet', 'Parquet')" -> "front door",
      "SELECT * FROM url('https://x/y.csv', 'CSV')" -> "front door",
      "SELECT * FROM remote('other:9000', db.t)" -> "storage",
      "SELECT * FROM cluster('c', db.t)" -> "cluster").foreach {
      case (sql, hint) =>
        val e = intercept[UnsupportedOperationException] {
          ChSql.translate(sql)
        }
        assert(e.getMessage.contains(hint), s"$sql -> ${e.getMessage}")
    }
    // columns/aliases named like the functions never trip the guard
    assert(ChSql.translate("SELECT s3, url FROM t WHERE s3 = 1")
      .contains("s3"))
  }
}
