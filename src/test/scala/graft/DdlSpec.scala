package graft

import org.apache.spark.sql.functions._
import graft.functions.{ChDdl, ChDictionaries, GraftFunctions}
import graft.sources.Tables

/** ChDdl parser + catalog round-trip + the MergeTree-analog layout
  * properties (sampling-hash pushdown), and the dictGet surface. */
class DdlSpec extends SparkSpec {
  import spark.implicits._

  test("type mapping covers the DataTypeFactory names") {
    val ct = ChDdl.parse(
      """CREATE TABLE IF NOT EXISTS db.t (
        |  a Int8, b UInt8, c Int32, d UInt32, e Int64, f UInt64,
        |  g Float32, h Float64, i String, j FixedString(4),
        |  k Date, l Date32, m DateTime, n DateTime64(3),
        |  o Decimal(12, 2), p Decimal64(4),
        |  q Nullable(Int64), r LowCardinality(String),
        |  s Array(Nullable(String)), t Map(String, Int64),
        |  u Tuple(x Int64, y String), v Tuple(Float64, Float64),
        |  w Enum8('lo' = 1, 'hi' = 2), x UUID, y Bool
        |) ENGINE = MergeTree() ORDER BY (e, k) SETTINGS index_granularity = 8192""".stripMargin)
    val m = ct.cols.map(c => c.name -> c.sparkType).toMap
    assert(m("a") == "TINYINT" && m("b") == "SMALLINT" && m("d") == "BIGINT")
    assert(m("f") == "BIGINT" && m("g") == "FLOAT" && m("j") == "VARCHAR(4)")
    assert(m("l") == "DATE" && m("m") == "TIMESTAMP" && m("n") == "TIMESTAMP_NTZ")
    assert(m("o") == "DECIMAL(12, 2)" && m("p") == "DECIMAL(18, 4)")
    assert(m("q") == "BIGINT" && m("r") == "STRING")
    assert(m("s") == "ARRAY<STRING>" && m("t") == "MAP<STRING, BIGINT>")
    assert(m("u") == "STRUCT<x: BIGINT, y: STRING>")
    assert(m("v") == "STRUCT<_1: DOUBLE, _2: DOUBLE>")
    assert(m("w") == "SMALLINT" && m("x") == "STRING" && m("y") == "BOOLEAN")
    assert(ct.enumOf("w") == Seq(("lo", 1), ("hi", 2)))
    assert(ct.table == "db_t" && ct.orderBy == Seq("e", "k"))
  }

  test("enum encode/decode round-trips names through codes") {
    val ct = ChDdl.parse(
      "CREATE TABLE e (v Enum8('a' = 1, 'b' = 5)) ENGINE = Memory")
    val got = Seq("a", "b", "a").toDF("v")
      .select(ct.enumDecode("v", ct.enumEncode("v", $"v")).as("back"))
      .as[String].collect().toSeq
    assert(got == Seq("a", "b", "a"))
  }

  test("DDL table: insertSelect round-trips and the sampling hash predicate pushes down") {
    GraftFunctions.ensureRegistered(spark)
    val ct = ChDdl.parse(
      """CREATE TABLE graft_ddl_spec (
        |  o_orderkey Int64, o_totalprice Float64
        |) ENGINE = MergeTree()
        |ORDER BY (o_orderkey)
        |SAMPLE BY intHash32(o_orderkey)""".stripMargin)
    ct.create(spark)
    val src = Tables(spark, sfDir).orders.select("o_orderkey", "o_totalprice")
    ct.insertSelect(spark, src)
    val back = spark.table("graft_ddl_spec")
    // exact row round-trip
    assert(back.count() == src.count())
    assert(back.agg(sum($"o_orderkey")).as[Long].head() ==
      src.agg(sum($"o_orderkey")).as[Long].head())
    // the declared SAMPLE BY layout serves an IO-pruned sample: plain
    // range predicate on the persisted hash, pushed to the scan
    val sampled = graft.operators.Sample.byStoredHashRange(back, "__sample_hash", 0.1)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(__sample_hash), LessThanOrEqual(__sample_hash"),
      s"sampling predicate not pushed:\n$plan")
    val frac = sampled.count().toDouble / back.count()
    assert(frac > 0.05 && frac < 0.15, s"sampled fraction $frac")
  }

  test("partitioned DDL table prunes partitions on the partition key") {
    GraftFunctions.ensureRegistered(spark)
    val ct = ChDdl.parse(
      """CREATE TABLE graft_ddl_part (
        |  o_orderkey Int64, o_totalprice Float64, o_orderstatus FixedString(1)
        |) ENGINE = MergeTree()
        |PARTITION BY o_orderstatus
        |ORDER BY (o_orderkey)""".stripMargin)
    ct.create(spark)
    ct.insertSelect(spark,
      Tables(spark, sfDir).orders.select("o_orderkey", "o_totalprice", "o_orderstatus"))
    val q = spark.table("graft_ddl_part").filter($"o_orderstatus" === "F")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "partition filter not applied at scan")
    assert(q.count() > 0)
  }

  test("bare SAMPLE f against a DDL table uses the declared stored-hash layout, pushed down") {
    GraftFunctions.ensureRegistered(spark)
    val ct = ChDdl.parse(
      """CREATE TABLE graft_sample_ddl (
        |  o_orderkey Int64, o_totalprice Float64
        |) ENGINE = MergeTree()
        |ORDER BY (o_orderkey) SAMPLE BY intHash32(o_orderkey)""".stripMargin)
    ct.create(spark)
    ct.insertSelect(spark, Tables(spark, sfDir).orders.select("o_orderkey", "o_totalprice"))
    // the reference's own syntax — no BY clause; the key is in the DDL
    val df = spark.sql(graft.functions.ChSql.translate(
      "SELECT o_orderkey FROM graft_sample_ddl SAMPLE 0.1 ORDER BY o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(__sample_hash), LessThanOrEqual(__sample_hash"),
      s"bare SAMPLE predicate not pushed:\n$plan")
    val frac = df.count().toDouble / spark.table("graft_sample_ddl").count()
    assert(frac > 0.05 && frac < 0.15, s"sampled fraction $frac")
  }

  test("ALTER DELETE and UPDATE mutate the table like the reference's mutations") {
    GraftFunctions.ensureRegistered(spark)
    val ct = ChDdl.parse(
      "CREATE TABLE graft_alter_spec (k Int64, v Float64) ENGINE = MergeTree() ORDER BY (k)")
    ct.create(spark)
    ct.insertSelect(spark,
      spark.range(1, 11).select($"id".as("k"), ($"id" * 10.0).as("v")))
    ChDdl.alter(spark, "ALTER TABLE graft_alter_spec DELETE WHERE k % 2 = 0")
    ChDdl.alter(spark, "ALTER TABLE graft_alter_spec UPDATE v = v + 1 WHERE k > 5")
    val got = spark.table("graft_alter_spec").orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (3L, 30.0), (5L, 50.0), (7L, 71.0), (9L, 91.0)), got)
  }

  test("CREATE FUNCTION registers a SQL-lambda that inlines as Catalyst") {
    ChDdl.createFunction(spark,
      "CREATE FUNCTION graft_linear AS (x, k, b) -> k * x + b")
    ChDdl.createFunction(spark,
      "CREATE FUNCTION graft_double AS x -> x * 2")
    val r = spark.sql(
      "SELECT graft_linear(10, 2, 1) AS lin, graft_double(21) AS dbl").collect().head
    assert(r.getAs[Int]("lin") == 21 && r.getAs[Int]("dbl") == 42)
    // composes with columns and other functions
    val n = spark.range(5)
      .selectExpr("graft_linear(id, 3, 1) AS v").selectExpr("sum(v)")
      .collect().head.getLong(0)
    assert(n == 3 * (0 + 1 + 2 + 3 + 4) + 5)
  }

  test("execute() routes any CH statement to its realization") {
    ChDdl.execute(spark,
      "CREATE TABLE graft_exec_spec (k Int64, v Float64) ENGINE = MergeTree() ORDER BY (k)")
    ChDdl.parse(
      "CREATE TABLE graft_exec_spec (k Int64, v Float64) ENGINE = Memory")
      // (re-parse only to get insertSelect's layout helper on the same name)
      .insertSelect(spark, spark.range(1, 6).select($"id".as("k"), ($"id" * 1.5).as("v")))
    ChDdl.execute(spark, "ALTER TABLE graft_exec_spec DELETE WHERE k = 5")
    ChDdl.execute(spark, "OPTIMIZE TABLE graft_exec_spec FINAL") // no-op, parquet is merged
    ChDdl.execute(spark, "RENAME TABLE graft_exec_spec TO graft_exec_spec2")
    val got = ChDdl.execute(spark,
      "SELECT count() AS n FROM graft_exec_spec2 PREWHERE k < 10")
      .as[Long].collect().head
    assert(got == 4)
    ChDdl.execute(spark, "DROP TABLE graft_exec_spec2")
    assert(!spark.catalog.tableExists("graft_exec_spec2"))
  }

  test("execute() runs multi-statement scripts, returning the last result") {
    val got = ChDdl.execute(spark,
      """CREATE TABLE graft_multi (k Int64) ENGINE = MergeTree() ORDER BY (k);
        |CREATE FUNCTION graft_inc AS x -> x + 1;
        |SELECT graft_inc(41) AS answer""".stripMargin)
    assert(got.collect().head.getInt(0) == 42)
    assert(spark.catalog.tableExists("graft_multi"))
    ChDdl.execute(spark, "DROP TABLE graft_multi")
  }

  test("ASOF JOIN SQL plans the AsOfJoin operator, both directions") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT * FROM VALUES (1, 10), (1, 20), (2, 15) AS t(k, t)")
      .createOrReplaceTempView("asof_l")
    spark.sql("SELECT * FROM VALUES (1, 5, 'a'), (1, 12, 'b'), (2, 99, 'z') AS t(k2, t2, v)")
      .createOrReplaceTempView("asof_r")
    val back = ChDdl.execute(spark,
      """SELECT l.k AS k, l.t AS t, r.v AS v FROM asof_l l
        |ASOF LEFT JOIN asof_r r ON l.k = r.k2 AND l.t >= r.t2
        |ORDER BY k, t""".stripMargin)
      .as[(Int, Int, Option[String])].collect().toSeq
    // (1,10)→'a' (t2=5), (1,20)→'b' (t2=12), (2,15)→none (99 > 15)
    assert(back == Seq((1, 10, Some("a")), (1, 20, Some("b")), (2, 15, None)), back)
    val fwd = ChDdl.execute(spark,
      """SELECT l.k AS k, l.t AS t, r.v AS v FROM asof_l l
        |ASOF LEFT JOIN asof_r r ON l.k = r.k2 AND l.t <= r.t2
        |ORDER BY k, t""".stripMargin)
      .as[(Int, Int, Option[String])].collect().toSeq
    // forward: earliest t2 ≥ t — (1,10)→'b'(12), (1,20)→none, (2,15)→'z'(99)
    assert(fwd == Seq((1, 10, Some("b")), (1, 20, None), (2, 15, Some("z"))), fwd)
  }

  test("the README front-door script runs verbatim") {
    ChDdl.execute(spark,
      "CREATE TABLE t (id UInt64, s String) ENGINE = MergeTree() ORDER BY (id) SAMPLE BY intHash32(id)")
    ChDdl.parse(
      "CREATE TABLE t (id UInt64, s String) ENGINE = Memory")
      .copy(sampleBy = Some("intHash32(id)"))
      .insertSelect(spark, spark.range(1, 1001)
        .select($"id", concat(lit("v"), $"id").as("s")))
    ChDdl.execute(spark, "CREATE FUNCTION discounted AS (p, d) -> p * (1 - d)")
    ChDdl.execute(spark, "ALTER TABLE t DELETE WHERE id % 7 = 0")
    val n = ChDdl.execute(spark,
      "SELECT count() FROM t SAMPLE 0.1 PREWHERE s != ''")
      .as[Long].collect().head
    // ~10% of the 858 surviving rows
    assert(n > 40 && n < 140, s"sampled count $n")
    val d = spark.sql("SELECT CAST(discounted(200.0, 0.25) AS DOUBLE) AS v")
      .as[Double].collect().head
    assert(d == 150.0)
    ChDdl.execute(spark, "DROP TABLE t")
  }

  test("CREATE DICTIONARY wires a table into dictGet end-to-end") {
    GraftFunctions.ensureRegistered(spark)
    Tables(spark, sfDir).nation.createOrReplaceTempView("nation_src")
    ChDdl.execute(spark,
      """CREATE DICTIONARY nation_dict (
        |  n_nationkey UInt64, n_name String
        |) PRIMARY KEY n_nationkey
        |SOURCE(CLICKHOUSE(TABLE 'nation_src'))
        |LAYOUT(FLAT()) LIFETIME(300)""".stripMargin)
    val got = spark.sql(
      "SELECT dictGet('nation_dict', 'n_name', CAST(0 AS BIGINT)) AS n")
      .as[String].collect().head
    val expect = Tables(spark, sfDir).nation
      .filter($"n_nationkey" === 0).select("n_name").as[String].collect().head
    assert(got == expect)
  }

  test("dictGet resolves through the broadcast map with no join in the plan") {
    GraftFunctions.ensureRegistered(spark)
    val t = Tables(spark, sfDir)
    ChDictionaries.register("nation_spec", t.nation, "n_nationkey", Seq("n_name"))
    t.customer.createOrReplaceTempView("customer_spec")
    val df = spark.sql(
      "SELECT dictGet('nation_spec', 'n_name', c_nationkey) AS nation FROM customer_spec")
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      "dictGet must not plan a join")
    val got = df.groupBy("nation").count()
      .as[(String, Long)].collect().toMap
    val expect = t.customer.join(t.nation, $"c_nationkey" === $"n_nationkey")
      .groupBy("n_name").count().as[(String, Long)].collect().toMap
    assert(got == expect && got.nonEmpty)
  }
}
