package graft

import graft.functions.{ChDdl, GraftFunctions}

/** system.* introspection tables — proven by running the reference
  * client's OWN autocompletion query (Client/Suggest.cpp:47-90). */
class ChSystemSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("the reference client's suggestion query runs and yields completions") {
    GraftFunctions.ensureRegistered(spark)
    // Suggest.cpp's UNION ALL, verbatim shape (basic_suggestion branch,
    // suggestion_limit = 100)
    val suggestions = ChDdl.execute(spark,
      """SELECT DISTINCT arrayJoin(extractAll(name, '[\\w_]{2,}')) AS res FROM (
        |SELECT name FROM system.functions
        | UNION ALL SELECT name FROM system.table_engines
        | UNION ALL SELECT name FROM system.formats
        | UNION ALL SELECT name FROM system.table_functions
        | UNION ALL SELECT name FROM system.data_type_families
        | UNION ALL SELECT name FROM system.merge_tree_settings
        | UNION ALL SELECT name FROM system.settings
        | UNION ALL SELECT concat(func.name, comb.name)
        |   FROM system.functions AS func
        |   CROSS JOIN system.aggregate_function_combinators AS comb
        |   WHERE is_aggregate
        | UNION ALL (SELECT name FROM system.databases LIMIT 100)
        | UNION ALL (SELECT DISTINCT name FROM system.tables LIMIT 100)
        |) ORDER BY res""".stripMargin)
      // (the per-branch LIMITs are parenthesized: ClickHouse binds a
      // mid-union LIMIT to its branch, Spark's grammar requires the
      // parens to say the same thing)
      .as[String].collect().toSet
    // the completion list carries the dialect surface
    for (expected <- Seq("arrayCumSum", "uniqExact", "MergeTree",
        "JSONEACHROW", "Int64", "max_threads", "uniqExactIf", "numbers"))
      assert(suggestions.contains(expected), s"missing completion: $expected")
  }

  test("system.tables and system.columns list the live catalog with CH types") {
    GraftFunctions.ensureRegistered(spark)
    ChDdl.execute(spark,
      "CREATE TABLE graft_sys_probe (k Int64, s String) ENGINE = MergeTree() ORDER BY (k)")
    val tables = ChDdl.execute(spark,
      "SELECT name FROM system.tables WHERE name = 'graft_sys_probe'")
    assert(tables.count() == 1)
    val cols = ChDdl.execute(spark,
      """SELECT name, type FROM system.columns
        |WHERE table = 'graft_sys_probe' ORDER BY name""".stripMargin)
      .as[(String, String)].collect().toSeq
    assert(cols.map(_._1) == Seq("k", "s"), cols)
    assert(cols.head._2.contains("Int64"), cols)
    // SYSTEM statements (no dot) still refuse as cluster ops
    val e = intercept[UnsupportedOperationException] {
      ChDdl.execute(spark, "SYSTEM FLUSH LOGS")
    }
    assert(e.getMessage != null)
  }
}
