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

  test("plain Spark SQL passes through unchanged") {
    val q = "SELECT o_orderkey FROM orders WHERE o_totalprice > 1 ORDER BY o_orderkey LIMIT 5"
    assert(ChSql.translate(q) == q)
  }
}
