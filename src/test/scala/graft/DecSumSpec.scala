package graft

import org.apache.spark.sql.functions._

/** DecSumExact (decimal_sum_exact) parity oracle: bit-identical to
  * Spark's Sum on real data, nulls, empty groups — and on inputs that
  * force the long tier to ESCAPE into the decimal tier, in both the
  * update and the merge path. */
class DecSumSpec extends SparkSpec {

  private def register(): Unit =
    graft.functions.GraftFunctions.ensureRegistered(spark)

  test("matches sum() bit-exactly on real lineitem money columns") {
    register()
    val l = graft.sources.Tables(spark, "/root/testdata/sf0.01").lineitem
      .withColumn("q", col("l_quantity").cast("decimal(12,2)"))
      .withColumn("pr", col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount").cast("decimal(4,2)")))
    val got = l.groupBy("l_returnflag")
      .agg(expr("decimal_sum_exact(q)").as("a"), sum("q").as("b"),
        expr("decimal_sum_exact(pr)").as("c"), sum("pr").as("d"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getDecimal(1) == r.getDecimal(2), s"q sum differs: $r")
      assert(r.getDecimal(3) == r.getDecimal(4), s"pr sum differs: $r")
    }
  }

  test("nulls and empty groups behave like sum()") {
    register()
    val df = spark.sql(
      """SELECT g, decimal_sum_exact(v) AS a, sum(v) AS b FROM VALUES
        |  (0, CAST(1.25 AS DECIMAL(12,2))), (0, NULL), (1, NULL),
        |  (2, CAST(-7.50 AS DECIMAL(12,2))) AS t(g, v)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    df.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"nullness differs: $r")
      if (!r.isNullAt(1)) assert(r.getDecimal(1) == r.getDecimal(2), s"$r")
    }
    assert(df(1).isNullAt(1), "all-null group must sum to NULL")
  }

  test("long-tier overflow escapes exactly (update and merge paths)") {
    register()
    // 40 values of 9.0e17 (unscaled 9e17 at scale 0): the long tier
    // overflows past 10 of them; total 3.6e19 > Long.MaxValue, exactly
    // representable in decimal. 8 slices force merge-path escapes too.
    val big = spark.range(0, 40, 1, 8)
      .select(lit("900000000000000000").cast("decimal(18,0)").as("v"))
    val r = big.agg(expr("decimal_sum_exact(v)").as("a"), sum("v").as("b"))
      .collect().head
    assert(r.getDecimal(0).toString == "36000000000000000000", r.toString)
    assert(r.getDecimal(0) == r.getDecimal(1), r.toString)
    // mixed signs around the boundary: escape then come back down
    val mixed = spark.range(0, 40, 1, 4).select(
      when(col("id") % 2 === 0, lit("900000000000000000"))
        .otherwise(lit("-899999999999999999")).cast("decimal(18,0)").as("v"))
    val m = mixed.agg(expr("decimal_sum_exact(v)").as("a"), sum("v").as("b"))
      .collect().head
    assert(m.getDecimal(0) == m.getDecimal(1), m.toString)
    assert(m.getDecimal(0).toString == "20", m.toString)
  }
}
