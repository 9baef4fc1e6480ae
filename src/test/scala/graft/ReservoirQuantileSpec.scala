package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The bare quantile/median/quantiles realization: a ≤8192-sample
  * reservoir (the reference's own default), exact below the cap with
  * the rank-ceil(q·n) convention (= DuckDB quantile_disc), sane and
  * bounded above it. */
class ReservoirQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def sql1(q: String): org.apache.spark.sql.Row = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(graft.functions.ChSql.translate(q)).collect().head
  }

  test("exact below the cap: rank ceil(q·n), multi-partition merges stay exact") {
    // 7300 values over 8 partitions — the c08 sf0.01 shape: every
    // partial is exact and the merged union still fits the cap
    spark.range(7300).repartition(8)
      .select((col("id") * 7 + 3).cast("double").as("v"))
      .createOrReplaceTempView("rq")
    val r = sql1(
      """SELECT quantile(0.5)(v) AS med, quantile(0.9)(v) AS p90,
        |  median(v) AS md, quantiles(0.25, 0.75)(v) AS qs FROM rq""".stripMargin)
    def expect(q: Double): Double = (math.ceil(q * 7300) - 1) * 7 + 3
    assert(r.getAs[Double]("med") == expect(0.5))
    assert(r.getAs[Double]("p90") == expect(0.9))
    assert(r.getAs[Double]("md") == expect(0.5))
    val qs = r.getAs[scala.collection.Seq[Double]]("qs")
    assert(qs == Seq(expect(0.25), expect(0.75)))
  }

  test("edges: empty group → NULL, NULLs skipped, single value, level 0/1") {
    Seq((1, Some(5.0)), (1, None), (2, None))
      .toDF("g", "v").createOrReplaceTempView("rq_n")
    GraftFunctions.ensureRegistered(spark)
    val rows = spark.sql(graft.functions.ChSql.translate(
      "SELECT g, quantile(0.5)(v) AS q FROM rq_n GROUP BY g ORDER BY g"))
      .collect()
    assert(rows(0).getAs[Double]("q") == 5.0) // NULL skipped
    assert(rows(1).isNullAt(1))               // all-NULL group
    val e = sql1("SELECT quantile(0.0)(v) AS lo, quantile(1.0)(v) AS hi FROM rq_n")
    assert(e.getAs[Double]("lo") == 5.0 && e.getAs[Double]("hi") == 5.0)
  }

  test("above the cap: bounded sample, result inside the data range, count-scale sane") {
    // 200k values — far past 8192; the reservoir must stay bounded
    // and answer a plausible rank statistic of a uniform ramp
    spark.range(200000).repartition(16)
      .select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("rq_big")
    val r = sql1("SELECT quantile(0.5)(v) AS med, quantile(0.95)(v) AS p95 FROM rq_big")
    val med = r.getAs[Double]("med")
    val p95 = r.getAs[Double]("p95")
    // a 8192-sample estimate of a uniform median is within a few
    // percent with overwhelming probability; assert a loose band
    assert(med > 80000 && med < 120000, s"med=$med")
    assert(p95 > 180000 && p95 <= 199999, s"p95=$p95")
    assert(p95 > med)
  }

  test("deterministic spellings agree below the cap") {
    spark.range(1000).select(col("id").cast("double").as("v"), lit(1).as("w"))
      .createOrReplaceTempView("rq_d")
    val r = sql1(
      """SELECT quantile(0.3)(v) AS q, quantileDeterministic(0.3)(v, w) AS qd,
        |  medianDeterministic(v, w) AS md, median(v) AS m FROM rq_d""".stripMargin)
    assert(r.getAs[Double]("q") == r.getAs[Double]("qd"))
    assert(r.getAs[Double]("m") == r.getAs[Double]("md"))
  }
}
