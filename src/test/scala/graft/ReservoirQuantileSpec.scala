package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The bare quantile/median/quantiles realization: a ≤8192-sample
  * reservoir (the reference's own default), exact below the cap with
  * the INTERPOLATED index-q·(n−1) convention of the reference's
  * ReservoirSampler::quantileInterpolated (= DuckDB quantile_cont up
  * to final-rounding ulps), sane and bounded above it. */
class ReservoirQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def sql1(q: String): org.apache.spark.sql.Row = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(graft.functions.ChSql.translate(q)).collect().head
  }

  test("exact below the cap: interpolated q·(n−1), multi-partition merges stay exact") {
    // 7300 values over 8 partitions — the c08 sf0.01 shape: every
    // partial is exact and the merged union still fits the cap
    spark.range(7300).repartition(8)
      .select((col("id") * 7 + 3).cast("double").as("v"))
      .createOrReplaceTempView("rq")
    val r = sql1(
      """SELECT quantile(0.5)(v) AS med, quantile(0.9)(v) AS p90,
        |  median(v) AS md, quantiles(0.25, 0.75)(v) AS qs FROM rq""".stripMargin)
    // sorted values are 3, 10, …, 3+7·7299; interpolate at q·(n−1)
    def expect(q: Double): Double = {
      val index = q * (7300 - 1)
      val left = index.toInt; val right = left + 1
      val lo = left * 7.0 + 3; val hi = right * 7.0 + 3
      if (right >= 7300) lo else lo * (right - index) + hi * (index - left)
    }
    assert(r.getAs[Double]("med") == expect(0.5))
    assert(r.getAs[Double]("p90") == expect(0.9))
    assert(r.getAs[Double]("md") == expect(0.5))
    val qs = r.getAs[scala.collection.Seq[Double]]("qs")
    assert(qs == Seq(expect(0.25), expect(0.75)))
  }

  test("median of {1,2,3,4} is 2.5 — the reference's interpolated convention") {
    Seq(1.0, 2.0, 3.0, 4.0).toDF("v").createOrReplaceTempView("rq_4")
    val r = sql1("SELECT median(v) AS m, quantile(0.5)(v) AS q FROM rq_4")
    assert(r.getAs[Double]("m") == 2.5)
    assert(r.getAs[Double]("q") == 2.5)
  }

  test("quantile(x) with the level omitted defaults to the median") {
    Seq(1.0, 2.0, 3.0, 4.0).toDF("v").createOrReplaceTempView("rq_d0")
    Seq((1.0, 1), (2.0, 2), (3.0, 3), (4.0, 4)).toDF("v", "w")
      .createOrReplaceTempView("rq_d0w")
    val r = sql1("SELECT quantile(v) AS q FROM rq_d0")
    assert(r.getAs[Double]("q") == 2.5)
    val rd = sql1("SELECT quantileDeterministic(v, w) AS qd FROM rq_d0w")
    assert(rd.getAs[Double]("qd") == 2.5)
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

  test("both-sides-sampled merge draws without replacement (no slot duplication bias)") {
    // two reservoirs built from DISJOINT value ranges, both past the
    // cap, merged via the aggregate path: a with-replacement merge
    // duplicates samples (kept distinct < cap with high probability);
    // the Fisher–Yates merge keeps cap DISTINCT values (all inputs
    // distinct), and the two-source mix stays near the 50/50 weights
    spark.range(40000).repartition(2, col("id") % 2)
      .select((when(col("id") % 2 === 0, col("id"))
        .otherwise(col("id") + 1000000)).cast("double").as("v"))
      .createOrReplaceTempView("rq_m")
    GraftFunctions.ensureRegistered(spark)
    val arr = spark.sql(graft.functions.ChSql.translate(
      "SELECT quantiles(0.25, 0.75)(v) AS qs FROM rq_m")).collect()
    assert(arr.length == 1) // smoke: the merge path executed
    // direct buffer-level check of distinctness under merge
    val a = new graft.functions.ReservoirBuf(256)
    val b = new graft.functions.ReservoirBuf(256)
    (0 until 10000).foreach(i => a.insert(i.toDouble))
    (0 until 10000).foreach(i => b.insert(1000000.0 + i))
    a.mergeWith(b)
    val merged = a.sortedValues
    assert(merged.length == 256)
    assert(merged.distinct.length == 256,
      s"merge duplicated samples: ${256 - merged.distinct.length} dups")
    val fromB = merged.count(_ >= 1000000.0)
    assert(fromB > 64 && fromB < 192, s"mix skew: $fromB/256 from side B")
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

  test("quantileDeterministic above the cap is arrival-order and layout independent") {
    // 30000 rows > the 8192 cap: the determinator-keyed bottom-k
    // sample is a pure function of the (value, determinator)
    // multiset (ReservoirSamplerDeterministic's contract), so the
    // SAME query over ascending input, descending input, and a
    // 16-way shuffled layout must return the IDENTICAL value — the
    // bare quantile makes no such promise up here
    val base = spark.range(30000).select(
      (col("id") * 37 % 10007).cast("double").as("v"), col("id").as("w"))
    def q(df: org.apache.spark.sql.DataFrame): Double = {
      df.createOrReplaceTempView("rq_det_big")
      sql1("SELECT quantileDeterministic(0.5)(v, w) AS qd FROM rq_det_big")
        .getAs[Double]("qd")
    }
    val asc = q(base.repartition(1).sortWithinPartitions(col("w").asc))
    val desc = q(base.repartition(1).sortWithinPartitions(col("w").desc))
    val shuffled = q(base.repartition(16))
    assert(asc == desc, s"order-dependent: $asc vs $desc")
    assert(asc == shuffled, s"layout-dependent: $asc vs $shuffled")
    // and the sample is a real median estimate: v is ~uniform on
    // [0, 10007), so the estimate sits near 5000
    assert(asc > 4000 && asc < 6000, s"implausible median $asc")
  }
}
