package graft

import org.apache.spark.sql.Row
import graft.functions.ChSql

/** ChStats3: ANOVA, singleValueOrNull, groupConcat, sample moments,
  * filtered sumMap, GK/bfloat16 quantiles. */
class ChStats3Spec extends SparkSpec {
  import spark.implicits._

  private def row1(q: String): Row =
    spark.sql(ChSql.translate(q)).collect().head

  test("anova matches the hand-computed one-way decomposition") {
    // cohorts: g0 = (1,2,3), g1 = (2,3,4), g2 = (5,6,7)
    val data = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 2.0), (1, 3.0),
      (1, 4.0), (2, 5.0), (2, 6.0), (2, 7.0))
    data.toDF("g", "v").createOrReplaceTempView("an")
    // hand: means 2,3,6; grand 11/3; SSB = 3((2-11/3)²+(3-11/3)²+(6-11/3)²)
    val grand = 11.0 / 3
    val ssb = 3 * (math.pow(2 - grand, 2) + math.pow(3 - grand, 2) +
      math.pow(6 - grand, 2))
    val ssw = 2.0 + 2.0 + 2.0 // each cohort Σ(x-mean)² = 2
    val f = (ssb / 2) / (ssw / 6)
    val r = row1("SELECT anova(v, g) AS a FROM an").getStruct(0)
    assert(math.abs(r.getDouble(0) - f) < 1e-9)
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 0.05) // clearly separated
    // equal cohorts → F ≈ 0-ish, p near 1
    Seq((0, 1.0), (0, 2.0), (1, 1.0), (1, 2.0), (2, 1.0), (2, 2.0))
      .toDF("g", "v").createOrReplaceTempView("an2")
    val r2 = row1(
      "SELECT analysisOfVariance(v, g) AS a FROM an2").getStruct(0)
    assert(math.abs(r2.getDouble(0)) < 1e-9)
    assert(r2.getDouble(1) > 0.9)
  }

  test("singleValueOrNull") {
    Seq((1, "a"), (1, "a"), (2, "a"), (2, "b")).toDF("g", "v")
      .createOrReplaceTempView("sv")
    val rs = spark.sql(ChSql.translate(
      "SELECT g, singleValueOrNull(v) AS s FROM sv GROUP BY g ORDER BY g"))
      .collect()
    assert(rs(0).getString(1) == "a")
    assert(rs(1).isNullAt(1))
  }

  test("groupConcat separator, limit, bare forms") {
    Seq("b", "a", "c").toDF("v").createOrReplaceTempView("gc")
    val r = row1(
      """SELECT groupConcat(',')(v) AS sep,
        |  groupConcat(v) AS bare,
        |  groupConcat('-', 2)(v) AS lim
        |FROM gc""".stripMargin)
    assert(r.getString(0) == "a,b,c") // sorted order, documented
    assert(r.getString(1) == "abc")
    assert(r.getString(2) == "a-b")
  }

  test("skewSamp and kurtSamp match direct computation") {
    val xs = Seq(1.0, 2.0, 2.0, 3.0, 7.0)
    xs.toDF("v").createOrReplaceTempView("mo")
    val n = xs.size
    val mu = xs.sum / n
    val varS = xs.map(x => (x - mu) * (x - mu)).sum / (n - 1)
    val skew = (xs.map(x => math.pow(x - mu, 3)).sum / (n - 1)) /
      math.pow(varS, 1.5)
    val kurt = (xs.map(x => math.pow(x - mu, 4)).sum / (n - 1)) /
      (varS * varS)
    val r = row1(
      "SELECT skewSamp(v) AS s, kurtSamp(v) AS k FROM mo")
    assert(math.abs(r.getDouble(0) - skew) < 1e-9)
    assert(math.abs(r.getDouble(1) - kurt) < 1e-9)
  }

  test("sumMapFiltered keeps only the listed keys") {
    Seq(
      (Seq("a", "b"), Seq(1.0, 10.0)),
      (Seq("b", "c"), Seq(20.0, 100.0))
    ).toDF("k", "v").createOrReplaceTempView("smf")
    val r = row1(
      """SELECT sumMapFiltered(['b', 'c'])(k, v) AS m FROM smf""")
    assert(r.getMap[String, Double](0) == Map("b" -> 30.0, "c" -> 100.0))
  }

  test("-Resample buckets a battery of FILTER aggregates") {
    // keys 0..9, values = key*10; buckets [0,4) [4,8) [8,10)
    (0 until 10).map(k => (k, k * 10.0)).toDF("k", "v")
      .createOrReplaceTempView("rs")
    val r = row1(
      """SELECT sumResample(0, 10, 4)(v, k) AS s,
        |  countResample(0, 10, 4)(v, k) AS c,
        |  minResample(0, 10, 4)(v, k) AS mn,
        |  uniqResample(0, 10, 4)(k % 2, k) AS u,
        |  sumResample(100, 110, 5)(v, k) AS empty
        |FROM rs""".stripMargin)
    assert(r.getSeq[Double](0) == Seq(60.0, 220.0, 170.0))
    assert(r.getSeq[Long](1) == Seq(4L, 4L, 2L))
    assert(r.getSeq[Double](2) == Seq(0.0, 40.0, 80.0))
    assert(r.getSeq[Long](3) == Seq(2L, 2L, 2L))
    assert(r.getSeq[Long](4) == Seq(0L, 0L)) // empty buckets → 0 sums
  }

  test("quantileGK and quantileBFloat16") {
    (1 to 1000).map(_.toDouble).toDF("v").createOrReplaceTempView("qk")
    val r = row1(
      """SELECT quantileGK(500, 0.5)(v) AS gk,
        |  quantileBFloat16(0.5)(v) AS bf
        |FROM qk""".stripMargin)
    // GK sketch: within accuracy bounds of the true median 500.5
    assert(math.abs(r.getDouble(0) - 500.0) < 20.0)
    // bfloat16 keeps ~3 significant digits; the median of rounded
    // 1..1000 stays within half a bfloat16 ulp of 500 (ulp@500 = 4)
    assert(math.abs(r.getDouble(1) - 500.0) <= 4.0)
    // exactness on representable values
    Seq(1.0, 2.0, 3.0).toDF("v").createOrReplaceTempView("qb")
    assert(row1("SELECT quantileBFloat16(0.5)(v) AS m FROM qb")
      .getDouble(0) == 2.0)
  }
}
