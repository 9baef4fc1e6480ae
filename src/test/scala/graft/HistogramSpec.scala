package graft

import org.apache.spark.sql.Row
import graft.functions.GraftFunctions

/** histogram(nbins)(x) — structural contract of the adaptive
  * centroid kernel (the exact boundaries are arrival-order dependent,
  * as CH documents; what must ALWAYS hold is pinned here). */
class HistogramSpec extends SparkSpec {

  override val sfDir = "/root/testdata/sf0.001"

  private def bins(q: String): Seq[Row] = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(graft.functions.ChSql.translate(q))
      .collect().head.getSeq[Row](0)
  }

  test("distinct values <= nbins: one bin per value, midpoint bounds") {
    val b = bins(
      """SELECT histogram(4)(x) AS h FROM VALUES
        |  (1.0), (1.0), (5.0), (9.0), (9.0), (9.0) AS t(x)""".stripMargin)
    // CH bound rule: [gmin, mid(1,5), mid(5,9), gmax] = [1, 3, 7, 9]
    assert(b.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))) ==
      Seq((1.0, 3.0, 2.0), (3.0, 7.0, 1.0), (7.0, 9.0, 3.0)))
  }

  test("structural invariants on a large uniform sample") {
    GraftFunctions.ensureRegistered(spark)
    spark.range(10000).selectExpr("CAST(id AS DOUBLE) AS x")
      .repartition(8).createOrReplaceTempView("h_t")
    val b = bins("SELECT histogram(8)(x) AS h FROM h_t")
    assert(b.length == 8)
    // total height = row count
    assert(b.map(_.getDouble(2)).sum == 10000.0)
    // sorted, non-overlapping, covering [0, 9999]
    assert(b.head.getDouble(0) == 0.0 && b.last.getDouble(1) == 9999.0)
    b.sliding(2).foreach {
      case Seq(a, c) =>
        assert(a.getDouble(1) == c.getDouble(0), s"not adjacent: $a then $c")
      case _ =>
    }
    // adaptive ≠ degenerate: no bin holds more than half the mass
    assert(b.map(_.getDouble(2)).max < 5000.0)
  }

  test("works per-group in GROUP BY") {
    GraftFunctions.ensureRegistered(spark)
    val rows = spark.sql(graft.functions.ChSql.translate(
      """SELECT g, histogram(2)(x) AS h FROM VALUES
        |  ('a', 1.0), ('a', 2.0), ('b', 10.0)
        |  AS t(g, x) GROUP BY g ORDER BY g""".stripMargin)).collect()
    assert(rows(0).getSeq[Row](1).map(_.getDouble(2)).sum == 2.0)
    assert(rows(1).getSeq[Row](1) == Seq(Row(10.0, 10.0, 1.0)))
    val aBins = rows(0).getSeq[Row](1)
    assert(aBins.map(_.getDouble(2)) == Seq(1.0, 1.0))
    assert(aBins(0).getDouble(1) == 1.5 && aBins(1).getDouble(0) == 1.5)
  }
}
