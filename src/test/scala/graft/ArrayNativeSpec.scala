package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.Row

/** Semantics of the native arrayCumSum/arrayDifference kernels
  * (functions/ArrayNative.scala) — values, integer widening, null
  * poisoning, and empty/null-array edges, pinned so the
  * lambda→kernel swap can never drift. */
class ArrayNativeSpec extends SparkSpec {

  private def sql1(q: String): Row = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(q).head()
  }

  test("cumsum values and integer widening to double") {
    val r = sql1(
      "SELECT arrayCumSum(array(1, 2, 3)) AS c, arrayCumSum(array(1.5, -0.5)) AS d")
    assert(r.getAs[collection.Seq[Double]]("c") == Seq(1.0, 3.0, 6.0))
    assert(r.getAs[collection.Seq[Double]]("d") == Seq(1.5, 1.0))
  }

  test("difference values: first element 0, signed deltas") {
    val r = sql1("SELECT arrayDifference(array(5, 8, 6)) AS d")
    assert(r.getAs[collection.Seq[Double]]("d") == Seq(0.0, 3.0, -2.0))
  }

  test("null element poisons cumsum suffix; difference nulls both neighbors") {
    val r = sql1(
      """SELECT arrayCumSum(array(1, CAST(NULL AS INT), 3)) AS c,
        |       arrayDifference(array(1, CAST(NULL AS INT), 3)) AS d""".stripMargin)
    assert(r.getAs[collection.Seq[Any]]("c") == Seq(1.0, null, null))
    assert(r.getAs[collection.Seq[Any]]("d") == Seq(0.0, null, null))
  }

  test("empty and null arrays") {
    val r = sql1(
      """SELECT arrayCumSum(array()) AS ce,
        |       arrayDifference(array()) AS de,
        |       arrayCumSum(CAST(NULL AS ARRAY<INT>)) AS cn,
        |       arrayDifference(CAST(NULL AS ARRAY<INT>)) AS dn""".stripMargin)
    assert(r.getAs[collection.Seq[Double]]("ce").isEmpty)
    assert(r.getAs[collection.Seq[Double]]("de").isEmpty)
    assert(r.isNullAt(r.fieldIndex("cn")))
    assert(r.isNullAt(r.fieldIndex("dn")))
  }

  test("moving aggregates still agree with hand cumsum (shared kernel path)") {
    val r = sql1(
      """SELECT groupArrayMovingSum(x) AS ms FROM
        |  (SELECT id + 1 AS x FROM range(4))""".stripMargin)
    assert(r.getAs[collection.Seq[Double]]("ms") == Seq(1.0, 3.0, 6.0, 10.0))
  }
}
