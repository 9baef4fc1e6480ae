package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch-accuracy contract for a04_uniq_approx (the one aggregate
  * with no portable oracle): HLL++ at rsd=0.01 must land within a
  * conservative 5% of the exact distinct count, per group. */
class AggSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within 5% of exact per group") {
    val l = Tables(spark, sfDir).lineitem
    val rows = l.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, f"group $flag: approx=$approx exact=$exact err=$err%.4f")
    }
  }

  test("sketch merge across partitions equals single-partition result") {
    val l = Tables(spark, sfDir).lineitem.select("l_orderkey")
    val many = l.repartition(16)
      .agg(approx_count_distinct(col("l_orderkey"), 0.01)).as[Long].head()
    val one = l.coalesce(1)
      .agg(approx_count_distinct(col("l_orderkey"), 0.01)).as[Long].head()
    assert(many == one, "HLL must be merge-invariant (same registers)")
  }
}
