package graft

import org.apache.spark.sql.functions._
import graft.queries.TypeQueries
import graft.sources.Tables

/** p10: bucketed catalog tables must join with ZERO exchange under the
  * sort-merge join — the bucketing metadata satisfies the join's
  * distribution requirement, so neither fact side re-shuffles (the
  * 100 TB big-big join shape). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with no exchange under the sort-merge join") {
    val df = TypeQueries.bucketedJoin(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    // the join inputs ride the bucketing — no exchange may appear on
    // either JOIN key (the groupBy's c_mktsegment exchange is the
    // plan's only legitimate shuffle; AQE prints the plan twice, so
    // counting totals would double-count it)
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"join keys must not re-shuffle in:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"expected a bucketed scan in:\n$plan")
  }

  test("bucketed join answers match the raw parquet join") {
    val got = TypeQueries.bucketedJoin(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    val t = Tables(spark, sfDir)
    val expect = t.orders.join(t.customer, $"o_custkey" === $"c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("total"))
      .orderBy("c_mktsegment")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == expect && got.nonEmpty)
  }
}
