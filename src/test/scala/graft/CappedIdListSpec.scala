package graft

import org.apache.spark.sql.functions._

/** capped_id_list (functions/CappedIdList.scala) — the O(cap)-state
  * replacement for bucketPairs' collect_list + size filter. Parity
  * contract: for every bucket, the result equals
  * sort_array(collect_list(id)) when the bucket size is in [2, cap]
  * and NULL otherwise — under multi-partition partial aggregation
  * (serialize/merge path) and with over-cap saturation carrying
  * through merges. */
class CappedIdListSpec extends SparkSpec {
  import spark.implicits._

  test("capped_id_list equals collect_list + size filter across bucket sizes") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cap = 10
    // bucket b has b rows (1..25): covers singleton (null), in-range,
    // exact-cap, cap+1, and far-over-cap buckets
    val rows = (1 to 25).flatMap(b => (0 until b).map(i =>
      (b, b * 1000L + i))).toDF("bucket", "id")
      .repartition(16) // force partial buffers + serialize/merge
    val got = rows.groupBy("bucket")
      .agg(call_function("capped_id_list", col("id"), lit(cap)).as("ids"))
    val want = rows.groupBy("bucket")
      .agg(sort_array(collect_list(col("id"))).as("all"))
      .select(col("bucket"),
        when(size(col("all")).between(2, cap), col("all")).as("ids"))
    val g = got.as[(Int, Option[Seq[Long]])].collect().toMap
    val w = want.as[(Int, Option[Seq[Long]])].collect().toMap
    assert(g == w, s"got $g\nwant $w")
    // sanity on the shape: singleton and over-cap buckets are null,
    // an in-range bucket is sorted ascending
    assert(g(1).isEmpty && g(11).isEmpty && g(25).isEmpty)
    assert(g(10).get == (0 until 10).map(10 * 1000L + _))
  }

  test("capped_id_list rejects a non-bigint id at analysis time") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      Seq(("a", 1)).toDF("id", "b").groupBy("b")
        .agg(call_function("capped_id_list", col("id"), lit(10)))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint") ||
      e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }
}
