package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

/** x01/x02: salted two-phase aggregation and salted equi-join — the
  * results must be salt-invariant (identical to the plain plan) and
  * the join must actually execute the salted shuffle-hash path, not
  * collapse back into a broadcast that would never exhibit skew. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join bit-for-bit") {
    val events = Tables(spark, sfDir).events
    val dim = events.groupBy("event_type")
      .agg(count(lit(1)).as("n_type"),
        (sum($"value".cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("avg_v"))
    val salted = Skew.saltedJoin(events, dim, "event_type", buckets = 16)
      .select($"event_id", $"n_type", round($"value" - $"avg_v", 6).as("dev"))
      .orderBy("event_id")
      .as[(Long, Long, Double)].collect().toSeq
    val plain = events.join(dim, Seq("event_type"))
      .select($"event_id", $"n_type", round($"value" - $"avg_v", 6).as("dev"))
      .orderBy("event_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(salted == plain && salted.nonEmpty)
  }

  test("saltedJoin executes a shuffled hash join on (key, salt)") {
    val events = Tables(spark, sfDir).events
    val dim = events.groupBy("event_type").agg(count(lit(1)).as("n_type"))
    val df = Skew.saltedJoin(events, dim, "event_type", buckets = 16)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the salted shuffle-hash path in:\n$plan")
    assert(plan.contains("__salt"), s"join must include the salt key in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"broadcast would bypass (not demonstrate) the salted path:\n$plan")
  }

  test("the salt spreads a hot key over all buckets") {
    val events = Tables(spark, sfDir).events
    val hot = events.groupBy("event_type").count()
      .orderBy(desc("count")).head().getString(0)
    val spread = events.filter($"event_type" === hot)
      .withColumn("__salt",
        pmod(xxhash64(events.columns.map(col): _*), lit(16)))
      .select(countDistinct("__salt")).head().getLong(0)
    assert(spread == 16L, s"hot key '$hot' reached only $spread/16 buckets")
  }
}
