package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation (SURVEY §4's "salting for skew", as a
  * first-class operator). Spark's partial aggregation already combines
  * map-side; explicit salting matters when the GROUPING KEY SPACE is
  * tiny or hot — a handful of reducers own everything after the
  * shuffle. The salt spreads each hot key over `buckets` reducers
  * (phase 1), then a second, cheap shuffle over the now-pre-reduced
  * rows (≤ keys × buckets of them) combines the partials (phase 2).
  *
  * Only algebraic aggregates compose this way — sum/count/min/max are
  * provided; avg derives from sum/count at the end. Results are
  * salt-invariant (decimal-exact sums), so the DuckDB oracle is a
  * plain GROUP BY.
  */
object Skew {
  /** `valueCol` is a money column: exact-summed at decimal(18,2), so
    * values are assumed to carry ≤ 2 fractional digits (more are
    * rounded half-up identically in the partial and the oracle). */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    // deterministic salt (not rand() — results must be reproducible):
    // hash of the WHOLE row, not just the value column, so a hot key
    // whose rows share one dominant value still spreads over all
    // buckets. Only fully identical rows co-locate, and those collapse
    // in the map-side partial anyway.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"),
        min(col(valueCol)).as("__pmin"),
        max(col(valueCol)).as("__pmax"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum("__psum").cast("double").as("total"),
        sum("__pcnt").as("n"),
        min("__pmin").as("min_value"),
        max("__pmax").as("max_value"))
      .withColumn("avg_value", col("total") / col("n"))
  }

  /** Skew-safe equi-join (the brief's "salting for skew" on the JOIN
    * side). A hot fact key routes every matching row to ONE sort-merge
    * task; AQE's skew-join split is the runtime safety net, but it only
    * fires per-partition and after the skewed shuffle has been written.
    * Salting removes the hot partition from the plan itself: the fact
    * side gets a deterministic per-row salt in [0, buckets), the dim
    * side is replicated once per salt value, and the join key becomes
    * (key, salt) — each hot key now owns `buckets` reducers. Cost is
    * dim × buckets rows shuffled, so it pays when the dim is far
    * smaller than the fact (but too big or too mid to broadcast —
    * a broadcast join has no skew problem to begin with).
    *
    * SHUFFLE_HASH on the replicated dim keeps the demo honest at test
    * SFs (Spark would otherwise broadcast the small dim and the salted
    * path would never execute); at scale the hint also skips the sort
    * that SMJ would pay on both sides. Inner join only: replicating
    * the dim makes unmatched-row semantics ambiguous for outer joins.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(buckets)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(typedLit(List.range(0, buckets))))
    saltedFact
      .join(replicatedDim.hint("SHUFFLE_HASH"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
