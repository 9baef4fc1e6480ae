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
}
