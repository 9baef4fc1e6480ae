package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd loaders for the driver-generated parquet tables
  * (see /root/repo/TESTDATA.md). One parquet file per table under a
  * scale-factor directory.
  *
  * At cluster scale these would be partitioned/bucketed catalog tables;
  * here the parquet scan is the interface — Catalyst still gets filter
  * pushdown and column pruning through it, which is what matters for
  * the plans downstream.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** events.parquet's `ts` column has shipped in two physical forms
    * across testdata generations, so the loader branches on the ACTUAL
    * parquet type instead of assuming one:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it natively; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
    *    construction by every graft entrypoint) it arrives as a Long
    *    of epoch-nanos, converted here to a µs timestamp with integer
    *    arithmetic (ns epochs exceed 2^53, so no double round-trip).
    *    DuckDB's reader applies the identical ns→µs truncation, so
    *    ts-keyed oracles cannot flake on precision.
    *  - timestamp[us] (isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; cast to the session TimestampType. Sessions
    *    pin spark.sql.session.timeZone=UTC, so the cast is
    *    value-identical and downstream plans keep seeing the same
    *    TimestampType they always did.
    *
    * The sub-second truncation ladder itself is pinned by
    * y07_datetime64; TestdataSchemaSpec canaries the physical types.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val df = t("events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
