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

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's reader
    * rejects; read nanos as long and convert to a microsecond
    * timestamp with integer arithmetic (ns epochs exceed 2^53, so no
    * double round-trip). Requires `spark.sql.legacy.parquet
    * .nanosAsLong=true`, set at session construction by every graft
    * entrypoint (Verify/Bench/test fixture) — loaders never mutate
    * session conf.
    *
    * Oracle-drift note: DuckDB's parquet reader surfaces the same
    * TIMESTAMP(NANOS) column as a µs TIMESTAMP, i.e. it applies the
    * IDENTICAL ns→µs truncation on read — both engines see the same
    * µs values even if the generator ever emits sub-µs-distinct
    * timestamps, so ts-keyed oracles (j09/j11/s01) cannot flake on
    * precision. The sub-second truncation ladder itself is pinned by
    * y07_datetime64.
    */
  def events: DataFrame =
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
