package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SETTINGS / SET → Spark conf mapping (reference:
  * src/Parsers/ASTSetQuery.h:12-17 — settings travel as name/value
  * `changes`; QueryWithOutputSettingsPushDownVisitor.h pushes the
  * trailing clause onto the query it follows).
  *
  * ClickHouse users steer the executor with a handful of knobs; the
  * ones with a real Spark equivalent map onto session confs, the rest
  * are DOCUMENTED no-ops (Tungsten's batch sizing and memory manager
  * own those decisions):
  *
  *  - `max_threads` → `spark.sql.shuffle.partitions` — the engine
  *    parallelism knob maps to the shuffle fan-out;
  *  - `join_algorithm` — `partial_merge`/`full_sorting_merge` force
  *    sort-merge (broadcast off + preferSortMergeJoin);
  *    `hash`/`parallel_hash`/`grace_hash` prefer shuffled-hash;
  *    `auto`/`direct`/`default` leave the optimizer to it;
  *  - `max_block_size`, `max_memory_usage`, `max_insert_threads`,
  *    `optimize_read_in_order`, … → ignored: columnar batch size and
  *    memory limits are Tungsten-owned, read-in-order is what the
  *    parquet sort layout already gives.
  *
  * Per-query SETTINGS are QUERY-scoped exactly like the reference:
  * the confs are set, the statement is planned EAGERLY (shuffle
  * partition counts and join strategies are decided at
  * physical-planning time, so they bake into the returned frame), and
  * the previous values restored. The CH `SET` statement is
  * SESSION-scoped, also like the reference.
  */
object ChSettings {

  /** The Spark conf translations for one setting; Nil = documented
    * no-op (dropped with unchanged semantics). */
  def confsFor(key: String, value: String): Seq[(String, String)] =
    key.toLowerCase match {
      case "max_threads" => Seq("spark.sql.shuffle.partitions" -> value)
      // Protobuf/CapnProto schema pointer (FormatSchemaInfo.cpp's
      // 'file:Message' form) — carried on a graft conf so SET makes it
      // session-visible to file() adoption and INTO OUTFILE
      case "format_schema" => Seq("spark.graft.format_schema" -> value)
      // Regexp input format knobs, same session-visible carrier
      case "format_regexp" => Seq("spark.graft.format_regexp" -> value)
      case "format_regexp_skip_unmatched" =>
        Seq("spark.graft.format_regexp_skip_unmatched" -> value)
      // Template INPUT needs the row template session-visible too
      case "format_template_row" =>
        Seq("spark.graft.format_template_row" -> value)
      case "join_algorithm" => value.toLowerCase match {
        case "partial_merge" | "full_sorting_merge" | "prefer_partial_merge" =>
          Seq("spark.sql.join.preferSortMergeJoin" -> "true",
            "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        case "hash" | "parallel_hash" | "grace_hash" =>
          Seq("spark.sql.join.preferSortMergeJoin" -> "false")
        case _ => Nil // auto / direct / default: the optimizer decides
      }
      case _ => Nil
    }

  /** Run `body` with `settings` applied query-scoped, against a
    * per-query SESSION CLONE: the scoped confs live for the query's
    * entire lifetime (AQE re-optimization at execution time re-reads
    * the session conf — a set/plan/restore window would leak the
    * restored values into runtime re-plans), and the shared session's
    * confs are never mutated, so concurrent queries on the same
    * session cannot observe the override. The clone shares the
    * catalog, temp views, and function registry. */
  def scoped(spark: SparkSession, settings: Seq[(String, String)])(
      body: SparkSession => DataFrame): DataFrame = {
    val confs = settings.flatMap { case (k, v) => confsFor(k, v) }
    if (confs.isEmpty) return body(spark)
    val scopedSession = org.apache.spark.sql.graftshim.SessionClone(spark)
    confs.foreach { case (k, v) => scopedSession.conf.set(k, v) }
    body(scopedSession)
  }

  /** CH `SET k = v, …` — session-scoped like the reference. Mapped CH
    * names set their Spark confs; literal `spark.*` keys pass through
    * so one front door configures both surfaces. */
  def set(spark: SparkSession, settings: Seq[(String, String)]): Unit =
    settings.foreach { case (k, v) =>
      if (k.startsWith("spark.")) spark.conf.set(k, v)
      else confsFor(k, v).foreach { case (ck, cv) => spark.conf.set(ck, cv) }
    }
}
