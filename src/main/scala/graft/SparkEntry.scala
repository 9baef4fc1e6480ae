package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each queries entry is one operator from the reference's surface
  * (awfeequdng/clickhouse_from_scratch) re-expressed Spark-first;
  * oracleSql carries the DuckDB twin for the driver's hash compare.
  */
object SparkEntry {

  private val groups: Seq[Map[String, Q]] = Seq(
    CoreQueries.defs,
    JoinQueries.defs,
    GroupModQueries.defs,
    AggQueries.defs,
    WindowQueries.defs,
    FnQueries.defs,
    DedupQueries.defs,
    AnnQueries.defs,
    TextQueries.defs,
    MultimodalQueries.defs,
    StreamQueries.defs,
    TypeQueries.defs,
    DialectQueries.defs
  )

  private lazy val all: Map[String, Q] = groups.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** DuckDB-runnable oracle SQL per query (omitted ⇒ rows-only check). */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql), _)) => k -> sql }

  /** Fitted-model oracles (Q.dynamic): SQL generated AFTER the fit
    * with centroid literals spliced in — verifies the deterministic
    * scoring half hash-exactly while the iterative fit stays
    * spec-verified. Verify merges this with [[oracleSql]]. */
  def dynamicOracleSql(spark: SparkSession, dir: String): Map[String, String] =
    all.collect { case (k, Q(_, _, Some(gen))) => k -> gen(spark, dir) }
}
