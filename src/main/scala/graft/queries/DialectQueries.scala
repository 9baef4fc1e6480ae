package graft.queries

import graft.sources.Tables
import graft.functions.GraftFunctions

/** ClickHouse-dialect SQL executed VERBATIM through spark.sql — the
  * "switch to this library" proof: the reference's users keep their
  * SQL (function names per src/Parsers/ASTFunction.h), graft's
  * FunctionRegistry surface (functions/ChDialect.scala) resolves it to
  * codegen'd Catalyst plans, and DuckDB confirms the results. */
object DialectQueries {

  private def chSql(views: Seq[String], chQuery: String): QFn = { (s, dir) =>
    GraftFunctions.ensureRegistered(s)
    val t = Tables(s, dir)
    views.foreach {
      case "orders"    => t.orders.createOrReplaceTempView("orders")
      case "events"    => t.events.createOrReplaceTempView("events")
      case "documents" => t.documents.createOrReplaceTempView("documents")
      case "lineitem"  => t.lineitem.createOrReplaceTempView("lineitem")
    }
    s.sql(chQuery)
  }

  val defs: Map[String, Q] = Map(

    // Aggregating CH dialect: countIf/sumIf/uniqExact/median/quantile.
    "c01_dialect_agg" -> Q(
      """SELECT year(o_orderdate) AS yr, o_orderstatus,
        |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  quantile_cont(o_totalprice, 0.5) AS med,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)(
      chSql(Seq("orders"),
        """SELECT toYear(o_orderdate) AS yr, o_orderstatus,
          |  countIf(o_totalprice > 150000) AS n_big,
          |  CAST(sumIf(CAST(o_totalprice AS DECIMAL(18,2)), o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total,
          |  uniqExact(o_custkey) AS n_cust,
          |  median(o_totalprice) AS med,
          |  quantile(o_totalprice, 0.9) AS p90
          |FROM orders GROUP BY yr, o_orderstatus ORDER BY yr, o_orderstatus""".stripMargin)),

    // Scalar CH dialect over events: JSON extraction, time bucketing,
    // integer division, conditionals — all through spark.sql.
    "c02_dialect_scalar" -> Q(
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hr,
        |  event_id // 7 AS grp,
        |  CASE WHEN value > 75 THEN 'high' WHEN value > 25 THEN 'mid' ELSE 'low' END AS band,
        |  length(event_type) > 0 AS has_type
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)(
      chSql(Seq("events"),
        """SELECT event_id,
          |  JSONExtractInt(props, 'k') AS k,
          |  date_format(toStartOfHour(ts), 'yyyy-MM-dd HH') AS hr,
          |  intDiv(event_id, 7) AS grp,
          |  multiIf(value > 75, 'high', value > 25, 'mid', 'low') AS band,
          |  notEmpty(event_type) AS has_type
          |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin))
  )
}
