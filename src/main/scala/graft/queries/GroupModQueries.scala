package graft.queries

import graft.sources.Tables

/** GROUP BY modifiers (SURVEY §2): ClickHouse WITH ROLLUP / WITH CUBE /
  * WITH TOTALS (reference: src/Parsers/ASTSelectQuery.h group_by_with_*
  * flags). Grouping-null levels get a '(all)' sentinel via GROUPING()
  * so ordering is engine-independent; Spark and DuckDB run the same
  * SQL text (Spark plans it as Expand + partial aggregate, exactly the
  * hand-built rollup plan).
  */
object GroupModQueries {

  private val g01Sql =
    """SELECT
      |  CASE WHEN GROUPING(l_returnflag) = 1 THEN '(all)' ELSE l_returnflag END AS returnflag,
      |  CASE WHEN GROUPING(l_linestatus) = 1 THEN '(all)' ELSE l_linestatus END AS linestatus,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  private val g02Sql =
    """SELECT
      |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // WITH TOTALS = GROUPING SETS ((keys), ()) — per-group rows plus
  // exactly one totals row, no intermediate rollup levels.
  private val g03Sql =
    """SELECT
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY GROUPING SETS ((o_orderpriority), ())
      |ORDER BY priority""".stripMargin

  // Disjoint single-key grouping sets + grouping_id bitmask — the
  // general ASTSelectQuery grouping-sets form beyond rollup/cube.
  private val g04Sql =
    """SELECT
      |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
      |  GROUPING(o_orderstatus) AS g_status,
      |  GROUPING(o_orderpriority) AS g_priority,
      |  COUNT(*) AS n
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority, status, priority""".stripMargin

  val defs: Map[String, Q] = Map(
    "g01_rollup" -> Q(g01Sql) { (s, dir) =>
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem")
      s.sql(g01Sql)
    },
    "g04_grouping_sets" -> Q(g04Sql) { (s, dir) =>
      Tables(s, dir).orders.createOrReplaceTempView("orders")
      s.sql(g04Sql)
    },
    "g02_cube" -> Q(g02Sql) { (s, dir) =>
      Tables(s, dir).orders.createOrReplaceTempView("orders")
      s.sql(g02Sql)
    },
    "g03_totals" -> Q(g03Sql) { (s, dir) =>
      Tables(s, dir).orders.createOrReplaceTempView("orders")
      s.sql(g03Sql)
    }
  )
}
