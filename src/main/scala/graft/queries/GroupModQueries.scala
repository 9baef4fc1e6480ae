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
    // Spark plans ROLLUP as Expand (one input copy per level — 3x the
    // scan rows through the aggregate's shuffle). The levels are
    // re-aggregations of each other (COUNT and the exact-decimal SUM
    // are associative), so compute the FINEST level once and roll the
    // tiny grouped result up locally (guide §2.3: aggregate before
    // you shuffle — the shuffle carries |groups| rows instead of
    // 3x|input|). Bit-identical: decimal addition is exact in any
    // association, the '(all)' sentinels are the GROUPING() branches.
    "g01_rollup" -> Q(g01Sql) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val base = Tables(s, dir).lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      val lvl0 = base.select(col("l_returnflag").as("returnflag"),
        col("l_linestatus").as("linestatus"), col("n"), col("q"))
      val lvl1 = base.groupBy("l_returnflag")
        .agg(sum("n").as("n"), sum("q").as("q"))
        .select(col("l_returnflag").as("returnflag"),
          lit("(all)").as("linestatus"), col("n"), col("q"))
      // coalesce: GROUP BY ROLLUP emits the () row with n = 0 on an
      // EMPTY table, but sum("n") over an empty base is NULL — match
      // the SQL semantics exactly (no-op on non-empty input)
      val lvl2 = base.agg(coalesce(sum("n"), lit(0L)).as("n"),
          sum("q").as("q"))
        .select(lit("(all)").as("returnflag"), lit("(all)").as("linestatus"),
          col("n"), col("q"))
      lvl0.unionByName(lvl1).unionByName(lvl2)
        .select(col("returnflag"), col("linestatus"), col("n"),
          col("q").cast("double").as("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },
    "g04_grouping_sets" -> Q(g04Sql) { (s, dir) =>
      Tables(s, dir).orders.createOrReplaceTempView("orders")
      s.sql(g04Sql)
    },
    // CUBE = Expand with FOUR input copies through the shuffle; like
    // g01, every cube level is a re-aggregation of the finest level
    // (COUNT + exact-decimal SUM are associative), so aggregate once
    // and derive the other three levels from the tiny grouped result
    // (guide §2.3: aggregate before you shuffle).
    "g02_cube" -> Q(g02Sql) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val base = Tables(s, dir).orders
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("t"))
      val lvl0 = base.select(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"), col("n"), col("t"))
      val lvl1 = base.groupBy("o_orderstatus")
        .agg(sum("n").as("n"), sum("t").as("t"))
        .select(col("o_orderstatus").as("status"),
          lit("(all)").as("priority"), col("n"), col("t"))
      val lvl2 = base.groupBy("o_orderpriority")
        .agg(sum("n").as("n"), sum("t").as("t"))
        .select(lit("(all)").as("status"),
          col("o_orderpriority").as("priority"), col("n"), col("t"))
      // coalesce: CUBE's () row has n = 0 on an empty table; sum over
      // an empty base is NULL (ADVICE r19 — no-op on non-empty input)
      val lvl3 = base.agg(coalesce(sum("n"), lit(0L)).as("n"),
          sum("t").as("t"))
        .select(lit("(all)").as("status"), lit("(all)").as("priority"),
          col("n"), col("t"))
      lvl0.unionByName(lvl1).unionByName(lvl2).unionByName(lvl3)
        .select(col("status"), col("priority"), col("n"),
          col("t").cast("double").as("total"))
        .orderBy("status", "priority")
    },
    "g03_totals" -> Q(g03Sql) { (s, dir) =>
      Tables(s, dir).orders.createOrReplaceTempView("orders")
      s.sql(g03Sql)
    }
  )
}
