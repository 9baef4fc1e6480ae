package graft.functions

/** Clause-level translator for the ClickHouse-ONLY SQL constructs the
  * Spark parser rejects (reference: src/Parsers/ASTSelectQuery.h —
  * prewhere() at :24, limitBy() at :30-32; ASTSampleRatio.h). Together
  * with the ChDialect function registry this lets the reference's SQL
  * run end-to-end: `spark.sql(ChSql.translate(chQuery))`.
  *
  * Scope is deliberately conservative — three tail-clause rewrites on
  * the OUTER query, string literals masked so keywords inside quotes
  * can't confuse the scan, and anything unrecognized passes through
  * for Spark's own parser to accept or reject:
  *
  *  - `PREWHERE e [WHERE w]` → `WHERE (e) [AND (w)]`. In ClickHouse
  *    PREWHERE is an IO hint with AND semantics; Spark's scan-level
  *    filter pushdown is the same optimization, so the merge is exact.
  *  - `ORDER BY o LIMIT n BY c1,…` → wrap with a row_number window
  *    partitioned by the BY columns, ordered by the query's ORDER BY
  *    (per-group first-n, exactly ClickHouse's LIMIT BY), re-applying
  *    the outer ORDER BY / final LIMIT. Restriction: the ORDER BY
  *    columns must appear in the SELECT list (the window wraps the
  *    projected query).
  *  - `FROM t SAMPLE f BY col` → deterministic hash-range predicate
  *    `xxhash64(col) <= cut(f)` merged into WHERE. (ClickHouse reads
  *    the table-declared sampling key; Spark has no table DDL carrying
  *    one, so the key is explicit — the `BY col` form.)
  */
object ChSql {

  def translate(sql: String): String = {
    val (masked, literals) = mask(sql)
    val out = rewriteSample(rewriteLimitBy(rewritePrewhere(
      rewriteNumbers(stripHints(masked)))))
    unmask(out, literals)
  }

  /** Clauses with no Spark-side semantics:
    *  - GLOBAL IN/JOIN is ClickHouse's distribution hint (ship the
    *    subquery to every shard) — Spark's optimizer owns that
    *    decision (broadcast), so the keyword is dropped;
    *  - FORMAT <name> selects client output encoding — meaningless
    *    inside an engine, dropped. */
  private def stripHints(sql: String): String =
    sql.replaceAll("(?i)\\bGLOBAL\\s+(?=(ANY\\s+|ALL\\s+)?(IN|JOIN|LEFT|RIGHT|INNER|FULL)\\b)", "")
      .replaceAll("(?is)\\bFORMAT\\s+\\w+\\s*$", "")

  /** numbers(N) table function (ClickHouse system.numbers slice) →
    * Spark's range(N), with the column renamed to `number`. */
  private def rewriteNumbers(sql: String): String =
    sql.replaceAll("(?i)\\bnumbers\\s*\\(\\s*(\\d+)\\s*\\)",
      "(SELECT id AS number FROM range($1))")

  // ---- string-literal masking ----
  private def mask(sql: String): (String, Vector[String]) = {
    val lits = Vector.newBuilder[String]
    val out = new StringBuilder
    var i = 0
    var n = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        val end = {
          var j = i + 1
          while (j < sql.length && sql.charAt(j) != '\'') j += 1
          j
        }
        lits += sql.substring(i, math.min(end + 1, sql.length))
        out.append("\\u00a7L" + n + "\\u00a7")
        n += 1
        i = end + 1
      } else {
        out.append(sql.charAt(i)); i += 1
      }
    }
    (out.toString, lits.result())
  }

  private def unmask(sql: String, lits: Vector[String]): String =
    lits.zipWithIndex.foldLeft(sql) { case (s, (lit, i)) =>
      s.replace("\\u00a7L" + i + "\\u00a7", lit)
    }

  // ---- PREWHERE ----
  private val prewhereRe =
    """(?is)\bPREWHERE\b(.*?)(\bWHERE\b(.*?))?(?=\bGROUP\s+BY\b|\bORDER\s+BY\b|\bLIMIT\b|\bHAVING\b|$)""".r

  private def rewritePrewhere(sql: String): String =
    prewhereRe.replaceAllIn(sql, m => {
      val pre = m.group(1).trim
      Option(m.group(3)).map(_.trim) match {
        case Some(w) if w.nonEmpty =>
          java.util.regex.Matcher.quoteReplacement(s"WHERE ($pre) AND ($w) ")
        case _ =>
          java.util.regex.Matcher.quoteReplacement(s"WHERE ($pre) ")
      }
    })

  // ---- LIMIT n BY cols ----
  private val limitByRe =
    """(?is)^(.*?)\bORDER\s+BY\b(.*?)\bLIMIT\s+(\d+)\s+BY\s+(.*?)(\bLIMIT\s+(\d+))?\s*$""".r

  private def rewriteLimitBy(sql: String): String = sql match {
    case limitByRe(head, order, n, byCols, _, finalLimit) =>
      val ord = order.trim
      val by = byCols.trim
      val outerLimit = Option(finalLimit).map(l => s" LIMIT $l").getOrElse("")
      s"""SELECT * EXCEPT(__rn) FROM (
         |  SELECT *, row_number() OVER (PARTITION BY $by ORDER BY $ord) AS __rn
         |  FROM ($head) ) WHERE __rn <= $n ORDER BY $ord$outerLimit""".stripMargin
    case _ => sql
  }

  // ---- SAMPLE f BY col ----
  private val sampleRe =
    """(?is)\bSAMPLE\s+(0?\.\d+|\d+\.\d+)\s+BY\s+(\w+)""".r

  private def rewriteSample(sql: String): String =
    sampleRe.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val frac = m.group(1).toDouble
        val key = m.group(2)
        val cut = (Long.MinValue + (frac * 2.0 * Long.MaxValue)).toLong
        val pred = s"xxhash64($key) <= ${cut}L"
        val removed = sql.substring(0, m.start) + sql.substring(m.end)
        // merge into an existing WHERE, or insert one before the next clause
        val whereRe = """(?is)\bWHERE\b""".r
        whereRe.findFirstMatchIn(removed) match {
          case Some(w) =>
            removed.substring(0, w.end) + s" $pred AND" + removed.substring(w.end)
          case None =>
            val tailRe = """(?is)\bGROUP\s+BY\b|\bORDER\s+BY\b|\bLIMIT\b|\bHAVING\b""".r
            tailRe.findFirstMatchIn(removed) match {
              case Some(t) =>
                removed.substring(0, t.start) + s"WHERE $pred " + removed.substring(t.start)
              case None => removed + s" WHERE $pred"
            }
        }
    }
}
