package graft.functions

import org.apache.spark.sql.SparkSession

import ChSql.{Tok, tokenize, render, renderTrim, matchParen, find0, splitTopLevel}

/** Column matchers and transformers (reference:
  * src/Parsers/ASTColumnsMatcher.h:1 — `COLUMNS('regex')`;
  * ASTColumnsTransformers.h:1 — `EXCEPT(…)`, `APPLY(f)`,
  * `REPLACE(expr AS name)` chains after `*` or a matcher).
  *
  * The expansion is SCHEMA-AWARE (the regex and the transformer chain
  * resolve against the FROM relation's columns), so it lives behind
  * the session-holding ChDdl.execute front door — the same trick
  * executeAsof uses. Pure-text translate() cannot expand these.
  *
  * `COLUMNS('re')` selects the matching columns (RE2-style partial
  * match, like the reference); transformers chain left-to-right:
  * `EXCEPT(a, b)` / `EXCEPT a` removes columns, `APPLY(f)` / `APPLY f`
  * wraps each selected column — output named `f(col)` exactly as the
  * reference names it — and `REPLACE(expr AS name)` swaps a column's
  * expression keeping its position and name. A bare `* EXCEPT(…)`
  * with no APPLY/REPLACE is left for Spark's native form.
  *
  * Scope: the OUTER select list of a query whose FROM is a named
  * table or view (expansion needs one schema to resolve against).
  */
object ChColumns {

  /** Expand matchers/transformers in `sql` — in the outer select list
    * and RECURSIVELY inside parenthesized subqueries (each resolves
    * against its own FROM) — or return it unchanged when none are
    * present. */
  def expand(spark: SparkSession, sql: String): String =
    ChSql.render(expandToks(spark, tokenize(sql)._1))

  private def expandToks(spark: SparkSession, ts0: Vector[Tok]): Vector[Tok] = {
    // depth-first: subqueries expand against their own FROM relation
    val ts = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < ts0.length) {
        if (ts0(i).text == "(") {
          val j = matchParen(ts0, i)
          out += ts0(i)
          out ++= expandToks(spark, ts0.slice(i + 1, j))
          out += ts0(j)
          i = j + 1
        } else { out += ts0(i); i += 1 }
      }
      out.result()
    }
    if (ts.isEmpty || ts.head.up != "SELECT") return ts
    val fromIdx = find0(ts, Set("FROM"))
    if (fromIdx < 0) return ts
    val items = splitTopLevel(ts.slice(1, fromIdx))

    def isMatcher(it: Vector[Tok]): Boolean =
      it.length > 1 && it.head.up == "COLUMNS" && it(1).text == "("
    def hasTransform(it: Vector[Tok]): Boolean = {
      val d = ChSql.depths(it)
      it.indices.exists(k => d(k) == 0 && it(k).word &&
        Set("APPLY", "REPLACE").contains(it(k).up))
    }
    def expandable(it: Vector[Tok]): Boolean =
      isMatcher(it) || (it.head.text == "*" && hasTransform(it))
    // bare `*` over a ChDdl-created table ALSO expands — to the
    // DECLARED column order (the reference's SELECT * contract): the
    // Spark catalog moves partition columns to the end and carries the
    // internal __sample_hash, neither of which a CH user should see.
    // Only when FROM is that single relation (a join's * spans both
    // sides — left alone).
    def bareStar(it: Vector[Tok]): Boolean = it.length == 1 && it.head.text == "*"
    val clauseKws = Set("WHERE", "PREWHERE", "GROUP", "HAVING", "ORDER",
      "LIMIT", "SETTINGS", "FORMAT", "SAMPLE", "FINAL", ";")
    // words that introduce a second relation — never a table alias
    val joinKws = Set("JOIN", "LEFT", "RIGHT", "INNER", "FULL", "CROSS",
      "ASOF", "ANY", "SEMI", "ANTI", "GLOBAL", "ARRAY", "UNION", "ON",
      "USING", "INTERSECT", "EXCEPT")
    // FROM <name[.name…]> [AS] [alias] — dotted names and aliases both
    // still bind the declared order; anything else (joins, commas,
    // subqueries) leaves * to Spark
    var ni = fromIdx + 1
    var nameParts = Vector.empty[String]
    while (ni < ts.length && ts(ni).word && !clauseKws.contains(ts(ni).up) &&
      !joinKws.contains(ts(ni).up) && nameParts.isEmpty) {
      nameParts :+= ts(ni).text
      ni += 1
      while (ni + 1 < ts.length && ts(ni).text == "." && ts(ni + 1).word) {
        nameParts :+= ts(ni + 1).text
        ni += 2
      }
    }
    if (ni < ts.length && ts(ni).up == "AS" && ni + 1 < ts.length &&
      ts(ni + 1).word) ni += 2 // AS alias
    else if (ni < ts.length && ts(ni).word && !clauseKws.contains(ts(ni).up) &&
      !joinKws.contains(ts(ni).up)) ni += 1 // bare alias
    // registry key = underscore-joined (ChDdl's convention); the
    // resolvable name for spark.table keeps its dots
    val fromTable = nameParts.headOption.map(_ => nameParts.mkString("."))
    val declared = nameParts.headOption.flatMap(_ =>
      ChDdl.createdTables.get(nameParts.mkString("_").toLowerCase))
    val singleRelation = fromTable.nonEmpty &&
      (ni >= ts.length ||
        (ts(ni).word && clauseKws.contains(ts(ni).up)) ||
        clauseKws.contains(ts(ni).text))
    val expandBare = declared.nonEmpty && singleRelation
    if (!items.exists(expandable) && !(expandBare && items.exists(bareStar)))
      return ts

    require(fromTable.nonEmpty,
      "COLUMNS()/APPLY expansion needs a named table or view in FROM")
    val table = fromTable.get
    val fields = declared.map(_.cols.map(_.name): Seq[String]).getOrElse(
      spark.table(table).schema.fieldNames.toSeq.filterNot(_ == "__sample_hash"))

    def expandItem(it: Vector[Tok]): String = {
      // initial selection
      var k = 0
      var cols: Seq[(String, String)] = // (expression text, output name)
        if (isMatcher(it)) {
          val close = matchParen(it, 1)
          val lit = renderTrim(it.slice(2, close))
          require(lit.startsWith("'") && lit.endsWith("'"),
            s"COLUMNS(...) takes a quoted regex, got $lit")
          val re = lit.stripPrefix("'").stripSuffix("'").r
          k = close + 1
          fields.filter(c => re.findFirstIn(c).isDefined).map(c => (c, c))
        } else { k = 1; fields.map(c => (c, c)) }
      require(cols.nonEmpty, s"'${renderTrim(it)}' matched no columns of $table")
      // transformer chain, left to right
      while (k < it.length) {
        val kw = it(k).up
        def args(): Seq[Vector[Tok]] =
          if (k + 1 < it.length && it(k + 1).text == "(") {
            val close = matchParen(it, k + 1)
            val a = splitTopLevel(it.slice(k + 2, close))
            k = close + 1
            a
          } else { // single bare argument form: EXCEPT a / APPLY f
            require(k + 1 < it.length && it(k + 1).word,
              s"$kw needs arguments in '${renderTrim(it)}'")
            val a = Seq(Vector(it(k + 1)))
            k = k + 2
            a
          }
        kw match {
          case "EXCEPT" =>
            val drop = args().map(_.head.text).toSet
            cols = cols.filterNot { case (_, n) => drop.contains(n) }
          case "APPLY" =>
            val fs = args()
            require(fs.length == 1 && fs.head.length == 1 && fs.head.head.word,
              s"APPLY takes one function name in '${renderTrim(it)}'")
            val f = fs.head.head.text
            cols = cols.map { case (e, n) => (s"$f($e)", s"$f($n)") }
          case "REPLACE" =>
            args().foreach { a =>
              val ai = a.indexWhere(t => t.up == "AS" && t.word)
              require(ai > 0 && ai == a.length - 2 && a.last.word,
                s"REPLACE items are expr AS name: '${renderTrim(a)}'")
              val name = a.last.text
              val e = s"(${renderTrim(a.take(ai))})"
              cols = cols.map { case (t, n) => if (n == name) (e, n) else (t, n) }
            }
          case other => throw new IllegalArgumentException(
            s"unknown column transformer $other in '${renderTrim(it)}'")
        }
      }
      cols.map { case (e, n) => if (e == n) n else s"$e AS `$n`" }.mkString(", ")
    }

    val selectList = items
      .map(it =>
        if (expandable(it) || (expandBare && bareStar(it))) expandItem(it)
        else renderTrim(it))
      .mkString(", ")
    ChSql.retok(s"SELECT $selectList ${ChSql.render(ts.drop(fromIdx)).trim}")
  }
}
