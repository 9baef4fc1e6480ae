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
    var relAlias: Option[String] = None
    if (ni < ts.length && ts(ni).up == "AS" && ni + 1 < ts.length &&
      ts(ni + 1).word) { relAlias = Some(ts(ni + 1).text); ni += 2 } // AS alias
    else if (ni < ts.length && ts(ni).word && !clauseKws.contains(ts(ni).up) &&
      !joinKws.contains(ts(ni).up)) { relAlias = Some(ts(ni).text); ni += 1 }
    val nameEnd = ni // end of FROM <name> [AS alias] — protected span
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
    // ALIAS columns (ASTColumnDeclaration default_specifier ALIAS):
    // virtual read-time expressions — resolve a reference anywhere in
    // the query (select list, WHERE, GROUP BY, …) by inlining the
    // declared expression, so it plans inside the scan's own
    // projection/filter and pushes down like hand-written SQL.
    // Chained aliases inline bounded (cycles refused at CREATE).
    val quals: Set[String] =
      nameParts.lastOption.toSet ++ relAlias.toSet
    val aliasSubs: Map[String, String] = {
      val raw: Map[String, String] =
        if (!singleRelation) Map.empty
        else declared.map(_.cols.filter(_.defaultKind.contains("ALIAS"))
          .map(c => c.name -> c.defaultExpr.getOrElse("")).toMap)
          .getOrElse(Map.empty)
      var defs = raw
      var n = 0
      def refsAlias(e: String): Boolean = {
        val et = tokenize(e)._1
        et.indices.exists(k => et(k).word && defs.contains(et(k).text) &&
          !(k + 1 < et.length && et(k + 1).text == "("))
      }
      while (n < 8 && defs.values.exists(refsAlias)) {
        defs = defs.map { case (k, v) =>
          k -> render(substAliasToks(tokenize(v)._1, defs - k, Set.empty)).trim }
        n += 1
      }
      defs
    }
    val aliasRefPresent = aliasSubs.nonEmpty && ts.indices.exists(i =>
      (i <= fromIdx || i >= nameEnd) && ts(i).word &&
        aliasSubs.contains(ts(i).text))
    if (!items.exists(expandable) && !(expandBare && items.exists(bareStar)) &&
        !aliasRefPresent)
      return ts

    require(fromTable.nonEmpty,
      "COLUMNS()/APPLY expansion needs a named table or view in FROM")
    val table = fromTable.get
    // virtual (ALIAS/EPHEMERAL) columns are hidden from * and from
    // COLUMNS('re') — the reference's asterisk default
    val fields = declared
      .map(_.cols.filterNot(_.isVirtual).map(_.name): Seq[String]).getOrElse(
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

    // a whole select item that IS an alias reference keeps the alias
    // as its output name (the reference's `SELECT alias_col` answer);
    // references inside larger expressions inline parenthesized
    def substItem(it: Vector[Tok]): String =
      if (it.length == 1 && it.head.word && aliasSubs.contains(it.head.text))
        s"(${aliasSubs(it.head.text)}) AS `${it.head.text}`"
      else if (it.length == 3 && it.head.word && quals.contains(it.head.text) &&
          it(1).text == "." && it(2).word && aliasSubs.contains(it(2).text))
        s"(${aliasSubs(it(2).text)}) AS `${it(2).text}`"
      else renderTrim(substAliasToks(it, aliasSubs, quals))

    val selectList = items
      .map(it =>
        if (expandable(it) || (expandBare && bareStar(it))) expandItem(it)
        else substItem(it))
      .mkString(", ")
    val tail = ts.slice(fromIdx, nameEnd) ++
      substAliasToks(ts.drop(nameEnd), aliasSubs, quals)
    ChSql.retok(s"SELECT $selectList ${ChSql.render(tail).trim}")
  }

  /** Inline ALIAS definitions into a token stream: a bare word
    * matching an alias name (not a function call, not qualified by
    * another relation, not an `AS` output name) becomes `( expr )`,
    * and `rel.name` qualified by the FROM relation or its alias does
    * too. */
  private def substAliasToks(ts: Vector[Tok], subs: Map[String, String],
      quals: Set[String]): Vector[Tok] = {
    if (subs.isEmpty) return ts
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < ts.length) {
      val t = ts(i)
      if (t.word && quals.contains(t.text) && i + 2 < ts.length &&
          ts(i + 1).text == "." && ts(i + 2).word &&
          subs.contains(ts(i + 2).text) &&
          !(i + 3 < ts.length && ts(i + 3).text == "(")) {
        out ++= tokenize(s"(${subs(ts(i + 2).text)})")._1
        i += 3
      } else if (t.word && subs.contains(t.text) &&
          !(i + 1 < ts.length && ts(i + 1).text == "(") &&
          !(i > 0 && ts(i - 1).text == ".") &&
          !(i > 0 && ts(i - 1).word && ts(i - 1).up == "AS")) {
        out ++= tokenize(s"(${subs(t.text)})")._1
        i += 1
      } else { out += t; i += 1 }
    }
    out.result()
  }
}
