package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SELECT … FORMAT output rendering (reference: src/Formats/
  * FormatFactory.cpp; ParserQueryWithOutput.h attaches the clause to
  * every output query). The engine-side result is the same rows — the
  * FORMAT only chooses the client serialization — so the front door
  * returns ONE string column `line`, one output row per result row,
  * in the result's order:
  *
  *  - JSONEachRow (JSONEachRowUtils.cpp): compact one-object-per-line
  *    JSON, null fields INCLUDED (the reference writes them);
  *  - CSV: comma-separated, quoted only when needed, NULL as `\N`;
  *  - TSV / TabSeparated: tab-separated raw values, NULL as `\N`;
  *  - Values: `(v1,v2,…)` tuples — strings single-quoted with
  *    backslash escapes, NULL literal — the same shape ChInsert
  *    accepts back (registerFormats.cpp registers it for both
  *    directions);
  *  - Pretty / PrettyCompact: the console box tables. Column widths
  *    need the whole block, so these render DRIVER-SIDE over at most
  *    the reference's own cap (output_format_pretty_max_rows =
  *    10 000) — the sanctioned client-side-output exception, like
  *    INTO OUTFILE. Output is one `line` row per RENDERED line
  *    (borders included), numerics right-aligned, NULL as ᴺᵁᴸᴸ.
  *
  * Every other registered format (Native, Vertical, …) is wire
  * decoration with no engine meaning — the clause is dropped and the
  * plain rows returned, as before.
  *
  * All non-Pretty renderings are per-row projections (to_json /
  * to_csv / concat_ws are codegen'd) — no collect, no extra shuffle.
  */
object ChFormat {

  val renderable: Set[String] = Set("JSONEACHROW", "CSV", "TSV",
    "TABSEPARATED", "VALUES", "PRETTY", "PRETTYCOMPACT", "PRETTYSPACE",
    "CSVWITHNAMES", "TSVWITHNAMES", "TABSEPARATEDWITHNAMES", "TSKV",
    "JSON", "JSONCOMPACT", "JSONCOMPACTEACHROW",
    "XML", "JSONEACHROWWITHPROGRESS", "TEMPLATE", "MARKDOWN", "NULL")

  /** Wire-protocol formats (registerFormats.cpp): binary encodings of
    * the reference's client protocol / external codecs. A library has
    * no wire to speak — refusing is the scope call, but the refusal
    * must GUIDE: columnar interchange is what parquet is for. Native
    * and RowBinary* DO exist as FILE codecs (sources/NativeFormat,
    * sources/RowBinary) — the refusal here is only for the bare
    * `FORMAT X` spelling with no OUTFILE, which in the reference
    * streams binary to the client socket. */
  val wire: Set[String] = Set("NATIVE", "ROWBINARY",
    "ROWBINARYWITHNAMES", "ROWBINARYWITHNAMESANDTYPES", "PROTOBUF",
    "PROTOBUFSINGLE", "MSGPACK", "CAPNPROTO",
    // client-protocol emulations (registerFormats.cpp:31,33,64) — a
    // library has no MySQL/PG/ODBC socket to speak
    "MYSQLWIRE", "POSTGRESQLWIRE", "ODBCDRIVER2")

  def refuseWire(f: String): Nothing =
    throw new UnsupportedOperationException(
      s"FORMAT $f is a wire-protocol encoding of the reference's " +
        "client/server protocol — a library engine has no wire. For " +
        "columnar interchange write parquet (df.write.parquet / INSERT " +
        "INTO a parquet-backed table); for binary FILE interchange " +
        "use INTO OUTFILE '…' FORMAT Native (or " +
        "RowBinaryWithNamesAndTypes) and adopt it back via " +
        "file(path, 'Native'); " +
        "for text output use FORMAT JSON/JSONEachRow/CSV/TSV/Values.")

  /** Header line + body — the WithNames contract. The header rides a
    * one-row local relation unioned FIRST; collect order preserves
    * partition order, so the header line leads the output exactly as
    * the reference's writer emits it. */
  private def withHeader(body: DataFrame, header: String): DataFrame = {
    val spark = body.sparkSession
    import spark.implicits._
    Seq(header).toDF("line").unionAll(body)
  }

  /** Template needs its SETTINGS (the reference passes
    * format_template_* through the query context); every other
    * renderable ignores them. */
  def render(df: DataFrame, fmt: String,
      settings: Seq[(String, String)]): DataFrame =
    if (fmt.toUpperCase == "TEMPLATE") template(df, settings)
    else render(df, fmt)

  def render(df: DataFrame, fmt: String): DataFrame = fmt.toUpperCase match {
    case "TEMPLATE" => template(df, Nil)
    case "XML" => xmlEnvelope(df)
    case "JSONEACHROWWITHPROGRESS" =>
      // each row wrapped as a {"row":{…}} event, then ONE final
      // {"progress":{…}} event carrying the row count — the library
      // rendering of the reference's interleaved progress stream
      // (progress is client-display state; the row count is its only
      // engine-meaningful field). read_rows is quoted like the
      // reference's 64-bit JSON integers. SINGLE-PASS (r16 "what's
      // wrong" #3): the count accumulates WHILE the rows stream
      // through the final render stage instead of re-executing the
      // child; coalesce(1) keeps row order (partition concatenation,
      // same as collect order) and is the client-stream analog — the
      // reference also renders progress into one ordered stream. Any
      // shuffle/sort in the child keeps its parallelism; only the
      // render collapses.
      val spark = df.sparkSession
      import spark.implicits._
      val rows = df.select(concat(lit("{\"row\":"),
        to_json(struct(df.columns.map(col): _*),
          Map("ignoreNullFields" -> "false")), lit("}")).as("line"))
        .as[String]
      val counted = rows.coalesce(1).mapPartitions { it =>
        var n = 0L
        it.map { s => n += 1; s } ++ Iterator.single(
          "{\"progress\":{\"read_rows\":\"" + n + "\"}}")
      }.toDF("line")
      // an optimizer-emptied child (WHERE false folded away, an empty
      // file listing) plans as a ZERO-partition RDD: mapPartitions
      // never runs and the mandatory final progress event would
      // vanish (r17 review). The plan is deterministic, so the
      // 0-partition check at render time is decisive — emit the
      // static zero-progress line.
      if (counted.queryExecution.toRdd.getNumPartitions == 0) {
        import spark.implicits._
        Seq("{\"progress\":{\"read_rows\":\"0\"}}").toDF("line")
      } else counted
    case "CSVWITHNAMES" =>
      // CH writes CSV header names quoted
      withHeader(render(df, "CSV"),
        df.columns.map(c => "\"" + c.replace("\"", "\"\"") + "\"").mkString(","))
    case "TSVWITHNAMES" | "TABSEPARATEDWITHNAMES" =>
      withHeader(render(df, "TSV"), df.columns.mkString("\t"))
    case "TSKV" =>
      // one key=value pair per column, tab-joined (registerFormats.cpp)
      df.select(concat_ws("\t", df.schema.fields.map(f =>
        concat(lit(f.name + "="),
          coalesce(col(f.name).cast("string"), lit("\\N")))): _*).as("line"))
    case "JSONEACHROW" =>
      df.select(to_json(struct(df.columns.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("line"))
    case "CSV" =>
      df.select(to_csv(struct(df.columns.map(col): _*),
        Map("nullValue" -> "\\N").asJava).as("line"))
    case "TSV" | "TABSEPARATED" =>
      df.select(concat_ws("\t", df.columns.map(c =>
        coalesce(col(c).cast("string"), lit("\\N"))): _*).as("line"))
    case "VALUES" =>
      val cells = df.schema.fields.map(quotedCell)
      df.select(concat(lit("("), concat_ws(",", cells.toIndexedSeq: _*),
        lit(")")).as("line"))
    case "PRETTY" => pretty(df, compact = false)
    case "PRETTYCOMPACT" => pretty(df, compact = true)
    case "PRETTYSPACE" => prettySpace(df)
    case "MARKDOWN" =>
      // MarkdownRowOutputFormat: header row, alignment row (numbers
      // right-align), then `| v | v |` rows — a pure per-row codegen
      // projection after the two header lines
      val align = df.schema.fields.map(_.dataType match {
        case _: NumericType => "-:"
        case _ => ":-"
      }).mkString("|", "|", "|")
      // cell text escapes the table metacharacters: '|' would add a
      // phantom column, a newline would split the row across lines
      def mdEscape(c: org.apache.spark.sql.Column) =
        call_function("replace",
          call_function("replace", c, lit("|"), lit("\\|")),
          lit("\n"), lit("\\n"))
      val header = df.columns
        .map(_.replace("|", "\\|")).mkString("| ", " | ", " |")
      val body = df.select(concat(lit("| "), concat_ws(" | ",
        df.columns.map(c =>
          coalesce(mdEscape(col(c).cast("string")), lit("\\N"))): _*),
        lit(" |")).as("line"))
      withHeader(withHeader(body, align), header)
    case "NULL" =>
      // FORMAT Null: the result is consumed and nothing renders (the
      // reference's benchmarking sink). The count() aggregate keeps
      // the child plan IN the emitted frame (a bare limit(0) would
      // optimize the query away — Null must still RUN it), and the
      // impossible filter yields zero lines.
      df.groupBy().count().filter(col("count") < 0)
        .select(lit("").as("line"))
    case "JSONCOMPACTEACHROW" =>
      // one JSON array per row — pure per-row projection (codegen'd),
      // no collect: the one JSON* format safe on an unbounded result
      df.select(concat(lit("["),
        concat_ws(", ", jsonCells(df): _*), lit("]")).as("line"))
    case "JSON" => jsonEnvelope(df, compact = false)
    case "JSONCOMPACT" => jsonEnvelope(df, compact = true)
    case other if wire(other) => refuseWire(other)
    case other =>
      throw new IllegalArgumentException(s"non-renderable FORMAT $other")
  }

  /** Per-cell JSON encoding as a codegen'd Column: the value portion
    * of to_json({"v": c}) is exactly the JSON scalar/array/object
    * encoding of c (strings escaped, null → null). 64-bit integers
    * are quoted, the reference's output_format_json_quote_64bit_
    * integers=1 default (JS numbers lose precision past 2^53). */
  private def jsonCells(df: DataFrame): Seq[org.apache.spark.sql.Column] =
    df.schema.fields.toSeq.map(jsonCell)

  private def jsonCell(f: StructField): org.apache.spark.sql.Column = {
    val c = col(f.name)
    f.dataType match {
      case LongType =>
        when(c.isNull, lit("null"))
          .otherwise(concat(lit("\""), c.cast("string"), lit("\"")))
      case _ =>
        val j = to_json(struct(c.as("v")),
          Map("ignoreNullFields" -> "false"))
        j.substr(lit(6), length(j) - 6)
    }
  }

  /** The Values/Quoted cell encoding (CH escapeString: backslash
    * first, then the quote; Date/DateTime quoted; NULL literal). */
  private def quotedCell(f: StructField): org.apache.spark.sql.Column = {
    val c = col(f.name)
    f.dataType match {
      case StringType =>
        when(c.isNull, lit("NULL")).otherwise(concat(lit("'"),
          call_function("replace",
            call_function("replace", c, lit("\\"), lit("\\\\")),
            lit("'"), lit("\\'")), lit("'")))
      case DateType | TimestampType | TimestampNTZType =>
        when(c.isNull, lit("NULL"))
          .otherwise(concat(lit("'"), c.cast("string"), lit("'")))
      case _ => coalesce(c.cast("string"), lit("NULL"))
    }
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** FORMAT JSON / JSONCompact (JSONRowOutputFormat.cpp): the
    * meta/data/rows envelope, tab-indented like the reference's
    * writer. Whole-result rendering needs the row count before the
    * tail, so it renders DRIVER-SIDE under the same row cap as
    * Pretty — the sanctioned client-side-output exception; a result
    * past the cap is truncated LOUDLY (rows_before_limit_at_least in
    * the envelope, the reference's lower-bound marker). The
    * reference's trailing "statistics" block (elapsed/rows_read) is
    * omitted: query timings are engine-internal and nondeterministic,
    * meaningless for a library result. */
  private def jsonEnvelope(df: DataFrame, compact: Boolean): DataFrame = {
    val fields = df.schema.fields
    val meta = fields.zipWithIndex.flatMap { case (f, i) =>
      val comma = if (i < fields.length - 1) "," else ""
      Seq("\t\t{",
        s"""\t\t\t"name": "${jsonEscape(f.name)}",""",
        s"""\t\t\t"type": "${jsonEscape(ChDdl.chTypeName(f.dataType, f.nullable))}"""",
        s"\t\t}$comma")
    }
    // fetch cap+1 so truncation is DETECTED, never silent: when the
    // result exceeds the render cap the envelope carries the
    // reference's own lower-bound marker (rows_before_limit_at_least,
    // JSONRowOutputFormat.cpp) instead of reporting the capped count
    // as the full cardinality
    val fetched = df.limit(prettyMaxRows + 1)
      .select(array(jsonCells(df): _*).as("cells"))
      .collect().map(_.getSeq[String](0))
    val truncated = fetched.length > prettyMaxRows
    val rendered = if (truncated) fetched.take(prettyMaxRows) else fetched
    val data = rendered.zipWithIndex.flatMap { case (cells, ri) =>
      val comma = if (ri < rendered.length - 1) "," else ""
      if (compact) Seq("\t\t[" + cells.mkString(", ") + s"]$comma")
      else {
        val body = fields.toSeq.zipWithIndex.map { case (f, i) =>
          val c = if (i < fields.length - 1) "," else ""
          s"""\t\t\t"${jsonEscape(f.name)}": ${cells(i)}$c"""
        }
        ("\t\t{" +: body) :+ s"\t\t}$comma"
      }
    }
    val tail =
      if (truncated)
        Seq(s"""\t"rows": ${rendered.length},""",
          s"""\t"rows_before_limit_at_least": ${fetched.length}""", "}")
      else Seq(s"""\t"rows": ${rendered.length}""", "}")
    val lines: Seq[String] =
      Seq("{", "\t\"meta\":", "\t[") ++ meta ++ Seq("\t],", "") ++
        Seq("\t\"data\":", "\t[") ++ data ++ Seq("\t],", "") ++ tail
    val s = df.sparkSession
    import s.implicits._
    lines.toDF("line")
  }

  /** The reference's Pretty row cap (Settings.h
    * output_format_pretty_max_rows default). */
  private val prettyMaxRows = 10000

  private def pretty(df: DataFrame, compact: Boolean): DataFrame = {
    val names = df.columns.toSeq
    val rightAlign = df.schema.fields.map(_.dataType match {
      case _: NumericType => true
      case _ => false
    })
    val rows = df.limit(prettyMaxRows).collect().map { r =>
      names.indices.map(i =>
        if (r.isNullAt(i)) "ᴺᵁᴸᴸ" else r.get(i).toString)
    }
    val widths = names.indices.map(i =>
      (rows.map(_(i).length) :+ names(i).length).max)
    def cell(v: String, i: Int): String = {
      val pad = " " * (widths(i) - v.length)
      if (rightAlign(i)) s" $pad$v " else s" $v$pad "
    }
    def edge(l: String, m: String, r: String, fill: String): String =
      widths.map(w => fill * (w + 2)).mkString(l, m, r)
    val dataLines = rows.map(r =>
      names.indices.map(i => cell(r(i), i)).mkString("│", "│", "│"))
    val lines: Seq[String] =
      if (compact) {
        // ┌─name─┬─…─┐ header-in-border, the console default
        val top = names.indices.map { i =>
          "─" + names(i) + "─" * (widths(i) + 1 - names(i).length)
        }.mkString("┌", "┬", "┐")
        (top +: dataLines) :+ edge("└", "┴", "┘", "─")
      } else {
        val header =
          names.indices.map(i => cell(names(i), i)).mkString("┃", "┃", "┃")
        Seq(edge("┏", "┳", "┓", "━"), header, edge("┡", "╇", "┩", "━")) ++
          dataLines :+ edge("└", "┴", "┘", "─")
      }
    val s = df.sparkSession
    import s.implicits._
    lines.toDF("line")
  }

  /** PrettySpace (registerFormats.cpp:58): the Pretty table without
    * the box — width-padded columns separated by spaces, header, one
    * blank line, then rows; numerics right-aligned, ᴺᵁᴸᴸ for null.
    * Driver-side under the Pretty row cap like its siblings. */
  private def prettySpace(df: DataFrame): DataFrame = {
    val names = df.columns.toSeq
    val rightAlign = df.schema.fields.map(_.dataType match {
      case _: NumericType => true
      case _ => false
    })
    val rows = df.limit(prettyMaxRows).collect().map { r =>
      names.indices.map(i =>
        if (r.isNullAt(i)) "ᴺᵁᴸᴸ" else r.get(i).toString)
    }
    val widths = names.indices.map(i =>
      (rows.map(_(i).length) :+ names(i).length).max)
    def cell(v: String, i: Int): String = {
      val pad = " " * (widths(i) - v.length)
      if (rightAlign(i)) s"$pad$v" else s"$v$pad"
    }
    val header = names.indices.map(i => cell(names(i), i)).mkString("   ")
    val dataLines = rows.map(r =>
      names.indices.map(i => cell(r(i), i)).mkString("   "))
    val lines: Seq[String] = (header +: "" +: dataLines).toIndexedSeq
      .map(_.replaceAll("\\s+$", "")) // trailing pad trimmed per line
    val s = df.sparkSession
    import s.implicits._
    lines.toDF("line")
  }

  /** The INPUT side of Template (registerFormats.cpp:39): compile the
    * row template into an anchored regex — literal runs quoted, each
    * `${col:Escaping}` a lazy capture group — plus the placeholder
    * (name, escaping) list in group order. The adoption reader binds
    * groups to structure-declared columns BY NAME and reverses the
    * escaping per rule. */
  private[functions] def templateInputPlan(rowTpl: String)
      : (String, Seq[(String, String)]) = {
    val ph = """\$\{([A-Za-z0-9_]+)(?::([A-Za-z]+))?\}""".r
    val sb = new StringBuilder("^")
    val slots = Seq.newBuilder[(String, String)]
    var last = 0
    ph.findAllMatchIn(rowTpl).foreach { m =>
      if (m.start > last)
        sb ++= java.util.regex.Pattern.quote(rowTpl.substring(last, m.start))
      sb ++= "(.*?)"
      slots += ((m.group(1), Option(m.group(2)).getOrElse("Raw")))
      last = m.end
    }
    if (last < rowTpl.length)
      sb ++= java.util.regex.Pattern.quote(rowTpl.substring(last))
    sb ++= "$"
    val out = slots.result()
    require(out.nonEmpty, "FORMAT Template: no placeholders in the row template")
    require(out.map(_._1).distinct.size == out.size,
      "FORMAT Template: duplicate column placeholders in the row template")
    (sb.toString, out)
  }

  /** Reverse one escaping rule on a captured token (the input twin of
    * the output cells above). */
  private[functions] def templateUnescape(token: org.apache.spark.sql.Column,
      esc: String): org.apache.spark.sql.Column = esc.toUpperCase match {
    case "RAW" | "NONE" =>
      when(token === "\\N", lit(null)).otherwise(token)
    case "ESCAPED" =>
      // single-pass scanner kernel: a replace chain is order-sensitive
      // (\\n must unescape to backslash+'n', not backslash+newline)
      when(token === "\\N", lit(null)).otherwise(
        call_function("graftUnescapeEscaped", token))
    case "QUOTED" =>
      // 'text' with \\ and \' escapes; bare NULL literal
      when(token === "NULL", lit(null)).otherwise(
        call_function("replace",
          call_function("replace",
            regexp_replace(token, "^'(.*)'$", "$1"),
            lit("\\'"), lit("'")), lit("\\\\"), lit("\\")))
    case "JSON" =>
      // wrap the JSON scalar into an object and let the JSON reader
      // undo the escapes; JSON null → SQL NULL
      when(token === "null", lit(null)).otherwise(
        from_json(concat(lit("{\"v\":"), token, lit("}")),
          StructType(Seq(StructField("v", StringType))))
          .getField("v"))
    case "CSV" =>
      // quoted CSV field ("" → "), or the raw token; \N null
      when(token === "\\N", lit(null)).otherwise(
        when(token.startsWith("\"") && token.endsWith("\""),
          call_function("replace",
            regexp_replace(token, "^\"(.*)\"$", "$1"),
            lit("\"\""), lit("\"")))
          .otherwise(token))
    case other => throw new IllegalArgumentException(
      s"FORMAT Template: unsupported input escaping '$other' " +
        "(Raw/None, Escaped, Quoted, JSON, CSV)")
  }

  // ---------- FORMAT XML (registerFormats.cpp:62) ----------

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** A column name usable as an XML tag; the reference's writer falls
    * back to a generic <field> tag for names XML can't carry. */
  private def xmlTag(name: String): String =
    if (name.matches("^[A-Za-z_][A-Za-z0-9_.-]*$")) name else "field"

  /** FORMAT XML (XMLRowOutputFormat): the JSON envelope's XML twin —
    * meta (name/type per column), data (one element per row, one
    * child per field), rows count; driver-side under the same row cap
    * as Pretty/JSON with the same loud truncation marker. NULL cells
    * render as the reference's text serialization \N. */
  private def xmlEnvelope(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val meta = fields.flatMap(f => Seq(
      "\t\t\t<column>",
      s"\t\t\t\t<name>${xmlEscape(f.name)}</name>",
      s"\t\t\t\t<type>${xmlEscape(
        ChDdl.chTypeName(f.dataType, f.nullable))}</type>",
      "\t\t\t</column>"))
    val fetched = df.limit(prettyMaxRows + 1)
      .select(array(fields.toIndexedSeq.map(f =>
        coalesce(col(f.name).cast("string"), lit("\\N"))): _*).as("cells"))
      .collect().map(_.getSeq[String](0))
    val truncated = fetched.length > prettyMaxRows
    val rendered = if (truncated) fetched.take(prettyMaxRows) else fetched
    val data = rendered.flatMap { cells =>
      ("\t\t<row>" +: fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        val t = xmlTag(f.name)
        s"\t\t\t<$t>${xmlEscape(cells(i))}</$t>"
      }) :+ "\t\t</row>"
    }
    val tail =
      if (truncated)
        Seq(s"\t<rows>${rendered.length}</rows>",
          s"\t<rows_before_limit_at_least>${fetched.length}" +
            "</rows_before_limit_at_least>", "</result>")
      else Seq(s"\t<rows>${rendered.length}</rows>", "</result>")
    val lines: Seq[String] =
      Seq("<?xml version='1.0' encoding='UTF-8' ?>", "<result>",
        "\t<meta>", "\t\t<columns>") ++ meta ++
        Seq("\t\t</columns>", "\t</meta>", "\t<data>") ++ data ++
        Seq("\t</data>") ++ tail
    val s = df.sparkSession
    import s.implicits._
    lines.toDF("line")
  }

  // ---------- FORMAT Template (registerFormats.cpp:39-40) ----------

  /** FORMAT Template (TemplateBlockOutputFormat): the row shape comes
    * from a template FILE named by SETTINGS format_template_row —
    * literal text with `${column:Escaping}` placeholders (Escaping ∈
    * Raw/None, CSV, JSON, Quoted, Escaped, XML) — and an optional
    * resultset file (format_template_resultset) whose `${data}`
    * placeholder splits into header/footer lines around the rows.
    * Rows are output LINES here, so only the default '\n'
    * rows-between delimiter is supported — a declared scope cut, not
    * a silent one. Row rendering is a per-row codegen'd projection;
    * no collect. */
  private def template(df: DataFrame,
      settings: Seq[(String, String)]): DataFrame = {
    def get(k: String): Option[String] =
      settings.find(_._1.equalsIgnoreCase(k)).map(_._2)
        .orElse(df.sparkSession.conf.getOption(s"spark.graft.$k"))
    val rowPath = get("format_template_row").getOrElse(
      throw new IllegalArgumentException(
        "FORMAT Template needs SETTINGS format_template_row = 'file' " +
          "(the reference's setting; the file holds literal text with " +
          "${column:Escaping} placeholders)"))
    val delim = get("format_template_rows_between_delimiter").getOrElse("\n")
    require(delim == "\n",
      "FORMAT Template: rows are output lines here, so only the " +
        "default '\\n' rows-between delimiter is supported")
    var rowTpl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(rowPath)), "UTF-8")
    if (rowTpl.endsWith("\n")) rowTpl = rowTpl.dropRight(1)
    require(!rowTpl.contains("\n"),
      "FORMAT Template: the row template must be a single line")
    val byName = df.schema.fields.map(f => f.name -> f).toMap
    def cellOf(name: String, esc: String): org.apache.spark.sql.Column = {
      val f = byName.getOrElse(name, throw new IllegalArgumentException(
        s"FORMAT Template: no column '$name' in the result " +
          s"(has ${df.columns.mkString(", ")})"))
      esc.toUpperCase match {
        case "RAW" | "NONE" =>
          coalesce(col(f.name).cast("string"), lit("\\N"))
        case "CSV" =>
          to_csv(struct(col(f.name).as("v")), Map("nullValue" -> "\\N").asJava)
        case "JSON" => jsonCell(f)
        case "QUOTED" => quotedCell(f)
        case "ESCAPED" =>
          // the full Escaped rule the reference's writeEscapedString
          // applies (backslash FIRST, then \b \f \n \r \t \0 \')
          val pairs = Seq("\\" -> "\\\\", "\b" -> "\\b", "\f" -> "\\f",
            "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t",
            "\u0000" -> "\\0", "'" -> "\\'")
          val e = pairs.foldLeft(col(f.name).cast("string")) {
            case (c, (from, to)) =>
              call_function("replace", c, lit(from), lit(to))
          }
          coalesce(e, lit("\\N"))
        case other => throw new IllegalArgumentException(
          s"FORMAT Template: unsupported escaping '$other' " +
            "(Raw/None, CSV, JSON, Quoted, Escaped)")
      }
    }
    // split the template into literal runs and placeholders
    val ph = """\$\{([A-Za-z0-9_]+)(?::([A-Za-z]+))?\}""".r
    val parts = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Column]
    var last = 0
    ph.findAllMatchIn(rowTpl).foreach { m =>
      if (m.start > last) parts += lit(rowTpl.substring(last, m.start))
      parts += cellOf(m.group(1), Option(m.group(2)).getOrElse("Raw"))
      last = m.end
    }
    if (last < rowTpl.length) parts += lit(rowTpl.substring(last))
    require(parts.nonEmpty, "FORMAT Template: empty row template")
    val rows = df.select(concat(parts.toSeq: _*).as("line"))
    get("format_template_resultset") match {
      case None => rows
      case Some(rsPath) =>
        val rs = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(rsPath)), "UTF-8")
        val idx = rs.indexOf("${data}")
        require(idx >= 0,
          "FORMAT Template: the resultset template must contain ${data}")
        val stray = ph.findAllMatchIn(rs.replace("${data}", ""))
        require(stray.isEmpty,
          "FORMAT Template: only ${data} is supported in the resultset " +
            "template (rows/bytes counters are client-display state)")
        def linesOf(s0: String): Seq[String] = {
          val t = s0.stripPrefix("\n").stripSuffix("\n")
          if (t.isEmpty) Nil else t.split("\n", -1).toSeq
        }
        val spark = df.sparkSession
        import spark.implicits._
        val head = linesOf(rs.substring(0, idx))
        val foot = linesOf(rs.substring(idx + "${data}".length))
        val out0 =
          if (head.isEmpty) rows else head.toDF("line").unionAll(rows)
        if (foot.isEmpty) out0 else out0.unionAll(foot.toDF("line"))
    }
  }
}
