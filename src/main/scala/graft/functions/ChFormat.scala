package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  *  - TSV / TabSeparated: tab-separated raw values, NULL as `\N`.
  *
  * Every other registered format (Pretty*, Native, Vertical, …) is
  * console/wire decoration with no engine meaning — the clause is
  * dropped and the plain rows returned, as before.
  *
  * The rendering is a per-row projection (to_json / to_csv /
  * concat_ws are codegen'd) — no collect, no extra shuffle.
  */
object ChFormat {

  val renderable: Set[String] = Set("JSONEACHROW", "CSV", "TSV", "TABSEPARATED")

  def render(df: DataFrame, fmt: String): DataFrame = fmt.toUpperCase match {
    case "JSONEACHROW" =>
      df.select(to_json(struct(df.columns.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("line"))
    case "CSV" =>
      df.select(to_csv(struct(df.columns.map(col): _*),
        Map("nullValue" -> "\\N").asJava).as("line"))
    case "TSV" | "TABSEPARATED" =>
      df.select(concat_ws("\t", df.columns.map(c =>
        coalesce(col(c).cast("string"), lit("\\N"))): _*).as("line"))
    case other =>
      throw new IllegalArgumentException(s"non-renderable FORMAT $other")
  }
}
