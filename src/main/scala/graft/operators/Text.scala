package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline (SURVEY §2
  * t01–t04). Everything is pure column arithmetic over codegen'd
  * built-ins — no UDFs — so each of these runs at scan speed and is
  * DuckDB-oracle-able for exact cross-engine verification.
  */
object Text {

  /** Minimal public stopword lists per language (frequency heuristics,
    * not linguistics — the point is deterministic n-gram scoring). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "los", "y", "es", "en", "un", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "un", "que"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "ren", "you", "ta"))

  def words(text: Column): Column =
    filter(split(text, " ", -1), w => w =!= "")

  /** Occurrences of any of `dict` among the tokens. */
  def hitCount(ws: Column, dict: Seq[String]): Column =
    size(filter(ws, w => w.isin(dict.map(lit): _*)))

  /** t01: language ID — per-language stopword hit counts and an
    * argmax prediction. Tie-break: the >= chain runs languages in
    * REVERSE alphabetical order, so ties go to the alphabetically
    * LAST language; the oracle mirrors the same CASE chain. */
  def langScores(text: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, dict) => lang -> hitCount(words(text), dict) }

  def predictedLang(scoreCols: Seq[(String, Column)]): Column = {
    val desc = scoreCols.sortBy(_._1).reverse // zh, fr, es, en, de
    desc.foldRight(lit(desc.last._1)) { case ((lang, s), acc) =>
      val others = desc.filter(_._1 != lang).map(_._2)
      when(others.foldLeft(lit(true))((c, o) => c && s >= o), lang).otherwise(acc)
    }
  }

  /** t02: quality scoring — length, punctuation and stopword ratios
    * combined into one bounded score. Single-division doubles only, so
    * both engines produce identical bits. */
  def qualityScore(text: Column): Column = {
    val ws = words(text)
    val nWords = size(ws).cast("double")
    val stopRatio = hitCount(ws, stopwords.toMap.apply("en")).cast("double") / nWords
    val punct = length(regexp_replace(text, "[^.,!?;:]", "")).cast("double")
    val punctRatio = punct / length(text).cast("double")
    round(least(nWords / 100.0, lit(1.0)) * 0.3 + stopRatio * 0.4 +
      (lit(1.0) - punctRatio) * 0.3, 6)
  }

  /** t03: token counting — whitespace tokens and a BPE-ish regex
    * tokenization (letter runs / digit runs / single symbols). */
  val bpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def wsTokenCount(text: Column): Column = size(words(text))
  def bpeishTokenCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** t04: document fingerprint — md5 over normalized text (lowercase,
    * whitespace collapsed, trimmed): byte-identical rendering of the
    * same content fingerprints identically across engines. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))
  def fingerprint(text: Column): Column = md5(normalized(text))
}
