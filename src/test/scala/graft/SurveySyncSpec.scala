package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the judged coverage checklist; SparkEntry.queries
  * is what actually runs. A key present in one but not the other is
  * either phantom coverage (documented, never verified) or dark
  * coverage (verified, never credited) — both silent. This spec keeps
  * the two mechanically identical. */
class SurveySyncSpec extends AnyFunSuite {

  test("SURVEY §2 keyed rows and SparkEntry.queries are identical sets") {
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val keyRow = """^\|\s*([a-z]\d{2}_[a-z0-9_]+)\s*\|.*""".r
    val surveyKeys =
      try survey.getLines().collect { case keyRow(k) => k }.toSet
      finally survey.close()
    val registered = SparkEntry.queries.keySet
    val phantom = surveyKeys -- registered
    val dark = registered -- surveyKeys
    assert(phantom.isEmpty,
      s"SURVEY §2 lists keys with no registered query: ${phantom.toSeq.sorted.mkString(", ")}")
    assert(dark.isEmpty,
      s"registered keys missing from SURVEY §2: ${dark.toSeq.sorted.mkString(", ")}")
    assert(surveyKeys.size >= 200, s"suspiciously few keys parsed: ${surveyKeys.size}")
  }

  test("no key-like SURVEY first cell escapes the key regex (phantom rows)") {
    // r10 advice: a stale `f09_bitwise+simhash` row was invisible to the
    // sync check because '+' broke the strict key regex. Any first cell
    // that LOOKS like a key must parse cleanly AND be registered.
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val loose = """^\|\s*([a-z]\d{2}_\S+)\s*\|.*""".r
    val looseKeys =
      try survey.getLines().collect { case loose(k) => k }.toSet
      finally survey.close()
    val registered = SparkEntry.queries.keySet
    val malformed = looseKeys.filterNot(registered)
    assert(malformed.isEmpty,
      s"SURVEY rows with key-like but unregistered first cells: ${malformed.toSeq.sorted.mkString(", ")}")
  }

  test("every oracle key is registered (no orphan oracle SQL)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL with no query: ${orphans.mkString(", ")}")
  }
}
