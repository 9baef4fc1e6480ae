package graft

import graft.functions.GraftFunctions
import graft.operators.Text
import org.apache.spark.sql.functions._

/** Pins the native one-pass text_signals kernel to the composed
  * lambda realization it replaced, bit-for-bit, on the real documents
  * table — token counts, per-language hits, punct/char counts, and
  * the derived quality score. */
class TextSignalsSpec extends SparkSpec {

  private lazy val docs = {
    GraftFunctions.ensureRegistered(spark)
    graft.sources.Tables(spark, sfDir).documents
  }

  private def composedWords(text: org.apache.spark.sql.Column) =
    filter(split(text, " ", -1), w => w =!= "")

  test("n_words/n_chars/punct match the composed forms on every document") {
    val sig = Text.signals(col("text"))
    val bad = docs.select(
        sig.getField("n_words").as("kw"),
        size(composedWords(col("text"))).as("cw"),
        sig.getField("n_chars").as("kc"), length(col("text")).as("cc"),
        sig.getField("punct").as("kp"),
        length(regexp_replace(col("text"), "[^.,!?;:]", "")).as("cp"))
      .filter(col("kw") =!= col("cw") || col("kc") =!= col("cc") ||
        col("kp") =!= col("cp"))
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("per-language hits match the composed filter-isin counts") {
    val hits = Text.signals(col("text")).getField("hits")
    val checks = Text.stopwords.zipWithIndex.map { case ((lang, dict), i) =>
      (element_at(hits, i + 1) =!=
        size(filter(composedWords(col("text")),
          w => w.isin(dict.map(lit): _*)))).as(s"bad_$lang")
    }
    val bad = docs.select(col("doc_id") +: checks: _*)
      .filter(checks.indices.map(i => col(s"bad_${Text.stopwords(i)._1}"))
        .reduce(_ || _))
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("charEntropy: exact bits on known distributions; gate flags") {
    import spark.implicits._
    // "aaaa" -> 0 bits; "ab" -> 1 bit; "abcd" -> 2 bits (kept);
    // "aabb" -> 1 bit; empty docs dropped entirely
    val docs = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abcd"), (4L, ""),
      (5L, "aabbccddeeffgghh")).toDF("doc_id", "text")
    val got = Text.charEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_chars", "entropy", "keep")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 0.0, false),
      (2L, 2L, 1.0, false),
      (3L, 4L, 2.0, true),
      (5L, 16L, 3.0, true)), s"got $got")
  }

  test("charEntropy kernel ≡ composed collect-sort-fold, bit for bit (real corpus)") {
    // the r13 kernel must reproduce the composed form's EXACT double
    // (same char order, same term shape, same fold order) — compared
    // UNROUNDED via the raw function against the composed pre-round
    // value being round-6 stable, plus a multi-byte fixture
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
      .limit(200)
    val kernel = Text.charEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_chars", "entropy", "keep")
    val composed = Text.charEntropyComposed(docs, "doc_id", "text")
      .select("doc_id", "n_chars", "entropy", "keep")
    assert(kernel.exceptAll(composed).isEmpty && composed.exceptAll(kernel).isEmpty,
      "kernel and composed charEntropy disagree on corpus text")
    val multi = Seq((1L, "héé"), (2L, "日本語日本")).toDF("doc_id", "text")
    val k2 = Text.charEntropy(multi, "doc_id", "text")
      .select("doc_id", "n_chars", "entropy")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val c2 = Text.charEntropyComposed(multi, "doc_id", "text")
      .select("doc_id", "n_chars", "entropy")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(k2 == c2, s"multi-byte mismatch: $k2 vs $c2")
    assert(k2.head._2 == 3L) // n_chars counts code points, not bytes
  }

  test("edge cases: empty, all-space, punct-only, multi-byte chars") {
    import spark.implicits._
    val rows = Seq("", "   ", ".,!?;:", "héllo wörld the", "the  the   the",
      " le la ", "a.b,c the!").toDF("text")
    GraftFunctions.ensureRegistered(spark)
    val sig = Text.signals(col("text"))
    val got = rows.select(
      sig.getField("n_words").as("w"),
      size(composedWords(col("text"))).as("cw"),
      sig.getField("punct").as("p"),
      length(regexp_replace(col("text"), "[^.,!?;:]", "")).as("cp"),
      sig.getField("n_chars").as("c"), length(col("text")).as("cc")).collect()
    for (r <- got) {
      assert(r.getInt(0) == r.getInt(1), s"words: $r")
      assert(r.getInt(2) == r.getInt(3), s"punct: $r")
      assert(r.getInt(4) == r.getInt(5), s"chars: $r")
    }
  }

  test("kernel stays inside whole-stage codegen and dedupes via CSE") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = docs.select(
          Text.wsTokenCount(col("text")).as("n"),
          Text.qualityScore(col("text")).as("q"),
          Text.predictedLang(Text.langScores(col("text"))).as("l"))
        .queryExecution.executedPlan.toString
      val line = plan.linesIterator.find(_.contains("text_signals"))
      assert(line.isDefined, plan)
      assert(line.get.matches(""".*\*\(\d+\).*"""),
        s"text_signals project not codegen'd: ${line.get}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
