package graft

import graft.functions.GraftFunctions
import graft.operators.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the native word_ngrams kernel bit-for-bit to the composed
  * zip-shift-concat_ws realization it replaced, on real documents and
  * on edge cases (short docs, empty tokens, repeated spans). */
class WordNGramsSpec extends SparkSpec {

  private def composed(text: Column, n: Int): Column = {
    val ws = split(text, " ", -1)
    val shifted = (0 until n).map { o =>
      val c = if (o == 0) ws else slice(ws, lit(o + 1), greatest(size(ws) - o, lit(0)))
      c.as(s"_$o")
    }
    val grams = transform(arrays_zip(shifted: _*), s =>
      concat_ws(" ", (0 until n).map(i => s.getField(s"_$i")): _*))
    slice(grams, lit(1), greatest(size(ws) - (n - 1), lit(0)))
  }

  test("kernel equals composed form on every document for n=2,3,5") {
    GraftFunctions.ensureRegistered(spark)
    val docs = graft.sources.Tables(spark, sfDir).documents
    for (n <- Seq(2, 3, 5)) {
      val bad = docs.select(
          Dedup.wordNGramsAll(col("text"), n).as("k"),
          composed(col("text"), n).as("c"))
        .filter(not(col("k") <=> col("c")))
      assert(bad.isEmpty, s"n=$n: ${bad.take(2).mkString("\n")}")
    }
  }

  test("edge cases: shorter than n, empty tokens, repeats") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rows = Seq("", "a", "a b", "a  b", " a b ", "x x x x", "a b c")
      .toDF("text")
    val got = rows.select(
      Dedup.wordNGramsAll(col("text"), 3).as("k"),
      composed(col("text"), 3).as("c")).collect()
    for (r <- got)
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    // spot-pin absolute values, not just parity
    val abc = rows.filter(col("text") === "a b c")
      .select(Dedup.wordNGramsAll(col("text"), 2)).head().getSeq[String](0)
    assert(abc == Seq("a b", "b c"))
  }

  test("kernel stays inside whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.sources.Tables(spark, sfDir).documents
        .select(Dedup.wordNGramsAll(col("text"), 3).as("g"))
        .queryExecution.executedPlan.toString
      val line = plan.linesIterator.find(_.contains("word_ngrams"))
      assert(line.isDefined, plan)
      assert(line.get.matches(""".*\*\(\d+\).*"""),
        s"word_ngrams project not codegen'd: ${line.get}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
