package graft

import graft.functions.GraftFunctions
import graft.operators.Text
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the native quality_model kernel bit-for-bit to the
  * aggregate-lambda fold it replaced (same md5-prefix buckets, same
  * Knuth-ramp weights, same IEEE sum order). */
class QualityModelSpec extends SparkSpec {

  private def composedScore(text: Column, buckets: Int): Column = {
    def weight(tok: Column): Column = {
      val b = conv(substring(md5(tok), 1, 3), 16, 10).cast("long") % buckets
      (b * 2654435761L % 1048576L).cast("double") / 1048576.0 - 0.5
    }
    val ws = filter(split(text, " ", -1), w => w =!= "")
    val sum = aggregate(ws, lit(0.0), (acc, t) => acc + weight(t))
    round(sum / greatest(size(ws), lit(1)).cast("double"), 6)
  }

  test("kernel score equals composed fold on every document") {
    GraftFunctions.ensureRegistered(spark)
    val docs = graft.sources.Tables(spark, sfDir).documents
    val (score, _) = Text.qualityModel(col("text"))
    val bad = docs.select(score.as("k"), composedScore(col("text"), 4096).as("c"))
      .filter(not(col("k") <=> col("c")))
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("edge cases incl. empty text and non-default buckets") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rows = Seq("", "   ", "one", "the quick brown fox", "héllo wörld")
      .toDF("text")
    for (buckets <- Seq(64, 4096)) {
      val (score, flag) = Text.qualityModel(col("text"), buckets)
      val got = rows.select(score.as("k"),
        composedScore(col("text"), buckets).as("c"), flag).collect()
      for (r <- got)
        assert(java.util.Objects.equals(r.get(0), r.get(1)),
          s"buckets=$buckets row=$r")
    }
  }
}
