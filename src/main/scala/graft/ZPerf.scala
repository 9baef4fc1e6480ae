package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch micro-bench, not shipped
object ZPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.1")
    val docs = t.documents
    println("DOCS " + docs.count())
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"ZPERF $tag ${(System.nanoTime() - t0) / 1e9}")
    }
    import graft.operators.{Curate, Dedup, Text}
    // warmup
    Curate.funnel(docs, "doc_id", "text").write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { _ =>
      time("full_funnel") {
        Curate.funnel(docs, "doc_id", "text").write.format("noop").mode("overwrite").save()
      }
      time("scored_exact_only") {
        val scores = Text.langScores(col("text"))
        docs.select(col("doc_id"), col("text"),
            Text.predictedLang(scores).as("predicted"),
            Text.qualityScore(col("text")).as("quality"),
            Text.wsTokenCount(col("text")).as("n_tokens"),
            Text.fingerprint(col("text")).as("__fp"))
          .filter(col("predicted") === "en" && col("quality") >= 0.45)
          .write.format("noop").mode("overwrite").save()
      }
      time("d04_alone") {
        Dedup.ngramJaccard(docs, "doc_id", "text", "lang", 3, 0.5, 1000)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
