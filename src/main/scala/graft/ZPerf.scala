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
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.1").documents
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"ZPERF $tag ${(System.nanoTime() - t0) / 1e9}")
    }
    import graft.operators.Dedup
    def run(items: Long): Unit = {
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.select((col("doc_id") + 1000000).as("doc_id"),
        col("source"), concat(lit("  "), upper(col("text")), lit("  ")).as("text"))
      Dedup.incremental(corpus, batch, "doc_id", "text", expectedItems = items)
        .select("doc_id", "source").orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    run(1L << 20); run(1L << 16) // warmup both
    (1 to 3).foreach { _ =>
      time("bloom_1M") { run(1L << 20) }
      time("bloom_64K") { run(1L << 16) }
    }
    spark.stop()
  }
}
