package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Curate

/** Dev probe: the corpus-mechanics prefix sum measured at scale (the
  * last "scale-safe by argument" family — t08 packSequences,
  * t11 globalShuffle, t20 shardBySize all ride the md5-prefix-bucket
  * distributed prefix sum). Two questions:
  *  1. LINEARITY: do the three ops double their wall clock when the
  *     corpus doubles (1M/2M/4M docs)?
  *  2. THE COUNTERFACTUAL: what does the naive single-global-window
  *     spelling cost at the same sizes? (It funnels the whole corpus
  *     through ONE task — the exact bottleneck the bucket design
  *     removes.)
  * Results in dev/corpus_probe_r11.txt.
  *
  * Run: sbt "Test/runMain graft.tools.CorpusScaleProbe [baseDocs]"
  */
object CorpusScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseDocs = if (args.nonEmpty) args(0).toInt else 1000000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** ~20-word docs — packSequences only reads the ws token count,
      * so short texts keep synthesis from masking the prefix sum. */
    def corpus(n: Int): DataFrame =
      spark.range(n.toLong).toDF("doc_id")
        .withColumn("text",
          array_join(transform(sequence(lit(0), lit(19)),
            i => concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(5000)))), " "))

    def timed(label: String)(f: => Long): Unit = {
      f // warm-up dropped
      spark.catalog.clearCache()
      val shots = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = shots.map(_._1).sorted.apply(1)
      val mn = shots.map(_._1).min
      println(f"$label median $med%7.2f s  min $mn%7.2f s  " +
        shots.map(s => f"${s._1}%.2f").mkString("(", "/", ")"))
    }

    def consume(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    /** The naive spelling the operators refuse: one global window. */
    def globalShuffleNaive(docs: DataFrame, nShards: Int): DataFrame = {
      val h = docs.select(col("doc_id"), md5(col("doc_id").cast("string")).as("__h"))
      h.withColumn("__rank",
          row_number().over(Window.orderBy(col("__h"), col("doc_id"))).cast("long") - 1)
        .select(col("doc_id"),
          pmod(col("__rank"), lit(nShards)).cast("int").as("shard"),
          expr(s"__rank div $nShards").as("pos"))
    }

    for (mult <- Seq(1, 2, 4)) {
      val n = baseDocs * mult
      val docs = corpus(n)
      timed(f"t08 packSequences  n=$n%8d") { consume(
        Curate.packSequences(docs, "doc_id", "text", seqLen = 2048)) }
      timed(f"t11 globalShuffle  n=$n%8d") { consume(
        Curate.globalShuffle(docs, "doc_id", nShards = 1024)) }
      timed(f"t20 shardBySize    n=$n%8d") { consume(
        Curate.shardBySize(docs, "doc_id", length(col("text")), shardSize = 1 << 20)) }
      timed(f"naive 1-window     n=$n%8d") { consume(
        globalShuffleNaive(docs, nShards = 1024)) }
    }
    spark.stop()
  }
}
