package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: t17 BPE merge-loop lineage probe (verdict r14, ask #4).
  *
  * Bpe.train runs one applyMerge (an aggregate HOF over the symbol
  * array) per merge round. Under plain persist() the LOGICAL plan
  * nests one fold per round, so the analyzer re-walks an ever-deeper
  * tree each round: per-round cost grows linearly with rank and a
  * production 32k-merge vocabulary strangles the driver. With the
  * lazy-localCheckpoint discipline (d12's) every round's plan is ONE
  * fold over a checkpoint leaf — per-round cost must be FLAT in the
  * merge count.
  *
  * The probe trains over a synthetic distinct-word table (the merge
  * loop's own input frame; hash-generated words over a 20-letter
  * alphabet so ~1k merges never exhaust the pair supply) at a sweep
  * of merge budgets and reports sec and ms/merge; flat ms/merge
  * across an 8x budget sweep = pass.
  *
  * Run: sbt "Test/runMain graft.tools.BpeScaleProbe [words] [maxMerges]"
  * (defaults 20000 words, budgets 32 64 128 256).
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(20000)
    val maxMerges = if (args.length > 1) args(1).toInt else 256
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~10-char words over letters a..t: deterministic, pair-rich
    val corpus = spark.range(nWords.toLong).select(
      concat((0 until 10).map(i =>
        chr(lit(97) + pmod(xxhash64(col("id"), lit(i)), lit(20)))): _*)
        .as("w"))
      .select(concat_ws(" ", col("w"), col("w"), col("w")).as("text"))
      .persist()
    corpus.count()

    var budget = 32
    println(f"${"merges"}%8s ${"sec"}%10s ${"ms/merge"}%10s")
    while (budget <= maxMerges) {
      val t0 = System.nanoTime()
      val got = graft.operators.Bpe.train(corpus.toDF(), "text", budget)
      val n = got.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$budget%8d $sec%10.2f ${sec * 1000 / budget}%10.2f  (rows=$n)")
      budget *= 2
    }
    spark.stop()
  }
}
