package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: adversarial-skew stress for the blocked dedup joins
  * (verdict r14, ask #5 — the rangebin-probe discipline applied to
  * d02/d04/d27). The caps under test:
  *
  *  - d02 minHashLsh: bucketPairs drops band buckets larger than
  *    maxBucket. Adversary: a large clique of IDENTICAL documents —
  *    every band collides, one bucket holds the whole clique.
  *  - d04 ngramJaccard / d27 ngramContainment: grams with in-block
  *    df > maxGramDf drop before the (block, gram) self-join.
  *    Adversary: one boilerplate footer shared by EVERY document —
  *    its grams' df equals the corpus size, and uncapped the
  *    self-join would emit |corpus|² rows per footer gram.
  *
  * The probe times each operator on a uniform corpus vs the same
  * corpus with the skew planted. PASS = the skewed run stays within
  * a small constant of uniform (the caps bound the join); a
  * super-constant blowup or an executor OOM = the cap is not really
  * bounding the plan.
  *
  * Run: sbt "Test/runMain graft.tools.DedupSkewProbe [docs] [clique]"
  * (defaults 200000 docs, 100000-doc identical clique / universal
  * footer).
  */
object DedupSkewProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val clique = if (args.length > 1) args(1).toInt else nDocs / 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // unique-ish text: 12 hash-drawn words over a 5000-word vocab
    def uniqueText = concat_ws(" ", (0 until 12).map(i =>
      concat(lit("w"),
        pmod(xxhash64(col("id"), lit(i)), lit(5000)).cast("string"))): _*)
    val footer = "terms of service apply all rights reserved contact us here"

    val uniform = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"), uniqueText.as("text"),
        lit(0).as("blk"))
      .persist()
    uniform.count()
    // skewed: first `clique` docs are IDENTICAL (d02 band clique),
    // and EVERY doc carries the boilerplate footer (d04/d27 hot grams)
    val skewed = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        concat(
          when(col("id") < clique, lit("all identical duplicate body"))
            .otherwise(uniqueText),
          lit(" " + footer)).as("text"),
        lit(0).as("blk"))
      .persist()
    skewed.count()

    def timed(name: String)(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = df
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      out.unpersist(blocking = false)
      println(f"  $name%-28s $sec%8.2f s  rows=$n")
      (sec, n)
    }

    println(s"docs=$nDocs clique=$clique")
    println("d02 minHashLsh (maxBucket=100):")
    val (u02, _) = timed("uniform") {
      graft.operators.Dedup.minHashLsh(uniform, "doc_id", "text") }
    val (s02, n02) = timed("skewed") {
      graft.operators.Dedup.minHashLsh(skewed, "doc_id", "text") }
    println(f"  ratio ${s02 / u02}%.2f  (clique pairs suppressed: " +
      s"bucket of $clique > cap -> expect ~0 clique pairs in $n02 rows)")

    println("d04 ngramJaccard (maxGramDf=10000):")
    val (u04, _) = timed("uniform") {
      graft.operators.Dedup.ngramJaccard(uniform, "doc_id", "text", "blk") }
    val (s04, _) = timed("skewed") {
      graft.operators.Dedup.ngramJaccard(skewed, "doc_id", "text", "blk") }
    println(f"  ratio ${s04 / u04}%.2f")

    println("d27 ngramContainment (maxGramDf=10000):")
    val (u27, _) = timed("uniform") {
      graft.operators.Dedup.ngramContainment(uniform, "doc_id", "text", "blk") }
    val (s27, _) = timed("skewed") {
      graft.operators.Dedup.ngramContainment(skewed, "doc_id", "text", "blk") }
    println(f"  ratio ${s27 / u27}%.2f")

    spark.stop()
  }
}
