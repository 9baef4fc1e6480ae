package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: adjudicate d04_ngram_jaccard's sf1→sf10 scaling (r17
  * scale probe). The join-output bound is Σ_gram min(df, cap)² per
  * block; this measures that sum, the df distribution tail, and the
  * emitted pair count at each SF — separating "the plan went
  * super-linear" from "the probe corpus's candidate mass grew
  * super-linearly" (replica texts are vowel-permuted, so vowel-FREE
  * grams collide across all replicas and their df grows with the
  * replica count).
  */
object D04Probe {
  def main(args: Array[String]): Unit = {
    // optional second arg: comma-separated maxGramDf caps to sweep
    // (r18: measure the CAP-ENGAGED regime — once the corpus's
    // replicated-gram df crosses the cap, candidate mass must return
    // to ~linear in corpus size). Optional third arg "boundonly"
    // skips the op runs (for corpora whose uncapped op walls aren't
    // affordable) — the bound agg is one cheap shuffle either way.
    val caps: Seq[Int] =
      if (args.length > 1) args(1).split(',').toSeq.map(_.toInt)
      else Seq(1000)
    val opCaps: Seq[Int] =
      if (args.length > 2 && args(2) == "boundonly") Nil else caps
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    for (dir <- args(0).split(',')) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val grams = docs.select(col("doc_id"), col("lang").as("__blk"),
          explode(graft.operators.Dedup.wordNGrams(col("text"), 3)).as("__g"))
      val df = grams.groupBy("__blk", "__g").count()
      // r19: the auto-derived knee cap rides along in every sweep so
      // the probe's table directly shows where 'auto' lands vs the
      // hand-chosen caps and what mass bound it buys
      val autoCap = graft.operators.Dedup.autoGramDf(
        grams.withColumn("__sz", lit(0)))
      println(s"d04probe,$dir,autoGramDf=$autoCap")
      // bounds are cheap (one agg) — always include the default cap so
      // a run that can't AFFORD the uncapped op (sf100docs) still
      // reports the uncapped regime's designed mass
      val boundCaps = (caps :+ 1000 :+ autoCap).distinct
      val boundCols = boundCaps.map(c =>
        sum(least(col("count"), lit(c)) * least(col("count"), lit(c)))
          .as(s"bound_$c"))
      val stats = df.agg(
        count(lit(1)).as("n_grams"),
        (boundCols :+
          sum(when(col("count") > 100, 1).otherwise(0)).as("df_gt_100")) ++ Seq(
          sum(when(col("count") > 1000, 1).otherwise(0)).as("df_gt_1000"),
          max("count").as("df_max")): _*).head()
      val bounds = boundCaps.indices
        .map(i => s"bound_${boundCaps(i)}=${stats.getLong(1 + i)}").mkString(",")
      val base = 1 + boundCaps.length
      println(s"d04probe,$dir,grams=${stats.getLong(0)},$bounds," +
        s"df_gt_100=${stats.getLong(base)}," +
        s"df_gt_1000=${stats.getLong(base + 1)},df_max=${stats.getLong(base + 2)}")
      Console.out.flush()
      for (cap <- opCaps) {
        val t0 = System.nanoTime()
        val pairs = graft.operators.Dedup.ngramJaccard(
          docs, "doc_id", "text", "lang", n = 3, minJaccard = 0.5,
          maxGramDf = cap)
        val np = pairs.count()
        println(f"d04probe,$dir,cap=$cap,pairs=$np,op_s=${(System.nanoTime()-t0)/1e9}%.2f")
        Console.out.flush()
        pairs.unpersist(blocking = false)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
