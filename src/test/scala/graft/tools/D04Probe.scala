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
      val stats = df.agg(
        count(lit(1)).as("n_grams"),
        sum(least(col("count"), lit(1000)) * least(col("count"), lit(1000)))
          .as("join_bound"),
        sum(when(col("count") > 100, 1).otherwise(0)).as("df_gt_100"),
        sum(when(col("count") > 1000, 1).otherwise(0)).as("df_gt_1000"),
        max("count").as("df_max")).head()
      println(s"d04probe,$dir,grams=${stats.getLong(0)}," +
        s"join_bound=${stats.getLong(1)},df_gt_100=${stats.getLong(2)}," +
        s"df_gt_1000=${stats.getLong(3)},df_max=${stats.getLong(4)}")
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.ngramJaccard(
        docs, "doc_id", "text", "lang", n = 3, minJaccard = 0.5,
        maxGramDf = 1000)
      val np = pairs.count()
      println(f"d04probe,$dir,pairs=$np,op_s=${(System.nanoTime()-t0)/1e9}%.2f")
      pairs.unpersist(blocking = false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
