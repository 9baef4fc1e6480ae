package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r18): generate the documents-only CAP-ENGAGEMENT corpus
  * for the d04 probe — the corpus the r17 adjudication predicted but
  * could not measure (Sf1Gen tops out at k=120 distinct vowel
  * permutations; /tmp/sf10's df_max=336 never crosses the 1000 cap).
  *
  * k replicas of sf0.1's 5k documents with the vowel permutations
  * CYCLING after 120 — deliberately a boilerplate-heavy STRESS corpus
  * (replicas sharing a permutation collide on vowel-full grams too),
  * which is exactly the scenario the df cap exists for. At k=1000,
  * the preserved grams' df crosses maxGramDf=1000 and the candidate
  * mass must go FLAT per gram (the clipped regime).
  *
  * Run: java -cp classes:test-classes:spark-jars
  *   graft.tools.D04DenseGen /tmp/sf100docs 1000
  */
object D04DenseGen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/sf100docs")
    val k = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val perms: IndexedSeq[String] = {
      val all = "aeiou".toSeq.permutations.map(_.mkString).toIndexedSeq
      "aeiou" +: all.filterNot(_ == "aeiou")
    }
    val C = 1000000L
    // one 120-way union (one branch per distinct permutation) crossed
    // with the replica multiplicity — a k-way union's plan would not
    // scale to k=1000
    val permDf = perms.indices.map { g =>
      val p = perms(g)
      base.withColumn("__g", lit(g))
        .withColumn("text",
          if (p == "aeiou") col("text") else translate(col("text"), "aeiou", p))
    }.reduce(_ unionByName _)
    val out = permDf
      .crossJoin(spark.range(0, (k + perms.length - 1) / perms.length).toDF("__m"))
      .withColumn("__r", col("__g") + col("__m") * perms.length)
      .filter(col("__r") < k)
      .withColumn("doc_id", col("doc_id") + col("__r") * C)
      .drop("__g", "__m", "__r")
    out.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"[d04densegen] ${spark.read.parquet(s"$outDir/documents.parquet").count()} docs, k=$k")
    spark.stop()
  }
}
