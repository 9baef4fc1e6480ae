package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r18): generate the documents-only CAP-ENGAGEMENT corpus
  * family for the d04 probe — the regime the r17 adjudication
  * predicted but could not measure with Sf1Gen replicas (measuring
  * THIS tool's first cuts established that /tmp/sf10's high-df grams
  * come from the finite vowel-permutation alphabet — words with m
  * distinct lowercase vowels share P(5,m) images across replicas —
  * not from fully-preserved grams: sf0.1 has NO all-vowel-free
  * 3-gram, so a replica-unique word-suffix regime has df_max=14 at
  * any k and never engages any cap).
  *
  * So the corpus plants the boilerplate EXPLICITLY — the real-world
  * scenario maxGramDf exists for (site templates, license headers):
  * k replicas of sf0.1's 5k documents where every word of the body
  * gets a replica-unique suffix (all body grams stay replica-local,
  * df = base within-replica df — the LINEAR population) and each doc
  * carries a 7-word boilerplate tail shared by its doc FAMILY
  * (doc_id % families) across all replicas — df = k * 5000/families,
  * the population that crosses the cap. With families=500 the
  * boilerplate df is 10k: under the default cap at k=10, AT it at
  * k=100, 10x past it at k=1000 — so uncapped mass grows ~100x
  * k=100→k=1000 while capped mass goes FLAT for that population.
  *
  * Run: java -cp classes:test-classes:spark-jars
  *   graft.tools.D04DenseGen /tmp/d04k1000 1000 [families=500]
  */
object D04DenseGen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/d04k1000")
    val k = if (args.length > 1) args(1).toInt else 1000
    val families = if (args.length > 2) args(2).toInt else 500
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val C = 1000000L
    // 7 vowel-free boilerplate words -> 5 family-shared 3-grams per doc
    val fam = (col("doc_id") % C) % families
    val boilerplate = concat(
      (0 until 7).map(w =>
        concat(lit(" q"), ((fam * 7) + w).cast("string"))): _*)
    val out = base
      .crossJoin(spark.range(0, k).toDF("__r"))
      .withColumn("doc_id", col("doc_id") + col("__r") * C)
      .withColumn("text", concat(
        // body words get a replica-unique suffix: every body gram is
        // replica-local (the linear population)
        regexp_replace(col("text"),
          lit("([A-Za-z0-9]+)"),
          concat(lit("$1x"), col("__r"))),
        boilerplate))
      .drop("__r")
    out.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"[d04densegen] ${spark.read.parquet(s"$outDir/documents.parquet").count()} docs, " +
      s"k=$k families=$families (boilerplate df = ${k.toLong * 5000 / families})")
    spark.stop()
  }
}
