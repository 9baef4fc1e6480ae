package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a 10x (sf1-equivalent) dataset from
  * /root/testdata/sf0.1 for the r15 full-suite scale probe (verdict
  * ask #2) — testdata is read-only and ships no sf1, so the probe
  * replicates sf0.1 with per-replica key shifts chosen to keep every
  * workload's growth LINEAR in the replica count:
  *
  *  - region/nation stay single-copy (dimensions don't grow with a
  *    TPC-H scale factor either);
  *  - every fact-table key shifts by replica*OFFSET consistently
  *    across referencing tables, so joins match within a replica
  *    only — join output grows 10x, not 100x;
  *  - documents.text is translated through a per-replica vowel
  *    permutation (length/word-count preserving) so replicas are NOT
  *    near-duplicates of each other — otherwise the dedup family's
  *    candidate-pair count would jump ~45x from planted cliques
  *    instead of the 10x the probe wants to measure;
  *  - embeddings get per-element deterministic jitter for the same
  *    reason (no zero-distance replica pairs in the ANN family).
  *
  * Run: sbt "Test/runMain graft.tools.Sf1Gen /tmp/sf1 10"
  */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/sf1")
    val k = if (args.length > 1) args(1).toInt else 10
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[sf1gen] $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }

    // dims: single copy
    write(read("region"), "region")
    write(read("nation"), "nation")

    val C = 1000000L  // custkey / suppkey / partkey / user stride
    val O = 10000000L // orderkey stride
    def replicas(t: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until k).map(r => shift(base, r)).reduce(_ unionByName _), t)
    }

    replicas("customer") { (df, r) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(r * C)) }
    replicas("supplier") { (df, r) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(r * C)) }
    replicas("part") { (df, r) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(r * C)) }
    replicas("orders") { (df, r) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(r * O))
        .withColumn("o_custkey", col("o_custkey") + lit(r * C)) }
    replicas("lineitem") { (df, r) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * O))
        .withColumn("l_partkey", col("l_partkey") + lit(r * C))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * C)) }
    replicas("events") { (df, r) =>
      df.withColumn("event_id", col("event_id") + lit(r * O))
        .withColumn("user_id", col("user_id") + lit(r * C)) }
    // distinct vowel permutations (5! = 120 available, identity
    // first): replica texts differ in most words, lengths/word
    // counts identical — supports k up to 120 (sf10 probe uses 100)
    val perms: Seq[String] = {
      val all = "aeiou".toSeq.permutations.map(_.mkString).toSeq
      require(k <= all.length, s"k=$k > ${all.length} distinct perms")
      "aeiou" +: all.filterNot(_ == "aeiou")
    }
    replicas("documents") { (df, r) =>
      df.withColumn("doc_id", col("doc_id") + lit(r * C))
        .withColumn("text",
          if (r == 0) col("text") else translate(col("text"), "aeiou", perms(r))) }
    replicas("embeddings") { (df, r) =>
      df.withColumn("vec_id", col("vec_id") + lit(r * C))
        .withColumn("embedding",
          if (r == 0) col("embedding")
          else transform(col("embedding"), (x, i) =>
            (x + (pmod(xxhash64(col("vec_id"), i, lit(r)), lit(1000))
              .cast("float") / 5000.0f - 0.1f)).cast("float"))) }

    spark.stop()
  }
}
