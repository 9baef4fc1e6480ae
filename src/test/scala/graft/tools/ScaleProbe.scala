package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: LINEARITY of the dedup core beyond sf0.1 (the r9
  * verdict's honest caveat: "nothing larger than sf0.1 has ever been
  * measured"). Synthesizes corpora of N, 2N, 4N docs (deterministic
  * word soup + planted near-dup pairs, LSH-bucket-shaped block keys
  * whose COUNT grows with the corpus so expected block size stays
  * fixed — the real LSH banding regime) and times
  *  - ngramJaccard (the d04/m03 blocked set-Jaccard core), and
  *  - substringDedup (the d25 positional-gram pass).
  * A scale-safe plan doubles its wall clock when the corpus doubles;
  * a quadratic pair generator would 4x. Results recorded in
  * dev/scale_probe_r10.txt.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleProbe [baseDocs]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseDocs = if (args.nonEmpty) args(0).toInt else 50000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // measure the SCALE path: at 100 TB no side of the gram
      // self-join fits a broadcast, so pin broadcast off — otherwise
      // AQE flips strategies across the probe's sizes (first run: the
      // 50k corpus broadcast a ~3M-row gram frame and ran 2.5x SLOWER
      // than the 100k corpus that crossed the threshold into SMJ) and
      // the curve measures the planner, not the operator
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** ~60-word docs over a 1000-word vocab; every 10th doc is a
      * mutated copy of its predecessor (drops the last 6 words) so the
      * probe finds real pairs. Block key = id-hash bucket of expected
      * size ~50 docs, copied from the ORIGINAL so planted pairs
      * co-bucket (the LSH-banding contract d04 consumes). */
    def corpus(n: Int): DataFrame = {
      val blocks = math.max(n / 50, 1)
      spark.range(n.toLong).toDF("doc_id")
        .withColumn("__src",
          when(col("doc_id") % 10 === 9, col("doc_id") - 1)
            .otherwise(col("doc_id")))
        .withColumn("__len",
          when(col("doc_id") % 10 === 9, lit(54)).otherwise(lit(60)))
        .withColumn("text",
          array_join(transform(sequence(lit(0), col("__len") - 1),
            i => concat(lit("w"),
              pmod(xxhash64(col("__src"), i), lit(1000)))), " "))
        .withColumn("blk", pmod(xxhash64(col("__src")), lit(blocks)))
        .select("doc_id", "blk", "text")
    }

    def timed(label: String)(f: => Long): Unit = {
      // shot1 warms JIT/codegen and is dropped; median of 3 timed
      // shots absorbs GC hiccups
      f
      spark.catalog.clearCache()
      val shots = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = shots.map(_._1).sorted.apply(1)
      // min is the envelope statistic for the linearity read: GC noise
      // only ever inflates a shot (see dev/scale_probe_r10.txt)
      val mn = shots.map(_._1).min
      println(f"$label median $med%7.2f s  min $mn%7.2f s  " +
        f"(${shots.head._2} rows; " +
        shots.map(s => f"${s._1}%.2f").mkString("/") + ")")
    }

    // every output column is consumed (noop sink): a count() here lets
    // the optimizer DROP the unique-key left-join's aggregate side —
    // the expensive rebuild — and time nothing
    def consume(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save()
      -1L
    }

    // docs deliberately NOT persisted: the per-shot clearCache (needed
    // to release the operators' internal caches) would silently drop
    // it anyway, and synthesis is map-only range() arithmetic — a
    // linear term that cannot mask a superlinear operator
    for (mult <- Seq(1, 2, 4)) {
      val n = baseDocs * mult
      val docs = corpus(n)
      timed(f"ngramJaccard    n=$n%7d") {
        Dedup.ngramJaccard(docs, "doc_id", "text", "blk",
          n = 2, minJaccard = 0.5, maxGramDf = 10000).count()
      }
      timed(f"substringDedup  n=$n%7d") {
        consume(Dedup.substringDedup(docs, "doc_id", "text", 8))
      }
    }
    spark.stop()
  }
}
